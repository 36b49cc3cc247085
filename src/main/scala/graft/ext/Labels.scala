package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Label aggregation over redundant annotations — the step between raw
  * crowd/model judgments and a training label: several annotators label
  * each item; the pipeline must resolve disagreements AND discount
  * unreliable annotators. [[weightedMajority]] is the standard one-round
  * reliability reweight (the first EM step of Dawid & Skene 1979):
  *
  *   1. majority vote per item (ties: label ascending);
  *   2. each annotator's reliability = agreement rate with the majority,
  *      on the 10⁶ integer grid (floor);
  *   3. re-vote with each ballot weighted by its annotator's
  *      reliability (ties: label ascending again).
  *
  * Everything is counting, integer floors and deterministic argmaxes,
  * so both rounds replay exactly in a second engine (the x_label_wmv
  * gate hash-pins items, votes, both winning labels and the winning
  * weight mass).
  *
  * Scale shape: three groupBys over the annotation log (item-label
  * counts, annotator agreement, weighted item-label mass) and two
  * item-keyed windows — per-item and per-annotator state is
  * counter-sized; nothing is ever collected or globally sorted.
  */
object Labels {

  def weightedMajority(
      annotations: DataFrame,
      itemCol: String,
      annotatorCol: String,
      labelCol: String,
  ): DataFrame = {
    val ann = annotations.select(qcol(itemCol).as("item"),
      qcol(annotatorCol).as("annotator"), qcol(labelCol).as("label"))
    weightedMajorityImpl(ann.withColumn("__w", lit(1L)))
  }

  /** The count-compressed form: rows are (item, annotator, label, n) —
    * the associative reduction of the annotation log a streamed delta
    * store maintains ([[graft.streaming.EventStreams.runLabelCountsOnce]]).
    * Counting, agreement and the weighted masses all distribute over
    * the counts, so this equals [[weightedMajority]] over the expanded
    * log EXACTLY (x_stream_label_wmv pins streamed == batch through
    * both vote rounds; LabelsSpec pins the algebra on ties).
    */
  def weightedMajorityFromCounts(
      counts: DataFrame,
      itemCol: String,
      annotatorCol: String,
      labelCol: String,
      nCol: String,
  ): DataFrame =
    weightedMajorityImpl(counts.select(qcol(itemCol).as("item"),
      qcol(annotatorCol).as("annotator"), qcol(labelCol).as("label"),
      qcol(nCol).cast("long").as("__w")))

  /** Inter-annotator agreement — Fleiss-style κ, in BOTH published
    * conventions (the "is the labeling task well-posed" dashboard
    * number beside the WMV resolution; κ near 0 means the majority
    * label is mostly noise no reweight can rescue):
    *
    *   Po = Σ_items Σ_labels c_il·(c_il−1) / Σ_items n_i·(n_i−1)
    *        — the POOLED-PAIRS convention: one ratio of global pair
    *        sums. NOTE this is the varying-raters generalization, NOT
    *        Fleiss 1971 verbatim: Fleiss defines Po as the per-item
    *        MEAN of P_i = Σ_l c_il(c_il−1)/(n_i(n_i−1)), and the two
    *        coincide only when every item has the same rater count.
    *        Pooled pairs weight each item by its pair count (an
    *        item with 10 ballots carries 45× the weight of one with
    *        2), which is the convention a takedown/consensus pipeline
    *        usually wants; single-ballot items contribute zero pairs
    *        to both sums.
    *   Po_item = mean over items with n_i ≥ 2 of P_i — the classical
    *        Fleiss 1971 form, published alongside for comparability
    *        (`po_item_q`, `kappa_fleiss`).
    *   Pe = Σ_labels (n_l / N)²   (chance agreement from global label
    *        shares)
    *   κ  = (Po − Pe) / (1 − Pe)   (per convention)
    *
    * Exactness: Po and Pe publish as ×10⁶ integer floors computed in
    * decimal(38,0) (pair counts reach Σ n_i² and N² — int64 would wrap
    * near ~3e9 ballots; the `div` floor is the [[graft.ext.Eval]] AUC
    * discipline), and κ is ONE deterministic IEEE divide of those two
    * exact integers — so the whole report hash-matches a second
    * engine's replay (x_label_kappa). κ is NULL when no item has two
    * ballots (Po undefined) or pe_q = 10⁶ (single-label log, chance
    * agreement saturates).
    *
    * Scale shape: two groupBys over the log (item-label, label) plus
    * counter-sized epilogues — nothing is collected or globally sorted.
    * Output, one row: (n_items, n_ballots, po_q, po_item_q, pe_q,
    * kappa, kappa_fleiss) — `po_q`/`kappa` the pooled-pairs
    * convention, `po_item_q`/`kappa_fleiss` the classical per-item
    * mean (per-item floors then one integer mean — deterministic and
    * engine-replayable like every ×10⁶ figure here).
    */
  def agreementKappa(annotations: DataFrame, itemCol: String,
      labelCol: String): DataFrame =
    kappaImpl(annotations
      .select(qcol(itemCol).as("item"), qcol(labelCol).as("label"))
      .filter(col("item").isNotNull && col("label").isNotNull)
      .groupBy(col("item"), col("label"))
      .agg(count(lit(1)).as("__c")))

  /** κ from the count-compressed log (item, label, n) — the associative
    * reduction a streamed delta store maintains (sum the
    * [[graft.streaming.EventStreams.runLabelCountsOnce]] store over
    * annotators). Pair counting distributes over counts, so this equals
    * [[agreementKappa]] over the expanded log EXACTLY
    * (x_stream_label_kappa pins streamed == batch).
    */
  def agreementKappaFromCounts(counts: DataFrame, itemCol: String,
      labelCol: String, nCol: String): DataFrame =
    kappaImpl(counts
      .select(qcol(itemCol).as("item"), qcol(labelCol).as("label"),
        qcol(nCol).cast("long").as("__n"))
      .filter(col("item").isNotNull && col("label").isNotNull)
      .groupBy(col("item"), col("label"))
      .agg(sum(col("__n")).as("__c")))

  private def kappaImpl(il: DataFrame): DataFrame = {
    val agg = il.groupBy(col("item"))
      .agg(sum(col("__c")).as("__ni"),
        sum(expr("cast(__c as decimal(38,0)) * (__c - 1)")).as("__pn"))
      .agg(count(lit(1)).as("n_items"), sum(col("__ni")).as("n_ballots"),
        sum(col("__pn")).as("__num"),
        sum(expr("cast(__ni as decimal(38,0)) * (__ni - 1)")).as("__den"),
        // classical Fleiss: per-item P_i on the 10⁶ grid (integer
        // floor — ≤ 10⁶ each, so the sum fits long far past any
        // ballot count), mean over items with ≥ 2 ballots
        sum(when(col("__ni") >= 2, expr(
          "cast(__pn * 1000000 div (cast(__ni as decimal(38,0)) * (__ni - 1)) as long)")))
          .as("__pisum"),
        sum(when(col("__ni") >= 2, 1L).otherwise(0L)).as("__m2"))
    val lbl = il.groupBy(col("label")).agg(sum(col("__c")).as("__nl"))
      .agg(sum(expr("cast(__nl as decimal(38,0)) * __nl")).as("__sq"),
        sum(col("__nl")).as("__nn"))
    agg.crossJoin(lbl)
      .select(col("n_items"), col("n_ballots"),
        when(col("__den") > 0,
          expr("cast(__num * 1000000 div __den as long)")).as("po_q"),
        when(col("__m2") > 0, expr("__pisum div __m2")).as("po_item_q"),
        when(col("__nn") > 0, expr(
          "cast(__sq * 1000000 div (cast(__nn as decimal(38,0)) * __nn) as long)"))
          .as("pe_q"))
      .withColumn("kappa",
        when(col("po_q").isNotNull && col("pe_q").isNotNull &&
            col("pe_q") =!= 1000000L,
          (col("po_q") - col("pe_q")).cast("double") /
            (lit(1000000L) - col("pe_q"))))
      .withColumn("kappa_fleiss",
        when(col("po_item_q").isNotNull && col("pe_q").isNotNull &&
            col("pe_q") =!= 1000000L,
          (col("po_item_q") - col("pe_q")).cast("double") /
            (lit(1000000L) - col("pe_q"))))
  }

  /** Both entry points on one spine: every count/ballot is weighted by
    * the row's multiplicity `__w` (1 for the raw log), so the two-round
    * arithmetic is literally shared instead of mirrored.
    */
  private def weightedMajorityImpl(annW: DataFrame): DataFrame = {
    val ann = annW
    // round 1: plain majority (count desc, label asc)
    val byLabel = Window.partitionBy(col("item"))
      .orderBy(col("n").desc, col("label"))
    val mv = ann.groupBy(col("item"), col("label"))
      .agg(sum(col("__w")).as("n"))
      .withColumn("__r", row_number().over(byLabel)).filter(col("__r") === 1)
      .select(col("item"), col("label").as("mv_label"), col("n").as("mv_votes"))
    // annotator reliability: floor(agree·10⁶ / ballots)
    val agree = ann.join(mv.select(col("item"), col("mv_label")), Seq("item"))
      .groupBy(col("annotator"))
      .agg(sum(when(col("label") === col("mv_label"), col("__w"))
        .otherwise(0L)).as("__agree"), sum(col("__w")).as("__n"))
      .select(col("annotator"),
        expr("__agree * 1000000 div __n").as("__acc_q"))
    // round 2: reliability-weighted vote (weight desc, label asc)
    val byWeight = Window.partitionBy(col("item"))
      .orderBy(col("w").desc, col("label"))
    val wmv = ann.join(agree, Seq("annotator"))
      .groupBy(col("item"), col("label"))
      .agg(sum(col("__acc_q") * col("__w")).as("w"))
      .withColumn("__r", row_number().over(byWeight)).filter(col("__r") === 1)
      .select(col("item"), col("label").as("wmv_label"),
        col("w").as("wmv_weight_q"))
    val votes = ann.groupBy(col("item")).agg(sum(col("__w")).as("n_votes"))
    votes.join(mv, Seq("item")).join(wmv, Seq("item"))
      .select(col("item"), col("n_votes"), col("mv_label"), col("mv_votes"),
        col("wmv_label"), col("wmv_weight_q"),
        (col("wmv_label") =!= col("mv_label")).as("flipped"))
  }
}
