package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Bradley-Terry preference ranking — the model preference-data pipelines
  * fit over pairwise comparisons (human A/B judgments, win/loss logs):
  * each item i gets a strength w_i with P(i beats j) = w_i/(w_i + w_j),
  * estimated by Hunter (2004)'s MM iteration
  *
  *   w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j),
  *
  * (W_i = i's total wins, n_ij = games between i and j), renormalized to
  * Σw = 1 each round.
  *
  * Engine portability: weights live on an integer grid (`gridQ`, default
  * 10⁶ = 1.0), every division is an explicit floor of 64-bit integers,
  * and the iteration count is fixed — so both engines walk the identical
  * quantized trajectory and the final strengths hash-match (the x_rank_bt
  * gate). Precision: each per-pair term carries `mulQ` = 10¹² of headroom
  * (fits in int64 while n_ij·10¹² < 2⁶³, i.e. ~9·10⁶ games per pair at
  * the default grid — beyond that, widen to decimal).
  *
  * Scale shape: the corpus-sized work is building the win matrix (one
  * equi-join + one groupBy over the pair log); the MM iterations run over
  * the |items|² matrix — counter-sized — as fixed DataFrame rounds, no
  * collect anywhere.
  */
object Preference {

  private val MulQ = 1000000000000L // 10^12 per-pair headroom

  /** Aggregate a (winner, loser) pair log into the symmetric game matrix
    * frame: (item, opp, n_games, n_wins_vs_opp) — one row per ordered
    * pair that ever played.
    */
  def winMatrix(pairs: DataFrame, winnerCol: String, loserCol: String): DataFrame = {
    val w = pairs.select(qcol(winnerCol).as("item"), qcol(loserCol).as("opp"),
      lit(1L).as("__w"))
    val l = pairs.select(qcol(loserCol).as("item"), qcol(winnerCol).as("opp"),
      lit(0L).as("__w"))
    w.unionByName(l).groupBy(col("item"), col("opp"))
      .agg(count(lit(1)).as("n_games"), sum(col("__w")).as("n_wins_vs_opp"))
  }

  /** Fit Bradley-Terry strengths over a (winner, loser) pair log with
    * `iters` MM rounds on the `gridQ` integer grid. Returns one row per
    * item: (item, n_wins, n_games, w_q, rk) — w_q the final quantized
    * strength (Σ ≈ gridQ), rk the dense rank by strength descending then
    * item ascending.
    */
  def bradleyTerry(
      pairs: DataFrame,
      winnerCol: String,
      loserCol: String,
      iters: Int = 3,
      gridQ: Long = 1000000L,
  ): DataFrame =
    bradleyTerryFromMatrix(winMatrix(pairs, winnerCol, loserCol), iters, gridQ)

  /** Fit from an already-aggregated game matrix — the entry point the
    * STREAMING maintenance path uses (win-matrix cells are associative
    * counters, so a delta store's sum feeds the identical fit the batch
    * pair log would). `matrix`: (item, opp, n_games, n_wins_vs_opp),
    * one row per ordered pair that ever played.
    */
  def bradleyTerryFromMatrix(
      matrix: DataFrame,
      iters: Int = 3,
      gridQ: Long = 1000000L,
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // EAGER checkpoints deliberately (r21 A/B): the fit's per-round
    // joins broadcast w/m off their MATERIALIZED size statistics; the
    // lazy form lost the stats and replanned to sort-merge (+5-16%)
    val m = matrix.select(col("item"), col("opp"),
        col("n_games").cast("long").as("n_games"),
        col("n_wins_vs_opp").cast("long").as("n_wins_vs_opp"))
      .localCheckpoint(eager = true)
    val items = m.groupBy(col("item"))
      .agg(sum(col("n_wins_vs_opp")).as("n_wins"), sum(col("n_games")).as("n_games"))
      .localCheckpoint(eager = true)
    val nItems = items.count() // counter-sized (the item universe)
    require(nItems > 0, "bradleyTerry needs at least one comparison")
    // uniform start: every strength at gridQ/|items|
    var w = items.select(col("item"), lit(gridQ / nItems).as("w_q"))
    for (_ <- 1 to iters) {
      // d_i = Σ_j floor(n_ij·10¹² / (w_i + w_j)); zero-strength opponents
      // pairs (w_i + w_j = 0) cannot occur while any item has a win,
      // but guard the division anyway (greatest with 1)
      val d = m.join(w.withColumnRenamed("w_q", "__wi"), Seq("item"))
        .join(w.select(col("item").as("opp"), col("w_q").as("__wj")), Seq("opp"))
        .select(col("item"),
          expr(s"n_games * $MulQ div greatest(__wi + __wj, 1L)").as("__t"))
        .groupBy(col("item")).agg(sum(col("__t")).as("__d"))
      // raw_i = floor(W_i·10¹² / d_i); items that never played keep d=0
      // out of the frame by construction (m has a row only for played
      // pairs); W_i = 0 items get raw 0 and stay ranked last
      val raw = items.join(d, Seq("item"))
        .select(col("item"),
          expr(s"n_wins * $MulQ div greatest(__d, 1L)").as("__raw"))
      // renormalize onto the grid: w_i = floor(raw_i·gridQ / Σraw)
      val tot = raw.agg(sum(col("__raw")).as("__tot"))
      w = raw.crossJoin(broadcast(tot))
        .select(col("item"),
          expr(s"__raw * $gridQ div greatest(__tot, 1L)").as("w_q"))
        .localCheckpoint(eager = true)
    }
    val rk = Window.orderBy(col("w_q").desc, col("item"))
    // the ranking window is over |items| rows (counter-sized) — a single
    // partition by design, same as every dashboard epilogue
    items.join(w, Seq("item"))
      .withColumn("rk", row_number().over(rk))
      .select(col("item"), col("n_wins"), col("n_games"), col("w_q"), col("rk"))
  }
}
