package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed text classification for corpus curation: the
  * fastText-class workhorse of LLM-data pipelines (quality filtering,
  * language/domain routing) expressed as pure Spark aggregations — a
  * multinomial Naive Bayes whose TRAINING is two map-side-combining
  * group-bys over the labeled corpus and whose SCORING is one token
  * join + re-aggregate per document. No MLlib, no driver-side math
  * beyond two scalar counts, no UDFs: every log-probability is a
  * codegen'd expression, so both halves scale as linear corpus passes.
  *
  * Semantics (standard multinomial NB, Laplace smoothing α):
  *
  *   score(d, c) = ln P(c) + Σ_{t ∈ d, t ∈ V} ln (cnt(t,c) + α) / (N_c + α·|V|)
  *
  * summed over token OCCURRENCES (multinomial, not Bernoulli); tokens
  * outside the training vocabulary are skipped (the standard treatment —
  * they carry no class evidence). Ties in the argmax break by label, so
  * classification is fully deterministic and engine-replayable.
  */
object Classify {

  /** A trained model: per-class stats `(label, __logprior, __ntoks)`
    * (one row per class — broadcast-sized by construction), sparse
    * token-class counts `(label, __t, __cnt)` (≤ vocab × classes rows),
    * and the vocabulary size. The frames are plain DataFrames so a
    * model persists/restores as two parquet tables.
    */
  case class NbModel(classStats: DataFrame, tokenCounts: DataFrame,
      vocabSize: Long, alpha: Double)

  /** Train on `docs`: `tokens` is the tokenizer expression (an
    * `array<string>` column, e.g. `split(col("text"), " ")`), `labelCol`
    * the class column. Cost: one exploded corpus pass feeding two
    * partial-aggregated group-bys, plus two scalar counts (classes and
    * vocabulary) — no iteration, which is exactly why NB remains the
    * production baseline at corpus scale.
    */
  def trainNaiveBayes(docs: DataFrame, tokens: Column, labelCol: String,
      alpha: Double = 1.0): NbModel = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val labeled = docs.select(col(labelCol).as("label"), tokens.as("__toks"))
      .filter(col("label").isNotNull)
    val tok = labeled.select(col("label"), explode(col("__toks")).as("__t"))
    val tokenCounts = tok.groupBy(col("label"), col("__t"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(eager = true) // consumed by stats, vocab and scoring
    val nDocs = labeled.count()
    val vocabSize = tokenCounts.select(col("__t")).distinct().count()
    val classStats = labeled.groupBy(col("label"))
      .agg(count(lit(1)).as("__ndocs"))
      .join(tokenCounts.groupBy(col("label")).agg(sum(col("__cnt")).as("__ntoks")),
        Seq("label"), "left")
      .select(col("label"),
        (log(col("__ndocs")) - log(lit(nDocs.toDouble))).as("__logprior"),
        coalesce(col("__ntoks"), lit(0L)).as("__ntoks"))
    NbModel(classStats, tokenCounts, vocabSize, alpha)
  }

  /** Per-(document, class) log-scores for every document: one row per
    * doc × class, `(idCol, label, score)`. Documents with zero in-vocab
    * tokens drop out (no evidence — callers wanting priors-only rows
    * can left-join). Scale shape: exploded tokens semi-join the
    * vocabulary, join the sparse token-class counts (AQE broadcasts
    * them when they fit; at a 10M-token vocabulary it is a plain
    * shuffle join), and re-aggregate per (doc, class); the class-stats
    * frame is classes-sized and broadcast.
    */
  def scoreNaiveBayes(model: NbModel, docs: DataFrame, idCol: String,
      tokens: Column): DataFrame = {
    val perClassToken = model.tokenCounts
      .select(col("label"), col("__t"), col("__cnt"))
    val vocab = perClassToken.select(col("__t")).distinct()
    val docToks = docs.select(col(idCol).as("__id"), explode(tokens).as("__t"))
      .join(vocab, Seq("__t"), "left_semi")
    val stats = broadcast(model.classStats)
    // one row per (token occurrence, class): the smoothed log-likelihood
    // needs the zero-count classes too, hence cross the classes in and
    // LEFT-join the sparse counts
    val scored = docToks.crossJoin(stats.select(col("label")))
      .join(perClassToken, Seq("label", "__t"), "left")
      .groupBy(col("__id"), col("label"))
      .agg(sum(log(coalesce(col("__cnt"), lit(0L)) + lit(model.alpha)))
        .as("__evid"), count(lit(1)).as("__ntok"))
      .join(stats, Seq("label"))
      .select(col("__id").as(idCol), col("label"),
        (col("__logprior") + col("__evid") -
          col("__ntok") * log(col("__ntoks") + lit(model.alpha * model.vocabSize)))
          .as("score"))
    scored
  }

  /** Argmax classification: `(idCol, predicted, score)`, one row per
    * scorable document; the winner is the highest score ROUNDED to 6dp
    * (last-ulp summation-order differences collapse into the label
    * tiebreak — same discipline as `Similarity.topKPerQuery`), score
    * reported at 4dp.
    */
  def classifyNaiveBayes(model: NbModel, docs: DataFrame, idCol: String,
      tokens: Column): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(col("score"), 6).desc, col("label"))
    scoreNaiveBayes(model, docs, idCol, tokens)
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") === 1)
      .select(col(idCol), col("label").as("predicted"),
        round(col("score"), 4).as("score"))
  }
}
