package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Composed corpus-cleaning pipeline — the operator a training-data
  * pipeline actually runs end-to-end: quality gate → language filter →
  * exact dedup → (optional) near-dup drop via MinHash candidates.
  *
  * Each stage is one of the library's columnar operators; the composition
  * stays a declarative plan: a 100 TB corpus makes one scan for the
  * filters, one hash shuffle for exact dedup, and the banded LSH shuffles
  * for near-dup — nothing quadratic, nothing driver-side.
  */
object CorpusClean {

  final case class Config(
      minTokens: Int = 20,
      minStopRatio: Double = 0.0,
      minAlphaRatio: Double = 0.5,
      languages: Set[String] = Set("en"),
      dropNearDups: Boolean = false,
      nearDupJaccard: Double = 0.8,
      /** Label-propagation round bound for duplicate-cluster assembly.
        * Must exceed the largest near-dup cluster's DIAMETER —
        * boilerplate-heavy corpora chain long (a≈b≈c≈…), and
        * connectedComponents refuses loudly rather than emit
        * silently-partial labels, so give long-chain corpora headroom
        * here instead of letting the whole cleaning job throw.
        */
      componentMaxIter: Int = 20,
  )

  /** Quality + language gate as a single predicate (one scan). */
  def qualityPredicate(text: Column, cfg: Config): Column = {
    val t = TextAnalysis.tokens(text)
    val nTokens = size(t)
    val alphaRatio = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text)
    nTokens >= cfg.minTokens &&
      alphaRatio >= cfg.minAlphaRatio &&
      (size(filter(t, x => x.isin(TextAnalysis.stopwords("en"): _*))).cast("double") / nTokens
        >= cfg.minStopRatio)
  }

  /** Train/test decontamination by n-gram overlap (the GPT-3/Pile recipe):
    * drop every corpus document sharing ≥ 1 word `n`-gram with the
    * evaluation set. Both sides reduce to 64-bit hashed shingles (native
    * one-pass `ShingleHashes`); contamination detection is a semi-join on
    * the hash — scales with shingle co-occurrence, never pairs. The eval
    * side's distinct hash set is dimension-sized in practice (benchmarks,
    * not corpora), so AQE broadcasts it; documents shorter than `n` tokens
    * have no shingles and are never flagged.
    */
  def decontaminate(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 13,
  ): DataFrame = {
    val docSh = corpus.select(qcol(idCol).as("__did"),
      explode(TextAnalysis.shingleHashes(qcol(textCol), n)).as("__s"))
    val evalSh = eval
      .select(explode(TextAnalysis.shingleHashes(qcol(evalTextCol), n)).as("__s"))
      .distinct()
    val bad = docSh.join(evalSh, Seq("__s"), "left_semi")
      .select(col("__did")).distinct()
    corpus.join(bad, qcol(idCol) === col("__did"), "left_anti")
  }

  /** Run the pipeline; returns surviving rows (canonical = min id for any
    * duplicate group).
    */
  def clean(df: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val gated0 = df.filter(qualityPredicate(qcol(textCol), cfg))
    val gated =
      if (cfg.languages.isEmpty) gated0
      else TextAnalysis.withLangId(gated0, idCol, textCol, "__lang")
        .filter(col("__lang").isin(cfg.languages.toSeq: _*)).drop("__lang")
    val exact = Dedup.dropExactDuplicates(gated, Seq(textCol), idCol)
    if (!cfg.dropNearDups) exact
    else {
      // candidate pairs → duplicate CLUSTERS, keep each cluster's min-id
      // canonical: pairwise "drop id_b" would keep/drop chain members
      // (a≈b, b≈c) depending on which pairs the LSH happened to emit
      val pairs = Dedup.minhashCandidates(exact, idCol, textCol,
        minEstJaccard = cfg.nearDupJaccard)
      val comp = Dedup.connectedComponents(exact.select(qcol(idCol)), idCol, pairs,
        maxIter = cfg.componentMaxIter)
      val drops = comp.filter(col("id") =!= col("component"))
        .select(col("id").as("__drop"))
      exact.join(drops, qcol(idCol).cast("long") === col("__drop"), "left_anti")
    }
  }
}
