package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Sequence packing — the training-batch construction step: concatenate
  * the corpus's token stream in a deterministic total order and split it
  * into fixed-length sequences ("document packing"); a document may span
  * sequence boundaries, a sequence usually holds several documents.
  *
  * The only global state is one EXCLUSIVE PREFIX SUM of token counts
  * (`Ids.globalPrefixSum`: range partition + per-partition window + a
  * partition-totals offset map — never a single-task window), after which
  * every row knows its absolute token offset and the sequence assignment
  * is pure per-row arithmetic. 100 TB-safe: one range shuffle, one narrow
  * explode whose fan-out is the per-document span count (⌈n/seqLen⌉+1 at
  * most), no driver data.
  */
object Packing {

  /** One row per (document, sequence) overlap:
    *   - `seq_id`: 0-based index of the fixed-`seqLen` sequence,
    *   - `doc_from`/`doc_to`: token half-open range of the document
    *     landing in that sequence,
    *   - `seq_off`: position inside the sequence where that slice starts.
    * Documents with zero tokens are skipped. `idCol` must be a total
    * order (unique ids) for full determinism; integer arithmetic is exact
    * (`div`, no doubles), so any engine replays the same packing.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int): DataFrame =
    packSequencesByCount(df, idCol,
      size(TextAnalysis.tokens(qcol(textCol))), seqLen)

  /** [[packSequences]] over an arbitrary per-document token-count
    * expression — the seam that lets a real tokenizer's counts
    * ([[Bpe.tokenCount]]) drive the packing budget instead of the
    * whitespace count.
    */
  def packSequencesByCount(df: DataFrame, idCol: String, countExpr: org.apache.spark.sql.Column,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val base = df.select(qcol(idCol), countExpr.cast("long").as("__n"))
    val L = lit(seqLen.toLong)
    graft.operators.Ids.globalPrefixSum(base, Seq(qcol(idCol)), col("__n"), "__start")
      .filter(col("__n") > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div $seqLen"),
        expr(s"(__start + __n - 1) div $seqLen"))))
      .select(qcol(idCol),
        col("seq_id"),
        greatest(col("seq_id") * L - col("__start"), lit(0L)).as("doc_from"),
        (least((col("seq_id") + 1) * L, col("__start") + col("__n")) - col("__start")).as("doc_to"),
        greatest(col("__start") - col("seq_id") * L, lit(0L)).as("seq_off"))
  }
}
