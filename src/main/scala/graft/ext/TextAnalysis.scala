package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID, quality scoring, fingerprinting.
  *
  * All pure Column expressions (whole-stage codegen, no UDFs) so a 100 TB
  * documents scan stays a single narrow pass — no shuffle, no python.
  */
object TextAnalysis {

  /** Lowercased word tokens (non-word-character split, empties dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\W+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: words plus isolated punctuation — a cheap,
    * deterministic proxy for BPE vocab tokenization (\w+ runs + single
    * non-space symbols).
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Word n-gram shingles, distinct, space-joined; empty array when the
    * document has fewer than n tokens (callers filter).
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Stopword lists for the language-ID heuristic (n-gram/stopword evidence;
    * the classic cheap langid signal). Deterministic and tiny by design.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "para", "por", "que"),
  )

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Language-ID: stopword-hit argmax over `stopwords`, alphabetical
    * language-code tie-break, "und" when no list scores ≥ 1 hit.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(hits(t, words).as("score"), lit(lang).as("lang"))
    }
    // max by (score, then reverse-alphabetical loses to earlier code on tie):
    // array_max on struct compares score first, then lang lexicographically —
    // ties therefore pick the LAST language alphabetically; invert by
    // negating nothing and instead comparing with explicit fold.
    val best = scored.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    when(best.getField("score") >= 1, best.getField("lang")).otherwise(lit("und"))
  }

  /** Per-document quality metrics (length/punct/stopword ratios). */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    val nChars = length(text)
    val nTokens = size(t)
    val nAlpha = length(regexp_replace(text, "[^A-Za-z]", ""))
    val nStop = hits(t, stopwords("en"))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "alpha_ratio" -> round(nAlpha.cast("double") / nChars, 4),
      "stop_ratio" -> round(nStop.cast("double") / nTokens, 4),
      "avg_token_len" -> round(aggregate(t, lit(0L), (acc, x) => acc + length(x))
        .cast("double") / nTokens, 4),
    )
  }

  /** Canonical content fingerprint: normalize (lowercase, collapse
    * whitespace via tokenization) then md5 — byte-identical duplicates AND
    * whitespace/case-variant duplicates collide.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Karp-Rabin rolling hash over normalized tokens: base-31 polynomial
    * reduced mod 2^40 each step so no Long overflow occurs (ANSI mode
    * throws on overflow — the reduced width keeps arithmetic exact).
    */
  def rollingHash(text: Column): Column = {
    val M = 1L << 40
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), lit(M)), lit(M)))
  }
}
