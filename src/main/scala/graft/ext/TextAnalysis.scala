package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID, quality scoring, fingerprinting.
  *
  * All pure Column expressions (whole-stage codegen, no UDFs) so a 100 TB
  * documents scan stays a single narrow pass — no shuffle, no python —
  * except `unigramSurprisal`, which by nature aggregates corpus-level
  * statistics first.
  */
object TextAnalysis {

  /** Lowercased word tokens (non-word-character split, empties dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\W+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: words plus isolated punctuation — a cheap,
    * deterministic, pure-Column PROXY for subword tokenization (\w+ runs
    * + single non-space symbols). When actual tokenizer counts matter
    * (chunk boundaries, packing budgets), use the real byte-pair encoder
    * instead: [[Bpe.tokenCount]] applies a learned/loaded merge list.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Word n-gram shingles, distinct, space-joined; empty array when the
    * document has fewer than n tokens (callers filter).
    *
    * The token array is bound as a LAMBDA VARIABLE (a one-element
    * `transform(array(...))` wrapper) so it evaluates once per row:
    * referencing the tokenize expression directly inside the position
    * lambda would re-evaluate it per position — higher-order functions
    * run interpreted with no common-subexpression elimination, turning
    * the build quadratic in document length (the bug class SkewSpec
    * "span census skew" guards in the span census; hot dedup paths use
    * the native [[shingleHashes]] one-pass expression instead).
    */
  def shingles(text: Column, n: Int): Column =
    element_at(transform(array(tokens(text)), t =>
      when(size(t) >= n,
        array_distinct(transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + lit(1), lit(n))))))
        .otherwise(array().cast("array<string>"))), 1)

  /** Distinct HASHED shingles via the native one-pass expression — the
    * form the dedup pipelines consume (they only ever join/intersect on
    * the hash). Equal to `transform(shingles(text, n), s => xxhash64(s))`
    * but ~an order of magnitude cheaper: the declarative chain runs
    * interpreted (HOFs break codegen) with per-shingle allocations.
    */
  def shingleHashes(text: Column, n: Int, portable: Boolean = false): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.plans.ShingleHashes(
        org.apache.spark.sql.GraftSqlBridge.expression(tokens(text)), n,
        portable))

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

  /** English stopword-density score on the 10⁶ integer grid:
    * round(stop_hits·10⁶ / n_tokens) as BIGINT, NULL for token-less
    * documents — the quantized ranking score the grouped-AUC gate
    * (x_eval_auc) grades for class separation. One tokenize pass,
    * no shuffle.
    */
  def stopwordScoreQ(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      round(hits(t, stopwords("en")).cast("double") * 1000000 / size(t), 0)
        .cast("long"))
  }

  /** Language-ID: stopword-hit argmax over `stopwords`, alphabetical
    * language-code tie-break, "und" when no list scores ≥ 1 hit.
    *
    * Single pass: one tokenization, one fold accumulating all per-language
    * counters at once. (A per-language `hits` + nested when-fold duplicates
    * the tokenize subtree ~2^langs times — Spark does not CSE inside one
    * projection.) Argmax-with-tie-break via the score*n + (n-1-i) encoding,
    * identical to the DuckDB oracle's `greatest` formula.
    */
  def langId(text: Column): Column = {
    val ordered = stopwords.toSeq.sortBy(_._1) // de, en, es, fr
    val n = ordered.size
    val counts = aggregate(tokens(text), array_repeat(lit(0), n),
      (acc, tok) => zip_with(acc,
        array(ordered.map { case (_, ws) => when(tok.isin(ws: _*), 1).otherwise(0) }: _*),
        (a, b) => a + b))
    val key = greatest(ordered.indices.map(i =>
      element_at(counts, i + 1) * n + lit(n - 1 - i)): _*)
    val lang = ordered.zipWithIndex.foldLeft(lit("und")) { case (acc, ((code, _), i)) =>
      when(pmod(key, lit(n)) === (n - 1 - i), lit(code)).otherwise(acc)
    }
    when(array_max(counts) >= 1, lang).otherwise(lit("und"))
  }

  /** DataFrame-level language-ID: same semantics as `langId` but via
    * explode + conditional-count aggregation — Spark's higher-order
    * functions (aggregate/zip_with) evaluate interpreted, while count-if
    * aggregates stay in whole-stage codegen. Zero-token documents are
    * preserved via the left join back ("und").
    */
  def withLangId(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val ordered = stopwords.toSeq.sortBy(_._1)
    val n = ordered.size
    val th = df.select(col(idCol).as("__lid"), explode(tokens(col(textCol))).as("__t"))
    val counted = th.groupBy(col("__lid"))
      .agg(count(when(col("__t").isin(ordered.head._2: _*), 1)).as("c0"),
        ordered.tail.zipWithIndex.map { case ((_, ws), i) =>
          count(when(col("__t").isin(ws: _*), 1)).as(s"c${i + 1}")
        }: _*)
    val key = greatest(ordered.indices.map(i => col(s"c$i") * n + lit(n - 1 - i)): _*)
    val lang = ordered.zipWithIndex.foldLeft(lit("und")) { case (acc, ((code, _), i)) =>
      when(pmod(key, lit(n)) === (n - 1 - i), lit(code)).otherwise(acc)
    }
    val maxScore = greatest(ordered.indices.map(i => col(s"c$i")): _*)
    val pred = counted.select(col("__lid"),
      when(maxScore >= 1, lang).otherwise(lit("und")).as(outCol))
    df.join(pred, col(idCol) === col("__lid"), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("und")))
      .drop("__lid")
  }

  /** PII-ish redaction patterns, applied in order (URL first so emails
    * inside URLs don't split the match; then email; then phone-ish digit
    * runs). Portable regex subset — identical semantics under Java regex
    * (Spark) and RE2 (DuckDB oracle).
    */
  val redactPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?\\d[\\d -]{7,}\\d" -> "<NUM>",
  )

  /** Scrub URLs/emails/phone-like numbers from a text column — the
    * standard pre-training privacy pass. Pure `regexp_replace` chain:
    * codegen, no shuffle, scales as a narrow map over the corpus.
    */
  def redact(text: Column): Column =
    redactPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Canonical URL form — the normalization web-corpus dedup keys on
    * (the same page arrives under case-shuffled hosts, default ports,
    * tracking params and fragments): lowercase scheme+host, strip the
    * scheme's default port, drop the fragment, drop `utm_`-prefixed
    * query params, sort the survivors, empty path → "/". Pure columnar
    * regex/array built-ins — no UDF, no shuffle; the x_url_canonical
    * gate replays every rule in DuckDB.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(url, "^[^:]+://([^/:?#]+)", 1))
    val port = regexp_extract(url, "^[^:]+://[^/:?#]+:([0-9]+)", 1)
    val path = regexp_extract(url, "^[^:]+://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val defPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && substring(p, 1, 4) =!= "utm_"))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), concat_ws("&", params))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart,
      when(path === "", lit("/")).otherwise(path), queryPart)
  }

  /** Character-level Shannon entropy on the 4dp grid — the cheap
    * gibberish/boilerplate signal (natural text sits ~3.5–4.5 bits/char;
    * key-mash and repeated filler fall out of band). One columnar pass:
    * chars as an array, the summation over the SORTED distinct-char list
    * so both engines fold the same doubles in the same order — no
    * shuffle, no UDF. NULL for empty text.
    */
  def charEntropyQ(text: Column): Column = {
    // Each intermediate is BOUND as a single-element-transform lambda
    // variable so it evaluates ONCE per row — a bare subexpression
    // referenced inside a higher-order-function lambda re-evaluates per
    // ELEMENT (no CSE across lambda boundaries), which turned the sort
    // form quadratic: array_sort re-ran for every position the filter
    // probed. The binding trick is `transform(array(x), v -> body)[1]`.
    def bind(x: Column)(body: Column => Column): Column =
      element_at(transform(array(x), body), 1)
    bind(regexp_extract_all(text, lit("[\\s\\S]"), lit(0))) { chars =>
      val n = size(chars)
      // the n > 0 guard sits OUTSIDE the inner binds: CaseWhen skips the
      // untaken branch, so the empty-text row never evaluates the
      // sequence/element_at machinery (sequence(1, 0) runs DESCENDING
      // and the i−1 probe would hit index 0)
      when(n > 0,
        // counts via SORT + RUN LENGTHS — O(L log L) per row, not the
        // O(distinct·L) of a per-distinct-char rescan. Run starts
        // (1-based) in the sorted array, run lengths from the gap to the
        // next start; order = sorted distinct chars, exactly the order
        // the oracle's list_sort(list_distinct(...)) walks.
        bind(array_sort(chars)) { s =>
          bind(filter(sequence(lit(1), n), i =>
            (i === 1) || (element_at(s, i) =!= element_at(s, i - 1)))) { starts =>
            val counts = zip_with(
              concat(slice(starts, lit(2), size(starts)), array(n + 1)), starts,
              (b, a) => b - a)
            // ln-form with a SHARED ln(2) literal (Eval.literal
            // discipline): H = −(Σ p·ln p)/ln 2 — one libm call per term
            // on both engines, no cross-engine log2 seam
            val h = aggregate(counts, lit(0.0), (acc, cnt) => {
              val p = cnt.cast("double") / n
              acc + p * log(p)
            })
            round(-h / lit(0.6931471805599453), 4)
          }
        })
    }
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

  /** Repetition ratio (the Gopher-rules duplicate-n-gram signal): fraction
    * of a document's word `n`-grams that are repeats of an earlier one —
    * 0.0 for fully novel text, → 1.0 for looping boilerplate. Documents
    * with fewer than `n` tokens score 0.0 (nothing to repeat). Pure
    * columnar: total n-grams from the token count, distinct n-grams from
    * the native one-pass `ShingleHashes` — no shuffle.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = size(tokens(text)) - (n - 1)
    when(total > 0,
      round(lit(1.0) - size(shingleHashes(text, n)).cast("double") / total, 4))
      .otherwise(lit(0.0))
  }

  /** Canonical content fingerprint: normalize (lowercase, collapse
    * whitespace via tokenization) then md5 — byte-identical duplicates AND
    * whitespace/case-variant duplicates collide.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Context-window chunking: split each document's token stream into
    * fixed-size windows with `overlap` tokens of lookback — the standard
    * preparation step for bounded-context training examples. One narrow
    * pass: tokenize once (separate projection under the Generate, so the
    * token array is computed once per row, not once per reference),
    * generate starts at stride (chunkSize − overlap), emit
    * (`idCol`, `chunk_idx`, `chunk`, `n_tokens`); the final window may be
    * short, zero-token documents emit nothing. No shuffle.
    */
  def chunkTokens(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int,
  ): org.apache.spark.sql.DataFrame =
    chunkTokenArray(df.select(col(idCol), tokens(col(textCol)).as("__toks")),
      idCol, chunkSize, overlap)

  /** The windowing engine of [[chunkTokens]] over a PRECOMPUTED token
    * array column `__toks` — shared with the subword form
    * ([[Bpe.chunkTokens]]), which tokenizes differently but windows
    * identically.
    */
  private[ext] def chunkTokenArray(
      withToks: org.apache.spark.sql.DataFrame,
      idCol: String,
      chunkSize: Int,
      overlap: Int,
  ): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val t = col("__toks")
    withToks
      .select(col(idCol), posexplode(
        when(size(t) > 0, transform(sequence(lit(0), size(t) - 1, lit(step)),
          st => struct(
            concat_ws(" ", slice(t, st + 1, lit(chunkSize))).as("chunk"),
            least(size(t) - st, lit(chunkSize)).as("n_tokens"))))
          .otherwise(array().cast("array<struct<chunk:string,n_tokens:int>>")))
        .as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx"),
        col("__c.chunk").as("chunk"), col("__c.n_tokens").as("n_tokens"))
  }

  /** Karp-Rabin rolling hash over normalized tokens: base-31 polynomial
    * reduced mod 2^40 each step so no Long overflow occurs (ANSI mode
    * throws on overflow — the reduced width keeps arithmetic exact).
    */
  def rollingHash(text: Column): Column = {
    val M = 1L << 40
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), lit(M)), lit(M)))
  }

  /** Unigram language-model surprisal per document — the simplest
    * CCNet-style perplexity quality signal: train add-one-smoothed
    * unigram log-probs ON the corpus itself, then score every document
    * by its mean per-token surprisal −ln p(t) (nats; perplexity =
    * exp of it). Unusually HIGH surprisal flags rare-token noise,
    * unusually LOW flags boilerplate — both ends are what a corpus
    * cleaner trims.
    *
    * Scale shape: term counts are one hash aggregate (vocab-sized,
    * lineage-cut — they feed the totals AND the scoring join), totals
    * derive from the counts (no extra corpus pass), and scoring joins
    * the exploded tokens against the vocab-sized counts frame (AQE
    * broadcasts it when small). Documents with zero tokens keep a row
    * with null surprisal.
    *
    * Output: (`doc_id`, `n_tokens`, `avg_surprisal`).
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(qcol(idCol).cast("long").as("doc_id"),
      tokens(qcol(textCol)).as("__t"))
    val ex = base.select(col("doc_id"), explode(col("__t")).as("__term"))
    val tc = ex.groupBy(col("__term")).agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint(eager = true) // eager: size stats feed the scoring join's broadcast
    val tot = tc.agg(sum(col("__c")).as("__tt"), count(lit(1)).cast("double").as("__v"))
    val scored = ex.join(tc, Seq("__term"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        (-log((col("__c") + 1) / (col("__tt") + col("__v")))).as("__s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), avg(col("__s")).as("avg_surprisal"))
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("avg_surprisal"))
  }

  /** Deflate compression ratio (compressed/raw bytes) — the
    * Gopher/RedPajama-class "too compressible = boilerplate, too
    * incompressible = noise" quality signal. A JVM UDF by necessity
    * (there is no Catalyst deflate expression); per-row cost is the
    * deflate itself, which IS the operator — budget it like the
    * multimodal decoders, not the token metrics. Fixed compression
    * level, so the signal is deterministic run to run; empty/null text
    * scores 1.0 (incompressible by convention).
    */
  def compressionRatio(text: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null || s.isEmpty) 1.0
      else {
        val bytes = s.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6)
        try {
          d.setInput(bytes)
          d.finish()
          val buf = new Array[Byte](8192)
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          n.toDouble / bytes.length
        } finally d.end()
      }
    }
    f(text)
  }

  /** Corpus-trained add-α bigram language-model perplexity per document —
    * the next step up from [[unigramSurprisal]] in the perplexity-
    * filtering ladder (CCNet-style: rank documents by how "expected"
    * their word sequences are; high perplexity = boilerplate, noise, or
    * wrong-language text):
    *
    *   P(w | prev) = (c(prev, w) + α) / (c(prev) + α·V)
    *   ppl(d)      = exp(−avg over d's bigrams of ln P(w | prev))
    *
    * with V the corpus token vocabulary and c(prev) the count of
    * bigrams starting at `prev`. Training is two map-side-combining
    * group-bys over the exploded bigram stream (plus one vocab count);
    * scoring re-joins each document's bigrams against the count tables
    * (AQE broadcasts them when they fit) and re-aggregates per doc —
    * linear passes throughout, the same cost family as the NB trainer.
    *
    * Output: (`doc_id`, `n_bigrams`, `ppl`); documents with fewer than
    * two tokens keep a row with `n_bigrams` 0 and null `ppl`.
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val base = docs.select(qcol(idCol).cast("long").as("doc_id"),
      tokens(qcol(textCol)).as("__t"))
    // size-2 guard BEFORE the sequence: sequence(1, n-1) with n < 2
    // would generate a DESCENDING range, not an empty one
    val bg = base.filter(size(col("__t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__t")) - 1), i =>
          struct(element_at(col("__t"), i).as("__prev"),
            element_at(col("__t"), i + 1).as("__w")))).as("__b"))
      .select(col("doc_id"), col("__b.__prev"), col("__b.__w"))
      .localCheckpoint(eager = false) // feeds both count tables and scoring (lazy: one plan)
    val c2 = bg.groupBy(col("__prev"), col("__w"))
      .agg(count(lit(1)).cast("double").as("__c2"))
    val cp = bg.groupBy(col("__prev"))
      .agg(count(lit(1)).cast("double").as("__cp"))
    val vocab = base.select(explode(col("__t")).as("__term"))
      .agg(countDistinct(col("__term")).cast("double").as("__v"))
    val scored = bg
      .join(c2, Seq("__prev", "__w"), "left")
      .join(cp, Seq("__prev"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((coalesce(col("__c2"), lit(0.0)) + lit(alpha)) /
          (coalesce(col("__cp"), lit(0.0)) + lit(alpha) * col("__v"))).as("__lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), exp(-avg(col("__lp"))).as("ppl"))
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("ppl"))
  }

  /** Per-source perplexity-percentile pruning — the CCNet head/middle
    * cut operationalized: each source keeps its ⌊keepFraction·n⌋
    * LOWEST-perplexity documents (ties by doc_id; unscorable docs —
    * fewer than two tokens, perplexity NULL — sort last and prune
    * first), so a noisy source cannot crowd out a clean one through a
    * single global threshold. Perplexity is the corpus-trained add-1
    * bigram LM ([[bigramPerplexity]]) quantized to the ×10⁴ integer
    * grid, which makes the cut — and the returned `ppl_q` — replayable
    * in a second engine.
    *
    * Scale shape: the per-source quantile cut runs over the (source,
    * ppl_q) HISTOGRAM (groupBy + a histogram-sized cumulative window),
    * never a per-source sort of the corpus — the
    * [[Sampling.keepTopFraction]] discipline with the prefix sum
    * partitioned by source; only the boundary tie-group gets a
    * row_number, and that window is tie-group-sized. Returns the input
    * grain: (doc_id, source, ppl_q, kept).
    */
  def perplexityPrune(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, keepFraction: Double,
      alpha: Double = 1.0): DataFrame = {
    require(keepFraction >= 0.0 && keepFraction <= 1.0,
      s"keepFraction out of [0,1]: $keepFraction")
    import org.apache.spark.sql.expressions.Window
    val ppl = bigramPerplexity(docs, idCol, textCol, alpha)
      .select(col("doc_id"), round(col("ppl") * 10000, 0).cast("long")
        .as("ppl_q"))
    val scored = docs
      .select(qcol(idCol).cast("long").as("doc_id"),
        qcol(sourceCol).as("source"))
      .join(ppl, Seq("doc_id"))
      // NULL perplexity sorts after every real value (the
      // keepTopFraction null discipline, flipped for an ascending cut)
      .withColumn("__s", coalesce(col("ppl_q"), lit(Long.MaxValue)))
      .localCheckpoint(eager = false) // histogram + final scan share it (lazy: one plan)
    // per-source histogram + cumulative: histogram-sized, never a
    // per-source sort of the corpus rows
    val wsrc = Window.partitionBy(col("source"))
    val hist = scored.groupBy(col("source"), col("__s"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__pre",
        coalesce(sum(col("__c")).over(
          wsrc.orderBy(col("__s"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wsrc))
      .withColumn("__k", floor(lit(keepFraction) * col("__n")).cast("long"))
    // threshold per source: the smallest score whose cumulative count
    // reaches k, and how many of its ties still fit (the remainder)
    val thr = hist.filter(col("__pre") + col("__c") >= col("__k"))
      .withColumn("__r", row_number().over(wsrc.orderBy(col("__s"))))
      .filter(col("__r") === 1)
      .select(col("source"), col("__s").as("__t"),
        (col("__k") - col("__pre")).as("__rem"))
    // only the boundary tie-group needs a row_number; its window is
    // tie-group-sized by construction
    val wtie = Window.partitionBy(col("source"), col("__s"))
      .orderBy(col("doc_id"))
    scored.join(thr, Seq("source"), "left")
      .withColumn("__tierk", row_number().over(wtie))
      .withColumn("kept",
        col("__t").isNotNull &&
          (col("__s") < col("__t") ||
            (col("__s") === col("__t") && col("__tierk") <= col("__rem"))))
      .select(col("doc_id"), col("source"), col("ppl_q"), col("kept"))
  }
}
