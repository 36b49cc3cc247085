package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Byte-pair-encoding tokenization — the REAL subword counter behind
  * chunking/packing (replacing the `bpeishCount` regex proxy, whose
  * counts drift from any actual tokenizer's).
  *
  * Algorithm and formats are the public ones, in TWO segmentation modes:
  *
  *   - Default (Sennrich et al. 2016): lowercase `\W+` word splitting
  *     with the `</w>` end-of-word marker — nests exactly inside this
  *     codebase's word-level text operators.
  *   - [[ByteLevel]] (the GPT-2 encoder's published semantics):
  *     case-preserving regex pre-tokenization, UTF-8 bytes mapped onto
  *     the printable bytes-to-unicode alphabet (space → 'Ġ'), no
  *     end-of-word marker — the mode an externally trained byte-level
  *     merge list (e.g. the GPT-2 release's) must be applied in.
  *
  * [[parseMerges]]/[[formatMerges]] speak the published merges.txt
  * convention (one "left right" pair per line, rank = line order, `#`
  * comments) for BOTH modes — a merge list is format-interoperable
  * either way, but tokenizes faithfully only under the segmentation it
  * was trained with: feed a GPT-2 list through [[ByteLevel.tokens]],
  * not the word-mode entry points.
  *
  * Scale shape: LEARNING aggregates word frequencies distributed (one
  * tokenize + one hash aggregate; only the top-`maxVocab` (freq, word)
  * rows reach the driver — the bounded training table, the same
  * discipline as the ANN codebook samples) and runs the inherently
  * sequential merge loop driver-side over that table. ENCODING is a
  * narrow per-row pass: the merge loop has no Column-expression form, so
  * it is the one place this codebase uses a Scala UDF — with the ranks
  * map riding the closure and a per-task word→encoding cache, so a
  * corpus's Zipf-shaped word repetition collapses to hash lookups.
  */
object Bpe {

  /** End-of-word marker (the published convention): lets a merge
    * distinguish word-final from word-internal occurrences, and makes
    * token counts reconstruct word boundaries.
    */
  val EndOfWord = "</w>"

  /** An ordered merge list; rank = position (lower merges first). */
  final case class BpeModel(merges: Vector[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Parse the public merges.txt format: one "left right" pair per line,
    * earlier lines = higher priority; blank lines skip, and a
    * `#version:` header is recognized ONLY as the first line (the
    * published placement). Nothing else is a comment: byte-level mode
    * preserves punctuation, so `# #` is a legitimate merge (markdown
    * heading runs) — and even a first-position left symbol spelled
    * `#version` (no colon) parses as data. A blanket `#`- or
    * `#version`-prefix filter would silently drop such lines, shifting
    * every later rank.
    */
  def parseMerges(lines: Seq[String]): BpeModel = {
    val body = lines match {
      case head +: tail if head.trim.startsWith("#version:") => tail
      case _ => lines
    }
    BpeModel(body.iterator
      .map(_.trim)
      .filter(_.nonEmpty)
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2, s"merges line is not 'left right': $l")
        (parts(0), parts(1))
      }.toVector)
  }

  def formatMerges(model: BpeModel): Seq[String] =
    model.merges.map { case (a, b) => s"$a $b" }

  /** Persist a learned merge list as a merges.txt file — the trained
    * artifact of [[learn]], saved once and loaded by every job that
    * tokenizes (the same build-once/use-many discipline as the
    * [[AnnIndex]] tables). Driver-side IO on purpose: the artifact is
    * numMerges lines (KBs), and the published text format is what
    * externally trained merge lists (e.g. a GPT-2 release) arrive in,
    * so save/load round-trips interoperate with them byte-for-byte.
    */
  def saveMerges(model: BpeModel, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      ("#version: 0.2" +: formatMerges(model)).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load a merges.txt file (ours or an externally trained one). */
  def loadMerges(path: String): BpeModel = {
    import scala.jdk.CollectionConverters._
    parseMerges(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path),
      java.nio.charset.StandardCharsets.UTF_8).asScala.toSeq)
  }

  /** The same word segmentation as [[TextAnalysis.tokens]] (lowercase,
    * non-word split, empties dropped) — executor-side twin, so BPE
    * counts nest exactly inside the word-level operators.
    */
  private def words(s: String): Array[String] =
    // Locale.ROOT: plain toLowerCase is default-locale-sensitive (the
    // Turkish-I trap), which would split this twin from Spark's
    // locale-independent lower() on tr/az JVMs
    s.trim.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty)

  /** Encode one word: start from characters + `</w>`, repeatedly merge
    * the ADJACENT PAIR with the lowest rank (all its occurrences, left
    * to right) until no ranked pair remains — the reference greedy BPE
    * application, deterministic given the merge list.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    encodeSymbols(word.map(_.toString).toVector :+ EndOfWord, ranks)
  }

  /** The merge loop itself, over any starting symbol sequence (word
    * characters + `</w>` in the default mode, byte-alphabet symbols in
    * [[ByteLevel]] mode).
    */
  private[ext] def encodeSymbols(start: Vector[String],
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms: Vector[String] = start
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = p }
        i += 1
      }
      if (best == null) done = true
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
            out += best._1 + best._2; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Learn `numMerges` merges from a corpus. The word-frequency table is
    * computed distributed; ties in pair frequency break to the
    * lexicographically smallest pair, so the learned list is
    * deterministic. Learning stops early when no pair occurs twice.
    */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 32768): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    require(maxVocab > 0, s"maxVocab must be positive: $maxVocab")
    // TakeOrdered (orderBy+limit), not a global sort: only the bounded
    // training table reaches the driver
    val wf = docs
      .select(explode(TextAnalysis.tokens(qcol(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w"))
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    learnFromVocab(wf.map { case (w, n) =>
      (w.map(_.toString).toVector :+ EndOfWord, n)
    }, numMerges)
  }

  /** The driver-side merge loop shared by both segmentation modes, over
    * an already-bounded (symbol-sequence, frequency) training table.
    */
  private[ext] def learnFromVocab(start: Array[(Vector[String], Long)],
      numMerges: Int): BpeModel = {
    var vocab: Array[(Vector[String], Long)] = start
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += best._1 + best._2; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), n)
          }
        }
        m += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Serializable executor-side encoder: ranks and the word cache are
    * @transient lazy, so each task rebuilds them once and shares them
    * across its rows — repeated words (Zipf) cost one hash probe.
    */
  private final class WordEncoder(merges: Vector[(String, String)]) extends Serializable {
    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    @transient private lazy val cache =
      scala.collection.mutable.HashMap.empty[String, Vector[String]]
    // Zipf: the hot words that dominate repetition fit far under the
    // cap; past it (id/hash-like high-cardinality text) stop caching
    // rather than grow executor memory for words that never repeat
    private val MaxCache = 65536
    def encode(w: String): Vector[String] = cache.get(w) match {
      case Some(v) => v
      case None =>
        val v = encodeWord(w, ranks)
        if (cache.size < MaxCache) cache.update(w, v)
        v
    }
  }

  /** BPE sub-token array of a text column (null text → empty array). */
  def tokens(text: Column, model: BpeModel): Column = {
    val enc = new WordEncoder(model.merges)
    val f = udf { (s: String) =>
      if (s == null) Array.empty[String]
      else words(s).flatMap(enc.encode)
    }
    f(text)
  }

  /** BPE sub-token count of a text column — the drop-in replacement for
    * [[TextAnalysis.bpeishCount]] wherever a real tokenizer's counts
    * matter (chunk boundaries, packing budgets). Counts without
    * materializing token arrays.
    */
  def tokenCount(text: Column, model: BpeModel): Column = {
    val enc = new WordEncoder(model.merges)
    val f = udf { (s: String) =>
      if (s == null) 0
      else {
        var n = 0
        words(s).foreach(w => n += enc.encode(w).length)
        n
      }
    }
    f(text)
  }

  /** Context-window chunking over BPE sub-tokens — `chunkTokens` with the
    * real tokenizer deciding the boundaries. Output shape matches
    * [[TextAnalysis.chunkTokens]]: (idCol, chunk_idx, chunk, n_tokens),
    * chunk = space-joined sub-tokens.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int, model: BpeModel): DataFrame =
    TextAnalysis.chunkTokenArray(
      df.select(qcol(idCol), tokens(qcol(textCol), model).as("__toks")),
      idCol, chunkSize, overlap)

  /** Sequence packing by BPE token counts — `packSequences` with the real
    * tokenizer's budget. Output shape matches [[Packing.packSequences]].
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, model: BpeModel): DataFrame =
    Packing.packSequencesByCount(df, idCol, tokenCount(qcol(textCol), model), seqLen)

  /** GPT-2-style byte-level BPE (the released encoder's PUBLISHED
    * semantics, implemented from their description): case-preserving
    * regex pre-tokenization (contractions, letter/number runs with an
    * optional leading space, punctuation runs, trailing-whitespace
    * lookahead), each pre-token's UTF-8 bytes mapped one-to-one onto the
    * printable bytes-to-unicode alphabet (space → 'Ġ' = U+0120), and the
    * same greedy merge loop with NO end-of-word marker. A merge list
    * trained externally in this convention parses with [[parseMerges]]
    * and applies through [[ByteLevel.tokens]]; the worked examples are
    * spec-pinned, equivalence with any specific released vocabulary file
    * is only as exact as that file's pairing with this segmentation.
    */
  object ByteLevel {

    /** The byte-level pre-tokenizer pattern (public convention). The
      * inline (?U) makes Java's \s/\S Unicode-aware like the reference
      * implementation's regex engine — without it U+00A0-class
      * whitespace lands in the punctuation alternative and segmentation
      * diverges on any non-ASCII-whitespace text. The flag rides the
      * pattern string so [[pretokenize]] and the distributed
      * `regexp_extract_all` learner compile identically.
      */
    private[ext] val PatternStr =
      """(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    private val Pattern = java.util.regex.Pattern.compile(PatternStr)

    /** byte value → alphabet char: printable single-byte chars map to
      * themselves; the rest take consecutive codepoints from 256 up
      * (the published bytes-to-unicode construction, which is what makes
      * 0x20 land on 'Ġ').
      */
    private[ext] val byteToChar: Array[Char] = {
      val printable = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
      val out = new Array[Char](256)
      var n = 0
      (0 until 256).foreach { b =>
        if (printable(b)) out(b) = b.toChar
        else { out(b) = (256 + n).toChar; n += 1 }
      }
      out
    }

    def pretokenize(s: String): Array[String] = {
      val m = Pattern.matcher(s)
      val buf = Array.newBuilder[String]
      while (m.find()) buf += m.group()
      buf.result()
    }

    /** One symbol per UTF-8 byte, in the byte alphabet. */
    def byteSymbols(tok: String): Vector[String] =
      tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .iterator.map(b => byteToChar(b & 0xff).toString).toVector

    /** Learn byte-level merges. The pre-token frequency table is computed
      * DISTRIBUTED with the native `regexp_extract_all` (no UDF in the
      * corpus pass); only the bounded top-`maxVocab` table reaches the
      * driver's merge loop.
      */
    def learn(docs: DataFrame, textCol: String, numMerges: Int,
        maxVocab: Int = 32768): BpeModel = {
      require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
      require(maxVocab > 0, s"maxVocab must be positive: $maxVocab")
      val wf = docs
        .select(explode(regexp_extract_all(qcol(textCol), lit(PatternStr), lit(0)))
          .as("__w"))
        .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc, col("__w"))
        .limit(maxVocab)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      learnFromVocab(wf.map { case (w, n) => (byteSymbols(w), n) }, numMerges)
    }

    /** Executor-side encoder twin of [[WordEncoder]], keyed by pre-token. */
    private final class ByteEncoder(merges: Vector[(String, String)]) extends Serializable {
      @transient private lazy val ranks: Map[(String, String), Int] =
        merges.zipWithIndex.toMap
      @transient private lazy val cache =
        scala.collection.mutable.HashMap.empty[String, Vector[String]]
      private val MaxCache = 65536
      def encode(t: String): Vector[String] = cache.get(t) match {
        case Some(v) => v
        case None =>
          val v = encodeSymbols(byteSymbols(t), ranks)
          if (cache.size < MaxCache) cache.update(t, v)
          v
      }
    }

    /** Byte-level BPE sub-token array (null text → empty array). */
    def tokens(text: Column, model: BpeModel): Column = {
      val enc = new ByteEncoder(model.merges)
      val f = udf { (s: String) =>
        if (s == null) Array.empty[String]
        else pretokenize(s).flatMap(enc.encode)
      }
      f(text)
    }

    /** Byte-level BPE sub-token count. */
    def tokenCount(text: Column, model: BpeModel): Column = {
      val enc = new ByteEncoder(model.merges)
      val f = udf { (s: String) =>
        if (s == null) 0
        else {
          var n = 0
          pretokenize(s).foreach(t => n += enc.encode(t).length)
          n
        }
      }
      f(text)
    }
  }
}
