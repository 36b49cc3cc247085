package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark's optimizer has no native operator for, composed
  * from shuffle + spilling-sort primitives (SURVEY §2 preference order:
  * compose existing ops before custom plans).
  */
object Joins {

  /** AS-OF join (point-in-time lookup): for every left row, attach the
    * payload of the single right row with the same key and the greatest
    * `rightTs <= leftTs` — "each event sees the latest snapshot at its
    * time". The naive formulation is a range join (`l.key = r.key AND
    * r.ts <= l.ts` + a max-per-row dedup) whose intermediate is
    * O(events × snapshots-per-key); this is the union + running-last
    * form instead:
    *
    *   1. interleave both sides, tagged, into one frame keyed by
    *      (key, ts, side) with right rows sorting BEFORE left rows on ts
    *      ties — that makes the match inclusive (`<=`, DuckDB ASOF
    *      semantics);
    *   2. one window per key ordered by (ts, side) carries the most
    *      recent right payload forward (`last(…, ignoreNulls)`);
    *   3. keep the left rows.
    *
    * Cost: ONE hash shuffle of both sides + one spilling external sort
    * per partition — O((|L|+|R|) log) with no pair blow-up, the same
    * shape as `sessionizeBatch`. A hot key is one big sort run, not an
    * OOM — measured (SkewSpec "asofJoin skew"): ALL 400k left rows on
    * one key costs ~3× the 512-key uniform spread on local[32], i.e.
    * the lost parallelism and nothing worse; a partitioned escalation
    * is not warranted at that bound. Left rows with a null key or null
    * ts (or keys absent from the
    * right) get a null payload, matching SQL ASOF LEFT JOIN.
    *
    * `payloadCols` are the right columns to attach; their names must not
    * collide with left columns. The internal plan reserves the column
    * names `__k __ts __side __l __r __m __tb*` — a `require` rejects
    * inputs using them rather than silently mis-joining.
    *
    * Duplicate right rows on (key, ts): without `rightTiebreak` the
    * carried payload is whichever duplicate the sort happens to place
    * last — nondeterministic run to run. Pass `rightTiebreak` columns
    * forming a total order over such duplicates (e.g. a snapshot id) to
    * pin the winner: the GREATEST tiebreak value wins.
    *
    * `tolerance` caps staleness (the point-in-time feature-lookup rule
    * "use the latest snapshot, but never one older than X"): a matched
    * snapshot with `rightTs < leftTs - tolerance` yields NULL payload —
    * the match is still the LATEST snapshot (never an older in-window
    * one), it is just refused when too stale. Pass an interval (for
    * timestamp ts) or numeric difference (for numeric ts).
    */
  private val Reserved = Set("__k", "__ts", "__side", "__l", "__r", "__m", "__rts")

  def asofJoin(
      left: DataFrame,
      leftKey: Column,
      leftTs: Column,
      right: DataFrame,
      rightKey: Column,
      rightTs: Column,
      payloadCols: Seq[String],
      rightTiebreak: Seq[Column] = Nil,
      tolerance: Option[Column] = None,
  ): DataFrame = {
    val bad = (left.columns ++ right.columns)
      .filter(c => Reserved(c) || c.startsWith("__tb")).distinct
    require(bad.isEmpty,
      s"asofJoin reserves internal column names ${Reserved.mkString(", ")} and the __tb* prefix; " +
        s"rename input column(s): ${bad.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val l = left.select(leftKey.as("__k"), leftTs.as("__ts"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"))
    // right rows with a null key/ts can never be the latest match of an
    // equality+<= join — drop them so they don't pollute the null-key
    // window partition that left null-key rows land in
    val tb = rightTiebreak.zipWithIndex.map { case (c, i) => c.as(s"__tb$i") }
    val r = right
      .filter(rightKey.isNotNull && rightTs.isNotNull)
      .select(Seq(rightKey.as("__k"), rightTs.as("__ts"), lit(0).as("__side"),
        // the snapshot's own ts rides inside the payload struct so the
        // staleness test can read it after the window carry
        struct(payloadCols.map(col) :+ rightTs.as("__rts"): _*).as("__r")) ++ tb: _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    // left rows carry null __tb*: irrelevant to the order because __side
    // already separates sides, and ties among left rows need no breaking
    // (each keeps its own payload lookup)
    val w = Window.partitionBy(col("__k"))
      .orderBy(Seq(col("__ts"), col("__side")) ++
        rightTiebreak.indices.map(i => col(s"__tb$i")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fresh = tolerance match {
      case Some(tol) => col("__m").getField("__rts") >= col("__ts") - tol
      case None => lit(true)
    }
    u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        payloadCols.map(c => when(fresh, col("__m").getField(c)).as(c)): _*)
  }

  /** Interval-containment (range) join: every (left interval, right
    * point) pair with `start <= ts <= end` (inclusive both ends, SQL
    * BETWEEN semantics), optionally under an extra equi-key. The naive
    * theta-join formulation has no equi-condition, so Spark executes it
    * as BroadcastNestedLoopJoin/Cartesian — O(|L|·|R|) pairs examined,
    * the classic range-join scale trap. This is the bucketized equi-join
    * form instead:
    *
    *   1. each interval EXPLODES into the fixed-width time buckets it
    *      overlaps (`sequence` of bucket indices — exact decimal floor
    *      division, no double rounding at micro-timestamp magnitudes);
    *   2. each point maps to its single bucket;
    *   3. an equi-join on (bucket, extra key) co-locates only rows that
    *      CAN match; the exact containment predicate then filters
    *      bucket-local pairs.
    *
    * Cost: |L|·(span/bucketWidth) + |R| rows through one hash shuffle;
    * candidate pairs are bucket-local instead of all-pairs. Size
    * `bucketWidth` near the typical interval length: too small
    * replicates intervals, too large widens bucket-local candidate sets.
    * A pathological interval replicates only ITS OWN row; intervals
    * spanning more than `maxBucketsPerInterval` buckets are DROPPED
    * (documented cap, same discipline as the dedup hot-bucket caps — a
    * runaway interval must not explode the build side). Inverted or
    * null intervals and null points drop (no match is possible) — and so
    * do rows whose EXTRA equi-key is null, on either side: the bucket
    * join has standard SQL equi-join null semantics, so a null tenant
    * key never matches anything (not even another null). Coalesce the
    * key to a sentinel before calling if null-matches-null is intended.
    *
    * `startExpr`/`endExpr`/`tsExpr` must be mutually comparable numerics
    * (for timestamps pass `unix_micros(col)`); left and right column
    * names must be disjoint (the output carries both sides' columns).
    *
    * `narrowPayload`: the default plan replicates each FULL left row
    * into every bucket it overlaps — right for the common
    * narrow-interval case (one extra copy of a session row costs
    * nothing). With a WIDE interval payload (feature structs, text) the
    * replication multiplies real bytes through the shuffle; `true`
    * switches to a (rowid, start, end, key)-only bucket join and
    * re-attaches the payload by rowid afterwards — one extra
    * left-row-sized equi-join (AQE broadcasts it when small) in exchange
    * for an exploded side that never carries payload. Same results,
    * bit for bit.
    */
  def rangeJoin(
      left: DataFrame,
      startExpr: Column,
      endExpr: Column,
      right: DataFrame,
      tsExpr: Column,
      bucketWidth: Long,
      leftExtraKey: Option[Column] = None,
      rightExtraKey: Option[Column] = None,
      maxBucketsPerInterval: Int = 10000,
      narrowPayload: Boolean = false,
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(leftExtraKey.isDefined == rightExtraKey.isDefined,
      "extra equi-keys must be given for both sides or neither")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"rangeJoin output carries both sides' columns; " +
      s"rename colliding column(s): ${dup.mkString(", ")}")
    // exact bucket index: decimal floor-division (a double divide loses
    // integer precision beyond 2^53 — micro-timestamps get close)
    def bidx(c: Column): Column =
      floor(c.cast("decimal(30,0)") / lit(bucketWidth)).cast("long")
    val lBase = left.select(struct(left.columns.map(col): _*).as("__l"),
        startExpr.cast("long").as("__s"), endExpr.cast("long").as("__e"),
        leftExtraKey.getOrElse(lit(0)).as("__xk"))
      .filter(col("__s").isNotNull && col("__e").isNotNull && col("__s") <= col("__e"))
      .filter(bidx(col("__e")) - bidx(col("__s")) < maxBucketsPerInterval)
    val r = right.select(struct(right.columns.map(col): _*).as("__r"),
        tsExpr.cast("long").as("__t"),
        rightExtraKey.getOrElse(lit(0)).as("__xk"))
      .filter(col("__t").isNotNull)
      .withColumn("__b", bidx(col("__t")))
    if (!narrowPayload) {
      val l = lBase.withColumn("__b",
        explode(sequence(bidx(col("__s")), bidx(col("__e")))))
      l.join(r, Seq("__b", "__xk"))
        .filter(col("__t") >= col("__s") && col("__t") <= col("__e"))
        .select(col("__l.*"), col("__r.*"))
    } else {
      // materialize the rowid ONCE (lineage cut): the exploded side and
      // the payload re-attach must agree on it, and
      // monotonically_increasing_id is only stable within one execution
      val keyed = lBase.withColumn("__rowid", monotonically_increasing_id())
        .localCheckpoint(eager = true)
      val lNarrow = keyed
        .select(col("__rowid"), col("__s"), col("__e"), col("__xk"))
        .withColumn("__b", explode(sequence(bidx(col("__s")), bidx(col("__e")))))
      val matched = lNarrow.join(r, Seq("__b", "__xk"))
        .filter(col("__t") >= col("__s") && col("__t") <= col("__e"))
        .select(col("__rowid"), col("__r"))
      matched.join(keyed.select(col("__rowid"), col("__l")), Seq("__rowid"))
        .select(col("__l.*"), col("__r.*"))
    }
  }

  /** Interval-OVERLAP join — the second interval-join shape beside
    * [[rangeJoin]]'s point-in-interval containment: every (left, right)
    * pair whose CLOSED intervals intersect, `ls ≤ re AND rs ≤ le`
    * (concurrent sessions, downtime × requests, campaign × visit
    * windows). A naive `ON ls <= re AND rs <= le` theta join falls to
    * BroadcastNestedLoop/Cartesian — the same scale trap rangeJoin
    * names — so both sides explode into their covered buckets and join
    * on the bucket equi-key.
    *
    * Dedup is STRUCTURAL, not a post-shuffle distinct: a pair sharing k
    * buckets would match k times, so each pair is emitted only in the
    * overlap's FIRST bucket — `__b = max(bidx(ls), bidx(rs))`, a
    * per-row predicate (the overlap begins at max(ls, rs) and bidx is
    * monotone, so that bucket is shared exactly once). Output is one
    * row per overlapping pair with both sides' columns (names must be
    * disjoint; null interval bounds drop; intervals wider than
    * `maxBucketsPerInterval` buckets are refused by filter, the
    * rangeJoin contract).
    *
    * Scale shape: shuffle keys are (bucket, extra equi-key); per-bucket
    * fan-out is the interval density the data actually has — the worst
    * case (everything overlaps everything) is the answer being
    * quadratic, not the plan. Width picks the trade: narrower buckets
    * → more replicas, smaller groups.
    */
  def overlapJoin(
      left: DataFrame,
      lStartExpr: Column,
      lEndExpr: Column,
      right: DataFrame,
      rStartExpr: Column,
      rEndExpr: Column,
      bucketWidth: Long,
      leftExtraKey: Option[Column] = None,
      rightExtraKey: Option[Column] = None,
      maxBucketsPerInterval: Int = 10000,
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(leftExtraKey.isDefined == rightExtraKey.isDefined,
      "extra equi-keys must be given for both sides or neither")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"overlapJoin output carries both sides' columns; " +
      s"rename colliding column(s): ${dup.mkString(", ")}")
    def bidx(c: Column): Column =
      floor(c.cast("decimal(30,0)") / lit(bucketWidth)).cast("long")
    def side(df: DataFrame, s: Column, e: Column, xk: Option[Column],
        tag: String): DataFrame =
      df.select(struct(df.columns.map(col): _*).as(s"__$tag"),
          s.cast("long").as(s"__${tag}s"), e.cast("long").as(s"__${tag}e"),
          xk.getOrElse(lit(0)).as("__xk"))
        .filter(col(s"__${tag}s").isNotNull && col(s"__${tag}e").isNotNull &&
          col(s"__${tag}s") <= col(s"__${tag}e"))
        .filter(bidx(col(s"__${tag}e")) - bidx(col(s"__${tag}s")) < maxBucketsPerInterval)
        .withColumn("__b",
          explode(sequence(bidx(col(s"__${tag}s")), bidx(col(s"__${tag}e")))))
    val l = side(left, lStartExpr, lEndExpr, leftExtraKey, "l")
    val r = side(right, rStartExpr, rEndExpr, rightExtraKey, "r")
    l.join(r, Seq("__b", "__xk"))
      .filter(col("__ls") <= col("__re") && col("__rs") <= col("__le"))
      // first-shared-bucket emission: exactly one row per pair
      .filter(col("__b") === greatest(bidx(col("__ls")), bidx(col("__rs"))))
      .select(col("__l.*"), col("__r.*"))
  }

  /** Set-similarity self-join with prefix filtering (AllPairs/PPJoin,
    * Bayardo et al. 2007 / Xiao et al. 2008): every pair of rows whose
    * token SETS have Jaccard ≥ `minJaccard`, without the all-pairs
    * cross join. Exact, not approximate — the candidate generation is
    * provably complete:
    *
    *   - order each set's tokens by a global total order (document
    *     frequency ascending, then token — rare-first maximizes
    *     pruning but ANY consistent order is correct);
    *   - a set of size n keeps only its first `n - ⌈τ·n⌉ + 1` tokens
    *     as its PREFIX: two sets with Jaccard ≥ τ must overlap in at
    *     least `⌈τ/(1+τ)·(|A|+|B|)⌉ > max(|A|,|B|) - prefix` tokens,
    *     so their prefixes share at least one token (pigeonhole);
    *   - candidates = pairs sharing a prefix token (plus the length
    *     filter `τ·|A| ≤ |B| ≤ |A|/τ`, also implied by Jaccard ≥ τ);
    *   - verify candidates exactly with `|A∩B| / |A∪B| ≥ τ`.
    *
    * Scale shape: the token-frequency table is one map-side-combining
    * aggregation; the prefix explode emits `O(Σ prefix)` narrow
    * (token, id, size) rows that shuffle on the token; verification
    * re-attaches the two token arrays by id (shuffle equi-joins) only
    * for surviving candidate pairs. On a Zipfian vocabulary the rare-
    * first prefixes land in SMALL token groups — the frequent-token
    * blow-up the ordering exists to avoid; like every blocked join
    * here the worst case (tiny vocabulary, near-identical sets) is the
    * data saying most pairs really ARE similar. Output:
    * (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4dp.
    */
  def setSimJoin(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      minJaccard: Double,
  ): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0, 1]: $minJaccard")
    val sets = df.select(col(idCol).cast("long").as("__id"),
        array_distinct(col(tokensCol)).as("__tok"))
      .filter(size(col("__tok")) > 0)
      .localCheckpoint(eager = true) // consumed by freq, prefix, verify
    val freq = sets.select(explode(col("__tok")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    // tokens re-collected in global (df, token) order; prefix length
    // n - ceil(τ·n) + 1 (for τ=1 that is 1: exact-duplicate blocking)
    val ordered = sets.select(col("__id"), explode(col("__tok")).as("__t"))
      .join(freq, Seq("__t"))
      .groupBy(col("__id"))
      .agg(transform(array_sort(collect_list(struct(col("__df"), col("__t")))),
        e => e("__t")).as("__tok"))
      .withColumn("__n", size(col("__tok")))
      // ⌈τ·n⌉ with an epsilon against fp overshoot: a product that lands
      // one ulp ABOVE an exact integer would otherwise shorten the
      // prefix by one and break completeness; the epsilon can only ever
      // LENGTHEN a prefix (safe — more candidates, same result)
      .withColumn("__pfx", slice(col("__tok"), lit(1),
        (col("__n") - ceil(lit(minJaccard) * col("__n") - lit(1e-9)) + 1)
          .cast("int")))
      .localCheckpoint(eager = true)
    val pfx = ordered.select(col("__id"), col("__n"), explode(col("__pfx")).as("__t"))
    val cand = pfx.as("a").join(pfx.as("b"),
        col("a.__t") === col("b.__t") && col("a.__id") < col("b.__id") &&
          // length filter: Jaccard ≥ τ forces τ·|A| ≤ |B| ≤ |A|/τ
          // (epsilon-relaxed: may only ADMIT extra candidates)
          col("b.__n").cast("double") >=
            lit(minJaccard) * col("a.__n") - lit(1e-9) &&
          col("a.__n").cast("double") >=
            lit(minJaccard) * col("b.__n") - lit(1e-9))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val inter = size(array_intersect(col("__ta"), col("__tb")))
    val jac = inter.cast("double") /
      (col("__na") + col("__nb") - inter).cast("double")
    cand
      .join(ordered.select(col("__id").as("id_a"), col("__tok").as("__ta"),
        col("__n").as("__na")), Seq("id_a"))
      .join(ordered.select(col("__id").as("id_b"), col("__tok").as("__tb"),
        col("__n").as("__nb")), Seq("id_b"))
      .filter(jac >= minJaccard)
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
  }

  /** Bloom semi-join reduction — the 100 TB shuffle-join preamble: build
    * a Bloom filter over the DIMENSION side's join keys and drop fact
    * rows that cannot match BEFORE the exchange, so the shuffle carries
    * the ~selectivity fraction instead of the whole fact table. The
    * filter hashes natively (`k` salted xxhash64 bit positions per key —
    * no oracle replays the bit array, so the hash family owes nothing to
    * engine portability) and is plan-literal: the `mBits/64` words
    * broadcast as an array literal, each probe is k codegen'd
    * element_at + bit tests — no join, no shuffle added. No false
    * negatives by construction, so `filtered ⨝ dim == fact ⨝ dim`
    * EXACTLY (the x_bloom_semijoin gate's oracle is the plain join);
    * false positives only cost shuffle bytes, bounded by the standard
    * (1 − e^(−kn/m))^k.
    *
    * Driver state is the bit array itself — `mBits/8` bytes, a CONSTANT
    * chosen for the dimension cardinality, never corpus-sized (the
    * distinct-position collect is capped by mBits).
    */
  def bloomSemiJoin(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      mBits: Int = 1 << 14, k: Int = 3): DataFrame = {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0 && mBits >= 64,
      s"mBits must be a power of two >= 64: $mBits")
    // the bit array rides the PLAN as an array literal and its distinct
    // set positions ride the driver — both scale with mBits, so cap it
    // (4 MiB of plan literal / ≤4M driver rows) before a caller turns
    // "never corpus-sized" into a 1<<26 plan blow-up
    require(mBits <= (1 << 22),
      s"mBits above 1<<22 would embed a ${mBits / 64}-word plan literal " +
        s"and collect up to $mBits driver rows: $mBits")
    require(k >= 1 && k <= 8, s"k out of range: $k")
    // xxhash64 with a per-function literal salt: the j-th hash is
    // hash("blj", key) — native, codegen, no string materialization.
    // Engine portability is NOT needed here: no oracle replays the bit
    // array (the Bloom guarantee — zero false negatives — holds for ANY
    // hash family, so gates compare against the PLAIN join); the old
    // md5-over-string-cast form cost ~3 md5s + 3 string casts per fact
    // row, the dominant CPU of the pre-filter it exists to make cheap.
    def pos(j: Int, key: Column): Column =
      pmod(xxhash64(lit(s"bl$j"), key), lit(mBits.toLong))
    // distinct set positions: ≤ mBits values (the collect bound is the
    // filter SIZE, not the dimension row count)
    val setBits = dim.select(explode(array(
        (0 until k).map(j => pos(j, dimKey)): _*)).as("__p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    setBits.foreach(p => words(p.toInt >> 6) |= (1L << (p.toInt & 63)))
    val wordArr = array(words.map(lit): _*)
    // single-bit masks as a literal lookup (shiftleft needs a literal
    // shift; a 64-entry element_at stays inside codegen)
    val masks = array((0 until 64).map(b => lit(1L << b)): _*)
    val hit = (0 until k).map { j =>
      val p = pos(j, factKey)
      (element_at(wordArr, (p / 64).cast("int") + 1)
        .bitwiseAND(element_at(masks, pmod(p, lit(64L)).cast("int") + 1))) =!= 0
    }.reduce(_ && _)
    fact.filter(hit)
  }
}
