package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Iterative graph analytics as DataFrame joins — the Pregel-lite
  * pattern: a bounded driver loop of FULLY DISTRIBUTED steps, each
  * iteration one (edges ⋈ ranks) shuffle + one aggregate, state
  * lineage-cut per round so iteration k+1 reads materialized blocks
  * instead of replaying k plans. The same discipline as the Lloyd
  * trainer in [[Similarity]]: the driver holds the loop COUNTER, never
  * data.
  */
object Graph {

  /** Fixed-iteration PageRank (Brin & Page 1998) over a directed edge
    * list:
    *
    *   r₀(v) = 1/N
    *   r_{k+1}(v) = (1−d)/N + d · Σ_{(u,v) ∈ E} r_k(u) / outdeg(u)
    *
    * The node set is every id appearing at either end. This is the
    * textbook no-dangling-redistribution form (sinks leak their mass
    * each round, total mass < 1 — fine for RANKING, which is what the
    * fixed-iteration form is for; add a dangling term before
    * interpreting scores as probabilities). Deterministic: the only
    * data-dependent arithmetic is double sums, which callers round at
    * the output (the gate pins 6dp equality against an unrolled SQL
    * replay).
    *
    * Scale shape: edges and the degree table are computed ONCE
    * (lineage-cut); each iteration shuffles (src-rank ⋈ edges) on the
    * edge key — exactly the join PageRank is, with map-side partial
    * aggregation of the incoming contributions. `iters` is small and
    * fixed (ranking stabilizes in tens of rounds); per-iteration state
    * is one (node, rank) frame, localCheckpointed so the plan never
    * deepens.
    *
    * Output: (`node`, `rank`).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val e = edges.select(qcol(srcCol).cast("long").as("__src"),
        qcol(dstCol).cast("long").as("__dst"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .localCheckpoint(eager = true) // re-read every iteration
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count().toDouble
    // out-degree attached to the edge list ONCE, outside the loop: the
    // old shape joined (ranks ⋈ outdeg) and then (⋈ e) EVERY iteration —
    // one whole shuffle join per round re-deriving a static property of
    // the graph. rank/deg arithmetic is unchanged (same divisor per
    // (src, dst) row), so every contribution — and the 8dp-rounded
    // output — is bit-identical.
    val eDeg = e.join(
        e.groupBy(col("__src")).agg(count(lit(1)).as("__deg")), Seq("__src"))
      .localCheckpoint(eager = true)
    var ranks = nodes.select(col("node"), (lit(1.0) / n).as("rank"))
    // the loop stays fully LAZY: with a small fixed iteration count the
    // caller's single action executes the whole chain as one job whose
    // per-round exchanges pipeline — the old per-round eager
    // localCheckpoint paid a blocking job + block materialization per
    // iteration to cut lineage that is only `iters` levels deep. The
    // driver still holds only the loop counter (Pregel-lite).
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(eDeg, col("node") === col("__src"))
        .select(col("__dst").as("node"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__in"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
    }
    ranks
  }

  /** Exact triangle count via degree-ordered orientation (the
    * compact-forward algorithm, Latapy 2008): simplify to undirected
    * distinct edges, orient every edge toward the higher (degree, id)
    * endpoint, and count wedges (x→y, x→z) closed by the oriented edge
    * (y→z). Each triangle {p ≺ q ≺ r} in the (degree, id) total order
    * carries exactly one pivot (p, with out-edges to q and r), so the
    * count is exact with no /3 correction — and the orientation is the
    * SKEW defense: a hub's edges orient INTO it (its degree is
    * maximal), so the wedge join's per-node fan-out is the oriented
    * out-degree, bounded by O(√|E|) on any graph rather than by the
    * hub degree. Three joins total (two for degrees, one wedge + one
    * closure semi-equi-join), everything equi-keyed and
    * partial-aggregated; the (degree, id) order is packed into one
    * int64 (`deg·2^32 + id`, exact while ids ∈ [0, 2^32)) so the
    * engines compare a single integer, not a struct. That id range is
    * ENFORCED at runtime (one scalar agg over the already-checkpointed
    * edge set): snowflake-style 64-bit ids would silently collide in
    * the packed key and mis-orient edges, producing a wrong count with
    * no error — so out-of-range ids throw instead.
    *
    * Output: one row, (`n_triangles`).
    */
  /** Fixed-iteration label propagation (Raghavan et al. 2007) — the
    * near-linear community detector: every node starts as its own
    * community, then `iters` SYNCHRONOUS rounds of "adopt the MODE of
    * your neighbors' labels" (ties: smallest label — the deterministic
    * variant, so the trajectory replays in a second engine; classic LPA
    * breaks ties randomly). Edges are treated as undirected (both
    * orientations unioned, duplicates collapsed); isolated nodes cannot
    * occur (the node set IS the edge endpoints). Fixed iteration count
    * for the same reason as [[pageRank]]: a convergence test would make
    * the output depend on comparison order; the x_communities_lp oracle
    * unrolls every round.
    *
    * Scale shape per round: one (edges ⋈ labels) shuffle join, one
    * (node, label) count aggregate, one node-keyed window — linear in
    * |E|, the Pregel-lite discipline, labels lineage-cut per round.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    val e0 = edges.select(qcol(srcCol).cast("long").as("a"),
      qcol(dstCol).cast("long").as("b"))
    val e = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(eager = true) // every round re-reads the edges
    var labels = e.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("community"))
    for (i <- 1 to iters) {
      labels = e
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node"), col("community"))
        .agg(count(lit(1)).as("__c"))
        // mode-with-smallest-label-tiebreak as ONE hash aggregate:
        // min(struct(-c, community)) is lexicographic (largest count,
        // then smallest label) — exactly the row the old
        // row_number-over-(c desc, community) window kept, without the
        // window's per-round sort (hash agg with map-side partials
        // instead; the node-keyed exchange is the same either way)
        .groupBy(col("node"))
        .agg(min(struct((-col("__c")).as("__nc"),
          col("community"))).as("__m"))
        .select(col("node"), col("__m.community").as("community"))
      // the rounds chain LAZILY (one job, exchanges pipeline); lineage
      // is cut only when a deep custom iteration count would grow the
      // plan — the old shape paid an eager checkpoint job every round
      if (i % 5 == 0 && i < iters)
        labels = labels.localCheckpoint(eager = true)
    }
    labels
  }

  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(qcol(srcCol).cast("long").as("__u"),
        qcol(dstCol).cast("long").as("__v"))
      .filter(col("__u").isNotNull && col("__v").isNotNull &&
        col("__u") =!= col("__v"))
      .select(least(col("__u"), col("__v")).as("__a"),
        greatest(col("__u"), col("__v")).as("__b"))
      .distinct()
      .localCheckpoint(eager = true) // degree pass + orientation read it
    // packed-key domain guard: one scalar agg over the checkpointed edge
    // set (tiny vs the wedge join it protects)
    val idRange = raw.agg(min(col("__a")).as("mn"),
      max(greatest(col("__a"), col("__b"))).as("mx")).head()
    if (!idRange.isNullAt(0)) {
      val (mn, mx) = (idRange.getLong(0), idRange.getLong(1))
      require(mn >= 0L && mx < 4294967296L,
        s"triangleCount: node ids must be in [0, 2^32) for the packed " +
          s"(degree, id) orientation key; got range [$mn, $mx]")
    }
    val deg = raw.select(explode(array(col("__a"), col("__b"))).as("__n"))
      .groupBy(col("__n")).agg(count(lit(1)).as("__c"))
    val keyed = raw
      .join(deg.select(col("__n").as("__a"), (col("__c") * 4294967296L + col("__a")).as("__ka")), Seq("__a"))
      .join(deg.select(col("__n").as("__b"), (col("__c") * 4294967296L + col("__b")).as("__kb")), Seq("__b"))
    val e = keyed.select(
        when(col("__ka") < col("__kb"), col("__a")).otherwise(col("__b")).as("__s"),
        when(col("__ka") < col("__kb"), col("__b")).otherwise(col("__a")).as("__d"),
        greatest(col("__ka"), col("__kb")).as("__kd"))
      .localCheckpoint(eager = true) // wedge sides + closure read it
    val w = e.select(col("__s"), col("__d").as("__d1"), col("__kd").as("__k1"))
      .join(e.select(col("__s"), col("__d").as("__d2"), col("__kd").as("__k2")),
        Seq("__s"))
      .filter(col("__k1") < col("__k2"))
    w.join(e.select(col("__s").as("__d1"), col("__d").as("__d2")),
        Seq("__d1", "__d2"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
