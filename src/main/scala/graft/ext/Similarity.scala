package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Cols.qcol

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`).
  *
  * Scale design: the query set is broadcast (ANN queries are dimension-
  * sized); the corpus scan stays a single pass. Brute force is the exact
  * baseline — one broadcast nested-loop join, cosine in codegen'd array
  * expressions, top-k per query via window. The IVF variant prunes the scan
  * to `nprobe` of `nlist` centroid partitions — the classic inverted-file
  * ANN layout — with centroids learned by a deterministic Lloyd iteration
  * expressed as Spark aggregations (posexplode → per-dimension mean), no
  * driver-side math.
  */
object Similarity {

  /** Cosine similarity of two equal-length float/double array columns
    * (computed in double) — the native single-pass codegen Expression
    * (graft.plans.CosineSimilarity); `cosineDeclarative` keeps the
    * built-in-functions form for reference/testing.
    */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSimilarity(a, b)

  def cosineDeclarative(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / (norm(a) * norm(b))
  }

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Exact top-k cosine neighbors for each query vector (self-matches by id
    * excluded). Queries are broadcast; ties broken by neighbor id.
    *
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
  ): DataFrame = {
    val q = queries.select(qcol(idCol).cast("long").as("query_id"), qcol(vecCol).as("__qv"))
    val c = corpus.select(qcol(idCol).cast("long").as("neighbor_id"), qcol(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(scored, "cosine", "neighbor_id", k)
  }

  /** Shared top-k epilogue for every ranked retrieval operator: rank per
    * query by the score ROUNDED to `roundTo` decimals, then the id —
    * last-ulp float differences (summation order, engine libm) collapse
    * into the deterministic id tiebreak, so rankings reproduce across
    * engines and runs. Output: (query_id, rank, idCol, scoreCol).
    */
  private[ext] def topKPerQuery(scored: DataFrame, scoreCol: String,
      idCol: String, k: Int, roundTo: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col(scoreCol), roundTo).desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol),
        round(col(scoreCol), roundTo).as(scoreCol))
  }

  /** Random-hyperplane LSH bucket id (nBits sign bits) — the classic
    * SimHash-for-vectors blocking key: cosine-similar vectors land in the
    * same bucket with probability (1 - θ/π)^nBits. Hyperplanes are
    * plan-time literals from a fixed seed; the sign test reuses the native
    * codegen cosine (sign(cos) = sign(dot)). Use as `blockCol` for
    * Dedup.embeddingCosinePairs on unlabeled corpora.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int = 8, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (h, k) =>
      val hCol = array(h.map(x => lit(x)): _*)
      when(cosine(vec, hCol) > 0, lit(1 << k)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** [[hyperplaneBucket]] in ENGINE-PORTABLE integer arithmetic: the
    * vector is quantized to 1e-6 resolution (`round(x·10^6)` as int64 —
    * half-away-from-zero, the rounding rule engines agree on), plane
    * components are md5-derived integers in [-1000, 1000]
    * (`md5Prefix15("hp:k:j") % 2001 - 1000`, [[PortableHash]]), and each
    * sign bit is the sign of an exact 64-bit integer dot product — no
    * float summation anywhere, so no engine's accumulation ORDER can
    * flip a boundary bit and the whole bucketing replays bit-for-bit in
    * SQL. Sign flips vs the float form matter only for vectors within
    * quantization noise of a hyperplane — the same measure-zero band
    * where the float form is itself seed-arbitrary.
    */
  def hyperplaneBucketPortable(vec: Column, dim: Int, nBits: Int = 8): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.plans.PortableHyperplaneBucket(
        org.apache.spark.sql.GraftSqlBridge.expression(vec), dim, nBits))

  /** The declarative reference of [[hyperplaneBucketPortable]] — kept as
    * the spec's independent pin of the native expression (and as the
    * readable statement of the arithmetic the DuckDB oracle replays).
    * Interpreted HOFs re-walk the vector per plane; use the native form
    * on hot paths.
    */
  private[ext] def hyperplaneBucketPortableRef(vec: Column, dim: Int,
      nBits: Int = 8): Column = {
    val q = transform(vec, x => round(x.cast("double") * lit(1e6)).cast("long"))
    // bind the quantized vector as a lambda variable so it evaluates once
    // per row, not once per plane (the shingles() binding trick)
    element_at(transform(array(q), qq =>
      (0 until nBits).map { k =>
        val plane = array((0 until dim).map(j =>
          lit(PortableHash.md5Prefix15(s"hp:$k:$j") % 2001 - 1000)): _*)
        val dot = aggregate(zip_with(qq, plane, (a, w) => a * w),
          lit(0L), (acc, t) => acc + t)
        when(dot > 0, lit(1 << k)).otherwise(lit(0))
      }.reduce((a, b) => a.bitwiseOR(b))), 1)
  }

  /** Uncentered-PCA rotation (the FAISS `PCAMatrix` analog, trained
    * about the ORIGIN): eigenvectors of the corpus's second-moment
    * matrix E[xxᵀ], sorted by eigenvalue descending. No centering, so
    * the transform is a PURE rotation — inner products and cosines are
    * preserved EXACTLY (the isometry gate pins it), while energy
    * compacts into the leading dimensions, which is what makes a
    * subsequent product quantizer's equal-width subspace split better
    * conditioned (the classic OPQ initialization).
    *
    * Distributed part: one bounded-sample pass accumulates the d²
    * moments (flat outer product → posexplode → per-cell sum — map-side
    * combined). Driver part: a cyclic Jacobi eigensolver on the d×d
    * symmetric matrix — dimension-sized math, the same driver budget as
    * the SQ bounds or a FAISS training, never data-sized. Deterministic:
    * fixed sweep order, eigenvalue-descending order with index
    * tiebreak, sign-normalized eigenvectors.
    *
    * Returns the rotation as row vectors: y = R·x, yᵢ = ⟨R(i), x⟩.
    */
  def pcaRotation(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, maxTrainRows: Int = 4096): Array[Array[Double]] = {
    require(dim > 0, s"dim must be positive: $dim")
    val base = corpus.select(qcol(idCol).cast("long").as("__sid0"),
      qcol(vecCol).as("__v"))
    val sample = trainSampleIds(base, "__sid0", maxTrainRows) match {
      case Some(ids) =>
        base.join(broadcast(ids), col("__sid0") === col("__sid")).drop("__sid")
          .localCheckpoint(eager = true)
      case None => base
    }
    val n = sample.count().toDouble
    require(n > 0, "pcaRotation needs a non-empty corpus")
    val d = dim
    // contract check BEFORE the moment pass: a short or null-holed vector
    // would surface later as a cryptic NoSuchElementException/NPE on the
    // per-cell sums map (a null cell nulls the whole cell sum) — fail
    // loudly at the boundary instead, naming the offending rows
    val bad = sample.filter(size(col("__v")) =!= d ||
        exists(col("__v"), x => x.isNull))
      .select(col("__sid0")).limit(5).collect().map(_.getLong(0))
    require(bad.isEmpty,
      s"pcaRotation requires every training vector to have exactly $d " +
        s"non-null elements; violating ids (first ${bad.length}): " +
        bad.mkString(", "))
    val flat = sample.select(posexplode(
      transform(sequence(lit(0), lit(d * d - 1)), k => {
        val i = ((k - pmod(k, lit(d))) / lit(d)).cast("int")
        val j = pmod(k, lit(d)).cast("int")
        element_at(col("__v"), i + 1).cast("double") *
          element_at(col("__v"), j + 1).cast("double")
      })))
    val sums = flat.groupBy(col("pos")).agg(sum(col("col")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val moment = Array.tabulate(d, d)((i, j) => sums(i * d + j) / n)
    val (eigvals, eigvecs) = jacobiEigen(moment) // eigvecs: columns
    val order = eigvals.indices.sortBy(i => (-eigvals(i), i))
    order.toArray.map { col0 =>
      val v = Array.tabulate(d)(r => eigvecs(r)(col0))
      // deterministic sign: first non-negligible component positive
      val s = v.find(math.abs(_) > 1e-12).map(math.signum).getOrElse(1.0)
      if (s < 0) v.map(-_) else v
    }
  }

  /** OPQ rotation (Ge et al., "Optimized Product Quantization", CVPR'13
    * — non-parametric alternating minimization): the orthogonal
    * transform PCA-PQ only approximates, trained by alternating
    *   (1) fix R, train PQ codebooks on the rotated sample and quantize;
    *   (2) fix the reconstructions X̂, solve the orthogonal Procrustes
    *       problem min_R ||R·X − X̂||_F — R = V·Uᵀ from the SVD of
    *       M = Σᵢ xᵢ x̂ᵢᵀ.
    * Initialized at the [[pcaRotation]] (the standard OPQ init), so an
    * OPQ with zero iterations IS PCA-PQ. All alternation runs on the
    * BOUNDED driver sample — the FAISS `OPQMatrix` training budget:
    * sample×d doubles on the driver, d×d Procrustes math per iteration,
    * never data-sized. Deterministic end to end (hash-ordered sample,
    * first-distinct k-means init, fixed iteration counts, the Jacobi
    * eigensolver's fixed sweeps). Returns row vectors: y = R·x.
    */
  def opqRotation(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, opqIters: Int = 3,
      maxTrainRows: Int = 1024): Array[Array[Double]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(opqIters >= 0, s"opqIters must be non-negative: $opqIters")
    val base = corpus.select(qcol(idCol).cast("long").as("__sid0"),
      qcol(vecCol).as("__v"))
    val sample = trainSampleIds(base, "__sid0", maxTrainRows) match {
      case Some(ids) =>
        base.join(broadcast(ids), col("__sid0") === col("__sid")).drop("__sid")
      case None => base
    }
    // driver-side training matrix, id-ordered for determinism
    val x = sample.orderBy(col("__sid0")).select(col("__v"))
      .collect().map(_.getSeq[Any](0).toArray.map {
        case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"non-numeric vector element: $other")
      })
    require(x.nonEmpty, "opqRotation needs a non-empty corpus")
    require(x.forall(_.length == dim),
      s"opqRotation requires every training vector to have exactly $dim elements")
    var r = pcaRotation(corpus, idCol, vecCol, dim, maxTrainRows)
    val sub = dim / m
    for (_ <- 0 until opqIters) {
      val y = x.map(v => Array.tabulate(dim)(i =>
        { var s = 0.0; var j = 0; while (j < dim) { s += r(i)(j) * v(j); j += 1 }; s }))
      // per-subspace codebooks on the rotated sample, then reconstruct
      val xhat = Array.fill(y.length)(new Array[Double](dim))
      for (s0 <- 0 until m) {
        val pts = y.map(_.slice(s0 * sub, (s0 + 1) * sub))
        val cents = lloydDriver(pts, ksub, iters = 4)
        pts.zipWithIndex.foreach { case (p, i) =>
          val c = cents(nearest(p, cents))
          System.arraycopy(c, 0, xhat(i), s0 * sub, sub)
        }
      }
      // Procrustes: M = Σ x x̂ᵀ; R = V·Uᵀ maximizes tr(R·M)
      val mm = Array.fill(dim, dim)(0.0)
      var i = 0
      while (i < x.length) {
        var a = 0
        while (a < dim) {
          var b = 0
          while (b < dim) { mm(a)(b) += x(i)(a) * xhat(i)(b); b += 1 }
          a += 1
        }
        i += 1
      }
      r = procrustesRotation(mm)
    }
    r
  }

  /** Deterministic driver k-means for the OPQ inner loop: first-ksub-
    * distinct init (id-ordered points), fixed Lloyd iterations, empty
    * clusters keep their centroid.
    */
  private def lloydDriver(pts: Array[Array[Double]], ksub: Int,
      iters: Int): Array[Array[Double]] = {
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    pts.foreach { p =>
      if (init.length < ksub && seen.add(p.toSeq)) init += p.clone()
    }
    while (init.length < ksub) init += init(init.length % math.max(1, seen.size)).clone()
    var cents = init.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(ksub)(new Array[Double](pts.head.length))
      val counts = new Array[Long](ksub)
      pts.foreach { p =>
        val c = nearest(p, cents)
        counts(c) += 1
        var j = 0
        while (j < p.length) { sums(c)(j) += p(j); j += 1 }
      }
      cents = Array.tabulate(ksub)(c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c)))
    }
    cents
  }

  private def nearest(p: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var j = 0
      while (j < p.length) { val t = p(j) - cents(c)(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** R = V·Uᵀ from the SVD M = U·S·Vᵀ — the orthogonal Procrustes
    * solution. V comes from the Jacobi eigendecomposition of MᵀM;
    * U columns are M·vᵢ/sᵢ (pairing preserved), with near-null singular
    * directions completed by Gram–Schmidt against the accepted columns
    * (any orthogonal completion is optimal there).
    */
  private def procrustesRotation(mIn: Array[Array[Double]]): Array[Array[Double]] = {
    val d = mIn.length
    val mtm = Array.tabulate(d, d)((i, j) => {
      var s = 0.0; var k = 0
      while (k < d) { s += mIn(k)(i) * mIn(k)(j); k += 1 }
      s
    })
    val (ev, evec) = jacobiEigen(mtm)
    val order = ev.indices.sortBy(i => (-ev(i), i)).toArray
    val v = order.map(c => Array.tabulate(d)(rr => evec(rr)(c))) // rows = vᵢ
    val sVals = order.map(i => math.sqrt(math.max(ev(i), 0.0)))
    val scale = math.max(sVals.headOption.getOrElse(0.0), 1e-300)
    val u = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    for (i <- 0 until d) {
      val cand =
        if (sVals(i) > 1e-12 * scale)
          Array.tabulate(d)(rr => {
            var s = 0.0; var k = 0
            while (k < d) { s += mIn(rr)(k) * v(i)(k); k += 1 }
            s / sVals(i)
          })
        else {
          // complete the basis: first canonical vector with a non-trivial
          // residual against the accepted columns
          var pick: Array[Double] = null
          var e = 0
          while (pick == null && e < d) {
            val cand0 = Array.tabulate(d)(rr => if (rr == e) 1.0 else 0.0)
            u.foreach { uc =>
              var dot = 0.0; var k = 0
              while (k < d) { dot += cand0(k) * uc(k); k += 1 }
              var k2 = 0
              while (k2 < d) { cand0(k2) -= dot * uc(k2); k2 += 1 }
            }
            val n = math.sqrt(cand0.map(t => t * t).sum)
            if (n > 1e-9) pick = cand0.map(_ / n)
            e += 1
          }
          require(pick != null, "procrustes basis completion failed")
          pick
        }
      // re-orthonormalize against earlier columns (numerical hygiene)
      u.foreach { uc =>
        var dot = 0.0; var k = 0
        while (k < d) { dot += cand(k) * uc(k); k += 1 }
        var k2 = 0
        while (k2 < d) { cand(k2) -= dot * uc(k2); k2 += 1 }
      }
      val n = math.sqrt(cand.map(t => t * t).sum)
      require(n > 1e-12, "procrustes produced a degenerate column")
      u += cand.map(_ / n)
    }
    // R = V·Uᵀ: R(i)(j) = Σ_k V(k,i?)… with v rows = vᵢ and u rows = uᵢ:
    // R = Σᵢ vᵢ uᵢᵀ, so R(a)(b) = Σᵢ v(i)(a)·u(i)(b)
    Array.tabulate(d, d)((a, b) => {
      var s = 0.0; var i = 0
      while (i < d) { s += v(i)(a) * u(i)(b); i += 1 }
      s
    })
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector COLUMNS). Deterministic fixed sweep
    * order; converges quadratically — 64 sweeps is far past machine
    * precision for any conditioning.
    */
  private def jacobiEigen(m0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = m0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-22) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else 1.0 / (theta - math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = c * c * app - 2 * s * c * apq + s * s * aqq
            a(q)(q) = s * s * app + 2 * s * c * apq + c * c * aqq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var k = 0
            while (k < d) {
              if (k != p && k != q) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
                a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
              }
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Apply a rotation (row-vector form) to a vector column — one
    * codegen'd higher-order-function pass, the matrix riding as an
    * array literal (d² doubles: dimension-sized, never data-sized).
    * Output is `array<double>`.
    */
  def rotateExpr(vec: Column, r: Array[Array[Double]]): Column = {
    val rows = typedLit(r.map(_.toSeq).toSeq)
    transform(sequence(lit(0), lit(r.length - 1)), i =>
      aggregate(
        zip_with(vec, element_at(rows, i + 1),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, t) => acc + t))
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most cosine-similar corpus vectors with a DIFFERENT label — the
    * "looks like a positive, isn't one" examples that make embedding-
    * model batches informative. Same broadcast scan shape as
    * [[bruteForceTopK]] (queries with labels broadcast, corpus in one
    * pass) with the label disagreement folded into the join predicate,
    * so pruning happens before any score is computed. Label comparison
    * is SQL `IS DISTINCT FROM`: a null-label corpus row IS a negative
    * for every labeled query (and vice versa), but two null labels
    * compare EQUAL under that operator, so a null-label query never
    * mines null-label corpus rows. Compose with the IVF/BQ layouts for
    * sub-linear candidate generation when the corpus outgrows the
    * brute-force pass.
    *
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def hardNegativesTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
  ): DataFrame = {
    val q = queries.select(qcol(idCol).cast("long").as("query_id"),
      qcol(vecCol).as("__qv"), qcol(labelCol).as("__ql"))
    val c = corpus.select(qcol(idCol).cast("long").as("neighbor_id"),
      qcol(vecCol).as("__cv"), qcol(labelCol).as("__cl"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          !(col("__ql") <=> col("__cl")))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(scored, "cosine", "neighbor_id", k)
  }

  /** Binary quantization (BQ) sketch: the vector's per-dimension sign
    * bits (`xᵢ > 0`) packed into `⌈dim/64⌉` longs — 1 bit per dimension,
    * a 32× compression over float32. For cosine search the sign sketch
    * IS the axis-aligned special case of random-hyperplane SRP (the
    * hyperplanes are the coordinate axes), so hamming distance between
    * sketches estimates the angle; the modern vector-store recipe
    * (binary quantization + exact rescore of a shortlist) keeps the
    * corpus-sized pass at one `xor`+`popcount` per word. Pure codegen
    * higher-order-function expressions — no UDF.
    */
  def signSketch(vec: Column, dim: Int): Column = {
    val nWords = (dim + 63) / 64
    transform(sequence(lit(0), lit(nWords - 1)), w =>
      aggregate(
        // zip_with pads the last word's short slice with nulls; the
        // null branch of `when` falls through to 0 bits, so a dim that
        // is not a multiple of 64 just leaves the high bits clear
        zip_with(slice(vec, w * lit(64) + lit(1), lit(64)),
          sequence(lit(0), lit(63)),
          (x, b) => when(x > 0, call_function("shiftleft", lit(1L), b))
            .otherwise(lit(0L))),
        lit(0L), (acc, v) => acc.bitwiseOR(v)))
  }

  /** Hamming distance between two [[signSketch]] word arrays: summed
    * `popcount(xor)` per word — the whole corpus-side scan cost of a BQ
    * search.
    */
  def signHamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("int")),
      lit(0), (acc, h) => acc + h)

  /** Top-k cosine search through a binary-quantization scan: rank the
    * corpus per query by sketch hamming (1 bit/dim — the scan reads
    * `dim/8` bytes per vector instead of `4·dim`), keep a `shortlist`
    * of candidates, then rescore EXACTLY the shortlist with full-
    * precision cosine. Self-matches by id are excluded; hamming ties
    * and score ties break by neighbor id, so the result is fully
    * deterministic (and engine-replayable).
    *
    * Scale shape: queries (with their sketches) broadcast into a single
    * narrow corpus pass that emits only (query_id, neighbor_id, hamming);
    * the shortlist window shuffles those 12-byte rows, never vectors;
    * full-precision vectors are read again ONLY for the
    * `nq × shortlist` survivors (broadcast semi-shape join against the
    * corpus scan — column pruning keeps the first pass from ever
    * reading the float arrays when the sketch is precomputed). Like
    * brute force this scans all N sketches; the win over
    * [[bruteForceTopK]] is bandwidth (1 bit vs 32 per dimension) and
    * the xor+popcount inner loop — for sub-linear candidate counts
    * compose with the IVF layouts instead. `shortlist` trades recall
    * for rescore cost exactly like nprobe.
    *
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def binarySketchTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      shortlist: Int = 50,
  ): DataFrame =
    bqSearch(
      queries.select(qcol(idCol).cast("long").as("query_id"),
        qcol(vecCol).as("__qv"), signSketch(qcol(vecCol), dim).as("__qs")),
      corpus.select(qcol(idCol).cast("long").as("neighbor_id"),
        signSketch(qcol(vecCol), dim).as("__cs")),
      corpus.select(qcol(idCol).cast("long").as("neighbor_id"),
        qcol(vecCol).as("__cv")),
      k, shortlist)

  /** The shared BQ search core (in-query form above, persisted-index
    * form in [[AnnIndex.bqTopK]]): `q` = (query_id, __qv, __qs), `sigs`
    * = (neighbor_id, __cs), `vecs` = (neighbor_id, __cv). Hamming scan →
    * per-query shortlist (narrow 12-byte rows through the window) →
    * exact cosine rescore of the `nq × shortlist` survivors via
    * broadcast joins against the vector source.
    */
  private[ext] def bqSearch(q: DataFrame, sigs: DataFrame, vecs: DataFrame,
      k: Int, shortlist: Int): DataFrame = {
    val qc = q.localCheckpoint(eager = false) // tiny; consumed by both passes (lazy: one action)
    val ham = sigs.join(broadcast(qc.select(col("query_id"), col("__qs"))),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        signHamming(col("__qs"), col("__cs")).as("__h"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__h"), col("neighbor_id"))
    val short = ham.withColumn("__hr", row_number().over(w))
      .filter(col("__hr") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = vecs
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qc.select(col("query_id"), col("__qv"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(rescored, "cosine", "neighbor_id", k)
  }

  /** Element-wise mean of grouped vectors (per-dimension avg via
    * posexplode), used by the Lloyd step. Returns (groupCol, centroid).
    */
  private def meanVectors(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(qcol(vecCol)).as(Seq("__pos", "__x")))
      .groupBy(col(groupCol), col("__pos"))
      .agg(avg(col("__x")).as("__m"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
        e => e("__m")).as("centroid"))

  /** Assign each vector the id of its nearest centroid. Broadcast nested
    * loop + partial-aggregated max-by (no window shuffle of the corpus):
    * the (cosine, -cid, cid) struct max picks highest similarity, smallest
    * cid on ties.
    */
  private[graft] def assign(df: DataFrame, cols: (String, String), centroids: DataFrame): DataFrame = {
    val (idCol, vecCol) = cols
    val scored = df.crossJoin(broadcast(centroids))
      .select(qcol(idCol).as("__aid"), qcol(vecCol).as("__av"),
        struct(cosine(qcol(vecCol), col("centroid")).as("s"),
          (lit(0) - col("__cid")).as("tb"), col("__cid").as("cid")).as("__sc"))
    scored.groupBy(col("__aid"))
      .agg(first(col("__av")).as("__av"), max(col("__sc")).as("__m"))
      .select(col("__aid").as(idCol), col("__av").as(vecCol),
        col("__m").getField("cid").as("__cluster"))
  }

  /** Bounded deterministic training input for the ANN index builders —
    * the FAISS discipline: learn codebooks/centroids from a SAMPLE, then
    * assign/encode the full corpus exactly once. At 100 TB you never run
    * multiple full-corpus Lloyd passes (each expanding k-way through the
    * centroid broadcast) to learn a handful of centroids.
    *
    * Selection is the `cap` lowest md5(id) digests — content-keyed like
    * [[Sampling.hashSample]] (stable under repartitioning, retries and
    * incremental appends), made EXACT without a corpus-wide sort by a
    * two-step plan: a map-only digest-threshold prefilter sized to ~2·cap
    * expected survivors (one pass, no shuffle), then the precise top-cap
    * TakeOrdered over that bounded remainder. The prefilter population is
    * binomial, so a shortfall below cap is possible (vanishingly so at
    * the 2× headroom, but tiny caps see it) — in that case the
    * TakeOrdered falls back to the unfiltered ids (still no global
    * sort), keeping the result the true cap lowest digests in every
    * case. Returns None when the corpus already fits the cap (training
    * on everything is then both cheaper and exact); `cap = Int.MaxValue`
    * skips even the count — the mechanics gates use it to pin
    * training == corpus.
    */
  private[ext] def trainSampleIds(
      corpus: DataFrame, idCol: String, cap: Int): Option[DataFrame] = {
    require(cap > 0, s"training cap must be positive: $cap")
    if (cap == Int.MaxValue) return None
    val ids = corpus.select(qcol(idCol).cast("long").as("__sid"))
    val n = ids.count()
    if (n <= cap) return None
    val h = md5(col("__sid").cast("string"))
    val rate = math.min(1.0, 2.0 * cap / n)
    val pre = ids.filter(h < lit(Sampling.rateToHex(rate)))
      .localCheckpoint(eager = true) // counted, then read again by the top-cap
    val base = if (pre.count() >= cap) pre else ids
    Some(base.orderBy(h, col("__sid"))
      .limit(cap)
      .localCheckpoint(eager = true))
  }

  /** Restrict `df` to the bounded training sample (broadcast semi-join on
    * the sampled ids — the sample is cap-bounded by construction), or
    * return it unchanged when the corpus already fits the cap. The
    * sampled frame is checkpointed: every Lloyd iteration re-reads ≤ cap
    * stored rows instead of re-scanning the corpus.
    */
  private def trainingFrame(df: DataFrame, idCol: String, cap: Int,
      idExpr: Column): DataFrame =
    trainSampleIds(df, idCol, cap) match {
      case Some(ids) =>
        df.join(broadcast(ids), idExpr === col("__sid")).drop("__sid")
          .localCheckpoint(eager = true)
      case None => df
    }

  /** Train `nlist` centroids with `iters` Lloyd iterations; deterministic
    * init from the `nlist` lowest ids (TakeOrdered — no global sort).
    * Training input is capped at `maxTrainRows` rows (≤ 0 → the
    * FAISS-style default 100·nlist; Int.MaxValue → full corpus) via
    * [[trainSampleIds]]; callers assign the FULL corpus against the
    * returned centroids exactly once. Returns (__cid, centroid).
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String, nlist: Int, iters: Int = 2,
      maxTrainRows: Int = 0,
  ): DataFrame = {
    val cap = if (maxTrainRows <= 0) 100 * nlist else maxTrainRows
    val train = trainingFrame(corpus, idCol, cap, qcol(idCol).cast("long"))
    val init = train.orderBy(qcol(idCol)).limit(nlist)
    // nlist rows only — the constant partition key states the intent
    // (bounded single-partition numbering) instead of tripping the
    // "no partition defined" scale warning on every run
    val w0 = Window.partitionBy(lit(0)).orderBy(qcol(idCol))
    var centroids = init
      .withColumn("__rn", row_number().over(w0))
      .select((col("__rn") - 1).as("__cid"), qcol(vecCol).as("centroid"))
    var i = 0
    while (i < iters) {
      val assigned = assign(train, (idCol, vecCol), centroids)
      centroids = meanVectors(assigned, "__cluster", vecCol)
        .withColumnRenamed("__cluster", "__cid")
      i += 1
    }
    // nlist rows, consumed by BOTH the corpus assignment and the probe
    // selection (and by every Lloyd iteration's lazy chain): localCheckpoint
    // materializes the training ONCE and cuts its lineage — consumers read
    // nlist stored rows, no cacheManager entry to leak across queries
    // (blocks are GC-released with the frame)
    centroids.localCheckpoint(eager = true)
  }

  /** Per-group per-dimension embedding mean in flat (group, dim, mean)
    * shape — the curation-side aggregate (per-label/cluster centroids for
    * drift checks, cluster-based filtering, label prototypes). One
    * explode + one hash aggregate: partial aggregation map-side, shuffle
    * carries (group, dim) partials only — never vectors.
    */
  def groupCentroidsFlat(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(qcol(groupCol).as("label"), posexplode(qcol(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("__x")).as("mean"))

  // --------------------------------------------- product quantization
  /** Product-quantization ANN — the memory-bounded third leg beside brute
    * force and IVF. Vectors are L2-normalized, split into `m` subvectors,
    * and each subvector quantized to one of `ksub` per-subspace centroids
    * (independent Lloyd k-means per subspace, all m subspaces trained in
    * ONE set of Spark aggregations). A corpus vector is then `m` small
    * codes instead of `dim` floats — at 100 TB the codes table is the
    * only thing the query path scans (m bytes-ish per vector vs 4·dim).
    *
    * Query scoring is asymmetric distance computation: since the corpus
    * is normalized, cosine(q, x) = Σⱼ dot(q̂ⱼ, x̂ⱼ) ≈ Σⱼ dot(q̂ⱼ,
    * centroid[j, codeⱼ(x)]) — per query a lookup table of m·ksub partial
    * dots (broadcast), and the corpus-side work is one map-side-combined
    * sum over the codes, no vector arithmetic at all.
    */

  /** Squared L2 distance of two numeric array columns (in double). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Dot product of two numeric array columns (in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Explode (id, vec) into m L2-NORMALIZED subvector rows
    * (`__id`, `__j`, `__sv`). The norm is a separate projection column so
    * it is evaluated once per row, not once per element (Spark does not
    * CSE duplicated subtrees inside one projection).
    */
  private def subspaces(df: DataFrame, idCol: String, vecCol: String,
      m: Int, sub: Int): DataFrame =
    df.withColumn("__n", norm(qcol(vecCol)))
      .select(qcol(idCol).cast("long").as("__id"),
        inline(array((0 until m).map(j =>
          struct(lit(j).as("__j"),
            transform(slice(qcol(vecCol), j * sub + 1, sub),
              x => x.cast("double") / col("__n")).as("__sv"))): _*)))

  /** Nearest per-subspace centroid for every subvector row: broadcast
    * m·ksub centroids, min-(distance, cid) struct via partial-aggregated
    * min — no window, ties to the smallest cid.
    */
  private def assignPq(sv: DataFrame, centroids: DataFrame): DataFrame =
    sv.join(broadcast(centroids), Seq("__j"))
      .select(col("__id"), col("__j"), col("__sv"),
        struct(l2sq(col("__sv"), col("centroid")).as("d"), col("__cid").as("cid")).as("__sc"))
      .groupBy(col("__id"), col("__j"))
      .agg(first(col("__sv")).as("__sv"), min(col("__sc")).as("__m"))
      .select(col("__id"), col("__j"), col("__sv"),
        col("__m").getField("cid").as("__code"))

  /** Train per-subspace codebooks over a prebuilt (checkpointed)
    * subspace frame: deterministic init from the `ksub` lowest ids' own
    * subvectors, then `iters` Lloyd rounds (assign via broadcast
    * min-distance, update via per-(subspace, code, dim) mean — the same
    * aggregation shape as `trainCentroids`, m codebooks at once).
    * Returns (`__j`, `__cid`, `centroid`), localCheckpoint'ed (consumed
    * by encoding AND every query LUT).
    */
  private def pqTrainSv(sv: DataFrame, ksub: Int, iters: Int): DataFrame = {
    val w0 = Window.partitionBy(col("__j")).orderBy(col("__id"))
    val initIds = sv.select(col("__id")).distinct().orderBy(col("__id")).limit(ksub)
    // silent underfill would make callers (ivfPqTopK) score against a
    // smaller codebook with no signal — fail loudly instead
    require(initIds.count() == ksub,
      s"PQ training needs >= $ksub distinct ids to seed $ksub centroids per subspace")
    var centroids = sv.join(broadcast(initIds), Seq("__id"))
      .withColumn("__rn", row_number().over(w0))
      .select(col("__j"), (col("__rn") - 1).as("__cid"), col("__sv").as("centroid"))
    var i = 0
    while (i < iters) {
      centroids = assignPq(sv, centroids)
        .select(col("__j"), col("__code"), posexplode(col("__sv")).as(Seq("__pos", "__x")))
        .groupBy(col("__j"), col("__code"), col("__pos"))
        .agg(avg(col("__x")).as("__mn"))
        .groupBy(col("__j"), col("__code"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__mn")))),
          e => e("__mn")).as("centroid"))
        .withColumnRenamed("__code", "__cid")
      i += 1
    }
    centroids.localCheckpoint(eager = true)
  }

  /** Standalone codebook training (see `pqTrainSv`); prefer `pqModel`
    * when codes are also needed — it shares ONE subspace pass between
    * training and encoding.
    */
  /** Probe the embedding dimension from the first corpus row, with a
    * clear failure on an empty corpus (a bare .head() would throw an
    * uninformative NoSuchElementException from deep inside the plan).
    */
  private def probeDim(corpus: DataFrame, vecCol: String): Int =
    corpus.select(size(qcol(vecCol))).head(1).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"cannot train a PQ/IVF model on an empty corpus (vector column '$vecCol')"))
      .getInt(0)

  /** Resolve the PQ training cap: ≤ 0 → the FAISS-style default
    * 256·ksub sampled rows; Int.MaxValue → full corpus (gates).
    */
  private def pqCap(maxTrainRows: Int, ksub: Int): Int =
    if (maxTrainRows <= 0) 256 * ksub else maxTrainRows

  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2, maxTrainRows: Int = 0): DataFrame = {
    val dim = probeDim(corpus, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val train = trainingFrame(corpus, idCol, pqCap(maxTrainRows, ksub),
      qcol(idCol).cast("long"))
    pqTrainSv(subspaces(train, idCol, vecCol, m, dim / m)
      .localCheckpoint(eager = true), ksub, iters)
  }

  /** Trained PQ state: codebooks + corpus codes + geometry. */
  final case class PqModel(centroids: DataFrame, codes: DataFrame, m: Int, sub: Int)

  /** Build codebooks AND corpus codes with ONE dim probe and ONE
    * normalized-subspace pass over the corpus (checkpointed, shared by
    * every Lloyd round and the final encode) — the full-corpus work of a
    * PQ index build happens exactly once.
    */
  def pqModel(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2, maxTrainRows: Int = 0): PqModel = {
    val dim = probeDim(corpus, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val sv = subspaces(corpus, idCol, vecCol, m, sub).localCheckpoint(eager = true)
    // train on a bounded slice of the SHARED subspace pass (broadcast
    // semi-join on the sampled ids — checkpointed so Lloyd iterations
    // read ≤ cap·m stored rows); the final encode still covers all of sv
    val svTrain = trainSampleIds(corpus, idCol, pqCap(maxTrainRows, ksub)) match {
      case Some(ids) =>
        sv.join(broadcast(ids), col("__id") === col("__sid")).drop("__sid")
          .localCheckpoint(eager = true)
      case None => sv
    }
    val centroids = pqTrainSv(svTrain, ksub, iters)
    val codes = assignPq(sv, centroids).select(col("__id"), col("__j"), col("__code"))
    PqModel(centroids, codes, m, sub)
  }

  /** Encode the corpus against trained codebooks: (`__id`, `__j`,
    * `__code`) — m small integers per vector, the only corpus-side state
    * the query path reads.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, m: Int, sub: Int): DataFrame =
    assignPq(subspaces(corpus, idCol, vecCol, m, sub), centroids)
      .select(col("__id"), col("__j"), col("__code"))

  // ------------------------------------------- residual product quantization
  /** Residual PQ support (FAISS IVF×PQ `by_residual=true`, its accuracy
    * default): each vector is L2-normalized, its coarse cluster's
    * NORMALIZED centroid subtracted, and PQ trained/encoded on the
    * residuals. For cosine — inner product on the unit sphere — the ADC
    * score decomposes EXACTLY: ⟨q̂, v̂⟩ = ⟨q̂, ĉ⟩ + ⟨q̂, r⟩, so the query
    * path adds one per-(query, probed-cluster) offset to the same
    * global-LUT machinery; the LUT stays cluster-INdependent (an L2
    * metric would need per-cluster tables, cosine does not). When the
    * coarse quantizer captures real cluster structure, residuals carry
    * less variance than the vectors and the same (m, ksub) bit budget
    * quantizes finer; on a weakly clustered corpus they can carry MORE
    * (unit vector minus a far centroid has norm up to 2) — the
    * `x_knn_ivfpq_residual_err` gate bounds the band either way.
    */

  /** Coarse centroids L2-normalized onto the unit sphere —
    * (`__cluster`, `__cc`). Assignment is by cosine, so magnitude carries
    * no information; normalizing makes the subtracted centroid live on
    * the same sphere as the normalized vectors and keeps the offset term
    * a plain dot product.
    */
  private def normalizedCoarse(coarse: DataFrame): DataFrame =
    coarse.withColumn("__cn", norm(col("centroid")))
      .select(col("__cid").as("__cluster"),
        transform(col("centroid"), x => x.cast("double") / col("__cn")).as("__cc"))

  /** Residuals of an already-assigned frame (columns idCol, vecCol,
    * `__cluster`): (`__id`, `__cluster`, `__res`), __res = v/|v| − ĉ.
    */
  private def residualsFromAssigned(assigned: DataFrame, idCol: String,
      vecCol: String, coarse: DataFrame): DataFrame =
    assigned.join(broadcast(normalizedCoarse(coarse)), Seq("__cluster"))
      .withColumn("__n", norm(qcol(vecCol)))
      .select(qcol(idCol).cast("long").as("__id"), col("__cluster"),
        zip_with(qcol(vecCol), col("__cc"),
          (x, c) => x.cast("double") / col("__n") - c).as("__res"))

  /** Subspace split WITHOUT per-vector normalization — residuals must
    * keep their true magnitude or the ⟨q̂, v̂⟩ = offset + ADC
    * decomposition breaks (the residual of a vector near its centroid is
    * SMALL, and that smallness is the information).
    */
  private def rawSubspaces(df: DataFrame, idCol: String, vecCol: String,
      m: Int, sub: Int): DataFrame =
    df.select(qcol(idCol).cast("long").as("__id"),
      inline(array((0 until m).map(j =>
        struct(lit(j).as("__j"),
          transform(slice(qcol(vecCol), j * sub + 1, sub),
            x => x.cast("double")).as("__sv"))): _*)))

  /** Train residual codebooks on a bounded sample and encode the FULL
    * assigned corpus: (codebooks, codes-with-cluster, sub). Mirrors
    * [[pqModel]]'s one-subspace-pass discipline over the residual frame.
    */
  private[ext] def pqResidualModel(assigned: DataFrame, idCol: String,
      vecCol: String, coarse: DataFrame, m: Int, ksub: Int, iters: Int,
      maxTrainRows: Int): (DataFrame, DataFrame, Int) = {
    val dim = probeDim(assigned, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val res = residualsFromAssigned(assigned, idCol, vecCol, coarse)
      .localCheckpoint(eager = true)
    val sv = rawSubspaces(res, "__id", "__res", m, sub)
      .localCheckpoint(eager = true)
    val svTrain = trainSampleIds(assigned, idCol, pqCap(maxTrainRows, ksub)) match {
      case Some(ids) =>
        sv.join(broadcast(ids), col("__id") === col("__sid")).drop("__sid")
          .localCheckpoint(eager = true)
      case None => sv
    }
    val centroids = pqTrainSv(svTrain, ksub, iters)
    val codes = assignPq(sv, centroids)
      .select(col("__id"), col("__j"), col("__code"))
      .join(res.select(col("__id"), col("__cluster")), Seq("__id"))
    (centroids, codes, sub)
  }

  /** Encode assigned rows' residuals against FROZEN coarse + codebooks —
    * the append/update path: (`__id`, `__j`, `__code`, `__cluster`).
    */
  private[ext] def pqResidualEncode(assigned: DataFrame, idCol: String,
      vecCol: String, coarse: DataFrame, centroids: DataFrame, m: Int,
      sub: Int): DataFrame = {
    val res = residualsFromAssigned(assigned, idCol, vecCol, coarse)
      .localCheckpoint(eager = true)
    assignPq(rawSubspaces(res, "__id", "__res", m, sub), centroids)
      .select(col("__id"), col("__j"), col("__code"))
      .join(res.select(col("__id"), col("__cluster")), Seq("__id"))
  }

  /** Per-(query, probed-cluster) score offsets ⟨q̂, ĉ⟩ for the residual
    * ADC sum — probes × 1 rows, broadcast-sized like the probes frame
    * itself. `probes` must carry (query_id, __qv, __cluster).
    */
  private[ext] def residualOffsets(probes: DataFrame, coarse: DataFrame): DataFrame =
    probes.join(broadcast(normalizedCoarse(coarse)), Seq("__cluster"))
      .withColumn("__qn", norm(col("__qv")))
      .select(col("query_id"), col("__cluster"),
        (dot(col("__qv"), col("__cc")) / col("__qn")).as("__off"))

  /** ADC lookup table for a query set: (query_id, __j, __code, __p)
    * where __p = dot(query subvector j, codebook j's centroid `__code`)
    * — queries × m × ksub rows, always broadcast-sized. Takes the raw
    * codebook frame + geometry so it works identically for an in-memory
    * [[PqModel]] and a loaded [[AnnIndex]] table.
    */
  private[ext] def pqLut(queries: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, m: Int, sub: Int): DataFrame =
    subspaces(queries, idCol, vecCol, m, sub)
      .join(broadcast(centroids), Seq("__j"))
      .select(col("__id").as("query_id"), col("__j"), col("__cid").as("__code"),
        dot(col("__sv"), col("centroid")).as("__p"))

  /** All approximate query↔corpus cosines via the ADC lookup table:
    * (query_id, neighbor_id, cosine_pq), self-pairs excluded. The LUT
    * (queries × m × ksub partial dots) is broadcast; corpus-side cost is
    * one equi-join on (subspace, code) + a map-side-combined sum.
    */
  def pqScores(queries: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    model.codes.join(
      broadcast(pqLut(queries, idCol, vecCol, model.centroids, model.m, model.sub)),
      Seq("__j", "__code"))
      .filter(col("query_id") =!= col("__id"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sum(col("__p")).as("cosine_pq"))
      .select(col("query_id"), col("__id").as("neighbor_id"), col("cosine_pq"))

  /** PQ top-k: output shape matches bruteForceTopK (approximate results,
    * `cosine_pq` = ADC-approximated cosine).
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 4,
      ksub: Int = 16,
      iters: Int = 2,
      maxTrainRows: Int = 0,
  ): DataFrame = {
    val model = pqModel(corpus, idCol, vecCol, m, ksub, iters, maxTrainRows)
    pqTopKWithModel(queries, idCol, vecCol, model, k)
  }

  /** PQ top-k against an already-built model (in-memory or loaded via
    * [[AnnIndex.readPq]]) — zero training on the query path.
    */
  def pqTopKWithModel(queries: DataFrame, idCol: String, vecCol: String,
      model: PqModel, k: Int): DataFrame =
    topKPerQuery(pqScores(queries, idCol, vecCol, model), "cosine_pq", "neighbor_id", k)

  /** Per-query top-nprobe coarse clusters: (query_id, __cluster) —
    * queries × nprobe rows, broadcast-sized. Shared by the in-memory IVF
    * scan and the persisted IVF×PQ index reader ([[AnnIndex]]).
    */
  private[ext] def probeClusters(q: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(cosine(col("__qv"), col("centroid")).desc, col("__cid"))
    q.crossJoin(broadcast(centroids))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__cid").as("__cluster"))
  }

  // IVF × PQ composed ANN lives in [[AnnIndex]]: the 100 TB shape is a
  // PERSISTED codes table partitioned by coarse cluster, where the
  // per-query nprobe filter becomes parquet partition pruning — an
  // in-memory composition would need a corpus-sized cluster-attach
  // shuffle join on the query path (the r5 scale finding).

  /** IVF top-k: scan only the `nprobe` clusters nearest to each query.
    * Output shape matches bruteForceTopK (approximate results).
    *
    * AD-HOC form: assigns the corpus against the centroids on every
    * call — a full corpus pass plus a corpus-sized cluster shuffle per
    * query batch. For repeated querying (and at 100 TB, always) build
    * the persisted cluster-partitioned layout instead —
    * [[AnnIndex.buildIvf]]/[[AnnIndex.ivfTopK]] turn the nprobe filter
    * into parquet partition pruning and pay assignment once.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      maxTrainRows: Int = 0,
  ): DataFrame = {
    val centroids = trainCentroids(corpus, idCol, vecCol, nlist,
      maxTrainRows = maxTrainRows)
    val assigned = assign(corpus, (idCol, vecCol), centroids)
      .select(qcol(idCol).cast("long").as("neighbor_id"), qcol(vecCol).as("__cv"),
        col("__cluster"))

    val q = queries.select(qcol(idCol).cast("long").as("query_id"), qcol(vecCol).as("__qv"))
    val probes = probeClusters(q, centroids, nprobe)

    val scored = probes.join(assigned, Seq("__cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(scored, "cosine", "neighbor_id", k)
  }

  // ------------------------------------------------- scalar quantization
  /** Per-dimension affine 8-bit scalar quantization (FAISS
    * IndexScalarQuantizer QT_8bit): each NORMALIZED corpus vector stores
    * one byte per dimension, code_i = round((v̂_i − vmin_i)/step_i) with
    * step_i = (vmax_i − vmin_i)/255 — 4× smaller than float32, far more
    * accurate than PQ at the same scan cost class.
    *
    * The differentiating property vs PQ/IVF×PQ: the approximation error
    * is ANALYTICALLY bounded, per query, from the stored bounds alone.
    * vmin/vmax are the EXACT corpus min/max (one map-side-combining
    * aggregation — no sampling; cheap even at 100 TB), so every
    * build-corpus vector reconstructs within step_i/2 per dimension, and
    * |⟨q̂, v̂⟩ − ⟨q̂, x̂⟩| ≤ ½·Σᵢ|q̂ᵢ|·stepᵢ =: B(q) — an invariant of the
    * code, not a distributional property of the data (the
    * x_knn_sq_err gate asserts it; contrast the residual-PQ band, which
    * data regeneration falsified in round 9). APPENDED vectors may fall
    * outside the trained range and clamp — their error is not covered by
    * B(q); rebuild on the usual cadence.
    */
  final case class SqBounds(vmin: Array[Double], vmax: Array[Double]) {
    require(vmin.length == vmax.length, "vmin/vmax length mismatch")
    def dim: Int = vmin.length
    def step: Array[Double] = vmin.indices.map(i => (vmax(i) - vmin(i)) / 255.0).toArray
  }

  private def dlits(a: Array[Double]): Column = array(a.map(lit(_)): _*)

  /** Exact per-dimension min/max of the L2-normalized corpus — one
    * explode + one hash aggregate (partials combine map-side; the
    * shuffle carries dim×partitions rows, never vectors). The driver
    * collect is dim-bounded.
    */
  def sqTrainBounds(corpus: DataFrame, vecCol: String): SqBounds = {
    val rows = corpus
      .withColumn("__n", norm(qcol(vecCol)))
      .select(posexplode(transform(qcol(vecCol),
        x => x.cast("double") / col("__n"))).as(Seq("__pos", "__x")))
      .groupBy(col("__pos"))
      .agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
      .orderBy(col("__pos"))
      .collect()
    SqBounds(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Encode the corpus against trained bounds: (`__id`, `__codes`), one
    * TINYINT per dimension — the raw [0, 255] code shifted by −128 so it
    * fits Spark's signed byte (the score expression shifts back). This
    * is what makes the codes table genuinely one byte of storage per
    * dimension instead of a 4-byte int that merely holds byte-range
    * values. A degenerate dimension (vmax == vmin) encodes 0 and
    * reconstructs vmin exactly. Values OUTSIDE the trained range
    * (append-path only) clamp.
    */
  def sqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      b: SqBounds): DataFrame =
    corpus
      .withColumn("__n", norm(qcol(vecCol)))
      .select(qcol(idCol).cast("long").as("__id"),
        zip_with(
          zip_with(transform(qcol(vecCol), x => x.cast("double") / col("__n")),
            dlits(b.vmin), (x, lo) => x - lo),
          dlits(b.step),
          (d, s) => (when(s === 0d, 0d)
            .otherwise(least(greatest(round(d / s, 0), lit(0d)), lit(255d)))
            - lit(128d)).cast("tinyint")).as("__codes"))

  /** Approximate cosines of every (query, corpus-code) pair:
    * (query_id, neighbor_id, cosine_sq, __qbound), self-pairs excluded.
    * Score decomposition keeps corpus-side work to one O(dim) fused pass
    * over the byte codes: ⟨q̂, x̂⟩ = ⟨q̂, vmin⟩ + Σᵢ (q̂ᵢ·stepᵢ)·codeᵢ —
    * the per-query offset ⟨q̂, vmin⟩ and premultiplied step array are
    * computed once per query and broadcast. `__qbound` is B(q) (+1e-6
    * float slop), the analytic ceiling on |cosine − cosine_sq| for
    * build-corpus rows.
    */
  def sqScores(queries: DataFrame, idCol: String, vecCol: String,
      b: SqBounds, codes: DataFrame): DataFrame =
    codes.join(broadcast(sqQueryFrame(queries, idCol, vecCol, b)),
        col("query_id") =!= col("__id"))
      .select(col("query_id"), col("__id").as("neighbor_id"),
        sqScoreExpr.as("cosine_sq"), col("__qbound"))

  /** Per-query broadcast frame for SQ scoring: (query_id, __qoff,
    * __qstep, __qbound) — the offset ⟨q̂, vmin⟩, the premultiplied
    * q̂ᵢ·stepᵢ array, and the analytic bound B(q). Shared by the flat
    * scan and the IVF-pruned scan ([[AnnIndex.ivfSqTopK]]).
    */
  private[ext] def sqQueryFrame(queries: DataFrame, idCol: String,
      vecCol: String, b: SqBounds): DataFrame =
    queries
      .withColumn("__n", norm(qcol(vecCol)))
      .withColumn("__qv", transform(qcol(vecCol), x => x.cast("double") / col("__n")))
      .select(qcol(idCol).cast("long").as("query_id"),
        dot(col("__qv"), dlits(b.vmin)).as("__qoff"),
        zip_with(col("__qv"), dlits(b.step), (x, s) => x * s).as("__qstep"),
        (aggregate(zip_with(col("__qv"), dlits(b.step),
          (x, s) => abs(x) * s), lit(0.0), (acc, v) => acc + v) / 2 + lit(1e-6))
          .as("__qbound"))

  /** The fused SQ score over a row carrying (__codes, __qoff, __qstep) —
    * codes un-shift (+128) back to their raw [0, 255] value inline.
    */
  private[ext] def sqScoreExpr: Column =
    col("__qoff") + aggregate(
      zip_with(col("__codes"), col("__qstep"),
        (c, s) => (c.cast("double") + lit(128d)) * s),
      lit(0.0), (acc, v) => acc + v)

  /** SQ top-k (shared epilogue, ranked on the rounded score + id). */
  def sqTopKWithCodes(queries: DataFrame, idCol: String, vecCol: String,
      b: SqBounds, codes: DataFrame, k: Int): DataFrame =
    topKPerQuery(sqScores(queries, idCol, vecCol, b, codes).drop("__qbound"),
      "cosine_sq", "neighbor_id", k)
}
