package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: exact brute-force cosine top-k (partition-parallel partial
  * top-k, then a single merge shuffle keyed by query — no crossJoin
  * materialization beyond the scored pairs, no driver collect).
  * Scale path: random-hyperplane LSH bucketing — corpus hashed once,
  * queries probe only their bucket, turning the N×Q scan into bucketed
  * joins. Recall vs the exact baseline is asserted in SimilaritySpec.
  *
  * Dot products are pure higher-order expressions over double-cast arrays
  * (codegen'd, no UDF).
  */
object Similarity {

  /** sum(a[i]*b[i]) — native fused-loop expression (VectorExprs). */
  def dot(a: Column, b: Column): Column = VectorExprs.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Pre-normalized vectors: norm computed ONCE as a column (a lambda that
    * referenced the norm *expression* would recompute it per element), so
    * cosine downstream is a plain dot product.
    */
  private def unitVectors(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame =
    DataOps.parallelismFloor(
        df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as("__v")))
      .withColumn("__n", norm(col("__v")))
      .localCheckpoint(true) // plan barrier: stops CollapseProject from
                              // inlining the norm into the per-element
                              // lambda below -> O(dim) recompute per element
      .select(col(idAs), zip_with(col("__v"),
        array_repeat(col("__n"), size(col("__v"))), (x, n) => x / n).as(vecAs))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide).
    *
    * Broadcast the queries (Q is small), score per corpus partition, then
    * one shuffle keyed by query id for the global top-k — the scalable
    * exact layout: the big side (corpus) is never shuffled.
    */
  def cosineTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = unitVectors(queries, idCol, vecCol, "query_id", "qv")
    val c = unitVectors(corpus, idCol, vecCol, "neighbor_id", "cv")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Random-hyperplane signature: bit b = sign(v · h_b), computed by the
    * fused native kernel (`VectorExprs.RhpSignature` — one loop nest per
    * row, one vector read for all bits; bit-exact with the previous
    * per-plane-literal composition, whose analysis+codegen cost ~1 s of
    * driver time per LSH query). `maxDim` caps the plane length; planes
    * stop at the shorter of vector and maxDim.
    */
  def rhpSignature(vec: Column, bits: Int = 16, maxDim: Int = 256): Column =
    VectorExprs.rhp_signature(vec, bits, maxDim)

  /** LSH-bucketed ANN: queries probe only their signature bucket.
    * Approximate — recall depends on bits/band choices; `bands` splits the
    * signature so a match on ANY band makes a candidate (multi-probe).
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rowsPerBand = bits / bands
    val mask = (1L << rowsPerBand) - 1

    def banded(df: DataFrame, id: String, v: String): DataFrame = {
      val sig = rhpSignature(col(v), bits)
      unitVectors(df, idCol, vecCol, id, v)
        .select(col(id), col(v), sig.as("sig"))
        .select(col(id), col(v), explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * rowsPerBand).bitwiseAND(lit(mask)).as("h"))): _*)).as("bh"))
        .select(col(id), col(v), col("bh.band").as("band"), col("bh.h").as("h"))
    }

    val qb = banded(queries, "query_id", "qv")
    val cb = banded(corpus, "neighbor_id", "cv")
    val candidates = qb.join(cb, Seq("band", "h"))
      .where(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", dot(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Diversity sample for eval-set / seed curation: ONE representative
    * (smallest id) per random-hyperplane bucket, with the bucket's
    * population. 2^bits buckets stratify the embedding space by angular
    * region, so the representatives spread across the corpus's directions
    * instead of oversampling its dense clusters — the cheap deterministic
    * stand-in for k-center greedy (which is inherently sequential and
    * does not distribute). Signatures are computed on the raw
    * double-cast vectors so the DuckDB replay shares the exact fold.
    *
    * Scale: one codegen'd signature projection (no joins), one
    * 2^bits-bounded aggregation with map-side combine. min-id and count
    * are both order-independent — partitioning-invariant by
    * construction.
    */
  def diversitySample(df: DataFrame, bits: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    DataOps.parallelismFloor(
        df.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__v")))
      .select(col("vec_id"), rhpSignature(col("__v"), bits).as("bucket"))
      .groupBy("bucket")
      .agg(min(col("vec_id")).as("rep_id"), count(lit(1)).as("n_members"))

  /** Embedding-cosine near-duplicate pairs (cos >= threshold), LSH-bucketed
    * candidate generation + exact verification; the embedding flavor of
    * Dedup.
    */
  def nearDupPairs(
      df: DataFrame, threshold: Double = 0.95,
      bits: Int = 16, bands: Int = 4, maxBucket: Long = 500,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rowsPerBand = bits / bands
    val mask = (1L << rowsPerBand) - 1
    val sig = rhpSignature(asDouble(col(vecCol)), bits)
    // Unit-normalize once so verification is a plain dot product, and keep
    // the bucket join id-only (vectors re-attached per surviving pair).
    val unit = unitVectors(df, idCol, vecCol, "id", "u")
    val banded = df
      .select(col(idCol).as("id"), sig.as("sig"))
      .select(col("id"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * rowsPerBand).bitwiseAND(lit(mask)).as("h"))): _*)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))

    val okBuckets = banded.groupBy("band", "h").agg(count(lit(1)).as("bn"))
      .where(col("bn") >= 2 && col("bn") <= maxBucket)
      .select("band", "h")
    val pruned = banded.join(okBuckets, Seq("band", "h"))

    pruned.select(col("band"), col("h"), col("id").as("id_a"))
      .join(pruned.select(col("band"), col("h"), col("id").as("id_b")), Seq("band", "h"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .join(unit.select(col("id").as("id_a"), col("u").as("ua")), Seq("id_a"))
      .join(unit.select(col("id").as("id_b"), col("u").as("ub")), Seq("id_b"))
      .withColumn("cosine", dot(col("ua"), col("ub")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact cosine near-duplicate pairs (the small-scale oracle for
    * nearDupPairs' recall tests): all pairs, no bucketing.
    */
  def nearDupPairsExact(
      df: DataFrame, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val a = unitVectors(df, idCol, vecCol, "id_a", "va").repartition(par)
    val b = unitVectors(df, idCol, vecCol, "id_b", "vb")
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Per-group element-wise mean vector (centroid / mean-pooling): one
    * map-side-combining `aggregateByKey` pass with in-place array sums —
    * the shuffle carries one partial-sum array per (partition, group),
    * never exploded (group, pos, value) rows (which would multiply the
    * exchange by the vector dimensionality). Output: (key, mean
    * array<double>, n).
    */
  /** Population covariance matrix of the embedding space (the PCA /
    * whitening precursor): upper-triangle (i, j, cov) rows, i <= j.
    *
    * Scale shape: ONE `treeAggregate` pass over the corpus with a
    * d(d+1)/2 + d array accumulator — map-side combine, log-depth merge,
    * and the shuffle carries one partial accumulator per partition
    * (d=64 → ~17 kB), never per-row pair explosions (the naive
    * (row × i × j) explode shuffles d²·N rows — 4096× the corpus).
    * Output values are rounded at 6 (the mean_vectors convention: float
    * partial-sum order is partition-dependent; rounding absorbs the ulp
    * noise so the driver's hash compare is stable).
    */
  /** Round a double to 6 decimals as a scaled long (value × 1e6),
    * replicating DuckDB's `round(x, 6)` EXACTLY: C++ `std::round(x*1e6)`
    * — half-away-from-zero applied to the scaled DOUBLE (not to the
    * decimal expansion of x, which is what BigDecimal HALF_UP rounds and
    * what the old rint-with-epsilon-guard kernel approximated; the two
    * disagree on terms whose x*1e6 lands on the other side of .5 from
    * their shortest decimal form). `a - floor(a)` is exact for a < 2^52,
    * so the tie test is the same one std::round performs. Verified
    * bit-identical to DuckDB round()+DECIMAL(30,6) on 159k real
    * embedding terms plus adversarial .5-boundary values.
    */
  @inline private[ext] def round6Scaled(x: Double): Long = {
    val t = x * 1e6
    val a = math.abs(t)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    (if (t < 0) -r else r).toLong
  }

  def covarianceMatrix(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(asDouble(col(vecCol)).as("v")).as[Seq[Double]].rdd
    // acc = (sumXY upper-triangle row-major, sumX, n); arrays lazily sized
    // from the first vector so the dimension never needs a separate job.
    // Each term is rounded at scale 6 and summed as an exact scaled long —
    // the partial sums are then order-independent (bit-identical however
    // the partitions merge), which is what makes the result replayable.
    val (sxy, sx, n) = vecs.treeAggregate(
      (Array.empty[Long], Array.empty[Long], 0L))(
      { case ((xy0, x0, n0), v) =>
        val d = v.length
        val xy = if (xy0.isEmpty) new Array[Long](d * (d + 1) / 2) else xy0
        val x = if (x0.isEmpty) new Array[Long](d) else x0
        var i = 0
        var t = 0
        while (i < d) {
          val vi = v(i)
          x(i) += round6Scaled(vi)
          var j = i
          while (j < d) { xy(t) += round6Scaled(vi * v(j)); j += 1; t += 1 }
          i += 1
        }
        (xy, x, n0 + 1)
      },
      { case ((a, ax, na), (b, bx, nb)) =>
        if (a.isEmpty) (b, bx, na + nb)
        else {
          if (b.nonEmpty) {
            var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }
            var k = 0; while (k < ax.length) { ax(k) += bx(k); k += 1 }
          }
          (a, ax, na + nb)
        }
      }, depth = 2)
    val d = sx.length
    val nD = n.toDouble
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield {
      val t = i * d - i * (i - 1) / 2 + (j - i)
      // identical double expression to the oracle's
      // sxy/n - (sx_i/n)*(sx_j/n) over the same exact decimal sums
      val cov = sxy(t).toDouble / 1e6 / nD -
        (sx(i).toDouble / 1e6 / nD) * (sx(j).toDouble / 1e6 / nD)
      // final rounding = the same std::round replication the oracle's
      // round(cov, 6) applies — scaled long back to double, one IEEE divide
      val r = round6Scaled(cov).toDouble / 1e6
      (i.toLong, j.toLong, r)
    }
    spark.createDataFrame(rows).toDF("i", "j", "cov")
  }

  /** Top principal direction by fixed-iteration power iteration over an
    * (i, j, cov) upper-triangle covariance frame (the
    * [[covarianceMatrix]] output) — PCA's first component, the variance
    * axis a pipeline uses for whitening sanity checks and projection
    * pursuit. Everything is scaled-long integer math: the matrix entries
    * are covariances on a 1e6 grid, v₀ = all-ones·1e6, each step is one
    * exact mat-vec (d²-row join-aggregate) followed by HITS-style
    * renormalization (floor-divide by max(1, max|u| div 1e6)); signed
    * divisions are spelled sign·(|u| div m) so truncation semantics
    * agree across engines. The closing Rayleigh quotient vᵀ(Cv)/vᵀv
    * (exact big-integer sums, one final divide) estimates the top
    * eigenvalue, reported as a constant `lambda` column.
    *
    * Scale: the state is dimension-bounded (d vector rows, d² matrix
    * rows) regardless of corpus size — the corpus is touched only by the
    * one covariance pass that produced the input.
    */
  def topEigenvector(cov: DataFrame, iterations: Int,
      driverMaxEntries: Int = 2000000): DataFrame = {
    require(iterations >= 1)
    val scale = 1000000L
    // Driver-local fast path (optimization r14): the input is
    // dimension-bounded (d² entries — [[covarianceMatrix]] even builds it
    // as a LOCAL relation), yet the distributed loop below pays
    // 2 jobs × iteration (checkpoint + max-agg) plus the Rayleigh pass
    // over a table of a few thousand rows. When the matrix fits
    // comfortably on the driver (d ≤ ~1400 at the default — every
    // realistic embedding dimensionality), run the IDENTICAL scaled-long
    // iteration locally: every step is exact integer arithmetic (the
    // same wrap/truncation semantics as the distributed sums), and the
    // closing float expressions are evaluated by the SAME Spark
    // projection over a local one-row frame — bit-identical output, zero
    // distributed jobs. Above the threshold the distributed path runs
    // unchanged (the input contract there is corpus-independent anyway:
    // d² rows).
    val localRows = cov
      .select(col("i").cast("long"), col("j").cast("long"),
        expr("CAST(floor(cov * 1000000.0 + 0.5) AS BIGINT)").as("c"))
      .limit(driverMaxEntries + 1).collect()
    if (localRows.nonEmpty && localRows.length <= driverMaxEntries) {
      val spark = cov.sparkSession
      // symmetrize exactly like the distributed `full` union below
      val entries = localRows.flatMap { r =>
        val (i, j, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
        if (i != j) Seq((i, j, c), (j, i, c)) else Seq((i, j, c))
      }
      val idx = entries.map(_._1).distinct.sorted
      val pos = idx.zipWithIndex.toMap
      val d = idx.length
      // adjacency as (row -> (colPos, c)) for the exact mat-vec
      val byRow = Array.fill(d)(List.empty[(Int, Long)])
      entries.foreach { case (i, j, c) =>
        byRow(pos(i)) = (pos(j), c) :: byRow(pos(i))
      }
      def matVecL(v: Array[Long]): Array[Long] = {
        val u = new Array[Long](d)
        var r = 0
        while (r < d) {
          var s = 0L
          byRow(r).foreach { case (cp, c) => s += c * v(cp) }
          u(r) = s
          r += 1
        }
        u
      }
      var v = Array.fill(d)(scale)
      for (_ <- 1 to iterations) {
        val u = matVecL(v)
        var maxAbs = 0L
        u.foreach(x => { val a = math.abs(x); if (a > maxAbs) maxAbs = a })
        val m = math.max(1L, maxAbs / scale)
        v = u.map(x => if (x < 0) -((-x) / m) else x / m)
      }
      val uF = matVecL(v)
      var num = BigInt(0); var den = BigInt(0)
      var r = 0
      while (r < d) {
        num += BigInt(v(r)) * BigInt(uF(r))
        den += BigInt(v(r)) * BigInt(v(r))
        r += 1
      }
      // final float expressions evaluated by Spark itself over a local
      // frame — the same expression strings as the distributed path
      import org.apache.spark.sql.types._
      val outRows = new java.util.ArrayList[org.apache.spark.sql.Row](d)
      idx.indices.foreach { k =>
        outRows.add(org.apache.spark.sql.Row(idx(k), v(k),
          new java.math.BigDecimal(num.bigInteger),
          new java.math.BigDecimal(den.bigInteger)))
      }
      val schema = StructType(Seq(
        StructField("i", LongType), StructField("v", LongType),
        StructField("num", DecimalType(38, 0)),
        StructField("den", DecimalType(38, 0))))
      return spark.createDataFrame(outRows, schema)
        .select(col("i"), col("v").as("v_scaled"),
          expr("CAST(v AS DOUBLE) / 1000000.0").as("v"),
          expr("round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0, 6)")
            .as("lambda"))
    }
    val full = cov
      .select(col("i"), col("j"),
        expr("CAST(floor(cov * 1000000.0 + 0.5) AS BIGINT)").as("c"))
      .unionByName(cov.where(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"),
          expr("CAST(floor(cov * 1000000.0 + 0.5) AS BIGINT)").as("c")))
      .localCheckpoint(true) // d² rows drive every iteration
    var v = full.select(col("i")).distinct()
      .select(col("i"), lit(scale).as("v"))
    def matVec(vec: DataFrame): DataFrame =
      full.join(vec.select(col("i").as("j"), col("v")), Seq("j"))
        .groupBy("i").agg(sum(col("c") * col("v")).as("u"))
    for (_ <- 1 to iterations) {
      val u = matVec(v).localCheckpoint(true) // read for max AND divide
      val m = math.max(1L,
        u.agg(max(abs(col("u")))).head().getLong(0) / scale)
      v = u.select(col("i"),
        expr(s"CASE WHEN u < 0 THEN -((-u) div ${m}L) ELSE u div ${m}L END")
          .as("v"))
    }
    val vF = v.localCheckpoint(true) // feeds the Rayleigh pass AND output
    val ray = matVec(vF)
      .join(vF, Seq("i"))
      .agg(
        sum(col("v").cast("decimal(38,0)") * col("u")).as("num"),
        sum(col("v").cast("decimal(38,0)") * col("v")).as("den"))
    vF.crossJoin(broadcast(ray))
      .select(col("i"), col("v").as("v_scaled"),
        expr("CAST(v AS DOUBLE) / 1000000.0").as("v"),
        expr("round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0, 6)")
          .as("lambda"))
  }

  /** Frozen seed state of the two-level assignment: the distributed
    * (cell → sorted seed array) table plus the nearest-LIVE-cell
    * projection over the broadcast coarse centroids. Derived once from a
    * seed corpus, applicable to ANY target frame — which is what makes
    * the incremental variant share the exact batch chain.
    */
  private case class SeedState(
      cellSeeds: DataFrame,
      liveCellUdf: org.apache.spark.sql.expressions.UserDefinedFunction,
      seedCount: Int,
      liveCellVecs: Array[(Int, Array[Double])])

  /** Build the two-level seed state from `base` (a prepped
    * (vec_id, __v) frame): fine seeds = the `kEff` smallest ids, coarse
    * centroids = the first ceil(√k) of them — the ONLY vectors ever
    * collected or broadcast (O(√k) at any corpus size); the k fine seeds
    * stay a distributed cell-keyed table (VERDICT r07 #1).
    */
  private def seedState(base: DataFrame, kEff: Int): SeedState = {
    // fine seeds are the kEff smallest ids; their id bound and actual
    // count (min(kEff, n)) come from ONE TakeOrdered over the 8-byte id
    // column alone — no seed VECTOR ever reaches the driver from here
    val Array(seedMaxId, seedCountAny) =
      base.select(col("vec_id")).orderBy("vec_id").limit(kEff)
        .agg(max("vec_id"), count(lit(1))).head().toSeq.toArray
    val seedCount = seedCountAny.asInstanceOf[Long].toInt
    val c = math.min(autoCoarseCount(seedCount), seedCount)
    // coarse centroids: the c smallest-id vectors — the ONLY collect
    val coarseVecs: Array[Array[Double]] =
      base.orderBy("vec_id").limit(c).collect()
        .map(_.getSeq[Double](1).toArray)
    val spark = base.sparkSession
    val bcCoarseAll = spark.sparkContext.broadcast(coarseVecs)
    val seedIdx = graft.cardano.SurrogateIds.withSequence(
      base.where(col("vec_id") <= lit(seedMaxId)), "__sidx", Seq(col("vec_id")))
    // each fine seed pinned to its nearest coarse cell (ALL cells probed,
    // strict < ties to the smallest cell idx — the oracle's ORDER BY
    // dist, idx)
    val seedCellUdf = udf { v: Seq[Double] =>
      nearestIdx(v.toArray, bcCoarseAll.value)
    }
    val seedCells = seedIdx
      .select(col("__sidx"), col("__v"), seedCellUdf(col("__v")).as("__cell"))
      .localCheckpoint(true) // k rows: live-cell probe + the cell table
    // live cells (≥1 fine seed): O(√k) ids, the only other driver fetch
    val liveCells: Array[Int] =
      seedCells.select("__cell").distinct().collect().map(_.getInt(0)).sorted
    val bcLive = spark.sparkContext.broadcast(
      (liveCells, liveCells.map(coarseVecs(_))))
    val liveCellUdf = udf { v: Seq[Double] =>
      val arr = v.toArray
      val (live, cvs) = bcLive.value
      // nearest live coarse cell (strict < keeps the smallest live cidx)
      var bi = 0
      var bd = Double.PositiveInfinity
      var j = 0
      while (j < cvs.length) {
        val d = sqDist(arr, cvs(j))
        if (d < bd) { bd = d; bi = j }
        j += 1
      }
      live(bi)
    }
    // (cell -> seeds sorted by ascending idx): ~k/√k seeds per row, so a
    // group buffer is O(√k·d); the table itself is never collected
    val cellSeeds = seedCells.groupBy("__cell")
      .agg(array_sort(collect_list(struct(col("__sidx"), col("__v"))))
        .as("__ss"))
    lastAssignStats = (coarseVecs.length, liveCells.length)
    SeedState(cellSeeds, liveCellUdf, seedCount,
      liveCells.map(c => (c, coarseVecs(c))))
  }

  /** Assign a prepped (vec_id, __v) frame against a frozen seed state:
    * nearest live coarse cell row-locally (√k folds), then the fine
    * argmin via the cell-keyed equi-join (≈√k folds) — O(√k) per row.
    * Returns (vec_id, __v, cluster, __dist).
    */
  private def applyAssign(st: SeedState, target: DataFrame): DataFrame = {
    val fineUdf = udf { (v: Seq[Double], ss: Seq[org.apache.spark.sql.Row]) =>
      val arr = v.toArray
      // nearest fine seed within the cell, ascending idx, strict <
      var cluster = -1L
      var dist = Double.PositiveInfinity
      ss.foreach { r =>
        val d = sqDist(arr, r.getSeq[Double](1).toArray)
        if (d < dist) { dist = d; cluster = r.getLong(0) }
      }
      (cluster, dist)
    }
    target
      .withColumn("__cell", st.liveCellUdf(col("__v")))
      .join(st.cellSeeds, Seq("__cell")) // every live cell has >=1 seed: inner-safe
      .withColumn("__a", fineUdf(col("__v"), col("__ss")))
      .select(col("vec_id"), col("__v"),
        col("__a._1").as("cluster"), col("__a._2").as("__dist"))
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    * embedding space, then drop items whose cosine to an earlier item of
    * the same cluster exceeds `tau`. This is the practical banded form:
    * within a cluster, items are ordered by (distance-to-centroid, id)
    * and each item is compared only to its `band` predecessors — linear
    * in cluster size instead of quadratic, which is what makes the pass
    * run at corpus scale (the full pairwise form is O(Σ|cluster|²)).
    *
    * Determinism/replayability: centroids are the `k` smallest-id
    * vectors (a seeded single-assignment pass, not Lloyd iterations —
    * iterated centroid means would need canonical-order float summation,
    * the `ann_ivf` trade-off), distances and dot products are ordered
    * left-to-right double folds, and every tie (equal distance, equal
    * position) breaks by id. The whole chain replays in DuckDB.
    *
    * `k <= 0` (the default) derives the cluster count from the corpus:
    * `max(16, ceil(n / 10_000))`. A fixed k caps the cluster-keyed
    * exchange at k partitions no matter the corpus — at 100× the data the
    * banded pass would funnel through the same 16 reducers; the derived k
    * keeps mean cluster size (and so per-reducer work) roughly constant.
    *
    * Scale shape — TWO-LEVEL assignment, because k itself grows with the
    * corpus: a flat nearest-of-k scan is O(n·k) = O(n²/10k) under auto-k
    * (the round-6 scale-killer). The first `ceil(√k)` seeds act as coarse
    * centroids — the ONLY vectors ever collected to the driver or
    * broadcast (O(√k) memory at any corpus size). The k fine seeds stay
    * a distributed TABLE: indexed 0..k-1 in id order via a
    * range-repartitioned zipWithIndex (no global window, no collect),
    * each pinned to its nearest coarse cell by a √k-fold projection, then
    * grouped into one (cell → sorted seed array) row per live cell. Every
    * corpus row computes its nearest LIVE coarse cell row-locally (√k
    * folds against the broadcast centroids) and equi-JOINs the cell table
    * for the fine argmin (≈k/√k folds) — per-row work is O(√k), and the
    * planner picks broadcast-hash only when the cell table is actually
    * small (at large k it stays a shuffle join; nothing k-sized ever
    * lands on the driver — VERDICT r07 #1). Rows only probe cells that
    * own ≥1 fine seed (a duplicate-vector seed can leave its own cell
    * empty). For k ≤ coarse-floor (4) this degenerates to the exact flat
    * scan. The cluster-keyed exchange for the banded pass is unchanged.
    * Returns `(vec_id, cluster, nn_cos, keep)` — `nn_cos` is the max
    * cosine to any banded predecessor (rounded at 6; null when none).
    */
  def semanticDedup(df: DataFrame, k: Int = 0, band: Int = 8,
      tau: Double = 0.4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val base = DataOps.parallelismFloor(
        df.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__v")))
      .localCheckpoint(true) // read thrice: seed bound, seed table, assignment
    val kEff = if (k > 0) k else autoClusterCount(base.count())
    val assigned = applyAssign(seedState(base, kEff), base)
    val positioned = assigned
      .withColumn("__pos", row_number().over(
        Window.partitionBy("cluster").orderBy(col("__dist"), col("vec_id"))))
      .withColumn("__sq", dot(col("__v"), col("__v")))
      .localCheckpoint(true) // both sides of the banded self-join
    val a = positioned.select(col("cluster"), col("__pos").as("__pa"),
      col("__v").as("__va"), col("__sq").as("__sqa"))
    val b = positioned.select(col("cluster").as("__clb"), col("vec_id").as("__idb"),
      col("__pos").as("__pb"), col("__v").as("__vb"), col("__sq").as("__sqb"))
    val nn = a.join(b,
        col("cluster") === col("__clb") &&
          col("__pb") > col("__pa") && col("__pb") <= col("__pa") + band)
      .withColumn("__cos",
        dot(col("__va"), col("__vb")) / (sqrt(col("__sqa")) * sqrt(col("__sqb"))))
      .groupBy(col("__idb").as("vec_id"))
      .agg(max(col("__cos")).as("__nn"))
    positioned.join(nn, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        round(col("__nn"), 6).as("nn_cos"),
        (col("__nn").isNull || col("__nn") < tau).as("keep"))
  }

  /** Incremental SemDeDup: screen a NEW period's vectors against an
    * EXISTING corpus without re-deduping the corpus. Seeds, coarse
    * cells, and cluster structure come from the CORPUS ALONE (frozen —
    * the same two-level chain as `semanticDedup`); each corpus cluster
    * is represented by its `band` members closest to the seed (by
    * (distance, id) — the stable centroid-proximal representatives);
    * each batch vector is assigned to its corpus cluster by the same
    * O(√k)-per-row projection+join and compared ONLY to that cluster's
    * representatives. `keep` = max cosine to the representatives < tau.
    *
    * Scale shape: the pairing is period × band, never period × corpus —
    * the fan-out is batch-sized (the `dedup_minhash_incremental` rule),
    * the rep table is k·band rows (index-sized), and the only new
    * exchange is the cluster-keyed rep join. Deterministic end to end:
    * the assignment chain is the batch op's, representative selection
    * has pinned (dist, id) tiebreaks, and cosines replay as ordered
    * double folds — the whole thing hash-matches the DuckDB oracle.
    */
  def semanticDedupIncremental(corpus: DataFrame, batch: DataFrame,
      k: Int = 0, band: Int = 8, tau: Double = 0.4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def prep(df: DataFrame): DataFrame = DataOps.parallelismFloor(
      df.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__v")))
    val cbase = prep(corpus)
      .localCheckpoint(true) // seed bound, seed table, corpus assignment
    val kEff = if (k > 0) k else autoClusterCount(cbase.count())
    val st = seedState(cbase, kEff)
    // corpus representatives: per cluster the `band` closest to the seed
    val reps = applyAssign(st, cbase)
      .withColumn("__pos", row_number().over(
        Window.partitionBy("cluster").orderBy(col("__dist"), col("vec_id"))))
      .where(col("__pos") <= band)
      .select(col("cluster"), col("__v").as("__vr"),
        dot(col("__v"), col("__v")).as("__sqr"))
      .localCheckpoint(true) // k·band rows; sized for a broadcast below
    val bAsg = applyAssign(st, prep(batch))
      .withColumn("__sq", dot(col("__v"), col("__v")))
    // a batch row's cluster always has corpus members (its seed, or the
    // smaller-id duplicate that owns every vector tied with it), so the
    // inner join drops nothing
    bAsg.join(sizedSide(reps, kEff.toLong * band), Seq("cluster"))
      .withColumn("__cos",
        dot(col("__v"), col("__vr")) / (sqrt(col("__sq")) * sqrt(col("__sqr"))))
      .groupBy("vec_id")
      .agg(max(col("cluster")).as("cluster"), max(col("__cos")).as("__nn"))
      .select(col("vec_id"), col("cluster"),
        round(col("__nn"), 6).as("nn_cos"), (col("__nn") < tau).as("keep"))
  }

  /** The frozen cluster structure of [[semanticDedupIncremental]] as
    * three PERSISTABLE tables — the period-close artifact of semantic
    * dedup maintenance:
    *  - `cells` (cell, cv): the live coarse centroids — O(√k) rows;
    *  - `seeds` (cell, seeds): the fine-seed arrays per live cell —
    *    k seed vectors total, grouped exactly as the assignment join
    *    consumes them;
    *  - `reps` (cluster, rv, rsq): the `band` centroid-proximal
    *    representatives per cluster — ≤ k·band rows.
    * Write all three once when the corpus period closes; screen every
    * later batch from the READ-BACK structure alone with
    * [[semanticScreenStoredState]] — the corpus is never re-read, the
    * structure never re-derived. All values are doubles/longs, so the
    * parquet round-trip is exact and the stored screen is bit-identical
    * to the in-query [[semanticDedupIncremental]].
    */
  def semanticStateTables(corpus: DataFrame, k: Int = 0, band: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cbase = DataOps.parallelismFloor(
        corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__v")))
      .localCheckpoint(true) // seed bound, seed table, corpus assignment
    val kEff = if (k > 0) k else autoClusterCount(cbase.count())
    val st = seedState(cbase, kEff)
    val reps = applyAssign(st, cbase)
      .withColumn("__pos", row_number().over(
        Window.partitionBy("cluster").orderBy(col("__dist"), col("vec_id"))))
      .where(col("__pos") <= band)
      .select(col("cluster"), col("__v").as("rv"),
        dot(col("__v"), col("__v")).as("rsq"))
    val cells = st.liveCellVecs.toSeq
      .map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cv")
    val seeds = st.cellSeeds
      .select(col("__cell").as("cell"), col("__ss").as("seeds"))
    (cells, seeds, reps)
  }

  /** Rebuild the frozen two-level assignment from READ-BACK (cells,
    * seeds) tables. Consistency is enforced on every load, not
    * trusted (the stored-LSH lesson): the live-cell sets of the two
    * tables must be IDENTICAL — a seeds row whose cell is missing from
    * `cells` can never be assigned to (its seeds silently leave the
    * index), and a `cells` row with no seeds row makes the assignment
    * join silently DROP every batch vector routed to it. Both checks
    * ride the same O(√k) collects that materialize the broadcast
    * state, so they run on every screen.
    */
  private def seedStateFromTables(cells: DataFrame,
      seeds: DataFrame): SeedState = {
    val live = cells.select(col("cell").cast("int"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(live.nonEmpty,
      "seedStateFromTables: the stored cells table is empty — not a " +
        "persisted cluster structure")
    val seedCellSet = seeds.select(col("cell").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    val cellSet = live.map(_._1).toSet
    require(cellSet == seedCellSet,
      "seedStateFromTables: stored cluster structure is inconsistent — " +
        s"cells table has ${(cellSet -- seedCellSet).toSeq.sorted.take(5)}" +
        s" without seeds and seeds table has " +
        s"${(seedCellSet -- cellSet).toSeq.sorted.take(5)} without a " +
        "centroid (first 5 shown); the two tables were written from " +
        "different period closes — a mismatch silently drops or " +
        "mis-assigns batch vectors")
    val spark = cells.sparkSession
    val bcLive = spark.sparkContext.broadcast(
      (live.map(_._1), live.map(_._2)))
    val liveCellUdf = udf { v: Seq[Double] =>
      val arr = v.toArray
      val (liveIds, cvs) = bcLive.value
      var bi = 0
      var bd = Double.PositiveInfinity
      var j = 0
      while (j < cvs.length) {
        val d = sqDist(arr, cvs(j))
        if (d < bd) { bd = d; bi = j }
        j += 1
      }
      liveIds(bi)
    }
    val seedCount = seeds.agg(sum(size(col("seeds")))).head().getLong(0)
    SeedState(
      seeds.select(col("cell").as("__cell"), col("seeds").as("__ss")),
      liveCellUdf, seedCount.toInt, live)
  }

  /** Screen a new period's vectors against a PERSISTED cluster
    * structure (the read-back output of [[semanticStateTables]]) —
    * identical semantics and bit-identical output to
    * [[semanticDedupIncremental]], but the plan reads ONLY stored
    * state and the new batch: old vectors are never re-read, seeds and
    * representatives never re-derived.
    *
    * Contract checks on every screen: the cells/seeds consistency
    * guard ([[seedStateFromTables]]) plus a value-path raise when any
    * cluster carries MORE than `band` representatives — a store built
    * with a larger band (or a reps table appended twice) would
    * silently widen the comparison set and flip `keep` verdicts; the
    * check is a cluster-keyed window over the index-sized reps table,
    * the stored-LSH posting-guard shape.
    *
    * Scale shape unchanged from the in-query incremental: batch × band
    * fan-out, index-sized join sides, one cluster-keyed exchange.
    */
  def semanticScreenStoredState(cells: DataFrame, seeds: DataFrame,
      reps: DataFrame, batch: DataFrame, band: Int = 8, tau: Double = 0.4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val st = seedStateFromTables(cells, seeds)
    val checkedReps = reps
      .withColumn("__nr", count(lit(1)).over(Window.partitionBy("cluster")))
      .select(col("cluster"),
        when(col("__nr") <= band, col("rv"))
          .otherwise(raise_error(concat(
            lit("semanticScreenStoredState: cluster "),
            coalesce(col("cluster").cast("string"), lit("null")),
            lit(" has "), col("__nr").cast("string"),
            lit(s" stored representatives > band=$band — the structure " +
              "was persisted with different parameters, or the reps " +
              "table was appended twice (a re-closed period)"))))
          .as("__vr"),
        col("rsq").as("__sqr"))
    val bAsg = applyAssign(st, DataOps.parallelismFloor(
        batch.select(col(idCol).as("vec_id"),
          asDouble(col(vecCol)).as("__v"))))
      .withColumn("__sq", dot(col("__v"), col("__v")))
    bAsg.join(sizedSide(checkedReps, st.seedCount.toLong * band),
        Seq("cluster"))
      .withColumn("__cos",
        dot(col("__v"), col("__vr")) / (sqrt(col("__sq")) * sqrt(col("__sqr"))))
      .groupBy("vec_id")
      .agg(max(col("cluster")).as("cluster"), max(col("__cos")).as("__nn"))
      .select(col("vec_id"), col("cluster"),
        round(col("__nn"), 6).as("nn_cos"), (col("__nn") < tau).as("keep"))
  }

  /** Streaming form of [[semanticDedupIncremental]]: screen an unbounded
    * STREAM of vectors against the frozen corpus cluster structure. Same
    * semantics, zero state: the seed table, coarse centroids, and the
    * per-cluster representative ARRAYS are all derived from the static
    * corpus when the query is built, and each arriving vector is a pure
    * projection + two stream-static joins (cell table, rep arrays) with
    * the max-cosine fold computed row-locally over its cluster's ≤`band`
    * representatives — append-mode, no watermark, no state store, so one
    * definition serves batch frames and streams identically (the spec
    * pins stream ≡ [[semanticDedupIncremental]]).
    */
  def semanticScreen(stream: DataFrame, corpus: DataFrame,
      k: Int = 0, band: Int = 8, tau: Double = 0.4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cbase = DataOps.parallelismFloor(
        corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__v")))
      .localCheckpoint(true)
    val kEff = if (k > 0) k else autoClusterCount(cbase.count())
    val st = seedState(cbase, kEff)
    val reps = applyAssign(st, cbase)
      .withColumn("__pos", row_number().over(
        Window.partitionBy("cluster").orderBy(col("__dist"), col("vec_id"))))
      .where(col("__pos") <= band)
      .groupBy("cluster")
      .agg(collect_list(struct(col("__v").as("vr"),
        dot(col("__v"), col("__v")).as("sqr"))).as("__reps"))
      .localCheckpoint(true) // k rows of ≤band reps: the static join side
    val nnUdf = udf { (v: Seq[Double], rs: Seq[org.apache.spark.sql.Row]) =>
      val arr = v.toArray
      var sq = 0.0
      var si = 0
      while (si < arr.length) { sq += arr(si) * arr(si); si += 1 }
      var best = Double.NegativeInfinity
      rs.foreach { r =>
        val vr = r.getSeq[Double](0)
        var s = 0.0
        var i = 0
        while (i < arr.length) { s += arr(i) * vr(i); i += 1 }
        val c = s / (math.sqrt(sq) * math.sqrt(r.getDouble(1)))
        if (c > best) best = c
      }
      best
    }
    val prepped = stream.select(col(idCol).as("vec_id"),
      asDouble(col(vecCol)).as("__v"))
    applyAssignStreamSafe(st, prepped)
      .join(sizedSide(reps, kEff.toLong * band), Seq("cluster"))
      .withColumn("__nn", nnUdf(col("__v"), col("__reps")))
      .select(col("vec_id"), col("cluster"),
        round(col("__nn"), 6).as("nn_cos"), (col("__nn") < tau).as("keep"))
  }

  /** Join-strategy guard for the index-sized-but-k-proportional sides
    * (reps: k·band rows, cell table: k seed vectors): broadcast while
    * genuinely small, pin shuffle_hash above the bound — checkpointed
    * frames carry no size statistics, so leaving the planner to gamble
    * re-opens the broadcast-OOM ScaleAudit measured on the
    * set-similarity joins, and auto-k grows with the corpus (at 1B
    * vectors, k = 100k ⇒ reps ≈ 800k rows — not a broadcast).
    */
  private def sizedSide(df: DataFrame, rows: Long): DataFrame =
    if (rows <= 200000L) broadcast(df) else df.hint("shuffle_hash")

  /** [[applyAssign]] with the small side's strategy pinned — in the
    * streaming path the stream side must never be the build side.
    */
  private def applyAssignStreamSafe(st: SeedState, target: DataFrame): DataFrame = {
    val fineUdf = udf { (v: Seq[Double], ss: Seq[org.apache.spark.sql.Row]) =>
      val arr = v.toArray
      var cluster = -1L
      var dist = Double.PositiveInfinity
      ss.foreach { r =>
        val d = sqDist(arr, r.getSeq[Double](1).toArray)
        if (d < dist) { dist = d; cluster = r.getLong(0) }
      }
      (cluster, dist)
    }
    target
      .withColumn("__cell", st.liveCellUdf(col("__v")))
      .join(sizedSide(st.cellSeeds, st.seedCount), Seq("__cell"))
      .withColumn("__a", fineUdf(col("__v"), col("__ss")))
      .select(col("vec_id"), col("__v"),
        col("__a._1").as("cluster"), col("__a._2").as("__dist"))
  }

  /** Cluster count for `semanticDedup`'s auto mode: one cluster per 10k
    * vectors, floored at 16 — cluster-keyed parallelism grows linearly
    * with the corpus while mean cluster size stays ~constant.
    */
  private[graft] def autoClusterCount(n: Long): Int =
    math.max(16L, (n + 9999L) / 10000L).min(Int.MaxValue.toLong).toInt

  /** Last semanticDedup assignment footprint, for ScaleExt's O(√k)
    * memory assertion: (driver-collected coarse vectors, live cells) —
    * BOTH must stay ~√k as the corpus (and so auto-k) grows.
    */
  @volatile private[graft] var lastAssignStats: (Int, Int) = (0, 0)

  /** Coarse-cell count for the two-level assignment: ceil(√k), floored at
    * 4 — per-row assignment work is then c + k/c ≈ 2√k distance folds.
    */
  private[graft] def autoCoarseCount(k: Int): Int =
    math.max(4, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** Ordered left-fold squared distance — the exact double sequence of the
    * oracle's `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b),
    * p -> (p[1]-p[2])²)), +)`, so driver/executor/DuckDB agree bit-for-bit.
    */
  private[graft] def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val m = math.min(a.length, b.length)
    while (i < m) { val d = a(i) - b(i); acc = acc + d * d; i += 1 }
    acc
  }

  /** Index of the nearest centroid under strict-< (ties keep the smallest
    * index — `ORDER BY dist, idx` rn=1 in the oracle).
    */
  private[graft] def nearestIdx(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var bi = 0
    var bd = Double.PositiveInfinity
    var j = 0
    while (j < cents.length) {
      val d = sqDist(v, cents(j))
      if (d < bd) { bd = d; bi = j }
      j += 1
    }
    bi
  }

  /** The ±1 sign matrix of the sparse JL projection, keyed by
    * splitmix64(i·k + d) — a pure function of the coordinates, so the
    * "random" matrix needs no storage, no RNG state, and replays exactly
    * (the sample_bottomk HUGEINT chain) in the DuckDB oracle.
    */
  private[ext] def projectionSigns(dIn: Int, k: Int): Array[Array[Double]] =
    Array.tabulate(k, dIn)((d, i) =>
      if (Aggs.mix64((i * k + d).toLong) >= 0L) 1.0 else -1.0)

  /** Johnson–Lindenstrauss random projection to `k` dimensions: each
    * output coordinate is Σᵢ vᵢ·±1, signs from the hash matrix above
    * (apply 1/√k scaling downstream if unit-norm preservation matters —
    * kept unscaled here so the output is an exact DECIMAL sum).
    *
    * Scale shape: the sign matrix rides inside ONE native fused kernel
    * (`VectorExprs.JlProject`) — no matrix join, no explode of terms, no
    * shuffle of any kind (the matrix-join formulation would shuffle k×
    * the corpus). Terms are rounded at 6 and accumulated as exact scaled
    * longs (≡ the previous DECIMAL(30,6) fold term-for-term), so the
    * sums are order-independent and engine-identical; the kernel
    * replaced an interpreted k×dIn decimal lambda that WAS the whole
    * cost of the `vec_project` bench entry (3.6 s → sub-second at
    * sf0.1).
    */
  def randomProject(df: DataFrame, k: Int = 16, dIn: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .select(col(idCol),
        posexplode(VectorExprs.jl_project(col("__v"), k, dIn)))
      .select(col(idCol), col("pos").cast("long").as("d"), col("col").as("proj"))

  def meanVectors(df: DataFrame, keyCol: String,
      vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("k"), asDouble(col(vecCol)).as("v"))
      .as[(Long, Seq[Double])].rdd
      .aggregateByKey((Array.empty[Double], 0L))(
        { case ((acc, n), v) =>
          val a = if (acc.isEmpty) new Array[Double](v.length) else acc
          var i = 0; while (i < v.length) { a(i) += v(i); i += 1 }
          (a, n + 1)
        },
        { case ((a, na), (b, nb)) =>
          if (a.isEmpty) (b, na + nb)
          else {
            if (b.nonEmpty) { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 } }
            (a, na + nb)
          }
        })
      .map { case (k, (s, n)) => (k, s.map(_ / n).toSeq, n) }
      .toDF(keyCol, "mean_vec", "n")
  }
}
