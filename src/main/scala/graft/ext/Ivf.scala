package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Similarity.dot

/** IVF (inverted-file) ANN index: k-means-lite centroids, corpus assigned
  * to its nearest centroid once, queries probe only the `nProbe` nearest
  * cells — the classic trade of one cheap clustering pass for a
  * corpus-partition-pruned search.
  *
  * Everything is shaped for scale:
  *  - centroid init: deterministic stride sample over the corpus (no RNG —
  *    resumable plans);
  *  - assignment: the centroid set is tiny BY CONSTRUCTION (nCells rows),
  *    so it is collected once, unit-normalized, and broadcast; nearest-cell
  *    is then a narrow per-row argmax projection — zero joins, zero
  *    shuffles over the corpus (|v| is constant per row, so it never
  *    affects the argmax and only centroids need normalizing);
  *  - Lloyd recompute: per-cell element-wise vector mean via one
  *    `aggregateByKey` pass (map-side combine; the shuffle carries nCells
  *    partial sums per partition, never exploded (cell, dim, value) rows);
  *  - search: probe-cells join prunes the corpus BEFORE any dot product.
  */
object Ivf {

  /** Collect the (tiny) centroid set: the broadcastable state of the
    * index (normalization happens once in `assignArrays`). Sorted by cell
    * so argmax ties resolve to the smallest cell id deterministically.
    */
  private def centroidArrays(centroids: DataFrame): Array[(Int, Array[Double])] =
    centroids.select(col("cell"), col("cv")).collect().map { r =>
      (r.getInt(0), r.getSeq[Double](1).toArray)
    }.sortBy(_._1)

  /** Per-cell element-wise mean of the assigned vectors: one map-side-
    * combining pass (the rare genuinely-imperative aggregation Spark SQL
    * has no built-in for — an `aggregateByKey` with in-place array sums).
    * Collected straight to the driver: the result is nCells rows, so the
    * collect IS the cheapest possible materialization — no DataFrame
    * round-trip, no checkpoint job between Lloyd iterations.
    *
    * Each coordinate is rounded at scale 6 and summed as an exact scaled
    * long (the `vec_covariance` discipline), so the partial sums are
    * order-independent — the Lloyd step is bit-identical however the
    * partitions merge, which is what makes the WHOLE index replayable by
    * the driver's DuckDB oracle (float partial sums in shuffle-arrival
    * order were the one non-deterministic link in the chain).
    */
  private def recomputeArrays(assigned: DataFrame): Array[(Int, Array[Double])] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.select(col("cell"), col("v")).as[(Int, Seq[Double])].rdd
      .aggregateByKey((Array.empty[Long], 0L))(
        { case ((acc, n), v) =>
          val a = if (acc.isEmpty) new Array[Long](v.length) else acc
          var i = 0
          while (i < v.length) { a(i) += Similarity.round6Scaled(v(i)); i += 1 }
          (a, n + 1)
        },
        { case ((a, na), (b, nb)) =>
          if (a.isEmpty) (b, na + nb)
          else {
            if (b.nonEmpty) { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 } }
            (a, na + nb)
          }
        })
      // identical double expression to the oracle's
      // CAST(s AS DOUBLE) / 1000000.0 / n
      .map { case (cell, (s, n)) => (cell, s.map(_.toDouble / 1e6 / n)) }
      .collect()
      .sortBy(_._1)
  }

  /** Deterministic k-means-lite: hash-stride-sampled init + `iterations`
    * Lloyd steps. Returns (cell, cv). The init filters to ~nCells rows by
    * `xxhash64(id) % stride == 0` — a narrow scan, NO global sort or
    * single-partition window — then the (tiny) sample is collected and
    * indexed driver-side.
    */
  def fit(corpus: DataFrame, nCells: Int, iterations: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.count()
    // ~4x oversample so the hash filter reliably yields >= nCells rows,
    // then stride over the id-sorted sample driver-side so the init spans
    // the id range (id-clustered data must not seed all cells in one spot)
    val stride = math.max(n / (4L * nCells), 1L)
    val slim = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("cv"))
    // splitmix64 (HashExprs.mix64), not xxhash64: any good hash works for
    // stride sampling, and mix64 already has an exact HUGEINT replay in
    // the DuckDB oracles (sample_bottomk) — keeping the init replayable.
    val picked = slim.where(pmod(HashExprs.mix64(col("id")), lit(stride)) === 0)
      .orderBy("id").collect()
    val base =
      if (picked.length >= nCells) picked
      else slim.orderBy("id").limit(nCells).collect()
    val step = math.max(base.length / nCells, 1)
    // Centroids live as a driver-side array between Lloyd iterations —
    // they are nCells rows BY CONSTRUCTION, so shipping them through a
    // DataFrame + checkpoint per iteration would only add jobs. One
    // distributed job per iteration (assign UDF + aggregateByKey), one
    // tiny collect; the public contract stays a DataFrame (LocalRelation,
    // free to broadcast downstream).
    var cents: Array[(Int, Array[Double])] = base.indices.by(step).take(nCells)
      .map(base(_)).zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
      .toArray

    var i = 0
    while (i < iterations) {
      cents = recomputeArrays(assignArrays(corpus, cents, idCol, vecCol))
      i += 1
    }
    cents.map { case (c, v) => (c, v.toSeq) }.toSeq.toDF("cell", "cv")
  }

  /** Nearest-cell assignment: (id, v, cell) as a narrow projection against
    * the broadcast normalized centroids — no join, no shuffle.
    */
  def assign(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignArrays(corpus, centroidArrays(centroids), idCol, vecCol)

  private def assignArrays(corpus: DataFrame, rawCents: Array[(Int, Array[Double])],
      idCol: String, vecCol: String): DataFrame = {
    val cents = rawCents.map { case (cell, cv) =>
      val n = math.sqrt(cv.map(x => x * x).sum)
      (cell, if (n == 0.0) cv else cv.map(_ / n))
    }.sortBy(_._1)
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    val nearest = udf { v: Seq[Double] =>
      val arr = v.toArray
      var best = -1
      var bestSim = Double.NegativeInfinity
      for ((cell, cv) <- bc.value) {
        var s = 0.0
        var i = 0
        val m = math.min(arr.length, cv.length)
        while (i < m) { s += arr(i) * cv(i); i += 1 }
        if (s > bestSim) { bestSim = s; best = cell }
      }
      best
    }
    DataOps.parallelismFloor(
        corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")))
      .withColumn("cell", nearest(col("v")))
  }

  /** Cosine top-k probing only the `nProbe` nearest cells per query.
    * Output: (query_id, neighbor_id, cosine, rank) — same contract as
    * Similarity.cosineTopK (the exact oracle for recall tests).
    */
  def search(queries: DataFrame, assignedCorpus: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Norms are computed once per ROW (query / centroid / corpus vector)
    // below the joins and carried as columns — never per pair. The pair
    // loop then runs exactly one dot product; the naive formulation costs
    // three (the cosine denominator re-derived per candidate), which at
    // scale triples the flops of the hottest loop in the index.
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val cents = centroids.withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    // top-nProbe cells per query (against the tiny centroid set)
    val wCell = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell").asc)
    val probes = q.join(broadcast(cents))
      .withColumn("csim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("pr", row_number().over(wCell))
      .where(col("pr") <= nProbe)
      .select("query_id", "qv", "qn", "cell")

    val corp = assignedCorpus
      .select(col("id").as("neighbor_id"), col("v"), col("cell"))
      .withColumn("vn", sqrt(dot(col("v"), col("v"))))
    val wTop = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(probes)
      .join(corp, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("vn")))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
