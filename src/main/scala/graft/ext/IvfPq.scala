package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF+PQ composite index (IVFADC, Jégou et al. 2011 §IV): the corpus is
  * partitioned into IVF cells and each vector stored as the PQ codes of
  * its RESIDUAL (vector − cell centroid); a query probes its `nProbe`
  * nearest cells and ranks candidates by ADC lookups against the
  * per-cell query residual. This is the layout billion-vector systems
  * actually deploy — IVF prunes the corpus to a few cells, PQ shrinks
  * what remains to `m` bytes per vector — and residual quantization is
  * what makes the small codebook sharp: residuals live in a ball around
  * the centroid, so the same k codewords resolve far finer distances
  * than they would on raw vectors.
  *
  * Determinism discipline (the IVF/PQ one, unchanged): splitmix64 stride
  * init and scaled-long Lloyd sums in the coarse quantizer, stride-
  * sampled residual codebook, every L2² term rounded at scale 6 into an
  * exact integer, argmin ties to the smallest code via the packed key,
  * ADC sums integer — the full chain replays bit-for-bit in DuckDB.
  *
  * Scale shape: centroids (nCells), codebook (k), queries (nq) are the
  * ONLY collected/broadcast state — all index-sized by construction.
  * Assignment, residual, and encoding are one narrow per-row projection
  * over the corpus (zero joins); the search scan fans each corpus row
  * out only by the queries that probed ITS cell (~nq·nProbe/nCells per
  * row on average), and the only exchange is the per-query top-k.
  */
object IvfPq {

  /** Probed ADC search over the composite index, built end-to-end:
    * coarse quantizer = `Ivf.fit(nCells, 1 Lloyd step)`, residual
    * codebook = the `k` stride-sampled residuals (`Pq`'s rule), queries
    * = the `nq` smallest-id corpus vectors (`Pq.search`'s protocol).
    * Returns (query_id, neighbor_id, adist, rank) — `Pq.search`'s
    * contract, with candidates restricted to the probed cells.
    */
  def search(corpus: DataFrame, nCells: Int = 16, m: Int = 4, k: Int = 16,
      nq: Int = 5, topK: Int = 10, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val centsDf = Ivf.fit(corpus, nCells, iterations = 1, idCol, vecCol)
    val assigned = Ivf.assign(corpus, centsDf, idCol, vecCol)
      .localCheckpoint(true) // read for codebook, codes, AND the scan
    val cents: Map[Int, Array[Double]] = centsDf.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap

    // residual codebook: the k stride-sampled residuals in id order
    // (Pq.codebook's rule, applied to residual space)
    val n = assigned.count()
    val stride = math.max(n / k, 1L)
    val cbook: Array[Array[Double]] = assigned
      .where(col("id") % stride === 0)
      .orderBy("id").limit(k)
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val cv = cents(r.getInt(2))
        Array.tabulate(v.length)(i => v(i) - cv(i))
      }
    val dim = cbook.headOption.map(_.length).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m

    // per-row residual PQ codes: one narrow projection (centroids and
    // codebook broadcast; ties to the smallest code via the packed key)
    val bcCents = spark.sparkContext.broadcast(cents)
    val bcCb = spark.sparkContext.broadcast(cbook)
    val kk = k
    val mm = m
    val codesOf = udf { (v: Seq[Double], cell: Int) =>
      val cv = bcCents.value(cell)
      val r = Array.tabulate(v.length)(i => v(i) - cv(i))
      Array.tabulate(mm) { q =>
        var bestKey = Long.MaxValue
        var c = 0
        while (c < bcCb.value.length) {
          val d2 = Pq.dist6(r, q * sub, bcCb.value(c), q * sub, sub)
          val key = d2 * kk + c
          if (key < bestKey) bestKey = key
          c += 1
        }
        (bestKey % kk).toInt
      }
    }
    val encoded = assigned.select(col("id"), col("cell"),
      codesOf(col("v"), col("cell")).as("codes"))

    // probes: top-nProbe cells per query by exact cosine (Ivf.search's
    // rule), computed driver-side — nq × nCells pairs
    val queries: Array[(Long, Array[Double])] = assigned
      .select(col("id").cast("long").as("id"), col("v"))
      .orderBy("id").limit(nq).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); sa += a(i) * a(i); sb += b(i) * b(i); i += 1 }
      s / (math.sqrt(sa) * math.sqrt(sb))
    }
    val centsSorted = cents.toArray.sortBy(_._1)
    // dt: (cell -> list of (query_id, m×k ADC table of the query's
    // residual against that cell)) — nq·nProbe tables of m·k longs
    val dt: Map[Int, Array[(Long, Array[Array[Long]])]] = queries.flatMap {
      case (qid, qv) =>
        centsSorted.map { case (cell, cv) => (qid, cell, cos(qv, cv)) }
          .sortBy { case (_, cell, sim) => (-sim, cell) }
          .take(nProbe)
          .map { case (_, cell, _) =>
            val cv = cents(cell)
            val qr = Array.tabulate(qv.length)(i => qv(i) - cv(i))
            (cell, (qid, Array.tabulate(mm, kk)((q, c) =>
              Pq.dist6(qr, q * sub, cbook(c), q * sub, sub))))
          }
    }.groupBy(_._1).map { case (cell, xs) => (cell, xs.map(_._2)) }
    val bcDt = spark.sparkContext.broadcast(dt)

    // scan: each corpus row answers only the queries probing its cell
    val adists = udf { (cell: Int, codes: Seq[Int]) =>
      bcDt.value.getOrElse(cell, Array.empty[(Long, Array[Array[Long]])])
        .map { case (qid, t) =>
          var s = 0L
          var q = 0
          while (q < mm) { s += t(q)(codes(q)); q += 1 }
          (qid, s)
        }.toSeq
    }
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    encoded
      .select(col("id").cast("long").as("neighbor_id"),
        explode(adists(col("cell"), col("codes"))).as("__qa"))
      .select(col("__qa._1").as("query_id"), col("neighbor_id"),
        col("__qa._2").as("adist"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= topK)
      .select("query_id", "neighbor_id", "adist", "rank")
  }

  /** IVFADC+R (Jégou et al. 2011 §V "re-ranking"): the standard third
    * stage of the billion-scale layout — ADC produces a candidate
    * shortlist of `refineC` per query, then the shortlist alone is
    * re-ranked by EXACT cosine against the true vectors. ADC's
    * quantization error is what costs it recall; the refine pass buys
    * most of it back for the price of `nq·refineC` exact distances.
    * Returns (query_id, neighbor_id, rank) ranked by exact cosine
    * (desc, ties to the smaller neighbor id) — `Ivf.search`'s contract.
    *
    * Scale shape: the shortlist is nq·refineC rows BY CONSTRUCTION, so
    * it broadcasts; the corpus is pruned to shortlist members by one
    * broadcast-hash semi-shaped join (never shuffled, never collected)
    * and the nq query vectors attach the same way. The only exchange is
    * the per-query top-k window over ≤ refineC candidates each.
    */
  def searchRefined(corpus: DataFrame, nCells: Int = 16, m: Int = 4,
      k: Int = 16, nq: Int = 5, topK: Int = 10, nProbe: Int = 2,
      refineC: Int = 30,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import Similarity.dot
    val cand = search(corpus, nCells, m, k, nq, refineC, nProbe,
      idCol, vecCol).select("query_id", "neighbor_id")
    val qvecs = corpus
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .join(broadcast(cand.select("query_id").distinct()), Seq("query_id"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("v"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .withColumn("vn", sqrt(dot(col("v"), col("v"))))
      .join(broadcast(qvecs), Seq("query_id"))
      .withColumn("cosine",
        dot(col("qv"), col("v")) / (col("qn") * col("vn")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= topK)
      .select("query_id", "neighbor_id", "rank")
  }
}
