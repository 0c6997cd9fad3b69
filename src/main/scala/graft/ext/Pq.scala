package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN: split each d-dim vector into `m`
  * subvectors, quantize every subvector to one of `k` per-subspace
  * codebook centroids, and answer queries with asymmetric distance
  * computation (ADC) — the query's exact per-(subspace, centroid) L2²
  * table is built once and each corpus vector's approximate distance is
  * `m` table lookups. This is the billion-vector scale path (Jégou et
  * al. 2011, public): the corpus is stored as `m` small codes, never
  * re-read as floats at query time.
  *
  * Codebooks here are a deterministic stride sample of the corpus (the
  * Ivf.fit init rule; swapping in per-subspace Lloyd = calling Ivf.fit on
  * each subvector block — the encode/ADC machinery below is unchanged).
  *
  * Determinism discipline (the vec_covariance/IVF one): every L2² term
  * is rounded at 6 into an exact scaled long, so subspace distances are
  * INTEGERS; argmin ties break to the smallest centroid via the single
  * packed key `d2·k + c`, and ADC distances are integer sums — the whole
  * index, encode, and search replays bit-for-bit in any engine.
  *
  * Scale shape: the codebook is m·k rows BY CONSTRUCTION — collected
  * once, broadcast; encode is a narrow per-row projection (no join, no
  * shuffle, no fan-out of (vector, centroid, dim) rows); search fans the
  * corpus out only by the (tiny) query count and the only exchange is
  * the per-query top-k window.
  */
object Pq {

  /** Packed argmin key over the subspace distance: `d2 * k + c`.
    * d2 is a scale-6 long of an L2² ≤ (dim · max-term); k ≤ 256 keeps the
    * pack far below 2^63 for any sane embedding range.
    */
  @inline private def packKey(d2: Long, c: Int, k: Int): Long = d2 * k + c

  /** Scale-6 integer L2² between two double slices. */
  private[ext] def dist6(a: Array[Double], aOff: Int, b: Array[Double],
      bOff: Int, len: Int): Long = {
    var s = 0L
    var i = 0
    while (i < len) {
      val t = a(aOff + i) - b(bOff + i)
      s += Similarity.round6Scaled(t * t) // round6Scaled scales by 1e6 itself
      i += 1
    }
    s
  }

  /** Deterministic stride-sample codebook: the subvectors of the corpus
    * vectors whose dense id is a multiple of `max(n/k, 1)` (first `k` in
    * id order) — replayable as one SQL filter. Returns the centroid
    * arrays (c, full vector) collected driver-side (k rows).
    */
  private def codebook(corpus: DataFrame, k: Int,
      idCol: String, vecCol: String): Array[(Int, Array[Double])] = {
    val n = corpus.count()
    val stride = math.max(n / k, 1L)
    corpus.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .where(col("id") % stride === 0)
      .orderBy("id").limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
  }

  /** Encode the corpus: per vector, the `m` argmin codes (columns
    * code0..code{m-1}) against the broadcast codebook — one narrow
    * projection, ties to the smallest centroid id via the packed key.
    */
  def encode(corpus: DataFrame, m: Int = 4, k: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = codebook(corpus, k, idCol, vecCol)
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    val codes = udf { v: Seq[Double] =>
      val arr = v.toArray
      val sub = arr.length / m
      (0 until m).map { q =>
        var bestKey = Long.MaxValue
        for ((c, cv) <- bc.value) {
          val key = packKey(dist6(arr, q * sub, cv, q * sub, sub), c, k)
          if (key < bestKey) bestKey = key
        }
        (bestKey % k).toInt
      }
    }
    DataOps.parallelismFloor(
        corpus.select(col(idCol).cast("long").as("id"),
          col(vecCol).cast("array<double>").as("v")))
      .withColumn("__codes", codes(col("v")))
      .select(Seq(col("id")) ++
        (0 until m).map(q => element_at(col("__codes"), q + 1).as(s"code$q")): _*)
  }

  /** ADC search: `nq` queries (smallest ids), approximate distance =
    * sum over subspaces of the query's exact distance to the CENTROID the
    * corpus vector was quantized to. Returns
    * (query_id, neighbor_id, adist, rank), top `topK` per query by
    * (adist asc, id asc), self excluded — all-integer ordering.
    */
  def search(corpus: DataFrame, m: Int = 4, k: Int = 16, nq: Int = 5,
      topK: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = codebook(corpus, k, idCol, vecCol)
    val queries = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .orderBy("id").limit(nq).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // dt(query)(q)(c): the ADC lookup tables — nq · m · k longs, driver-built
    val dt = queries.map { case (qid, qv) =>
      val sub = qv.length / m
      (qid, Array.tabulate(m, k) { (q, c) =>
        dist6(qv, q * sub, cents(c)._2, q * sub, sub)
      })
    }
    val bcDt = corpus.sparkSession.sparkContext.broadcast(dt)
    val enc = encode(corpus, m, k, idCol, vecCol)
    val adists = udf { codes: Seq[Int] =>
      bcDt.value.map { case (qid, t) =>
        var s = 0L
        var q = 0
        while (q < m) { s += t(q)(codes(q)); q += 1 }
        (qid, s)
      }.toSeq
    }
    val codeArr = array((0 until m).map(q => col(s"code$q")): _*)
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    enc
      .select(col("id").as("neighbor_id"),
        explode(adists(codeArr)).as("__qa"))
      .select(col("__qa._1").as("query_id"), col("neighbor_id"),
        col("__qa._2").as("adist"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= topK)
      .select("query_id", "neighbor_id", "adist", "rank")
  }
}
