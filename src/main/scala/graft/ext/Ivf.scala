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
  * Everything is DataFrame-shaped for scale:
  *  - centroid init: deterministic stride sample over the corpus (no RNG —
  *    resumable plans);
  *  - Lloyd iterations: assign via broadcast nested-loop against the tiny
  *    centroid set (C rows), recompute via posexplode + per-dimension
  *    mean — the shuffle carries (cell, dim, value), never whole vectors
  *    to a single node;
  *  - search: probe-cells join prunes the corpus BEFORE any dot product.
  */
object Ivf {

  /** Deterministic k-means-lite: stride-sampled init + `iterations` Lloyd
    * steps. Returns (cell, cv) with unit-normalized centroids.
    */
  def fit(corpus: DataFrame, nCells: Int, iterations: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = corpus.count()
    val stride = math.max(n / nCells, 1L)
    val w = Window.orderBy(idCol)
    var centroids = corpus
      .withColumn("__rn", row_number().over(w))
      .where((col("__rn") - 1) % stride === 0 && col("__rn") <= stride * nCells)
      .select(((col("__rn") - 1) / stride).cast("int").as("cell"),
        col(vecCol).cast("array<double>").as("cv"))
      .localCheckpoint()

    var i = 0
    while (i < iterations) {
      val assigned = assign(corpus, centroids, idCol, vecCol)
      centroids = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("x"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
        .select(col("cell"), transform(col("px"), p => p.getField("x")).as("cv"))
        .localCheckpoint()
      i += 1
    }
    centroids
  }

  /** Nearest-cell assignment: (id, v, cell). The centroid set is tiny, so
    * this is a broadcast nested loop + max_by — one pass over the corpus.
    */
  def assign(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    c.join(broadcast(centroids))
      .withColumn("sim", dot(col("v"), col("cv")) /
        (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("cv"), col("cv")))))
      .groupBy("id")
      .agg(max_by(col("cell"), col("sim")).as("cell"), first(col("v")).as("v"))
  }

  /** Cosine top-k probing only the `nProbe` nearest cells per query.
    * Output: (query_id, neighbor_id, cosine, rank) — same contract as
    * Similarity.cosineTopK (the exact oracle for recall tests).
    */
  def search(queries: DataFrame, assignedCorpus: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    // top-nProbe cells per query (against the tiny centroid set)
    val wCell = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell").asc)
    val probes = q.join(broadcast(centroids))
      .withColumn("csim", dot(col("qv"), col("cv")) /
        (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv")))))
      .withColumn("pr", row_number().over(wCell))
      .where(col("pr") <= nProbe)
      .select("query_id", "qv", "cell")

    val wTop = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(assignedCorpus.select(col("id").as("neighbor_id"), col("v"), col("cell")),
        Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("v")) /
        (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("v"), col("v")))))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
