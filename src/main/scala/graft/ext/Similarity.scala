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

  /** sum(a[i]*b[i]) as a codegen'd expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column = c.cast("array<double>")

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
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (norm(col("qv")) * norm(col("cv"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Random-hyperplane signature: bit j = sign(v · h_j) where hyperplane
    * h_j's components are deterministic pseudo-random ±1s derived from
    * xxhash64(j, dim). Pure expressions, computed in one pass.
    */
  def rhpSignature(vec: Column, bits: Int = 16): Column =
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, j) => acc.bitwiseOR(
        call_function("shiftleft",
          when(aggregate(zip_with(vec,
            sequence(lit(0), size(vec) - 1),
            (x, d) => x * when(xxhash64(j, d) % 2 === 0, 1.0d).otherwise(-1.0d)),
            lit(0.0d), (a, x) => a + x) > 0, lit(1L)).otherwise(lit(0L)),
          j.cast("int"))))

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
      val sig = rhpSignature(asDouble(col(vecCol)), bits)
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(v), sig.as("sig"))
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
      .withColumn("cosine", dot(col("qv"), col("cv")) / (norm(col("qv")) * norm(col("cv"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (cos >= threshold), LSH-bucketed
    * candidate generation + exact verification; the embedding flavor of
    * Dedup.
    */
  def nearDupPairs(
      df: DataFrame, threshold: Double = 0.95,
      bits: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rowsPerBand = bits / bands
    val mask = (1L << rowsPerBand) - 1
    val sig = rhpSignature(asDouble(col(vecCol)), bits)
    val banded = df
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"), sig.as("sig"))
      .select(col("id"), col("v"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * rowsPerBand).bitwiseAND(lit(mask)).as("h"))): _*)).as("bh"))
      .select(col("id"), col("v"), col("bh.band").as("band"), col("bh.h").as("h"))

    val l = banded.select(col("band"), col("h"), col("id").as("id_a"), col("v").as("va"))
    val r = banded.select(col("band"), col("h"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("band", "h"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact cosine near-duplicate pairs (the small-scale oracle for
    * nearDupPairs' recall tests): all pairs, no bucketing.
    */
  def nearDupPairsExact(
      df: DataFrame, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val b = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
