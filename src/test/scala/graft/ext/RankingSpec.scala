package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class RankingSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- int8 quantization ---------------------------------------------------

  test("int8: values land in [-128,127]; dequantization error <= scale/2") {
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f, 2.5f, -3.0f, 10.0f)),
      (2L, Array(-1e-3f, 1e-3f, 0.0f, 5e-4f, -5e-4f)),
      (3L, Array(100.0f, 100.0f, 100.0f, 100.0f, 100.0f))) // constant
      .toDF("vec_id", "embedding")
    val q = Quantize.int8(vecs, "vec_id", "embedding")
      .withColumn("vhat", Quantize.dequantize(col("qv"), col("mn"), col("scale")))
    val rows = q.collect().map(r => r.getLong(0) ->
      (r.getSeq[Int](1), r.getDouble(2), r.getDouble(3), r.getSeq[Double](4))).toMap

    val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for ((id, (qv, _, scale, vhat)) <- rows) {
      assert(qv.forall(v => v >= -128 && v <= 127), s"vec $id out of int8 range")
      orig(id).zip(vhat).foreach { case (x, xh) =>
        assert(math.abs(x.toDouble - xh) <= scale / 2 + 1e-12,
          s"vec $id: |$x - $xh| > scale/2 = ${scale / 2}")
      }
    }
    // constant vector quantizes exactly (scale 1, q = -128)
    val (qv3, mn3, s3, vhat3) = rows(3L)
    assert(qv3.forall(_ == -128) && mn3 == 100.0 && s3 == 1.0)
    assert(vhat3.forall(_ == 100.0))
  }

  test("int8: fidelity ~1 for real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val fid = Quantize.fidelity(emb, "vec_id", "embedding")
      .agg(min("cos_fidelity")).head().getDouble(0)
    assert(fid > 0.999, s"worst int8 cosine fidelity $fid")
  }

  // ---- tf-idf / bm25 -------------------------------------------------------

  private val corpus = Seq(
    (1L, "join join join scan"),
    (2L, "join scan filter filter"),
    (3L, "vector vector vector vector vector vector"),
    (4L, "scan filter merge")).toDF("doc_id", "text")

  test("termFrequencies and documentFrequencies count exactly") {
    val tf = Ranking.termFrequencies(corpus, "doc_id", "text")
    assert(tf.where($"doc_id" === 1L && $"term" === "join").head().getLong(2) == 3L)
    val df = Ranking.documentFrequencies(tf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("join" -> 2L, "scan" -> 3L, "filter" -> 2L, "merge" -> 1L, "vector" -> 1L))
  }

  test("tfidf matches the hand formula tf * ln(N/df)") {
    val out = Ranking.tfidf(corpus, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) -> r.getAs[Double]("tfidf"))
      .toMap
    assert(math.abs(out((1L, "join")) - 3 * math.log(4.0 / 2)) < 1e-12)
    assert(math.abs(out((3L, "vector")) - 6 * math.log(4.0 / 1)) < 1e-12)
    assert(math.abs(out((4L, "merge")) - 1 * math.log(4.0 / 1)) < 1e-12)
  }

  test("bm25 matches the hand formula and ranks heavier tf higher") {
    val k1 = 1.2; val b = 0.75
    val scores = Ranking.bm25(corpus, "doc_id", "text", Seq("join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 2L)) // only docs containing "join"
    val avgdl = (4 + 4 + 6 + 3) / 4.0
    def hand(tf: Double, dl: Double): Double = {
      val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
      val raw = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(scores(1L) - hand(3, 4)) < 1e-9)
    assert(math.abs(scores(2L) - hand(1, 4)) < 1e-9)
    assert(scores(1L) > scores(2L))
  }

  test("bm25 multi-term scores sum per-term contributions") {
    val scores = Ranking.bm25(corpus, "doc_id", "text", Seq("scan", "merge"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 2L, 4L))
    // doc 4 has both terms; its score must exceed its single-term parts
    val scanOnly = Ranking.bm25(corpus, "doc_id", "text", Seq("scan"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(4L) > scanOnly(4L))
  }
}
