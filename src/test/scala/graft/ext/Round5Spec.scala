package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-5 operators: exact-substring rewrite, DSIR weights, perceptual
  * hash, Hilbert layout, product quantization.
  */
class Round5Spec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- substringRewrite ---------------------------------------------------

  test("substringRewrite: exact duplicate collapses, first copy survives") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.substringRewrite(docs, "doc_id", "text", k = 8)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 10L, 0L, text)))      // first occurrence untouched
    assert(got(1) == ((2L, 10L, 10L, "")))       // later copy fully removed
    assert(got(2)._3 == 0L && got(2)._4 == "totally different words here")
  }

  test("substringRewrite: within-doc repeat drops the second occurrence only") {
    // 8-token window repeated twice inside ONE document
    val w = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, s"$w mid $w"), (8L, "unrelated filler text")).toDF("doc_id", "text")
    val got = TextAnalysis.substringRewrite(docs, "doc_id", "text", k = 8)
      .where(col("doc_id") === 7L)
      .select("n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, String)].head()
    assert(got._1 == 17L)
    assert(got._2 == 8L)                          // second window removed
    assert(got._3 == s"$w mid")                   // first window + separator stay
  }

  // ---- dsirWeights --------------------------------------------------------

  test("dsirWeights: target-characteristic tokens score positive, raw-only negative") {
    val docs = Seq(
      (1L, "alpha alpha alpha", "en"),
      (2L, "alpha alpha beta", "en"),
      (3L, "gamma gamma gamma", "de"),
      (4L, "gamma delta delta beta", "de")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .select("doc_id", "n_tokens", "dsir_logratio")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(3L, 3L, 3L, 4L))
    // all-alpha doc looks most like the target; all-gamma least
    assert(got(0)._3 > 0.0)
    assert(got(2)._3 < 0.0)
    assert(got(0)._3 > got(1)._3 && got(1)._3 > got(3)._3 && got(3)._3 > got(2)._3)
  }

  // ---- perceptual hash ----------------------------------------------------

  test("phashPairs: identical payloads pair at hamming 0; bands are 16-bit") {
    val media = Seq(
      (1L, "the same image bytes"), (2L, "the same image bytes"),
      (3L, "completely different payload contents right here"))
      .toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "utf-8").as("payload"))
    val bands = media.select(
      Multimodal.dhashBands(col("payload")).zipWithIndex
        .map { case (c, i) => c.as(s"b$i") }: _*)
      .as[(Int, Int, Int, Int)].collect()
    assert(bands.forall(b =>
      Seq(b._1, b._2, b._3, b._4).forall(v => v >= 0 && v < 65536)))
    val pairs = Multimodal.phashPairs(media, "media_id", "payload", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 0L)))
  }

  // ---- Hilbert layout -----------------------------------------------------

  test("hilbertBuckets: a full 4x4 grid walks a connected permutation") {
    // bits=2, bucketBits=4 => bucket IS the Hilbert index d
    val grid = (for { x <- 0 until 4; y <- 0 until 4 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val got = Layout.hilbertBuckets(grid, "x", "y", bits = 2, bucketBits = 4)
      .select("bucket", "x_min", "y_min", "cnt")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 16 && got.forall(_._4 == 1L))          // permutation
    assert(got.map(_._1).toSeq == (0L until 16L))               // d covers 0..15
    val walk = got.map(r => (r._2, r._3))
    walk.sliding(2).foreach { case Array((x0, y0), (x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,        // no seams:
        s"jump between d-consecutive cells ($x0,$y0)->($x1,$y1)") // the Hilbert
    }                                                           // property
  }

  test("hilbertBuckets: envelopes stay rectangular sub-quadrants at 10 bits") {
    val pts = (0 until 4096).map(i => ((i * 37) % 1024L, (i * 91) % 1024L))
      .toDF("a", "b")
    val got = Layout.hilbertBuckets(pts, "a", "b") // bits=10, bucketBits=8
      .select("bucket", "x_min", "x_max", "y_min", "y_max")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // 256 buckets of a 1024x1024 space: every envelope fits a 64x64 tile
    got.foreach { case (b, x0, x1, y0, y1) =>
      assert(x1 - x0 <= 63 && y1 - y0 <= 63, s"bucket $b envelope too wide")
    }
  }

  // ---- product quantization ----------------------------------------------

  test("Pq: n=k corpus makes PQ exact — ADC ranking equals true L2 ranking") {
    // 16 vectors, 64 dims, all distinct: stride=1 => the codebook IS the
    // corpus, every vector's 4 codes select itself, and ADC distance is
    // the EXACT (scale-6) L2^2 — so ranks must match brute force.
    val vecs = (0 until 16).map { i =>
      (i.toLong, (0 until 64).map(j => ((i * 64 + j) % 7 + i * 0.25).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Pq.search(df, m = 4, k = 16, nq = 3, topK = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val raw = vecs.map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (qid <- 0L to 2L) {
      val qv = raw.find(_._1 == qid).get._2
      val want = raw.filter(_._1 != qid)
        .map { case (id, v) => (id, l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
      assert(got(qid) == want, s"query $qid ADC ranking != exact L2 ranking")
    }
  }

  test("Pq.encode: codes in range, deterministic across partitioning") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, (0 until 64).map(j => math.sin(i * 64 + j).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val a = Pq.encode(df, m = 4, k = 16).orderBy("id").collect().toSeq
    val b = Pq.encode(df.repartition(7), m = 4, k = 16).orderBy("id").collect().toSeq
    assert(a == b)
    assert(a.forall(r => (1 to 4).forall(q => {
      val c = r.getInt(q); c >= 0 && c < 16
    })))
  }
}
