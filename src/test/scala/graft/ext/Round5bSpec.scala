package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-5 continuation operators: replayable HLL registers, hashed-feature
  * quality classifier, neighbor Jaccard, lag autocorrelation, audio frames.
  */
class Round5bSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- HLL registers ------------------------------------------------------

  test("hll: registers are a pure function of the key set and merge by max") {
    val a = (1L to 400L).toDF("k")
    val regsA = Sketches.hllRegisters(a, "k")
    val rows = regsA.as[(Int, Int)].collect()
    assert(rows.nonEmpty && rows.forall { case (b, r) => b >= 0 && b < 256 && r >= 1 && r <= 57 })
    // duplicates don't move any register (max is idempotent)
    val regsDup = Sketches.hllRegisters(a.union(a), "k")
    assert(regsDup.as[(Int, Int)].collect().sortBy(_._1).toSeq ==
      rows.sortBy(_._1).toSeq)
    // sketch of a union == cell-wise max of the two sketches
    val b = (301L to 700L).toDF("k")
    val direct = Sketches.hllRegisters(a.union(b), "k")
      .as[(Int, Int)].collect().sortBy(_._1).toSeq
    val merged = Sketches.hllRegisters(a, "k").unionByName(Sketches.hllRegisters(b, "k"))
      .groupBy("bucket").agg(max("r").as("r"))
      .as[(Int, Int)].collect().sortBy(_._1).toSeq
    assert(direct == merged)
  }

  test("hll: estimate lands within 15% of the true distinct count") {
    val n = 20000L
    val df = (1L to n).toDF("k")
    val est = Sketches.hllSummary(Sketches.hllRegisters(df, "k"))
      .select("hll_est").as[Double].head()
    assert(math.abs(est - n) / n < 0.15, s"estimate $est vs true $n")
  }

  // ---- classifier score ---------------------------------------------------

  test("classifierScore: deterministic, bounded, keep consistent with score") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val got = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .select("doc_id", "n_features", "raw_score", "score", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got(0)._2 == 3L && got(2)._2 == 5L)
    assert(got(0) == got(1).copy(_1 = 1L))         // same text, same score
    got.foreach { r =>
      assert(r._4 > 0.0 && r._4 < 1.0)
      assert(math.abs(r._3) <= 1000L * r._2)       // weights bounded by 1000
      assert(r._5 == (r._4 >= 0.5))
    }
  }

  test("classifierScore: repeated tokens are one feature (distinct hashing)") {
    val docs = Seq((1L, "word word word word"), (2L, "word")).toDF("doc_id", "text")
    val got = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .select("n_features", "raw_score").as[(Long, Long)].collect()
    assert(got(0) == got(1))
  }

  // ---- neighbor Jaccard ---------------------------------------------------

  test("neighborJaccard: triangle edges score 1/3, pendant edge 0") {
    // triangle 1-2-3 plus pendant 3-4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.neighborJaccard(edges)
      .select("a", "b", "common", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // edge (1,2): common neighbor {3}; |N(1) u N(2)| = {1,2,3} = 3
    assert(got((1L, 2L)) == ((1L, 1.0 / 3.0)))
    assert(got((1L, 3L))._1 == 1L && got((2L, 3L))._1 == 1L)
    assert(got((3L, 4L)) == ((0L, 0.0)))           // pendant: no common neighbor
  }

  test("adamicAdar: hub-discounted witness weights; witness-less edges drop") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.adamicAdar(edges)
      .select("a", "b", "common", "adamic_adar")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // edge (1,2): witness 3 with degree 3 -> round(1/ln 3, 6)
    assert(got((1L, 2L)) == ((1L, 0.910239)))
    // edge (1,3): witness 2 with degree 2 -> round(1/ln 2, 6)
    assert(got((1L, 3L)) == ((1L, 1.442695)))
    assert(!got.contains((3L, 4L))) // pendant edge: no witness, no row
  }

  // ---- autocorrelation ----------------------------------------------------

  test("autocorr: alternating hourly series has lag-1 autocorrelation -1") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 24).flatMap { h =>
      val n = if (h % 2 == 0) 3 else 1             // 3,1,3,1,... per hour
      (0 until n).map(i => ("a", new java.sql.Timestamp(t0.getTime + h * 3600000L + i)))
    }
    val df = rows.toDF("g", "ts")
    val got = Analytics.autocorr(df, "g", "ts", unit = "hour", lagUnits = 1)
      .select("n", "autocorr").as[(Long, Double)].head()
    assert(got._1 == 23L)
    assert(got._2 == -1.0)
  }

  test("seasonalProfile: hour-of-day slots aggregate across days exactly") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // two days; hour 5 gets 2 events on day 1 and 4 on day 2, hour 6 gets 1+1
    val rows =
      (0 until 2).flatMap(i => Seq(("a", ts(t0, 5, 0, i)))) ++
      (0 until 4).map(i => ("a", ts(t0, 29, 0, i))) ++
      Seq(("a", ts(t0, 6, 0, 0)), ("a", ts(t0, 30, 0, 0)))
    val got = Analytics.seasonalProfile(rows.toDF("g", "ts"), "g", "ts")
      .select("hod", "nb", "sx", "sxx", "mean", "variance")
      .as[(Int, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((5, 2L, 6L, 20L), (6, 2L, 2L, 2L)))
    assert(got(0)._5 == 3.0 && got(0)._6 == 1.0)   // counts 2,4: mean 3, var 1
    assert(got(1)._5 == 1.0 && got(1)._6 == 0.0)
  }

  private def ts(t0: java.sql.Timestamp, hours: Int, mins: Int, ms: Int) =
    new java.sql.Timestamp(t0.getTime + hours * 3600000L + mins * 60000L + ms)

  test("autocorr: constant series is filtered (zero variance, no NaN row)") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 10).map(h => ("c", new java.sql.Timestamp(t0.getTime + h * 3600000L)))
    val got = Analytics.autocorr(rows.toDF("g", "ts"), "g", "ts")
    assert(got.count() == 0L)
  }

  // ---- weighted sampling --------------------------------------------------

  test("weightedSample: heavy items dominate k=1 draws; k >= n keeps all") {
    // 100 groups: one weight-1000 item + nine weight-1 items each
    val rows = (0 until 100).flatMap { g =>
      (0 until 10).map(i => (g.toLong, (g * 10 + i).toLong,
        if (i == 0) 1000L else 1L))
    }
    val df = rows.toDF("g", "id", "w")
    val picked = DataOps.weightedSample(df, "g", "id", "w", k = 1)
      .select("id").as[Long].collect()
    assert(picked.length == 100)
    val heavyWins = picked.count(_ % 10 == 0)
    // P(heavy) = 1000/1009 per group; 100 deterministic draws land >= 85
    assert(heavyWins >= 85, s"heavy item won only $heavyWins/100 draws")
    // k >= group size keeps everything, ranks dense 1..10
    val all = DataOps.weightedSample(df.where(col("g") === 0), "g", "id", "w", k = 100)
      .select("rank").as[Long].collect().sorted
    assert(all.toSeq == (1L to 10L))
  }

  // ---- normalized dedup ---------------------------------------------------

  test("exactNormalized: casing/punctuation/whitespace variants collide") {
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "HELLO-WORLD"),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val got = Dedup.exactNormalized(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3L), (4L, 1L)))
  }

  // ---- Gini concentration -------------------------------------------------

  test("giniConcentration: uniform => 0; concentrated => near 1") {
    val uniform = (1L to 40L).map(i => ((i % 4) + 1, i)).toDF("k", "v")
    val g0 = Analytics.giniConcentration(uniform, "k")
      .select("gini").as[Double].head()
    assert(g0 == 0.0)
    // one key owns 97 of 100 rows; 3 keys own 1 each
    val skewed = ((1L to 97L).map(_ => 1L) ++ Seq(2L, 3L, 4L))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
    val g1 = Analytics.giniConcentration(skewed, "k")
      .select("gini").as[Double].head()
    assert(g1 > 0.7, s"gini $g1")
  }

  test("entropyConcentration: uniform => norm 1; single key => 0") {
    val uniform = (1L to 40L).map(i => (i % 4) + 1).toDF("k")
    val e1 = Analytics.entropyConcentration(uniform, "k")
      .select("entropy_norm").as[Double].head()
    // per-term round(6) can overshoot by a few 1e-6 — that's the price of
    // order-independent DECIMAL sums, not an error
    assert(math.abs(e1 - 1.0) <= 5e-6, s"entropy_norm $e1")
    val single = Seq.fill(10)(7L).toDF("k")
    val e0 = Analytics.entropyConcentration(single, "k")
      .select("entropy", "entropy_norm").as[(Double, Double)].head()
    assert(e0 == ((0.0, 0.0)))
  }

  // ---- temperature mixture ------------------------------------------------

  test("temperatureMixture: T=1 keeps natural ratios, T=inf-ward flattens") {
    val docs = (Seq.fill(90)("big") ++ Seq.fill(10)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val t1 = DataOps.temperatureMixture(docs, "source", temperature = 1.0)
      .select("source", "p_temp").as[(String, Double)].collect().toMap
    assert(math.abs(t1("big") - 0.9) < 1e-6 && math.abs(t1("small") - 0.1) < 1e-6)
    val t4 = DataOps.temperatureMixture(docs, "source", temperature = 4.0)
      .select("source", "p_temp").as[(String, Double)].collect().toMap
    // flattening: the small source's share grows toward parity
    assert(t4("small") > 0.1 && t4("small") < 0.5)
    assert(math.abs(t4("big") + t4("small") - 1.0) < 2e-6)
  }

  // ---- kNN eval -----------------------------------------------------------

  test("evalKnn query: clustered embeddings classify correctly") {
    // two tight clusters along different axes; every vector's 5-NN are its
    // own cluster, so the majority label must equal the true label
    val vecs = (0 until 10).map { i =>
      val base = if (i < 5) Array(1.0f, 0.0f, 0.01f * i) else Array(0.0f, 1.0f, 0.01f * i)
      (i.toLong, base.toSeq, if (i < 5) 0 else 1)
    }.toDF("vec_id", "embedding", "label")
    val nn = Similarity.cosineTopK(vecs.limit(10), vecs, k = 3)
    val labels = vecs.select(col("vec_id"), col("label"))
    val votes = nn.join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl")), Seq("neighbor_id"))
      .groupBy("query_id", "nl").agg(count(lit(1)).as("votes"))
    val pred = votes.groupBy("query_id")
      .agg(expr("max_by(nl, struct(votes, -nl))").as("pred_label"))
      .join(labels.select(col("vec_id").as("query_id"), col("label")), Seq("query_id"))
    assert(pred.where(col("pred_label") =!= col("label")).count() == 0L)
  }

  // ---- audio frames -------------------------------------------------------

  test("audioFrames: exact stats over a known byte pattern") {
    // 256 bytes alternating 138 / 118 => centered +10/-10: sum 0,
    // energy 256*100, a sign change at every adjacent pair (255 of them)
    val payload = Array.tabulate[Byte](256)(i => if (i % 2 == 0) 138.toByte else 118.toByte)
    val media = Multimodal.mediaTable(
      Seq((1L, payload)).toDF("id", "p"), "id", "p", kind = "audio", format = "pcm_u8")
    val got = Multimodal.audioFrames(media, frameSize = 256).collect()
    assert(got.length == 1)
    val f = got(0)
    assert(f.frame_idx == 0 && f.n_samples == 256)
    assert(f.sum_c == 0L && f.energy == 25600L && f.zero_crossings == 255L)
    assert(f.rms == math.sqrt(100.0))
  }

  test("audioFrames: trailing partial frame is dropped, frames index in order") {
    val payload = Array.fill[Byte](700)(130.toByte)  // 2 full frames + 188 tail
    val media = Multimodal.mediaTable(
      Seq((9L, payload)).toDF("id", "p"), "id", "p", kind = "audio", format = "pcm_u8")
    val got = Multimodal.audioFrames(media, frameSize = 256).collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1))
    assert(got.forall(f => f.sum_c == 2L * 256 && f.energy == 4L * 256 && f.zero_crossings == 0L))
  }
}
