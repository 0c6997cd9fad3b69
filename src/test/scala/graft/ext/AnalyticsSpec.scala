package graft.ext

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class AnalyticsSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: steps require strictly-after ordering per user") {
    // u1: full ordered funnel. u2: clicked BEFORE viewing (click must not
    // count), then no purchase. u3: view only. u4: purchase without view.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (4L, ts("2024-01-01 08:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Analytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("funnel: equal timestamp does not advance a step (strict >)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Analytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 1L), (2L, "click", 0L)))
  }

  test("funnel: deep funnels (checkpointed stages) agree with the shallow path") {
    // 5 steps crosses the linearization threshold; u1 completes all 5,
    // u2 stalls after step 2
    val seq5 = Seq("a", "b", "c", "d", "e")
    val ev = (seq5.zipWithIndex.map { case (t, i) =>
      (1L, ts(f"2024-01-01 10:0$i:00"), t)
    } ++ Seq((2L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 10:01:00"), "b")))
      .toDF("user_id", "ts", "event_type")
    val got = Analytics.funnel(ev, "user_id", "ts", "event_type", seq5)
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(got == Seq(2L, 2L, 1L, 1L, 1L))
  }

  test("cohortRetention: offsets are whole weeks from the first-event week") {
    // 2024-01-01 is a Monday. u1 active in weeks 0 and 2 (twice in week 2 —
    // distinct per cell), u2 joins in week 1, active weeks 1 and 2.
    val ev = Seq(
      (1L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-16 12:00:00")),
      (1L, ts("2024-01-17 12:00:00")),
      (2L, ts("2024-01-10 12:00:00")),
      (2L, ts("2024-01-15 12:00:00"))
    ).toDF("user_id", "ts")
    val got = Analytics.cohortRetention(ev, "user_id", "ts")
      .select(col("cohort_week").cast("date").cast("string"),
        col("week_offset"), col("n_users"))
      .orderBy("cohort_week", "week_offset")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("snapshotDiff: added / changed / unchanged / removed classification") {
    val oldSnap = Seq((1L, 2L, 10.0), (2L, 1L, 5.0), (3L, 4L, 9.0))
      .toDF("k", "n", "v")
    val newSnap = Seq((1L, 2L, 10.0), (2L, 3L, 8.0), (4L, 1L, 1.0))
      .toDF("k", "n", "v")
    val got = Analytics.snapshotDiff(oldSnap, newSnap, "k", "n", "v")
      .select("k", "status").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }

  test("unigramLogProb: hand-computed two-doc corpus") {
    // corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    // doc1 "a a a": 3*round6(ln .75)/3 ; doc2 "b": round6(ln .25)/1
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpA = r6(math.log(3.0 / 4.0))
    val lpB = r6(math.log(1.0 / 4.0))
    assert(got == Seq(
      (1L, 3L, r6(r6(3.0 * lpA) / 3.0)),
      (2L, 1L, r6(lpB))))
  }

  test("attributionLinear: credit splits across in-window touches only") {
    // u1 purchase at day 10: touches = view(d4, in window), click(d9, in
    // window), view(d1, OUT of the 7-day window) -> 1/2 credit each.
    // u2 purchase at d20: one click (d19) -> full credit. Another user's
    // touch never matches.
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 1L, ts("2024-01-04 00:00:00"), "view"),
      (3L, 1L, ts("2024-01-09 00:00:00"), "click"),
      (4L, 1L, ts("2024-01-10 00:00:00"), "purchase"),
      (5L, 2L, ts("2024-01-19 00:00:00"), "click"),
      (6L, 2L, ts("2024-01-20 00:00:00"), "purchase"),
      (7L, 3L, ts("2024-01-09 12:00:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Analytics.attributionLinear(ev, "user_id", "ts", "event_type",
      "event_id", "purchase", Seq("view", "click"), windowDays = 7)
      .orderBy("touch_type")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("click", 2L, 1.5), ("view", 1L, 0.5)))
  }

  test("quantilesByGroup: exact order statistics, partitioning-invariant") {
    val rnd = new Random(3)
    val vals = (1 to 997).map(_ => rnd.nextGaussian() * 10).toSeq
    val df = vals.zipWithIndex.map { case (v, i) => (s"g${i % 2}", v) }
      .toDF("g", "value")
    def expectPct(g: String, pct: Int): Double = {
      val s = vals.zipWithIndex.filter(_._2 % 2 == (if (g == "g0") 0 else 1))
        .map(_._1).sorted
      s((pct * s.length + 99) / 100 - 1)
    }
    for (parts <- Seq(1, 16)) {
      val got = Analytics.quantilesByGroup(df.repartition(parts), "g", "value",
        Seq(50, 90, 99))
        .as[(String, Long, Double)].collect().toSeq.sortBy(t => (t._1, t._2))
      val want = (for (g <- Seq("g0", "g1"); p <- Seq(50, 90, 99))
        yield (g, p.toLong, expectPct(g, p))).sortBy(t => (t._1, t._2))
      assert(got == want, s"parts=$parts")
    }
  }

  test("holt: hand-computed level and trend, seed from the first value") {
    // x = [10, 14, 18] with alpha=0.5, beta=0.5:
    // l1=10, b1=0; l2=0.5*14+0.5*10=12, b2=0.5*2+0=1;
    // l3=0.5*18+0.5*13=15.5, b3=0.5*3.5+0.5*1=2.25
    val ev = Seq(
      (1L, "a", ts("2024-01-01 00:01:00"), 10.0),
      (2L, "a", ts("2024-01-01 00:02:00"), 14.0),
      (3L, "a", ts("2024-01-01 00:03:00"), 18.0))
      .toDF("event_id", "event_type", "ts", "value")
    val got = Analytics.holt(ev, "event_type", "ts", "event_id", "value",
      alpha = 0.5, beta = 0.5).head()
    assert(got.getAs[Long]("n") == 3L)
    assert(got.getAs[Double]("level") == 15.5)
    assert(got.getAs[Double]("trend") == 2.25)
    assert(got.getAs[Double]("forecast") == 17.75)
  }

  test("cusum: drift after a level shift, reset to zero below the reference") {
    // key "a": 6 values at 0 then 6 at 10 — the shift accumulates;
    // cusum_max lands at the end of the drifted run
    val ev = ((1 to 6).map(i => (i.toLong, "a", ts(f"2024-01-01 00:0$i:00"), 0.0)) ++
      (7 to 9).map(i => (i.toLong, "a", ts(f"2024-01-01 00:0$i:00"), 10.0)))
      .toDF("event_id", "event_type", "ts", "value")
    val got = Analytics.cusum(ev, "event_type", "ts", "event_id", "value").head()
    val n = 9.0
    val mean = 30.0 / 9.0
    val variance = (n * (6 * 0.0 + 3 * 100.0) - 30.0 * 30.0) / (n * (n - 1.0))
    val kappa = 0.5 * math.sqrt(variance)
    // 6 zeros: max(0, -mean-kappa) pins s at 0; then 3 steps of
    // (10 - mean - kappa) each
    val stepUp = 10.0 - mean - kappa
    assert(got.getAs[Long]("n") == 9L)
    assert(math.abs(got.getAs[Double]("cusum_end") - 3 * stepUp) < 1e-9)
    assert(got.getAs[Double]("cusum_max") == got.getAs[Double]("cusum_end"))
  }

  test("interpolateLinear: gaps fill linearly, observed buckets keep their mean") {
    // user 1: 10:00 -> mean 2.0 (two obs), 13:00 -> 8.0; the 3-hour gap
    // interpolates 4.0 at 11:00 and 6.0 at 12:00. user 2: single bucket.
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1.0),
      (1L, ts("2024-01-01 10:40:00"), 3.0),
      (1L, ts("2024-01-01 13:30:00"), 8.0),
      (2L, ts("2024-01-01 00:10:00"), 5.5)).toDF("user_id", "ts", "value")
    val got = Analytics.interpolateLinear(ev, Seq("user_id"), "ts", "value")
      .orderBy("user_id", "bucket")
      .select(col("user_id"), col("bucket").cast("string"), col("n"), col("value"))
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "2024-01-01 10:00:00", 2L, 2.0),
      (1L, "2024-01-01 11:00:00", 0L, 4.0),
      (1L, "2024-01-01 12:00:00", 0L, 6.0),
      (1L, "2024-01-01 13:00:00", 1L, 8.0),
      (2L, "2024-01-01 00:00:00", 1L, 5.5)))
  }
}
