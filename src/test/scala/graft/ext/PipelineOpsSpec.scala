package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Dataset-lifecycle operators: deterministic split assignment, CDC
  * changelog materialization, consecutive-run compaction, RRF fusion.
  */
class PipelineOpsSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- datasetSplit ----

  test("datasetSplit: pure function of id — stable under repartition and growth") {
    val ids = (1L to 1000L).toDF("id")
    val bounds = Seq(("train", 80), ("val", 90), ("test", 100))
    val a = DataOps.datasetSplit(ids, "id", bounds)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = DataOps.datasetSplit(ids.repartition(7), "id", bounds)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "split must not depend on partitioning")
    // corpus growth: ids 1..500's assignment is identical inside 1..1000
    val sub = DataOps.datasetSplit((1L to 500L).toDF("id"), "id", bounds)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (k, v) => a(k) == v },
      "new ids must not move old assignments")
  }

  test("datasetSplit: fractions near bounds, all rows assigned") {
    val n = 20000L
    val got = DataOps.datasetSplit((1L to n).toDF("id"), "id",
        Seq(("train", 80), ("val", 90), ("test", 100)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.values.sum == n)
    // mix64 is a strong mixer: each 1% bucket holds ~n/100 ids
    assert(math.abs(got("train") - 0.80 * n) < 0.02 * n, got.toString)
    assert(math.abs(got("val") - 0.10 * n) < 0.02 * n, got.toString)
    assert(math.abs(got("test") - 0.10 * n) < 0.02 * n, got.toString)
  }

  test("datasetSplit: bounds must end at 100") {
    intercept[IllegalArgumentException] {
      DataOps.datasetSplit(Seq(1L).toDF("id"), "id", Seq(("train", 80)))
    }
  }

  // ---- cdcApply ----

  test("cdcApply: last op wins, trailing delete tombstones the key") {
    val log = Seq(
      // k1: insert, update — survives with last value
      (1L, ts("2024-01-01 10:00:00"), 1L, "U", 10.0),
      (1L, ts("2024-01-01 11:00:00"), 2L, "U", 20.0),
      // k2: insert then delete — gone
      (2L, ts("2024-01-01 10:00:00"), 3L, "U", 30.0),
      (2L, ts("2024-01-01 12:00:00"), 4L, "D", 0.0),
      // k3: delete then re-insert — survives (delete is not terminal)
      (3L, ts("2024-01-01 10:00:00"), 5L, "D", 0.0),
      (3L, ts("2024-01-01 13:00:00"), 6L, "U", 60.0)
    ).toDF("k", "ts", "seq", "op", "value")
    val got = DataOps.cdcApply(log, Seq("k"), "op", Seq("ts", "seq"), Seq("value"))
      .select("k", "value", "n_ops", "n_deletes")
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 20.0, 2L, 0L), (3L, 60.0, 2L, 1L)))
  }

  test("cdcApply: same-timestamp ties broken by the trailing order column") {
    val log = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "U", 1.0),
      (1L, ts("2024-01-01 10:00:00"), 2L, "U", 2.0)
    ).toDF("k", "ts", "seq", "op", "value")
    val got = DataOps.cdcApply(log, Seq("k"), "op", Seq("ts", "seq"), Seq("value"))
      .select("value").as[Double].collect()
    assert(got.toSeq == Seq(2.0))
  }

  // ---- collapseConsecutive ----

  test("collapseConsecutive: folds runs, keeps head id/value and span") {
    val ev = Seq(
      // u1: AAB A — runs (A×2)(B×1)(A×1): value change mid-run is noise
      (1L, ts("2024-01-01 10:00:00"), 1L, "A", 1.0),
      (1L, ts("2024-01-01 10:01:00"), 2L, "A", 9.0),
      (1L, ts("2024-01-01 10:02:00"), 3L, "B", 2.0),
      (1L, ts("2024-01-01 10:03:00"), 4L, "A", 3.0),
      // u2: single event
      (2L, ts("2024-01-01 11:00:00"), 5L, "C", 4.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Dedup.collapseConsecutive(ev, "user_id", "ts", "event_id",
        "event_type", "value")
      .select("user_id", "run", "event_id", "event_type", "value", "n_in_run")
      .as[(Long, Long, Long, String, Double, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, "A", 1.0, 2L),
      (1L, 2L, 3L, "B", 2.0, 1L),
      (1L, 3L, 4L, "A", 3.0, 1L),
      (2L, 1L, 5L, "C", 4.0, 1L)))
  }

  test("collapseConsecutive: null markers are a run (null-safe change detect)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, null.asInstanceOf[String], 1.0),
      (1L, ts("2024-01-01 10:01:00"), 2L, null.asInstanceOf[String], 2.0),
      (1L, ts("2024-01-01 10:02:00"), 3L, "A", 3.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Dedup.collapseConsecutive(ev, "user_id", "ts", "event_id",
        "event_type", "value")
      .select("run", "n_in_run").as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  // ---- histogram ----

  test("histogram: equi-width buckets, closed top edge, exact counts") {
    val df = Seq(0.0, 1.0, 2.5, 5.0, 9.9, 10.0).toDF("v")
    val got = Analytics.histogram(df, "v", 4)
      .select("bucket", "cnt").as[(Long, Long)].collect().toMap
    // width 2.5: [0,2.5) [2.5,5) [5,7.5) [7.5,10]; max (10.0) clamps into
    // bucket 3 — 0,1→b0; 2.5→b1; 5→b2; 9.9,10→b3
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("histogram: empty and all-null inputs yield an empty histogram") {
    val empty = Seq.empty[Double].toDF("v")
    assert(Analytics.histogram(empty, "v", 4).count() == 0)
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    val h = Analytics.histogram(nulls, "v", 4)
    assert(h.count() == 0)
    assert(h.columns.toSeq == Seq("bucket", "cnt", "lo", "hi"))
  }

  test("histogram: degenerate all-equal input lands in bucket 0") {
    val got = Analytics.histogram(Seq(7.0, 7.0, 7.0).toDF("v"), "v", 5)
      .select("bucket", "cnt").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L)))
  }

  test("histogram: null values are excluded, not dumped into the top bucket") {
    val df = Seq[Option[Double]](Some(0.0), Some(10.0), None, None, None)
      .toDF("v")
    val got = Analytics.histogram(df, "v", 4)
      .select("bucket", "cnt").as[(Long, Long)].collect().toMap
    // 3 nulls: least(floor(null/width), nb-1) = nb-1 would have put them
    // all in bucket 3 — they must instead vanish from every count
    assert(got == Map(0L -> 1L, 3L -> 1L))
    assert(got.values.sum == 2L)
  }

  // ---- kAnonymize ----

  test("kAnonymize: small groups collapse into one masked bucket") {
    val df = Seq(
      ("en", "a", 10L), ("en", "a", 20L), ("en", "a", 30L), // n=3 kept
      ("de", "b", 5L), ("de", "b", 6L),                     // n=2 masked
      ("fr", "c", 7L)                                       // n=1 masked
    ).toDF("lang", "source", "chars")
    val got = DataOps.kAnonymize(df, Seq("lang", "source"), "chars", k = 3)
      .select("lang", "source", "n", "measure")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("en", "a", 3L, 60L), ("*", "*", 3L, 18L)))
  }

  test("kAnonymize: no masked row when every group clears k") {
    val df = Seq(("en", "a", 1L), ("en", "a", 2L)).toDF("lang", "source", "c")
    val got = DataOps.kAnonymize(df, Seq("lang", "source"), "c", k = 2)
      .select("lang").as[String].collect().toSeq
    assert(got == Seq("en"))
  }

  test("kAnonymize: a sub-k masked bucket is suppressed, not published") {
    // one suppressed group of size 1 — the '*' bucket would itself isolate
    // a single individual, so nothing below k may appear at all
    val df = Seq(("en", "a", 10L), ("en", "a", 20L), ("en", "a", 30L),
      ("fr", "c", 7L)).toDF("lang", "source", "chars")
    val got = DataOps.kAnonymize(df, Seq("lang", "source"), "chars", k = 3)
      .select("lang", "source", "n", "measure")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("en", "a", 3L, 60L)))
  }

  test("kAnonymize: numeric quasi-id columns mask as strings") {
    val df = Seq((2024, 10L), (2024, 20L), (2023, 5L)).toDF("year", "c")
    val got = DataOps.kAnonymize(df, Seq("year"), "c", k = 2)
      .select("year", "n", "measure")
      .as[(String, Long, Long)].collect().toSet
    // int quasi-id casts to string so the masked branch unions cleanly;
    // the lone 2023 row is below k AND its bucket total (1) is below k
    assert(got == Set(("2024", 2L, 30L)))
  }

  // ---- zoneMap ----

  test("zoneMap: per-range min/max/null stats") {
    val df = Seq((0L, Some(5L)), (1L, None), (99L, Some(1L)),
      (100L, Some(7L)), (250L, Some(2L))).toDF("id", "v")
    val got = Layout.zoneMap(df, "id", "v", 100L)
      .select("zone", "cnt", "n_null", "v_min", "v_max")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 3L, 1L, Some(1L), Some(5L)),
      (1L, 1L, 0L, Some(7L), Some(7L)),
      (2L, 1L, 0L, Some(2L), Some(2L))))
  }

  // ---- bigramCounts ----

  test("bigramCounts: adjacent pairs with left-unigram counts; 1-token docs safe") {
    val docs = Seq("a b a b", "b a", "x").toDF("text")
    val got = Vocab.bigramCounts(docs, "text")
      .select("w1", "w2", "c12", "c1")
      .as[(String, String, Long, Long)].collect().toSet
    // bigrams: (a,b)x2 (b,a)x2; unigrams: a=3 b=3 x=1 — "x" alone makes
    // no pair and must not fabricate a null bigram
    assert(got == Set(("a", "b", 2L, 3L), ("b", "a", 2L, 3L)))
  }

  // ---- negativeSample ----

  test("negativeSample: k hash-drawn candidates minus true positives, stable") {
    val pos = Seq((1L, 3L), (1L, 7L), (2L, 0L)).toDF("grp", "item")
    val a = DataOps.negativeSample(pos, "grp", "item", nItems = 10L, k = 4)
      .select("grp", "slot", "item").as[(Long, Long, Long)].collect().toSet
    val b = DataOps.negativeSample(pos.repartition(5), "grp", "item", 10L, 4)
      .select("grp", "slot", "item").as[(Long, Long, Long)].collect().toSet
    assert(a == b, "sample must be a pure function of the data")
    assert(a.forall { case (_, _, item) => item >= 0 && item < 10 })
    assert(!a.exists { case (g, _, item) =>
      Set((1L, 3L), (1L, 7L), (2L, 0L))((g, item)) },
      "positives must be excluded")
    assert(a.count(_._1 == 1L) <= 4 && a.count(_._1 == 2L) <= 4)
  }

  test("negativeSample: non-integral group column is rejected loudly") {
    // a string key would cast to null, null candidates always survive the
    // anti-join, and the caller would silently train on garbage
    val pos = Seq(("u1", 3L), ("u2", 7L)).toDF("grp", "item")
    val e = intercept[IllegalArgumentException] {
      DataOps.negativeSample(pos, "grp", "item", nItems = 10L, k = 2)
    }
    assert(e.getMessage.contains("must be integral"))
  }

  // ---- selectByBudget ----

  test("selectByBudget: inclusive running cost, first over-budget row dropped") {
    val df = Seq(("s", 1L, 60L), ("s", 2L, 30L), ("s", 3L, 20L), ("s", 4L, 5L),
      ("t", 5L, 100L)).toDF("source", "doc_id", "cost")
    val got = DataOps.selectByBudget(df, "source",
        Seq(col("cost").desc, col("doc_id").asc), "cost", budget = 95L)
      .select("doc_id", "cum_cost").as[(Long, Long)].collect().toSet
    // s ordered by cost desc: 60 (cum 60), 30 (90), 20 (110 — dropped),
    // 5 (115 — dropped, prefix is not re-opened); t: 100 > 95 dropped
    assert(got == Set((1L, 60L), (2L, 90L)))
  }

  // ---- nextEventPairs ----

  test("nextEventPairs: previous-k context string, empty at the stream head") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "c"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "d")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.nextEventPairs(ev, "user_id", "ts", "event_id",
        "event_type", ctx = 3)
      .select("event_id", "context", "label")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "", "a"), (2L, "a", "b"), (3L, "a b", "c"), (4L, "a b c", "d")))
  }

  // ---- fuzzySelfJoin ----

  test("fuzzySelfJoin: blocked candidates, distance-filtered, ordered pairs") {
    val df = Seq((1L, "smith"), (2L, "smyth"), (3L, "smith"),
      (4L, "jones"), (5L, "sandy")).toDF("id", "name")
    val got = Joins.fuzzySelfJoin(df, "id", "name",
        substring(col("name"), 1, 1), maxDist = 1)
      .select("id_a", "id_b", "lev").as[(Long, Long, Long)].collect().toSet
    // (1,2) lev 1, (1,3) lev 0, (2,3) lev 1; sandy shares block 's' but
    // lev(smith,sandy)=3 is filtered; jones is in another block entirely
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L)))
  }

  test("fuzzySelfJoinLev1: deletion blocking finds ALL lev<=1 pair kinds") {
    val df = Seq((1L, "smith"), (2L, "smyth"),   // substitution
      (3L, "smith"),                             // exact duplicate
      (4L, "smiths"),                            // insertion
      (5L, "mith"),                              // deletion (head!)
      (6L, "smythe")                             // lev 2 from smith — excluded
    ).toDF("id", "name")
    val got = Joins.fuzzySelfJoinLev1(df, "id", "name")
      .select("id_a", "id_b", "lev").as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1L), (1L, 3L, 0L), (1L, 4L, 1L), (1L, 5L, 1L),
      (2L, 3L, 1L), (2L, 6L, 1L), (3L, 4L, 1L), (3L, 5L, 1L)))
  }

  // ---- ksDrift ----

  test("ksDrift: identical cohorts give 0, disjoint supports give 1") {
    val same = Seq(("g", 1L, true), ("g", 2L, true), ("g", 1L, false),
      ("g", 2L, false)).toDF("grp", "v", "a")
    val ks0 = Analytics.ksDrift(same, "grp", "v", col("a"))
      .select("ks").as[Double].collect()(0)
    assert(ks0 == 0.0)
    val disjoint = Seq(("g", 1L, true), ("g", 2L, true), ("g", 10L, false),
      ("g", 20L, false)).toDF("grp", "v", "a")
    val ks1 = Analytics.ksDrift(disjoint, "grp", "v", col("a"))
      .select("n_a", "n_b", "ks").as[(Long, Long, Double)].collect()(0)
    assert(ks1 == ((2L, 2L, 1.0)))
  }

  test("ksDrift: known shifted distribution") {
    // A: {1,2,3}, B: {2,3,4} — max CDF gap is 1/3 (at v=1 and v=3)
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 3L, true),
      ("g", 2L, false), ("g", 3L, false), ("g", 4L, false))
      .toDF("grp", "v", "a")
    val ks = Analytics.ksDrift(df, "grp", "v", col("a"))
      .select("ks").as[Double].collect()(0)
    assert(math.abs(ks - 1.0 / 3.0) < 1e-15)
  }

  test("ksDrift: null values are excluded from both cohorts") {
    // nulls sort FIRST in Spark windows but LAST in DuckDB — keeping them
    // would make the statistic engine-dependent; they must not count
    val df = Seq(("g", Some(1L), true), ("g", Some(2L), true),
      ("g", None, true), ("g", Some(1L), false), ("g", Some(2L), false),
      ("g", None, false), ("g", None, false)).toDF("grp", "v", "a")
    val got = Analytics.ksDrift(df, "grp", "v", col("a"))
      .select("n_a", "n_b", "ks").as[(Long, Long, Double)].collect()(0)
    assert(got == ((2L, 2L, 0.0)))
  }

  // ---- rrfFusion ----

  test("rrfFusion: known two-list fusion, ties pinned by doc_id") {
    // list1 ranks: d1=1, d2=2, d3=3  (tie between d2/d3 broken by id)
    val l1 = Seq((1L, 9.0), (2L, 5.0), (3L, 5.0)).toDF("doc_id", "score")
    // list2 ranks: d3=1, d1=2  (d2 absent)
    val l2 = Seq((3L, 8.0), (1L, 4.0)).toDF("doc_id", "score")
    val got = Ranking.rrfFusion(Seq(l1, l2), k = 60)
      .select("doc_id", "n_lists", "best_rank", "rrf_score")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    def c(r: Int): BigDecimal =
      BigDecimal(1.0 / (60.0 + r)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got(0) == ((1L, 2L, 1L, (c(1) + c(2)).toDouble)))
    assert(got(1) == ((2L, 1L, 2L, c(2).toDouble)))
    assert(got(2) == ((3L, 2L, 1L, (c(3) + c(1)).toDouble)))
  }
}
