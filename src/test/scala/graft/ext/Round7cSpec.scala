package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-7 batch 3: McNemar's paired test and the Zipf log-log OLS fit.
  */
class Round7cSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- Eval.mcnemar --------------------------------------------------------

  test("mcnemar: hand-computed discordant cells; concordance scores 0") {
    // slice s: b=3 (A-only), c=1 (B-only) -> (|3-1|-1)^2/4 = 0.25
    val df = Seq(
      ("s", true, false), ("s", true, false), ("s", true, false),
      ("s", false, true), ("s", true, true), ("s", false, false),
      // slice u: perfectly concordant -> b+c=0 -> 0.0
      ("u", true, true), ("u", false, false),
      // slice v: b=1, c=0 -> |b-c|<=1 -> correction floors at 0.0
      ("v", true, false), ("v", true, true))
      .toDF("slice", "ra", "rb")
    val m = Eval.mcnemar(df, "slice", col("ra"), col("rb"))
      .select("slice", "n_items", "b", "c", "chi2_mcnemar")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m("s") == ((6L, 3L, 1L, 0.25)), m.toString)
    assert(m("u") == ((2L, 0L, 0L, 0.0)), m.toString)
    assert(m("v") == ((2L, 1L, 0L, 0.0)), m.toString)
  }

  test("mcnemar: symmetric raters score 0 beyond the correction") {
    // b = c exactly -> statistic (|b-c|-1)^2/(b+c) never fires (abs<=1)
    val rows = (1 to 50).flatMap(_ => Seq(("s", true, false), ("s", false, true)))
    val m = Eval.mcnemar(rows.toDF("slice", "ra", "rb"), "slice",
        col("ra"), col("rb"))
      .select("b", "c", "chi2_mcnemar").as[(Long, Long, Double)].head()
    assert(m == ((50L, 50L, 0.0)), m.toString)
  }

  // ---- Ranking.rboOverlap --------------------------------------------------

  test("rboOverlap: identical rankings score 1 - p^k; disjoint score 0") {
    val a = (1L to 15L).map(i => (i, 100.0 - i)).toDF("doc_id", "score")
    val r = Ranking.rboOverlap(a, a)
      .as[(Long, Long, Double)].head()
    // (1-p) * sum_{d=1..10} p^(d-1) = 1 - 0.9^10 = 0.6513215599
    assert(r._1 == 10L && r._2 == 10L, r.toString)
    assert(math.abs(r._3 - (1.0 - math.pow(0.9, 10))) < 1e-5, r.toString)
    val b = (21L to 35L).map(i => (i, 100.0 - i)).toDF("doc_id", "score")
    val d = Ranking.rboOverlap(a, b).as[(Long, Long, Double)].head()
    assert(d == ((10L, 0L, 0.0)), d.toString)
  }

  test("rboOverlap: swapped top-2 at k=2, p=0.5 scores exactly 0.25") {
    // overlap at depth 1 is 0, at depth 2 is 2: (1-p)(p * 2/2) = 0.25
    val a = Seq((1L, 2.0), (2L, 1.0)).toDF("doc_id", "score")
    val b = Seq((2L, 2.0), (1L, 1.0)).toDF("doc_id", "score")
    val r = Ranking.rboOverlap(a, b, k = 2, p = 0.5)
      .as[(Long, Long, Double)].head()
    assert(r == ((2L, 2L, 0.25)), r.toString)
  }

  test("rboOverlap: deeper-ranked common doc uses the max-rank weight") {
    // A: 1,2,3  B: 3,9,1  (k=3, p=0.5): doc1 m=3, doc3 m=3, doc2/9 unmatched
    // w(3) = p^2/3 = 0.083333333; rbo = 0.5 * (2 * 0.083333333) = 0.083333
    val a = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("doc_id", "score")
    val b = Seq((3L, 3.0), (9L, 2.0), (1L, 1.0)).toDF("doc_id", "score")
    val r = Ranking.rboOverlap(a, b, k = 3, p = 0.5)
      .as[(Long, Long, Double)].head()
    assert(r._2 == 2L, r.toString)
    assert(math.abs(r._3 - 0.083333) < 1e-6, r.toString)
  }

  // ---- DataOps.neymanSample ------------------------------------------------

  test("neymanSample: variance-weighted allocation, zero-variance floor, exact draw") {
    // A: sd 5, n 4 -> wh 20; B: sd 0 -> wh 0 (floor to 1); C: sd 1, n 8 -> wh 8
    val rows =
      Seq((1L, "A", 0L), (2L, "A", 10L), (3L, "A", 0L), (4L, "A", 10L)) ++
        (5L to 8L).map(i => (i, "B", 7L)) ++
        (9L to 16L).map(i => (i, "C", (i % 2) * 2))
    val df = rows.toDF("doc_id", "source", "n_chars")
    val got = DataOps.neymanSample(df, "source", "n_chars", "doc_id", 28)
      .as[(String, Long, Long, Long)].collect()
    val byStratum = got.groupBy(_._1)
    // allocations: floor(28*20/28)=20, greatest(1,0)=1, floor(28*8/28)=8
    assert(byStratum("A").head._3 == 20L && byStratum("A").size == 4)
    assert(byStratum("B").head._3 == 1L && byStratum("B").size == 1)
    assert(byStratum("C").head._3 == 8L && byStratum("C").size == 8)
    // B's single draw is the argmin-mix64 id — the exact bottom-k order
    val expectB = (5L to 8L).minBy(Aggs.mix64)
    assert(byStratum("B").head._4 == expectB, byStratum("B").mkString(","))
    // partitioning cannot change the sample
    val again = DataOps.neymanSample(df.repartition(7), "source",
        "n_chars", "doc_id", 28)
      .as[(String, Long, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._4)).toSeq ==
      again.sortBy(r => (r._1, r._4)).toSeq)
  }

  // ---- Vocab.kneserNeyBigrams ----------------------------------------------

  test("kneserNeyBigrams: hand-computed two-word corpus") {
    val docs = Seq("a b a", "b a b").toDF("text")
    // bc: (a,b):2, (b,a):2; cctx=2, nf=1 both; nr=1 both; bt=2
    // P = (2-0.75)/2 + 0.75*(1/2)*(1/2) = 0.8125
    val got = Vocab.kneserNeyBigrams(docs, "text", minCount = 1)
      .select("w1", "w2", "c12", "cctx", "nf", "nr", "p_kn")
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got(("a", "b")) == ((2L, 2L, 1L, 1L, 0.8125)), got.toString)
    assert(got(("b", "a")) == ((2L, 2L, 1L, 1L, 0.8125)), got.toString)
  }

  test("kneserNeyBigrams: full-coverage contexts sum to exactly 1") {
    // all four bigrams over {a, b} observed -> for each context the
    // returned probabilities must sum to 1 (no unseen-continuation mass)
    val docs = Seq("a a b b a b a a b b").toDF("text")
    val sums = Vocab.kneserNeyBigrams(docs, "text", minCount = 1)
      .groupBy("w1").agg(sum("p_kn").as("s"))
      .as[(String, Double)].collect().toMap
    assert(sums.keySet == Set("a", "b"), sums.toString)
    sums.foreach { case (w, s) =>
      assert(math.abs(s - 1.0) <= 2e-6, s"context $w sums to $s") }
  }

  test("kneserNeyBigrams: continuation diversity, not frequency, drives backoff") {
    // 'f' is frequent but only ever follows 's'; 'the' follows three
    // distinct contexts -> nr(the) > nr(f) even though c12(s,f) dominates
    val docs = Seq("s f s f s f s f s f", "x the", "y the", "z the")
      .toDF("text")
    val got = Vocab.kneserNeyBigrams(docs, "text", minCount = 1)
      .select("w2", "nr").distinct().as[(String, Long)].collect().toMap
    assert(got("f") == 1L && got("the") == 3L, got.toString)
  }

  // ---- DataOps.rendezvousShard ---------------------------------------------

  test("rendezvousShard: matches the in-memory HRW argmax on 2000 keys") {
    val got = spark.range(0, 2000)
      .select(col("id"), DataOps.rendezvousShard(col("id"), 8).as("s"))
      .as[(Long, Long)].collect().toMap
    for (k <- 0L until 2000L) {
      val expect = (0 until 8)
        .map(w => (Aggs.mix64(k * 1000003L + w), w))
        .maxBy { case (h, w) => (h, -w) }._2.toLong
      assert(got(k) == expect, s"key $k: got ${got(k)}, want $expect")
    }
  }

  test("rendezvousShard: growing 8 -> 9 shards only moves keys to the NEW shard") {
    val both = spark.range(0, 5000)
      .select(DataOps.rendezvousShard(col("id"), 8).as("s8"),
        DataOps.rendezvousShard(col("id"), 9).as("s9"))
      .as[(Long, Long)].collect()
    // THE rendezvous property: no key ever moves between surviving shards
    assert(both.forall { case (s8, s9) => s9 == s8 || s9 == 8L },
      "a key moved between surviving shards on resize")
    val moved = both.count { case (_, s9) => s9 == 8L }
    // the new shard should win about 1/9 of the keys
    assert(moved > 5000 / 9 / 2 && moved < 5000 / 9 * 2, s"moved=$moved")
    // and the 8-way assignment is roughly balanced
    val byShard = both.groupBy(_._1).view.mapValues(_.length)
    assert(byShard.values.forall(c => c > 400 && c < 850), byShard.toMap.toString)
  }

  // ---- DataOps.tCloseness --------------------------------------------------

  test("tCloseness: hand-computed ordered EMD; missing buckets count") {
    // global buckets {0: 2, 1: 4}; g1 = (0,0,1,1), g2 = (1,1)
    val df = Seq(("g1", 0L), ("g1", 0L), ("g1", 1L), ("g1", 1L),
      ("g2", 1L), ("g2", 1L)).toDF("grp", "sens")
    val got = DataOps.tCloseness(df, Seq("grp"), col("sens"), t = 0.2)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // g1: |0.5 - 1/3| = 1/6; g2 lacks bucket 0 entirely: |0 - 1/3| = 1/3
    assert(got("g1") == ((4L, 0.166667, true)), got.toString)
    assert(got("g2") == ((2L, 0.333333, false)), got.toString)
  }

  test("tCloseness: identical distributions and the m=1 degenerate case") {
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("grp", "sens")
    val g1 = DataOps.tCloseness(same, Seq("grp"), col("sens"), t = 0.2)
      .as[(String, Long, Double, Boolean)].collect()
    assert(g1.forall(r => r._3 == 0.0 && r._4), g1.mkString(","))
    val one = Seq(("a", 7L), ("b", 7L), ("b", 7L)).toDF("grp", "sens")
    val g2 = DataOps.tCloseness(one, Seq("grp"), col("sens"), t = 0.2)
      .as[(String, Long, Double, Boolean)].collect()
    assert(g2.forall(r => r._3 == 0.0 && r._4), g2.mkString(","))
  }

  // ---- Graph.harmonicCloseness ---------------------------------------------

  test("harmonicCloseness: path graph, two seeds, exact scaled sums") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L, 5L).toDF("node")
    val got = Graph.harmonicCloseness(edges, seeds, maxHops = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // node 2: d(1,2)=1, d(5,2)=3 -> 1000000 + 333333; symmetric for 4
    assert(got(2L) == ((2L, 1333333L)), got.toString)
    assert(got(4L) == ((2L, 1333333L)), got.toString)
    assert(got(3L) == ((2L, 1000000L)), got.toString)
    // the seeds see only each OTHER (d=4), never their d=0 self-term
    assert(got(1L) == ((1L, 250000L)), got.toString)
    assert(got(5L) == ((1L, 250000L)), got.toString)
  }

  test("harmonicCloseness: hop bound truncates; disconnected nodes absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.harmonicCloseness(edges, seeds, maxHops = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // 4 is 3 hops out -> truncated; 8/9 are another component -> absent
    assert(got == Map(2L -> 1000000L, 3L -> 500000L), got.toString)
  }

  // ---- Analytics.zipfFit ---------------------------------------------------

  test("zipfFit: exact power law recovers its slope") {
    // counts c_r = round(1e6 * r^-0.8): OLS on ln-ln must land near -0.8
    val counts = (1 to 100)
      .map(r => (s"w$r", math.round(1e6 * math.pow(r, -0.8))))
      .toDF("word", "cnt")
    val row = Analytics.zipfFit(counts, "word", "cnt")
      .select("n", "slope", "intercept")
      .as[(Long, Double, Double)].head()
    assert(row._1 == 100L, row.toString)
    assert(math.abs(row._2 - (-0.8)) < 0.001, s"slope=${row._2}")
    assert(math.abs(row._3 - math.log(1e6)) < 0.01, s"intercept=${row._3}")
  }

  test("zipfFit: top-N truncation is pinned and tie-stable") {
    // 150 words, all count 7 except ten heavies: top-100 must take the
    // ten heavies then the 90 lexicographically-smallest ties
    val counts = ((1 to 10).map(i => (f"h$i%02d", 1000L - i)) ++
      (1 to 140).map(i => (f"t$i%03d", 7L))).toDF("word", "cnt")
    val row = Analytics.zipfFit(counts, "word", "cnt")
      .select("n", "sy").as[(Long, Double)].head()
    assert(row._1 == 100L)
    // sy = sum ln(cnt) over exactly those 100 rows
    val expect = ((1 to 10).map(i => math.log(1000.0 - i)) ++
      (1 to 90).map(_ => math.log(7.0)))
      .map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    assert(math.abs(row._2 - expect) < 1e-9, s"sy=${row._2} expect=$expect")
    // partitioning cannot change the fit
    val b = Analytics.zipfFit(counts.repartition(13), "word", "cnt")
      .select("n", "sy").as[(Long, Double)].head()
    assert(b == row)
  }

  test("zipfFit: constant counts degenerate to slope ~0 and the 1-row guard") {
    // identical counts -> zero covariance up to the per-term round(6)
    // noise; single row -> denominator-0 guard fires exactly
    val const = (1 to 20).map(i => (s"w$i", 5L)).toDF("word", "cnt")
    val s1 = Analytics.zipfFit(const, "word", "cnt")
      .select("slope").as[Double].head()
    assert(math.abs(s1) < 1e-4, s"constant counts slope=$s1")
    val one = Seq(("w", 5L)).toDF("word", "cnt")
    val s2 = Analytics.zipfFit(one, "word", "cnt")
      .select("slope").as[Double].head()
    assert(s2 == 0.0, s"single-row slope=$s2")
  }
}
