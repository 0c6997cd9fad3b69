package graft.ext

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-9 hardening: the two-pass Pareto staircase must survive a
  * CONTINUOUS x (distinct-x ≈ n) — the round-8 verdict's last latent
  * single-partition-window trap.
  */
class Round9Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("paretoFront2D: 1M distinct DOUBLE x, anti-chain — every point on the front") {
    // y strictly decreasing in x ⇒ no point dominates any other
    val df = spark.range(1000000L).selectExpr(
      "id", "cast(id AS double) + 0.5 AS x",
      "cast(1000000 - id AS double) AS y")
    assert(DataOps.paretoFront2D(df, "id", "x", "y").count() == 1000000L)
  }

  test("paretoFront2D: 1M distinct DOUBLE x, constant y — front collapses to max x") {
    // equal y everywhere ⇒ every lower x is dominated by the max-x row
    val df = spark.range(1000000L).selectExpr(
      "id", "cast(id AS double) + 0.25 AS x", "cast(7 AS double) AS y")
    val got = DataOps.paretoFront2D(df, "id", "x", "y")
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(999999L))
  }

  test("paretoFront2D: continuous x matches brute force; no raw-row global window in the plan") {
    val rnd = new Random(9)
    val rows = (1 to 500).map(i =>
      (i.toLong, rnd.nextDouble() * 40, rnd.nextDouble() * 40))
    val res = DataOps.paretoFront2D(rows.toDF("id", "x", "y"), "id", "x", "y")
    val got = res.as[(Long, Double, Double)].collect().map(_._1).toSet
    def dominated(p: (Long, Double, Double)) = rows.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    val want = rows.filterNot(dominated).map(_._1).toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
    val p = plan(res)
    // the only single-partition exchange feeds the boundary-prefix
    // window over the groupBy(__pid) maxima (≤ nP rows); the bulk
    // running max is partitioned by the stamped range id
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_max"), p)
    assert(p.contains("__pid"), p)
  }

  // ---- Vocab.unigramTrain ----------------------------------------------

  test("unigramTrain: EM concentrates mass on the dominant whole-word piece") {
    val docs = (1 to 50).map(_ => "dog dog dog cat").toDF("text")
    val got = Vocab.unigramTrain(docs, "text", emIters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the one-piece segmentation has the lowest lattice cost, so EM
    // shifts expected counts onto the full words and away from chars
    assert(got("dog") > got("cat"), got.toString)
    assert(got("dog") > got("d") && got("dog") > got("og"), got.toString)
    // probabilities renormalize each M-step: they sum to 1 ± rounding
    val s = got.values.sum
    assert(math.abs(s - 1.0) < 1e-3, s"sum(p) = $s")
    // a piece can survive with expected count > 0 whose round-6 p
    // REPORTS as 0.0 — still a model member (finite cost)
    assert(got.values.forall(p => p >= 0 && p <= 1), got.toString)
  }

  test("unigramTrain: partition-invariant and repeat-stable") {
    val base = Seq("aa ab ba", "ab ab aa", "ba aa ab").toDF("text")
    val a = Vocab.unigramTrain(base, "text")
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    val b = Vocab.unigramTrain(base.repartition(7), "text")
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty && a.map(_._1).contains("aa"))
  }

  test("unigramTrain: words beyond maxWordLen don't train; chars survive") {
    val docs = Seq("abcdefghijk zz zz zz").toDF("text") // 11 > maxWordLen=8
    val got = Vocab.unigramTrain(docs, "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!got.keys.exists(_.contains("i")), got.toString)
    assert(got.contains("zz") && got.contains("z"), got.toString)
  }

  test("unigramEncode: Viterbi picks the trained whole-word pieces") {
    val docs = (1 to 50).map(_ => "dog dog dog cat").toDF("text")
    val model = Vocab.unigramModel(docs, "text")
    val got = Vocab.unigramEncode(docs, "text", model)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("dog" -> 150L, "cat" -> 50L), got.toString)
  }

  test("plan pins: stats_levene and tokenize_unigram never cross a single-partition exchange") {
    val dir = "/root/testdata/sf0.001"
    val pl = plan(graft.queries.EvalQueries.statsLevene(spark, dir))
    assert(!pl.contains("Exchange SinglePartition"), pl)
    assert(!pl.contains("CartesianProduct"), pl)
    val pt = plan(graft.queries.ExtQueries.tokenizeUnigram(spark, dir))
    // the Viterbi argmin window is partitioned by word; the only global
    // structures are the broadcast lattice and the memoized model
    assert(!pt.contains("Exchange SinglePartition"), pt)
    assert(!pt.contains("CartesianProduct"), pt)
  }

  test("plan pins: betweenness, ktruss, delong — keyed joins only, no global window") {
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq(
      graft.queries.GraphQueries.graphBetweenness(spark, dir),
      graft.queries.GraphQueries.graphKtruss(spark, dir),
      graft.queries.EvalQueries.evalDelong(spark, dir))) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  // ---- Analytics.cohensD -------------------------------------------------

  test("cohensD: matches the naive pooled-SD computation; equal means give 0") {
    val rnd = new Random(7)
    val rows = (1 to 200).map { i =>
      val a = i % 2 == 0
      ("s", a, (if (a) 10.0 else 8.0) + rnd.nextInt(7))
    }
    val got = Analytics.cohensD(rows.toDF("g", "a", "v"), "g", "v", col("a"))
      .collect().head
    val xa = rows.filter(_._2).map(_._3); val xb = rows.filterNot(_._2).map(_._3)
    def meanOf(x: Seq[Double]) = x.sum / x.size
    def ss(x: Seq[Double]) = { val m = meanOf(x); x.map(v => (v - m) * (v - m)).sum }
    val sp = math.sqrt((ss(xa) + ss(xb)) / (xa.size + xb.size - 2))
    val want = (meanOf(xa) - meanOf(xb)) / sp
    assert(math.abs(got.getAs[Double]("cohens_d") - want) < 1e-5,
      s"${got.getAs[Double]("cohens_d")} vs $want")
    val flat = (1 to 100).map(i => ("s", i % 2 == 0, (i % 5).toDouble))
    val g2 = Analytics.cohensD(flat.toDF("g", "a", "v"), "g", "v", col("a"))
      .collect().head
    assert(math.abs(g2.getAs[Double]("cohens_d")) < 0.2)
  }

  // ---- Analytics.brownForsythe -----------------------------------------

  test("brownForsythe: matches a naive driver-side W on spread-varying cohorts") {
    val rnd = new Random(5)
    val rows = for { c <- 0 until 3; _ <- 0 until 40 } yield
      ("s", c.toLong, (rnd.nextInt(100) / 10.0) * (c + 1))
    val got = Analytics.brownForsythe(rows.toDF("g", "c", "v"),
      "g", "v", col("c")).collect().head
    def lowerMedian(xs: Seq[Double]) = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val z = rows.groupBy(_._2).values.toSeq.map { g =>
      val vs = g.map(_._3); val m = lowerMedian(vs)
      vs.map(x => math.abs(x - m))
    }
    val k = z.size; val n = z.map(_.size).sum
    val zbar = z.flatten.sum / n
    val num = z.map(g =>
      g.size * math.pow(g.sum / g.size - zbar, 2)).sum / (k - 1)
    val den = z.map { g =>
      val m = g.sum / g.size; g.map(x => (x - m) * (x - m)).sum
    }.sum / (n - k)
    val want = num / den
    val w = got.getAs[Double]("w_stat")
    assert(math.abs(w - want) < 1e-3, s"$w vs $want")
    assert(got.getAs[Long]("n_cohorts") == 3 && got.getAs[Long]("n") == 120)
  }

  test("brownForsythe: pure location shift is invisible (W = 0)") {
    // identical spread per cohort, means 100 apart — ANOVA would scream,
    // the spread test must not
    val rows = for { c <- 0 until 3; i <- 0 until 10 } yield
      ("s", c.toLong, c * 100.0 + i)
    val got = Analytics.brownForsythe(rows.toDF("g", "c", "v"),
      "g", "v", col("c")).collect().head
    assert(got.getAs[Double]("w_stat") == 0.0)
  }

  // ---- Graph.betweenness -----------------------------------------------

  test("betweenness: star closed form — all traffic routes through the hub") {
    val star = (1L to 10L).map(i => (0L, i)).toDF("a", "b")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.betweenness(star, seeds, maxHops = 3)
      .as[(Long, Double)].collect().toMap
    // from leaf 1: δ(hub) = 9 × (1/1)·(1+0); other leaves sit at the
    // horizon with δ = 0; the seed itself reports nothing
    assert(got(0L) == 9.0, got.toString)
    assert((2L to 10L).forall(got(_) == 0.0), got.toString)
    assert(!got.contains(1L))
  }

  test("betweenness: matches a naive bounded Brandes on a random graph") {
    val rnd = new Random(17)
    val edges = (0 until 160).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val seedIds = (0L until 40L).filter(_ % 5 == 0)
    val got = Graph.betweenness(edges.toDF("a", "b"),
      seedIds.toDF("node"), maxHops = 3)
      .as[(Long, Double)].collect().toMap
    // naive: per seed, BFS levels with path counts, then the truncated
    // dependency accumulation (unrounded — the round-6 terms differ by
    // < 1e-3 on these magnitudes)
    val adj = (edges ++ edges.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    val reached = scala.collection.mutable.Set.empty[Long]
    for (s <- seedIds) {
      var lvls = Vector(Map(s -> 1L))
      var seen = Set(s)
      for (_ <- 1 to 3) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        for ((v, sig) <- lvls.last; w <- adj.getOrElse(v, Set.empty)
             if !seen.contains(w)) nxt(w) += sig
        lvls = lvls :+ nxt.toMap
        seen = seen ++ nxt.keys
      }
      var delta = lvls(3).keys.map(_ -> 0.0).toMap
      reached ++= lvls(3).keys
      for (d <- 2 to 1 by -1) {
        val cur = lvls(d).map { case (v, sv) =>
          val t = adj.getOrElse(v, Set.empty).toSeq
            .filter(lvls(d + 1).contains)
            .map(w => sv.toDouble / lvls(d + 1)(w) * (1.0 + delta(w))).sum
          v -> t
        }
        cur.foreach { case (v, t) => want(v) += t; reached += v }
        delta = cur
      }
    }
    assert(got.keySet == reached.toSet,
      s"coverage: ${got.keySet.size} vs ${reached.size}")
    for ((n, bc) <- got)
      assert(math.abs(bc - want(n)) < 1e-3, s"node $n: $bc vs ${want(n)}")
  }

  // ---- Analytics.permutationTest -------------------------------------------

  test("permutationTest: huge planted shift is extreme; identical groups are not") {
    // A sits 100 above B — no permutation should reach the observed gap
    val shifted = ((1 to 40).map(i => (i.toLong, 100.0 + i % 5, true)) ++
      (1 to 40).map(i => (100L + i, i % 5.0, false)))
      .toDF("id", "v", "g")
    val r1 = Analytics.permutationTest(shifted, "id", "v", col("g"), b = 100)
      .collect().head
    assert(r1.getAs[Long]("n_ge") == 0 &&
      math.abs(r1.getAs[Double]("p_value") - 1.0 / 101.0) < 1e-5)
    assert(math.abs(r1.getAs[Double]("diff_obs") - 100.0) < 1.0)
    // labels independent of values: p should be large
    val nullCase = (1 to 80).map(i =>
      (i.toLong, (i * 2654435761L % 97).toDouble, i % 2 == 0))
      .toDF("id", "v", "g")
    val r2 = Analytics.permutationTest(nullCase, "id", "v", col("g"), b = 100)
      .collect().head
    assert(r2.getAs[Double]("p_value") > 0.05, r2.toString)
  }

  // ---- Dedup.exactWithPriority --------------------------------------------

  test("exactWithPriority: highest tier wins, then smallest id; singletons kept") {
    val docs = Seq(
      (1L, "same text", 0L), (2L, "same text", 2L), (3L, "same text", 2L),
      (4L, "other", 1L), (5L, "third", 0L)).toDF("doc_id", "text", "pr")
    val got = Dedup.exactWithPriority(docs, "doc_id", "text", col("pr"))
      .select("keep_id", "keep_priority", "n_copies")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 2L, 3L), (4L, 1L, 1L), (5L, 0L, 1L)))
  }

  // ---- Sketches.kmvJaccard -----------------------------------------------

  test("kmvJaccard: exact when both sets fit the sketch; accurate on planted overlap") {
    // small sets (< k): the sketch IS the set, so the estimate is exact
    val small = ((1L to 30L).map(i => ("a", i)) ++
      (16L to 45L).map(i => ("b", i))).toDF("g", "key")
    val ex = Sketches.kmvJaccard(small, "g", "key", k = 64).collect().head
    assert(ex.getAs[Long]("k_used") == 45 && ex.getAs[Long]("matches") == 15)
    assert(math.abs(ex.getAs[Double]("j_est") - 15.0 / 45.0) < 1e-6)
    // big sets: planted Jaccard 1/3 (A = 1..20000, B = 10001..30000)
    val big = ((1L to 20000L).map(i => ("a", i)) ++
      (10001L to 30000L).map(i => ("b", i))).toDF("g", "key")
    val est = Sketches.kmvJaccard(big, "g", "key", k = 256)
      .collect().head.getAs[Double]("j_est")
    assert(math.abs(est - 1.0 / 3.0) < 0.12, est.toString)
  }

  // ---- Analytics.holtWinters ---------------------------------------------

  test("holtWinters: matches a driver-side replay of the recurrences") {
    val rnd = new Random(41)
    val xs = (0 until 40).map(i =>
      50.0 + 10 * (i % 4) + rnd.nextInt(5)) // period-4 signal + noise
    val rows = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, i.toLong, v) }
    val got = Analytics.holtWinters(rows.toDF("k", "ts", "tie", "v"),
      "k", "ts", "tie", "v", alpha = 0.25, beta = 0.125, gamma = 0.25,
      period = 4).collect().head
    // driver-side fold of the same zero-init recurrences
    var l = 0.0; var b = 0.0; val s = Array.fill(4)(0.0); var n = 0
    for (x <- xs) {
      val j = n % 4
      val nl = if (n == 0) x else 0.25 * (x - s(j)) + 0.75 * (l + b)
      val nb = if (n == 0) 0.0 else 0.125 * (nl - l) + 0.875 * b
      s(j) = 0.25 * (x - nl) + 0.75 * s(j)
      l = nl; b = nb; n += 1
    }
    val fc = l + b + s(n % 4)
    assert(math.abs(got.getAs[Double]("level") - l) < 1e-9)
    assert(math.abs(got.getAs[Double]("trend") - b) < 1e-9)
    assert(math.abs(got.getAs[Double]("forecast") - fc) < 1e-9)
    // the seasonal term is doing real work: the forecast sits near the
    // next point of the periodic signal, which a trend-only model misses
    assert(math.abs(fc - (50.0 + 10 * (n % 4) + 2)) < 6.0, fc.toString)
  }

  // ---- Eval.delongAucDiff ------------------------------------------------

  test("delongAucDiff: matches a naive driver-side DeLong on random paired scores") {
    val rnd = new Random(31)
    val rows = (1 to 300).map { _ =>
      val y = rnd.nextBoolean()
      // model a: informative; model b: weaker
      val sa = (if (y) 60 else 40) + rnd.nextInt(40)
      val sb = (if (y) 55 else 45) + rnd.nextInt(40)
      ("s", sa.toLong, sb.toLong, y)
    }
    val got = Eval.delongAucDiff(rows.toDF("g", "sa", "sb", "y"),
      "g", col("sa"), col("sb"), col("y")).collect().head
    val pos = rows.filter(_._4); val neg = rows.filterNot(_._4)
    val m = pos.size.toDouble; val n = neg.size.toDouble
    def v10(s: Long, xs: Seq[Long]) =
      (xs.count(_ < s) + 0.5 * xs.count(_ == s)) / xs.size
    val vA = pos.map(r => v10(r._2, neg.map(_._2)))
    val vB = pos.map(r => v10(r._3, neg.map(_._3)))
    val wA = neg.map(r => v10(r._2, pos.map(_._2)))
    val wB = neg.map(r => v10(r._3, pos.map(_._3)))
    val aucA = vA.sum / m; val aucB = vB.sum / m
    def cov(x: Seq[Double], y: Seq[Double], mx: Double, my: Double) =
      x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum / (x.size - 1)
    val varD =
      (cov(vA, vA, aucA, aucA) + cov(vB, vB, aucB, aucB) -
        2 * cov(vA, vB, aucA, aucB)) / m +
      (cov(wA, wA, 1 - aucA, 1 - aucA) + cov(wB, wB, 1 - aucB, 1 - aucB) -
        2 * cov(wA, wB, 1 - aucA, 1 - aucB)) / n
    val wantZ = (aucA - aucB) / math.sqrt(varD)
    assert(math.abs(got.getAs[Double]("auc_a") - aucA) < 1e-6)
    assert(math.abs(got.getAs[Double]("auc_b") - aucB) < 1e-6)
    assert(math.abs(got.getAs[Double]("z") - wantZ) < 1e-5,
      s"${got.getAs[Double]("z")} vs $wantZ")
  }

  test("delongAucCi: variance matches the naive DeLong components; CI brackets AUC") {
    val rnd = new Random(13)
    val rows = (1 to 300).map { _ =>
      val y = rnd.nextBoolean()
      ("s", ((if (y) 60 else 40) + rnd.nextInt(40)).toLong, y)
    }
    val got = Eval.delongAucCi(rows.toDF("g", "sa", "y"),
      "g", col("sa"), col("y")).collect().head
    val pos = rows.filter(_._3).map(_._2); val neg = rows.filterNot(_._3).map(_._2)
    def v10(s: Long, xs: Seq[Long]) =
      (xs.count(_ < s) + 0.5 * xs.count(_ == s)) / xs.size
    val vA = pos.map(v10(_, neg)); val wA = neg.map(v10(_, pos))
    val auc = vA.sum / pos.size
    def varOf(x: Seq[Double]) = {
      val m = x.sum / x.size
      x.map(v => (v - m) * (v - m)).sum / (x.size - 1)
    }
    val se = math.sqrt(varOf(vA) / pos.size + varOf(wA) / neg.size)
    assert(math.abs(got.getAs[Double]("auc") - auc) < 1e-6)
    assert(math.abs(got.getAs[Double]("se") - se) < 1e-6,
      s"${got.getAs[Double]("se")} vs $se")
    assert(got.getAs[Double]("lo95") < auc && auc < got.getAs[Double]("hi95"))
  }

  test("delongAucDiff: identical paired scores have zero variance and drop") {
    val rows = (1 to 60).map(i => ("s", i.toLong, i.toLong, i % 2 == 0))
    assert(Eval.delongAucDiff(rows.toDF("g", "sa", "sb", "y"),
      "g", col("sa"), col("sb"), col("y")).isEmpty)
  }

  // ---- Graph.trussPeel ---------------------------------------------------

  test("trussPeel: clique survives 4-truss, pendant and bridge edges peel off") {
    // K5 on 0..4 (every edge in 3 triangles), a bridge 4-10, a pendant
    // triangle 10-11-12 (each edge in ONE triangle — below the k=4 bar)
    val k5 = for { a <- 0L until 5L; b <- a + 1 until 5L } yield (a, b)
    val extra = Seq((4L, 10L), (10L, 11L), (10L, 12L), (11L, 12L))
    val got = Graph.trussPeel((k5 ++ extra).toDF("a", "b"), k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect()
    assert(got.map(t => (t._1, t._2)).toSet == k5.toSet, got.mkString(","))
    assert(got.forall(_._3 == 3L), got.mkString(","))
  }

  test("trussPeel: peeling cascades — a triangle hanging off the clique dies in round 2") {
    // triangle 4-5-6 shares node 4 with K5; edge 5-6 has support 1 and
    // dies in round 1, edges 4-5 / 4-6 lose their only triangle and die
    // in round 2
    val k5 = for { a <- 0L until 5L; b <- a + 1 until 5L } yield (a, b)
    val tri = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val got = Graph.trussPeel((k5 ++ tri).toDF("a", "b"), k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect()
    assert(got.map(t => (t._1, t._2)).toSet == k5.toSet, got.mkString(","))
  }

  // ---- Graph.localClustering -----------------------------------------------

  test("localClustering: clique nodes 1.0, star center 0, path interior 0") {
    val k4 = for { a <- 0L until 4L; b <- a + 1 until 4L } yield (a, b)
    val star = (11L to 14L).map(i => (10L, i))
    val path = Seq((20L, 21L), (21L, 22L))
    val got = Graph.localClustering((k4 ++ star ++ path).toDF("a", "b"))
      .select("node", "lcc").as[(Long, Double)].collect().toMap
    assert((0L until 4L).forall(got(_) == 1.0), got.toString)
    assert(got(10L) == 0.0 && got(11L) == 0.0) // hub and leaves
    assert(got(21L) == 0.0 && got(20L) == 0.0) // interior (d=2, no tri), leaf
    // one triangle hung on the clique: node 0-1 share it — check a mixed case
    val mixed = k4 :+ (0L, 5L) :+ (1L, 5L)
    val g2 = Graph.localClustering(mixed.toDF("a", "b"))
      .select("node", "lcc").as[(Long, Double)].collect().toMap
    assert(g2(5L) == 1.0)                     // 5's nbrs {0,1} are connected
    assert(math.abs(g2(0L) - 4.0 / 6.0) < 1e-6, g2.toString) // d=4, T=4 (round-6 output)
  }

  // ---- Graph.scc deep-chain hardening ---------------------------------

  private def sccMap(edges: Seq[(Long, Long)],
      maxPeels: Int = 50): Map[Long, Long] =
    // entryHandoff=false: these tests pin the DISTRIBUTED deep-chain
    // escapes (functional doubling, bulk trim); the r14 entry shortcut
    // would otherwise take these small graphs straight to driver Tarjan
    Graph.scc(edges.toDF("src", "dst"), maxPeels = maxPeels,
        entryHandoff = false)
      .as[(Long, Long)].collect().toMap

  test("scc: 2000-node id-ordered chain (the old diameter trap) — all singletons") {
    // pre-round-9 this threw inside the forward fixpoint (diameter ≈ n
    // ≫ maxHops); the functional fast path resolves it in log rounds
    val chain = (0L until 1999L).map(i => (i, i + 1))
    assert(sccMap(chain) == (0L to 1999L).map(i => i -> i).toMap)
  }

  test("scc: 2000-node directed ring — ONE component labeled 0") {
    val ring = (0L until 1999L).map(i => (i, i + 1)) :+ (1999L, 0L)
    val got = sccMap(ring)
    assert(got.size == 2000 && got.values.forall(_ == 0L))
  }

  test("scc: rho shape — 500-node tail into a 500-node ring") {
    val tail = (0L until 500L).map(i => (i, i + 1))
    val ring = (500L until 999L).map(i => (i, i + 1)) :+ (999L, 500L)
    val want = (0L until 500L).map(i => i -> i).toMap ++
      (500L to 999L).map(i => i -> 500L).toMap
    assert(sccMap(tail ++ ring) == want)
  }

  test("scc: out-tree (maxOut=2, maxIn=1) resolves via the reversed functional dual") {
    val tree = (1L until 511L).map(i => ((i - 1) / 2, i))
    assert(sccMap(tree) == (0L until 511L).map(i => i -> i).toMap)
  }

  test("scc: slow-progress trim drains a deep non-functional layered DAG") {
    // 12 layers × width 3, two out-edges per node (in- AND out-degree 2
    // inside: never functional); root-only peeling would need 12 peels,
    // the trim path peels top AND bottom layers each round
    val edges = for {
      l <- 0L until 11L; i <- 0L until 3L; j <- 0L until 2L
    } yield (l * 3 + i, (l + 1) * 3 + (i + j) % 3)
    assert(sccMap(edges, maxPeels = 6) ==
      (0L until 36L).map(i => i -> i).toMap)
  }

  test("scc: functional graph with several disjoint cycles + tails matches labels") {
    // three rings (sizes 5, 7, 9) each with a 4-node tail feeding in
    def ringWithTail(base: Long, size: Long): Seq[(Long, Long)] = {
      val ring = (0L until size - 1).map(i => (base + i, base + i + 1)) :+
        (base + size - 1, base)
      val tail = (0L until 4L).map(i =>
        (base + 100 + i, if (i == 3) base else base + 101 + i))
      ring ++ tail
    }
    val edges = ringWithTail(0, 5) ++ ringWithTail(200, 7) ++
      ringWithTail(400, 9)
    val got = sccMap(edges)
    val want =
      (0L until 5L).map(i => i -> 0L) ++
        (0L until 4L).map(i => (100L + i) -> (100L + i)) ++
        (200L until 207L).map(i => i -> 200L) ++
        (0L until 4L).map(i => (300L + i) -> (300L + i)) ++
        (400L until 409L).map(i => i -> 400L) ++
        (0L until 4L).map(i => (500L + i) -> (500L + i))
    assert(got == want.toMap)
  }
}
