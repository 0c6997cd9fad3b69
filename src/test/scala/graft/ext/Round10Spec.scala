package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-10 hardening: the last SCC boundary — a deep condensation
  * whose spine keeps in- AND out-degree > 1 (defeats the functional
  * fast path, the bulk trim, and makes the coloring fixpoint need
  * spine-depth hops). `scc` must now COMPLETE on that shape via the
  * residual fallback: driver Tarjan under the edge threshold, FW-BW
  * pivot divide-and-conquer above it.
  */
class Round10Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  /** Braided spine: `levels` levels of two nodes {2i, 2i+1}; each level
    * is a 2-cycle (2i↔2i+1) and fans out to BOTH nodes of the next
    * level — every spine node keeps in- and out-degree ≥ 3, so neither
    * the functional fast path nor the fringe trim ever fires, and the
    * condensation is `levels` deep.
    */
  private def braidedSpine(levels: Int): Seq[(Long, Long)] =
    (0 until levels).flatMap { i =>
      val (a, b) = (2L * i, 2L * i + 1)
      val cyc = Seq(a -> b, b -> a)
      val fwd = if (i < levels - 1)
        Seq(a -> (a + 2), a -> (b + 2), b -> (a + 2), b -> (b + 2))
      else Seq.empty
      cyc ++ fwd
    }

  test("scc: 10k-level braided spine (in/out-degree > 1 throughout) completes via the Tarjan residual") {
    val levels = 10000
    val edges = braidedSpine(levels).toDF("src", "dst")
    // maxHops far below the 10k-hop fixpoint the spine would need —
    // forces the round-9 behavior (throw) into the round-10 fallback
    // (entryHandoff off: the r14 entry shortcut would otherwise take
    // this small graph straight to Tarjan without exercising the stall)
    val got = Graph.scc(edges, maxPeels = 5, maxHops = 25,
        entryHandoff = false)
      .as[(Long, Long)].collect().toMap
    val want = (0 until levels).flatMap { i =>
      Seq(2L * i -> 2L * i, (2L * i + 1) -> 2L * i)
    }.toMap
    assert(got.size == 2 * levels)
    assert(got == want)
  }

  test("scc: FW-BW pivot path (driverMaxEdges=0) resolves one deep big SCC exactly") {
    // 48-level braid closed into ONE giant SCC by two back edges; with
    // the driver threshold at 0 the fallback MUST take the distributed
    // FW-BW branch: pivot 0, forward ∩ backward reach = all 96 nodes.
    val levels = 48
    val base = braidedSpine(levels)
    val last = 2L * (levels - 1)
    val edges = (base ++ Seq(last -> 0L, (last + 1) -> 1L))
      .toDF("src", "dst")
    val got = Graph.scc(edges, maxPeels = 2, maxHops = 8,
        driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 2 * levels)
    assert(got.values.forall(_ == 0L))
  }

  // ---- permutationTest distributed selection (round-10 ask #3) --------

  /** Driver replication of the engine's exact per-replica selection:
    * n_a smallest (mix64(r·n + idx), idx), integer values so the
    * round-6 decimal discipline is exact. Returns the predicted n_ge
    * under the engine's own double formulas.
    */
  private def predictNGe(n: Int, b: Int, v: Int => Long,
      isA: Int => Boolean): (Long, Long, Long) = {
    val nA = (0 until n).count(isA).toLong
    val nB = n - nA
    val st = (0 until n).map(v(_).toDouble).sum
    val saObs = (0 until n).filter(isA).map(v(_).toDouble).sum
    val dObs = saObs / nA - (st - saObs) / nB
    var nGe = 0L
    for (r <- 0 until b) {
      val sel = (0 until n)
        .map(i => (Aggs.mix64(r.toLong * n + i), i))
        .sorted.take(nA.toInt).map(_._2)
      val sa = sel.map(v(_).toDouble).sum
      val dr = sa / nA - (st - sa) / nB
      if (math.abs(dr) >= math.abs(dObs)) nGe += 1
    }
    (nA, nB, nGe)
  }

  test("permutationTest: small-path selection ≡ driver-exact selection (3 value shapes)") {
    val n = 300; val b = 50
    val shapes: Seq[(Int => Long, Int => Boolean)] = Seq(
      (i => (i % 13).toLong, i => i % 3 == 0),
      (i => (i * i % 101).toLong, i => i % 7 < 3),
      (i => (i % 2).toLong * 1000 + i % 5, i => i < 90))
    for (((vf, gf), k) <- shapes.zipWithIndex) {
      val df = (0 until n).map(i => (i.toLong, vf(i), gf(i)))
        .toDF("id", "v", "g")
      val got = Analytics.permutationTest(df, "id", "v", col("g"), b = b)
        .selectExpr("n_a", "n_b", "n_ge").as[(Long, Long, Long)]
        .collect()
      val want = predictNGe(n, b, vf, gf)
      assert(got.length == 1 && got(0) == want, s"shape $k")
    }
  }

  test("permutationTest: bucketed-path selection (n > 100k) ≡ driver-exact selection") {
    val n = 120001; val b = 5
    val vf: Int => Long = i => (i % 97).toLong
    val gf: Int => Boolean = i => i % 3 == 0
    val df = spark.range(n.toLong).selectExpr(
      "id", "id % 97 AS v", "id % 3 = 0 AS g")
    val got = Analytics.permutationTest(df, "id", "v", col("g"), b = b)
      .selectExpr("n_a", "n_b", "n_ge").as[(Long, Long, Long)].collect()
    val want = predictNGe(n, b, vf, gf)
    assert(got.length == 1 && got(0) == want)
  }

  test("permutationTest: 1M items — ranking windows are (replica, bucket)-partitioned, buckets ~n/4096") {
    val n = 1000000L; val b = 3
    val df = spark.range(n).selectExpr(
      "id", "id % 97 AS v", "id % 2 = 0 AS g")
    val res = Analytics.permutationTest(df, "id", "v", col("g"), b = b)
    val row = res.selectExpr("n_a", "n_b", "p_value")
      .as[(Long, Long, Double)].collect()
    assert(row.length == 1)
    assert(row(0)._1 == 500000L && row(0)._2 == 500000L)
    assert(row(0)._3 > 0.0 && row(0)._3 <= 1.0)
    // plan pin: every row_number window partitions by (__r, __bkt) —
    // the n-sized grid is never sorted within a single replica
    val plan = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val rnLines = plan.split("\n").filter(_.contains("row_number"))
    assert(rnLines.nonEmpty)
    assert(rnLines.forall(l => l.contains("__bkt") && l.contains("__r")),
      s"row_number windows not bucket-partitioned:\n${rnLines.mkString("\n")}")
    // the boundary-bucket groups the window actually sorts: ~1000 rows
    // each (adaptive bits: 1M/1000 → 10 bits → shift 54; mix64 uniform),
    // three orders below a replica sort
    val maxBkt = spark.range(n * b)
      .select(expr("id div 1000000").as("r"),
        HashExprs.mix64(col("id")).as("h"))
      .selectExpr("r", "h >> 54 AS bkt")
      .groupBy("r", "bkt").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxBkt < n / 500,
      s"max replica-bucket $maxBkt ≥ n/500 — selection not distributed")
  }

  // ---- waterfill / winRate / TOST (round-10 additions, batch 2) --------

  test("waterfill: saturation prefix + proportional remainder, by hand") {
    val domains = Seq(("A", 1L, 100L), ("B", 1L, 1000L), ("C", 2L, 1000L))
      .toDF("k", "w", "a")
    // budget 1200: A (ratio 100) saturates; tau = (1200-100)/3 = 366.667
    val got = DataOps.waterfill(domains, "k", "w", "a", budget = 1200L)
      .select("k", "saturated", "alloc")
      .as[(String, Boolean, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("A") == ("A", true, 100.0))
    assert(got("B")._2 == false && math.abs(got("B")._3 - 1100.0 / 3) < 1e-6)
    assert(got("C")._2 == false && math.abs(got("C")._3 - 2200.0 / 3) < 1e-6)
    // allocations sum exactly to the budget
    assert(math.abs(got.values.map(_._3).sum - 1200.0) < 1e-5)
    // budget >= total avail: everything saturates, alloc = avail
    val all = DataOps.waterfill(domains, "k", "w", "a", budget = 5000L)
      .select("saturated", "alloc").as[(Boolean, Double)].collect()
    assert(all.forall(_._1) && all.map(_._2).sum == 2100.0)
    // budget below every ratio: nothing saturates, pure proportional
    val none = DataOps.waterfill(domains, "k", "w", "a", budget = 30L)
      .select("k", "saturated", "alloc")
      .as[(String, Boolean, Double)].collect().map(r => r._1 -> r).toMap
    assert(none.values.forall(!_._2))
    assert(none("A")._3 == 7.5 && none("B")._3 == 7.5 && none("C")._3 == 15.0)
  }

  test("winRate: wins/ties accounting and the Wilson interval, by hand") {
    // slice s: A beats B 6 times, loses 2, ties 2 → p=0.75, m=8
    val rows = (0 until 6).map(i => ("s", 10L + i, 1L)) ++
      (0 until 2).map(i => ("s", 1L, 10L + i)) ++
      (0 until 2).map(_ => ("s", 5L, 5L))
    val got = Eval.winRate(rows.toDF("g", "a", "b"), "g", col("a"), col("b"))
      .select("n_decisive", "wins", "n_ties", "win_rate", "lo95", "hi95")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (m, w, t, p, lo, hi) = got(0)
    assert((m, w, t, p) == (8L, 6L, 2L, 0.75))
    val z = 1.959964; val mm = 8.0; val ph = 0.75
    val denom = 1.0 + z * z / mm
    val center = ph + z * z / (2 * mm)
    val rad = z * math.sqrt(ph * (1 - ph) / mm + z * z / (4 * mm * mm))
    assert(math.abs(lo - (center - rad) / denom) < 1e-6)
    assert(math.abs(hi - (center + rad) / denom) < 1e-6)
    assert(lo > 0.0 && hi < 1.0 && lo < p && p < hi)
  }

  test("tostEquivalence: tight same-mean cohorts pass, shifted cohorts fail") {
    // group "eq": two interleaved cohorts drawing the same values —
    // diff ≈ 0, se small ⇒ equivalent within ±5
    val eq = (0 until 400).map(i => ("eq", i.toLong, (i % 10).toDouble))
    // group "ne": cohort A shifted +20 ⇒ decisively NOT equivalent
    val ne = (0 until 400).map(i =>
      ("ne", i.toLong, (i % 10).toDouble + (if (i % 2 == 0) 20.0 else 0.0)))
    val got = Analytics.tostEquivalence((eq ++ ne).toDF("g", "id", "v"),
        "g", "v", col("id") % 2 === 0, margin = 5.0)
      .select("g", "equivalent").as[(String, Boolean)].collect().toMap
    assert(got == Map("eq" -> true, "ne" -> false))
  }

  // ---- two-proportion z + MCC (round-10 additions, batch 3) ------------

  test("twoProportionZ: textbook pooled z by hand; degenerate pooled rates drop") {
    // group g: A = 30 trials / 12 successes, B = 50 trials / 10 successes
    val g = (0 until 30).map(i => ("g", true, i < 12)) ++
      (0 until 50).map(i => ("g", false, i < 10))
    // group z: every trial succeeds → pooled rate 1 → dropped
    val zdrop = (0 until 10).map(i => ("z", i % 2 == 0, true))
    val df = (g ++ zdrop).toDF("grp", "a", "s")
    val got = Analytics.twoProportionZ(df, "grp", col("s"), col("a"))
      .select("grp", "n_a", "n_b", "k_a", "k_b", "z")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 1 && got(0)._1 == "g")
    val (_, na, nb, ka, kb, z) = got(0)
    assert((na, nb, ka, kb) == (30L, 50L, 12L, 10L))
    val (pa, pb, pp) = (12.0 / 30, 10.0 / 50, 22.0 / 80)
    val want = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / 30 + 1.0 / 50))
    assert(math.abs(z - want) < 1e-6)
  }

  test("matthewsCorrelation: matches the closed form; perfect and inverted predictors hit ±1") {
    // crafted confusion: tp=40 tn=30 fp=20 fn=10
    val rows = Seq.fill(40)(("m", true, true)) ++
      Seq.fill(30)(("m", false, false)) ++
      Seq.fill(20)(("m", false, true)) ++
      Seq.fill(10)(("m", true, false)) ++
      // perfect predictor → mcc = 1; inverted → mcc = -1
      (0 until 20).map(i => ("perfect", i % 2 == 0, i % 2 == 0)) ++
      (0 until 20).map(i => ("inv", i % 2 == 0, i % 2 != 0))
    val got = Eval.matthewsCorrelation(rows.toDF("g", "y", "p"), "g",
        col("y"), col("p"))
      .select("g", "mcc").as[(String, Double)].collect().toMap
    val want = (40.0 * 30 - 20.0 * 10) /
      math.sqrt(60.0 * 50.0 * 50.0 * 40.0)
    assert(math.abs(got("m") - want) < 1e-6)
    assert(got("perfect") == 1.0 && got("inv") == -1.0)
  }

  // ---- lowerMedianByGroup null handling (tripwire companion) ----------

  test("madOutliers: null values are invisible to the median, not a rank skew or a tripwire hit") {
    // group "a": values 1..7 plus three nulls — the median must be the
    // median of the NON-NULL multiset (4.0), and the nulls must neither
    // inflate the rank (the silent pre-round-10 skew) nor trip the new
    // band-miss assert
    val df = (1 to 7).map(i => ("a", i.toLong, Some(i.toDouble))) ++
      Seq(("a", 8L, None), ("a", 9L, None), ("a", 10L, None))
    val got = Analytics.madOutliers(df.toDF("g", "id", "v"), "g", "id", "v")
      .where(col("id") === 4L).select("dev").as[Double].collect()
    assert(got.toSeq == Seq(0.0)) // id 4 holds the median value exactly
  }

  // ---- Kendall τ-b + Bartlett (round-10 additions) ---------------------

  test("kendallTauB: matches the all-pairs brute force, with ties on both axes") {
    val rnd = new Random(7919)
    val rows = Seq.tabulate(120)(i =>
      ("g" + (i % 2), rnd.nextInt(6).toLong, rnd.nextInt(5).toLong))
    val got = Eval.kendallTauB(rows.toDF("s", "x", "y"), "s", "x", "y")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    for (g <- Seq("g0", "g1")) {
      val pts = rows.filter(_._1 == g).map(r => (r._2, r._3))
      val n = pts.size
      var p = 0L; var q = 0L; var tX = 0L; var tY = 0L
      for (i <- pts.indices; j <- (i + 1) until n) {
        val ((x1, y1), (x2, y2)) = (pts(i), pts(j))
        if (x1 == x2) tX += 1
        if (y1 == y2) tY += 1
        if (x1 != x2 && y1 != y2 &&
          ((x1 < x2) == (y1 < y2))) p += 1
        else if (x1 != x2 && y1 != y2) q += 1
      }
      val n0 = n.toLong * (n - 1) / 2
      val want = (p - q).toDouble /
        math.sqrt((n0 - tX).toDouble * (n0 - tY).toDouble)
      val (gotN, gotTau) = got(g)
      assert(gotN == n.toLong)
      assert(math.abs(gotTau - want) < 1e-6, s"$g: $gotTau vs $want")
    }
  }

  test("bartlett: matches the textbook statistic; constant-cohort groups drop") {
    // integer values so the round-6 decimal discipline is exact
    val rnd = new Random(28657)
    val rows = Seq.tabulate(200)(i =>
      ("g", i % 4, (rnd.nextInt(50) + (i % 4) * 10).toDouble)) ++
      // group with one CONSTANT cohort → ln(0) undefined → must drop
      Seq.tabulate(40)(i => ("const", i % 2, if (i % 2 == 0) 5.0
        else (i / 2).toDouble))
    val got = Analytics.bartlett(rows.toDF("s", "c", "v"), "s", "v",
        col("c"))
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == 1 && got(0)._1 == "g")
    val (_, k, n, t) = got(0)
    assert(k == 4L && n == 200L)
    // textbook T on the same data
    val cohorts = rows.filter(_._1 == "g").groupBy(_._2).values.toSeq
      .map(_.map(_._3))
    val ni = cohorts.map(_.size.toDouble)
    val si2 = cohorts.map { xs =>
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val nn = ni.sum; val kk = ni.size.toDouble
    val sp2 = ni.zip(si2).map { case (a, b) => (a - 1) * b }.sum / (nn - kk)
    val lt = ni.zip(si2).map { case (a, b) => (a - 1) * math.log(b) }.sum
    val corr = 1.0 + (ni.map(a => 1.0 / (a - 1)).sum - 1.0 / (nn - kk)) /
      (3.0 * (kk - 1.0))
    val want = ((nn - kk) * math.log(sp2) - lt) / corr
    assert(math.abs(t - want) < 1e-3, s"$t vs $want")
  }

  // ---- exactWithPriority edges (ADVICE r09) ----------------------------

  test("exactWithPriority: null priorities rank lowest; Long.MinValue id wins ties safely") {
    val df = Seq(
      // group "x": null priority must lose to the real ones; among the
      // p=5 pair the smaller id wins
      (10L, "x", Some(5L)), (3L, "x", None), (7L, "x", Some(5L)),
      // group "y": ALL null priorities → smallest id, null keep_priority
      (20L, "y", None), (12L, "y", None),
      // group "z": Long.MinValue id in a tie — the old (-id) cast
      // overflowed here; ~id must pick it as the smallest
      (Long.MinValue, "z", Some(1L)), (99L, "z", Some(1L)))
      .toDF("id", "text", "p")
    val got = Dedup.exactWithPriority(df, "id", "text", col("p"))
      .select("keep_id", "keep_priority", "n_copies")
      .as[(Long, Option[Long], Long)].collect().toSet
    assert(got == Set(
      (7L, Some(5L), 3L),
      (12L, None, 2L),
      (Long.MinValue, Some(1L), 2L)))
  }

  // ---- WordPiece (round-10 ask #2) -------------------------------------

  test("wordpieceTrain: hand-computed likelihood-gain merges on a 2-word corpus") {
    // words: "aaa"×3 → |a|##a|##a|, "ab"×2 → |a|##b|
    // unigrams a=5, ##a=6, ##b=2; pairs (a,##a)=3, (##a,##a)=3, (a,##b)=2
    // scores 3/30, 3/36, 2/10 → merge 1 = (a,##b)→"ab" (0.2 wins)
    // then unigrams a=3, ##a=6, ab=2; pairs (a,##a)=3, (##a,##a)=3
    // scores 3/18, 3/36 → merge 2 = (a,##a)→"aa"
    val docs = Seq("aaa ab aaa", "ab aaa").toDF("text")
    val got = Vocab.wordpieceTrain(docs, "text", merges = 2)
      .orderBy("rank")
      .as[(Long, String, String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "##b", "ab", 2L, 5L, 2L),
      (2L, "a", "##a", "aa", 3L, 3L, 6L)))
  }

  /** Reference greedy longest-match-first WordPiece segmentation —
    * the imperative form the lattice argmax must equal. */
  private def greedySeg(word: String, vocab: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var pos = 0
    while (pos < word.length) {
      var len = word.length - pos
      var hit: Option[String] = None
      while (len >= 1 && hit.isEmpty) {
        val raw = word.substring(pos, pos + len)
        val piece = if (pos == 0) raw else "##" + raw
        if (vocab(piece)) hit = Some(piece) else len -= 1
      }
      hit match {
        case Some(p) => out += p; pos += len
        case None    => return Seq.empty // full alphabet ⇒ unreachable
      }
    }
    out.toSeq
  }

  test("wordpieceEncode: lattice argmax ≡ imperative greedy longest-match on a trained vocab") {
    val texts = Seq(
      "the cat sat on the mat", "the cats sat", "a cat and a hat",
      "mats and hats and cats", "the the the cat cat", "on a mat sat a cat")
    val docs = texts.toDF("text")
    val trained = Vocab.wordpieceTrain(docs, "text", merges = 6)
      .orderBy("rank").as[(Long, String, String, String, Long, Long, Long)]
      .collect()
    val merged = trained.map(_._4).toSeq
    val got = Vocab.wordpieceEncode(docs, "text", merged)
      .as[(String, Long)].collect().toMap

    // expected: brute-force greedy over the same capped word-type table
    val wordCnt = texts.flatMap(_.split("\\s+"))
      .filter(w => w.matches("^[a-z]+$") && w.length <= 8)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val alpha = wordCnt.keySet.flatMap(w =>
      w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else s"##$c" })
    val vocab = alpha ++ merged
    val want = wordCnt.toSeq
      .flatMap { case (w, c) => greedySeg(w, vocab).map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == want)
  }

  test("wordpieceEncode: single-char words and ## continuation accounting") {
    val docs = Seq("a ab abc").toDF("text")
    val got = Vocab.wordpieceEncode(docs, "text", Seq.empty)
      .as[(String, Long)].collect().toMap
    // no merges ⇒ all singles: a appears as word-initial 3×, ##b 2×, ##c 1×
    assert(got == Map("a" -> 3L, "##b" -> 2L, "##c" -> 1L))
  }

  test("scc: coloring path ≡ forced-Tarjan path on 20 random digraphs") {
    // maxHops=1 forces the fallback (Tarjan) on any graph whose
    // fixpoint needs >1 hop — an INDEPENDENT implementation of the
    // same contract. Cross-validate against the default coloring path.
    val rnd = new Random(104729)
    for (trial <- 0 until 20) {
      val n = 40 + rnd.nextInt(120)
      val m = n + rnd.nextInt(3 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (s, d) => s != d }.distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst").cache()
        // entryHandoff=false keeps this the COLORING path (the r14
        // entry shortcut would silently turn it into Tarjan-vs-Tarjan)
        val viaColoring = Graph.scc(df, entryHandoff = false)
          .as[(Long, Long)].collect().toMap
        val viaTarjan = Graph.scc(df, maxPeels = 50, maxHops = 1,
            entryHandoff = false)
          .as[(Long, Long)].collect().toMap
        // the default path (r14 entry hand-off — what graph_scc runs)
        // must agree with both
        val viaEntry = Graph.scc(df)
          .as[(Long, Long)].collect().toMap
        assert(viaColoring == viaTarjan, s"trial $trial: n=$n m=$m")
        assert(viaEntry == viaColoring, s"trial $trial entry: n=$n m=$m")
        df.unpersist()
      }
    }
  }
}
