package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-8 operator batch, part c: directed strongly connected
  * components, corpus chrF, and the Mann–Whitney U test — each pinned
  * against an independent driver-side re-derivation (Kosaraju for SCC,
  * naive gram bags for chrF, naive average-ranking for U), never the
  * operator's own formula.
  */
class Round8cSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- Graph.scc -----------------------------------------------------------

  private def sccMap(edges: Seq[(Long, Long)],
      maxPeels: Int = 50): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    Graph.scc(df, maxPeels = maxPeels).as[(Long, Long)].collect().toMap
  }

  /** Independent driver-side Kosaraju (two DFS passes, min-id labels). */
  private def kosaraju(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val fwd = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val bwd = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    val visited = scala.collection.mutable.Set.empty[Long]
    val order = scala.collection.mutable.ArrayBuffer.empty[Long]
    def dfs1(s: Long): Unit = {
      // iterative post-order
      val stack = scala.collection.mutable.Stack[(Long, Boolean)]((s, false))
      while (stack.nonEmpty) {
        val (u, done) = stack.pop()
        if (done) order += u
        else if (!visited(u)) {
          visited += u
          stack.push((u, true))
          fwd.getOrElse(u, Nil).foreach(v => if (!visited(v)) stack.push((v, false)))
        }
      }
    }
    nodes.foreach(n => if (!visited(n)) dfs1(n))
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    order.reverseIterator.foreach { s =>
      if (!comp.contains(s)) {
        val members = scala.collection.mutable.ArrayBuffer.empty[Long]
        val stack = scala.collection.mutable.Stack[Long](s)
        while (stack.nonEmpty) {
          val u = stack.pop()
          if (!comp.contains(u)) {
            comp(u) = s // provisional; re-labeled to min below
            members += u
            bwd.getOrElse(u, Nil).foreach(v => if (!comp.contains(v)) stack.push(v))
          }
        }
        val m = members.min
        members.foreach(u => comp(u) = m)
      }
    }
    comp.toMap
  }

  test("scc: hand graph — two cycles, a bridge, and a sink") {
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 1L), // cycle {1,2,3}
      (10L, 11L), (11L, 10L),       // cycle {10,11}
      (3L, 10L),                    // bridge (condensation edge)
      (3L, 20L))                    // sink singleton
    assert(sccMap(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("scc: pseudo-random directed graph matches Kosaraju") {
    val edges = (0L until 211L).flatMap { i =>
      Seq((i, (i * 2654435761L) % 211L), (i, (i * 40503L + 7L) % 211L))
    }.filter { case (a, b) => a != b }
    assert(sccMap(edges) == kosaraju(edges))
  }

  test("scc: 64-node directed ring is ONE component (deep fwd fixpoint)") {
    val ring = (0L until 63L).map(i => (i, i + 1)) :+ (63L, 0L)
    val got = sccMap(ring)
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("scc: 6-node DAG path peels to all-singletons (multi-peel case)") {
    val path = (1L to 5L).map(i => (i, i + 1))
    assert(sccMap(path) == (1L to 6L).map(i => i -> i).toMap)
  }

  test("scc: edgeless after self-loop removal returns empty") {
    assert(sccMap(Seq((5L, 5L))).isEmpty)
  }

  // ---- Eval.corpusChrf -------------------------------------------------

  /** Independent naive chrF over whitespace-stripped strings. */
  private def naiveChrf(texts: Seq[String], dropEvery: Int)
      : (Seq[(Long, Long, Long)], Double) = {
    def strip(toks: Seq[String]) = toks.mkString("")
    def bag(s: String, n: Int): Map[String, Long] =
      if (s.length < n) Map.empty
      else s.sliding(n).toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val docs = texts.map(_.trim.split("\\s+").toSeq)
    val stats = (1 to 3).map { n =>
      var m = 0L; var ct = 0L; var rt = 0L
      docs.foreach { toks =>
        val cand = strip(toks.zipWithIndex.collect {
          case (t, i) if (i + 1) % dropEvery != 0 => t })
        val ref = strip(toks)
        val cb = bag(cand, n); val rb = bag(ref, n)
        cb.foreach { case (g, c) => m += math.min(c, rb.getOrElse(g, 0L)); ct += c }
        rt += rb.values.sum
      }
      (m, ct, rt)
    }
    val p = stats.map { case (m, ct, _) => if (ct == 0) 0.0 else m.toDouble / ct }.sum / 3.0
    val r = stats.map { case (m, _, rt) => if (rt == 0) 0.0 else m.toDouble / rt }.sum / 3.0
    val f = if (4.0 * p + r == 0.0) 0.0 else 5.0 * p * r / (4.0 * p + r)
    (stats, f)
  }

  test("corpusChrf: matches the naive gram-bag computation") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog near the old barn",
      "a b c d e f g h i j",
      "spark spark spark spark spark spark")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val row = Eval.corpusChrf(df, "doc_id", "text", dropEvery = 5)
      .collect().head
    val (stats, f) = naiveChrf(texts, dropEvery = 5)
    (1 to 3).foreach { n =>
      assert(row.getAs[Long](s"match$n") == stats(n - 1)._1, s"match$n")
      assert(row.getAs[Long](s"ctotal$n") == stats(n - 1)._2, s"ctotal$n")
      assert(row.getAs[Long](s"rtotal$n") == stats(n - 1)._3, s"rtotal$n")
    }
    assert(math.abs(row.getAs[Double]("chrf") - f) < 1e-6)
  }

  test("corpusChrf: a corpus of sub-dropEvery docs scores a perfect 1.0") {
    // every doc has < 5 tokens, so position 5 never exists: cand == ref
    val df = Seq((1L, "alpha beta gamma"), (2L, "delta eps"))
      .toDF("doc_id", "text")
    val row = Eval.corpusChrf(df, "doc_id", "text", dropEvery = 5)
      .collect().head
    assert(row.getAs[Double]("chrf") == 1.0 &&
      row.getAs[Double]("chrf_p") == 1.0 && row.getAs[Double]("chrf_r") == 1.0)
  }

  // ---- Analytics.mannWhitneyU ------------------------------------------

  test("mannWhitneyU: hand-computed U and z with ties") {
    // group g: A = {1.0, 2.0, 2.0}, B = {2.0, 3.0}
    // ranks: 1.0→1; 2.0,2.0,2.0→avg rank 3; 3.0→5
    // R_A = 1 + 3 + 3 = 7, U_A = 7 − 3·4/2 = 1 ⇒ u2_a = 2
    val df = Seq(
      ("g", 1L, 1.0), ("g", 3L, 2.0), ("g", 5L, 2.0),
      ("g", 2L, 2.0), ("g", 4L, 3.0)).toDF("grp", "user_id", "value")
    val r = Analytics.mannWhitneyU(df, "grp", "value",
      col("user_id") % 2 === 1).collect().head
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("u2_a") == 2.0)
    // ties = Σ(t³−t) = (3³−3) = 24; var4 = (na·nb/3)·((n+1) − 24/(n(n−1)))
    val v4 = (3.0 * 2.0 / 3.0) * (6.0 - 24.0 / (5.0 * 4.0))
    val z = (2.0 - 6.0) / math.sqrt(v4)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)
    // Cliff's delta = u2a/(na·nb) − 1 = 2/6 − 1
    assert(math.abs(r.getAs[Double]("cliffs_delta") - (2.0 / 6.0 - 1.0)) < 1e-6)
  }

  test("mannWhitneyU: all-tied group is dropped; balanced shift detected") {
    val allTied = (1L to 8L).map(u => ("t", u, 5.0))
    val shifted = (1L to 40L).map(u =>
      ("s", u, if (u % 2 == 1) u.toDouble else u.toDouble + 100.0))
    val df = (allTied ++ shifted).toDF("grp", "user_id", "value")
    val out = Analytics.mannWhitneyU(df, "grp", "value",
      col("user_id") % 2 === 1).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("s")) // "t" undefined, dropped
    val z = out.head.getAs[Double]("z")
    assert(z < -3.0, s"odd cohort is uniformly 100 lower, z=$z")
  }

  // ---- Eval.expectedCalibrationError ------------------------------------

  test("expectedCalibrationError: hand-computed three-bin case") {
    // slice x: bin1 = {(0.1, F)} → |0 − 0.1| = 0.1
    //          bin3 = {(0.3, T)} → |1 − 0.3| = 0.7
    //          bin9 = {(0.95, T)} → |1 − 0.95| = 0.05
    // ECE = (0.1 + 0.7 + 0.05) / 3
    val df = Seq(("x", 0.1, false), ("x", 0.3, true), ("x", 0.95, true))
      .toDF("slice", "score", "y")
    val r = Eval.expectedCalibrationError(df, "slice", "score", col("y"))
      .collect().head
    assert(r.getAs[Long]("n") == 3 && r.getAs[Long]("n_bins_used") == 3)
    assert(math.abs(r.getAs[Double]("ece") - 0.85 / 3.0) < 1e-6)
    // perfectly calibrated degenerate case: score == observed frequency
    val perfect = Seq(("p", 1.0, true), ("p", 0.0, false))
      .toDF("slice", "score", "y")
    val rp = Eval.expectedCalibrationError(perfect, "slice", "score",
      col("y")).collect().head
    assert(rp.getAs[Double]("ece") == 0.0)
  }

  // ---- Analytics.jsdFromGlobal -------------------------------------------

  test("jsdFromGlobal: 0 for the blend-identical group, ln2 bound for disjoint") {
    // two groups with IDENTICAL word distributions: each group's P equals
    // the global Q exactly, so JSD = 0 for both
    val same = Seq.tabulate(40)(i =>
      (if (i % 2 == 0) "a" else "b", s"w${i % 5}"))
      .toDF("grp", "word")
    val rs = Analytics.jsdFromGlobal(same, "grp", "word")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("jsd")).toMap
    assert(rs.values.forall(_ == 0.0), rs.toString)
    // two equal groups with DISJOINT vocabularies: vs the BLEND (which
    // contains the group itself), p = 2q on own words and the closed
    // form is ½ln(4/3) + ¼ln(2/3) + ¼ln2 = 1.5·ln2 − 0.75·ln3
    val disj = (Seq.tabulate(20)(i => ("a", s"x$i")) ++
      Seq.tabulate(20)(i => ("b", s"y$i"))).toDF("grp", "word")
    val rd = Analytics.jsdFromGlobal(disj, "grp", "word")
      .collect().map(_.getAs[Double]("jsd"))
    val want = 1.5 * math.log(2.0) - 0.75 * math.log(3.0)
    rd.foreach(j => assert(math.abs(j - want) < 1e-5, s"$j vs $want"))
  }

  test("jsdFromGlobal: matches a naive driver-side JSD on a skewed corpus") {
    val rows = Seq.fill(8)(("a", "common")) ++ Seq.fill(2)(("a", "rare_a")) ++
      Seq.fill(5)(("b", "common")) ++ Seq.fill(5)(("b", "rare_b"))
    val got = Analytics.jsdFromGlobal(rows.toDF("grp", "word"), "grp", "word")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("jsd")).toMap
    def naive(grp: String): Double = {
      val n = rows.size.toDouble
      val gRows = rows.filter(_._1 == grp)
      val ng = gRows.size.toDouble
      val q = rows.groupBy(_._2).map { case (w, v) => w -> v.size / n }
      val p = gRows.groupBy(_._2).map { case (w, v) => w -> v.size / ng }
      q.keys.map { w =>
        val pw = p.getOrElse(w, 0.0); val qw = q(w)
        val m = (pw + qw) / 2.0
        (if (pw > 0) 0.5 * pw * math.log(pw / m) else 0.0) +
          (if (qw > 0) 0.5 * qw * math.log(qw / m) else 0.0)
      }.sum
    }
    Seq("a", "b").foreach(g =>
      assert(math.abs(got(g) - naive(g)) < 1e-5, s"$g: ${got(g)} vs ${naive(g)}"))
  }

  // ---- Analytics.theilSenSlope ---------------------------------------------

  test("theilSenSlope: exact linear series recovers the slope; outlier day shrugged off") {
    import java.sql.Timestamp
    def ts(day: Int, i: Int) =
      new Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // group "lin": day d carries 3 + 2d events → every pairwise slope
    // is exactly 2.0, so the median is too
    val lin = (0 until 8).flatMap(d =>
      (0 until 3 + 2 * d).map(i => ("lin", ts(d, i))))
    // group "out": days carry 10,12,14,16,500,20,22,24 — a single spike
    // day; OLS would report a big slope, Theil–Sen stays near 2
    val counts = Seq(10, 12, 14, 16, 500, 20, 22, 24)
    val out = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => ("out", ts(d, i))) }
    val got = Analytics.theilSenSlope((lin ++ out).toDF("grp", "ts"),
        "grp", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("slope"))).toMap
    assert(got("lin") == ((28L, 2.0)))
    val (nOut, sOut) = got("out")
    assert(nOut == 28L)
    assert(sOut >= 1.5 && sOut <= 3.0,
      s"spike day must not drag the robust slope: $sOut")
    // cross-check "out" against a naive driver-side lower median
    val slopes = (for {
      i <- counts.indices; j <- counts.indices if i < j
    } yield ((counts(j) - counts(i)).toDouble / (j - i), i, j))
      .sortBy(identity)
    val want = slopes((slopes.size + 1) / 2 - 1)._1
    assert(math.abs(sOut - want) < 1e-6, s"$sOut vs $want")
  }

  // ---- DataOps.paretoFront2D -----------------------------------------------

  test("paretoFront2D: hand case with ties and duplicate front points") {
    // (5, 1) and (1, 5) are both on the front; (3, 3) survives (nothing
    // ≥ both); (2, 2) is dominated by (3, 3); duplicates of a front
    // point are ALL kept (equal points do not dominate each other)
    val df = Seq((1L, 5L, 1.0), (2L, 1L, 5.0), (3L, 3L, 3.0),
      (4L, 2L, 2.0), (5L, 3L, 3.0)).toDF("id", "x", "y")
    val got = DataOps.paretoFront2D(df, "id", "x", "y")
      .as[(Long, Long, Double)].collect().map(_._1).toSet
    assert(got == Set(1L, 2L, 3L, 5L))
  }

  test("paretoFront2D: matches the brute-force dominance definition") {
    val rnd = new Random(23)
    val rows = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toDouble))
    val got = DataOps.paretoFront2D(rows.toDF("id", "x", "y"), "id", "x", "y")
      .as[(Long, Long, Double)].collect().map(_._1).toSet
    def dominated(p: (Long, Long, Double)) = rows.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    val want = rows.filterNot(dominated).map(_._1).toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
  }

  // ---- Graph.reciprocity ---------------------------------------------------

  test("reciprocity: hand graph with one mutual pair; cycle is 0; clique is 1") {
    val mixed = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.reciprocity(mixed).collect().head
    assert((r.getAs[Long]("m_edges"), r.getAs[Long]("mutual")) == ((4L, 2L)))
    assert(r.getAs[Double]("reciprocity") == 0.5)
    val ring = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    assert(Graph.reciprocity(ring).collect().head
      .getAs[Double]("reciprocity") == 0.0)
    val biclique = for { a <- 0L until 4L; b <- 0L until 4L if a != b }
      yield (a, b)
    assert(Graph.reciprocity(biclique.toDF("src", "dst")).collect().head
      .getAs[Double]("reciprocity") == 1.0)
  }

  // ---- Analytics.friedmanQ ---------------------------------------------------

  test("friedmanQ: no ties ⇒ classic Friedman chi-square; identical rankings maximal") {
    // 4 blocks, 3 treatments, treatment 'a' always best, 'c' always worst
    // ⇒ R = (4, 8, 12); classic Q = 12/(n·k(k+1))·ΣR² − 3n(k+1) = 8,
    // the k=3/n=4 maximum
    val rows = for {
      b <- 1 to 4; (t, v) <- Seq(("a", 3.0), ("b", 2.0), ("c", 1.0))
    } yield ("s", b.toLong, t, v + b * 10) // block offsets keep values distinct
    val r = Analytics.friedmanQ(rows.toDF("slice", "blk", "trt", "v"),
      "slice", "blk", "trt", "v").collect().head
    assert(r.getAs[Long]("n_blocks") == 4 && r.getAs[Long]("n_treatments") == 3)
    val want = 12.0 / (4.0 * 3 * 4) * (16.0 + 64.0 + 144.0) - 3.0 * 4 * 4
    assert(math.abs(r.getAs[Double]("q") - want) < 1e-6,
      s"${r.getAs[Double]("q")} vs $want")
  }

  test("friedmanQ: matches a naive tie-corrected computation; all-tied drops") {
    val rnd = new Random(11)
    // values on a 4-point grid so within-block ties are common
    val rows = for {
      b <- 1 to 30; t <- Seq("a", "b", "c")
    } yield ("s", b.toLong, t,
      (rnd.nextInt(4) + (if (t == "a") 1 else 0)).toDouble)
    val r = Analytics.friedmanQ(rows.toDF("slice", "blk", "trt", "v"),
      "slice", "blk", "trt", "v").collect().head
    // naive Conover: within-block average ranks, A = Σr², B = ΣR_j²/n,
    // C = nk(k+1)²/4, Q = (k−1)(B−C)/(A−C)
    val byBlock = rows.groupBy(_._2)
    val cells = byBlock.toSeq.flatMap { case (_, rs) =>
      val sorted = rs.map(_._4).sorted
      rs.map { case (_, _, t, v) =>
        val lo = sorted.indexWhere(_ == v); val hi = sorted.lastIndexWhere(_ == v)
        (t, (lo + hi + 2) / 2.0)
      }
    }
    val n = byBlock.size.toDouble; val k = 3.0
    val a = cells.map(c => c._2 * c._2).sum
    val rj = cells.groupBy(_._1).map { case (_, cs) => cs.map(_._2).sum }
    val bTerm = rj.map(x => x * x).sum / n
    val c = n * k * (k + 1) * (k + 1) / 4.0
    val want = n * (k - 1.0) * (bTerm - c) / (a - c)
    assert(math.abs(r.getAs[Double]("q") - want) < 1e-5,
      s"${r.getAs[Double]("q")} vs $want")
    // every block fully tied ⇒ A = C ⇒ undefined ⇒ dropped
    val tied = (1 to 5).flatMap(b => Seq("a", "b", "c").map(t =>
      ("t", b.toLong, t, 9.0)))
    assert(Analytics.friedmanQ(tied.toDF("slice", "blk", "trt", "v"),
      "slice", "blk", "trt", "v").collect().isEmpty)
  }

  // ---- Analytics.kruskalWallis ----------------------------------------------

  test("kruskalWallis: matches the naive tie-corrected H on a hand dataset") {
    val cohorts = Map(0L -> Seq(1.0, 2.0, 2.0, 5.0), 1L -> Seq(2.0, 3.0, 6.0),
      2L -> Seq(6.0, 7.0, 8.0, 8.0))
    val df = cohorts.toSeq.flatMap { case (c, vs) => vs.map(v => ("g", c, v)) }
      .toDF("grp", "c", "value")
    val r = Analytics.kruskalWallis(df, "grp", "value", col("c"))
      .collect().head
    assert(r.getAs[Long]("n_cohorts") == 3 && r.getAs[Long]("n") == 11)
    // naive: average ranks over the pooled sample, per-cohort rank sums
    val all = cohorts.toSeq.flatMap { case (c, vs) => vs.map(v => (c, v)) }
    val sorted = all.map(_._2).sorted
    def avgRank(v: Double): Double = {
      val lo = sorted.indexWhere(_ == v); val hi = sorted.lastIndexWhere(_ == v)
      (lo + hi + 2) / 2.0
    }
    val n = all.size.toDouble
    val sumR2overN = cohorts.map { case (_, vs) =>
      math.pow(vs.map(avgRank).sum, 2) / vs.size }.sum
    val h0 = 12.0 / (n * (n + 1.0)) * sumR2overN - 3.0 * (n + 1.0)
    val ties = all.map(_._2).groupBy(identity).values
      .map(g => { val t = g.size.toDouble; t * t * t - t }).sum
    val want = h0 / (1.0 - ties / (n * n * n - n))
    assert(math.abs(r.getAs[Double]("h") - want) < 1e-5,
      s"${r.getAs[Double]("h")} vs $want")
  }

  test("kruskalWallis: identical cohorts give H = 0; all-tied group drops") {
    val df = (0L until 3L).flatMap(c => (1 to 10).map(v =>
      ("s", c, v.toDouble))).toDF("grp", "c", "value")
    val r = Analytics.kruskalWallis(df, "grp", "value", col("c"))
      .collect().head
    assert(math.abs(r.getAs[Double]("h")) < 1e-9, r.toString)
    val const = (0L until 3L).flatMap(c => (1 to 5).map(_ =>
      ("k", c, 7.0))).toDF("grp", "c", "value")
    assert(Analytics.kruskalWallis(const, "grp", "value", col("c"))
      .collect().isEmpty)
  }

  // ---- Analytics.anovaF ----------------------------------------------------

  test("anovaF: matches the naive one-way F on a hand dataset") {
    val cohorts = Map(0L -> Seq(1.0, 2.0, 3.0), 1L -> Seq(2.0, 3.0, 4.0),
      2L -> Seq(10.0, 11.0, 12.0))
    val df = cohorts.toSeq.flatMap { case (c, vs) =>
      vs.map(v => ("g", c, v)) }.toDF("grp", "c", "value")
    val r = Analytics.anovaF(df, "grp", "value", col("c")).collect().head
    assert(r.getAs[Long]("n_cohorts") == 3 && r.getAs[Long]("n") == 9)
    // naive: SSB = Σ n_i(x̄_i − x̄)², SSW = Σ Σ(x − x̄_i)², F = (SSB/2)/(SSW/6)
    val all = cohorts.values.flatten.toSeq
    val grand = all.sum / all.size
    val ssb = cohorts.values.map(vs => vs.size *
      math.pow(vs.sum / vs.size - grand, 2)).sum
    val ssw = cohorts.values.map(vs => {
      val m = vs.sum / vs.size; vs.map(v => (v - m) * (v - m)).sum }).sum
    val want = (ssb / 2.0) / (ssw / 6.0)
    assert(math.abs(r.getAs[Double]("f_stat") - want) < 1e-5,
      s"${r.getAs[Double]("f_stat")} vs $want")
  }

  test("anovaF: identical cohorts give F = 0; constant group drops") {
    // each cohort gets the same multiset {1..10} ⇒ between-variance 0
    val df = (0L until 3L).flatMap(c => (1 to 10).map(v =>
      ("s", c, v.toDouble))).toDF("grp", "c", "value")
    val r = Analytics.anovaF(df, "grp", "value", col("c")).collect().head
    assert(r.getAs[Double]("f_stat") == 0.0)
    val const = (0L until 3L).flatMap(c => (1 to 5).map(_ =>
      ("k", c, 7.0))).toDF("grp", "c", "value")
    assert(Analytics.anovaF(const, "grp", "value", col("c"))
      .collect().isEmpty)
  }

  // ---- Graph.assortativity -----------------------------------------------

  test("assortativity: star graph is perfectly disassortative (r = −1)") {
    val star = (1L to 9L).map(i => (0L, i)).toDF("a", "b")
    val r = Graph.assortativity(star).collect().head
    assert(r.getAs[Long]("m") == 18)
    assert(math.abs(r.getAs[Double]("r") - (-1.0)) < 1e-6)
  }

  test("assortativity: regular graph has zero degree variance ⇒ null r") {
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("a", "b")
    val r = Graph.assortativity(ring).collect().head
    assert(r.isNullAt(r.fieldIndex("r")))
  }

  test("assortativity: matches a naive driver-side Pearson on a random graph") {
    val edges = (0L until 150L).map(i => (i, (i * 2654435761L) % 151L))
      .filter { case (a, b) => a != b }
    val got = Graph.assortativity(edges.toDF("a", "b")).collect().head
    val dirE = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = dirE.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val xs = dirE.map { case (s, d) => (deg(s), deg(d)) }
    val m = xs.size.toDouble
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    val want = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(math.abs(got.getAs[Double]("r") - want) < 1e-6,
      s"${got.getAs[Double]("r")} vs $want")
  }

  // ---- Analytics.wilcoxonSignedRank --------------------------------------

  test("wilcoxonSignedRank: hand-computed with tied |d| and a dropped zero") {
    // d = {+1, −2, +2, +3, 0}: the zero drops; |d| ranks 1→1,
    // {2,2}→2.5, 3→4; W⁺ = 1 + 2.5 + 4 = 7.5, n = 4, ties = 2³−2 = 6;
    // classic z = (W⁺ − n(n+1)/4)/sqrt(n(n+1)(2n+1)/24 − ties/48)
    val df = Seq(("g", 2.0, 1.0), ("g", 1.0, 3.0), ("g", 5.0, 3.0),
      ("g", 7.0, 4.0), ("g", 9.0, 9.0)).toDF("grp", "a", "b")
    val r = Analytics.wilcoxonSignedRank(df, "grp", "a", "b")
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 4 && r.getAs[Long]("n_pos") == 3)
    val z = (7.5 - 4.0 * 5.0 / 4.0) /
      math.sqrt(4.0 * 5 * 9 / 24.0 - 6.0 / 48.0)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)
  }

  test("wilcoxonSignedRank: symmetric differences give z = 0; all-tied group drops") {
    val sym = Seq(("s", 1.0, 0.0), ("s", 0.0, 1.0), ("s", 3.0, 1.0),
      ("s", 1.0, 3.0)).toDF("grp", "a", "b")
    val rs = Analytics.wilcoxonSignedRank(sym, "grp", "a", "b")
      .collect().head
    assert(rs.getAs[Double]("z") == 0.0)
    // one nonzero pair: n=1, var = (2·1·2·3 − 0)/3 = 4 > 0 ⇒ kept;
    // all-zero group: no nonzero pairs ⇒ dropped entirely
    val zeros = Seq(("z0", 5.0, 5.0), ("z0", 7.0, 7.0)).toDF("grp", "a", "b")
    assert(Analytics.wilcoxonSignedRank(zeros, "grp", "a", "b")
      .collect().isEmpty)
  }

  test("mannWhitneyU: no ties ⇒ classic U on a known example") {
    // A = {10, 30}, B = {20, 40, 50}: ranks A = {1, 3} ⇒ R_A = 4,
    // U_A = 4 − 3 = 1, u2_a = 2; ties term = 0
    val df = Seq(("g", 1L, 10.0), ("g", 3L, 30.0),
      ("g", 2L, 20.0), ("g", 4L, 40.0), ("g", 6L, 50.0))
      .toDF("grp", "user_id", "value")
    val r = Analytics.mannWhitneyU(df, "grp", "value",
      col("user_id") % 2 === 1).collect().head
    assert(r.getAs[Double]("u2_a") == 2.0)
    val v4 = (2.0 * 3.0 / 3.0) * 6.0
    assert(math.abs(r.getAs[Double]("z") - (2.0 - 6.0) / math.sqrt(v4)) < 1e-6)
  }
}
