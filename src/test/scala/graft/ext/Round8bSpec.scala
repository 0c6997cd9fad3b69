package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-8 operator batch: two-phase (large-star/small-star) connected
  * components, BH-corrected sign tests, CUSUM change points, ROUGE,
  * macro token F1, Krippendorff's alpha, and the Brier score — each
  * pinned against an independent scalar re-derivation (never the
  * operator's own formula).
  */
class Round8bSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- Graph.ccTwoPhase ----------------------------------------------------

  private def ccMap(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    Graph.ccTwoPhase(df).as[(Long, Long)].collect().toMap
  }

  /** Independent driver-side union-find (union-by-min). */
  private def ufMap(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("ccTwoPhase: pseudo-random graph matches union-find AND Dedup.components") {
    val edges = (0L until 400L).map { i =>
      (i, (i * 2654435761L) % 401L)
    }.filter { case (a, b) => a != b } ++
      Seq((1000L, 1001L), (1001L, 1002L), (2000L, 2000L)) // chain + self-loop
    assert(ccMap(edges) == ufMap(edges))
    val viaDedup = Dedup.components(
      edges.toDF("id_a", "id_b"))
      .select(col("id").cast("long"), col("cluster_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(ccMap(edges) == viaDedup)
  }

  test("ccTwoPhase: 2048-node path collapses to its minimum (deep-diameter case)") {
    // diameter 2047 — the regime where per-hop propagation needs 2047
    // shuffle rounds and star contraction needs ~log n
    val path = (0L until 2047L).map(i => (i, i + 1))
    val got = ccMap(path)
    assert(got.size == 2048 && got.values.forall(_ == 0L))
  }

  test("ccTwoPhase: disjoint cliques keep distinct minimum labels") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(7, 8, 9)) ++ clique(Seq(100, 101)) ++
      clique(Seq(55, 66, 77, 88))
    val got = ccMap(edges)
    assert(got(7) == 7 && got(8) == 7 && got(9) == 7)
    assert(got(100) == 100 && got(101) == 100)
    assert(Seq(55L, 66L, 77L, 88L).forall(got(_) == 55L))
  }

  // ---- Analytics.signTestBH ------------------------------------------------

  /** Exact BigInt binomial two-sided sign-test p-value, rounded at 6. */
  private def signP(n: Int, k: Int): Double = {
    if (n == 0) return 1.0
    def c(j: Int) = (1 to j).foldLeft(BigInt(1))((a, i) => a * (n - i + 1) / i)
    val lo = (0 to k).map(c).sum
    val hi = (k to n).map(c).sum
    val p = 2.0 * (lo min hi).toDouble / BigInt(2).pow(n).toDouble
    BigDecimal(math.min(1.0, p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
  }

  /** Events with EXACT daily counts per slice: `counts(slice)(d)` rows on
    * day d.
    */
  private def eventsFor(counts: Map[String, Seq[Int]]) = {
    val rows = for {
      (sl, cs) <- counts.toSeq
      (c, d)   <- cs.zipWithIndex
      _        <- 0 until c
    } yield (sl, Timestamp.valueOf(f"2024-02-${d + 1}%02d 12:00:00"))
    rows.toDF("slice", "ts")
  }

  test("signTestBH: p-values match the exact BigInt binomial tails") {
    val counts = Map(
      "up"   -> Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12), // k=n=11
      "alt"  -> Seq(5, 6, 5, 6, 5, 6, 5, 6, 5, 6, 5, 6),    // k=6 of 11
      "flat" -> Seq(4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4))    // n=0
    val got = Analytics.signTestBH(eventsFor(counts), Seq("slice"), "ts")
      .select(col("slice"), col("n_moves"), col("k_up"), col("p_value"),
        col("rejected"))
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("up")._2 == 11 && got("up")._3 == 11)
    assert(got("up")._4 == signP(11, 11))
    assert(got("alt")._4 == signP(11, 6))
    assert(got("flat")._2 == 0 && got("flat")._4 == 1.0)
    // BH at q=.05, m=3: only the monotone slice's p (2/2048 ≈ .000977)
    // clears its threshold (.016667); the alternator (p=1) does not
    assert(got("up")._5 && !got("alt")._5 && !got("flat")._5)
  }

  test("signTestBH: BH step-up rejects through a non-monotone threshold crossing") {
    // craft p-values via k/n so that p_(1) > q/m but p_(2) <= 2q/m —
    // step-up must then reject BOTH (the case plain per-rank thresholding
    // gets wrong)
    val counts = Map(
      "a" -> Seq(1, 2, 3, 4, 5, 6, 7),          // n=6,k=6: p=2/64=.03125
      "b" -> Seq(1, 2, 3, 4, 5, 6, 8))          // same: p=.03125
    val got = Analytics.signTestBH(eventsFor(counts), Seq("slice"), "ts",
        q = 0.05)
      .select(col("slice"), col("p_value"), col("rank"), col("rejected"))
      .as[(String, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // m=2: thresholds .025, .05 — rank 1 (.03125 > .025) fails alone,
    // rank 2 (.03125 <= .05) pulls both in
    assert(got("a")._2 == 0.03125 && got("b")._2 == 0.03125)
    assert(got("a")._4 && got("b")._4)
  }

  // ---- Analytics.changepointCusum -----------------------------------------

  test("changepointCusum: level shift lands on the last pre-shift day, exact score") {
    val got = Analytics.changepointCusum(
      eventsFor(Map("s" -> Seq(10, 10, 10, 20, 20, 20))), Seq("slice"), "ts")
      .select(col("slice"), col("cp_day").cast("string"), col("n_days"),
        col("score"))
      .as[(String, String, Long, Double)].collect().head
    // C_t = 6*pre - t*90 → |C| max 90 at t=3; score 90/6 = 15
    assert(got._2 == "2024-02-03 00:00:00" && got._3 == 6L && got._4 == 15.0)
  }

  test("changepointCusum: |CUSUM| ties break to the earliest day") {
    val got = Analytics.changepointCusum(
      eventsFor(Map("s" -> Seq(10, 20, 10, 20))), Seq("slice"), "ts")
      .select(col("cp_day").cast("string")).as[String].collect().head
    // |C| = 20 at t=1 and t=3 → earliest wins
    assert(got == "2024-02-01 00:00:00")
  }

  // ---- Eval.corpusRouge ----------------------------------------------------

  test("corpusRouge: hand-computed single doc (pure deletion ⇒ precision 1)") {
    val docs = Seq((1L, "a b c d e")).toDF("id", "text")
    val r = Eval.corpusRouge(docs, "id", "text", dropEvery = 5).collect().head
    // cand = a b c d: unigrams 4/4 vs ref 5; bigrams 3/3 vs ref 4
    assert(r.getAs[Long]("match1") == 4 && r.getAs[Long]("ctotal1") == 4
      && r.getAs[Long]("rtotal1") == 5)
    assert(r.getAs[Double]("rouge1_p") == 1.0)
    assert(r.getAs[Double]("rouge1_r") == 0.8)
    assert(r.getAs[Double]("rouge1_f") == math.rint(2.0 * 4 / 9 * 1e6) / 1e6)
    assert(r.getAs[Double]("rouge2_p") == 1.0)
    assert(r.getAs[Double]("rouge2_r") == 0.75)
    assert(r.getAs[Double]("rouge2_f") == math.rint(2.0 * 3 / 7 * 1e6) / 1e6)
  }

  test("corpusRouge: repeated tokens are clipped per document") {
    // ref has 'x' ×3; a candidate from ANOTHER doc may not borrow them —
    // and within the doc the drop removes one 'x', so match1 counts 2
    val docs = Seq((1L, "x x y z x")).toDF("id", "text")
    val r = Eval.corpusRouge(docs, "id", "text", dropEvery = 5).collect().head
    assert(r.getAs[Long]("match1") == 4 && r.getAs[Long]("rtotal1") == 5)
  }

  // ---- Eval.tokenF1Macro ---------------------------------------------------

  test("tokenF1Macro: hand-computed per-doc F1, lowercase normalization") {
    val docs = Seq(
      (1L, "s1", "A b c D"),   // cand = a b c (drop 4th): o=3, cl=3, rl=4
      (2L, "s1", "e f"),       // cand = e f (nothing dropped): o=2, f1=1
      (3L, "s2", "g h i j"))   // o=3 of cl=3, rl=4
      .toDF("doc_id", "source", "text")
    val got = Eval.tokenF1Macro(docs, "source", "doc_id", "text", dropEvery = 4)
      .select(col("source"), col("n_docs"), col("macro_f1"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val f134 = math.rint(2.0 * 3 / 7 * 1e6) / 1e6 // 0.857143
    assert(got("s1")._2 == 2)
    assert(got("s1")._3 == math.rint((f134 + 1.0) / 2 * 1e6) / 1e6)
    assert(got("s2")._3 == f134)
  }

  // ---- Eval.krippendorffAlpha ---------------------------------------------

  /** Independent re-derivation from the coincidence matrix (the textbook
    * route: D_o from per-unit pair counts, D_e from marginals), never the
    * operator's closed form.
    */
  private def alphaRef(units: Seq[Seq[Boolean]]): Option[Double] = {
    val m = units.head.size
    val n = units.size
    val nt = n.toLong * m
    val n1 = units.map(_.count(identity).toLong).sum
    val n0 = nt - n1
    if (n1 == 0 || n0 == 0) return None
    // coincidence off-diagonal mass: Σ_u 2·o1·o0/(m−1); D_o over nt,
    // D_e over nt(nt−1) pairs of the marginals
    val off = units.map { u =>
      val o1 = u.count(identity).toLong
      2.0 * o1 * (m - o1) / (m - 1)
    }.sum
    val dO = off / nt
    val dE = 2.0 * n1 * n0 / (nt.toDouble * (nt - 1))
    Some(BigDecimal(1.0 - dO / dE)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("krippendorffAlpha: matches the coincidence-matrix derivation on random raters") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      val sl = s"s${i % 3}"
      (sl, rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean())
    }
    val df = rows.toDF("slice", "r1", "r2", "r3")
    val got = Eval.krippendorffAlpha(df, "slice",
        Seq(col("r1"), col("r2"), col("r3")))
      .select(col("slice"), col("alpha"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    rows.groupBy(_._1).foreach { case (sl, rs) =>
      val ref = alphaRef(rs.map(r => Seq(r._2, r._3, r._4)))
      (got(sl), ref) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) <= 1e-6, s"slice $sl")
        case (a, b)             => assert(a == b, s"slice $sl")
      }
    }
  }

  test("krippendorffAlpha: the textbook two-rater cases") {
    // systematic disagreement on a balanced pair of units → α = −0.5;
    // all ratings identical → undefined (NULL), not 1.0
    val df = Seq(("d", true, false), ("d", true, false),
      ("u", true, true), ("u", true, true)).toDF("slice", "r1", "r2")
    val got = Eval.krippendorffAlpha(df, "slice", Seq(col("r1"), col("r2")))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(r.fieldIndex("alpha"))) None
         else Some(r.getDouble(r.fieldIndex("alpha"))))).toMap
    assert(got("d").contains(-0.5))
    assert(got("u").isEmpty)
  }

  // ---- Eval.brierScore -----------------------------------------------------

  test("brierScore: hand-computed, null rows excluded") {
    val df = Seq(
      ("s", Some(0.8), Some(true)),
      ("s", Some(0.5), Some(false)),
      ("s", Some(0.0), Some(false)),
      ("s", None, Some(true)),        // null score: excluded
      ("s", Some(0.9), None))         // null label: excluded
      .toDF("slice", "score", "y")
    val got = Eval.brierScore(df, "slice", "score", col("y"))
      .select(col("n"), col("brier")).as[(Long, Double)].collect().head
    // (0.04 + 0.25 + 0) / 3 = 0.096667
    assert(got._1 == 3L && got._2 == 0.096667)
  }
}
