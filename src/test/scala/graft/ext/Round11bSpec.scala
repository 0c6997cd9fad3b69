package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-11 batch 2: Leiden connectivity refinement (every community
  * must be a CONNECTED subgraph and quality must not drop), URL
  * canonicalization dedup, Gwet AC1 (must stay calibrated where kappa's
  * prevalence paradox bites), minimum detectable effect, and
  * split-conformal thresholds (exact finite-sample order statistic,
  * null when the guarantee is unsatisfiable).
  */
class Round11bSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // ---- Graph.leiden --------------------------------------------------------

  private def modS(edges: DataFrame, labels: DataFrame): Double =
    Graph.modularity(edges, labels)
      .agg(sum(col("q_term"))).head().getDouble(0)

  /** Ring of 8 K5 cliques plus sparse chords — the louvain fixture. */
  private def ringOfCliques: DataFrame = {
    val cliques = for {
      c <- 0 until 8
      i <- 0 until 5; j <- 0 until 5 if i < j
    } yield ((c * 100 + i).toLong, (c * 100 + j).toLong)
    val ring = (0 until 8).map(c =>
      (math.min(c * 100, ((c + 1) % 8) * 100).toLong,
        math.max(c * 100, ((c + 1) % 8) * 100).toLong))
    (cliques ++ ring).toDF("a", "b")
  }

  private def checkLeidenInvariants(edges: DataFrame): Unit = {
    // ONE louvain + ONE leiden run; every invariant (and both modularity
    // scores) is evaluated on the collected label maps
    val lv = Graph.louvain(edges).as[(Long, Long)].collect().toMap
    val ld = Graph.leiden(edges).as[(Long, Long)].collect().toMap
    assert(ld.keySet == lv.keySet, "leiden must label every node")
    // refinement: each leiden community sits inside ONE louvain community
    ld.groupBy(_._2).foreach { case (c, nodes) =>
      val parents = nodes.keySet.map(lv)
      assert(parents.size == 1,
        s"leiden community $c spans louvain communities $parents")
    }
    // connectivity: every leiden community is connected over intra edges
    val es = edges.as[(Long, Long)].collect()
    ld.groupBy(_._2).foreach { case (c, nodes) =>
      val ns = nodes.keySet
      val adj = es.filter(e => ns(e._1) && ns(e._2))
        .flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      val seen = scala.collection.mutable.Set(ns.head)
      val queue = scala.collection.mutable.Queue(ns.head)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        adj.getOrElse(u, Set.empty).foreach { v =>
          if (!seen(v)) { seen += v; queue += v }
        }
      }
      assert(seen == ns, s"leiden community $c is disconnected: " +
        s"reached ${seen.size} of ${ns.size}")
    }
    // quality: splitting into components never decreases modularity
    val lvDf = lv.toSeq.toDF("node", "community")
    val ldDf = ld.toSeq.toDF("node", "community")
    assert(modS(edges, ldDf) >= modS(edges, lvDf) - 1e-9,
      "Q(leiden) must be >= Q(louvain)")
  }

  test("leiden: ring of cliques — connected refinement, Q preserved") {
    checkLeidenInvariants(ringOfCliques)
  }

  test("leiden: 5 seeded random graphs keep every community connected") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val n = 20 + rnd.nextInt(30)
      val edges = (for (_ <- 1 to n * 2) yield {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }).filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) checkLeidenInvariants(edges.toDF("a", "b"))
    }
  }

  // ---- Dedup.canonicalUrl / byUrl -----------------------------------------

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Dedup.canonicalUrl(col("u"))).head().getString(0)

  test("canonicalUrl: fragment, case, default port, trailing slash, tracking params, param order") {
    assert(canon("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#frag")
      == "https://www.ex.com/a/b?a=1&b=2")
    assert(canon("http://Host.com:80/Path") == "http://host.com/Path")
    assert(canon("https://h.com/?ref=1&fbclid=z&gclid=q&mc_cid=7")
      == "https://h.com")
    assert(canon("https://h.com/p?z=1&y=2&utm_campaign=c")
      == "https://h.com/p?y=2&z=1")
    // path case preserved; non-default port preserved; refresh param kept
    assert(canon("https://H.com:8080/CaseSensitive?refresh=1")
      == "https://h.com:8080/CaseSensitive?refresh=1")
  }

  test("byUrl groups all spelling variants of one page") {
    val urls = Seq(
      (1L, "https://ex.com/a?x=1&utm_source=s"),
      (2L, "HTTPS://EX.COM/a/?x=1"),
      (3L, "https://ex.com:443/a?x=1#top"),
      (4L, "https://ex.com/b?x=1"))
    val got = Dedup.byUrl(urls.toDF("id", "url"), "id", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList.sortBy(_._1)
    assert(got == List(
      ("https://ex.com/a?x=1", 1L, 3L, 3L),
      ("https://ex.com/b?x=1", 4L, 1L, 1L)), got.toString)
  }

  // ---- Eval.gwetAc1 --------------------------------------------------------

  /** Build n rows of (slice, a, b) from confusion cell counts. */
  private def raterDf(yy: Int, yn: Int, ny: Int, nn: Int): DataFrame =
    (Seq.fill(yy)((true, true)) ++ Seq.fill(yn)((true, false)) ++
      Seq.fill(ny)((false, true)) ++ Seq.fill(nn)((false, false)))
      .map { case (a, b) => ("s", a, b) }.toDF("slice", "a", "b")

  test("gwetAc1: hand-checked 2x2 value") {
    val r = Eval.gwetAc1(raterDf(40, 5, 5, 50), "slice",
      col("a"), col("b")).head()
    assert(r.getAs[Long]("n") == 100 && r.getAs[Long]("yy") == 40)
    val po = 0.90; val pi = 0.45; val pe = 2 * pi * (1 - pi)
    val want = math.rint((po - pe) / (1 - pe) * 1e6) / 1e6
    assert(math.abs(r.getAs[Double]("ac1") - want) < 1e-9)
  }

  test("gwetAc1 stays calibrated where kappa's prevalence paradox bites") {
    // near-unanimous raters: 95 yes-yes, 1 no-no, 4 discordant
    val df = raterDf(95, 2, 2, 1)
    val r = Eval.gwetAc1(df, "slice", col("a"), col("b")).head()
    val ac1 = r.getAs[Double]("ac1")
    // cohen kappa on the same table collapses to ~0.31
    val po = 0.96; val peK = 0.97 * 0.97 + 0.03 * 0.03
    val kappa = (po - peK) / (1 - peK)
    assert(kappa < 0.4, s"fixture must exhibit the paradox, kappa=$kappa")
    assert(ac1 > 0.9, s"AC1 must stay high on near-unanimous raters: $ac1")
  }

  // ---- Analytics.minDetectableEffect --------------------------------------

  /** n rows per cohort with k successes, single group. */
  private def abDf(na: Int, ka: Int, nb: Int, kb: Int): DataFrame =
    ((1 to na).map(i => ("g", true, i <= ka)) ++
      (1 to nb).map(i => ("g", false, i <= kb)))
      .toDF("grp", "in_a", "succ")

  test("minDetectableEffect: hand-checked value and n-monotonicity") {
    val r = Analytics.minDetectableEffect(abDf(1000, 100, 1000, 120),
      "grp", col("succ"), col("in_a")).head()
    val pp = 220.0 / 2000.0
    val want = math.rint((1.959964 + 0.841621) *
      math.sqrt(pp * (1 - pp) * (1.0 / 1000 + 1.0 / 1000)) * 1e6) / 1e6
    assert(math.abs(r.getAs[Double]("mde_abs") - want) < 1e-9)
    assert(r.getAs[Long]("n_a") == 1000 && r.getAs[Long]("k_b") == 120)
    // 4x the sample at the same rates halves the MDE
    val r4 = Analytics.minDetectableEffect(abDf(4000, 400, 4000, 480),
      "grp", col("succ"), col("in_a")).head()
    assert(math.abs(r4.getAs[Double]("mde_abs") * 2 -
      r.getAs[Double]("mde_abs")) < 1e-5)
  }

  test("minDetectableEffect drops degenerate pooled rates") {
    assert(Analytics.minDetectableEffect(abDf(10, 0, 10, 0), "grp",
      col("succ"), col("in_a")).count() == 0)
    assert(Analytics.minDetectableEffect(abDf(10, 10, 10, 10), "grp",
      col("succ"), col("in_a")).count() == 0)
  }

  // ---- Eval.conformalThreshold ---------------------------------------------

  test("conformalThreshold: exact k-th order statistic and coverage") {
    // slice a: 10 calibration scores 1..10, alpha=0.1 ->
    // k = ceil(11 * 0.9) = 10 -> qhat = 10; test scores 5, 12 -> 1/2
    val rows =
      (1 to 10).map(s => ("a", s.toLong, true)) ++
        Seq(("a", 5L, false), ("a", 12L, false)) ++
        // slice b: 5 calibration scores, k = ceil(6 * .9) = 6 > 5 -> null
        (1 to 5).map(s => ("b", s.toLong, true)) :+ ("b", 3L, false)
    val out = Eval.conformalThreshold(rows.toDF("slice", "s", "cal"),
      "slice", col("s"), col("cal"), alpha = 0.1)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_cal") == 10 && a.getAs[Long]("k") == 10)
    assert(a.getAs[Long]("qhat") == 10L)
    assert(a.getAs[Long]("n_test") == 2 && a.getAs[Long]("n_covered") == 1)
    assert(math.abs(a.getAs[Double]("coverage") - 0.5) < 1e-9)
    val b = out("b")
    assert(b.getAs[Long]("n_cal") == 5 && b.getAs[Long]("k") == 6)
    assert(b.isNullAt(b.fieldIndex("qhat")) &&
      b.isNullAt(b.fieldIndex("coverage")))
  }

  test("conformalThreshold: duplicate scores and alpha=0.5 rank math") {
    // 4 cal scores {2,2,5,9}, alpha=0.5 -> k = ceil(5 * .5) = 3 ->
    // cum at 2 is 2, at 5 is 3 -> qhat = 5
    val rows = Seq(("a", 2L, true), ("a", 2L, true), ("a", 5L, true),
      ("a", 9L, true), ("a", 6L, false), ("a", 4L, false))
    val r = Eval.conformalThreshold(rows.toDF("slice", "s", "cal"),
      "slice", col("s"), col("cal"), alpha = 0.5).head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("qhat") == 5L)
    assert(r.getAs[Long]("n_covered") == 1)
  }

  // ---- Analytics.sprt ------------------------------------------------------

  private def sprtDf(bits: Seq[Int]): DataFrame =
    bits.zipWithIndex.map { case (b, i) =>
      ("g", i.toLong, i.toLong, b == 1) }.toDF("grp", "t", "id", "s")

  test("sprt: first-crossing step and verdict on hand trajectories") {
    // p0=0.2, p1=0.8: c = ln(4) = 1.3863; upper = ln(19) = 2.9444.
    // all successes -> LLR(n) = 1.3863 n crosses at n = 3
    val up = Analytics.sprt(sprtDf(Seq.fill(6)(1)), "grp", col("s"),
      "t", "id", p0 = 0.2, p1 = 0.8).head()
    assert(up.getAs[Long]("n_decision") == 3L &&
      up.getAs[String]("decision") == "accept_h1")
    // all failures -> accept_h0 at n = 3 (symmetric design)
    val dn = Analytics.sprt(sprtDf(Seq.fill(6)(0)), "grp", col("s"),
      "t", "id", p0 = 0.2, p1 = 0.8).head()
    assert(dn.getAs[Long]("n_decision") == 3L &&
      dn.getAs[String]("decision") == "accept_h0")
    // alternating -> LLR oscillates between 0 and 1.3863: never crosses
    val alt = Analytics.sprt(sprtDf(Seq.tabulate(20)(_ % 2)), "grp",
      col("s"), "t", "id", p0 = 0.2, p1 = 0.8).head()
    assert(alt.getAs[String]("decision") == "continue" &&
      alt.isNullAt(alt.fieldIndex("n_decision")))
    assert(alt.getAs[Long]("n_total") == 20 && alt.getAs[Long]("k_total") == 10)
  }

  test("sprt: decision is the FIRST crossing even when the walk returns") {
    // 3 successes (cross up at 3), then 10 failures (walk far down):
    // the verdict must be the n=3 accept_h1, not the endpoint
    val r = Analytics.sprt(sprtDf(Seq.fill(3)(1) ++ Seq.fill(10)(0)),
      "grp", col("s"), "t", "id", p0 = 0.2, p1 = 0.8).head()
    assert(r.getAs[Long]("n_decision") == 3L &&
      r.getAs[String]("decision") == "accept_h1")
    assert(r.getAs[Double]("llr_final") < 0)
  }

  // ---- Analytics.cuped -----------------------------------------------------

  test("cuped: a metric fully explained by its covariate adjusts to zero") {
    // y = 2x exactly: theta = 2, the adjusted diff collapses to 0, and
    // the variance reduction is total (rho^2 = 1) — every equality is
    // EXACT in IEEE arithmetic (scaling by 2 commutes with +,-,/)
    val rows = (1 to 40).map(i => ("g", i.toDouble, 2.0 * i, i % 2 == 0))
    val r = Analytics.cuped(rows.toDF("grp", "x", "y", "in_a"),
      "grp", "x", "y", col("in_a")).head()
    assert(r.getAs[Long]("n_a") == 20 && r.getAs[Long]("n_b") == 20)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("diff_cuped") == 0.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
    // even i mean = 21, odd i mean = 20 -> raw diff = 2(21 - 20)
    assert(r.getAs[Double]("diff_raw") == 2.0)
  }

  test("cuped: degenerate covariate or metric drops the group") {
    val constX = (1 to 10).map(i => ("g", 5.0, i.toDouble, i % 2 == 0))
    assert(Analytics.cuped(constX.toDF("grp", "x", "y", "in_a"),
      "grp", "x", "y", col("in_a")).count() == 0)
    val constY = (1 to 10).map(i => ("g", i.toDouble, 5.0, i % 2 == 0))
    assert(Analytics.cuped(constY.toDF("grp", "x", "y", "in_a"),
      "grp", "x", "y", col("in_a")).count() == 0)
  }

  test("cuped: an uninformative covariate leaves the raw diff almost unchanged") {
    // x alternates independently of y's cohort shift: theta stays small
    // and diff_cuped stays within noise of diff_raw
    val rows = (1 to 200).map { i =>
      val inA = i % 2 == 0
      ("g", (i % 7).toDouble, (if (inA) 10.0 else 0.0) + (i % 5),
        inA)
    }
    val r = Analytics.cuped(rows.toDF("grp", "x", "y", "in_a"),
      "grp", "x", "y", col("in_a")).head()
    assert(math.abs(r.getAs[Double]("diff_raw") - 10.0) < 1.0)
    assert(math.abs(r.getAs[Double]("diff_cuped") -
      r.getAs[Double]("diff_raw")) < 1.0)
    assert(r.getAs[Double]("var_reduction") < 0.2)
  }

  // ---- Analytics.diffInDiff ------------------------------------------------

  test("diffInDiff: hand-checked cells — shared trend nets out") {
    // control: 10 -> 13 (+3 trend); treated: 20 -> 26 (+3 trend, +3
    // effect) -> DiD = +3
    val rows = Seq(
      ("g", 20.0, true, false), ("g", 20.0, true, false),
      ("g", 26.0, true, true), ("g", 26.0, true, true),
      ("g", 10.0, false, false), ("g", 10.0, false, false),
      ("g", 13.0, false, true), ("g", 13.0, false, true))
    val r = Analytics.diffInDiff(rows.toDF("grp", "v", "t", "p"),
      "grp", "v", col("t"), col("p")).head()
    assert(r.getAs[Double]("did") == 3.0)
    assert(r.getAs[Double]("mean_treat_post") == 26.0)
    assert(r.getAs[Long]("n_ctrl_pre") == 2)
  }

  test("diffInDiff: an empty cell drops the group (undefined, not zero)") {
    val rows = Seq(("g", 1.0, true, true), ("g", 2.0, true, false),
      ("g", 3.0, false, true)) // no control-pre cell
    assert(Analytics.diffInDiff(rows.toDF("grp", "v", "t", "p"),
      "grp", "v", col("t"), col("p")).count() == 0)
  }

  // ---- Vocab.bpeFertility --------------------------------------------------

  test("bpeFertility: exact counts under a known merge chain") {
    // merges: (a,b) then (ab,c): "abc" -> 1 piece, "abd" -> 2 ("ab","d"),
    // "xyz" -> 3 pieces
    val docs = Seq(
      ("en", "abc abc abd"), ("en", "abc"),
      ("de", "xyz abd")).toDF("lang", "text")
    val got = Vocab.bpeFertility(docs, "text", "lang",
      Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_chars"), r.getAs[Long]("n_types"),
          r.getAs[Double]("fertility"))).toMap
    // en: words 4 (abc x3, abd), tokens 3*1 + 2 = 5, chars 12, types 2
    assert(got("en") == ((4L, 5L, 12L, 2L, 1.25)), got.toString)
    // de: xyz -> 3 pieces, abd -> 2; words 2, tokens 5, chars 6, types 2
    assert(got("de") == ((2L, 5L, 6L, 2L, 2.5)), got.toString)
  }

  test("bpeFertility bounds: 1 <= fertility <= chars per word") {
    val docs = Seq(("en", "aa bb aa cc dd"), ("fr", "aaa bbb ab"))
      .toDF("lang", "text")
    Vocab.bpeFertility(docs, "text", "lang", Seq(("a", "a"), ("b", "b")))
      .collect().foreach { r =>
        val f = r.getAs[Double]("fertility")
        val cpw = r.getAs[Long]("n_chars").toDouble / r.getAs[Long]("n_words")
        assert(f >= 1.0 && f <= cpw + 1e-9, r.toString)
      }
  }

  // ---- Graph.maxSpanningForest ---------------------------------------------

  /** Reference Kruskal under the SAME total order (w desc, a asc,
    * b asc) — the unique maximum spanning forest of the perturbed
    * weights.
    */
  private def kruskal(edges: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for (e <- edges.sortBy { case (a, b, w) => (-w, a, b) }) {
      val (ra, rb) = (find(e._1), find(e._2))
      if (ra != rb) { parent(ra) = rb; out += e }
    }
    out.toSet
  }

  test("maxSpanningForest == Kruskal on 8 seeded random weighted graphs") {
    val rnd = new scala.util.Random(37)
    for (_ <- 1 to 8) {
      val n = 15 + rnd.nextInt(25)
      val edges = (for (_ <- 1 to n * 3) yield {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }).filter(e => e._1 != e._2).distinct
        .map { case (a, b) => (a, b, (rnd.nextInt(50) + 1).toLong) }
      if (edges.nonEmpty) {
        val got = Graph.maxSpanningForest(edges.toDF("a", "b", "w"))
          .as[(Long, Long, Long)].collect().toSet
        assert(got == kruskal(edges), s"n=$n edges=${edges.size}")
      }
    }
  }

  test("maxSpanningForest: spanning, acyclic, and strongest-bridge on a hand graph") {
    // two triangles bridged by two candidate edges; the heavier bridge
    // (w=9) must be kept, the lighter (w=1) dropped, and within each
    // triangle the lightest edge is dropped
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 4L), (1L, 3L, 3L),
      (10L, 11L, 7L), (11L, 12L, 6L), (10L, 12L, 2L),
      (3L, 10L, 9L), (1L, 12L, 1L))
    val got = Graph.maxSpanningForest(edges.toDF("a", "b", "w"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 5L), (2L, 3L, 4L), (10L, 11L, 7L),
      (11L, 12L, 6L), (3L, 10L, 9L)), got.toString)
    // spanning forest size = n - components = 6 - 1
    assert(got.size == 5)
  }

  // ---- Analytics.sampleRatioMismatch --------------------------------------

  test("sampleRatioMismatch: exact chi2 and both verdicts") {
    // balanced 50/50 -> chi2 0, no mismatch; 75/25 under a 50/50
    // design -> chi2 = 25 + 25/... = (75-50)^2/50 * 2 = 25 -> mismatch
    val rows = (1 to 100).map(i => ("ok", i % 2 == 0)) ++
      (1 to 100).map(i => ("bad", i % 4 == 0))
    val got = Analytics.sampleRatioMismatch(rows.toDF("grp", "in_a"),
      "grp", col("in_a"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ok = got("ok")
    assert(ok.getAs[Double]("chi2") == 0.0 && !ok.getAs[Boolean]("mismatch"))
    val bad = got("bad")
    assert(bad.getAs[Long]("n_a") == 25 && bad.getAs[Double]("chi2") == 25.0)
    assert(bad.getAs[Boolean]("mismatch"))
  }

  test("sampleRatioMismatch honors a non-even design ratio") {
    // 25/75 under a designed 25% A-share is NOT a mismatch
    val rows = (1 to 100).map(i => ("g", i % 4 == 0))
    val r = Analytics.sampleRatioMismatch(rows.toDF("grp", "in_a"),
      "grp", col("in_a"), expectedA = 0.25).head()
    assert(r.getAs[Double]("chi2") == 0.0 && !r.getAs[Boolean]("mismatch"))
  }

  // ---- Dedup.componentsIncremental ----------------------------------------

  test("componentsIncremental ≡ full recompute on 10 seeded random splits") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 10) {
      val n = 30 + rnd.nextInt(40)
      val all = (for (_ <- 1 to n * 2) yield {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }).filter(e => e._1 != e._2).distinct
      val (base, delta) = all.partition(e => (e._1 + e._2) % 3 != 0)
      if (base.nonEmpty && delta.nonEmpty) {
        val old = Dedup.components(base.toDF("id_a", "id_b"))
        val inc = Dedup.componentsIncremental(old,
          delta.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        val full = Dedup.components(all.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(inc == full, s"incremental != full: ${inc.toSeq.sorted} " +
          s"vs ${full.toSeq.sorted}")
      }
    }
  }

  test("componentsIncremental keeps old singletons and merges across the delta") {
    // old partition: {1,2} labeled 1, {5} singleton; delta bridges 2-5
    // and introduces the fresh pair 8-9
    val old = Seq((1L, 1L), (2L, 1L), (5L, 5L)).toDF("id", "cluster_id")
    val delta = Seq((2L, 5L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.componentsIncremental(old, delta)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 8L -> 8L, 9L -> 8L),
      got.toString)
  }

  test("conformalThreshold: marginal coverage >= 1 - alpha on exchangeable data") {
    // deterministic pseudo-random scores (mix64 of an index) split by
    // index parity — exchangeable by construction, so the conformal
    // guarantee must hold up to the +1/(n+1) discretization
    val n = 2000
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)) & 0xFFFFFFL
    }
    val rows = (1 to n).map(i => ("g", mix(i.toLong), i % 2 == 0))
    val r = Eval.conformalThreshold(rows.toDF("slice", "s", "cal"),
      "slice", col("s"), col("cal"), alpha = 0.1).head()
    assert(r.getAs[Double]("coverage") >= 0.88,
      s"coverage ${r.getAs[Double]("coverage")} below the conformal bound")
  }
}
