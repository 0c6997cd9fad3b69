package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-6 operators: PII detect/redact, per-slice classifier evals
  * (confusion / AUC / calibration), the ordered filter funnel,
  * curriculum buckets, and Markov transitions.
  */
class Round6Spec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- Pii ----------------------------------------------------------------

  test("pii: detect counts each category exactly, null text counts zero") {
    val docs = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or root@sub.domain.io today"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up, call +4915123456789"),
      (3L, "card 4111222233334444 expires soon"),
      (4L, "nothing sensitive here"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Pii.detect(docs, "doc_id", "text")
      .select("doc_id", "n_email", "n_ipv4", "n_phone", "n_id_number", "n_pii")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, 0L, 0L, 0L, 2L)))
    // categories count independently on the raw text: the 13-digit phone
    // run is also a \b-delimited id-number match (documented behavior)
    assert(got(1) == ((2L, 0L, 2L, 1L, 1L, 4L)))
    assert(got(2) == ((3L, 0L, 0L, 0L, 1L, 1L)))
    assert(got(3) == ((4L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(4) == ((5L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("pii: redact replaces every match with its placeholder, in order") {
    val docs = Seq(
      (1L, "write x@y.com or 1.2.3.4 or +12345678 or 123456789012 end"))
      .toDF("doc_id", "text")
    val got = Pii.redact(docs, "doc_id", "text")
      .as[(Long, String, Long)].head()
    assert(got._2 == "write <EMAIL> or <IP> or <PHONE> or <ID> end")
    assert(got._3 == 4L)
  }

  test("pii: redact never double-counts a span two categories match") {
    // the 13-digit run is both a phone (+ prefix) and an id-number match;
    // redaction claims it for phone first, so n_redacted is 1, not 2
    val docs = Seq((1L, "call +4915123456789 now")).toDF("doc_id", "text")
    val got = Pii.redact(docs, "doc_id", "text").as[(Long, String, Long)].head()
    assert(got._2 == "call <PHONE> now")
    assert(got._3 == 1L)
  }

  test("pii: email claims its digits before the id-number pattern") {
    // the 12-digit run inside an email local part must NOT double-count
    val docs = Seq((1L, "acct 123456789012x@mail.example done"))
      .toDF("doc_id", "text")
    val got = Pii.detect(docs, "doc_id", "text")
      .select("n_email", "n_id_number").as[(Long, Long)].head()
    // detect counts on the raw text: the email regex matches the whole
    // token; the id regex finds no \b-delimited 12-digit run (the run is
    // followed by 'x', a word char, so the boundary fails)
    assert(got == ((1L, 0L)))
  }

  // ---- Eval.binaryConfusion ----------------------------------------------

  test("eval: confusion counts and derived metrics are exact") {
    // slice A: tp=2 fp=1 fn=1 tn=1; slice B: all negative, none predicted
    val rows = Seq(
      ("A", true, true), ("A", true, true), ("A", false, true),
      ("A", true, false), ("A", false, false),
      ("B", false, false), ("B", false, false))
    val df = rows.toDF("slice", "y", "p")
    val got = Eval.binaryConfusion(df, "slice", col("y"), col("p"))
      .select("slice", "tp", "fp", "fn", "tn", "accuracy", "precision",
        "recall", "f1")
      .as[(String, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(got(0) == (("A", 2L, 1L, 1L, 1L, 0.6, 2.0 / 3, 2.0 / 3, 2.0 / 3))
      || got(0) == (("A", 2L, 1L, 1L, 1L, 0.6, 0.666667, 0.666667, 0.666667)))
    // zero-denominator convention: no positives anywhere -> 0.0, not null
    assert(got(1) == (("B", 0L, 0L, 0L, 2L, 1.0, 0.0, 0.0, 0.0)))
  }

  // ---- Eval.aucBySlice ----------------------------------------------------

  test("eval: AUC is exact under ties and degenerate slices are null") {
    // slice S: scores pos={3,2}, neg={2,1} -> pairs: (3>2)=1, (3>1)=1,
    // (2~2)=0.5, (2>1)=1 => AUC = 3.5/4 = 0.875
    val df = Seq(
      ("S", 3.0, true), ("S", 2.0, true), ("S", 2.0, false), ("S", 1.0, false),
      ("T", 5.0, true), ("T", 9.0, true)).toDF("slice", "score", "y")
    val got = Eval.aucBySlice(df, "slice", "score", col("y"))
      .select("slice", "n_pos", "n_neg", "auc")
      .as[(String, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(got(0) == (("S", 2L, 2L, Some(0.875))))
    assert(got(1) == (("T", 2L, 0L, None))) // no negatives: undefined
  }

  test("eval: AUC hits 1.0 on perfect separation and 0.0 on inverted") {
    val perfect = Seq(("X", 10, true), ("X", 9, true), ("X", 1, false))
      .toDF("slice", "score", "y")
    val inverted = Seq(("X", 1, true), ("X", 9, false), ("X", 10, false))
      .toDF("slice", "score", "y")
    assert(Eval.aucBySlice(perfect, "slice", "score", col("y"))
      .select("auc").as[Double].head() == 1.0)
    assert(Eval.aucBySlice(inverted, "slice", "score", col("y"))
      .select("auc").as[Double].head() == 0.0)
  }

  // ---- Eval.calibrationBins ----------------------------------------------

  test("eval: calibration bins bucket scores and report exact fractions") {
    val df = Seq(
      (0.05, false), (0.08, false),          // bin 0: 0/2 positive
      (0.55, true), (0.58, false),           // bin 5: 1/2 positive
      (1.0, true))                           // score 1.0 clamps to bin 9
      .toDF("score", "y")
    val got = Eval.calibrationBins(df, "score", col("y"), nBins = 10)
      .select("bin", "n", "n_pos", "mean_score", "frac_pos")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 2L, 0L), (5L, 2L, 1L), (9L, 1L, 1L)))
    assert(got(0)._4 == 0.065 && got(0)._5 == 0.0)
    assert(got(1)._4 == 0.565 && got(1)._5 == 0.5)
    assert(got(2)._4 == 1.0 && got(2)._5 == 1.0)
  }

  // ---- DataOps.filterFunnel ----------------------------------------------

  test("funnel: rows are charged to the FIRST failing stage only") {
    val df = Seq(
      (1L, 10, 10),  // passes both
      (2L, -1, 10),  // fails stage 1 (and would fail 2 — charged to 1)
      (3L, 10, -1),  // fails stage 2
      (4L, -1, -1))  // fails stage 1
      .toDF("id", "a", "b")
    val got = DataOps.filterFunnel(df, Seq(
        ("a_pos", col("a") > 0), ("b_pos", col("b") > 0)))
      .select("stage", "stage_name", "n_in", "n_rejected", "n_out")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1, "a_pos", 4L, 2L, 2L)))
    assert(got(1) == ((2, "b_pos", 2L, 1L, 1L)))
  }

  test("funnel: a null predicate rejects at that stage") {
    val df = Seq((1L, Some(5)), (2L, None)).toDF("id", "v")
    val got = DataOps.filterFunnel(df, Seq(("v_big", col("v") > 1)))
      .select("n_in", "n_rejected", "n_out").as[(Long, Long, Long)].head()
    assert(got == ((2L, 1L, 1L)))
  }

  // ---- DataOps.validateContract -------------------------------------------

  test("contract: rules are independent — one row can violate several") {
    val df = Seq((1L, 5), (2L, -1), (-3L, -2)).toDF("id", "v")
    val got = DataOps.validateContract(df, Seq(
        ("id_pos", col("id") > 0), ("v_pos", col("v") > 0)))
      .select("rule", "n_rows", "n_violations")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // row 3 violates BOTH rules (unlike the funnel's first-fail charge)
    assert(got.toSeq == Seq(("id_pos", 3L, 1L), ("v_pos", 3L, 2L)))
  }

  test("contract: a null verdict is a violation, not a pass") {
    val df = Seq(Some(1), None).toDF("v")
    val got = DataOps.validateContract(df, Seq(("v_pos", col("v") > 0)))
      .select("n_violations").as[Long].head()
    assert(got == 1L)
  }

  // ---- DataOps.curriculumBuckets ------------------------------------------

  test("curriculum: ntile buckets are balanced per group, order pinned") {
    val df = (1 to 10).map(i => ("g", i.toLong)).toDF("src", "v")
    val got = DataOps.curriculumBuckets(df, "src", Seq(col("v")), 4)
      .select("v", "bucket").as[(Long, Int)].collect().sortBy(_._1)
    // ntile(4) over 10 rows: buckets of 3,3,2,2 in order
    assert(got.map(_._2).toSeq == Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4))
  }

  // ---- Eval.multiclassMetrics ---------------------------------------------

  test("eval: multiclass per-class counts include classes never predicted") {
    // y=0 predicted {0,0,1}; y=1 predicted {0}; class 2 never appears as y
    val df = Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 0L), (2L, 2L))
      .toDF("y", "p")
    val got = Eval.multiclassMetrics(df, "y", "p")
      .select("clazz", "n_true", "tp", "n_pred", "precision", "recall", "f1")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(got(0) == ((0L, 3L, 2L, 3L, 0.666667, 0.666667, 0.666667)))
    assert(got(1) == ((1L, 1L, 0L, 1L, 0.0, 0.0, 0.0)))
    assert(got(2) == ((2L, 1L, 1L, 1L, 1.0, 1.0, 1.0)))
  }

  // ---- Eval.reciprocalRanks -----------------------------------------------

  test("eval: reciprocal rank takes the FIRST relevant hit within k") {
    val ranked = Seq(
      (1L, 1, false), (1L, 2, true), (1L, 3, true),  // first rel at 2
      (2L, 1, false), (2L, 2, false), (2L, 3, false), // no rel
      (3L, 1, true))                                  // rel at 1
      .toDF("query_id", "rank", "rel")
    val got = Eval.reciprocalRanks(ranked, "query_id", "rank", col("rel"), 3)
      .select("query_id", "first_rel_rank", "rr")
      .as[(Long, Option[Int], Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, Some(2), 0.5)))
    assert(got(1) == ((2L, None, 0.0)))
    assert(got(2) == ((3L, Some(1), 1.0)))
  }

  test("eval: a relevant hit beyond k does not count") {
    val ranked = Seq((1L, 4, true), (1L, 1, false)).toDF("query_id", "rank", "rel")
    val got = Eval.reciprocalRanks(ranked, "query_id", "rank", col("rel"), 3)
      .select("rr").as[Double].head()
    assert(got == 0.0)
  }

  // ---- Eval.averagePrecision ----------------------------------------------

  test("eval: average precision matches the hand-computed profile") {
    // query 1: rel at ranks 1 and 3 -> AP = (1/1 + 2/3) / 2 = 0.833334
    // (each precision@i is rounded at 6 BEFORE the mean — the replay rule)
    // query 2: no relevant -> AP = 0
    val ranked = Seq(
      (1L, 1, true), (1L, 2, false), (1L, 3, true),
      (2L, 1, false), (2L, 2, false)).toDF("query_id", "rank", "rel")
    val got = Eval.averagePrecision(ranked, "query_id", "rank",
        col("rel"), k = 10)
      .select("query_id", "n_rel", "ap")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val ap1 = BigDecimal((1.0 + BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, 2L, ap1)))
    assert(got(1) == ((2L, 0L, 0.0)))
  }

  test("eval: relevant docs pushed beyond k raise the MAP denominator") {
    // 3 relevant total, only rank-1 inside k=2 -> AP = 1.0 / min(3, 2)
    val ranked = Seq(
      (1L, 1, true), (1L, 2, false), (1L, 3, true), (1L, 4, true))
      .toDF("query_id", "rank", "rel")
    val got = Eval.averagePrecision(ranked, "query_id", "rank", col("rel"), k = 2)
      .select("query_id", "n_rel", "ap")
      .as[(Long, Long, Double)].head()
    assert(got == ((1L, 3L, 0.5)))
  }

  test("eval: queries with zero rows inside the top k still surface with rr/ap = 0") {
    // query 2's rows all sit beyond k -> it must appear with score 0,
    // not vanish from the output (slice means would silently exclude it)
    val ranked = Seq(
      (1L, 1, true),
      (2L, 5, true), (2L, 6, false)).toDF("query_id", "rank", "rel")
    val rr = Eval.reciprocalRanks(ranked, "query_id", "rank", col("rel"), 3)
      .select("query_id", "rr").as[(Long, Double)].collect().sortBy(_._1)
    assert(rr.toSeq == Seq((1L, 1.0), (2L, 0.0)))
    val ap = Eval.averagePrecision(ranked, "query_id", "rank", col("rel"), 3)
      .select("query_id", "ap").as[(Long, Double)].collect().sortBy(_._1)
    assert(ap.toSeq == Seq((1L, 1.0), (2L, 0.0)))
  }

  // ---- eval_bootstrap cross-check ------------------------------------------

  test("bootstrap replicas == in-memory mix64 resampling") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.EvalQueries.evalBootstrap(spark, dir)
      .select("replica", "n_drawn", "acc")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)].collect()
    val correct = docs.map(d => d._1 -> ((d._2 == "en") == (d._3 >= 300))).toMap
    val n = docs.length.toLong
    val expected = (0L until 200L).map { b =>
      val hits = (0L until n).count { i =>
        val id = b * n + i
        val pick = java.lang.Math.floorMod(Aggs.mix64(id), n)
        correct(pick)
      }
      b -> ((n, BigDecimal(hits.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    assert(got == expected)
  }

  // ---- Eval.regressionMetrics ---------------------------------------------

  test("eval: MAE/RMSE are exact on integer-valued errors") {
    // errors: +1, -3 -> MAE 2, RMSE sqrt(5)
    val df = Seq(("a", 5.0, Some(4.0)), ("a", 1.0, Some(4.0)),
      ("a", 9.0, Option.empty[Double])).toDF("slice", "y", "yhat")
    val got = Eval.regressionMetrics(df, "slice", "y", "yhat")
      .select("n", "mae", "rmse").as[(Long, Double, Double)].head()
    assert(got._1 == 2L)             // the null-yhat row is excluded
    assert(got._2 == 2.0)
    assert(got._3 == BigDecimal(math.sqrt(5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---- Analytics.welchT ---------------------------------------------------

  test("welch: t statistic matches the textbook value; degenerate groups drop") {
    // A = {1,2,3}, B = {7,9}: mA=2 vA=1, mB=8 vB=2
    // t = (2-8)/sqrt(1/3 + 2/2) = -6/sqrt(4/3)
    val df = Seq(
      ("g", 1.0, true), ("g", 2.0, true), ("g", 3.0, true),
      ("g", 7.0, false), ("g", 9.0, false),
      ("h", 5.0, true), ("h", 5.0, false))   // n<2 per cohort: dropped
      .toDF("grp", "v", "a")
    val got = Analytics.welchT(df.withColumn("__a", col("a")), "grp", "v",
        col("__a"))
      .select("grp", "n_a", "n_b", "t_welch")
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == 1)
    val expected = BigDecimal(-6.0 / math.sqrt(4.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == (("g", 3L, 2L, expected)))
  }

  test("welch: a zero-variance pair of cohorts is dropped, not NaN") {
    val df = Seq(("z", 4.0, true), ("z", 4.0, true),
      ("z", 4.0, false), ("z", 4.0, false)).toDF("grp", "v", "a")
    assert(Analytics.welchT(df, "grp", "v", col("a")).count() == 0L)
  }

  // ---- null hardening ------------------------------------------------------

  test("null hardening: eval kernels exclude null labels/predictions/scores") {
    val conf = Eval.binaryConfusion(
      Seq(("s", Some(true), Some(true)), ("s", None, Some(true)),
        ("s", Some(true), Option.empty[Boolean]))
        .toDF("slice", "y", "p"), "slice", col("y"), col("p"))
      .select("tp", "fp", "fn", "tn").as[(Long, Long, Long, Long)].head()
    assert(conf == ((1L, 0L, 0L, 0L))) // cells still sum to the kept rows
    val auc = Eval.aucBySlice(
      Seq(("s", Some(2.0), Some(true)), ("s", Some(1.0), Some(false)),
        ("s", Option.empty[Double], Some(true)), ("s", Some(9.0), Option.empty[Boolean]))
        .toDF("slice", "score", "y"), "slice", "score", col("y"))
      .select("n_pos", "n_neg", "auc").as[(Long, Long, Double)].head()
    assert(auc == ((1L, 1L, 1.0)))
    val cal = Eval.calibrationBins(
      Seq((Some(0.55), Some(true)), (Some(0.55), Option.empty[Boolean]))
        .toDF("score", "y"), "score", col("y"))
      .select("n", "n_pos").as[(Long, Long)].head()
    assert(cal == ((1L, 1L)))
    val mc = Eval.multiclassMetrics(
      Seq((Some(1L), Some(1L)), (Option.empty[Long], Some(1L)),
        (Some(2L), Option.empty[Long])).toDF("y", "p"), "y", "p")
      .select("clazz", "n_true", "tp", "n_pred")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(mc == Seq((1L, 1L, 1L, 1L)))
  }

  test("null hardening: markov excludes null types without breaking chains") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // a -> (null) -> b: the null row is dropped BEFORE the lag, so the
    // observed transition is a -> b (the null never forms a pair)
    val ev = Seq((1L, ts(0), 1L, Some("a")), (1L, ts(1), 2L, Option.empty[String]),
        (1L, ts(2), 3L, Some("b")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.markovTransitions(ev, "user_id", "ts", "event_id",
        "event_type")
      .select("from_type", "to_type", "cnt").as[(String, String, Long)].collect()
    assert(got.toSeq == Seq(("a", "b", 1L)))
  }

  test("null hardening: curriculum null scores bucket first on every engine") {
    val df = Seq(("g", Some(5L)), ("g", Option.empty[Long]), ("g", Some(1L)),
      ("g", Some(9L))).toDF("src", "v")
    val got = DataOps.curriculumBuckets(df, "src", Seq(col("v")), 2)
      .select("v", "bucket").as[(Option[Long], Int)].collect()
    // pinned NULLS FIRST: the null row leads bucket 1
    assert(got.find(_._1.isEmpty).get._2 == 1)
    assert(got.find(_._1.contains(9L)).get._2 == 2)
  }

  // ---- Joins.setSimilarityJoin --------------------------------------------

  test("setsim: exact Jaccard pairs with integer verification") {
    // doc 1 and 2 share 9 of 10 5-gram shingles (one-token suffix change):
    // J = 9/11 ≥ 1/2; doc 3 is disjoint
    val base = (1 to 14).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " extra"),
      (3L, (1 to 14).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Joins.setSimilarityJoin(docs, "doc_id", "text", n = 5)
      .select("id_a", "id_b", "n_a", "n_b", "inter", "uni", "jac")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 10L, 11L, 10L, 11L, 0.909091)))
  }

  test("setsim: prefix filtering is COMPLETE vs brute force") {
    // deterministic corpus with heavy shingle reuse (every doc draws its
    // tokens from a 9-word pool) — brute force over all pairs is the truth
    val docs = (0 until 60).map { i =>
      val toks = (0 until 12).map(j => s"t${(i * 7 + j * j) % 9}")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Joins.setSimilarityJoin(docs, "doc_id", "text", n = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force: shingle sets via the same kernel, all pairs
    val sets = docs.select(col("doc_id"),
        TextShingles.word_shingle_hashes(col("text"), 5).as("s"))
      .as[(Long, Seq[Long])].collect().map { case (i, s) => i -> s.toSet }
    val truth = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; uni = (sa | sb).size
      if 2 * inter >= uni
    } yield (ia, ib)).toSet
    assert(fast == truth, s"missing=${truth -- fast} extra=${fast -- truth}")
    assert(truth.nonEmpty, "fixture produced no similar pairs — not a test")
  }

  // ---- Dedup.minhashPairsIncremental --------------------------------------

  test("incremental minhash == batch pairs filtered to the new side") {
    val docs = ScaleExt.generate(spark, 3000)
    val batch = Dedup.minhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val inc = Dedup.minhashPairsIncremental(docs,
        col("doc_id") % 5 === 0, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val expected = batch.filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    assert(inc == expected)
    assert(inc.nonEmpty, "planted corpus must yield new-side pairs")
    assert(batch.size > inc.size, "filter must actually restrict")
  }

  // ---- DataOps.incrementalJoinDelta ---------------------------------------

  test("incremental join: old + delta terms == direct full join, disjointly") {
    val aOld = Seq((1L, 10L), (2L, 20L)).toDF("k", "a_id")
    val aNew = Seq((1L, 11L)).toDF("k", "a_id")
    val bOld = Seq((1L, 100L)).toDF("k", "b_id")
    val bNew = Seq((1L, 101L), (2L, 200L)).toDF("k", "b_id")
    val vOld = aOld.join(bOld, Seq("k"))
    val delta = DataOps.incrementalJoinDelta(aOld, aNew, bOld, bNew, Seq("k"))
    val maintained = vOld.unionByName(delta)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val direct = aOld.unionByName(aNew).join(bOld.unionByName(bNew), Seq("k"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(maintained == direct)
    // and the delta terms never regenerate an old row
    assert(!delta.as[(Long, Long, Long)].collect()
      .exists(r => r == ((1L, 10L, 100L))))
  }

  // ---- Graph.labelPropagation ---------------------------------------------

  test("label propagation: two cliques joined by one bridge separate") {
    // cliques {1..4} and {10..13} with bridge 4-10: the in-clique
    // majority (3 neighbors) must defeat the single bridge vote — the
    // documented requirement for a community to hold under the
    // deterministic tie-to-min rule (at all-distinct init, EVERY round-1
    // vote is a tie, so a 3-clique's bridge endpoint would leak)
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L))).toDF("a", "b")
    val got = Graph.labelPropagation(edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(Set(1L, 2L, 3L, 4L).map(got) == Set(1L))
    assert(Set(10L, 11L, 12L, 13L).map(got) == Set(10L))
  }

  test("label propagation: deterministic across partitionings") {
    val edges = (0 until 300).map(i =>
      ((i % 40).toLong, (40 + (i * 7) % 25).toLong)).toDF("a", "b")
    val r1 = Graph.labelPropagation(edges.repartition(13), rounds = 4)
      .as[(Long, Long)].collect().toSet
    val r2 = Graph.labelPropagation(edges.repartition(2), rounds = 4)
      .as[(Long, Long)].collect().toSet
    assert(r1 == r2)
  }

  // ---- TextAnalysis.segmentSentences --------------------------------------

  test("sentences: terminators stay attached, positions stable, empties drop") {
    val docs = Seq(
      (1L, "First one. Second?! Third has no end"),
      (2L, "..."),                 // punctuation only: one empty run kept? no
      (3L, "One sentence only"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.segmentSentences(docs, "doc_id")
      .select("doc_id", "seg_idx", "sentence")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.filter(_._1 == 1L).map(_._3).toSeq ==
      Seq("First one.", "Second?!", "Third has no end"))
    // seg positions count RAW segments; trimming never renumbers
    assert(got.filter(_._1 == 1L).map(_._2).toSeq == Seq(0, 1, 2))
    assert(!got.exists(_._1 == 2L))   // "..." has no non-terminator run
    assert(got.filter(_._1 == 3L).map(_._3).toSeq == Seq("One sentence only"))
  }

  // ---- Analytics.chi2Independence / klFromGlobal ---------------------------

  test("chi2: textbook 2x2 value; independent table scores ~0") {
    // contingency [[10, 20], [30, 40]]: chi2 = n*(ad-bc)^2/(r1*r2*c1*c2)
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(40)(("y", "v"))
    val got = Analytics.chi2Independence(rows.toDF("a", "b"), "a", "b")
      .select("n", "df", "chi2", "cramers_v")
      .as[(Long, Long, Double, Double)].head()
    val expected = 100.0 * math.pow(10 * 40 - 20 * 30, 2) /
      (30.0 * 70.0 * 40.0 * 60.0)
    assert(got._1 == 100L && got._2 == 1L)
    assert(math.abs(got._3 - expected) < 1e-4, s"chi2 ${got._3} != $expected")
    // perfectly proportional table: chi2 exactly 0
    val indep = Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(20)(("y", "v"))
    val z = Analytics.chi2Independence(indep.toDF("a", "b"), "a", "b")
      .select("chi2").as[Double].head()
    assert(z == 0.0)
  }

  test("kl: identical-mix groups diverge 0; skewed group positive") {
    // group g1 matches the global mix exactly when both groups do;
    // here g1 is all-'a', g2 all-'b' -> each diverges ln(2) from the blend
    val rows = Seq.fill(10)(("g1", "a")) ++ Seq.fill(10)(("g2", "b"))
    val got = Analytics.klFromGlobal(rows.toDF("g", "w"), "g", "w")
      .select("g", "kl").as[(String, Double)].collect().toMap
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("g1") == ln2 && got("g2") == ln2)
    val same = Seq.fill(5)(("g1", "a")) ++ Seq.fill(5)(("g1", "b")) ++
      Seq.fill(5)(("g2", "a")) ++ Seq.fill(5)(("g2", "b"))
    val z = Analytics.klFromGlobal(same.toDF("g", "w"), "g", "w")
      .select("kl").as[Double].collect()
    assert(z.forall(_ == 0.0))
  }

  // ---- Analytics.markovTransitions ----------------------------------------

  test("markov: transition counts and row-normalized probabilities") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // user 1: a -> b -> a ; user 2: a -> b  => a->b: 2, b->a: 1
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"), (1L, ts(2), 3L, "a"),
      (2L, ts(0), 4L, "a"), (2L, ts(1), 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.markovTransitions(ev, "user_id", "ts", "event_id",
        "event_type")
      .select("from_type", "to_type", "cnt", "prob")
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("markov: probabilities sum to 1 per from_type on real-shaped data") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = (1 to 200).map { i =>
      (i.toLong % 7, new java.sql.Timestamp(t0.getTime + i * 1000L),
        i.toLong, Seq("a", "b", "c")(i % 3))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val sums = Analytics.markovTransitions(ev, "user_id", "ts", "event_id",
        "event_type")
      .groupBy("from_type").agg(sum("prob").as("s"))
      .select("s").as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4))
  }
}
