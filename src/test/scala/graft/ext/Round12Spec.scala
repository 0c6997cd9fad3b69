package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GuardLogging, SparkTest}

/** Round-12: the five r11 ADVICE closures (fractional MST weights +
  * loud incompleteness, conformal outer join, scheme-aware URL port
  * strip, SPRT null-id exclusion) and the two new lifecycle
  * compositions (incremental cluster maintenance ≡ full recompute,
  * stored theta sketches answer the algebra with no corpus).
  */
class Round12Spec extends AnyFunSuite with SparkTest with GuardLogging {
  import spark.implicits._

  // ---- maxSpanningForest: fractional weights (ADVICE r11 #1) --------------

  test("maxSpanningForest ranks fractional similarity weights at full " +
      "precision") {
    // triangle where long-truncation (all w -> 0) would pick the WRONG
    // backbone: max forest must keep the 0.9 and 0.5 edges, never (1,2)
    val edges = Seq((1L, 2L, 0.1), (2L, 3L, 0.9), (1L, 3L, 0.5))
      .toDF("a", "b", "w")
    val forest = Graph.maxSpanningForest(edges)
      .as[(Long, Long, Double)].collect().toSet
    assert(forest == Set((2L, 3L, 0.9), (1L, 3L, 0.5)))
  }

  test("maxSpanningForest keeps the input weight type (long in, long out)") {
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 7L)).toDF("a", "b", "w")
    val out = Graph.maxSpanningForest(edges)
    assert(out.schema("w").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 5L), (2L, 3L, 7L)))
  }

  test("maxSpanningForest raises on a null weight instead of silently " +
      "ranking it") {
    val edges = Seq((Some(1L), Some(2L), Some(1.0)),
      (Some(2L), Some(3L), None)).toDF("a", "b", "w")
    val e = intercept[Exception] {
      quietly(Graph.maxSpanningForest(edges).collect())
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null weight")),
      s"expected the null-weight raise, got: $e")
  }

  // ---- maxSpanningForest: loud incompleteness (ADVICE r11 #3) -------------

  test("maxSpanningForest fails loud when rounds are too few for the " +
      "component count") {
    // 1-2 and 3-4 merge in round 1 (each node's heaviest edge); the
    // bridging (2,3) needs round 2 — rounds=1 must THROW, not return a
    // partial forest
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 1L), (3L, 4L, 10L))
      .toDF("a", "b", "w")
    // driverMaxEdges=0 pins the DISTRIBUTED Borůvka path (the r14
    // Kruskal entry hand-off always completes, so the loud failure is a
    // Borůvka-path contract)
    val e = intercept[IllegalStateException] {
      Graph.maxSpanningForest(edges, rounds = 1, driverMaxEdges = 0L)
    }
    assert(e.getMessage.contains("cross-component edges remain"))
    // and with enough rounds the same graph completes to the full tree
    val ok = Graph.maxSpanningForest(edges, rounds = 2, driverMaxEdges = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(ok == Set((1L, 2L, 10L), (2L, 3L, 1L), (3L, 4L, 10L)))
  }

  test("maxSpanningForest: driver Kruskal hand-off ≡ distributed Borůvka " +
      "on 10 random weighted graphs (ties included)") {
    val rnd = new scala.util.Random(271828)
    for (trial <- 0 until 10) {
      val n = 20 + rnd.nextInt(60)
      val m = n + rnd.nextInt(2 * n)
      // small weight range on purpose: exercises the (w, a, b) tie-break
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          rnd.nextInt(5).toLong))
        .filter { case (a, b, _) => a != b }.distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("a", "b", "w").cache()
        val viaKruskal = Graph.maxSpanningForest(df)
          .as[(Long, Long, Long)].collect().toSet
        val viaBoruvka = Graph.maxSpanningForest(df, driverMaxEdges = 0L)
          .as[(Long, Long, Long)].collect().toSet
        assert(viaKruskal == viaBoruvka, s"trial $trial: n=$n m=$m")
        df.unpersist()
      }
    }
  }

  // ---- conformalThreshold: no slice drops (ADVICE r11 #2) -----------------

  test("conformalThreshold reports calibration-only and test-only slices") {
    val rows =
      (1 to 40).map(i => ("both", i.toLong, i % 2 == 0)) ++
        (1 to 40).map(i => ("calonly", i.toLong, true)) ++
        (1 to 10).map(i => ("testonly", i.toLong, false))
    val df = rows.toDF("slice", "score", "is_cal")
    val out = Eval.conformalThreshold(df, "slice", col("score"),
        col("is_cal"), alpha = 0.1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("both", "calonly", "testonly"))
    val cal = out("calonly")
    assert(!cal.isNullAt(cal.fieldIndex("qhat")),
      "calibration-only slice must still report its threshold")
    assert(cal.isNullAt(cal.fieldIndex("n_test")) &&
      cal.isNullAt(cal.fieldIndex("coverage")),
      "calibration-only slice has no test rows — null coverage")
    val tst = out("testonly")
    assert(tst.isNullAt(tst.fieldIndex("qhat")) &&
      tst.isNullAt(tst.fieldIndex("n_cal")),
      "test-only slice must surface with a NULL threshold")
    assert(tst.getLong(tst.fieldIndex("n_test")) == 10L)
    val both = out("both")
    assert(!both.isNullAt(both.fieldIndex("qhat")) &&
      both.getLong(both.fieldIndex("n_test")) == 20L &&
      !both.isNullAt(both.fieldIndex("coverage")))
  }

  // ---- canonicalUrl: scheme-aware port strip (ADVICE r11 #4) --------------

  test("canonicalUrl strips the default port only when it matches the " +
      "scheme") {
    val cases = Seq(
      ("http://h.com:80/x", "http://h.com/x"), // default — strip
      ("https://h.com:443/x", "https://h.com/x"), // default — strip
      ("http://h.com:443/x", "http://h.com:443/x"), // NON-default — keep
      ("https://h.com:80/x", "https://h.com:80/x"), // NON-default — keep
      ("http://h.com:8080/x", "http://h.com:8080/x"))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Dedup.canonicalUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"canonicalUrl($in)")
    }
  }

  // ---- sprt: null-id exclusion (ADVICE r11 #5) ----------------------------

  test("sprt excludes null-id rows from both the walk and the totals") {
    val rows = (1 to 60).map(i =>
      ("g", i.toLong, Some(i.toLong), i % 3 != 0)) ++
      // tied-timestamp null-id rows: ordered NULLS FIRST in Spark but
      // NULLS LAST in DuckDB — must not count at all
      (1 to 10).map(i => ("g", i.toLong, None: Option[Long], true))
    val df = rows.toDF("grp", "ts", "id", "succ")
    val out = Analytics.sprt(df, "grp", col("succ"), "ts", "id",
      p0 = 0.45, p1 = 0.55).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("n_total")) == 60L,
      "null-id rows must be excluded from n_total")
    val clean = Analytics.sprt(df.where(col("id").isNotNull), "grp",
      col("succ"), "ts", "id", p0 = 0.45, p1 = 0.55).collect().head
    assert(r.toSeq == clean.toSeq,
      "sprt(df) must equal sprt(df with null ids pre-filtered)")
  }

  // ---- dedup_cluster_incremental ≡ full recompute --------------------------

  /** Synthetic corpus with planted near-dup groups: each group g of
    * size 3 shares a 40-token base text with 1-token perturbations, so
    * MinHash-LSH links the group; singles are unique texts.
    */
  private def syntheticDocs(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val words = (0 until 400).map(i => s"w${rnd.nextInt(100000)}x$i")
    def text(g: Int, v: Int): String = {
      val base = (0 until 40).map(j => words((g * 37 + j * 7) % 400))
      (base.updated(v % 40, s"uniq${g}v$v")).mkString(" ")
    }
    val grouped = for (g <- 0 until 12; v <- 0 until 3)
      yield ((g * 3 + v).toLong, text(g, v))
    val singles = (36 until 60).map(i =>
      (i.toLong, (0 until 40).map(j => s"solo${i}w$j").mkString(" ")))
    (grouped ++ singles).toDF("doc_id", "text")
  }

  test("incremental cluster maintenance is indistinguishable from full " +
      "recompute on 5 random corpora") {
    for (seed <- 1 to 5) {
      val docs = syntheticDocs(seed)
      val allPairs = Dedup.minhashPairs(docs, "doc_id", "text")
        .select(col("id_a"), col("id_b"))
      val full = Dedup.components(allPairs)
        .as[(Long, Long)].collect().toMap
      val basePairs = allPairs
        .where(col("id_a") % 5 =!= 0 && col("id_b") % 5 =!= 0)
      val newPairs = Dedup.minhashPairsIncremental(docs,
        col("doc_id") % 5 === 0, "doc_id", "text")
      val inc = Dedup.componentsIncremental(
          Dedup.components(basePairs), newPairs)
        .as[(Long, Long)].collect().toMap
      assert(inc == full, s"seed $seed: incremental != full recompute")
    }
  }

  // ---- thetaMergeSketches: lossless period roll-up -------------------------

  test("theta sketches merge losslessly: per-period bottom-k rolls up to " +
      "the direct corpus sketch") {
    val rnd = new scala.util.Random(12)
    val rows = (1 to 3000).map { _ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(3).toLong,
        rnd.nextInt(800).toLong)
    }
    // thetaSketches' contract: distinct keys upstream (the queries all
    // .distinct() first) — dedup at each build's own granularity; a key
    // living in TWO periods of one group then appears in both period
    // sketches, and the merge's array_distinct must collapse it
    val df = rows.toDF("g", "period", "key").distinct()
    val direct = Sketches.thetaSketches(
        df.select(col("g"), col("key")).distinct(), "g", "key", k = 32)
      .as[(String, Seq[Long])].collect().toMap
    val merged = Sketches.thetaMergeSketches(
        Sketches.thetaSketches(df, Seq("g", "period"), "key", 32), "g", 32)
      .as[(String, Seq[Long])].collect().toMap
    assert(merged == direct,
      "merge of per-period sketches must equal the one-shot sketch")
  }

  // ---- mergeInvertedIndex: maintenance ≡ rebuild ---------------------------

  test("inverted-index merge equals the full rebuild, numerically sorted") {
    val rnd = new scala.util.Random(5)
    val vocabTerms = Seq("alpha", "beta", "gamma")
    val docs = (1 to 200).map { i =>
      val words = (0 until 12).map(_ =>
        if (rnd.nextInt(4) == 0) vocabTerms(rnd.nextInt(3))
        else s"filler${rnd.nextInt(50)}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val full = Ranking.invertedIndex(docs, "doc_id", "text", vocabTerms)
      .as[(String, Long, String)].collect().toSet
    val merged = Ranking.mergeInvertedIndex(
        Ranking.invertedIndex(docs.where(col("doc_id") % 5 =!= 0),
          "doc_id", "text", vocabTerms),
        Ranking.invertedIndex(docs.where(col("doc_id") % 5 === 0),
          "doc_id", "text", vocabTerms))
      .as[(String, Long, String)].collect().toSet
    assert(merged == full, "index maintenance must equal a full rebuild")
    // postings must be numerically ordered (the "10" < "2" trap)
    merged.foreach { case (t, _, p) =>
      val ids = p.split(",").map(_.toLong)
      assert(ids.sameElements(ids.sorted), s"postings unsorted for $t")
    }
  }

  // ---- bloomMembership: one-sided error ------------------------------------

  test("bloom membership never false-negatives, and saturation produces " +
      "FLAGGED false positives") {
    val keys = (1 to 64).map(i => ("g", i.toLong)).toDF("g", "key")
    val probes = ((1 to 8).map(i => (s"in$i", i.toLong)) ++
      Seq(("out1", 9001L), ("out2", 9002L))).toDF("name", "key")
    // honest regime: 1024 bits — every present probe found
    val wide = Sketches.bloomMembership(keys, "g", "key", probes,
      "name", "key", mBits = 1024, kHashes = 4).collect()
    wide.foreach { r =>
      val exact = r.getBoolean(r.fieldIndex("present_exact"))
      val bloom = r.getBoolean(r.fieldIndex("present_bloom"))
      if (exact) assert(bloom, s"false negative at ${r.getString(1)}")
      assert(r.getBoolean(r.fieldIndex("false_positive")) ==
        (bloom && !exact))
    }
    // saturated regime: 8 bits over 64 keys — the absent probes must
    // read present AND be flagged as false positives
    val tiny = Sketches.bloomMembership(keys, "g", "key", probes,
        "name", "key", mBits = 8, kHashes = 2)
      .collect().map(r => r.getString(1) -> r).toMap
    Seq("out1", "out2").foreach { n =>
      val r = tiny(n)
      assert(r.getBoolean(r.fieldIndex("present_bloom")) &&
        r.getBoolean(r.fieldIndex("false_positive")),
        s"saturated filter must flag $n as a false positive")
    }
  }

  // ---- ts_mase: seasonal-naive backtest ------------------------------------

  test("ts_mase: a perfectly 24h-seasonal series scores MASE 0; a " +
      "constant series reports null (undefined scale)") {
    import java.sql.Timestamp
    def t(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")
    // "seasonal": count pattern repeats every 24h but varies within the
    // day (naive-1 errs, seasonal-naive is perfect); "flat": constant
    val rows = for {
      day <- 1 to 4; hour <- 0 until 24
      (tpe, reps) <- Seq(("seasonal", 1 + (hour % 3)), ("flat", 2))
      r <- 0 until reps
    } yield (tpe, t(day, hour), r.toLong)
    val ev = rows.toDF("event_type", "ts", "event_id")
    val out = graft.queries.EvalQueries.tsMase(
        // route through a temp view shaped like the events table
        ev.sparkSession, writeEventsFixture(ev))
      .collect().map(r => r.getString(0) -> r).toMap
    val se = out("seasonal")
    assert(se.getDouble(se.fieldIndex("mase")) == 0.0,
      "perfect seasonality must score MASE 0")
    assert(se.getDouble(se.fieldIndex("mae_naive")) > 0.0)
    val fl = out("flat")
    assert(fl.isNullAt(fl.fieldIndex("mase")),
      "constant series has no naive error scale — null MASE")
  }

  /** Write a minimal events.parquet fixture dir for query fns that read
    * Tables.events(dir).
    */
  private def writeEventsFixture(ev: DataFrame): String = {
    val dir = TempStores.newStore("graft-ts-fixture")
    ev.select(col("event_id"), lit(1L).as("user_id"),
        col("event_type"), col("ts"), lit(1.0).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ---- dedup_index_stored: the stored-LSH-index lifecycle ------------------

  test("probing a STORED LSH index equals the from-text incremental " +
      "probe on 3 random corpora") {
    for (seed <- 1 to 3) {
      val docs = syntheticDocs(seed + 20)
      val fromText = Dedup.minhashPairsIncremental(docs,
          col("doc_id") % 5 === 0, "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      val (sigs, banded) = Dedup.minhashIndex(
        docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text")
      val store = TempStores.newStore("graft-lsh-spec")
      sigs.write.mode("overwrite").parquet(s"$store/sigs")
      banded.write.mode("overwrite").parquet(s"$store/banded")
      val probe = Dedup.minhashPairsFromStoredIndex(
        spark.read.parquet(s"$store/sigs"),
        spark.read.parquet(s"$store/banded"),
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
      // the probe's text scans must touch ONLY the new batch — old
      // signatures come from the store, never recomputed
      val scans = probe.queryExecution.executedPlan.toString()
      assert(scans.contains(store.split("/").last),
        "probe plan must read the stored index tables")
      assert(probe.as[(Long, Long)].collect().toSet == fromText,
        s"seed $seed: stored-index probe != from-text incremental")
    }
  }

  // ---- sketch_theta_stored: the persisted-sketch lifecycle ----------------

  test("theta algebra from a STORED sketch table is bit-identical to the " +
      "one-shot form") {
    val docs = syntheticDocs(7)
      .withColumn("source", concat(lit("src"), col("doc_id") % 4))
    val vocab = docs.select(col("source"),
      explode(TextShingles.word_shingle_hashes(col("text"), 1)).as("th"))
      .distinct()
    val direct = Sketches.thetaPairAlgebra(vocab, "source", "th", k = 16)
      .collect().map(_.toSeq).toSet
    val store = TempStores.newStore("graft-theta-spec")
    Sketches.thetaSketches(vocab, "source", "th", k = 16)
      .write.mode("overwrite").parquet(store)
    val fromStore = Sketches
      .thetaAlgebraFromSketches(spark.read.parquet(store), "source", k = 16)
    // the stored-path plan must not touch the corpus: parquet scan only
    val scans = fromStore.queryExecution.executedPlan.toString()
    assert(scans.contains(store.split("/").last) ||
      scans.toLowerCase.contains("parquet"),
      "stored path must read the sketch table")
    assert(fromStore.collect().map(_.toSeq).toSet == direct)
  }
}
