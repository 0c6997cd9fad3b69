package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GuardLogging, SparkTest}

/** Round-13: the stored-LSH-index parameter-contract guards (a
  * mismatched store must fail LOUD in the value path, never
  * under-verify silently), the index APPEND step (append ≡ rebuild ≡
  * from-text incremental), the stored-Bloom lifecycle (batch ≡
  * stored-merge, probe answered from bits alone), ts_mase empty-slice
  * surfacing, the MSF numeric-weight/readable-raise guards, and the
  * conformal zero-covered pin the r12 ADVICE oracle fix mirrors.
  */
class Round13Spec extends AnyFunSuite with SparkTest with GuardLogging {
  import spark.implicits._

  /** Planted near-dup corpus (the Round12Spec fixture shape): groups of
    * 3 docs share a 40-token base with 1-token perturbations; singles
    * are unique.
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

  private def writeIndex(docs: DataFrame, store: String,
      numHashes: Int, bands: Int): Unit = {
    val (sigs, banded) = Dedup.minhashIndex(
      docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
      numHashes, bands)
    sigs.write.mode("overwrite").parquet(s"$store/sigs")
    banded.write.mode("overwrite").parquet(s"$store/banded")
  }

  private def probeStored(docs: DataFrame, store: String,
      numHashes: Int = 64, bands: Int = 16): Array[(Long, Long)] =
    Dedup.minhashPairsFromStoredIndex(
      spark.read.parquet(s"$store/sigs"),
      spark.read.parquet(s"$store/banded"),
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
      numHashes, bands).as[(Long, Long)].collect()

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  // ---- stored-index parameter contract (r12 verdict #2 / ADVICE #1) -------

  test("stored-index probe fails LOUD on a store built with a different " +
      "numHashes (signature width mismatch)") {
    val docs = syntheticDocs(31)
    val store = TempStores.newStore("lsh-guard-width")
    writeIndex(docs, store, numHashes = 32, bands = 16)
    val e = intercept[Exception] { quietly(probeStored(docs, store)) }
    assert(msgs(e).exists(_.contains("signature width")),
      s"expected the signature-width raise, got: $e")
  }

  test("stored-index probe fails LOUD on a store built with MORE bands " +
      "(band index out of the probe's range)") {
    val docs = syntheticDocs(32)
    val store = TempStores.newStore("lsh-guard-over")
    writeIndex(docs, store, numHashes = 64, bands = 32)
    val e = intercept[Exception] { quietly(probeStored(docs, store)) }
    assert(msgs(e).exists(_.contains("disagrees with bands")),
      s"expected the band-contract raise, got: $e")
  }

  test("stored-index probe fails LOUD on a store built with FEWER bands " +
      "(posting count per id disagrees — the case a range check alone " +
      "cannot see)") {
    val docs = syntheticDocs(33)
    val store = TempStores.newStore("lsh-guard-under")
    writeIndex(docs, store, numHashes = 64, bands = 8)
    val e = intercept[Exception] { quietly(probeStored(docs, store)) }
    assert(msgs(e).exists(_.contains("disagrees with bands")),
      s"expected the band-contract raise, got: $e")
  }

  test("a well-formed store still probes guard-silently, equal to the " +
      "from-text incremental") {
    val docs = syntheticDocs(34)
    val store = TempStores.newStore("lsh-guard-ok")
    writeIndex(docs, store, numHashes = 64, bands = 16)
    val fromText = Dedup.minhashPairsIncremental(docs,
        col("doc_id") % 5 === 0, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(probeStored(docs, store).toSet == fromText)
  }

  // ---- index APPEND ≡ rebuild (r12 verdict "What's missing #1") -----------

  test("appending a period's index rows equals rebuilding the store, on " +
      "3 random corpora") {
    for (seed <- 41 to 43) {
      val docs = syntheticDocs(seed)
      // append path: write period A, APPEND period B
      val app = TempStores.newStore("lsh-append")
      val (sa, ba) = Dedup.minhashIndex(
        docs.where(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2),
        "doc_id", "text")
      sa.write.mode("overwrite").parquet(s"$app/sigs")
      ba.write.mode("overwrite").parquet(s"$app/banded")
      val (sb, bb) = Dedup.minhashIndex(
        docs.where(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
        "doc_id", "text")
      sb.write.mode("append").parquet(s"$app/sigs")
      bb.write.mode("append").parquet(s"$app/banded")
      // rebuild path: one-shot index over A ∪ B
      val reb = TempStores.newStore("lsh-rebuild")
      writeIndex(docs, reb, numHashes = 64, bands = 16)
      val fromText = Dedup.minhashPairsIncremental(docs,
          col("doc_id") % 5 === 0, "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      val appended = probeStored(docs, app)
      assert(appended.toSet == probeStored(docs, reb).toSet,
        s"seed $seed: append != rebuild")
      assert(appended.toSet == fromText,
        s"seed $seed: append != from-text incremental")
    }
  }

  // ---- fully-stored cluster maintenance ≡ in-query incremental -------------

  test("probe+fold from STORED index and STORED labels equals the " +
      "in-query incremental maintenance") {
    val docs = syntheticDocs(51)
    val store = TempStores.newStore("cluster-store-spec")
    val (sigs, banded) = Dedup.minhashIndex(
      docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text")
    sigs.write.mode("overwrite").parquet(s"$store/sigs")
    banded.write.mode("overwrite").parquet(s"$store/banded")
    val basePairs = Dedup.minhashPairs(docs, "doc_id", "text")
      .where(col("id_a") % 5 =!= 0 && col("id_b") % 5 =!= 0)
      .select(col("id_a"), col("id_b"))
    Dedup.components(basePairs)
      .write.mode("overwrite").parquet(s"$store/labels")
    val stored = Dedup.componentsIncremental(
        spark.read.parquet(s"$store/labels"),
        Dedup.minhashPairsFromStoredIndex(
          spark.read.parquet(s"$store/sigs"),
          spark.read.parquet(s"$store/banded"),
          docs.where(col("doc_id") % 5 === 0), "doc_id", "text"))
      .as[(Long, Long)].collect().toMap
    val inQuery = Dedup.componentsIncremental(
        Dedup.components(basePairs),
        Dedup.minhashPairsIncremental(docs,
          col("doc_id") % 5 === 0, "doc_id", "text"))
      .as[(Long, Long)].collect().toMap
    assert(stored == inQuery,
      "stored-state maintenance must equal the in-query incremental")
    // and both equal the full recompute — the standing oracle contract
    val full = Dedup.components(Dedup.minhashPairs(docs, "doc_id", "text")
        .select(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect().toMap
    assert(stored == full, "stored-state maintenance must equal the " +
      "full recompute")
  }

  // ---- stored-Bloom lifecycle (r12 verdict "What's missing #3") -----------

  test("per-period Bloom bit tables OR-merge to the one-shot bit set, " +
      "and the store-alone probe matches bloomMembership's verdicts") {
    val rnd = new scala.util.Random(5)
    // keys spread through mix64 (a bijection) so groups don't share
    // neighboring-id bit patterns; absent probes use ids >= 900, which
    // the bijection guarantees are never generated
    val rows = (1 to 4000).map { _ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(3).toLong,
        rnd.nextInt(900).toLong)
    }
    val df = rows.toDF("g", "period", "id")
      .withColumn("key", HashExprs.mix64(col("id")))
    val batch = Sketches.bloomBits(df, "g", "key", mBits = 512, kHashes = 4)
      .as[(String, Long)].collect().toSet
    // per-period tables persisted, read back, OR-merged (distinct)
    val store = TempStores.newStore("bloom-store-spec")
    Sketches.bloomBits(df, Seq("g", "period"), "key", 512, 4)
      .write.mode("overwrite").partitionBy("period").parquet(store)
    val merged = spark.read.parquet(store)
      .select(col("g"), col("pos")).distinct()
    assert(merged.as[(String, Long)].collect().toSet == batch,
      "OR-merge of per-period bit tables must equal the one-shot bits")
    // probe from the store ALONE == the full bloomMembership verdicts
    val probes = (Seq(rows.head._3, rows.last._3) ++
      Seq(900L, 901L)).zipWithIndex
      .map { case (k, i) => (s"p$i", k) }.toDF("probe", "id")
      .withColumn("key", HashExprs.mix64(col("id")))
    val fromBits = Sketches.bloomProbeFromBits(merged, "g",
        probes, "probe", "key", 512, 4)
      .as[(String, String, Long, Boolean)].collect().toSet
    val full = Sketches.bloomMembership(df, "g", "key",
        probes, "probe", "key", 512, 4)
      .select(col("g"), col("probe"), col("bits_set"), col("present_bloom"))
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(fromBits == full,
      "store-alone probe must match the direct build's Bloom verdicts")
  }

  // ---- stored HLL / CMS lifecycles: merge is lossless ----------------------

  test("per-period HLL register tables MAX-merge to the direct registers " +
      "through a parquet roundtrip") {
    val rnd = new scala.util.Random(9)
    val df = (1 to 5000).map(_ =>
        (rnd.nextInt(3).toLong, rnd.nextInt(1200).toLong))
      .toDF("period", "uid")
    val direct = Sketches.hllRegisters(df, "uid")
      .as[(Int, Int)].collect().toSet
    val store = TempStores.newStore("hll-store-spec")
    Sketches.hllRho(df, "uid", carryCols = Seq("period"))
      .groupBy("period", "bucket").agg(max("rho").as("r"))
      .write.mode("overwrite").partitionBy("period").parquet(store)
    val merged = spark.read.parquet(store)
      .groupBy("bucket").agg(max("r").as("r"))
      .as[(Int, Int)].collect().toSet
    assert(merged == direct,
      "max-of-period-maxes must equal the one-shot register table")
  }

  test("per-period Count-Min counter tables SUM-merge to the direct " +
      "counters through a parquet roundtrip") {
    val rnd = new scala.util.Random(10)
    val df = (1 to 5000).map(_ =>
        (rnd.nextInt(3).toLong, rnd.nextInt(300).toLong))
      .toDF("period", "key")
    val direct = Sketches.countMinCounters(df, "key",
        depth = 4, width = 256)
      .as[(Long, Long, Long)].collect().toSet
    val store = TempStores.newStore("cms-store-spec")
    Sketches.countMinCounters(df, Seq("period"), "key",
        depth = 4, width = 256)
      .write.mode("overwrite").partitionBy("period").parquet(store)
    val merged = spark.read.parquet(store)
      .groupBy("r", "cell").agg(sum("n").as("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == direct,
      "cell-wise sum of period counters must equal the one-shot table")
  }

  // ---- ts_mase: empty slices surface (r12 verdict #4 tail) ----------------

  private def writeEventsFixture(ev: DataFrame): String = {
    val dir = TempStores.newStore("graft-ts13-fixture")
    ev.select(col("event_id"), lit(1L).as("user_id"),
        col("event_type"), col("ts"), lit(1.0).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts_mase surfaces types with zero train or zero holdout pairs " +
      "instead of dropping them") {
    val base = 1767225600L // 2026-01-01 00:00:00 UTC, epoch seconds
    def ev(tpe: String, hours: Seq[Int]) = hours.map(h =>
      (tpe, new java.sql.Timestamp((base + h * 3600L) * 1000L)))
    // both: full 0..30 span — train AND holdout pairs exist
    // train_only: the last-24h window has no t-24h counterparts
    // hold_only: hour 24 pairs with hour 0, but no train-window h-1 pair
    val rows = ev("both", 0 to 30) ++
      ev("train_only", (0 to 5) ++ Seq(40, 41)) ++
      ev("hold_only", Seq(0, 24))
    val dir = writeEventsFixture(rows.zipWithIndex
      .map { case ((t, ts), i) => (i.toLong, t, ts) }
      .toDF("event_id", "event_type", "ts"))
    val out = graft.queries.EvalQueries.tsMase(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("both", "train_only", "hold_only"),
      s"all three types must surface, got ${out.keySet}")
    val tr = out("train_only")
    assert(!tr.isNullAt(tr.fieldIndex("n_train")) &&
      tr.isNullAt(tr.fieldIndex("n_holdout")) &&
      tr.isNullAt(tr.fieldIndex("mae_forecast")) &&
      tr.isNullAt(tr.fieldIndex("mase")),
      "zero-holdout type: null holdout side, null MASE")
    val ho = out("hold_only")
    assert(ho.isNullAt(ho.fieldIndex("n_train")) &&
      !ho.isNullAt(ho.fieldIndex("n_holdout")) &&
      ho.isNullAt(ho.fieldIndex("mae_naive")) &&
      ho.isNullAt(ho.fieldIndex("mase")),
      "zero-train type: null train side, null MASE")
    val bo = out("both")
    assert(!bo.isNullAt(bo.fieldIndex("n_train")) &&
      !bo.isNullAt(bo.fieldIndex("n_holdout")))
  }

  // ---- maxSpanningForest guards (ADVICE r12 #4) ----------------------------

  test("maxSpanningForest rejects a non-numeric weight column up front") {
    val edges = Seq((1L, 2L, "9"), (2L, 3L, "10")).toDF("a", "b", "w")
    val e = intercept[IllegalArgumentException] {
      Graph.maxSpanningForest(edges)
    }
    assert(e.getMessage.contains("must be numeric"), e.getMessage)
  }

  test("maxSpanningForest's null-weight raise stays readable when an id " +
      "is null too") {
    val edges = Seq((Some(1L), Some(2L), Some(1.0)),
      (None, Some(3L), None)).toDF("a", "b", "w")
    val e = intercept[Exception] {
      quietly(Graph.maxSpanningForest(edges).collect())
    }
    assert(msgs(e).exists(m => m.contains("null weight") &&
      m.contains("(null, 3)")),
      s"expected a readable raise naming the null id, got: $e")
  }

  // ---- conformal: zero-covered slice pins 0, not null (ADVICE r12 #3) -----

  test("conformalThreshold reports n_covered = 0 (not null) when a slice " +
      "has a threshold but no covered test rows") {
    val rows = (1 to 40).map(i => ("z", 100L, true)) ++
      (1 to 10).map(i => ("z", 200L, false))
    val out = Eval.conformalThreshold(rows.toDF("slice", "score", "is_cal"),
      "slice", col("score"), col("is_cal"), alpha = 0.1).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("qhat")) == 100L)
    assert(!r.isNullAt(r.fieldIndex("n_covered")) &&
      r.getLong(r.fieldIndex("n_covered")) == 0L,
      "zero covered rows must report 0, not null (the oracle mirrors this)")
    assert(r.getDouble(r.fieldIndex("coverage")) == 0.0)
  }
}
