package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GuardLogging, SparkTest}

/** Round-14: the stored ANN index lifecycle (persisted model + code
  * store, assign-only append, enforced parameter contract), the stored
  * histogram-quantile sketch (grid contract enforced), the stored BPE
  * tokenizer model (rank-chain contract enforced), the fully-stored
  * semantic-dedup structure (cells/seeds consistency + rep-band
  * contract), and the stored-Bloom zero-bit-group surfacing.
  */
class Round14Spec extends AnyFunSuite with SparkTest with GuardLogging {
  import spark.implicits._

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  /** Deterministic random vectors: (vec_id, embedding dim 8). */
  private def syntheticVecs(n: Int, seed: Int, dim: Int = 8): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
        (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  // ---- stored ANN index (r13 verdict "Next round #1") ---------------------

  test("ann: search from the persisted model + code store is bit-identical " +
      "to the one-shot IVFADC search") {
    val corpus = syntheticVecs(40, seed = 1)
    val direct = IvfPq.search(corpus, nCells = 4, m = 4, k = 8, nq = 3,
        topK = 5, nProbe = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val store = TempStores.newStore("ivfpq-spec")
    val (cents, cb) = IvfPq.train(corpus, nCells = 4, m = 4, k = 8)
    cents.write.mode("overwrite").parquet(s"$store/cents")
    cb.write.mode("overwrite").parquet(s"$store/codebook")
    val rCents = spark.read.parquet(s"$store/cents")
    val rCb = spark.read.parquet(s"$store/codebook")
    IvfPq.encodeWith(corpus, rCents, rCb, nCells = 4, m = 4, k = 8)
      .write.mode("overwrite").parquet(s"$store/codes")
    val stored = IvfPq.searchFromIndex(rCents, rCb,
        spark.read.parquet(s"$store/codes"),
        corpus.orderBy("vec_id").limit(3), nCells = 4, m = 4, k = 8,
        topK = 5, nProbe = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(stored == direct,
      "read-back index must answer exactly like the one-shot chain")
  }

  test("ann: assign-only coding of a new period APPENDS to the code store " +
      "and probes equal to one-pass coding with the same frozen model") {
    val corpus = syntheticVecs(45, seed = 2)
    val store = TempStores.newStore("ivfpq-append-spec")
    val oldC = corpus.where(col("vec_id") % 5 =!= 4)
    val (cents, cb) = IvfPq.train(oldC, nCells = 4, m = 4, k = 8)
    cents.write.mode("overwrite").parquet(s"$store/cents")
    cb.write.mode("overwrite").parquet(s"$store/codebook")
    val rCents = spark.read.parquet(s"$store/cents")
    val rCb = spark.read.parquet(s"$store/codebook")
    // append path: old codes written, new period assign-only appended
    IvfPq.encodeWith(oldC, rCents, rCb, nCells = 4, m = 4, k = 8)
      .write.mode("overwrite").parquet(s"$store/codes")
    IvfPq.encodeWith(corpus.where(col("vec_id") % 5 === 4), rCents, rCb,
        nCells = 4, m = 4, k = 8)
      .write.mode("append").parquet(s"$store/codes")
    // rebuild path: one-pass coding of everything, same frozen model
    IvfPq.encodeWith(corpus, rCents, rCb, nCells = 4, m = 4, k = 8)
      .write.mode("overwrite").parquet(s"$store/codes_rebuild")
    def probe(codesPath: String) = IvfPq.searchFromIndex(rCents, rCb,
        spark.read.parquet(codesPath),
        corpus.orderBy("vec_id").limit(3), nCells = 4, m = 4, k = 8,
        topK = 5, nProbe = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(probe(s"$store/codes") == probe(s"$store/codes_rebuild"),
      "append must equal re-coding everything with the frozen model")
  }

  test("ann: a codebook store built with a different k fails LOUD on load") {
    val corpus = syntheticVecs(40, seed = 3)
    val store = TempStores.newStore("ivfpq-guard-k")
    val (cents, cb) = IvfPq.train(corpus, nCells = 4, m = 4, k = 8)
    cents.write.mode("overwrite").parquet(s"$store/cents")
    cb.write.mode("overwrite").parquet(s"$store/codebook")
    val e = intercept[IllegalArgumentException] {
      IvfPq.encodeWith(corpus, spark.read.parquet(s"$store/cents"),
        spark.read.parquet(s"$store/codebook"), nCells = 4, m = 4, k = 4)
    }
    assert(msgs(e).exists(_.contains("different k")), e.getMessage)
  }

  test("ann: a twice-appended centroid store fails LOUD on load") {
    val corpus = syntheticVecs(40, seed = 4)
    val store = TempStores.newStore("ivfpq-guard-dup")
    val (cents, cb) = IvfPq.train(corpus, nCells = 4, m = 4, k = 8)
    cents.write.mode("overwrite").parquet(s"$store/cents")
    cents.write.mode("append").parquet(s"$store/cents")
    cb.write.mode("overwrite").parquet(s"$store/codebook")
    val e = intercept[IllegalArgumentException] {
      IvfPq.encodeWith(corpus, spark.read.parquet(s"$store/cents"),
        spark.read.parquet(s"$store/codebook"), nCells = 4, m = 4, k = 8)
    }
    assert(msgs(e).exists(_.contains("appended twice")), e.getMessage)
  }

  test("ann: a code store that disagrees with (m, k, nCells) raises in " +
      "the value path of the scan") {
    val corpus = syntheticVecs(40, seed = 5)
    val store = TempStores.newStore("ivfpq-guard-codes")
    val (cents, cb) = IvfPq.train(corpus, nCells = 4, m = 4, k = 8)
    cents.write.mode("overwrite").parquet(s"$store/cents")
    cb.write.mode("overwrite").parquet(s"$store/codebook")
    val rCents = spark.read.parquet(s"$store/cents")
    val rCb = spark.read.parquet(s"$store/codebook")
    // cells shifted out of [0, nCells): a store coded under more cells
    IvfPq.encodeWith(corpus, rCents, rCb, nCells = 4, m = 4, k = 8)
      .withColumn("cell", col("cell") + 100)
      .write.mode("overwrite").parquet(s"$store/codes")
    val e = intercept[Exception] {
      quietly(IvfPq.searchFromIndex(rCents, rCb,
        spark.read.parquet(s"$store/codes"),
        corpus.orderBy("vec_id").limit(3), nCells = 4, m = 4, k = 8,
        topK = 5, nProbe = 2).collect())
    }
    assert(msgs(e).exists(_.contains("built with different parameters")),
      s"expected the code-store contract raise, got: $e")
  }

  // ---- stored histogram-quantile sketch (r13 verdict "Next round #3") -----

  test("quantiles from per-period bin tables SUM-merged equal the one-shot " +
      "sketch, through a parquet roundtrip") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map(_ =>
        (rnd.nextInt(3).toLong, (rnd.nextGaussian() * 1000).toLong))
      .toDF("period", "gv")
    val direct = Sketches.histogramQuantiles(df, col("gv"), nBins = 64,
        quantilesPct = Seq(25, 50, 75, 90, 99))
      .as[(Long, Long, Long, java.math.BigDecimal)].collect().toSet
    val org.apache.spark.sql.Row(lo: Long, hi: Long) =
      df.agg(min("gv"), max("gv")).head()
    val store = TempStores.newStore("quantile-store-spec")
    Sketches.histogramBins(df, Seq("period"), lo, hi - lo + 1, nBins = 64)
      .write.mode("overwrite").partitionBy("period").parquet(store)
    val merged = Sketches.histogramQuantilesFromBins(
        spark.read.parquet(store), nBins = 64,
        quantilesPct = Seq(25, 50, 75, 90, 99))
      .as[(Long, Long, Long, java.math.BigDecimal)].collect().toSet
    assert(merged == direct,
      "merged-of-periods read-off must equal the one-shot sketch")
  }

  test("a bin store whose periods were built on DIFFERENT grids fails " +
      "LOUD instead of merging misaligned bins") {
    val df = (1 to 500).map(i => (i.toLong % 2, i.toLong)).toDF("period", "gv")
    val store = TempStores.newStore("quantile-guard-grid")
    Sketches.histogramBins(df.where(col("period") === 0), Seq("period"),
        lo = 0, span = 1000, nBins = 64)
      .write.mode("overwrite").partitionBy("period").parquet(store)
    Sketches.histogramBins(df.where(col("period") === 1), Seq("period"),
        lo = 1, span = 1000, nBins = 64) // renegotiated grid
      .write.mode("append").partitionBy("period").parquet(store)
    val e = intercept[IllegalArgumentException] {
      Sketches.histogramQuantilesFromBins(spark.read.parquet(store),
        nBins = 64, quantilesPct = Seq(50))
    }
    assert(msgs(e).exists(_.contains("different")), e.getMessage)
  }

  test("a bin store read off with the wrong nBins fails LOUD") {
    val df = (1 to 500).map(i => (0L, i.toLong)).toDF("period", "gv")
    val store = TempStores.newStore("quantile-guard-nbins")
    Sketches.histogramBins(df, Seq("period"), lo = 1, span = 500, nBins = 64)
      .write.mode("overwrite").partitionBy("period").parquet(store)
    val e = intercept[IllegalArgumentException] {
      Sketches.histogramQuantilesFromBins(spark.read.parquet(store),
        nBins = 128, quantilesPct = Seq(50))
    }
    assert(msgs(e).exists(_.contains("creation-time contract")),
      e.getMessage)
  }

  // ---- stored BPE tokenizer model (r13 verdict "Next round #5") -----------

  private def syntheticTextDocs(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (0 until 50).map { i =>
      (i.toLong, (0 until 20).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("encoding from the persisted BPE model equals encoding from the " +
      "in-JVM trained merges") {
    val docs = syntheticTextDocs(21)
    val trained = Vocab.bpeTrain(docs, "text", merges = 4)
    val store = TempStores.newStore("bpe-model-spec")
    trained.write.mode("overwrite").parquet(store)
    val loaded = Vocab.loadBpeMerges(spark.read.parquet(store))
    val direct = trained.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(loaded == direct, "loaded merge chain must equal the trained one")
    val encStored = Vocab.bpeEncode(docs, "text", loaded)
      .as[(String, Long)].collect().toSet
    val encDirect = Vocab.bpeEncode(docs, "text", direct)
      .as[(String, Long)].collect().toSet
    assert(encStored == encDirect)
  }

  test("a twice-appended BPE model store fails LOUD (duplicate ranks)") {
    val docs = syntheticTextDocs(22)
    val trained = Vocab.bpeTrain(docs, "text", merges = 3)
    val store = TempStores.newStore("bpe-guard-dup")
    trained.write.mode("overwrite").parquet(store)
    trained.write.mode("append").parquet(store)
    val e = intercept[IllegalArgumentException] {
      Vocab.loadBpeMerges(spark.read.parquet(store))
    }
    assert(msgs(e).exists(_.contains("not contiguous")), e.getMessage)
  }

  test("a truncated BPE model store (rank gap) fails LOUD") {
    val docs = syntheticTextDocs(23)
    val trained = Vocab.bpeTrain(docs, "text", merges = 3)
    val store = TempStores.newStore("bpe-guard-gap")
    trained.where(col("rank") =!= 2).write.mode("overwrite").parquet(store)
    val e = intercept[IllegalArgumentException] {
      Vocab.loadBpeMerges(spark.read.parquet(store))
    }
    assert(msgs(e).exists(_.contains("not contiguous")), e.getMessage)
  }

  test("a non-BPE merge table (merged != left||right) fails LOUD") {
    val bad = Seq((1L, "h", "##e", "he")).toDF("rank", "left", "right", "merged")
    val e = intercept[IllegalArgumentException] {
      Vocab.loadBpeMerges(bad)
    }
    assert(msgs(e).exists(_.contains("not a BPE merge table")), e.getMessage)
  }

  test("encoding from the persisted unigram model equals encoding from " +
      "the in-JVM trained model; a twice-appended store raises") {
    val docs = syntheticTextDocs(24)
    val model = Vocab.unigramModel(docs, "text", emIters = 1,
      maxPieceLen = 3, maxWordLen = 8, topTypes = 200, keepMulti = 40)
    val store = TempStores.newStore("unigram-model-spec")
    model.write.mode("overwrite").parquet(store)
    val direct = Vocab.unigramEncode(docs, "text", model,
        maxPieceLen = 3, maxWordLen = 8, topTypes = 200)
      .as[(String, Long)].collect().toSet
    val stored = Vocab.unigramEncode(docs, "text",
        Vocab.checkedUnigramModel(spark.read.parquet(store)),
        maxPieceLen = 3, maxWordLen = 8, topTypes = 200)
      .as[(String, Long)].collect().toSet
    assert(stored == direct,
      "read-back model must encode exactly like the trained one")
    model.write.mode("append").parquet(store)
    val e = intercept[Exception] {
      quietly(Vocab.unigramEncode(docs, "text",
        Vocab.checkedUnigramModel(spark.read.parquet(store)),
        maxPieceLen = 3, maxWordLen = 8, topTypes = 200).collect())
    }
    assert(msgs(e).exists(_.contains("appended twice")),
      s"expected the duplicate-piece contract raise, got: $e")
  }

  // ---- fully-stored semantic dedup (r13 verdict "Next round #4") ----------

  private def writeSemanticStore(corpus: DataFrame, store: String,
      band: Int): Unit = {
    val (cells, seeds, reps) = Similarity.semanticStateTables(
      corpus, k = 0, band = band)
    cells.write.mode("overwrite").parquet(s"$store/cells")
    seeds.write.mode("overwrite").parquet(s"$store/seeds")
    reps.write.mode("overwrite").parquet(s"$store/reps")
  }

  test("screening from the persisted cluster structure is bit-identical " +
      "to the in-query incremental screen") {
    val vecs = syntheticVecs(60, seed = 31, dim = 4)
    val corpus = vecs.where(col("vec_id") % 5 =!= 4)
    val batch = vecs.where(col("vec_id") % 5 === 4)
    val inQuery = Similarity.semanticDedupIncremental(corpus, batch,
        k = 0, band = 4, tau = 0.4)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    val store = TempStores.newStore("semantic-store-spec")
    writeSemanticStore(corpus, store, band = 4)
    val stored = Similarity.semanticScreenStoredState(
        spark.read.parquet(s"$store/cells"),
        spark.read.parquet(s"$store/seeds"),
        spark.read.parquet(s"$store/reps"),
        batch, band = 4, tau = 0.4)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(stored == inQuery,
      "stored-structure screen must equal the in-query incremental")
  }

  test("a cells/seeds pair from different period closes fails LOUD") {
    val vecs = syntheticVecs(60, seed = 32, dim = 4)
    val corpus = vecs.where(col("vec_id") % 5 =!= 4)
    val store = TempStores.newStore("semantic-guard-cells")
    writeSemanticStore(corpus, store, band = 4)
    val cells = spark.read.parquet(s"$store/cells")
    val firstCell = cells.orderBy("cell").select("cell").head().getInt(0)
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticScreenStoredState(
        cells.where(col("cell") =!= firstCell),
        spark.read.parquet(s"$store/seeds"),
        spark.read.parquet(s"$store/reps"),
        vecs.where(col("vec_id") % 5 === 4), band = 4, tau = 0.4)
    }
    assert(msgs(e).exists(_.contains("inconsistent")), e.getMessage)
  }

  test("a twice-appended representatives table raises in the value path " +
      "(more than band reps per cluster)") {
    val vecs = syntheticVecs(60, seed = 33, dim = 4)
    val corpus = vecs.where(col("vec_id") % 5 =!= 4)
    val store = TempStores.newStore("semantic-guard-reps")
    writeSemanticStore(corpus, store, band = 1)
    // re-closed period: the reps table appended twice
    spark.read.parquet(s"$store/reps")
      .write.mode("append").parquet(s"$store/reps2")
    spark.read.parquet(s"$store/reps")
      .write.mode("append").parquet(s"$store/reps2")
    val e = intercept[Exception] {
      quietly(Similarity.semanticScreenStoredState(
        spark.read.parquet(s"$store/cells"),
        spark.read.parquet(s"$store/seeds"),
        spark.read.parquet(s"$store/reps2"),
        vecs.where(col("vec_id") % 5 === 4), band = 1, tau = 0.4).collect())
    }
    assert(msgs(e).exists(_.contains("appended twice")),
      s"expected the rep-band contract raise, got: $e")
  }

  // ---- stored Bloom: zero-bit groups surface (r13 verdict #6) -------------

  test("a group in the stored census whose periods set ZERO bits surfaces " +
      "with bits_set = 0 and present_bloom = false, instead of vanishing") {
    val df = (1 to 200).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "id")
      .withColumn("key", HashExprs.mix64(col("id")))
    val bits = Sketches.bloomBits(df, "g", "key", mBits = 256, kHashes = 4)
    val census = Seq("g0", "g1", "gEmpty").toDF("g")
    val probes = Seq(("p0", 1L), ("p1", 900L)).toDF("probe", "id")
      .withColumn("key", HashExprs.mix64(col("id")))
    val out = Sketches.bloomProbeFromBits(bits, "g", probes, "probe", "key",
        mBits = 256, kHashes = 4, groups = Some(census))
      .as[(String, String, Long, Boolean)].collect()
    val empty = out.filter(_._1 == "gEmpty")
    assert(empty.length == 2, s"gEmpty must surface for every probe: " +
      out.mkString(", "))
    assert(empty.forall(r => r._3 == 0L && !r._4),
      "zero-bit group: bits_set = 0 and present_bloom = false")
    // and a raw CONCATENATED (non-distinct) bit table cannot flip true
    // members to false negatives — the probe re-distincts internally
    val doubled = bits.unionByName(bits)
    val fromDoubled = Sketches.bloomProbeFromBits(doubled, "g",
        probes, "probe", "key", mBits = 256, kHashes = 4,
        groups = Some(census))
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(fromDoubled == out.toSet,
      "duplicate (group,pos) rows must not change any verdict")
  }
}
