package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale stress for the phase-E text pipeline: generates a synthetic
  * corpus with PLANTED exact and near duplicates (pure expressions — no
  * driver loops), runs the dedup chain and the full training-set
  * assembly at 20-200× the bench corpus, prints per-stage timing, and
  * asserts the planted structure is recovered:
  *  - every planted exact-dup group collapses to one survivor;
  *  - planted near-dups (one-token mutations) are caught by MinHash;
  *  - packs respect the token budget (only oversize docs exceed it).
  *
  * Run: sbt "Test/runMain graft.ext.ScaleExt [nDocs]"
  */
object ScaleExt {

  /** Deterministic word-soup corpus. Every id in [0, n) yields a row;
    * ids with id % 7 == 1..2 copy the text of the preceding %7==0 donor
    * (exact dups), ids with id % 11 == 3 append a mutation token to
    * their donor (near dup). ~60-260 tokens per doc.
    */
  def generate(spark: SparkSession, n: Long): DataFrame = {
    val words = (0 until 64).map(i => s"w$i")
    val wordArr = array(words.map(lit): _*)
    val mutated = pmod(col("id"), lit(11)) === 3 && pmod(col("id"), lit(7)) === 3
    val seed = when(pmod(col("id"), lit(7)).isin(1, 2), col("id") - pmod(col("id"), lit(7)))
      .when(mutated, col("id") - 3) // near dup: donor's text + one extra token
      .otherwise(col("id"))
    spark.range(0, n)
      .withColumn("seed", seed)
      .withColumn("base",
        concat_ws(" ", transform(
          sequence(lit(1), (pmod(xxhash64(col("seed")), lit(200)) + 60).cast("int")),
          i => element_at(wordArr,
            (pmod(xxhash64(col("seed") * 1000 + i), lit(64)) + 1).cast("int")))))
      .select(
        col("id").as("doc_id"),
        when(mutated, concat(col("base"), lit(" mutationtoken"))).otherwise(col("base")).as("text"),
        concat(lit("src"), pmod(col("id"), lit(3))).as("source"))
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALEEXT $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val docs = generate(spark, n).localCheckpoint() // materialize the corpus
    println(s"SCALEEXT corpus n=${docs.count()} " +
      s"tokens~=${docs.agg(sum(size(TextAnalysis.tokens(col("text"))))).head.getLong(0)}")

    val exact = t("exact-dedup")(
      Dedup.exact(docs, "doc_id", "text").count())
    // planted: for each donor d (id%7==0), ids d+1, d+2 are exact copies
    // -> distinct texts = n - (#copies). Mutated rows (%7==3) differ.
    val nCopies = docs.where(pmod(col("doc_id"), lit(7)).isin(1, 2)).count()
    require(exact == docs.count() - nCopies,
      s"exact dedup groups $exact != expected ${docs.count() - nCopies}")

    val pairs = t("minhash-pairs")(
      Dedup.minhashPairs(docs, "doc_id", "text").localCheckpoint())
    val nearCaught = pairs
      .where(pmod(col("id_b"), lit(11)) === 3 && col("id_a") === col("id_b") - 3)
      .count()
    val nearPlanted = docs.where(
      pmod(col("doc_id"), lit(11)) === 3 && pmod(col("doc_id"), lit(7)) === 3).count()
    println(s"SCALEEXT near-dup recall $nearCaught/$nearPlanted")
    require(nearCaught >= (nearPlanted * 9) / 10,
      s"minhash missed planted near-dups: $nearCaught/$nearPlanted")

    t("cluster-keep")(Dedup.clusterKeep(docs, "doc_id", pairs).count())

    // semanticDedup auto-k: the cluster-keyed exchange must widen with the
    // corpus (k = max(16, ceil(n/10k))), not stay pinned at the floor —
    // every seed claims its own cluster (self-distance 0), so the distinct
    // cluster count observed downstream equals k exactly.
    val nVec = math.max(n * 2, 200000L) // past the k=16 floor (>160k)
    val vecs = spark.range(0, nVec)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(8)),
          d => (pmod(xxhash64(col("id") * 8 + d), lit(1000)) / lit(500.0)) - 1.0)
          .as("embedding"))
    val expectedK = Similarity.autoClusterCount(nVec)
    require(expectedK > 16, s"vector corpus too small (n=$nVec -> k=$expectedK)")
    val semClusters = t("semantic-dedup-auto-k")(
      Similarity.semanticDedup(vecs).select("cluster").distinct().count())
    require(semClusters == expectedK,
      s"auto-k cluster parallelism $semClusters != expected $expectedK")

    // Two-level assignment linearity: auto-k grows with the corpus
    // (k = n/10k), so a flat nearest-of-k scan makes PER-ROW assignment
    // work grow linearly with n (the round-6 scale-killer: O(n²/10k)
    // total). The two-level form bounds per-row work at ~2√k. Measure the
    // exact per-row distance-fold count from the OUTPUT cluster histogram
    // (work = |live coarse cells| + |fine seeds in the row's cell|) at n
    // and 5n: k grows 5× but per-row work may grow at most ~√5× (bound
    // 3× with slack for cell imbalance; the flat scan would measure 5×).
    def embeddingsOf(m: Long): DataFrame = spark.range(0, m)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(8)),
          d => (pmod(xxhash64(col("id") * 8 + d), lit(1000)) / lit(500.0)) - 1.0)
          .as("embedding"))
    def perRowAssignWork(m: Long): Double = {
      val df = embeddingsOf(m)
      val kEff = Similarity.autoClusterCount(m)
      val seedVecs = df.orderBy("vec_id").limit(kEff).collect()
        .map(_.getSeq[Double](1).toArray)
      val coarse = seedVecs.take(Similarity.autoCoarseCount(seedVecs.length))
      val cellOf = seedVecs.map(Similarity.nearestIdx(_, coarse))
      val live = cellOf.distinct.length
      val cellSize = cellOf.groupBy(identity).map { case (c, xs) => (c, xs.length) }
      val hist = t(s"semantic-assign-n$m")(
        Similarity.semanticDedup(df).groupBy("cluster").count().collect())
      val total = hist.map { r =>
        r.getLong(1) * (live + cellSize(cellOf(r.getLong(0).toInt)))
      }.sum
      total.toDouble / m
    }
    val w1 = perRowAssignWork(nVec)
    val w2 = perRowAssignWork(nVec * 5)
    println(f"SCALEEXT semantic per-row assign work: n=$nVec -> $w1%.1f folds, " +
      f"n=${nVec * 5} -> $w2%.1f folds (flat scan would be " +
      s"${Similarity.autoClusterCount(nVec)} and ${Similarity.autoClusterCount(nVec * 5)})")
    require(w2 / w1 <= 3.0,
      f"two-level assignment no longer sub-linear: per-row work grew ${w2 / w1}%.2fx on 5x data")
    require(w2 < Similarity.autoClusterCount(nVec * 5),
      f"per-row work $w2%.1f not below the flat-scan k=${Similarity.autoClusterCount(nVec * 5)}")
    // round-8: assignment MEMORY is O(√k) — the engine's last run (the 5n
    // corpus above) collected/broadcast exactly min(ceil(√k), k) coarse
    // vectors, never the k fine seeds (those stay a distributed cell-keyed
    // table the corpus equi-joins; VERDICT r07 #1)
    val k5 = Similarity.autoClusterCount(nVec * 5)
    val (coarseN, liveN) = Similarity.lastAssignStats
    println(s"SCALEEXT semantic assign footprint: k=$k5 -> coarse=$coarseN live=$liveN")
    require(coarseN == math.min(Similarity.autoCoarseCount(k5), k5),
      s"driver-collected vectors $coarseN != ceil(sqrt(k))=${Similarity.autoCoarseCount(k5)}")
    require(coarseN.toLong * coarseN <= 4L * k5,
      s"coarse footprint $coarseN is not O(sqrt(k=$k5))")
    require(liveN > 0 && liveN <= coarseN, s"live cells $liveN out of bounds")

    // simhash recall regime: its features are UNIGRAMS, so the 64-word
    // soup above collapses every signature into a few hamming balls (the
    // adversarial regime the bucket cap guards — un-capped this corpus
    // OOMs). Recall is asserted on a wide-vocab (65k tokens) variant of
    // the same planted layout, where planted exact copies are hamming-0
    // pairs the band join MUST catch (pigeonhole is exact at hamming 0).
    val wideDocs = {
      val isCopy = pmod(col("id"), lit(7)).isin(1, 2)
      val seed2 = when(isCopy, col("id") - pmod(col("id"), lit(7))).otherwise(col("id"))
      spark.range(0, n)
        .withColumn("seed", seed2)
        .select(col("id").as("doc_id"),
          concat_ws(" ", transform(
            sequence(lit(1), (pmod(xxhash64(col("seed")), lit(100)) + 30).cast("int")),
            i => concat(lit("w"), pmod(xxhash64(col("seed") * 4096 + i), lit(65536)))))
            .as("text"))
        .localCheckpoint()
    }
    val shPairs = t("simhash-pairs")(
      Dedup.simhashPairs(wideDocs, "doc_id", "text").localCheckpoint())
    val copyCaught = shPairs
      .where(col("hamming") === 0 &&
        pmod(col("id_b"), lit(7)).isin(1, 2) &&
        col("id_a") === col("id_b") - pmod(col("id_b"), lit(7)))
      .count()
    val copyPairsPlanted = wideDocs.where(pmod(col("doc_id"), lit(7)).isin(1, 2)).count()
    require(copyCaught == copyPairsPlanted,
      s"simhash missed planted hamming-0 copies: $copyCaught/$copyPairsPlanted")

    // the low-entropy corpus itself must now be SAFE (capped), not fast:
    // the guard turns the would-be-quadratic join into a bounded one.
    t("simhash-lowentropy-capped")(
      Dedup.simhashPairs(docs, "doc_id", "text").count())

    // replayable HLL: state is 256 integer rows NO MATTER the corpus, and
    // the raw estimate lands within 10% of the true distinct count well
    // past the small-range regime.
    val hllKeys = docs.select((col("doc_id") * 37L).as("k"))
    val regs = t("hll-registers")(Sketches.hllRegisters(hllKeys, "k").localCheckpoint())
    require(regs.count() <= 256, "HLL register table exceeded 256 rows")
    val est = Sketches.hllSummary(regs).select("hll_est").head.getDouble(0)
    val truth = docs.count().toDouble
    require(math.abs(est - truth) / truth < 0.10,
      s"HLL estimate $est vs true $truth drifted past 10%")
    println(f"SCALEEXT hll est=$est%.0f true=$truth%.0f")

    // hashed classifier: the whole scoring pass must stay a zero-exchange
    // codegen projection at ANY corpus size (the structural claim, checked
    // on the scaled corpus itself, not a small fixture).
    val scored = TextAnalysis.classifierScore(docs, "doc_id", "text")
    val classifierPlan = scored.queryExecution.executedPlan.toString
    require(!classifierPlan.contains("Exchange"),
      "classifierScore shuffled at scale:\n" + classifierPlan)
    t("classifier-score")(scored.agg(sum(col("raw_score"))).head)

    val bench = generate(spark, 500).select(col("doc_id") + 10000000L alias "doc_id",
      col("text"), lit("bench").as("source"))
    val packed = t("training-set-assemble")(
      TrainingSet.assemble(docs, bench,
        weights = Map("src0" -> 2, "src1" -> 1, "src2" -> 1),
        tokenBudget = 512).localCheckpoint())
    val nPacked = packed.count()
    val badFills = packed.groupBy("source", "pack_idx")
      .agg(sum("n_tokens").as("fill"), max(col("oversize").cast("int")).as("over"))
      .where(col("fill") > 512 && col("over") === 0).count()
    require(badFills == 0, s"$badFills packs exceed the budget without an oversize doc")
    println(s"SCALEEXT packed rows=$nPacked ok")

    // bigram-LM cross-entropy at corpus scale: planted exact dups carry
    // their donor's text, so their per-doc NLL must be IDENTICAL to the
    // donor's (the replayable-sum discipline, checked structurally on
    // the scaled corpus — a float accumulation would drift here).
    val nll = t("bigram-xent")(
      Vocab.bigramCrossEntropy(docs, "doc_id", "text").localCheckpoint())
    val donors = nll.select(col("doc_id").as("d_id"), col("avg_nll").as("d_nll"))
    val dupMismatch = nll
      .where(pmod(col("doc_id"), lit(7)).isin(1, 2) &&
        !(pmod(col("doc_id"), lit(11)) === 3))
      .withColumn("d_id", col("doc_id") - pmod(col("doc_id"), lit(7)))
      .join(donors, Seq("d_id"))
      .where(col("avg_nll") =!= col("d_nll")).count()
    require(dupMismatch == 0,
      s"$dupMismatch exact-dup docs scored different NLL than their donor")

    // span-corruption accounting: token conservation is exact, and the
    // iid-start coverage 1-(4/5)^3 lands near 0.488 at corpus scale
    val masked = t("mask-spans")(
      Packing.maskSpans(docs, "doc_id", "text").localCheckpoint())
    val mRow = masked.agg(sum("n_tokens"), sum("n_masked")).head
    val (mTok, mMask) = (mRow.getLong(0), mRow.getLong(1))
    val corpusToks = docs
      .agg(sum(size(split(trim(col("text")), "\\s+")))).head.getLong(0)
    require(mTok == corpusToks, s"mask token count $mTok != corpus $corpusToks")
    val cover = mMask.toDouble / mTok
    require(cover > 0.43 && cover < 0.55,
      s"mask coverage $cover drifted from the 1-(4/5)^3=0.488 expectation")
    println(f"SCALEEXT mask coverage=$cover%.4f ok")

    // ANN recall@10 at 1M vectors (VERDICT r07 #8): planted cluster
    // structure — 100k centers in 16-d, 10 points each (center + 15%
    // noise) — gives the indexes real neighborhoods to find, and the
    // brute-force pass IS the oracle (recall is measured, not assumed).
    // Cluster SIZE ≈ k matters: PQ's ADC cannot rank within one code
    // cell (all members of a cell tie at the cell's distance), so with
    // 1000-point clusters its recall@10 is ~k/clusterSize by
    // construction (measured 0.016) no matter how good the codebook is;
    // 10-point clusters make the exact top-10 a resolvable target for
    // all three indexes. Queries are the first nq corpus vectors
    // (Pq.search's own protocol, so every method ranks the same query
    // set, self excluded).
    val annN = 1000000L
    val annD = 16
    val nq = 64
    def h01(c: org.apache.spark.sql.Column) =
      (pmod(xxhash64(c), lit(1000)) / lit(500.0)) - 1.0
    val annCorpus = spark.range(0, annN).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(annD)), j =>
        h01(pmod(col("id"), lit(100000)) * 131 + j) +
          h01(col("id") * annD + j + lit(777)) * 0.15).as("embedding"))
      .localCheckpoint()
    val annQueries = annCorpus.where(col("vec_id") < nq).localCheckpoint()
    val exactCos = t("ann-brute-cosine")(
      Similarity.cosineTopK(annQueries, annCorpus, 10).localCheckpoint())
    val exactN = exactCos.count().toDouble
    def recallOf(name: String, approx: DataFrame): Double = {
      val hits = exactCos.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count()
      val r = hits / exactN
      println(f"SCALEEXT ann-recall@10 $name%-4s $r%.3f (n=$annN nq=$nq)")
      r
    }
    val rLsh = recallOf("lsh",
      t("ann-lsh")(Similarity.lshTopK(annQueries, annCorpus, 10).localCheckpoint()))
    val ivfCents = t("ann-ivf-fit")(Ivf.fit(annCorpus, nCells = 256))
    val assigned = Ivf.assign(annCorpus, ivfCents).localCheckpoint()
    val rIvf = recallOf("ivf",
      t("ann-ivf-search")(
        Ivf.search(annQueries, assigned, ivfCents, k = 10, nProbe = 8)
          .localCheckpoint()))
    // PQ ranks by approximate L2, so its truth is the exact L2 top-10
    val exactL2 = {
      val q = annQueries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
      t("ann-brute-l2")(annCorpus
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("d2", aggregate(zip_with(col("qv"), col("cv"),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .select("query_id", "neighbor_id")
        .localCheckpoint())
    }
    // m=8/k=64 (2-d subspaces, 64 centroids each): the oracle default
    // m=4/k=16 is a COARSE quantizer whose product cells hold hundreds
    // of vectors at n=1M — ADC cannot rank inside a cell (all members
    // tie), so its recall@10 is cell-population-bounded (~0.1 measured)
    // regardless of codebook quality; the finer grid measures ADC as a
    // ranking method rather than the cell-size artifact
    val pqRes = t("ann-pq")(
      Pq.search(annCorpus, m = 8, k = 64, nq = nq, topK = 10).localCheckpoint())
    val rPq = {
      val hits = exactL2.join(pqRes.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
      val r = hits / exactL2.count().toDouble
      println(f"SCALEEXT ann-recall@10 pq   $r%.3f (vs exact-L2 truth)")
      r
    }
    require(rIvf >= 0.8, f"IVF nProbe=8 recall $rIvf%.3f below 0.8 on clustered data")
    require(rLsh >= 0.4, f"LSH recall $rLsh%.3f below 0.4 on clustered data")
    require(rPq >= 0.2, f"PQ recall $rPq%.3f below 0.2 on clustered data")
    // the IVFADC composite (cell-probed ADC over residual codes): recall
    // compounds IVF's probe coverage with PQ's in-cell ranking, and the
    // residual trick is what keeps the same k=64 codebook sharp here
    val ivfPqRes = t("ann-ivf-pq")(
      IvfPq.search(annCorpus, nCells = 256, m = 8, k = 64,
        nq = nq, topK = 10, nProbe = 8).localCheckpoint())
    val rIvfPq = {
      val hits = exactL2.join(ivfPqRes.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
      val r = hits / exactL2.count().toDouble
      println(f"SCALEEXT ann-recall@10 ivfpq $r%.3f (vs exact-L2 truth)")
      r
    }
    require(rIvfPq >= 0.5, f"IVF+PQ recall $rIvfPq%.3f below 0.5 on clustered data")
    // IVFADC+R: exact-cosine re-rank of the top-50 ADC shortlist. The
    // refine stage buys back ADC's quantization error — recall must be
    // MATERIALLY above the unrefined composite, approaching IVF's own
    // probe-coverage ceiling (truth = exact cosine, the metric the
    // refine stage ranks by).
    val ivfPqRRes = t("ann-ivf-pq-refined")(
      IvfPq.searchRefined(annCorpus, nCells = 256, m = 8, k = 64,
        nq = nq, topK = 10, nProbe = 8, refineC = 50).localCheckpoint())
    val rIvfPqR = recallOf("ivfpq+r", ivfPqRRes)
    require(rIvfPqR >= 0.9,
      f"IVFADC+R recall $rIvfPqR%.3f below 0.9 on clustered data")
    require(rIvfPqR > rIvfPq,
      f"refine stage did not improve recall ($rIvfPqR%.3f vs $rIvfPq%.3f)")
    spark.stop()
  }
}
