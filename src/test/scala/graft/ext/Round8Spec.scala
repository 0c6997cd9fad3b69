package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-8 hardening (ADVICE r07 + VERDICT r07 ceilings): rendezvous
  * sharding's constant-size loop form, empty-interval overlap semantics,
  * wide-grid histogram binning, Neyman moment consistency, and the BPE
  * memo's data fingerprint.
  */
class Round8Spec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- DataOps.rendezvousShard --------------------------------------------

  /** Scalar replay of the rendezvous argmax (ties to smallest shard id). */
  private def rendezvousScalar(key: Long, nShards: Int): Long = {
    var bestW = 0L
    var bestH = Aggs.mix64(key * 1000003L)
    var w = 1L
    while (w < nShards) {
      val h = Aggs.mix64(key * 1000003L + w)
      if (h > bestH) { bestH = h; bestW = w }
      w += 1
    }
    bestW
  }

  test("rendezvousShard: loop form at 1024 shards matches the unrolled form's semantics") {
    val keys = (0L until 1000L).toDF("k")
    // 1024 > 256 routes through the aggregate-HOF loop form — the
    // generated code is constant-size in nShards (VERDICT r07 #4)
    val got = keys.select(col("k"),
        DataOps.rendezvousShard(col("k"), 1024).as("s"))
      .as[(Long, Long)].collect().toMap
    keys.as[Long].collect().foreach { k =>
      assert(got(k) == rendezvousScalar(k, 1024), s"key $k")
    }
  }

  test("rendezvousShard: unrolled (<=256) and loop (>256) forms agree where both apply") {
    // same shard function, two code paths: replay the scalar oracle at a
    // fold-form count too, so the two forms are pinned to ONE definition
    val keys = (0L until 500L).toDF("k")
    val fold = keys.select(col("k"),
        DataOps.rendezvousShard(col("k"), 64).as("s"))
      .as[(Long, Long)].collect().toMap
    keys.as[Long].collect().foreach { k =>
      assert(fold(k) == rendezvousScalar(k, 64), s"key $k")
    }
  }

  test("rendezvousShard: growing 1024 -> 1025 only moves keys to the new shard") {
    val keys = (0L until 2000L).toDF("k")
    val before = keys.select(col("k"), DataOps.rendezvousShard(col("k"), 1024).as("s"))
      .as[(Long, Long)].collect().toMap
    val after = keys.select(col("k"), DataOps.rendezvousShard(col("k"), 1025).as("s"))
      .as[(Long, Long)].collect().toMap
    before.foreach { case (k, s) =>
      assert(after(k) == s || after(k) == 1024L,
        s"key $k moved $s -> ${after(k)}: rendezvous must never reshuffle survivors")
    }
  }

  // ---- Joins.intervalOverlapJoin: empty intervals -------------------------

  test("intervalOverlapJoin: empty intervals [t, t) match nothing on either side") {
    def ts(s: String) = Timestamp.valueOf(s)
    // right interval covers 10:00-11:00; left has an EMPTY interval at
    // 10:30 (inside it) and another empty one exactly on a bin boundary
    // (11:00 with 60-min bins — the descending-sequence trap)
    val left = Seq(
      (1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:00")),
      (2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:00:00")),
      (3L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00"))
    ).toDF("lid", "ls", "le")
    val right = Seq(
      (9L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("rid", "rs", "re")
    val got = Joins.intervalOverlapJoin(left, "ls", "le", right, "rs", "re",
        binMinutes = 60)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 9L)),
      s"only the non-empty overlapping interval may match: $got")
    // and symmetrically: an empty RIGHT interval matches nothing
    val got2 = Joins.intervalOverlapJoin(right, "rs", "re", left, "ls", "le",
        binMinutes = 60)
      .select("rid", "lid").as[(Long, Long)].collect().toSet
    assert(got2 == Set((9L, 3L)), s"empty right intervals must not match: $got2")
  }

  // ---- Sketches.histogramQuantiles: wide grids ----------------------------

  test("histogramQuantiles: wide grid — (gv-lo)*nBins would wrap a long; decimal math must not") {
    val big = 4000000000000000000L // 4e18; span ~8e18, *4 overflows Long
    val df = Seq(-big, 0L, big).toDF("v")
    val got = Sketches.histogramQuantiles(df, col("v"), nBins = 4,
        quantilesPct = Seq(50, 100))
      .select("q", "bin", "lo_grid").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // span = 2*big+1; bin(v) = (v+big)*4 div span: -big->0, 0->1, big->3
    assert(got(50L) == ((1L, -big / 2)),
      s"median must land in bin 1 (lower bound -2e18): ${got(50L)}")
    assert(got(100L)._1 == 3L, s"max must land in the top bin: ${got(100L)}")
  }

  test("histogramBinStream: wide grid bins agree with the batch kernel (plan is batch-runnable)") {
    val big = 4000000000000000000L
    val df = Seq(-big, 0L, big, Long.MinValue).toDF("v")
    val got = graft.streaming.StreamingOps
      .histogramBinStream(df, col("v"), lo = -big, span = 2 * big + 1, nBins = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 3L -> 1L, -1L -> 1L),
      s"wide-grid stream bins wrong: $got")
  }

  // ---- DataOps.neymanSample: fractional value columns ---------------------

  test("neymanSample: fractional values yield consistent moments (no NaN sd/weights)") {
    // stratum a: constant 0.5 — the old mixed round(x)*x moments gave
    // sxx - sx^2/n < 0 -> sd = NaN -> NaN weights; consistent moments
    // give sd = 0. stratum b varies, so it should absorb the budget.
    val df = ((0L until 50L).map(i => ("a", 0.5, i)) ++
        (0L until 50L).map(i => ("b", i * 1000.0, i + 100L)))
      .toDF("src", "x", "id")
    val got = DataOps.neymanSample(df, "src", "x", "id", budget = 40)
      .select("src", "alloc").as[(String, Long)].collect()
    assert(got.nonEmpty, "sample must be non-empty")
    val alloc = got.groupBy(_._1).map { case (k, v) => k -> v.head._2 }
    assert(alloc.values.forall(a => a >= 1L),
      s"every stratum draws at least 1: $alloc")
    assert(alloc("b") > alloc("a"),
      s"the varying stratum must out-allocate the constant one: $alloc")
  }

  // ---- ExtQueries BPE memo fingerprint ------------------------------------

  test("docsFingerprint: regenerating documents.parquet in place changes the memo key") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-memo").toString
    Seq((1L, "aa bb")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val f1 = graft.queries.ExtQueries.docsFingerprint(spark, dir)
    val f1again = graft.queries.ExtQueries.docsFingerprint(spark, dir)
    assert(f1 == f1again, "fingerprint must be stable on unchanged data")
    Thread.sleep(1100) // parquet mtimes have second granularity on some FS
    Seq((1L, "cc dd"), (2L, "ee ff")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val f2 = graft.queries.ExtQueries.docsFingerprint(spark, dir)
    assert(f1 != f2, "rewritten data must change the fingerprint (stale-memo guard)")
  }

  // ---- incremental SemDeDup ------------------------------------------------

  test("incremental SemDeDup: frozen corpus clusters screen a new period") {
    val rnd = new scala.util.Random(7)
    // corpus: 3 orthogonal direction clusters (10 each) in 8-d
    val corpus = (0 until 30).map { i =>
      val axis = i / 10
      val v = Array.tabulate(8)(d =>
        (if (d == axis) 1.0 else 0.0) + 0.03 * rnd.nextGaussian())
      (i.toLong, v.toSeq)
    }
    val corpusDf = corpus.toDF("vec_id", "embedding")
    // batch: a near-copy of corpus vector 5 (same direction) + a novel
    // orthogonal direction no corpus cluster occupies
    val nearDup = corpus(5)._2.map(_ * 1.001)
    val novel = Array.tabulate(8)(d => if (d == 6) 1.0 else 0.0).toSeq
    val batchDf = Seq((100L, nearDup), (101L, novel)).toDF("vec_id", "embedding")

    val out = Similarity.semanticDedupIncremental(corpusDf, batchDf,
        k = 0, band = 8, tau = 0.4)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out.keySet == Set(100L, 101L), "one verdict per batch row")
    assert(!out(100L), "near-dup of corpus content must be dropped")
    assert(out(101L), "novel direction must be kept")

    // the corpus is NOT re-deduped and batch rows never pair with each
    // other: a second identical batch row still gets the same verdict
    val out2 = Similarity.semanticDedupIncremental(corpusDf,
        Seq((100L, nearDup), (102L, nearDup)).toDF("vec_id", "embedding"),
        k = 0, band = 8, tau = 0.4)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!out2(100L) && !out2(102L),
      "verdicts are per-row against the corpus, not order-dependent within the batch")
  }

  // ---- IvfPq composite ----------------------------------------------------

  test("IVF+PQ composite: same-cluster hits dominate; partition-invariant") {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(8, 32)(rnd.nextGaussian().toFloat)
    val data = (0 until 8).flatMap { c =>
      (0 until 10).map { i =>
        val v = centers(c).map(x => x + 0.05f * rnd.nextGaussian().toFloat)
        // permute ids so clusters interleave across the id space (the
        // stride-init coverage rule from the Ivf spec)
        (((c * 10 + i) * 13L) % 80, v, c)
      }
    }
    val df = data.toDF("vec_id", "embedding", "cluster")
    val byCluster = data.map(t => t._1 -> t._3).toMap

    def run(d: org.apache.spark.sql.DataFrame) =
      IvfPq.search(d, nCells = 10, m = 4, k = 16, nq = 8, topK = 3, nProbe = 2)

    val rows = run(df).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // residual quantization must keep ADC sharp enough that probed
    // same-cluster members out-rank cross-cluster candidates
    val same = rows.count { case (q, n) => byCluster(q) == byCluster(n) }
    assert(same.toDouble / rows.length >= 0.8,
      s"same-cluster precision ${same.toDouble / rows.length} ($same/${rows.length})")

    // the oracle contract: the full chain (init, Lloyd, residual
    // codebook, codes, probes, ADC) is bit-identical across partitionings
    val a = run(df.repartition(1)).as[(Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._4))
    val b = run(df.repartition(32)).as[(Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._4))
    assert(a.toSeq == b.toSeq, "composite chain not partition-invariant")
  }
}
