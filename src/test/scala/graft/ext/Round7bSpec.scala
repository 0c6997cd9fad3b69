package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-7 batch 2: k-core peeling, corpus BLEU-2, bigram-LM
  * cross-entropy, the histogram quantile sketch, and span-corruption
  * accounting.
  */
class Round7bSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- Graph.kcorePeel -----------------------------------------------------

  /** 4-clique with a 3-node tail hanging off node 4. */
  private def cliqueWithTail = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (6L, 7L)).toDF("a", "b")

  test("kcorePeel: the tail peels one node per round, the clique survives") {
    // k=2: round 1 drops 7 (deg 1), round 2 drops 6, round 3 drops 5 —
    // a genuinely multi-round peel (one round would keep 5 and 6)
    val got = Graph.kcorePeel(cliqueWithTail, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), s"2-core must be the clique: $got")
    assert(got.values.forall(_ == 3L), s"residual clique degrees must be 3: $got")
    // with only 1 round the peel must NOT have converged yet
    val oneRound = Graph.kcorePeel(cliqueWithTail, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(oneRound.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L),
      s"round 1 only removes the leaf: $oneRound")
  }

  test("kcorePeel: k=3 drops the whole tail in one round; empty 5-core") {
    val got = Graph.kcorePeel(cliqueWithTail, k = 3, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(Graph.kcorePeel(cliqueWithTail, k = 5, rounds = 2).isEmpty)
  }

  test("kcorePeel: partitioning-invariant (1 vs 16 partitions)") {
    val e = cliqueWithTail
    val a = Graph.kcorePeel(e.repartition(1), k = 2, rounds = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.kcorePeel(e.repartition(16), k = 2, rounds = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  // ---- Graph.personalizedPagerank ------------------------------------------

  test("personalizedPagerank: proximity to the seed decays along a path") {
    // path 1-2-3-4-5 seeded at 1: rank must strictly favor nodes near
    // the seed (2 over 4; 1 holds the teleport mass)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val m = Graph.personalizedPagerank(edges, seeds, iterations = 3)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(m(1L) > m(3L), s"seed must out-rank its 2-hop: $m")
    assert(m(2L) > m(4L), s"1-hop must out-rank 3-hop: $m")
    assert(m.getOrElse(5L, 0L) < m(2L))
  }

  test("personalizedPagerank: seeding every node reduces to pagerank") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val allNodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val ppr = Graph.personalizedPagerank(edges, allNodes, iterations = 3)
      .select("node", "rank_scaled").as[(Long, Long)].collect().sorted.toSeq
    val pr = Graph.pagerank(edges, iterations = 3)
      .select("node", "rank_scaled").as[(Long, Long)].collect().sorted.toSeq
    assert(ppr == pr)
  }

  test("personalizedPagerank: partitioning-invariant; off-graph seeds dropped") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val seeds = Seq(1L, 4L, 99L).toDF("node") // 99 is not in the graph
    val a = Graph.personalizedPagerank(edges.repartition(1), seeds, 3)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val b = Graph.personalizedPagerank(edges.repartition(16), seeds, 3)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(a == b)
    assert(!a.exists(_._1 == 99L))
  }

  // ---- Eval.spearmanRho ----------------------------------------------------

  test("spearmanRho: monotone agreement 1.0, reversal -1.0, permutation by hand") {
    val mono = (1 to 50).map(i => ("s", i.toLong, i.toDouble, i * 2.0 + 1))
      .toDF("slice", "id", "x", "y")
    val r1 = Eval.spearmanRho(mono, "slice", "x", "y", Seq(col("id"))).head()
    assert(r1.getAs[Double]("rho") == 1.0 && r1.getAs[Double]("d2") == 0.0)
    val rev = (1 to 50).map(i => ("s", i.toLong, i.toDouble, -i.toDouble))
      .toDF("slice", "id", "x", "y")
    val r2 = Eval.spearmanRho(rev, "slice", "x", "y", Seq(col("id"))).head()
    assert(r2.getAs[Double]("rho") == -1.0)
    // x ranks 1,2,3 / y ranks 2,1,3 -> d2 = 2, rho = 1 - 12/24 = 0.5
    val perm = Seq(("s", 1L, 1.0, 20.0), ("s", 2L, 2.0, 10.0),
      ("s", 3L, 3.0, 30.0)).toDF("slice", "id", "x", "y")
    val r3 = Eval.spearmanRho(perm, "slice", "x", "y", Seq(col("id"))).head()
    assert(r3.getAs[Double]("d2") == 2.0 && r3.getAs[Double]("rho") == 0.5)
  }

  test("spearmanRho: slices are independent; ties break on the pinned key") {
    val df = Seq(
      ("a", 1L, 1.0, 1.0), ("a", 2L, 2.0, 2.0),
      ("b", 1L, 1.0, 2.0), ("b", 2L, 2.0, 1.0),
      // slice c: all-tied x -> ranks follow the id tiebreak, y agrees
      ("c", 1L, 7.0, 1.0), ("c", 2L, 7.0, 2.0), ("c", 3L, 7.0, 3.0))
      .toDF("slice", "id", "x", "y")
    val m = Eval.spearmanRho(df, "slice", "x", "y", Seq(col("id")))
      .select("slice", "rho").as[(String, Double)].collect().toMap
    assert(m("a") == 1.0 && m("b") == -1.0 && m("c") == 1.0)
  }

  // ---- Eval.averagePrecisionByScore ----------------------------------------

  test("averagePrecisionByScore: hand-computed threshold sums") {
    // score desc: 4:pos 3:neg 2:pos 1:neg ->
    // AP = (1/2)(1/1) + (1/2)(2/3) = 0.5 + 0.333333
    val df = Seq(("s", 4.0, true), ("s", 3.0, false), ("s", 2.0, true),
      ("s", 1.0, false)).toDF("slice", "score", "y")
    val r = Eval.averagePrecisionByScore(df, "slice", "score", col("y")).head()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Double]("ap") == 0.833333, r.toString)
    // perfect ranking -> AP = 1; inverted -> (1/2)(1/3) + (1/2)(2/4)
    val perfect = Seq(("s", 4.0, true), ("s", 3.0, true), ("s", 2.0, false),
      ("s", 1.0, false)).toDF("slice", "score", "y")
    assert(Eval.averagePrecisionByScore(perfect, "slice", "score", col("y"))
      .head().getAs[Double]("ap") == 1.0)
    val inverted = Seq(("s", 4.0, false), ("s", 3.0, false), ("s", 2.0, true),
      ("s", 1.0, true)).toDF("slice", "score", "y")
    assert(Eval.averagePrecisionByScore(inverted, "slice", "score", col("y"))
      .head().getAs[Double]("ap") == 0.416667)
  }

  test("averagePrecisionByScore: all-negative slice scores 0; ties arrive together") {
    val df = Seq(("neg", 1.0, false), ("neg", 2.0, false),
      // tied score 5 carries 1 pos + 1 neg: single threshold,
      // AP = (1/1) * (1/2) = 0.5
      ("tie", 5.0, true), ("tie", 5.0, false)).toDF("slice", "score", "y")
    val m = Eval.averagePrecisionByScore(df, "slice", "score", col("y"))
      .select("slice", "ap").as[(String, Double)].collect().toMap
    assert(m("neg") == 0.0 && m("tie") == 0.5, m.toString)
  }

  // ---- Eval.fleissKappa ----------------------------------------------------

  test("fleissKappa: hand-computed 4-item 3-rater slice; unanimity scores 1") {
    // per-item positive votes 3,0,2,1: sum_sq=28, P-bar=2/3, p=1/2,
    // Pe=1/2 -> kappa = (2/3 - 1/2)/(1/2) = 1/3
    val df = Seq(
      ("s", true, true, true), ("s", false, false, false),
      ("s", true, true, false), ("s", true, false, false),
      ("u", true, true, true), ("u", true, true, true))
      .toDF("slice", "r1", "r2", "r3")
    val m = Eval.fleissKappa(df, "slice",
        Seq(col("r1"), col("r2"), col("r3")))
      .select("slice", "n_items", "sum_sq", "s_pos", "kappa")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m("s") == ((4L, 28L, 6L, 0.333333)), m.toString)
    // unanimous-everywhere slice: chance agreement is 1, convention 1.0
    assert(m("u") == ((2L, 18L, 6L, 1.0)), m.toString)
  }

  test("fleissKappa: independent random raters land near zero") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 4000).map(_ =>
      ("s", rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean()))
      .toDF("slice", "r1", "r2", "r3")
    val k = Eval.fleissKappa(df, "slice",
        Seq(col("r1"), col("r2"), col("r3")))
      .head().getAs[Double]("kappa")
    assert(math.abs(k) < 0.06, s"independent raters scored kappa=$k")
  }

  // ---- Graph.modularity ----------------------------------------------------

  test("modularity: two clean triangles score 0.25 each; one blob scores 0") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val goodLabels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "community")
    val got = Graph.modularity(tri, goodLabels)
      .select("community", "n_nodes", "e_in", "d_tot", "q_term")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 3L, 3L, 6L, 0.25), (20L, 3L, 3L, 6L, 0.25)), got)
    // the degenerate one-community partition always has Q = 0
    val oneLabel = goodLabels.withColumn("community", lit(1L))
    val blob = Graph.modularity(tri, oneLabel).head()
    assert(blob.getAs[Double]("q_term") == 0.0)
    // splitting a triangle across communities must score WORSE
    val badLabels = Seq((1L, 10L), (2L, 10L), (3L, 20L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "community")
    val badQ = Graph.modularity(tri, badLabels)
      .agg(sum(round(col("q_term") * 1000000).cast("long"))).head().getLong(0)
    assert(badQ < 500000L, s"split partition must lose modularity: $badQ")
  }

  // ---- Similarity.topEigenvector -------------------------------------------

  test("topEigenvector: diagonal covariance converges onto the top axis") {
    val cov = Seq((0L, 0L, 2.0), (0L, 1L, 0.0), (1L, 1L, 1.0))
      .toDF("i", "j", "cov")
    val got = Similarity.topEigenvector(cov, iterations = 3)
      .select("i", "v_scaled", "lambda")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq(1000000L, 125000L), got.toString)
    val lambda = got.head._3
    assert(lambda > 1.9 && lambda <= 2.0, s"lambda=$lambda")
  }

  test("topEigenvector: the all-ones eigenvector is an exact fixed point") {
    // [[1,1],[1,1]] has eigenvector (1,1), eigenvalue 2 — integer-exact
    val cov = Seq((0L, 0L, 1.0), (0L, 1L, 1.0), (1L, 1L, 1.0))
      .toDF("i", "j", "cov")
    val got = Similarity.topEigenvector(cov, iterations = 3)
      .select("v_scaled", "lambda").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1000000L))
    assert(got.head._2 == 2.0)
  }

  test("topEigenvector: negative off-diagonals keep signed components exact") {
    // [[2,-1],[-1,2]]: top eigenvector (1,-1), eigenvalue 3
    val cov = Seq((0L, 0L, 2.0), (0L, 1L, -1.0), (1L, 1L, 2.0))
      .toDF("i", "j", "cov")
    val a = Similarity.topEigenvector(cov.repartition(1), iterations = 4)
      .select("i", "v_scaled", "lambda")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Similarity.topEigenvector(cov.repartition(7), iterations = 4)
      .select("i", "v_scaled", "lambda")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // starting at (1,1) the first step lands on (1,1)·1 — a fixed point
    // of the OTHER eigenvalue would stall; the planted asymmetry is
    // absent here so the iterate stays symmetric and lambda reads 1.0
    // ((1,1) is the lambda=1 eigenvector of this matrix)
    assert(a.head._3 == 1.0, a.toString)
  }

  // ---- DataOps.interleaveWeighted ------------------------------------------

  test("interleaveWeighted: hand-computed order, weight-2 source surfaces 2x") {
    val df = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
      (10L, "B"), (11L, "B")).toDF("doc_id", "source")
    val got = DataOps.interleaveWeighted(df, "doc_id", "source",
        when(col("source") === "A", 2L).otherwise(1L))
      .select("pos", "doc_id", "source")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    // A keys: .5M, 1M, 1.5M, 2M; B keys: 1M, 2M; ties break source asc
    val expect = Seq((0L, 1L, "A"), (1L, 2L, "A"), (2L, 10L, "B"),
      (3L, 3L, "A"), (4L, 4L, "A"), (5L, 11L, "B"))
    assert(got == expect, got.toString)
  }

  test("interleaveWeighted: dense total order, restart-stable at 600 docs") {
    val df = (1L to 600L).map(i => (i, s"src${i % 6}")).toDF("doc_id", "source")
    val wExpr = expr("1 + CAST(substring(source, 4, 10) AS BIGINT) % 3")
    val a = DataOps.interleaveWeighted(df.repartition(1), "doc_id", "source", wExpr)
      .select("pos", "doc_id").as[(Long, Long)].collect().sorted.toSeq
    val b = DataOps.interleaveWeighted(df.repartition(16), "doc_id", "source", wExpr)
      .select("pos", "doc_id").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
    assert(a.map(_._1) == (0L until 600L))
  }

  // ---- Eval.corpusBleu -----------------------------------------------------

  test("corpusBleu: hand-computed counts on a 14-token doc") {
    // tokens a..n; dropEvery=7 removes positions 7 ("g") and 14 ("n"):
    // cand has 12 unigrams (all in ref -> match1 = total1 = 12) and 11
    // bigrams, of which exactly one ("f h", bridging the deletion) is
    // not a ref bigram -> match2 = 10, total2 = 11
    val doc = Seq((1L, "a b c d e f g h i j k l m n")).toDF("doc_id", "text")
    val r = Eval.corpusBleu(doc, "doc_id", "text", dropEvery = 7).head()
    assert(r.getAs[Long]("match1") == 12L && r.getAs[Long]("total1") == 12L)
    assert(r.getAs[Long]("match2") == 10L && r.getAs[Long]("total2") == 11L)
    assert(r.getAs[Long]("ref_len") == 14L && r.getAs[Long]("cand_len") == 12L)
    assert(r.getAs[Double]("p1") == 1.0)
    val p2 = 10.0 / 11.0
    val bp = math.exp(1.0 - 14.0 / 12.0)
    val expect = BigDecimal(bp * math.exp(0.5 * (math.log(1.0) + math.log(p2))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("bleu") - expect) < 2e-6,
      s"bleu=${r.getAs[Double]("bleu")} expect=$expect")
    assert(r.getAs[Double]("bleu") > 0.0 && r.getAs[Double]("bleu") < 1.0)
  }

  test("corpusBleu: identical candidate scores BLEU 1.0 when nothing drops") {
    // every doc shorter than dropEvery tokens -> candidate == reference
    val docs = Seq((1L, "x y z"), (2L, "p q")).toDF("doc_id", "text")
    val r = Eval.corpusBleu(docs, "doc_id", "text", dropEvery = 7).head()
    assert(r.getAs[Long]("ref_len") == r.getAs[Long]("cand_len"))
    assert(r.getAs[Double]("bleu") == 1.0 && r.getAs[Double]("bp") == 1.0)
  }

  // ---- Vocab.bigramCrossEntropy --------------------------------------------

  test("bigramCrossEntropy: add-one-smoothed NLL on a 2-doc corpus") {
    // corpus "a a a" + "a b": c1(a)=4, V=2; p(a|a)=(2+1)/(4+2)=1/2,
    // p(b|a)=(1+1)/(4+2)=1/3
    val docs = Seq((1L, "a a a"), (2L, "a b")).toDF("doc_id", "text")
    val got = Vocab.bigramCrossEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "avg_nll")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val nllHalf = BigDecimal(-math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nllThird = BigDecimal(-math.log(1.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 2L), (2L, 1L)))
    assert(math.abs(got(0)._3 - nllHalf) < 1e-9, s"${got(0)}")
    assert(math.abs(got(1)._3 - nllThird) < 1e-9, s"${got(1)}")
  }

  test("bigramCrossEntropy: sub-2-token docs are absent; order-invariant") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "w w w w")).toDF("doc_id", "text")
    val got = Vocab.bigramCrossEntropy(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
    val big = (1L to 200L).map(i => (i, s"t$i u$i t$i u$i")).toDF("doc_id", "text")
    val a = Vocab.bigramCrossEntropy(big.repartition(1), "doc_id", "text")
      .select("doc_id", "nll_total").as[(Long, Double)].collect().sorted.toSeq
    val b = Vocab.bigramCrossEntropy(big.repartition(16), "doc_id", "text")
      .select("doc_id", "nll_total").as[(Long, Double)].collect().sorted.toSeq
    assert(a == b)
  }

  // ---- Sketches.histogramQuantiles -----------------------------------------

  test("histogramQuantiles: uniform 1..100 grid reads off bin lower bounds") {
    val df = (1L to 100L).toDF("v")
    val got = Sketches.histogramQuantiles(df, col("v"), nBins = 10,
      quantilesPct = Seq(50, 90))
      .select("q", "target", "bin", "lo_grid")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // lo=1, span=100: bin b covers [1+10b, 10+10b]; target(50)=50 -> bin 4
    assert(got == Seq((50L, 50L, 4L, 41L), (90L, 90L, 8L, 81L)), got.toString)
  }

  test("histogramQuantiles: estimate is within one bin width of exact") {
    val vals = (1 to 3000).map(i => ((i.toLong * 7919L) % 10007L) + 1L)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    val got = Sketches.histogramQuantiles(df, col("v"), nBins = 128,
      quantilesPct = Seq(25, 50, 75, 99))
      .select("q", "lo_grid").as[(Long, Long)].collect().toMap
    val span = sorted.max - sorted.min + 1
    val width = span / 128 + 1
    for ((q, est) <- got) {
      val exact = sorted(((q * vals.size + 99) / 100 - 1).toInt)
      assert(est <= exact && exact - est <= width,
        s"q=$q est=$est exact=$exact width=$width")
    }
  }

  // ---- Packing.maskSpans ---------------------------------------------------

  test("maskSpans: coverage matches a driver-side replay of the same hash") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two")).toDF("doc_id", "text")
    val got = Packing.maskSpans(docs, "doc_id", "text", every = 3, spanLen = 2)
      .select("doc_id", "n_tokens", "n_masked", "n_spans")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // replay: pull the start flags straight from the same kernel, then
    // fold coverage/spans in plain Scala
    val flags = docs
      .select(col("doc_id"), explode(sequence(lit(1L),
        size(split(trim(col("text")), "\\s+")).cast("long"))).as("i"))
      .withColumn("st", pmod(HashExprs.mix64(col("doc_id") * lit(100003L)
        + col("i")), lit(3L)) === 0L)
      .as[(Long, Long, Boolean)].collect()
      .groupBy(_._1).map { case (d, rows) =>
        d -> rows.sortBy(_._2).map(_._3)
      }
    val expect = flags.map { case (d, st) =>
      val cov = st.indices.map(i =>
        (math.max(0, i - 1) to i).exists(st(_)))
      val spans = cov.indices.count(i => cov(i) && (i == 0 || !cov(i - 1)))
      (d, st.length.toLong, cov.count(identity).toLong, spans.toLong)
    }.toSeq.sortBy(_._1)
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("maskSpans: invariants and partitioning-invariance at 500 docs") {
    val docs = (1L to 500L)
      .map(i => (i, (1 to (i % 37 + 1).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Packing.maskSpans(docs, "doc_id", "text")
    val rows = r.select("doc_id", "n_tokens", "n_masked", "n_spans")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 500)
    for ((_, n, m, sp) <- rows) {
      assert(m >= 0L && m <= n)
      assert((sp == 0L) == (m == 0L))
      // each maximal run has >= 1 token; runs can chain past spanLen when
      // starts overlap, so there is no 3-per-span upper bound
      assert(m >= sp)
    }
    val b = Packing.maskSpans(docs.repartition(16), "doc_id", "text")
      .select("doc_id", "n_tokens", "n_masked", "n_spans")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.sorted.toSeq == b.sorted.toSeq)
  }
}
