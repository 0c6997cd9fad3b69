package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-11 additions: deterministic fixed-round Louvain (modularity must
  * actually IMPROVE over label propagation — the whole point of the
  * operator), theta-sketch set algebra (exact below k, accurate and
  * internally consistent above), and the round's advisory hardenings
  * (waterfill input validation, TOST small-n flag).
  */
class Round11Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def modQ(edges: org.apache.spark.sql.DataFrame,
      labels: org.apache.spark.sql.DataFrame): Double =
    Graph.modularity(edges, labels)
      .agg(sum(col("q_term"))).head().getDouble(0)

  // ---- Graph.louvain -------------------------------------------------------

  test("louvain: two K4 cliques + one bridge resolve to the two cliques") {
    val k4a = for (i <- 0 to 3; j <- 0 to 3 if i < j) yield (i.toLong, j.toLong)
    val k4b = for (i <- 10 to 13; j <- 10 to 13 if i < j)
      yield (i.toLong, j.toLong)
    val edges = (k4a ++ k4b :+ (3L, 10L)).toDF("a", "b")
    val got = Graph.louvain(edges)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L))
    val comA = Set(0L, 1L, 2L, 3L).map(got)
    val comB = Set(10L, 11L, 12L, 13L).map(got)
    assert(comA.size == 1 && comB.size == 1 && comA != comB,
      s"expected the two cliques as communities, got $got")
  }

  /** Ring of 8 K5 cliques — the canonical Louvain fixture: each clique is
    * one community; the Q of that partition is ≈ 0.77.
    */
  private def ringOfCliques: org.apache.spark.sql.DataFrame = {
    val cliques = for {
      c <- 0 until 8
      i <- 0 until 5; j <- 0 until 5 if i < j
    } yield ((c * 100 + i).toLong, (c * 100 + j).toLong)
    val ring = (0 until 8).map(c =>
      (math.min(c * 100, ((c + 1) % 8) * 100).toLong,
        math.max(c * 100, ((c + 1) % 8) * 100).toLong))
    (cliques ++ ring).toDF("a", "b")
  }

  test("louvain: ring of cliques — recovers the cliques and beats label_prop on Q") {
    val edges = ringOfCliques.localCheckpoint(true)
    val lv = Graph.louvain(edges)
    // every clique uniform, 8 distinct communities
    val comPerClique = lv.withColumn("clique", col("node") / 100)
      .groupBy("clique").agg(countDistinct(col("community")).as("nc"))
      .agg(max("nc")).head().getLong(0)
    assert(comPerClique == 1L, "a clique was split across communities")
    assert(lv.select(countDistinct(col("community"))).head().getLong(0) == 8L)
    val qLv = modQ(edges, lv)
    val qLp = modQ(edges, Graph.labelPropagation(edges, rounds = 4)
      .withColumnRenamed("community", "community"))
    assert(qLv > 0.7, s"Q(louvain) = $qLv")
    assert(qLv >= qLp - 1e-9, s"Q(louvain)=$qLv < Q(label_prop)=$qLp")
  }

  test("louvain: beats (or ties) label_prop on Q on the co-purchase fixture graph") {
    val edges = Graph.coOccurrenceEdges(
      graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .where(col("l_partkey") % 4 === 0),
      "l_orderkey", "l_partkey").localCheckpoint(true)
    val qLv = modQ(edges, Graph.louvain(edges))
    val qLp = modQ(edges, Graph.labelPropagation(edges, rounds = 4))
    assert(qLv >= qLp - 1e-9, s"Q(louvain)=$qLv < Q(label_prop)=$qLp")
    assert(qLv > 0.0, s"Q(louvain)=$qLv must be positive")
  }

  test("louvain: modularity is non-degenerate — not one giant community, not all singletons") {
    val edges = ringOfCliques
    val lv = Graph.louvain(edges)
    val n = lv.count()
    val nc = lv.select(countDistinct(col("community"))).head().getLong(0)
    assert(nc > 1L && nc < n, s"degenerate partition: $nc communities / $n nodes")
  }

  // ---- Sketches theta algebra ----------------------------------------------

  test("thetaPairAlgebra: below k the sketches are exact sets — every estimate exact") {
    val df = ((1L to 10L).map(i => ("a", i)) ++
      (6L to 20L).map(i => ("b", i))).toDF("g", "key")
    val r = Sketches.thetaPairAlgebra(df, "g", "key", k = 64).collect().head
    assert(r.getAs[Double]("theta") == 1.0)
    assert(r.getAs[Long]("k_used") == 20L)
    assert(r.getAs[Double]("est_a") == 10.0)
    assert(r.getAs[Double]("est_b") == 15.0)
    assert(r.getAs[Double]("est_union") == 20.0)
    assert(r.getAs[Double]("est_intersect") == 5.0)
    assert(r.getAs[Double]("est_a_not_b") == 5.0)
    assert(r.getAs[Double]("est_b_not_a") == 10.0)
  }

  test("thetaPairAlgebra: full sketches — accurate on planted overlap, internally consistent") {
    // |A| = 5000, |B| = 5000, overlap 2500 → union 7500
    val df = ((1L to 5000L).map(i => ("a", i)) ++
      (2501L to 7500L).map(i => ("b", i))).toDF("g", "key")
    val r = Sketches.thetaPairAlgebra(df, "g", "key", k = 256).collect().head
    val (u, ix, ab, ba) = (r.getAs[Double]("est_union"),
      r.getAs[Double]("est_intersect"), r.getAs[Double]("est_a_not_b"),
      r.getAs[Double]("est_b_not_a"))
    assert(math.abs(u - 7500.0) / 7500.0 < 0.25, s"union $u")
    assert(math.abs(ix - 2500.0) / 2500.0 < 0.5, s"intersect $ix")
    assert(math.abs(ab - 2500.0) / 2500.0 < 0.5, s"a_not_b $ab")
    assert(math.abs(ba - 2500.0) / 2500.0 < 0.5, s"b_not_a $ba")
    // the sample partitions exactly: ∩ + (A−B) + (B−A) = ∪ (up to round-6)
    assert(math.abs(ix + ab + ba - u) < 1e-5)
    assert(math.abs(r.getAs[Double]("est_a") - 5000.0) / 5000.0 < 0.3)
    assert(math.abs(r.getAs[Double]("est_b") - 5000.0) / 5000.0 < 0.3)
  }

  test("thetaPairAlgebra: overflowing merge takes the re-trim path (θ moves down, k−1 kept)") {
    // disjoint full sketches: the merged sample has up to 2(k−1) members
    val df = ((1L to 200L).map(i => ("a", i)) ++
      (10001L to 10200L).map(i => ("b", i))).toDF("g", "key")
    val r = Sketches.thetaPairAlgebra(df, "g", "key", k = 64).collect().head
    assert(r.getAs[Long]("k_used") == 63L, "trim must engage")
    assert(r.getAs[Double]("est_intersect") == 0.0)
    val u = r.getAs[Double]("est_union")
    assert(math.abs(u - 400.0) / 400.0 < 0.4, s"union $u")
    // trimmed θ is strictly below both sides' own inclusion thresholds
    assert(r.getAs[Double]("theta") < 1.0)
  }

  test("thetaSketches compose: algebra over a PERSISTED sketch table needs no corpus") {
    val df = ((1L to 500L).map(i => ("a", i)) ++
      (251L to 750L).map(i => ("b", i))).toDF("g", "key")
    val sk = Sketches.thetaSketches(df, "g", "key", k = 64)
      .localCheckpoint(true) // stands in for a stored sketch table
    val viaSketches =
      Sketches.thetaAlgebraFromSketches(sk, "g", k = 64).collect().head
    val direct = Sketches.thetaPairAlgebra(df, "g", "key", k = 64)
      .collect().head
    assert(viaSketches.toSeq == direct.toSeq)
  }

  // ---- advisory hardenings -------------------------------------------------

  test("waterfill: weight < 1 and negative avail are loud errors, not silent nonsense") {
    val bad1 = Seq(("A", 0L, 100L), ("B", 1L, 100L)).toDF("k", "w", "a")
    val e1 = intercept[Exception] {
      DataOps.waterfill(bad1, "k", "w", "a", budget = 50L).collect()
    }
    assert(e1.getMessage != null)
    val bad2 = Seq(("A", 1L, -5L), ("B", 1L, 100L)).toDF("k", "w", "a")
    intercept[Exception] {
      DataOps.waterfill(bad2, "k", "w", "a", budget = 50L).collect()
    }
  }

  test("tostEquivalence: large_n flags the cohorts where the z approximation holds") {
    // group "big": 200 rows per cohort; group "tiny": 3 per cohort with
    // spread (nonzero variance) so it survives the se > 0 guard
    val big = (0 until 400).map(i => ("big", i.toLong, (i % 7).toDouble))
    val tiny = Seq(("tiny", 0L, 1.0), ("tiny", 1L, 5.0), ("tiny", 2L, 2.0),
      ("tiny", 3L, 4.0), ("tiny", 4L, 3.0), ("tiny", 5L, 6.0))
    val got = Analytics.tostEquivalence((big ++ tiny).toDF("g", "id", "v"),
        "g", "v", col("id") % 2 === 0, margin = 5.0)
      .select("g", "large_n").as[(String, Boolean)].collect().toMap
    assert(got == Map("big" -> true, "tiny" -> false))
  }
}
