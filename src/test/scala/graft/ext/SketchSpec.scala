package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.sources.Tables

/** Error-bound gates for the approximate aggregates (no DuckDB oracle —
  * sketch values are engine-specific; the contract is bounded error vs the
  * exact answer plus lossless mergeability).
  */
class SketchSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact per group") {
    val approx = Sketches.approxDistinct(
      Tables.lineitem(spark, dir), Seq("l_returnflag"), "l_partkey")
      .as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"group $k: approx=$a exact=$e")
    }
  }

  test("HLL sketches built per half union to the whole-table estimate") {
    val li = Tables.lineitem(spark, dir)
    val halfA = li.where(col("l_orderkey") % 2 === 0)
    val halfB = li.where(col("l_orderkey") % 2 === 1)
    // one sketch per (group, period)
    val perPeriod = Sketches.distinctSketch(halfA, Seq("l_returnflag"), "l_partkey")
      .unionByName(Sketches.distinctSketch(halfB, Seq("l_returnflag"), "l_partkey"))
    val merged = Sketches.mergeSketches(perPeriod, Seq("l_returnflag"))
      .as[(String, Double)].collect().toMap
    // vs sketching the whole table in one pass
    val whole = Sketches.mergeSketches(
      Sketches.distinctSketch(li, Seq("l_returnflag"), "l_partkey"), Seq("l_returnflag"))
      .as[(String, Double)].collect().toMap
    val exact = li.groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    for ((k, e) <- exact) {
      // merged-vs-whole are not bitwise equal (sketch promotion depends on
      // insertion order) but must agree within the sketch's own error band
      assert(math.abs(merged(k) - whole(k)) / e <= 0.03,
        s"group $k: merged=${merged(k)} whole=${whole(k)}")
      assert(math.abs(merged(k) - e) / e <= 0.05, s"group $k: merged=${merged(k)} exact=$e")
    }
  }

  test("percentile_approx tracks the exact percentile") {
    val approx = Sketches.approxQuantiles(
      Tables.orders(spark, dir), Seq("o_orderpriority"), "o_totalprice", Seq(0.5, 0.9))
      .as[(String, Seq[Double])].collect().toMap
    val exact = Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9))").as("q"))
      .as[(String, Seq[Double])].collect().toMap
    for ((k, es) <- exact; (a, e) <- approx(k).zip(es)) {
      assert(math.abs(a - e) / e <= 0.02, s"group $k: approx=$a exact=$e")
    }
  }

  test("CMS join-size estimate: never under, exact when keys don't collide") {
    // small key domain (20 keys << 1024 cells): at least one depth row
    // hashes them collision-free (deterministic — fixed mix64), so the
    // min-row estimate recovers Σ fA(k)·fB(k) EXACTLY
    val a = spark.range(0, 300).select((col("id") % 20).as("k"))
    val b = spark.range(0, 500).select((col("id") % 20).as("k"))
    val est = Sketches.countMinJoinSize(
        Sketches.countMinCounters(a, "k"), Sketches.countMinCounters(b, "k"))
      .as[Long].collect()(0)
    val exact = a.join(b, "k").count()
    assert(est == exact, s"collision-free CMS estimate $est != exact $exact")

    // colliding regime (20k keys, 1024 cells): still an upper bound, and
    // within the AMS expectation est <= exact + 4 * nA*nB/width
    val a2 = spark.range(0, 20000).select(col("id").as("k"))
    val b2 = spark.range(0, 20000).select(col("id").as("k"))
    val est2 = Sketches.countMinJoinSize(
        Sketches.countMinCounters(a2, "k"), Sketches.countMinCounters(b2, "k"))
      .as[Long].collect()(0)
    val exact2 = 20000L
    assert(est2 >= exact2, s"CMS under-estimated: $est2 < $exact2")
    assert(est2 <= exact2 + 4L * 20000L * 20000L / 1024L,
      s"estimate $est2 above the AMS bound")
  }
}
