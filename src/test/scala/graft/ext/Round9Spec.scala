package graft.ext

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-9 hardening: the two-pass Pareto staircase must survive a
  * CONTINUOUS x (distinct-x ≈ n) — the round-8 verdict's last latent
  * single-partition-window trap.
  */
class Round9Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("paretoFront2D: 1M distinct DOUBLE x, anti-chain — every point on the front") {
    // y strictly decreasing in x ⇒ no point dominates any other
    val df = spark.range(1000000L).selectExpr(
      "id", "cast(id AS double) + 0.5 AS x",
      "cast(1000000 - id AS double) AS y")
    assert(DataOps.paretoFront2D(df, "id", "x", "y").count() == 1000000L)
  }

  test("paretoFront2D: 1M distinct DOUBLE x, constant y — front collapses to max x") {
    // equal y everywhere ⇒ every lower x is dominated by the max-x row
    val df = spark.range(1000000L).selectExpr(
      "id", "cast(id AS double) + 0.25 AS x", "cast(7 AS double) AS y")
    val got = DataOps.paretoFront2D(df, "id", "x", "y")
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(999999L))
  }

  test("paretoFront2D: continuous x matches brute force; no raw-row global window in the plan") {
    val rnd = new Random(9)
    val rows = (1 to 500).map(i =>
      (i.toLong, rnd.nextDouble() * 40, rnd.nextDouble() * 40))
    val res = DataOps.paretoFront2D(rows.toDF("id", "x", "y"), "id", "x", "y")
    val got = res.as[(Long, Double, Double)].collect().map(_._1).toSet
    def dominated(p: (Long, Double, Double)) = rows.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    val want = rows.filterNot(dominated).map(_._1).toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
    val p = plan(res)
    // the only single-partition exchange feeds the boundary-prefix
    // window over the groupBy(__pid) maxima (≤ nP rows); the bulk
    // running max is partitioned by the stamped range id
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_max"), p)
    assert(p.contains("__pid"), p)
  }
}
