package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Physical-plan pins for the round-8 operator batch: the scale shapes
  * the new metrics were designed around — windows only over compressed
  * tables, one gram pass per side, single-aggregation agreement
  * coefficients.
  */
class Round8PlanSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.collect()
    // the executed-plan TREE, final plan only (AQE echoes the initial
    // plan after it — counting there would double every operator)
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("stats_mannwhitney: ONE window, over the compressed table, never a global sort") {
    val df = EvalQueries.statsMannwhitney(spark, dir)
    val p = plan(df)
    assert(!p.contains("Join"), p)
    // the single cumulative window is group-keyed — a SinglePartition
    // exchange would mean the ranks ran over the raw rows globally
    assert(!p.contains("Exchange SinglePartition"), p)
    assert("Window \\[".r.findAllIn(p).size == 1, p)
    // the window's input is the (group, value)-compressed aggregate:
    // a partial_sum over the raw scan must appear below the window
    assert(p.contains("partial_sum"), p)
  }

  test("eval_chrf: exactly two gram explodes — one candidate pass, one reference pass") {
    val df = EvalQueries.evalChrf(spark, dir)
    val p = plan(df)
    assert("Generate explode".r.findAllIn(p).size == 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("eval_rouge: exactly two gram explodes per order (no recomputed reference pass)") {
    val df = EvalQueries.evalRouge(spark, dir)
    val p = plan(df)
    // 2 orders × (cand + ref) = 4; the old left-join + separate-total
    // form recomputed each reference explode twice (6)
    assert("Generate explode".r.findAllIn(p).size == 4, p)
  }

  test("eval_krippendorff: one aggregation, zero joins, zero windows") {
    val df = EvalQueries.evalKrippendorff(spark, dir)
    val p = plan(df)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("stats_fdr: data-scale work is agg + slice-keyed lag; BH ranks only the slice table") {
    val df = EvalQueries.statsFdr(spark, dir)
    val p = plan(df)
    // the only join is the broadcast re-attach of zero-movement slices
    // (slice-table-sized), never a nested loop
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // exactly one SinglePartition exchange — the m-row BH ranking (the
    // compressed-table exception); the daily-count lag window above the
    // raw scan is slice-keyed (windowspecdefinition lists the slice
    // partition columns)
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("lag(__x"), p)
    assert("windowspecdefinition\\(event_type[^)]*u_bucket".r
      .findAllIn(p).nonEmpty, p)
  }

  test("stats_anova: two stacked aggregations, zero joins, zero windows") {
    val df = EvalQueries.statsAnova(spark, dir)
    val p = plan(df)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("partial_count"), p)
  }

  test("graph_assortativity: degree attaches are keyed joins, no nested loop") {
    val df = GraphQueries.graphAssortativity(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("select_pareto: the only single-partition window runs over the per-partition boundary table") {
    val df = ExtQueries.selectPareto(spark, dir)
    val p = plan(df)
    // two-pass staircase (round 9): the ONE global window is the
    // exclusive prefix max over the ≤nP-row per-partition maxima
    // (partial_max below it = the groupBy(__pid) agg); the bulk
    // running max is a window PARTITIONED by the stamped range id, and
    // the join back is keyed, not nested
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_max"), p)
    assert(p.contains("__pid"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph_scc peel internals: label push is a keyed join + partial min, no nested loop") {
    // the iterative driver loop can't be pinned as one plan; pin the
    // per-hop building block instead
    val e = GraphQueries.graphScc // force object init
    val edges = spark.range(0, 1000)
      .selectExpr("id AS src", "(id * 7) % 1000 AS dst")
    val lab = spark.range(0, 1000).selectExpr("id AS node", "id AS lab")
    val pushed = edges
      .join(lab.selectExpr("node AS src", "lab"), Seq("src"))
      .groupBy(org.apache.spark.sql.functions.col("dst").as("node"))
      .agg(org.apache.spark.sql.functions.min("lab").as("m"))
    val p = plan(pushed)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_min"), p)
  }
}
