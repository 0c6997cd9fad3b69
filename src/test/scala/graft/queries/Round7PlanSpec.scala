package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Physical-plan pins for the round-7 operators: the scale shapes the
  * new ops were designed around — zero-shuffle assignment/sampling
  * projections, bin-keyed (never nested-loop) interval joins.
  */
class Round7PlanSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("sample_diverse: one aggregation pair over a joinless signature projection") {
    val df = ExtQueries.sampleDiverse(spark, dir)
    val p = plan(df)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    // exactly one partial->final exchange, keyed by the bucket (the only
    // other exchange is parallelismFloor's round-robin input spread);
    // executedPlan, since sparkPlan predates EnsureRequirements
    val full = df.queryExecution.executedPlan.toString
    val tree = full.split("== Initial Plan ==")(0) // AQE echoes both plans
    assert("Exchange hashpartitioning\\(bucket".r.findAllIn(tree).size == 1, tree)
    assert(!tree.contains("Exchange SinglePartition"), tree)
  }

  test("join_interval_overlap: hash join on the bin key, never a nested loop") {
    val p = plan(ExtQueries.joinIntervalOverlap(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("__bin"), p)
  }

  test("semanticDedup: assignment is a zero-join projection (no crossJoin vs k seeds)") {
    // the round-6 scale-killer was a crossJoin against ALL k seeds; the
    // two-level form assigns in ONE UDF projection — the only joins in
    // the whole plan are the banded self-join and the nn_cos attach
    val df = ExtQueries.dedupSemantic(spark, dir)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val joins = "Join".r.findAllIn(
      df.queryExecution.sparkPlan.toString.linesIterator
        .filter(_.trim.matches("^[+:\\-\\s]*\\*?\\(?\\d*\\)?\\s*(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*"))
        .mkString("\n")).size
    assert(joins <= 4, s"expected only the banded + nn joins, got $joins:\n$p")
  }

  test("graph_hits: per-iteration work is keyed joins + aggs, no nested loop") {
    val p = plan(GraphQueries.graphHits(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
