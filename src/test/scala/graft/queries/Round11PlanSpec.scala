package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Physical-plan pins for the round-11 operators: Louvain is keyed
  * joins + aggregations only (no window, no cartesian, no
  * single-partition exchange at any of its 6 unrolled rounds), and the
  * theta algebra touches the corpus only through the O(k) sketch
  * aggregation — the pair join runs on the group-count-sized sketch
  * table.
  */
class Round11PlanSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("graph_louvain: zero windows, keyed joins only — no cartesian, no nested loop, no single-partition exchange") {
    val p = plan(GraphQueries.graphLouvain(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("sketch_theta: corpus condenses through the O(k) bottom-k aggregation; no window, no single-partition exchange") {
    val p = plan(ExtQueries.sketchTheta(spark, dir))
    // the only corpus-sized operator is the partial bottom-k aggregate;
    // everything after runs on the group-count-sized sketch table
    assert(p.contains("partial_bottomkbyhash") ||
      p.contains("BottomKByHash") || p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("graph_leiden: final assembly is keyed joins only — no window, no cartesian, no single-partition exchange") {
    val p = plan(GraphQueries.graphLeiden(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("dedup_url: canonicalization is a zero-join projection into ONE hash aggregate — no window, no join, no single-partition exchange") {
    val p = plan(ExtQueries.dedupUrl(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("stats_mde + eval_gwet_ac1: ONE map-side-combining aggregation each — no window, no join") {
    for (df <- Seq(EvalQueries.statsMde(spark, dir),
        EvalQueries.evalGwetAc1(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Window"), p)
      assert(!p.contains("Join"), p)
      assert(!p.contains("Exchange SinglePartition"), p)
      assert(p.contains("partial_"), p)
    }
  }

  test("eval_conformal: windows are slice-keyed over score cells; no cartesian, no single-partition exchange") {
    val p = plan(EvalQueries.evalConformal(spark, dir))
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("stats_sprt: the running LLR window is group-keyed; no cartesian, no single-partition exchange") {
    val p = plan(EvalQueries.statsSprt(spark, dir))
    assert(p.contains("Window"), p) // the sessionize shape, keyed
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("stats_cuped: two stacked keyed aggregations — no window, no join, no single-partition exchange") {
    val p = plan(EvalQueries.statsCuped(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("partial_"), p)
  }

  test("stats_did: ONE map-side-combining aggregation — no window, no join") {
    val p = plan(EvalQueries.statsDid(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("partial_"), p)
  }

  test("vocab_fertility: the encode fold runs on the distinct-word table; no window, no cartesian, no single-partition exchange") {
    val p = plan(ExtQueries.vocabFertility(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("graph_mst: per-round argmax is a keyed max_by aggregation — no window, no cartesian, no single-partition exchange") {
    val p = plan(GraphQueries.graphMst(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("stats_srm: ONE map-side-combining aggregation — no window, no join") {
    val p = plan(EvalQueries.statsSrm(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("partial_"), p)
  }

  test("graph_cc_incremental: label assembly is keyed joins only — no window, no cartesian, no single-partition exchange") {
    val p = plan(GraphQueries.graphCcIncremental(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
