package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Physical-plan pins for the round-10 operator batch: kendall runs on
  * compressed cells with keyed joins only, bartlett is pure
  * aggregations, and the wordpiece pair keeps its lattice/vocab joins
  * broadcast with no global window.
  */
class Round10PlanSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("eval_kendall: zero windows; the cell self-join is slice-KEYED, never a nested loop") {
    val p = plan(EvalQueries.evalKendall(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("stats_bartlett: aggregations only — zero joins, zero windows, no single-partition exchange") {
    val p = plan(EvalQueries.statsBartlett(spark, dir))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("stats_tost + eval_winrate: one aggregation each — zero joins, zero windows") {
    for (df <- Seq(EvalQueries.statsTost(spark, dir),
        EvalQueries.evalWinrate(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Join"), p)
      assert(!p.contains("Window"), p)
      assert(!p.contains("Exchange SinglePartition"), p)
    }
  }

  test("mixture_waterfill: the corpus is touched only by the domain aggregation; windows run over the K-row domain table") {
    val df = PipelineQueries.mixtureWaterfill(spark, dir)
    val p = plan(df)
    // the windows sit ABOVE the (source)-keyed aggregate — the only
    // corpus-sized operator below them must be that partial aggregation
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the total-row attach is a broadcast, never a shuffled join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("tokenize_wordpiece: lattice + vocab joins are all BROADCAST; the only window is the per-word argmax") {
    val p = plan(ExtQueries.tokenizeWordpiece(spark, dir))
    // composition lattice and vocabulary are driver-bounded constants —
    // a shuffled join here would mean the word table was exchanged for
    // an alphabet-sized side
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly one window: the greedy argmax over per-word signatures
    assert("Window \\[".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
