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

  test("semanticDedup: assignment joins only the cell-keyed seed table, never all k seeds") {
    // the round-6 scale-killer was a crossJoin against ALL k seeds; the
    // round-8 form assigns via ONE equi-join against the (cell -> seeds)
    // table — the joins in the whole plan are that cell join, the banded
    // self-join, and the nn_cos attach. Never a nested loop / cartesian
    // (which is what "join every row against every seed" would plan as).
    val df = ExtQueries.dedupSemantic(spark, dir)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val joins = "Join".r.findAllIn(
      df.queryExecution.sparkPlan.toString.linesIterator
        .filter(_.trim.matches("^[+:\\-\\s]*\\*?\\(?\\d*\\)?\\s*(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*"))
        .mkString("\n")).size
    assert(joins <= 5, s"expected only the cell + banded + nn joins, got $joins:\n$p")
    // O(√k) driver/broadcast footprint: the only collected/broadcast
    // vectors are the coarse centroids (exactly min(ceil(√seeds), seeds)
    // of them), and live cells are bounded by that
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    val seeds = math.min(graft.ext.Similarity.autoClusterCount(n).toLong, n).toInt
    val expC = math.min(graft.ext.Similarity.autoCoarseCount(seeds), seeds)
    val (coarse, live) = graft.ext.Similarity.lastAssignStats
    assert(coarse == expC, s"driver collected $coarse vectors, expected √k=$expC")
    assert(live > 0 && live <= coarse,
      s"live cells $live must be bounded by coarse $coarse")
  }

  test("graph_hits: per-iteration work is keyed joins + aggs, no nested loop") {
    val p = plan(GraphQueries.graphHits(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("mask_spans: ONE doc-keyed exchange drives windows and the final agg") {
    val df = PipelineQueries.maskSpans(spark, dir)
    val p = plan(df)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    val tree = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(tree).size == 1,
      tree)
  }

  test("eval_spearman: ONE slice-keyed exchange, two in-place sorts, no global window") {
    val df = EvalQueries.evalSpearman(spark, dir)
    val p = plan(df)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    val tree = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning\\(l_returnflag".r.findAllIn(tree).size == 1,
      tree)
  }

  test("graph_kcore / graph_ppr: keyed joins + aggs only, no nested loop") {
    for (q <- Seq(GraphQueries.graphKcore, GraphQueries.graphPpr)) {
      val p = plan(q(spark, dir))
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("Exchange SinglePartition"), p)
    }
  }

  test("dataset_interleave: no global-order window anywhere in the DF plan") {
    val df = PipelineQueries.datasetInterleave(spark, dir)
    val p = plan(df)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("eval_fleiss / eval_mcnemar: one row-local projection + slice agg, no join/window") {
    for (q <- Seq(EvalQueries.evalFleiss, EvalQueries.evalMcnemar)) {
      val p = plan(q(spark, dir))
      assert(!p.contains("Join"), p)
      assert(!p.contains("Window"), p)
      assert(!p.contains("Exchange SinglePartition"), p)
    }
  }

  test("stats_zipf: OLS fold over the TakeOrdered top-N, no window/join") {
    val df = GraphQueries.statsZipf(spark, dir)
    val p = plan(df)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("rank_rbo: zipWithIndex ranks, never a global window") {
    val df = PipelineQueries.rankRbo(spark, dir)
    val p = plan(df)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("anonymize_t: broadcast audit-sized grid, group-keyed windows only") {
    val df = EvalQueries.anonymizeT(spark, dir)
    val p = plan(df)
    // the only cross join is grp × broadcast(buckets) — audit-sized
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("graph_closeness: final harmonic agg is a keyed exchange, no nested loop") {
    val df = GraphQueries.graphCloseness(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
