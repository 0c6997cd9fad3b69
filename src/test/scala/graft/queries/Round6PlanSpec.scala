package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Physical-plan pins for the round-6 release-audit family: the shapes
  * the 100 TB design depends on — zero-shuffle scrubbing, slice-keyed
  * (never global) windows, broadcast-sized vocab joins, and partial
  * aggregation everywhere a corpus-sized exchange could sneak in.
  */
class Round6PlanSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("pii_detect / pii_redact: pure row-local projections, zero exchanges") {
    val pd = plan(EvalQueries.piiDetect(spark, dir))
    assert(!pd.contains("Exchange"), pd)
    assert(pd.contains("[codegen id :"), pd)
    val pr = plan(EvalQueries.piiRedact(spark, dir))
    assert(!pr.contains("Exchange"), pr)
  }

  test("filter_funnel: one partial+final aggregation, no window, no sort") {
    val p = plan(EvalQueries.filterFunnelQ(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // the whole funnel is ONE grand-total aggregation pair (keys=[]) with
    // the per-stage rows generated from the single aggregated row — the
    // only exchange possible is the single-row partial→final one
    val tree = EvalQueries.filterFunnelQ(spark, dir)
      .queryExecution.sparkPlan.toString
    assert("HashAggregate\\(keys=\\[\\]".r.findAllIn(tree).size == 2, tree)
    assert(tree.contains("Generate explode"), tree)
  }

  test("eval_auc: the cumulative window is keyed by the slice, not global") {
    val p = plan(EvalQueries.evalAuc(spark, dir))
    assert(p.contains("Window"), p)
    assert("windowspecdefinition\\(source".r.findFirstIn(p).isDefined,
      "window must partition on the slice key:\n" + p)
  }

  test("curriculum_ntile: ntile window co-partitioned with the group") {
    val p = plan(EvalQueries.curriculumNtile(spark, dir))
    assert("windowspecdefinition\\(source".r.findFirstIn(p).isDefined, p)
  }

  test("vocab_coverage: the 1000-word vocab joins as a broadcast") {
    val p = plan(EvalQueries.vocabCoverage(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("checksum_manifest: partial aggregation, no sort, no window") {
    val p = plan(EvalQueries.checksumManifest(spark, dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
  }

  test("eval_multiclass: joins run on the class-sized table, no cartesian") {
    val p = plan(EvalQueries.evalMulticlass(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    // confusion collapse is a partial agg before any join
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("stats_welch: one slice-keyed aggregation pair, no window, no sort") {
    val p = plan(EvalQueries.statsWelch(spark, dir))
    assert(!p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("join_set_similarity: spillable sort-merge joins, never a broadcast") {
    val p = plan(EvalQueries.joinSetSimilarity(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin"), p)
    // the checkpointed shingle frames must not gamble on broadcast, and
    // a hash build side has no spill path at corpus scale
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
  }

  test("assoc_rules: item counts broadcast onto the pair table") {
    val p = plan(EvalQueries.assocRules(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("eval_bootstrap: the corpus side broadcasts under the draw table") {
    val p = plan(EvalQueries.evalBootstrap(spark, dir))
    // the n×B draw table must NOT be the build side — the (doc_id,
    // correct) projection is the small one at every SF ratio
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("dedup_minhash_incremental: new-side candidates, no corpus broadcast") {
    val p = plan(EvalQueries.dedupMinhashIncremental(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    // the band-bucket candidate join is a key-equi join on (band, h)
    assert(p.contains("Join"), p)
  }

  test("sequence_pattern: one entity-keyed aggregation, regex row-local") {
    val p = plan(EvalQueries.sequencePattern(spark, dir))
    assert(!p.contains("Window"), p)
    assert("HashAggregate|SortAggregate".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
