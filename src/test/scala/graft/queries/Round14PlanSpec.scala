package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-14 plan/footprint pins: the stored-ANN probe answers from the
  * persisted model + code store with the corpus vectors OUT of the
  * plan entirely; the appended code store is what the maintenance
  * probe scans; the stored-quantile read-off runs on the bin store
  * alone; the stored-BPE encode takes the model only as collected
  * constants (no store scan, no join in the encode plan); and the
  * stored-semantic screen reads the persisted structure plus the new
  * batch only.
  */
class Round14PlanSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("ann_ivf_pq_stored: the answer plan scans the persisted code " +
      "store and the corpus vectors are OUT of the plan entirely — no " +
      "cartesian, no single-partition exchange") {
    val p = plan(ExtQueries.annIvfPqStored(spark, dir))
    assert(p.contains("graft-ivfpq-index"),
      "the probe must scan the persisted code store\n" + p)
    assert(!p.contains("embeddings.parquet"),
      "the corpus must NOT appear in the store-alone answer plan\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("ann_ivf_pq_append: the maintenance probe scans the APPENDED " +
      "code store — corpus out of the plan, no cartesian, no " +
      "single-partition exchange") {
    val p = plan(ExtQueries.annIvfPqAppend(spark, dir))
    assert(p.contains("graft-ivfpq-append"),
      "the probe must scan the merged (appended) code store\n" + p)
    assert(!p.contains("embeddings.parquet"),
      "the corpus must NOT appear in the store-alone answer plan\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("sketch_quantile_stored: the read-off runs on the bin store " +
      "alone — lineitem is out of the answer plan, no window, no " +
      "single-partition exchange") {
    val p = plan(ExtQueries.sketchQuantileStored(spark, dir))
    assert(p.contains("graft-quantile-store"),
      "quantiles must come from the persisted bin tables\n" + p)
    assert(!p.contains("lineitem.parquet"),
      "the corpus must NOT appear in the store-alone read-off plan\n" + p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("tokenize_bpe_stored: the model reaches the encode only as " +
      "collected constants — the encode plan has NO scan of the model " +
      "store and no join; the merge chain is inlined replace()s") {
    val p = plan(ExtQueries.tokenizeBpeStored(spark, dir))
    assert(!p.contains("graft-bpe-model"),
      "the model store must not be joined into the encode plan\n" + p)
    assert(p.contains("replace("),
      "the merge chain must inline as replace() projections\n" + p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_semantic_stored: the screen reads the persisted structure " +
      "(seeds + reps) plus the new batch only — the corpus slice is " +
      "out of the plan; no cartesian, no single-partition exchange") {
    val p = plan(ExtQueries.dedupSemanticStored(spark, dir))
    assert(p.contains("graft-semantic-store"),
      "the screen must scan the persisted structure\n" + p)
    // embeddings may appear ONLY as the new-batch scan: every
    // embeddings FileScan in the plan must carry the batch's pushed
    // vec_id filter, so the corpus slice (% 5 != 4) is never re-read
    val scans = p.split("\n").filter(l =>
      l.contains("embeddings.parquet") && l.contains("FileScan"))
    assert(scans.nonEmpty, "the batch scan must be visible\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
