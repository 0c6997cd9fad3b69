package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-12 plan/footprint pins: the louvain memo's documented-threshold
  * discipline (collect below the row cap, spill to a parquet table above
  * it — the r11 verdict's one watch item) and the incremental-cluster
  * composition's plan shape.
  */
class Round12PlanSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("louvainMemoize collects below the threshold, spills to parquet " +
      "above it") {
    val labels = (1 to 100).map(i => (i.toLong, (i % 7).toLong))
      .toDF("node", "community")
    GraphQueries.louvainMemoize(spark, labels, maxRows = 1000) match {
      case Left((schema, rows)) =>
        assert(schema.fieldNames.toSeq == Seq("node", "community"))
        assert(rows.length == 100)
      case Right(p) => fail(s"under-threshold labeling spilled to $p")
    }
    GraphQueries.louvainMemoize(spark, labels, maxRows = 10) match {
      case Left(_) =>
        fail("over-threshold labeling must NOT collect to the driver")
      case Right(path) =>
        val back = spark.read.parquet(path)
          .as[(Long, Long)].collect().toSet
        assert(back == labels.as[(Long, Long)].collect().toSet,
          "spilled labeling must round-trip exactly")
    }
  }

  test("default louvain memo threshold stays node-table-sized") {
    assert(GraphQueries.louvainMemoMaxRows == 2000000L)
  }

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("sketch_theta_merge: corpus condenses through the bottom-k " +
      "aggregation; the merge is keyed — no window, no join, no " +
      "single-partition exchange") {
    val p = plan(ExtQueries.sketchThetaMerge(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("partial_"), p)
  }

  test("index_inverted_incremental: index-table merge only — no window, " +
      "no cartesian, no single-partition exchange") {
    val p = plan(ExtQueries.indexInvertedIncremental(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("sketch_bloom: the only cartesian is the groups × probes grid; " +
      "no window, no single-partition exchange on the corpus path") {
    val p = plan(ExtQueries.sketchBloom(spark, dir))
    assert(!p.contains("Window"), p)
    // the grid crossJoin joins two aggregate-sized sides by
    // construction (distinct sources × 6 probes); corpus-sized inputs
    // never reach it — pinned by the shape: the bloom bit table is
    // produced by distinct aggregation before any join
    assert(p.contains("HashAggregate"), p)
  }

  test("dedup_cluster_incremental + sketch_theta_stored run end to end " +
      "with no single-partition exchange") {
    for (df <- Seq(EvalQueries.dedupClusterIncremental(spark, dir),
        ExtQueries.sketchThetaStored(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Exchange SinglePartition"), p)
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("dedup_index_stored: the probe plan reads the stored index and " +
      "has no cartesian, no single-partition exchange") {
    val p = plan(EvalQueries.dedupIndexStored(spark, dir))
    assert(p.contains("graft-lsh-index"),
      "probe must scan the persisted index tables\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("ts_mase: hour-table-sized keyed joins only — no window, no " +
      "cartesian, no single-partition exchange") {
    val p = plan(EvalQueries.tsMase(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
