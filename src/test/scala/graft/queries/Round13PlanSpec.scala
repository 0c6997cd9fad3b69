package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Round-13 plan/footprint pins: the index-append probe scans the
  * MERGED store (never re-deriving old signatures from text), the
  * stored-Bloom probe answers from the bit store alone, ts_mase keeps
  * its keyed-join-only shape under the full-outer widening, and the
  * session temp-store root is the hygiene contract for every persisted
  * intermediate.
  */
class Round13PlanSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("dedup_index_append: the probe scans the appended store — no " +
      "cartesian, no single-partition exchange") {
    val p = plan(EvalQueries.dedupIndexAppend(spark, dir))
    assert(p.contains("graft-lsh-append"),
      "probe must scan the merged (appended) index store\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("sketch_bloom_stored: the probe reads the bit store alone — the " +
      "documents table is out of the probe plan; the only cross join " +
      "is the groups × probes grid") {
    val p = plan(ExtQueries.sketchBloomStored(spark, dir))
    assert(p.contains("graft-bloom-store"),
      "probe must scan the persisted bit tables\n" + p)
    assert(!p.contains("documents.parquet"),
      "the corpus must NOT appear in the store-alone probe plan\n" + p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("dedup_cluster_stored: the probe+fold plan reads the persisted " +
      "maintenance state — no cartesian, no single-partition exchange") {
    val p = plan(EvalQueries.dedupClusterStored(spark, dir))
    assert(p.contains("graft-cluster-store"),
      "probe+fold must scan the stored labels/index\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("sketch_hll_stored: the summary is answered from the register " +
      "store alone — the events table is out of the final plan") {
    val p = plan(ExtQueries.sketchHllStored(spark, dir))
    assert(p.contains("graft-hll-store"),
      "summary must scan the persisted register tables\n" + p)
    assert(!p.contains("events.parquet"),
      "the corpus must NOT appear in the store-alone summary plan\n" + p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sketch_countmin_stored: the counter side comes from the merged " +
      "store (the exact-df probe side touches the corpus by design)") {
    val p = plan(ExtQueries.sketchCountMinStored(spark, dir))
    assert(p.contains("graft-cms-store"),
      "estimates must come from the persisted counter tables\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("ts_mase keeps keyed joins only after the full-outer widening — " +
      "no window, no cartesian, no single-partition exchange") {
    val p = plan(EvalQueries.tsMase(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("TempStores: every store lives under ONE session root (deleted " +
      "by the JVM shutdown hook), not scattered across /tmp") {
    val a = java.nio.file.Paths.get(graft.ext.TempStores.newStore("pin-a"))
    val b = java.nio.file.Paths.get(graft.ext.TempStores.newStore("pin-b"))
    assert(a.getParent == b.getParent,
      "stores must share the session root")
    assert(a.getParent.getFileName.toString.startsWith("graft-stores-"))
    assert(java.nio.file.Files.isDirectory(a))
  }
}
