package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The co-located-join claim must hold in the physical plan: a join of two
  * tables bucketed on the join key runs with NO exchange on either side.
  */
class BucketingSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  test("join of two tables bucketed on the key is exchange-free and correct") {
    val base = Files.createTempDirectory("buckets").toString
    Bucketing.writeBucketed(Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "li_bkt", s"$base/li", "l_orderkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "o_bkt", s"$base/o", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the shuffle-join path so the test proves bucketing (not
      // broadcast) removed the exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val li = Bucketing.table(spark, "li_bkt")
      val o = Bucketing.table(spark, "o_bkt")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan)
      assert(plan.contains("SelectedBucketsCount"), plan)

      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("bucket pruning: an equality filter on the bucket key scans one bucket") {
    val base = Files.createTempDirectory("buckets-prune").toString
    Bucketing.writeBucketed(Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "o_prune", s"$base/o", "o_orderkey", 8)
    val prevAuto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      // the planner turns bucketed scans off when no join needs them; force
      // it on so the key-equality filter can prune to a single bucket
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val df = Bucketing.table(spark, "o_prune").where(col("o_orderkey") === 42L)
      val plan = df.queryExecution.executedPlan.toString
      // 1 of 8 buckets selected
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      spark.sql("DROP TABLE IF EXISTS o_prune")
    }
  }
}
