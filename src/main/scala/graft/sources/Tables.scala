package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §C).
  *
  * All loads are plain parquet scans so Catalyst's predicate pushdown /
  * column pruning apply; no caching here (callers decide lifecycle).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark's schema converter rejects (PARQUET_TYPE_ILLEGAL). We read the
    * nanos as a plain long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * truncate to microseconds — exactly what DuckDB's µs TIMESTAMP does,
    * so oracle comparisons line up.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
