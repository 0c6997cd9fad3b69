package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §C).
  *
  * All loads are plain parquet scans so Catalyst's predicate pushdown /
  * column pruning apply; no DATA caching here (callers decide lifecycle).
  * The unresolved DataFrame handle itself IS memoized per
  * (session, dir, table): `spark.read.parquet` does a driver-side file
  * listing + schema read every call, and a suite of a hundred queries
  * re-paid that for every table reference. The logical plan is immutable,
  * so sharing the handle is safe — each query still plans/prunes its own
  * scan from it.
  */
object Tables {

  private val handles =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    handles.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

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

  /** Half-open time-range scan of events with parquet-pushdown: a filter on
    * the *converted* ts column sits above a projection and never reaches
    * the scan, so we filter the raw nanos long first (shows up in
    * `PushedFilters`, prunes row groups via footer stats) and convert after.
    */
  def eventsInRange(spark: SparkSession, dir: String,
      fromExclusive: java.sql.Timestamp, toInclusive: java.sql.Timestamp): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // exact under ns->µs truncation: µs(ns) > from  <=>  ns > from_ns + 999
    val fromNs = fromExclusive.getTime * 1000000L + 999L
    val toNs = toInclusive.getTime * 1000000L + 999L
    table(spark, dir, "events")
      .where(col("ts") > fromNs && col("ts") <= toNs)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
