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

  /** `events.parquet` has shipped in two physical encodings of `ts`:
    * parquet INT64 TIMESTAMP(NANOS) (which Spark reads as a plain long
    * under `spark.sql.legacy.parquet.nanosAsLong`, truncated here to µs)
    * and native TIMESTAMP(MICROS) without a timezone (which Spark reads
    * as TIMESTAMP_NTZ). Both normalize to a session-TZ TimestampType µs
    * column — exactly DuckDB's µs TIMESTAMP under the UTC session, so
    * oracle comparisons line up regardless of the fixture vintage.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Half-open time-range scan of events with parquet-pushdown: a filter
    * on the *converted* ts column would sit above a projection and never
    * reach the scan, so we filter the storage-typed column first (shows up
    * in `PushedFilters`, prunes row groups via footer stats) and convert
    * after.
    */
  def eventsInRange(spark: SparkSession, dir: String,
      fromExclusive: java.sql.Timestamp, toInclusive: java.sql.Timestamp): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // exact under ns->µs truncation: µs(ns) > from  <=>  ns > from_ns + 999
        val fromNs = fromExclusive.getTime * 1000000L + 999L
        val toNs = toInclusive.getTime * 1000000L + 999L
        df.where(col("ts") > fromNs && col("ts") <= toNs)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // native µs storage: compare as NTZ (value-preserving under the
        // UTC session), pushed straight to the parquet scan
        df.where(col("ts") > lit(fromExclusive).cast("timestamp_ntz") &&
            col("ts") <= lit(toInclusive).cast("timestamp_ntz"))
          .withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
