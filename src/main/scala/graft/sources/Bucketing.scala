package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the 100 TB answer to the
  * sync's recurring big-big equi-joins (SURVEY.md §2.3 J1/J2: the
  * `ma_tx_out ⋈ tx_out ⋈ tx` chain re-joins the same keys every period).
  *
  * Writing both sides bucketed (and sorted) by the join key makes every
  * subsequent equi-join on that key exchange-free: the bucketed scan
  * already satisfies the join's required `HashClusteredDistribution`, so
  * the sort-merge join reads both sides in place — no shuffle of either
  * fact table, per period, forever. Bucket counts must match (or divide)
  * across the two sides.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table registered in
    * the session catalog (bucket metadata lives in the catalog, which is
    * why this is `saveAsTable` and not a plain `parquet(path)` write).
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      key: String, buckets: Int): Unit =
    // Cluster rows by the bucket key BEFORE the write (same Murmur3 hash
    // family as the bucket-id assignment): each write task then holds
    // exactly one bucket, so the table lands as `buckets` files instead
    // of tasks×buckets splinters — guide §6 output sizing; at 100 TB the
    // small-files tax hits every later scan, and the one exchange here
    // replaces the per-task bucket fan-out sort.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
