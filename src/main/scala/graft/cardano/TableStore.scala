package graft.cardano

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Target-table persistence (SURVEY.md §2.1 SNK1-SNK5).
  *
  * Layout per table under `<root>/<name>/`:
  *   - `delta/v=N/` — an append table's period-N delta (facts, dims);
  *   - `full/v=N/`  — a mutable table's complete contents as of period N
  *     (`asset`, `asset_ext` — the plain-parquet stand-in for a
  *     Delta/Iceberg MERGE, which is the intended production sink);
  *   - `_current`   — the committed version pointer.
  *
  * A period stages version N+1 dirs for every table, then `commit` flips the
  * pointers — the reference's single transaction per period (SNK3). Readers
  * only see data at/below the pointer, so
  *   - appends are O(delta): a version is the union of delta dirs 1..N;
  *   - re-running a failed period overwrites its staged dirs (idempotent,
  *     ST6 — an intentional upgrade over the reference);
  *   - snapshots are free: old versions stay on disk until vacuumed, and
  *     `readVersion` is the pg_dump/pg_restore path (SNK5) collapsed to a
  *     pinned read.
  */
class TableStore(val spark: SparkSession, val root: String) {

  private val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(name: String) = new Path(root, name)
  private def currentFile(name: String) = new Path(tableDir(name), "_current")
  private def deltaDir(name: String, v: Long) = new Path(tableDir(name), s"delta/v=$v")
  private def fullDir(name: String, v: Long) = new Path(tableDir(name), s"full/v=$v")

  def currentVersion(name: String): Long = {
    val f = currentFile(name)
    if (!fs.exists(f)) 0L
    else {
      val in = fs.open(f)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  private def setCurrent(name: String, v: Long): Unit = {
    val tmp = new Path(tableDir(name), "_current.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(currentFile(name), false)
    fs.rename(tmp, currentFile(name))
  }

  private def empty(name: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.targetTables(name))

  /** Read a table at version `v` (its committed current by default). */
  def readVersion(name: String, v: Long): DataFrame = {
    if (v <= 0L) return empty(name)
    if (fs.exists(fullDir(name, v)))
      return spark.read.schema(Schemas.targetTables(name))
        .parquet(fullDir(name, v).toString)
    val deltas = (1L to v).map(deltaDir(name, _)).filter(fs.exists(_)).map(_.toString)
    if (deltas.isEmpty) empty(name)
    else spark.read.schema(Schemas.targetTables(name)).parquet(deltas: _*)
  }

  def read(name: String): DataFrame = readVersion(name, currentVersion(name))

  /** Stage `df` as the table's complete next-version contents. */
  def writeNext(name: String, df: DataFrame): Long = {
    val next = currentVersion(name) + 1
    df.write.mode("overwrite").parquet(fullDir(name, next).toString)
    next
  }

  /** Stage `delta` as the table's next-version append. */
  def appendNext(name: String, delta: DataFrame): Long = {
    val next = currentVersion(name) + 1
    delta.write.mode("overwrite").parquet(deltaDir(name, next).toString)
    next
  }

  /** Atomically commit a set of staged versions (the per-period txn, SNK3). */
  def commit(versions: Map[String, Long]): Unit =
    versions.foreach { case (name, v) => setCurrent(name, v) }

  /** SRC5: next id = max(id)+1, default 1. Parquet footer stats make the
    * max() a metadata-only scan.
    */
  def nextId(name: String): Long =
    read(name).agg(max(col("id")).cast("long")).collect()(0) match {
      case r if r.isNullAt(0) => 1L
      case r => r.getLong(0) + 1L
    }
}
