package graft.cardano

/** JDBC egress — the reference's target side. The reference keeps its 7
  * output tables in a "pantasia" Postgres and writes them over a second
  * psycopg2 connection (`/root/reference/app/db/postgres.py:31-50`, insert
  * paths `:156-250`). Here the engine's sink of record stays the versioned
  * parquet [[TableStore]] (atomic multi-table commits, snapshot/restore,
  * merge-on-read upserts — all of which a bare JDBC target lacks), and
  * this object materializes the store's current committed state INTO a
  * JDBC database for the applications that read the reference's tables.
  *
  * Export is idempotent: `overwrite` + `truncate` keeps the remote DDL
  * (and any FKs an application added) and replaces the rows; re-running
  * after the same commit is a no-op in content. Missing tables are
  * created on first export.
  *
  * Scale shape: each table ships over `numPartitions` parallel batched
  * connections (`batchsize` rows per round trip). This is the O(table)
  * full-state integration surface; a per-period O(delta) feed should read
  * the store's delta/upsert layers (`TableStore.readVersion`) instead of
  * re-shipping the dimension tables every period.
  */
object JdbcSink {

  /** Batched rows per JDBC round trip. */
  val BatchSizeConf = "spark.graft.jdbc.batchSize"

  /** Parallel connections per exported table. */
  val NumPartitionsConf = "spark.graft.jdbc.numPartitions"

  /** Write the current committed version of each table to the target
    * database. Returns the exported (table, rowCount) pairs.
    */
  def export(store: TableStore, url: String,
      tables: Seq[String] = Schemas.targetTables.keys.toSeq.sorted): Seq[(String, Long)] = {
    val spark = store.spark
    val props = new java.util.Properties()
    props.setProperty("batchsize", spark.conf.get(BatchSizeConf, "10000"))
    tables.map { t =>
      val df = store.read(t)
      df.coalesce(spark.conf.get(NumPartitionsConf, "8").toInt)
        .write.mode("overwrite")
        .option("truncate", "true")
        .jdbc(url, s"\"$t\"", props) // quoted: `user` is reserved everywhere
      (t, df.count())
    }
  }
}
