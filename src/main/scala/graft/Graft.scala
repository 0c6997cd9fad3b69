package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** User-facing entry points.
  *
  * `registerTables` exposes the synthetic star schema as temp views so the
  * whole engine is reachable from `spark.sql(...)` as well as the
  * DataFrame API; `session` builds a session with the recommended local
  * configuration (shuffle partitions sized to cores, AQE on, UTC).
  */
object Graft {

  def session(appName: String = "graft", cores: Int =
      math.min(32, Runtime.getRuntime.availableProcessors())): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register every synthetic table in `dir` as a temp view (events with
    * its µs-timestamp conversion applied), enabling plain SQL usage.
    * Idempotent per (session, dir): re-registration re-lists and re-reads
    * ten parquet footers on the driver, so repeat calls with the same dir
    * (every SQL-text query does one) are skipped; switching dirs within a
    * session re-registers.
    */
  private val lastDir =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()
  def registerTables(spark: SparkSession, dir: String): Unit = {
    if (dir == lastDir.put(Integer.valueOf(System.identityHashCode(spark)), dir))
      return
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(n))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Expose the native kernels (`graft_mix64`, `graft_dot`,
    * `graft_simhash64`, `graft_minhash`) as SQL functions on a live
    * session — same codegen'd expressions the DataFrame operators use.
    * (New sessions can set `spark.sql.extensions=graft.GraftExtensions`
    * instead.)
    */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.register(spark)
}
