package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator family from SURVEY.md §2 (and
  * the phase-E extension operators) to a DataFrame pipeline over the
  * synthetic tables in `sfDir`; `oracleSql` holds the DuckDB-equivalent SQL
  * for those that are ANSI-expressible (the rest get rows-only checks and
  * their exact semantics are pinned by ScalaTest suites instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Queries.all("q2_join_chain")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all

  def oracleSql: Map[String, String] =
    graft.queries.Queries.oracles
}
