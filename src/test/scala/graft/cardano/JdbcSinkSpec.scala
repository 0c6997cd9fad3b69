package graft.cardano

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** JDBC egress: exporting the store's committed state into an embedded
  * Derby target (the in-sandbox stand-in for the reference's pantasia
  * Postgres). Pins content fidelity for all 7 tables, idempotent
  * re-export, and that a later commit's export replaces the rows.
  */
class JdbcSinkSpec extends AnyFunSuite with SparkTest {

  private def readBack(url: String, t: String) =
    spark.read.jdbc(url, s"\"$t\"", new java.util.Properties())

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  test("export materializes all 7 tables byte-equal, re-export is idempotent") {
    val srcDir = Files.createTempDirectory("sink-src").toString
    Fixture.write(spark, srcDir)
    val store = new TableStore(spark,
      Files.createTempDirectory("sink-store").toString)
    val url = "jdbc:derby:memory:pantasia;create=true"

    // export after the first period only, then after full catch-up: the
    // second export must replace (not append to) the first's rows
    // the app owns the user table and its DDL (PK + the FK the reference
    // schema advertises from wallet.user_id) — pre-create it so export
    // appends into existing DDL rather than creating its own
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE "user" (
          |  id INTEGER NOT NULL PRIMARY KEY,
          |  pfp_asset_id BIGINT,
          |  alias VARCHAR(16) NOT NULL,
          |  created_on TIMESTAMP NOT NULL,
          |  modified TIMESTAMP NOT NULL,
          |  last_login TIMESTAMP)""".stripMargin)
    } finally conn.close()

    val drv = new SyncDriver(spark, srcDir, store, 120)
    val tip = drv.cardanoTip().get
    val periods = drv.periodList(drv.pantasiaTip(), tip)
    drv.syncPeriod(periods(0), periods(1))
    val first = JdbcSink.export(store, url)
    assert(first.map(_._1) == JdbcSink.insertOrder)
    assert(JdbcSink.insertOrder.sorted == Schemas.targetTables.keys.toSeq.sorted)

    // an application adds the advertised FK on the target — the
    // delete-children-first / append-parents-first export must survive it
    // (TRUNCATE-based overwrite would fail here: Postgres refuses TRUNCATE
    // on FK-referenced tables)
    val conn2 = java.sql.DriverManager.getConnection(url)
    try {
      conn2.createStatement().execute(
        """ALTER TABLE "wallet" ADD CONSTRAINT wallet_user_fk
          |FOREIGN KEY ("user_id") REFERENCES "user"(id)""".stripMargin)
    } finally conn2.close()

    drv.catchUp()
    JdbcSink.export(store, url)
    for (t <- Schemas.targetTables.keys)
      assert(rows(readBack(url, t)) == rows(store.read(t)),
        s"table $t diverged after catch-up re-export")

    // idempotent: same commit exported again -> same contents
    JdbcSink.export(store, url)
    for (t <- Schemas.targetTables.keys)
      assert(rows(readBack(url, t)) == rows(store.read(t)),
        s"table $t diverged after idempotent re-export")

    // the app-owned user table exists at the target even though the sync
    // never writes rows into it
    assert(readBack(url, "user").count() == 0)
  }
}
