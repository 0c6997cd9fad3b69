package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, SparkTest}
import graft.cardano.{Fixture, SyncDriver, TableStore}

class StreamingSyncSpec extends AnyFunSuite with SparkTest {

  test("streaming front-end produces exactly the batch driver's tables") {
    val srcDir = Files.createTempDirectory("ss-src").toString
    Fixture.write(spark, srcDir)

    // batch reference
    val batchOut = Files.createTempDirectory("ss-batch").toString
    val batchStore = new TableStore(spark, batchOut)
    new SyncDriver(spark, srcDir, batchStore, 120).catchUp()

    // streaming front-end, drain-available mode
    val streamOut = Files.createTempDirectory("ss-stream").toString
    val streamStore = new TableStore(spark, streamOut)
    val driver = new StreamingSyncDriver(spark, srcDir, streamStore, 120)
    val q = driver.start(availableNow = true)
    q.awaitTermination(180000)
    assert(driver.periodsRun > 0)

    for (t <- Seq("wallet", "collection", "asset", "asset_tx", "asset_mint_tx", "asset_ext")) {
      val b = batchStore.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      val s = streamStore.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      assert(b.toSeq == s.toSeq, s"table $t differs")
    }
  }

  test("Graft.registerTables enables plain SQL over the star schema") {
    Graft.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus = 'F'""".stripMargin).collect()(0).getLong(0)
    assert(n > 0)
    val ev = spark.sql("SELECT max(ts) FROM events").collect()(0).getTimestamp(0)
    assert(ev != null)
  }
}
