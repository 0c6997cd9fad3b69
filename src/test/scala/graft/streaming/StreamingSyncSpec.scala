package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, SparkTest}
import graft.cardano.{Fixture, SyncDriver, TableStore}

class StreamingSyncSpec extends AnyFunSuite with SparkTest with BeforeAndAfterAll {

  // No streaming query may outlive the suite: one left active races the
  // JVM-exit SparkContext.stop hook and logs a spurious ERROR.
  override def afterAll(): Unit = {
    stopActiveStreams()
    super.afterAll()
  }

  test("streaming front-end produces exactly the batch driver's tables") {
    val srcDir = graft.ext.TempStores.newStore("ss-src")
    Fixture.write(spark, srcDir)

    // batch reference
    val batchOut = graft.ext.TempStores.newStore("ss-batch")
    val batchStore = new TableStore(spark, batchOut)
    new SyncDriver(spark, srcDir, batchStore, 120).catchUp()

    // streaming front-end, drain-available mode
    val streamOut = graft.ext.TempStores.newStore("ss-stream")
    val streamStore = new TableStore(spark, streamOut)
    val driver = new StreamingSyncDriver(spark, srcDir, streamStore, 120)
    val q = driver.start(availableNow = true)
    awaitDone(q, 180000)
    assert(driver.periodsRun > 0)

    for (t <- Seq("wallet", "collection", "asset", "asset_tx", "asset_mint_tx", "asset_ext")) {
      val b = batchStore.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      val s = streamStore.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      assert(b.toSeq == s.toSeq, s"table $t differs")
    }
  }

  test("streaming front-end crash between staging and commit: restart is exactly-once") {
    // The batch path pins this via FailureAtomicitySpec; the streaming
    // front-end must inherit it: a "process death" after a period's
    // versions are STAGED but before the manifest flip leaves half-staged
    // files on disk — a restarted query must converge to exactly the
    // clean-sync state (no dropped period, no double-applied rows).
    val srcDir = graft.ext.TempStores.newStore("sscrash-src")
    Fixture.write(spark, srcDir)
    val out = graft.ext.TempStores.newStore("sscrash-out")

    // crash injection: from the SECOND period on, every commit dies after
    // staging is complete (commit is the last step of syncPeriod) — a
    // process death in the staged-but-not-committed window, persistent so
    // the driver's transient-fault retry budget cannot paper over it
    var commits = 0
    val crashingStore = new TableStore(spark, out) {
      override def commit(versions: Map[String, Long]): Unit = {
        commits += 1
        if (commits >= 2) throw new java.io.IOException("simulated crash before manifest flip")
        super.commit(versions)
      }
    }
    val crashed = new StreamingSyncDriver(spark, srcDir, crashingStore, 120)
    // the query IS expected to die here — keep the intentional failure's
    // ERROR+stack out of the suite log (a clean log is the teardown
    // gate). A session-level setLogLevel flip races the stream thread
    // (awaitTermination unblocks BEFORE MicroBatchExecution logs its
    // death), so silence that one logger for the test instead; the
    // test's own gates are exceptions and table contents, never logs.
    val mbLoggers = Seq(
      "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution",
      "org.apache.spark.sql.execution.streaming.MicroBatchExecution")
    mbLoggers.foreach(n => org.apache.logging.log4j.core.config.Configurator
      .setLevel(n, org.apache.logging.log4j.Level.OFF))
    try {
      val err =
        intercept[Throwable] { awaitDone(crashed.start(availableNow = true), 180000) }
      val chain = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
        .map(e => String.valueOf(e.getMessage)).toSeq
      assert(chain.exists(_.contains("simulated crash")), s"unexpected failure: $chain")
    } finally {
      // the crashed query's thread may still be unwinding: wait for ALL
      // queries on the session to settle before re-arming the logger
      val t0 = System.nanoTime()
      while (spark.streams.active.nonEmpty &&
          (System.nanoTime() - t0) < 60e9.toLong) Thread.sleep(100)
      Thread.sleep(500)
      mbLoggers.foreach(n => org.apache.logging.log4j.core.config.Configurator
        .setLevel(n, org.apache.logging.log4j.Level.WARN))
    }

    // restart over the SAME store directory with a fresh driver+query
    // (fresh temp checkpoint — state lives in the tables, not the stream)
    val store = new TableStore(spark, out)
    val resumed = new StreamingSyncDriver(spark, srcDir, store, 120)
    val q2 = resumed.start(availableNow = true)
    awaitDone(q2, 180000)
    assert(resumed.periodsRun > 0)

    // exactly-once: contents == a clean, crash-free sync
    val cleanStore = new TableStore(spark, graft.ext.TempStores.newStore("sscrash-clean"))
    new SyncDriver(spark, srcDir, cleanStore, 120).catchUp()
    for (t <- Seq("wallet", "collection", "asset", "asset_tx", "asset_mint_tx", "asset_ext")) {
      val c = cleanStore.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      val s = store.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      assert(c.toSeq == s.toSeq, s"table $t diverged after crash+restart")
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
