package graft.cardano

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** ST8: a failing period must not half-commit — staged versions are
  * invisible until the pointer flip, and a later re-run converges.
  */
class FailureAtomicitySpec extends AnyFunSuite with SparkTest {

  test("failed period leaves committed state untouched; retry converges") {
    val srcDir = Files.createTempDirectory("fail-src").toString
    Fixture.write(spark, srcDir)
    val out = Files.createTempDirectory("fail-out").toString
    val store = new TableStore(spark, out)
    val driver = new SyncDriver(spark, srcDir, store, 120)

    // sync the first half of the chain window
    val mid = java.sql.Timestamp.valueOf("2021-03-02 12:00:00")
    driver.syncPeriod(driver.genesis, mid)
    val before = Seq("wallet", "asset", "asset_tx", "asset_mint_tx")
      .map(t => t -> store.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq)
      .toMap
    val versionsBefore = Schemas.targetTables.keys
      .map(t => t -> store.currentVersion(t)).toMap

    // break the source mid-way: tx_metadata gone -> extract fails
    val metaDir = Paths.get(srcDir, "tx_metadata.parquet")
    val savedDir = Paths.get(srcDir, "tx_metadata.parquet.bak")
    Files.move(metaDir, savedDir)
    val tip = java.sql.Timestamp.valueOf("2021-03-02 16:00:00")
    intercept[Throwable] { driver.syncPeriod(mid, tip) }

    // nothing committed: pointers and readable contents unchanged
    assert(Schemas.targetTables.keys.map(t => t -> store.currentVersion(t)).toMap
      == versionsBefore)
    for ((t, rows) <- before)
      assert(store.read(t).collect().map(_.toSeq.map(String.valueOf))
        .sortBy(_.mkString).toSeq == rows, s"table $t changed after failed period")

    // restore the source; catch-up finishes and matches a clean full sync
    Files.move(savedDir, metaDir)
    driver.catchUp()
    val clean = {
      val s2 = new TableStore(spark, Files.createTempDirectory("fail-clean").toString)
      new SyncDriver(spark, srcDir, s2, 120).catchUp()
      s2
    }
    for (t <- Seq("wallet", "collection", "asset", "asset_tx", "asset_mint_tx", "asset_ext"))
      assert(
        store.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq ==
        clean.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq,
        s"table $t diverged after failure+retry")
  }

  test("transient fault self-heals: bounded retry converges without intervention") {
    val srcDir = Files.createTempDirectory("retry-src").toString
    Fixture.write(spark, srcDir)
    val out = Files.createTempDirectory("retry-out").toString
    val store = new TableStore(spark, out)

    // every period fails twice before succeeding — inside the retry
    // budget, so the catch-up must complete with no operator action
    var faultsInjected = 0
    val flaky = new SyncDriver(spark, srcDir, store, 120,
        maxRetries = 3, backoffMillis = 1) {
      private var failuresLeft = 2
      override def syncPeriod(from: java.sql.Timestamp,
          to: java.sql.Timestamp): Unit = {
        if (failuresLeft > 0) {
          failuresLeft -= 1; faultsInjected += 1
          throw new java.io.IOException("transient source hiccup")
        }
        failuresLeft = 2 // re-arm for the next period
        super.syncPeriod(from, to)
      }
    }
    val periods = flaky.catchUp()
    assert(periods > 0 && faultsInjected == periods * 2)

    // converged state == a clean sync with no faults
    val clean = {
      val s2 = new TableStore(spark, Files.createTempDirectory("retry-clean").toString)
      new SyncDriver(spark, srcDir, s2, 120).catchUp()
      s2
    }
    for (t <- Seq("wallet", "collection", "asset", "asset_tx", "asset_mint_tx", "asset_ext"))
      assert(
        store.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq ==
        clean.read(t).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq,
        s"table $t diverged under transient faults")

    // beyond the budget the failure surfaces (and still commits nothing)
    val versionsBefore = Schemas.targetTables.keys
      .map(t => t -> store.currentVersion(t)).toMap
    val hopeless = new SyncDriver(spark, srcDir, store, 120,
        maxRetries = 2, backoffMillis = 1) {
      override def syncPeriod(from: java.sql.Timestamp,
          to: java.sql.Timestamp): Unit =
        throw new java.io.IOException("hard down")
    }
    intercept[java.io.IOException] {
      hopeless.syncPeriodWithRetry(hopeless.genesis,
        java.sql.Timestamp.valueOf("2021-03-02 12:00:00"))
    }
    assert(Schemas.targetTables.keys.map(t => t -> store.currentVersion(t)).toMap
      == versionsBefore)
  }

  test("a stop during the retry backoff rethrows promptly, no extra attempt") {
    val srcDir = Files.createTempDirectory("stopretry-src").toString
    Fixture.write(spark, srcDir)
    val store = new TableStore(spark,
      Files.createTempDirectory("stopretry-out").toString)
    var attempts = 0
    val drv = new SyncDriver(spark, srcDir, store, 120,
        maxRetries = 5, backoffMillis = 30000) {
      override def syncPeriod(from: java.sql.Timestamp,
          to: java.sql.Timestamp): Unit = {
        attempts += 1
        throw new java.io.IOException("source down")
      }
    }
    val stopper = new Thread(() => { Thread.sleep(200); drv.requestStop() })
    stopper.start()
    val t0 = System.nanoTime()
    intercept[java.io.IOException] {
      drv.syncPeriodWithRetry(drv.genesis,
        java.sql.Timestamp.valueOf("2021-03-02 12:00:00"))
    }
    stopper.join()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(attempts == 1, s"retried after stop: $attempts attempts")
    assert(elapsedMs < 5000, s"stop did not cancel the 30s backoff (${elapsedMs}ms)")
  }

  test("commit is one root-manifest rename: tables flip together, stale tmp is inert") {
    val out = Files.createTempDirectory("manifest-out").toString
    val store = new TableStore(spark, out)
    def staged(t: String) = store.appendNext(t,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.targetTables(t)))

    val v = Map("wallet" -> staged("wallet"), "asset" -> staged("asset"))
    store.commit(v)
    assert(store.manifest() == Map("wallet" -> 1L, "asset" -> 1L))
    assert(store.currentVersion("wallet") == 1L && store.currentVersion("asset") == 1L)
    // exactly one commit artifact at the root; no per-table pointer files
    assert(Files.exists(Paths.get(out, "_manifest")))
    assert(!Files.exists(Paths.get(out, "wallet", "_current")))

    // a crash after writing the tmp but before the rename leaves state as-is
    Files.write(Paths.get(out, "_manifest.tmp"), "wallet=99\nasset=99\n".getBytes)
    assert(store.currentVersion("wallet") == 1L && store.currentVersion("asset") == 1L)

    // the next successful commit supersedes everything in one rename
    store.commit(Map("wallet" -> staged("wallet")))
    assert(store.manifest() == Map("wallet" -> 2L, "asset" -> 1L))
  }
}
