package graft.cardano

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** SNK5 snapshot/restore + ST4/ST7 continuous mode. */
class SnapshotSpec extends AnyFunSuite with SparkTest {

  private lazy val srcDir = {
    val d = Files.createTempDirectory("snap-src").toString
    Fixture.write(spark, d)
    d
  }

  test("rollback restores an earlier committed state; vacuum cleans stages") {
    val out = Files.createTempDirectory("snap-out").toString
    val store = new TableStore(spark, out)
    val driver = new SyncDriver(spark, srcDir, store, 120)
    driver.catchUp()
    val tool = new SnapshotTool(store)

    val finalAssets = store.read("asset").count()
    val versions = tool.listVersions()
    assert(versions("asset")._1 > 1, "multi-period run expected")

    // snapshot read: version 6 state differs from final
    val mid = store.currentVersion("asset") / 2
    val midAssets = store.readVersion("asset", mid).count()
    assert(midAssets <= finalAssets)

    // rollback all tables to mid, re-sync catches back up to the same state
    tool.rollback(mid)
    assert(store.read("asset").count() == midAssets)
    driver.catchUp()
    assert(store.read("asset").count() == finalAssets)
    assert(store.read("asset_tx").count() == 5)

    assert(tool.vacuumStaged() >= 0)
    val removed = tool.vacuumSnapshots(keep = 1)
    assert(removed > 0, "old full versions should be vacuumable")
    // current state still readable after vacuum
    assert(store.read("asset").count() == finalAssets)
    assert(store.read("asset_ext").count() == 6)
  }

  test("runContinuously syncs to tip, then stops gracefully on request") {
    val out = Files.createTempDirectory("cont-out").toString
    val store = new TableStore(spark, out)
    val driver = new SyncDriver(spark, srcDir, store, 120)
    val t = new Thread(() => driver.runContinuously(pollSeconds = 1, maxCycles = 3))
    t.start()
    // let it catch up, then request stop
    val deadline = System.currentTimeMillis() + 120000
    while (store.read("asset_tx").count() < 5 && System.currentTimeMillis() < deadline)
      Thread.sleep(500)
    driver.requestStop()
    t.join(60000)
    assert(!t.isAlive, "driver loop did not stop")
    assert(store.read("asset_tx").count() == 5)
    assert(store.read("asset").count() == 6)
  }
}
