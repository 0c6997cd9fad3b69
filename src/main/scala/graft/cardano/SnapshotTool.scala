package graft.cardano

import org.apache.hadoop.fs.Path

/** SNK5 (`/root/reference/scripts/backup_restore.py`) re-expressed over the
  * versioned TableStore layout: pg_dump/gzip/pg_restore/atomic-swap
  * collapse into pointer operations on immutable version directories —
  * a snapshot IS an old version, a restore IS a pointer rollback, and the
  * reference's `<db>_restore` + DROP + RENAME dance disappears entirely.
  */
class SnapshotTool(store: TableStore) {

  private val fs = new Path(store.root)
    .getFileSystem(store.spark.sparkContext.hadoopConfiguration)

  private def subVersions(table: String, kind: String): Seq[Long] = {
    val d = new Path(store.root, s"$table/$kind")
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong).sorted
  }

  /** All on-disk versions per table (committed current marked by the
    * store's pointer; higher versions are aborted stages).
    */
  def listVersions(): Map[String, (Long, Seq[Long])] =
    Schemas.targetTables.keys.map { t =>
      t -> (store.currentVersion(t), (subVersions(t, "delta") ++ subVersions(t, "full")).distinct.sorted)
    }.toMap

  /** Restore: atomically point every table back to `version` (the
    * reference's whole-DB restore; per-table maps also work).
    */
  def rollback(version: Long): Unit =
    store.commit(Schemas.targetTables.keys.map { t =>
      val avail = (subVersions(t, "delta") ++ subVersions(t, "full")).distinct
      val v = avail.filter(_ <= version).maxOption.getOrElse(0L)
      t -> v
    }.toMap)

  /** Drop staged-but-uncommitted version dirs (aborted periods). */
  def vacuumStaged(): Int = {
    var n = 0
    for (t <- Schemas.targetTables.keys; kind <- Seq("delta", "full")) {
      val cur = store.currentVersion(t)
      subVersions(t, kind).filter(_ > cur).foreach { v =>
        fs.delete(new Path(store.root, s"$t/$kind/v=$v"), true); n += 1
      }
    }
    n
  }

  /** Drop full-table snapshot versions older than `keep` versions below
    * current (mutable tables only; delta dirs are all live by design).
    * Upsert LAYERS below a retained version stay reachable — resolving
    * any retained version needs its base and every layer after it — so
    * only versions strictly below the newest BASE at/below the horizon
    * are dropped (the reachability rule an Iceberg snapshot-expiry
    * applies).
    */
  def vacuumSnapshots(keep: Int = 2): Int = {
    var n = 0
    for (t <- Schemas.targetTables.keys) {
      val cur = store.currentVersion(t)
      val fulls = subVersions(t, "full")
      val newestBaseAtHorizon = fulls
        .filter(v => v <= cur - keep && !store.isUpsertLayerVersion(t, v))
        .maxOption.getOrElse(0L)
      fulls.filter(_ < newestBaseAtHorizon).foreach { v =>
        fs.delete(new Path(store.root, s"$t/full/v=$v"), true); n += 1
      }
    }
    n
  }
}
