package graft.ext

/** Session-scoped temp parquet stores (r12 verdict "What's wrong #4" /
  * ADVICE r12 #2): the stored-lifecycle queries (`dedup_index_stored`,
  * `dedup_index_append`, `sketch_theta_stored`, `sketch_bloom_stored`,
  * the louvain over-threshold memo spill) persist intermediate tables to
  * local temp parquet so a later stage can read them back. Creating a
  * bare `Files.createTempDirectory` per invocation leaks one orphaned
  * store per call — a min-of-3 bench writes 6+ copies, and a long-lived
  * service leaks disk steadily.
  *
  * All such stores are now created under ONE per-JVM root that a
  * shutdown hook deletes recursively — every store stays readable for
  * the whole session (the read-back can be lazy, so eager deletion would
  * be wrong) and nothing survives the process. `File.deleteOnExit` alone
  * can't do this (it refuses non-empty directories).
  */
object TempStores {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-stores-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh store directory under the session root; deleted (with the
    * root) at JVM exit.
    */
  def newStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val all = Files.walk(p)
      try {
        all.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => { val _ = Files.deleteIfExists(f) })
      } finally all.close()
    }
  }
}
