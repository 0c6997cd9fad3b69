package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** One shared local session per suite (lazy). */
trait SparkTest {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // plan pins assert on full store paths inside FileScan locations;
      // the 100-char default truncates the session-rooted TempStores
      // paths out of the plan string
      .config("spark.sql.maxMetadataStringLength", "2000")
      .getOrCreate()
    // The guard suites deliberately abort jobs via raise_error; the
    // executor-side failure logs for those aborts are ASYNCHRONOUS
    // (task teardown can log seconds after the driver unwound, under
    // load), so no scoped quietly() window can catch them all. Silence
    // the three task-failure loggers for the test JVM instead — a REAL
    // unexpected failure still fails its test loudly through the
    // driver exception and the scalatest report; these loggers only
    // duplicate that signal per task.
    for (l <- Seq("org.apache.spark.executor.Executor",
        "org.apache.spark.scheduler.TaskSetManager",
        "org.apache.spark.storage.ShuffleBlockFetcherIterator"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        l, org.apache.logging.log4j.Level.FATAL)
    s
  }

  /** Await a streaming query, then STOP it if it is still active — a
    * query left running past its test races the JVM-exit
    * `SparkContext.stop` hook and dies with a spurious ERROR ("Job
    * cancelled because SparkContext was shut down"), polluting an
    * otherwise clean log. Re-throws the query's own failure if it
    * terminated with an error.
    */
  protected def awaitDone(q: StreamingQuery, ms: Long = 120000): Unit =
    try q.awaitTermination(ms)
    finally if (q.isActive) q.stop()

  /** Stop every still-active streaming query on the shared session —
    * call from suite afterAll so nothing outlives the suite.
    */
  protected def stopActiveStreams(): Unit =
    spark.streams.active.foreach { q =>
      try q.stop() catch { case _: Exception => () }
    }

  /** Run an EXPECTED-failure body (raise_error guards, aborted jobs)
    * with Spark logging off, so deliberate task failures don't write
    * ERROR lines into an otherwise-clean gate log. The exception still
    * propagates to the caller's intercept.
    */
  protected def quietly[T](body: => T): T = {
    SparkTest.quietDepth.synchronized {
      if (SparkTest.quietDepth.getAndIncrement() == 0)
        spark.sparkContext.setLogLevel("OFF")
    }
    try body finally {
      // let the aborted stage's executor/fetcher threads finish their
      // async teardown logging BEFORE the level comes back, or a stray
      // ERROR races past the restore into the clean gate log; the
      // depth counter keeps one suite's restore from un-silencing a
      // CONCURRENT suite's still-running expected failure (suites
      // share the one SparkContext)
      Thread.sleep(500)
      SparkTest.quietDepth.synchronized {
        if (SparkTest.quietDepth.decrementAndGet() == 0)
          spark.sparkContext.setLogLevel("INFO")
      }
    }
  }
}

object SparkTest {
  /** Reference count for [[SparkTest.quietly]] windows across
    * concurrently-running suites (one shared SparkContext).
    */
  private val quietDepth = new java.util.concurrent.atomic.AtomicInteger(0)
}
