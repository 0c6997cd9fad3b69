package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (round 14): per-query job/stage/task profile. The bench's
  * per-query seconds at sf0.1 are dominated by FIXED per-job overheads
  * (action count, localCheckpoint materializations, driver round-trips),
  * so the first question for any hot query is "how many Spark jobs does
  * it run and where does the task time go" — this answers it without the
  * UI (disabled in the bench). Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.JobProfile <sfDir> q1,q2,..."
  * Prints one line per query: wall seconds, jobs, stages, tasks, summed
  * task time, shuffle bytes. Dev-only: never part of the driver contract.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var shufR = 0L
    @volatile var shufW = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskMs += m.executorRunTime
          shufR += m.shuffleReadMetrics.totalBytesRead
          shufW += m.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    // same warm-up as Bench
    try {
      spark.read.parquet(s"$sfDir/region.parquet").count()
      spark.sparkContext.parallelize(0 until 1000, 8)
        .map(i => (i % 16, i.toLong)).reduceByKey(_ + _).count()
      import org.apache.spark.sql.functions.{broadcast, expr, sum}
      val small = spark.range(100).selectExpr("id % 5 AS k", "id AS v")
      small.join(broadcast(spark.range(5).selectExpr("id AS k")), "k")
        .withColumn("r", expr("row_number() over (partition by k order by v)"))
        .agg(sum("r")).collect()
    } catch { case _: Throwable => }
    val all = SparkEntry.queries
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    names.split(",").foreach { name =>
      all.get(name) match {
        case Some(fn) =>
          var best = Double.MaxValue
          var line = ""
          (1 to nRuns).foreach { _ =>
            jobs = 0; stages = 0; tasks = 0; taskMs = 0L; shufR = 0L; shufW = 0L
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val secs = (System.nanoTime() - t0) / 1e9
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            System.gc()
            if (secs < best) {
              best = secs
              line = f"[profile] $name%-28s $secs%7.3f s  jobs=$jobs%4d stages=$stages%4d tasks=$tasks%5d taskTime=${taskMs / 1000.0}%8.2f s shufR=${shufR / 1048576.0}%7.1f MB shufW=${shufW / 1048576.0}%7.1f MB"
            }
          }
          println(line)
        case None => println(s"[profile] unknown query: $name")
      }
    }
    spark.stop()
  }
}
