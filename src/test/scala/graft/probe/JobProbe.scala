package graft.probe

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev probe: count Spark jobs + wall time per named query (not part of
  * the shipped surface; lives in test scope).
  * Run: sbt "Test/runMain graft.probe.JobProbe ann_lsh,dedup_simhash"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("ann_lsh").split(",")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session("job-probe")
    // warm up
    spark.read.parquet(s"$sfDir/region.parquet").count()
    @volatile var jobs = 0
    var starts = Map[Int, Long]()
    var jobTimes = List[Double]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1; starts += j.jobId -> System.nanoTime() }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        synchronized {
          starts.get(j.jobId).foreach(t0 =>
            jobTimes ::= (System.nanoTime() - t0) / 1e9)
        }
    })
    names.foreach { n =>
      jobs = 0; jobTimes = Nil
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val jt = jobTimes.sorted.reverse.take(5).map(t => f"$t%.2f").mkString(",")
      println(f"PROBE $n%-18s total=$total%6.2f s jobs=$jobs top5job=[$jt]")
    }
    spark.stop()
  }
}
