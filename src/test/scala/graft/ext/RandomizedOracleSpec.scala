package graft.ext

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Randomized cross-checks: the distributed operators vs straight-line
  * in-memory reference folds on seeded random inputs. Catches the bug
  * classes example-based tests miss — tie handling, head/tail edges,
  * partition-boundary effects — while staying fully deterministic.
  */
class RandomizedOracleSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  for (seed <- Seq(1, 42, 7919)) {
    test(s"collapseConsecutive == in-memory run fold (seed $seed)") {
      val rnd = new Random(seed)
      // ties ON ts are planted on purpose (id breaks them)
      val rows = (0 until 2000).map { i =>
        (rnd.nextInt(20).toLong, ts(rnd.nextInt(50) * 1000L), i.toLong,
          if (rnd.nextInt(10) == 0) null.asInstanceOf[String]
          else ("m" + rnd.nextInt(3)), rnd.nextInt(100).toDouble)
      }
      val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
        .repartition(7)
      val got = Dedup.collapseConsecutive(df, "user_id", "ts", "event_id",
          "event_type", "value")
        .select("user_id", "run", "event_id", "event_type", "value",
          "n_in_run")
        .as[(Long, Long, Long, Option[String], Double, Long)]
        .collect().toSet

      // reference: sort each stream by (ts, id), fold runs directly
      val expected = rows.groupBy(_._1).flatMap { case (uid, rs) =>
        val sorted = rs.sortBy(r => (r._2.getTime, r._3))
        val runs = Seq.newBuilder[(Long, Long, Long, Option[String], Double, Long)]
        var run = 0L; var marker: Option[String] = None
        var headId = 0L; var headVal = 0.0; var n = 0L; var started = false
        def close(): Unit =
          if (started) runs += ((uid, run, headId, marker, headVal, n))
        for (r <- sorted) {
          val m = Option(r._4)
          if (!started || m != marker) {
            close(); run += 1; marker = m; headId = r._3; headVal = r._5
            n = 1; started = true
          } else n += 1
        }
        close()
        runs.result()
      }.toSet
      assert(got == expected)
    }

    test(s"cdcApply == in-memory last-write-wins (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 2000).map { i =>
        (rnd.nextInt(50).toLong, ts(rnd.nextInt(100) * 1000L), i.toLong,
          if (rnd.nextInt(5) == 0) "D" else "U", rnd.nextInt(1000).toDouble)
      }
      val df = rows.toDF("k", "ts", "seq", "op", "value").repartition(5)
      val got = DataOps.cdcApply(df, Seq("k"), "op", Seq("ts", "seq"),
          Seq("value"))
        .select("k", "value", "n_ops", "n_deletes")
        .as[(Long, Double, Long, Long)].collect().toSet

      val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val last = rs.maxBy(r => (r._2.getTime, r._3))
        if (last._4 == "D") None
        else Some((k, last._5, rs.size.toLong,
          rs.count(_._4 == "D").toLong))
      }.toSet
      assert(got == expected)
    }

    test(s"selectByBudget == in-memory prefix scan (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 1000).map { i =>
        ("g" + rnd.nextInt(10), i.toLong, rnd.nextInt(50).toLong)
      }
      val budget = 150L
      val df = rows.toDF("grp", "id", "cost").repartition(4)
      val got = DataOps.selectByBudget(df, "grp",
          Seq(col("cost").desc, col("id").asc), "cost", budget)
        .select("grp", "id", "cum_cost").as[(String, Long, Long)]
        .collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.sortBy(r => (-r._3, r._2))
        var cum = 0L
        sorted.flatMap { r =>
          cum += r._3
          if (cum <= budget) Some((g, r._2, cum)) else None
        }
      }.toSet
      assert(got == expected)
    }
  }
}
