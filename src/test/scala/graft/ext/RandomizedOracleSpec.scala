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

    test(s"hllRegisters == in-memory register fold (seed $seed)") {
      val rnd = new Random(seed)
      // duplicates and negative keys on purpose
      val keys = (0 until 3000).map(_ => rnd.nextLong() % 500L)
      val got = Sketches.hllRegisters(keys.toDF("k").repartition(6), "k")
        .as[(Int, Int)].collect().sortBy(_._1).toSeq

      val expected = keys.map(Aggs.mix64).groupBy(h => (h >>> 56).toInt)
        .map { case (bucket, hs) =>
          bucket -> hs.map { h =>
            val w = h & 0x00FFFFFFFFFFFFFFL
            if (w == 0L) 57 else 57 - java.lang.Long.toBinaryString(w).length
          }.max
        }.toSeq.sortBy(_._1)
      assert(got == expected)
    }

    test(s"autocorr == in-memory Pearson over the lag pairs (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 4000).map { _ =>
        ("g" + rnd.nextInt(3), ts(rnd.nextInt(96) * 3600000L + rnd.nextInt(1000)))
      }
      val got = Analytics.autocorr(rows.toDF("g", "ts").repartition(5), "g", "ts")
        .select("g", "n", "autocorr").as[(String, Long, Double)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap

      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val counts = rs.groupBy(r => r._2.getTime / 3600000L)
          .map { case (h, v) => h -> v.size.toLong }
        val pairs = counts.toSeq.flatMap { case (h, x) =>
          counts.get(h + 1).map(y => (x, y)) }
        val n = pairs.size.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
        if (n < 3 || n * sxx <= sx * sx || n * syy <= sy * sy) None
        else {
          val r = (n.toDouble * sxy - sx.toDouble * sy.toDouble) /
            (math.sqrt(n.toDouble * sxx - sx.toDouble * sx.toDouble) *
             math.sqrt(n.toDouble * syy - sy.toDouble * sy.toDouble))
          Some(g -> (n, BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
      assert(got == expected)
    }

    test(s"neighborJaccard == in-memory brute force (seed $seed)") {
      val rnd = new Random(seed)
      val raw = (0 until 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val got = Graph.neighborJaccard(raw.toDF("a", "b").repartition(3))
        .select("a", "b", "common", "da", "db", "jaccard")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet

      val adj = (raw ++ raw.map(_.swap)).groupBy(_._1)
        .map { case (u, vs) => u -> vs.map(_._2).toSet }
      val expected = raw.map { case (a, b) =>
        val na = adj(a); val nb = adj(b)
        val c = (na & nb).size.toLong
        (a, b, c, na.size.toLong, nb.size.toLong,
          c.toDouble / (na.size + nb.size - c).toDouble)
      }.toSet
      assert(got == expected)
    }

    test(s"giniConcentration == in-memory rank formula (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 2000).map(_ => rnd.nextInt(25).toLong)
      val got = Analytics.giniConcentration(rows.toDF("k").repartition(4), "k")
        .select("n", "s", "s_rank", "gini")
        .as[(Long, Long, Long, Double)].head()

      val counts = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
        .toSeq.sortBy { case (k, c) => (c, k) }
      val n = counts.size.toLong
      val s = counts.map(_._2).sum
      val sRank = counts.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
      val gini = BigDecimal(2.0 * sRank / (n.toDouble * s) - (n + 1.0) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == ((n, s, sRank, gini)))
    }

    test(s"hits == in-memory integer iteration (seed $seed)") {
      val rnd = new Random(seed)
      val edges = (0 until 1500).map(_ =>
        (rnd.nextInt(60).toLong, (60 + rnd.nextInt(60)).toLong))
        .distinct
      val got = Graph.hits(edges.toDF("a", "b").repartition(5), iterations = 3)
        .select("node", "hub_scaled", "auth_scaled")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

      // straight-line reference: same longs, same floor-divisions
      val scale = 1000000L
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      var hub = nodes.map(_ -> scale).toMap
      var auth = Map.empty[Long, Long]
      for (_ <- 1 to 3) {
        val araw = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map(e => hub(e._1)).sum }
        val am = math.max(1L, araw.values.max / scale)
        auth = araw.map { case (v, r) => v -> r / am }
        val hraw = edges.groupBy(_._1).map { case (u, es) =>
          u -> es.map(e => auth(e._2)).sum }
        val hm = math.max(1L, hraw.values.max / scale)
        hub = hraw.map { case (u, r) => u -> r / hm }
      }
      val expected = nodes.map(v =>
        (v, hub.getOrElse(v, 0L), auth.getOrElse(v, 0L)))
      assert(got == expected)
    }

    test(s"bradleyTerry == in-memory MM fold (seed $seed)") {
      val rnd = new Random(seed)
      val teams = (0 until 8).map(i => s"t$i")
      val wins = (for {
        i <- teams; j <- teams if i < j
        wij = rnd.nextInt(5); wji = rnd.nextInt(5)
        row <- Seq((i, j, wij.toLong), (j, i, wji.toLong))
        if row._3 > 0
      } yield row).toSeq
      val got = Eval.bradleyTerry(wins.toDF("i", "j", "w").repartition(3),
          "i", "j", "w", iterations = 3)
        .select("team", "gamma", "n_wins")
        .as[(String, Double, Long)].collect().sortBy(_._1).toSeq

      def round6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val participants = (wins.map(_._1) ++ wins.map(_._2)).distinct.sorted
      val wTot = participants.map(t =>
        t -> wins.filter(_._1 == t).map(_._3.toDouble).sum).toMap
      val nij = wins.groupBy(w => (w._1, w._2)).map { case (k, v) =>
        k -> v.map(_._3.toDouble).sum }
      def n(a: String, b: String) =
        nij.getOrElse((a, b), 0.0) + nij.getOrElse((b, a), 0.0)
      var g = participants.map(_ -> 1.0).toMap
      for (_ <- 1 to 3) {
        g = participants.map { t =>
          // per-term round(6) DECIMAL sum, matching the operator's
          // order-free denominator (terms commute exactly once rounded)
          val den = participants.filter(o => o != t && n(t, o) > 0.0)
            .map(o => BigDecimal(round6(n(t, o) / (g(t) + g(o)))))
            .foldLeft(BigDecimal(0))(_ + _)
          t -> round6(wTot(t) / den.toDouble)
        }.toMap
      }
      val expected = participants.map(t => (t, g(t), wTot(t).toLong))
      assert(got == expected)
    }
  }

  for (seed <- Seq(3, 17, 101)) {
    test(s"mannWhitneyU == brute-force pair counting (seed $seed)") {
      val rnd = new Random(seed)
      // values on a small grid so ties are dense
      val rows = (0 until 600).map { i =>
        ("g" + rnd.nextInt(3), i.toLong, rnd.nextInt(12).toDouble)
      }
      val got = Analytics.mannWhitneyU(
          rows.toDF("grp", "user_id", "value").repartition(5),
          "grp", "value", col("user_id") % 2 === 0)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            r.getAs[Double]("u2_a"), r.getAs[Double]("z"),
            r.getAs[Double]("cliffs_delta"))).toMap
      rows.groupBy(_._1).foreach { case (grp, rs) =>
        val a = rs.filter(_._2 % 2 == 0).map(_._3)
        val b = rs.filter(_._2 % 2 == 1).map(_._3)
        // brute force over all na·nb pairs, half-credit ties, as 2U
        val u2 = a.map(x => b.map(y =>
          if (x > y) 2L else if (x == y) 1L else 0L).sum).sum
        val all = a ++ b
        val ties = all.groupBy(identity).values
          .map(g => { val t = g.size.toLong; t * t * t - t }).sum
        val (na, nb, n) = (a.size.toDouble, b.size.toDouble, all.size.toDouble)
        val v4 = (na * nb / 3.0) * ((n + 1.0) - ties / (n * (n - 1.0)))
        if (a.nonEmpty && b.nonEmpty && v4 > 0.0) {
          val (gna, gnb, gu2, gz, gd) = got(grp)
          assert((gna, gnb) == (a.size.toLong, b.size.toLong))
          assert(gu2 == u2.toDouble, s"$grp u2")
          assert(math.abs(gz - (u2 - na * nb) / math.sqrt(v4)) < 1e-6)
          assert(math.abs(gd - (u2 / (na * nb) - 1.0)) < 1e-6)
        } else assert(!got.contains(grp), s"$grp should be dropped")
      }
    }

    test(s"wilcoxonSignedRank == brute-force average ranking (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 400).map { i =>
        ("g" + rnd.nextInt(3), rnd.nextInt(9).toDouble, rnd.nextInt(9).toDouble)
      }
      val got = Analytics.wilcoxonSignedRank(
          rows.toDF("grp", "a", "b").repartition(5), "grp", "a", "b")
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_pos"),
            r.getAs[Double]("z"))).toMap
      rows.groupBy(_._1).foreach { case (grp, rs) =>
        val ds = rs.map(r => r._2 - r._3).filter(_ != 0.0)
        // average ranks of |d| ascending, brute force
        val sortedAbs = ds.map(math.abs).sorted
        def avgRank(ad: Double): Double = {
          val lo = sortedAbs.indexWhere(_ == ad)
          val hi = sortedAbs.lastIndexWhere(_ == ad)
          (lo + hi + 2) / 2.0 // 1-based average of tied ranks
        }
        val wPlus = ds.filter(_ > 0).map(d => avgRank(math.abs(d))).sum
        val ties = ds.map(math.abs).groupBy(identity).values
          .map(g => { val t = g.size.toLong; t * t * t - t }).sum
        val n = ds.size.toDouble
        val varW = n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - ties / 48.0
        if (ds.nonEmpty && varW > 0.0) {
          val (gn, gp, gz) = got(grp)
          assert(gn == ds.size.toLong && gp == ds.count(_ > 0).toLong)
          val z = (wPlus - n * (n + 1.0) / 4.0) / math.sqrt(varW)
          assert(math.abs(gz - z) < 1e-6, s"$grp: $gz vs $z")
        } else assert(!got.contains(grp), s"$grp should be dropped")
      }
    }
  }
}
