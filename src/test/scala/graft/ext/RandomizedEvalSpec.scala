package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Randomized cross-checks for the round-6 eval kernels vs straight-line
  * in-memory reference folds on seeded random inputs — tie-heavy scores,
  * degenerate slices, and partition-boundary effects included.
  */
class RandomizedEvalSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  for (seed <- Seq(3, 99, 4242)) {
    test(s"aucBySlice == in-memory tied-rank AUC (seed $seed)") {
      val rnd = new Random(seed)
      // few distinct scores -> heavy ties; some slices all-one-class
      val rows = (0 until 3000).map { _ =>
        ("s" + rnd.nextInt(8), rnd.nextInt(12).toLong, rnd.nextBoolean())
      }
      val df = rows.toDF("slice", "score", "y").repartition(7)
      val got = Eval.aucBySlice(df, "slice", "score", col("y"))
        .select("slice", "n_pos", "n_neg", "auc")
        .as[(String, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      val expected = rows.groupBy(_._1).map { case (s, rs) =>
        val pos = rs.count(_._3).toLong
        val neg = rs.size - pos
        val auc = if (pos == 0 || neg == 0) None
        else {
          // Mann–Whitney with half credit for ties, brute force
          val u = (for {
            p <- rs if p._3; n <- rs if !n._3
          } yield if (p._2 > n._2) 1.0 else if (p._2 == n._2) 0.5 else 0.0).sum
          Some(r6(u / (pos.toDouble * neg.toDouble)))
        }
        s -> ((pos, neg, auc))
      }
      assert(got == expected)
    }

    test(s"binaryConfusion == in-memory counts (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 2000).map { _ =>
        ("s" + rnd.nextInt(5), rnd.nextBoolean(), rnd.nextBoolean())
      }
      val got = Eval.binaryConfusion(rows.toDF("slice", "y", "p")
          .repartition(5), "slice", col("y"), col("p"))
        .select("slice", "tp", "fp", "fn", "tn", "f1")
        .as[(String, Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val expected = rows.groupBy(_._1).map { case (s, rs) =>
        val tp = rs.count(r => r._2 && r._3).toLong
        val fp = rs.count(r => !r._2 && r._3).toLong
        val fn = rs.count(r => r._2 && !r._3).toLong
        val tn = rs.count(r => !r._2 && !r._3).toLong
        val f1 = r6(2.0 * tp / math.max(2 * tp + fp + fn, 1L))
        s -> ((s, tp, fp, fn, tn, f1))
      }
      assert(got == expected)
    }

    test(s"filterFunnel == in-memory first-fail accounting (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 3000).map(_ =>
        (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong,
          rnd.nextInt(100).toLong))
      val got = DataOps.filterFunnel(rows.toDF("a", "b", "c").repartition(9),
          Seq(("s1", col("a") >= 20), ("s2", col("b") >= 40),
            ("s3", col("c") >= 10)))
        .select("stage", "n_in", "n_rejected", "n_out")
        .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
      def firstFail(r: (Long, Long, Long)): Int =
        if (r._1 < 20) 1 else if (r._2 < 40) 2 else if (r._3 < 10) 3 else 0
      val ff = rows.map(firstFail)
      var nIn = rows.size.toLong
      for (i <- 1 to 3) {
        val rej = ff.count(_ == i).toLong
        assert(got(i - 1) == ((i, nIn, rej, nIn - rej)))
        nIn -= rej
      }
    }

    test(s"welchT == in-memory statistic on rounded terms (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 2000).map { _ =>
        ("g" + rnd.nextInt(4), rnd.nextDouble() * 10 - 5, rnd.nextBoolean())
      }
      val got = Analytics.welchT(rows.toDF("grp", "v", "a").repartition(6),
          "grp", "v", col("a"))
        .select("grp", "n_a", "n_b", "t_welch")
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val (as, bs) = rs.partition(_._3)
        if (as.size < 2 || bs.size < 2) None
        else {
          // the kernel's exact pipeline: per-term round(6) sums
          def stats(xs: Seq[Double]) = {
            val s = xs.map(x => BigDecimal(r6(x))).sum.toDouble
            val q = xs.map(x => BigDecimal(r6(x * x))).sum.toDouble
            (xs.size.toDouble, s, q)
          }
          val (na, sa, qa) = stats(as.map(_._2))
          val (nb, sb, qb) = stats(bs.map(_._2))
          val se = ((qa - sa * sa / na) / (na - 1.0)) / na +
            ((qb - sb * sb / nb) / (nb - 1.0)) / nb
          if (se <= 0.0) None
          else Some(g -> ((g, as.size.toLong, bs.size.toLong,
            r6((sa / na - sb / nb) / math.sqrt(se)))))
        }
      }
      assert(got == expected)
    }

    test(s"regressionMetrics == in-memory MAE/RMSE (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 2000).map { _ =>
        ("s" + rnd.nextInt(4), rnd.nextDouble() * 20,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 20))
      }
      val got = Eval.regressionMetrics(rows.toDF("slice", "y", "yhat")
          .repartition(8), "slice", "y", "yhat")
        .select("slice", "n", "mae", "rmse")
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      val expected = rows.groupBy(_._1).map { case (s, rs) =>
        val kept = rs.collect { case (_, y, Some(p)) => (y, p) }
        val sa = kept.map { case (y, p) => BigDecimal(r6(math.abs(y - p))) }
          .sum.toDouble
        val sq = kept.map { case (y, p) => BigDecimal(r6((y - p) * (y - p))) }
          .sum.toDouble
        s -> ((s, kept.size.toLong, r6(sa / kept.size),
          r6(math.sqrt(sq / kept.size))))
      }
      assert(got == expected)
    }

    test(s"mcnemar == in-memory discordant accounting (seed $seed)") {
      val rnd = new Random(seed)
      // include slices with forced concordance and near-symmetric cells
      val rows = (0 until 2500).map { _ =>
        val s = "s" + rnd.nextInt(6)
        val a = rnd.nextBoolean()
        val b = if (s == "s0") a else rnd.nextBoolean()
        (s, a, b)
      }
      val got = Eval.mcnemar(rows.toDF("slice", "ra", "rb").repartition(9),
          "slice", col("ra"), col("rb"))
        .select("slice", "n_items", "b", "c", "chi2_mcnemar")
        .as[(String, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val expected = rows.groupBy(_._1).map { case (s, rs) =>
        val b = rs.count(r => r._2 && !r._3).toLong
        val c = rs.count(r => !r._2 && r._3).toLong
        val chi = if (b + c == 0 || math.abs(b - c) <= 1) 0.0
        else r6((math.abs(b - c) - 1.0) * (math.abs(b - c) - 1.0) / (b + c))
        s -> ((rs.size.toLong, b, c, chi))
      }
      assert(got == expected)
    }

    test(s"fleissKappa == in-memory sufficient statistics (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 2500).map { _ =>
        val s = "s" + rnd.nextInt(6)
        // s0 is unanimous-positive everywhere -> the 0/0 convention path
        if (s == "s0") (s, true, true, true)
        else (s, rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean())
      }
      val got = Eval.fleissKappa(rows.toDF("slice", "r1", "r2", "r3")
          .repartition(11), "slice",
          Seq(col("r1"), col("r2"), col("r3")))
        .select("slice", "n_items", "sum_sq", "s_pos", "kappa")
        .as[(String, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val expected = rows.groupBy(_._1).map { case (s, rs) =>
        val n = rs.size.toLong
        val ms = rs.map(r => Seq(r._2, r._3, r._4).count(identity).toLong)
        val sumSq = ms.map(m => m * m + (3 - m) * (3 - m)).sum
        val sPos = ms.sum
        // the kappa expression divides the UNROUNDED pbar/pe
        val kappa = if (sPos == 0L || sPos == 3 * n) 1.0
        else {
          val p = sPos.toDouble / (3.0 * n)
          val pe = p * p + (1.0 - p) * (1.0 - p)
          val pbar = (sumSq - 3.0 * n) / (6.0 * n)
          r6((pbar - pe) / (1.0 - pe))
        }
        s -> ((n, sumSq, sPos, kappa))
      }
      assert(got == expected)
    }
  }
}
