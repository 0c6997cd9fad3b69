package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Randomized cross-checks for the round-7 additions vs straight-line
  * in-memory reference folds on seeded random inputs — heavy score ties,
  * degenerate slices, random graphs, and signed eigen-iterations. Each
  * reference replays the operator's EXACT arithmetic (same double ops,
  * same HALF_UP rounding, same integer divisions), so the comparisons
  * are equality, not tolerance.
  */
class Randomized7Spec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  for (seed <- Seq(7, 1234)) {

    test(s"spearmanRho == in-memory pinned-tiebreak ranks (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 2000).map { i =>
        ("s" + rnd.nextInt(6), i.toLong, rnd.nextInt(9).toDouble,
          rnd.nextInt(9).toDouble)
      }
      val got = Eval.spearmanRho(rows.toDF("slice", "id", "x", "y")
          .repartition(7), "slice", "x", "y", Seq(col("id")))
        .select("slice", "n", "d2", "rho")
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val expected = rows.groupBy(_._1).map { case (s, rs) =>
        def ranks(key: ((String, Long, Double, Double)) => Double) =
          rs.sortBy(r => (key(r), r._2)).zipWithIndex
            .map { case (r, i) => r._2 -> (i + 1).toLong }.toMap
        val rx = ranks(_._3); val ry = ranks(_._4)
        val d2 = rs.map(r => { val d = rx(r._2) - ry(r._2); d * d }).sum
        val n = rs.size.toLong
        val rho = if (n < 2) 0.0
          else r6(1.0 - 6.0 * d2.toDouble /
            (n.toDouble * (n.toDouble * n.toDouble - 1.0)))
        s -> ((n, d2.toDouble, rho))
      }
      assert(got == expected)
    }

    test(s"averagePrecisionByScore == in-memory threshold sums (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 2500).map { _ =>
        ("s" + rnd.nextInt(7), rnd.nextInt(10).toDouble, rnd.nextInt(4) == 0)
      }
      val got = Eval.averagePrecisionByScore(
          rows.toDF("slice", "score", "y").repartition(7),
          "slice", "score", col("y"))
        .select("slice", "n_pos", "n_neg", "ap")
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val expected = rows.groupBy(_._1).map { case (s, rs) =>
        val tp = rs.count(_._3).toLong
        val tn = rs.size - tp
        val byScore = rs.groupBy(_._2).toSeq.sortBy(-_._1)
        var cp = 0L; var cn = 0L
        val terms = byScore.map { case (_, g) =>
          val p = g.count(_._3).toLong; val n = g.size - p
          cp += p; cn += n
          if (tp == 0) BigDecimal(0)
          else BigDecimal(r6((p.toDouble / tp.toDouble) *
            (cp.toDouble / (cp + cn).toDouble)))
        }
        val ap = if (tp == 0) 0.0 else r6(terms.sum.toDouble)
        s -> ((tp, tn, ap))
      }
      assert(got == expected)
    }

    test(s"kcorePeel == in-memory iterative peel (seed $seed)") {
      val rnd = new Random(seed)
      val edges = (0 until 400).map { _ =>
        val a = rnd.nextInt(200).toLong; val b = rnd.nextInt(200).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val got = Graph.kcorePeel(edges.toDF("a", "b").repartition(5),
          k = 3, rounds = 4)
        .as[(Long, Long)].collect().toMap
      // reference peel on adjacency sets
      val adj = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
        .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
      var alive = adj.keySet
      for (_ <- 1 to 4)
        alive = alive.filter(n => (adj(n) & alive).size >= 3)
      val expected = alive.map(n => n -> (adj(n) & alive).size.toLong).toMap
      assert(got == expected)
    }

    test(s"modularity == in-memory Q terms (seed $seed)") {
      val rnd = new Random(seed)
      val edges = (0 until 300).map { _ =>
        val a = rnd.nextInt(80).toLong; val b = rnd.nextInt(80).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val labels = nodes.map(n => n -> (n % 5)).toMap
      val got = Graph.modularity(edges.toDF("a", "b").repartition(5),
          labels.toSeq.toDF("node", "community"))
        .select("community", "n_nodes", "e_in", "d_tot", "q_term")
        .as[(Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val m = edges.size.toLong
      val deg = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val expected = nodes.groupBy(labels).map { case (c, ns) =>
        val dTot = ns.map(deg).sum
        val eIn = edges.count(e => labels(e._1) == c && labels(e._2) == c).toLong
        val q = r6(eIn.toDouble / m.toDouble -
          (dTot.toDouble / (2.0 * m)) * (dTot.toDouble / (2.0 * m)))
        c -> ((ns.size.toLong, eIn, dTot, q))
      }
      assert(got == expected)
    }

    test(s"topEigenvector == in-memory scaled-long iteration (seed $seed)") {
      val rnd = new Random(seed)
      val d = 6
      // symmetric matrix with entries on the 1e-6 grid, mixed signs
      val upper = for (i <- 0 until d; j <- i until d) yield
        (i.toLong, j.toLong,
          (rnd.nextInt(4000001) - 2000000).toDouble / 1e6)
      val got = Similarity.topEigenvector(
          upper.toDF("i", "j", "cov").repartition(3), iterations = 3)
        .select("i", "v_scaled", "lambda")
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      // reference: identical integer ops
      val c = Array.ofDim[Long](d, d)
      upper.foreach { case (i, j, cov) =>
        val v = math.floor(cov * 1000000.0 + 0.5).toLong
        c(i.toInt)(j.toInt) = v; c(j.toInt)(i.toInt) = v
      }
      var v = Array.fill(d)(1000000L)
      def matVec(x: Array[Long]) =
        Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * x(j)).sum)
      for (_ <- 1 to 3) {
        val u = matVec(v)
        val m = math.max(1L, u.map(math.abs).max / 1000000L)
        v = u.map(x => if (x < 0) -((-x) / m) else x / m)
      }
      val uf = matVec(v)
      val num = (0 until d).map(i => BigInt(v(i)) * BigInt(uf(i))).sum
      val den = (0 until d).map(i => BigInt(v(i)) * BigInt(v(i))).sum
      val lambda = r6(num.toDouble / den.toDouble / 1000000.0)
      assert(got.map(_._2).toSeq == v.toSeq, s"${got.toSeq} vs ${v.toSeq}")
      assert(got.forall(_._3 == lambda), s"lambda ${got.head._3} vs $lambda")
    }

    test(s"interleaveWeighted == in-memory virtual-time sort (seed $seed)") {
      val rnd = new Random(seed)
      val rows = (0 until 1200).map { i =>
        (i.toLong, "src" + rnd.nextInt(5))
      }
      val w = (s: String) => (s.last - '0').toLong % 4 + 1
      val got = DataOps.interleaveWeighted(
          rows.toDF("doc_id", "source").repartition(9), "doc_id", "source",
          expr("CAST(substring(source, 4, 10) AS BIGINT) % 4 + 1"))
        .select("pos", "doc_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (s, ds) =>
        ds.map(_._1).sorted.zipWithIndex.map { case (id, k) =>
          ((k + 1).toLong * 1000000L / w(s), s, id)
        }
      }.sorted.zipWithIndex.map { case ((_, _, id), p) => (p.toLong, id) }
      assert(got == expected)
    }
  }
}
