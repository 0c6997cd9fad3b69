package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class GraphSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("coOccurrenceEdges: distinct a<b pairs within a group") {
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 20L), (2L, 10L),
      (3L, 10L), (3L, 10L)).toDF("g", "item")
    val got = Graph.coOccurrenceEdges(df, "g", "item")
      .orderBy("a", "b").as[(Long, Long)].collect().toSeq
    // (10,10) self-pair excluded; (10,20) deduped across groups 1 and 2
    assert(got == Seq((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("pagerank: conserves rank mass and ranks the hub highest") {
    // star: 0 at the center of 1..4, plus a 5-6 pendant pair
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (5L, 6L))
      .toDF("a", "b")
    val got = Graph.pagerank(edges, iterations = 3)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == (0L to 6L))
    // integer floors only ever drop mass, never add it
    val mass = got.map(_._2).sum
    assert(mass <= 1000000000000L && mass > 999999990000L)
    val byNode = got.map(g => g._1 -> g._2).toMap
    assert(byNode(0L) > byNode(1L) && byNode(1L) == byNode(4L))
    // symmetric pendant pair: equal ranks
    assert(byNode(5L) == byNode(6L))
  }

  test("pagerank: result is partitioning-invariant (exact integers)") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 3L))
      .toDF("a", "b")
    val one = Graph.pagerank(edges.coalesce(1), 3)
      .as[(Long, Long, Double)].collect().toSet
    val many = Graph.pagerank(edges.repartition(7), 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(one == many)
  }

  test("triangleStats: counts each triangle once, any degree ordering") {
    // K4 has 4 triangles, 6 edges, 4 nodes (all degrees tie -> id order)
    val k4 = (for { a <- 0 to 3; b <- 0 to 3 if a < b }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val got = Graph.triangleStats(k4).as[(Long, Long, Long)].head()
    assert(got == ((4L, 6L, 4L)))
    // hub-and-spoke has zero triangles
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    assert(Graph.triangleStats(star).as[(Long, Long, Long)].head() ==
      ((0L, 3L, 4L)))
  }

  test("ewma: left-to-right fold in (ts, tiebreak) order") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 8.0),
      (1L, ts("2024-01-01 10:00:00"), 2L, 4.0), // same ts: event_id breaks tie
      (1L, ts("2024-01-01 09:00:00"), 3L, 16.0) // earlier ts folds first
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Analytics.ewma(ev, "user_id", "ts", "event_id", "value", 0.25)
      .as[(Long, Long, Double)].head()
    // fold: s=0 -> 16*0.25 = 4 -> 8*.25+4*.75 = 5 -> 4*.25+5*.75 = 4.75
    assert(got == ((1L, 3L, 4.75)))
  }

  test("ewma: null values are excluded from fold and count") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, Some(8.0)),
      (1L, ts("2024-01-01 11:00:00"), 2L, None)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Analytics.ewma(ev, "user_id", "ts", "event_id", "value", 0.25)
      .as[(Long, Long, Double)].head()
    assert(got == ((1L, 1L, 2.0)))
  }

  test("madOutliers: lower-median selection, robust flag") {
    // group g: values 1..9 plus an extreme 1000. Lower median of 10
    // values = 5th smallest = 5. devs: |x-5| -> sorted 0,1,1,2,2,3,3,4,995
    // and 4 (from x=1) -> lower median of devs (rank 5) = 2.
    val df = ((1 to 9).map(i => (i.toLong, "g", i.toDouble)) :+
      (10L, "g", 1000.0)).toDF("id", "grp", "v")
    val out = Analytics.madOutliers(df, "grp", "id", "v")
      .as[(Long, String, Double, Boolean)].collect().toSeq.sortBy(_._1)
    val mad = 2.0
    out.foreach { case (id, _, dev, flag) =>
      assert(flag == (dev > 4.4478 * mad), s"id=$id dev=$dev")
    }
    assert(out.count(_._4) == 1) // only the 1000 is an outlier
  }

  test("lowerMedianByGroup: exact order statistic for every size and ties") {
    // deterministic pseudo-random multiset per size, heavy on duplicates
    val rows = (1 to 60).flatMap { n =>
      (0 until n).map { i =>
        (s"g$n", ((i * 2654435761L) % 97 % 7).toDouble) // many ties
      }
    }
    val df = rows.toDF("grp", "v")
    val got = Analytics.lowerMedianByGroup(df, "grp", "v", "med")
      .as[(String, Double)].collect().toMap
    (1 to 60).foreach { n =>
      val vals = rows.filter(_._1 == s"g$n").map(_._2).sorted
      val want = vals((n + 1) / 2 - 1)
      assert(got(s"g$n") == want, s"n=$n: got ${got(s"g$n")}, want $want")
    }
  }

  test("lowerMedianByGroup: one giant tie degenerates gracefully") {
    val df = ((1 to 1000).map(i => ("g", 5.0, i)) :+ (("g", 4.0, 0)))
      .toDF("grp", "v", "i").drop("i")
    val got = Analytics.lowerMedianByGroup(df, "grp", "v", "med")
      .as[(String, Double)].head()
    assert(got == (("g", 5.0)))
  }

  test("degreeDistribution: star graph gives one hub and k leaves") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val got = Graph.degreeDistribution(edges)
      .orderBy("degree").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L), (4L, 1L)))
  }

  test("bfsHops: chain distances, hop bound, unreachable component") {
    // chain 1-2-3-4-5, disconnected pair 10-11, isolated seed 99
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val seeds = Seq(1L, 99L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // node 5 is 4 hops out -> cut by the bound; 10/11 unreachable;
    // 99 not in the graph but still a hop-0 source
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (99L, 0L)))
  }

  test("bfsHops: min distance wins when two seeds reach a node") {
    // 1-2-3-4-5 with seeds at both ends: 3 is 2 hops from either side
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.bfsHops(edges, Seq(1L, 5L).toDF("node"), maxHops = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 0L)))
  }

  test("zValue: interleaves bits (x odd positions, y even)") {
    val df = Seq((3L, 1L)).toDF("x", "y")
    // x=0b11 -> bits at pos 1,3 = 0b1010; y=0b01 -> bit at pos 0 = 0b1
    val z = df.select(Layout.zValue(col("x"), col("y"), 10).as("z"))
      .as[Long].head()
    assert(z == 11L)
  }

  test("zOrderBuckets: buckets cover disjoint small rectangles") {
    val df = (0 until 1024).map(i => (i.toLong, (i * 7 % 1024).toLong))
      .toDF("x", "y")
    val got = Layout.zOrderBuckets(df, "x", "y")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum == 1024)
    got.foreach { case (b, _, xmin, xmax, ymin, ymax) =>
      assert(xmax - xmin <= 63, s"bucket $b x-span")
      assert(ymax - ymin <= 63, s"bucket $b y-span")
    }
  }
}
