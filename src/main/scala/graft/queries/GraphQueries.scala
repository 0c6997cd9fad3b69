package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ext.{Analytics, Graph, Layout}

/** Graph-analytics, time-series, robust-stats, and data-layout queries —
  * the whole-dataset analyses a training-data pipeline layers on top of
  * the relational operators (SURVEY §7E). Each query pairs a Spark
  * pipeline with a bit-exact DuckDB replay: integer-scaled ranks
  * (PageRank), orientation-invariant counts (triangles), ordered float
  * folds (EWMA), deterministic rank selection (MAD), and pure bit math
  * (Z-order).
  */
object GraphQueries {
  import Queries.QueryFn

  /** Co-purchase graph: parts bought together in one order, subsampled to
    * `l_partkey % 4 = 0` so the fixed 2k/20k-part key space doesn't
    * densify into a near-clique at higher SF (the operator itself is
    * size-agnostic; the filter just bounds the demo graph).
    */
  private def coPurchase(s: org.apache.spark.sql.SparkSession, dir: String) =
    Graph.coOccurrenceEdges(
      Tables.lineitem(s, dir).where(col("l_partkey") % 4 === 0),
      "l_orderkey", "l_partkey")

  private val pairsCte =
    """WITH pairs AS (
      |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      |  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      |  WHERE l1.l_partkey < l2.l_partkey
      |    AND l1.l_partkey % 4 = 0 AND l2.l_partkey % 4 = 0
      |)""".stripMargin

  /** 3-iteration integer-scaled PageRank over the co-purchase graph. */
  val graphPagerank: QueryFn = (s, dir) =>
    Graph.pagerank(coPurchase(s, dir), iterations = 3)

  val graphPagerankSql: String = {
    def step(prev: String, out: String) =
      s"""$out AS (
         |  SELECT e.dst AS node,
         |    CAST((15 * 1000000000000) // (100 * any_value(nn.n))
         |       + (85 * sum($prev.r // deg.d)) // 100 AS BIGINT) AS r
         |  FROM edges e JOIN $prev ON $prev.node = e.src
         |    JOIN deg ON deg.src = e.src, nn
         |  GROUP BY 1
         |)""".stripMargin
    s"""$pairsCte, edges AS (
       |  SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs
       |), deg AS (
       |  SELECT src, count(*) AS d FROM edges GROUP BY 1
       |), nn AS (
       |  SELECT count(*) AS n FROM deg
       |), it0 AS (
       |  SELECT src AS node, CAST(1000000000000 // n AS BIGINT) AS r FROM deg, nn
       |), ${step("it0", "it1")}, ${step("it1", "it2")}, ${step("it2", "it3")}
       |SELECT node, r AS rank_scaled,
       |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
       |FROM it3""".stripMargin
  }

  /** Triangle / edge / node counts of the co-purchase graph. */
  val graphTriangles: QueryFn = (s, dir) =>
    Graph.triangleStats(coPurchase(s, dir))

  val graphTrianglesSql: String =
    s"""$pairsCte
       |SELECT CAST(count(*) AS BIGINT) AS triangles,
       |  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS edges,
       |  (SELECT CAST(count(DISTINCT n) AS BIGINT)
       |   FROM (SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs)) AS nodes
       |FROM pairs e1
       |JOIN pairs e2 ON e2.a = e1.b
       |JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin

  /** Per-user EWMA (alpha = 0.25) of event values in time order. */
  val tsEwma: QueryFn = (s, dir) =>
    Analytics.ewma(Tables.events(s, dir),
      "user_id", "ts", "event_id", "value", alpha = 0.25)

  val tsEwmaSql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |  list_reduce(
      |    list_prepend(CAST(0.0 AS DOUBLE), array_agg(value ORDER BY ts, event_id)),
      |    (a, x) -> x * 0.25 + a * 0.75) AS ewma
      |FROM events
      |WHERE value IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** Median-absolute-deviation outlier flags per event type (robust
    * counterpart of `anomaly_zscore`).
    */
  val anomalyMad: QueryFn = (s, dir) =>
    Analytics.madOutliers(Tables.events(s, dir),
      "event_type", "event_id", "value")

  val anomalyMadSql: String =
    """WITH r1 AS (
      |  SELECT event_type, value, event_id,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events
      |), med AS (
      |  SELECT event_type, value AS med FROM r1 WHERE rn = (cnt + 1) // 2
      |), d AS (
      |  SELECT e.event_id, e.event_type, abs(e.value - m.med) AS dev_raw,
      |    row_number() OVER (PARTITION BY e.event_type
      |      ORDER BY abs(e.value - m.med), e.event_id) AS rn,
      |    count(*) OVER (PARTITION BY e.event_type) AS cnt
      |  FROM events e JOIN med m USING (event_type)
      |), mad AS (
      |  SELECT event_type, dev_raw AS mad FROM d WHERE rn = (cnt + 1) // 2
      |)
      |SELECT d.event_id, d.event_type, round(d.dev_raw, 6) AS dev,
      |  d.dev_raw > 4.4478 * mad.mad AS is_outlier
      |FROM d JOIN mad USING (event_type)""".stripMargin

  /** Z-order layout buckets over (l_partkey, l_suppkey) with the
    * per-bucket min/max envelope that footer-stat pruning would use.
    */
  val layoutZorder: QueryFn = (s, dir) =>
    Layout.zOrderBuckets(Tables.lineitem(s, dir), "l_partkey", "l_suppkey")

  val layoutZorderSql: String = {
    val bits = (0 until 10).map { i =>
      s"((((l_partkey % 1024) >> $i) & 1) << ${2 * i + 1})" +
        s" + ((((l_suppkey % 1024) >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")
    s"""WITH z AS (
       |  SELECT CAST($bits AS BIGINT) AS zval,
       |    l_partkey % 1024 AS x, l_suppkey % 1024 AS y
       |  FROM lineitem
       |)
       |SELECT CAST(zval >> 12 AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS cnt,
       |  CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
       |  CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
       |FROM z GROUP BY 1""".stripMargin
  }

  val all: Map[String, QueryFn] = Map(
    "graph_pagerank"  -> graphPagerank,
    "graph_triangles" -> graphTriangles,
    "ts_ewma"         -> tsEwma,
    "anomaly_mad"     -> anomalyMad,
    "layout_zorder"   -> layoutZorder,
  )

  val oracles: Map[String, String] = Map(
    "graph_pagerank"  -> graphPagerankSql,
    "graph_triangles" -> graphTrianglesSql,
    "ts_ewma"         -> tsEwmaSql,
    "anomaly_mad"     -> anomalyMadSql,
    "layout_zorder"   -> layoutZorderSql,
  )
}
