package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational-operator parity suite.
  *
  * Each entry exercises one operator family from SURVEY.md §2 (the
  * reference's extraction/transform/load surface re-expressed over the
  * driver's synthetic star schema), with a DuckDB-equivalent oracle.
  *
  * Determinism rules (so the driver's sorted-hash compare passes):
  *  - double aggregates go through DECIMAL partial sums (order-independent,
  *    exact) and are cast back to DOUBLE at the end;
  *  - every ORDER BY / LIMIT / window carries a unique tiebreaker;
  *  - aggregate output columns are aliased identically in Spark and SQL.
  */
object CoreQueries {

  type QueryFn = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a double column: route through decimal. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  // ---------------------------------------------------------------------------
  // q1_agg — A-family aggregation (SURVEY §2.4): group-by w/ multi aggregates.
  // Map-side partial aggregation; no window, one shuffle on the group keys.
  // ---------------------------------------------------------------------------
  val q1Agg: QueryFn = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }
  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
      | CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------------
  // q2_join_chain — J1/J2 (SURVEY §2.3): 5-way inner equi-join chain.
  // region/nation are tiny -> broadcast; lineitem⋈orders is the only big-big
  // join (sort-merge / AQE's choice).
  // ---------------------------------------------------------------------------
  val q2JoinChain: QueryFn = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))
  }
  val q2Sql: String =
    """SELECT n_name,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
      | CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------------------
  // q3_left_join — J3 (left outer w/ null semantics): customers w/ or w/o
  // orders; nulls from the outer side flow into count/sum.
  // ---------------------------------------------------------------------------
  val q3LeftJoin: QueryFn = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
  }
  val q3Sql: String =
    """SELECT c_custkey,
      | CAST(count(o_orderkey) AS BIGINT) AS n_orders,
      | coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 0.0) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------------
  // q4_union_branches — U1 + P2 (SURVEY §2.6/2.2): two filtered projections
  // with NULL-literal schema alignment, unioned then aggregated. Mirrors the
  // reference's burn-branch / output-branch UNION ALL.
  // ---------------------------------------------------------------------------
  val q4UnionBranches: QueryFn = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val burns = li.filter(col("l_returnflag") === "R")
      .select(
        col("l_orderkey").as("key"),
        (col("l_quantity") * lit(-1.0)).as("qty"),
        lit(null).cast("string").as("addr"),
        lit("burn").as("branch"))
    val outs = li.filter(col("l_returnflag") =!= "R")
      .select(
        col("l_orderkey").as("key"),
        col("l_quantity").as("qty"),
        concat(lit("addr_"), col("l_suppkey")).as("addr"),
        lit("out").as("branch"))
    burns.unionByName(outs)
      .groupBy("branch")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("qty")).as("qty_sum"),
        count(col("addr")).as("n_addr"))
  }
  val q4Sql: String =
    """SELECT branch, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(qty AS DECIMAL(30,2))) AS DOUBLE) AS qty_sum,
      | CAST(count(addr) AS BIGINT) AS n_addr
      |FROM (
      |  SELECT l_orderkey AS key, l_quantity * -1.0 AS qty,
      |         CAST(NULL AS VARCHAR) AS addr, 'burn' AS branch
      |  FROM lineitem WHERE l_returnflag = 'R'
      |  UNION ALL
      |  SELECT l_orderkey, l_quantity, 'addr_' || l_suppkey, 'out'
      |  FROM lineitem WHERE l_returnflag <> 'R'
      |) GROUP BY branch""".stripMargin

  // ---------------------------------------------------------------------------
  // q5_first_per_key — A3 (first-record-per-entity): row_number window with a
  // pinned total order (shipdate, linenumber) inside each order.
  // ---------------------------------------------------------------------------
  val q5FirstPerKey: QueryFn = (s, dir) => {
    val w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_orderkey", "l_partkey", "l_shipdate")
  }
  val q5Sql: String =
    """SELECT l_orderkey, l_partkey, l_shipdate
      |FROM lineitem
      |QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) = 1""".stripMargin

  // ---------------------------------------------------------------------------
  // q6_last_write_wins — A4 (current_wallet_id semantics): last event per user
  // by (ts, event_id). max_by keeps this a hash aggregate (partial map-side
  // combine) instead of a window sort — the 100 TB-friendly shape.
  // ---------------------------------------------------------------------------
  val q6LastWriteWins: QueryFn = (s, dir) => {
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_type"),
        max(col("ts")).as("last_ts"))
  }
  val q6Sql: String =
    """SELECT user_id, last_type, last_ts FROM (
      |  SELECT user_id, event_type AS last_type,
      |         max(ts) OVER (PARTITION BY user_id) AS last_ts,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------------------
  // q7_json_extract — S3 (JSON navigation): get_json_object over the props
  // column; exact integer sums.
  // ---------------------------------------------------------------------------
  val q7JsonExtract: QueryFn = (s, dir) => {
    Tables.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"))
  }
  val q7Sql: String =
    """SELECT event_type,
      | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
      | CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q8_tumbling_window — ST3 (120-minute periods): epoch-aligned tumbling
  // windows, the reference's micro-batch period grid.
  // ---------------------------------------------------------------------------
  val q8TumblingWindow: QueryFn = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "120 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
      .select(col("w.start").as("w_start"), col("n"), col("value_sum"))
  }
  val q8Sql: String =
    """SELECT make_timestamp(CAST(floor(epoch(ts)/7200)*7200*1000000 AS BIGINT)) AS w_start,
      | CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS value_sum
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // q9_anti_join — J6/implicit anti (insert-when-missing): parts with no
  // shipment before the cutoff. The right side is date-filtered so the
  // result is NON-EMPTY at every SF (~11% of parts; unfiltered, every part
  // ships and a 0-row result would hash-match any query returning empty —
  // the round-6 vacuous-evidence finding). The filter lands on the scan;
  // the anti-join shuffles both sides on partkey (neither broadcastable).
  // ---------------------------------------------------------------------------
  val q9AntiJoin: QueryFn = (s, dir) => {
    val p  = Tables.part(s, dir)
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < lit("1995-07-01").cast("timestamp"))
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
  }
  val q9Sql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey
      |                    AND l_shipdate < TIMESTAMP '1995-07-01')""".stripMargin

  // ---------------------------------------------------------------------------
  // q10_semi_join — EXISTS: customers with at least one 'F' order.
  // ---------------------------------------------------------------------------
  val q10SemiJoin: QueryFn = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }
  val q10Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin

  // ---------------------------------------------------------------------------
  // q11_tip_probe — SRC3 (4th-newest block time, the ingestion-lag tip).
  // ---------------------------------------------------------------------------
  val q11TipProbe: QueryFn = (s, dir) => {
    Tables.events(s, dir)
      .select(col("ts").as("tip_ts"), col("event_id"))
      .orderBy(col("tip_ts").desc, col("event_id").desc)
      .offset(3).limit(1)
      .select("tip_ts")
  }
  val q11Sql: String =
    "SELECT ts AS tip_ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 1 OFFSET 3"

  // ---------------------------------------------------------------------------
  // q12_distinct_dim — A2 (new-entity dedup): distinct natural keys.
  // ---------------------------------------------------------------------------
  val q12DistinctDim: QueryFn = (s, dir) =>
    Tables.documents(s, dir).select("lang", "source").distinct()
  val q12Sql: String = "SELECT DISTINCT lang, source FROM documents"

  // ---------------------------------------------------------------------------
  // q13_surrogate_ids — T3 (contiguous surrogate ids): dense 1-based ids over
  // the new-entity set, assigned the same way as the sync path —
  // range-repartition + sortWithinPartitions + zipWithIndex
  // (SurrogateIds.assign), never a global-window row_number. Same result as
  // the oracle's row_number OVER (ORDER BY p_brand), without the
  // single-partition WindowExec.
  // ---------------------------------------------------------------------------
  val q13SurrogateIds: QueryFn = (s, dir) => {
    graft.cardano.SurrogateIds.assign(
      Tables.part(s, dir).select("p_brand").distinct(),
      "id", offset = 1L, orderCols = Seq(col("p_brand")))
  }
  val q13Sql: String =
    "SELECT p_brand, CAST(row_number() OVER (ORDER BY p_brand) AS BIGINT) AS id FROM (SELECT DISTINCT p_brand FROM part)"

  // ---------------------------------------------------------------------------
  // q14_sink_tip — SRC4 (resume watermark): max time across two fact tables,
  // with the genesis fallback constant.
  // ---------------------------------------------------------------------------
  val q14SinkTip: QueryFn = (s, dir) => {
    val a = Tables.orders(s, dir).agg(max(col("o_orderdate")).as("t"))
    val b = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("t"))
    a.unionByName(b)
      .agg(max(col("t")).as("m"))
      .select(coalesce(col("m"), lit("2021-03-01 21:47:00").cast("timestamp")).as("sink_tip"))
  }
  val q14Sql: String =
    """SELECT coalesce(max(t), TIMESTAMP '2021-03-01 21:47:00') AS sink_tip FROM (
      |  SELECT max(o_orderdate) AS t FROM orders
      |  UNION ALL
      |  SELECT max(l_shipdate) AS t FROM lineitem)""".stripMargin

  // ---------------------------------------------------------------------------
  // q15_range_filter — P4 (half-open period predicate): (from, to] on event
  // time, the reference's micro-batch extraction predicate.
  // ---------------------------------------------------------------------------
  val q15RangeFilter: QueryFn = (s, dir) => {
    // eventsInRange pushes the range onto the raw nanos column (a filter on
    // the converted timestamp would never reach the parquet scan)
    Tables.eventsInRange(s, dir,
      java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
  }
  val q15Sql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS value_sum
      |FROM events
      |WHERE ts > TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q16_topk — O1/O2 (ordered limit with pinned tiebreaker).
  // ---------------------------------------------------------------------------
  val q16TopK: QueryFn = (s, dir) => {
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_totalprice")
  }
  val q16Sql: String =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"

  // ---------------------------------------------------------------------------
  // q17_routing — T1 (mint/transfer conditional routing incl. the NULL
  // `is_mint_tx` trap: Python `is True` treats NULL as false ->
  // coalesce(..., false)).
  // ---------------------------------------------------------------------------
  val q17Routing: QueryFn = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("is_mint", when(col("event_type") === "purchase", lit(true)))
      .withColumn("route",
        when(coalesce(col("is_mint"), lit(false)), lit("mint")).otherwise(lit("transfer")))
      .groupBy("route")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
  }
  val q17Sql: String =
    """SELECT CASE WHEN coalesce(CASE WHEN event_type = 'purchase' THEN true END, false)
      |            THEN 'mint' ELSE 'transfer' END AS route,
      | CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS value_sum
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // q18_running_sum — windowed running aggregate (frame ROWS UNBOUNDED
  // PRECEDING): per-customer cumulative spend in order-date order.
  // ---------------------------------------------------------------------------
  val q18RunningSum: QueryFn = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(30,2)")).over(w).cast("double"))
      .select("o_orderkey", "o_custkey", "running_spend")
  }
  val q18Sql: String =
    """SELECT o_orderkey, o_custkey,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(30,2)))
      |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------------------
  // q19_topk_per_group — rank() per group with ties broken, top-3.
  // ---------------------------------------------------------------------------
  val q19TopKPerGroup: QueryFn = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "rk")
  }
  val q19Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(rk AS BIGINT) AS rk FROM (
      |  SELECT o_custkey, o_orderkey,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders) WHERE rk <= 3""".stripMargin

  // ---------------------------------------------------------------------------
  // q20_having — post-aggregation predicate.
  // ---------------------------------------------------------------------------
  val q20Having: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .where(col("n") >= 5)
  val q20Sql: String =
    """SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY l_partkey HAVING count(*) >= 5""".stripMargin

  // ---------------------------------------------------------------------------
  // q21_conditional_agg — pivot-style sum(CASE WHEN ...) aggregation.
  // ---------------------------------------------------------------------------
  val q21ConditionalAgg: QueryFn = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0))).as("spend_f"))
  val q21Sql: String =
    """SELECT o_orderpriority,
      | CAST(count(CASE WHEN o_orderstatus='F' THEN 1 END) AS BIGINT) AS n_f,
      | CAST(count(CASE WHEN o_orderstatus='O' THEN 1 END) AS BIGINT) AS n_o,
      | CAST(count(CASE WHEN o_orderstatus='P' THEN 1 END) AS BIGINT) AS n_p,
      | CAST(sum(CAST(CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0.0 END
      |          AS DECIMAL(30,2))) AS DOUBLE) AS spend_f
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------------
  // q22_hex — S1-family byte/hex functions (lowercase-hex parity trap:
  // both engines' hex() is uppercase, both get lower()).
  // ---------------------------------------------------------------------------
  val q22Hex: QueryFn = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        lower(hex(encode(substring(col("text"), 1, 8), "utf-8"))).as("prefix_hex"),
        octet_length(col("text")).cast("long").as("n_bytes"))
  val q22Sql: String =
    """SELECT doc_id, lower(hex(encode(substring(text, 1, 8)))) AS prefix_hex,
      | CAST(strlen(text) AS BIGINT) AS n_bytes
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------------------
  // q23_percentile — exact percentiles (linear interpolation in both
  // engines); the reference has no quantiles, this is extension surface.
  // ---------------------------------------------------------------------------
  val q23Percentile: QueryFn = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
  val q23Sql: String =
    """SELECT o_orderpriority,
      | quantile_cont(o_totalprice, 0.5) AS p50,
      | quantile_cont(o_totalprice, 0.9) AS p90
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------------
  // q24_count_distinct — exact distinct aggregation.
  // ---------------------------------------------------------------------------
  val q24CountDistinct: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))
  val q24Sql: String =
    """SELECT l_returnflag,
      | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      | CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------------
  // q25_scalar_subquery — orders above the global average price (the
  // scalar-subquery shape; in DataFrame form a broadcast of the 1-row agg).
  // ---------------------------------------------------------------------------
  val q25ScalarSubquery: QueryFn = (s, dir) => {
    val o = Tables.orders(s, dir)
    val avgPrice = o.agg(
      (sum(col("o_totalprice").cast("decimal(30,2)")) / count(lit(1)))
        .cast("double").as("avg_price"))
    o.crossJoin(broadcast(avgPrice))
      .where(col("o_totalprice") > col("avg_price"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_above"))
  }
  val q25Sql: String =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_above
      |FROM orders
      |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) / count(*) AS DOUBLE) FROM orders)
      |GROUP BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------------
  // q26_rollup — hierarchical subtotals (extension surface; NULL rows mark
  // the subtotal levels identically in both engines).
  // ---------------------------------------------------------------------------
  val q26Rollup: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
  val q26Sql: String =
    """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ---------------------------------------------------------------------------
  // q27_cube — full cube with grouping_id (extension surface; bitmask marks
  // the aggregation level, MSB = first cube column in both engines).
  // ---------------------------------------------------------------------------
  val q27Cube: QueryFn = (s, dir) =>
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"))
  val q27Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      | CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // ---------------------------------------------------------------------------
  // q28_intersect / q29_except — set operations (distinct semantics). The
  // reference has UNION ALL only; these complete the set-op surface.
  // ---------------------------------------------------------------------------
  val q28Intersect: QueryFn = (s, dir) =>
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
  val q28Sql: String =
    "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey AS nationkey FROM supplier"

  // q29: part keys minus early-shipped part keys — the date filter keeps
  // the difference NON-EMPTY at every SF (~1.2% of parts; the previous
  // customer-minus-supplier nation form was provably empty at sf>=0.01,
  // so its oracle hash-match was vacuous). Distinct semantics exercised
  // for real: the right side has ~30 lineitems per surviving key.
  val q29Except: QueryFn = (s, dir) =>
    Tables.part(s, dir).select(col("p_partkey").as("partkey"))
      .except(Tables.lineitem(s, dir)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_partkey").as("partkey")))
  val q29Sql: String =
    """SELECT p_partkey AS partkey FROM part
      |EXCEPT
      |SELECT l_partkey AS partkey FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01'""".stripMargin

  // ---------------------------------------------------------------------------
  // q30_correlated_subquery — customers above their nation's average balance.
  // Decorrelated to a broadcast join against the per-nation aggregate (the
  // scale shape: one shuffle for the agg, zero for the probe).
  // ---------------------------------------------------------------------------
  val q30CorrelatedSubquery: QueryFn = (s, dir) => {
    val c = Tables.customer(s, dir)
    val navg = c.groupBy(col("c_nationkey").as("nk"))
      .agg((sum(col("c_acctbal").cast("decimal(30,2)")) / count(lit(1)))
        .cast("double").as("nation_avg"))
    c.join(broadcast(navg), c("c_nationkey") === navg("nk"))
      .where(col("c_acctbal") > col("nation_avg"))
      .select("c_custkey", "c_nationkey")
  }
  val q30Sql: String =
    """SELECT c_custkey, c_nationkey FROM customer c
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(30,2))) / count(*) AS DOUBLE)
      |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin

  // ---------------------------------------------------------------------------
  // q31_pivot — relational pivot; empty cells zero-filled to match COUNT.
  // ---------------------------------------------------------------------------
  val q31Pivot: QueryFn = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("F", "O", "P"))
  val q31Sql: String =
    """SELECT o_orderpriority,
      | CAST(count(CASE WHEN o_orderstatus='F' THEN 1 END) AS BIGINT) AS "F",
      | CAST(count(CASE WHEN o_orderstatus='O' THEN 1 END) AS BIGINT) AS "O",
      | CAST(count(CASE WHEN o_orderstatus='P' THEN 1 END) AS BIGINT) AS "P"
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------------
  // q32_explode — generator/UDTF surface: word frequencies, top-20 pinned.
  // ---------------------------------------------------------------------------
  val q32Explode: QueryFn = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)
  val q32Sql: String =
    """SELECT word, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents)
      |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------------
  // q33_asof — as-of lookup: latest at-or-before 'click' per user for every
  // event, as a running conditional max — the shuffle-free as-of form (one
  // window sort, no join, no point-in-time self-join blowup).
  // ---------------------------------------------------------------------------
  val q33Asof: QueryFn = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("last_click_ts", max(when(col("event_type") === "click", col("ts"))).over(w))
      .select("event_id", "user_id", "last_click_ts")
  }
  val q33Sql: String =
    """SELECT event_id, user_id,
      | max(CASE WHEN event_type='click' THEN ts END)
      |   OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS last_click_ts
      |FROM events""".stripMargin

  // ---------------------------------------------------------------------------
  // q34_range_join — non-equi band join: tiny band table broadcast, so the
  // nested-loop side never shuffles the fact table.
  // ---------------------------------------------------------------------------
  val q34RangeJoin: QueryFn = (s, dir) => {
    import s.implicits._
    val bands = Seq(
      ("low", 0.0, 50000.0),
      ("mid", 50000.0, 150000.0),
      ("high", 150000.0, 1e308)).toDF("band", "lo", "hi")
    Tables.orders(s, dir)
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("spend"))
  }
  val q34Sql: String =
    """SELECT band, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS spend
      |FROM orders JOIN (VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
      |                         ('high', 150000.0, 1e308)) AS bands(band, lo, hi)
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band""".stripMargin

  // ---------------------------------------------------------------------------
  // q35_ntile — quartile bucketing inside each priority (pinned total order).
  // ---------------------------------------------------------------------------
  val q35Ntile: QueryFn = (s, dir) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("long").as("quartile"))
  }
  val q35Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      | CAST(ntile(4) OVER (PARTITION BY o_orderpriority
      |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS quartile
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------------------
  // q36_collect_list — array-aggregation surface; sort_array pins the
  // intra-group order so the compare is deterministic.
  // ---------------------------------------------------------------------------
  val q36CollectList: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(concat_ws(",", sort_array(collect_list(col("l_partkey")))).as("parts"))
  val q36Sql: String =
    """SELECT l_orderkey, array_to_string(list_sort(list(l_partkey)), ',') AS parts
      |FROM lineitem GROUP BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------------------
  // q37_lead_lag — offset window functions: previous timestamp / next event
  // type per user. One window shuffle on the partition key, no join.
  // ---------------------------------------------------------------------------
  val q37LeadLag: QueryFn = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        lag("ts", 1).over(w).as("prev_ts"),
        lead("event_type", 1).over(w).as("next_type"))
  }
  val q37Sql: String =
    """SELECT event_id, user_id,
      | lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
      | lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events""".stripMargin

  // ---------------------------------------------------------------------------
  // q38_stats_agg — statistical aggregates (stddev/variance/corr/covar): all
  // partial-aggregate map-side as (n, Σx, Σx², Σxy) moments — one shuffle of
  // O(groups) moment tuples. Rounded on both sides (double moment order
  // differs between engines at the last ulp).
  // ---------------------------------------------------------------------------
  val q38StatsAgg: QueryFn = (s, dir) => {
    val u = col("user_id").cast("double")
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        round(stddev_samp(col("value")), 4).as("sd_value"),
        round(var_samp(col("value")), 4).as("var_value"),
        round(corr(col("value"), u), 4).as("corr_vu"),
        round(covar_samp(col("value"), u), 4).as("covar_vu"),
        round(median(col("value")), 4).as("med_value"))
  }
  val q38Sql: String =
    """SELECT event_type,
      | round(stddev_samp(value), 4) AS sd_value,
      | round(var_samp(value), 4) AS var_value,
      | round(corr(value, CAST(user_id AS DOUBLE)), 4) AS corr_vu,
      | round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS covar_vu,
      | round(median(value), 4) AS med_value
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q39_edit_distance — levenshtein scalar (the exact-verification kernel of
  // fuzzy string dedup). Narrow projection, codegen'd, no shuffle at all.
  // ---------------------------------------------------------------------------
  val q39EditDistance: QueryFn = (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        levenshtein(col("c_name"), col("c_mktsegment")).as("lev"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev_seg"))
  val q39Sql: String =
    """SELECT c_custkey,
      | CAST(levenshtein(c_name, c_mktsegment) AS INT) AS lev,
      | CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev_seg
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------------------
  // q40_range_frame — RANGE-framed window (trailing 1-hour sum per user):
  // value-based frame bounds, not row counts. One window shuffle on the
  // partition key; the frame sum goes through DECIMAL for order-independence.
  // ---------------------------------------------------------------------------
  val q40RangeFrame: QueryFn = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-3600L * 1000000L, 0L)
    Tables.events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("hour_sum",
        sum(col("value").cast("decimal(20,2)")).over(w).cast("double"))
      .select("event_id", "user_id", "ts_us", "hour_sum")
  }
  val q40Sql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      | CAST(sum(CAST(value AS DECIMAL(20,2))) OVER (
      |   PARTITION BY user_id ORDER BY epoch_us(ts)
      |   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
      |FROM events""".stripMargin

  // ---------------------------------------------------------------------------
  // q41_sql_text — the SQL front-end: one ANSI SQL string (TPC-H Q3 shape)
  // executed verbatim by spark.sql over the registered temp views AND by
  // DuckDB as its own oracle. Proves the engine is reachable as plain SQL
  // with portable semantics, not only through the DataFrame API.
  // ---------------------------------------------------------------------------
  val q41Sql: String =
    """SELECT o_orderkey,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin
  val q41SqlText: QueryFn = (s, dir) => {
    graft.Graft.registerTables(s, dir)
    s.sql(q41Sql)
  }

  // ---------------------------------------------------------------------------
  // q42_regexp — regex capture-group extraction (codegen'd, no shuffle).
  // ---------------------------------------------------------------------------
  val q42Regexp: QueryFn = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k_val"))
  val q42Sql: String =
    """SELECT event_id,
      | CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_val
      |FROM events""".stripMargin

  // ---------------------------------------------------------------------------
  // q43_grouping_sets — arbitrary grouping sets (beyond rollup/cube) with
  // grouping() indicators; same SQL text runs on both engines (like q41).
  // ---------------------------------------------------------------------------
  val q43Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
      | CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      | CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin
  val q43GroupingSets: QueryFn = (s, dir) => {
    graft.Graft.registerTables(s, dir)
    s.sql(q43Sql)
  }

  // ---------------------------------------------------------------------------
  // q44_rank_family — relative-rank window functions (percent_rank /
  // cume_dist / dense_rank). Unique tiebreaker makes every row its own
  // peer group, so the double-valued ranks are deterministic and
  // IEEE-identical across engines. One window shuffle, no join.
  // ---------------------------------------------------------------------------
  val q44RankFamily: QueryFn = (s, dir) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      dense_rank().over(w).cast("long").as("drank"))
  }
  val q44Sql: String =
    """SELECT o_orderkey,
      | percent_rank() OVER w AS pct_rank,
      | cume_dist() OVER w AS cume,
      | CAST(dense_rank() OVER w AS BIGINT) AS drank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin

  // ---------------------------------------------------------------------------
  // q45_date_functions — calendar arithmetic surface: truncation, day
  // diffs, month-end, clamped month addition, quarter extraction. Pure
  // codegen'd projections (no shuffle). Everything is normalized to
  // timestamp/long so both engines emit identical values.
  // ---------------------------------------------------------------------------
  val q45DateFunctions: QueryFn = (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since"),
      last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
      add_months(date_trunc("day", col("o_orderdate")), 3)
        .cast("timestamp").as("plus3m"),
      quarter(col("o_orderdate")).cast("long").as("qtr"))
  val q45Sql: String =
    """SELECT o_orderkey,
      | date_trunc('month', o_orderdate) AS month_start,
      | datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      | CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      | CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
      | CAST(quarter(o_orderdate) AS BIGINT) AS qtr
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------------------
  // q46_array_functions — array surface over grouped data: sort, distinct
  // slice, membership, max. Arrays are string-joined for the compare
  // (same convention as q36).
  // ---------------------------------------------------------------------------
  val q46ArrayFunctions: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir).groupBy("l_orderkey").agg(
      concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("lines"),
      concat_ws(",", slice(sort_array(collect_set(col("l_linenumber"))), 1, 3)).as("first3"),
      array_contains(collect_list(col("l_linenumber")), 1).as("has_line1"),
      array_max(collect_list(col("l_linenumber"))).cast("long").as("max_line"))
  val q46Sql: String =
    """SELECT l_orderkey,
      | array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
      | array_to_string(list_sort(list(DISTINCT l_linenumber))[1:3], ',') AS first3,
      | list_contains(list(l_linenumber), 1) AS has_line1,
      | CAST(max(l_linenumber) AS BIGINT) AS max_line
      |FROM lineitem GROUP BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------------------
  // q47_null_scalars — row-wise null-handling scalars: nullif, coalesce
  // chains, greatest/least (null-skipping). Narrow projection, no shuffle;
  // double arithmetic is per-row IEEE, identical across engines.
  // ---------------------------------------------------------------------------
  val q47NullScalars: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      expr("nullif(l_discount, 0.0)").as("disc_nz"),
      greatest(col("l_quantity"), col("l_tax") * 100).as("g"),
      least(col("l_quantity"), col("l_extendedprice") / 100).as("l"),
      coalesce(expr("nullif(l_returnflag, 'N')"), lit("none")).as("rf"))
  val q47Sql: String =
    """SELECT l_orderkey, l_linenumber,
      | nullif(l_discount, 0.0) AS disc_nz,
      | greatest(l_quantity, l_tax * 100) AS g,
      | least(l_quantity, l_extendedprice / 100) AS l,
      | coalesce(nullif(l_returnflag, 'N'), 'none') AS rf
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------------------
  // q48_full_outer — FULL OUTER join of two aggregates with disjoint key
  // support (1995-only vs 1996-only customers exercise both null sides).
  // Shuffle on the join key both sides; AQE picks the strategy.
  // ---------------------------------------------------------------------------
  val q48FullOuter: QueryFn = (s, dir) => {
    val o = Tables.orders(s, dir)
    val a = o.where(year(col("o_orderdate")) === 1995)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n95"))
    val b = o.where(year(col("o_orderdate")) === 1996)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n96"))
    a.join(b, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"), col("n95"), col("n96"))
  }
  val q48Sql: String =
    """SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey, a.n95, b.n96
      |FROM (SELECT o_custkey, count(*) AS n95 FROM orders
      |      WHERE year(o_orderdate) = 1995 GROUP BY 1) a
      |FULL OUTER JOIN
      |     (SELECT o_custkey, count(*) AS n96 FROM orders
      |      WHERE year(o_orderdate) = 1996 GROUP BY 1) b
      |USING (o_custkey)""".stripMargin

  // ---------------------------------------------------------------------------
  // q49_string_funcs — scalar string surface: pad, slice, search, repeat,
  // reverse, split_part. Narrow codegen'd projection, no shuffle.
  // ---------------------------------------------------------------------------
  val q49StringFuncs: QueryFn = (s, dir) =>
    Tables.part(s, dir).select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, "*").as("padded"),
      substring(col("p_name"), 1, 8).as("prefix"),
      instr(col("p_name"), "a").cast("long").as("first_a"),
      org.apache.spark.sql.functions.repeat(col("p_brand"), 2).as("doubled"),
      org.apache.spark.sql.functions.reverse(col("p_brand")).as("rev"),
      expr("split_part(p_type, ' ', 1)").as("type_head"))
  val q49Sql: String =
    """SELECT p_partkey,
      | lpad(p_brand, 12, '*') AS padded,
      | substring(p_name, 1, 8) AS prefix,
      | CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
      | repeat(p_brand, 2) AS doubled,
      | reverse(p_brand) AS rev,
      | split_part(p_type, ' ', 1) AS type_head
      |FROM part""".stripMargin

  // ---------------------------------------------------------------------------
  // q50_width_bucket — equi-width histogram: width_bucket assigns each
  // price to one of 20 buckets over [900, 105000); one hash aggregate on
  // the (small) bucket key. Out-of-range rows land in buckets 0 / 21 by
  // the shared SQL semantics.
  // ---------------------------------------------------------------------------
  val q50WidthBucket: QueryFn = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(expr("width_bucket(o_totalprice, 900.0, 105000.0, 20)").as("bucket"))
      .agg(count(lit(1)).as("n"))
  // DuckDB has no width_bucket; the oracle replays Spark's exact
  // arithmetic — floor((v - min) / ((max - min) / n)) + 1, out-of-range
  // to 0 / n+1 — so boundary values agree bit-for-bit.
  val q50Sql: String =
    """SELECT CASE
      |  WHEN o_totalprice < 900.0 THEN 0
      |  WHEN o_totalprice >= 105000.0 THEN 21
      |  ELSE CAST(floor((o_totalprice - 900.0) / ((105000.0 - 900.0) / 20.0)) AS BIGINT) + 1
      |END AS bucket, count(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // q51_unpivot — wide-to-long melt: one row per (key, metric) pair via the
  // native unpivot operator (generator-backed — no join, no shuffle; the
  // oracle uses the portable UNION ALL form).
  // ---------------------------------------------------------------------------
  val q51Unpivot: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("qty"),
        dsum(col("l_discount")).as("disc"),
        dsum(col("l_tax")).as("tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("qty"), col("disc"), col("tax")), "metric", "val")
  val q51Sql: String =
    """WITH a AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS qty,
      |    CAST(sum(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) AS disc,
      |    CAST(sum(CAST(l_tax AS DECIMAL(30,2))) AS DOUBLE) AS tax
      |  FROM lineitem GROUP BY 1)
      |SELECT l_orderkey, 'qty' AS metric, qty AS val FROM a
      |UNION ALL SELECT l_orderkey, 'disc', disc FROM a
      |UNION ALL SELECT l_orderkey, 'tax', tax FROM a""".stripMargin

  // ---------------------------------------------------------------------------
  // q52_lateral_topk — correlated LATERAL subquery (the reference's J4 is
  // exactly this shape: a per-row LATERAL probe, app/db/postgres.py:380-391).
  // One shared SQL text runs verbatim on both engines; Catalyst decorrelates
  // it to a window/join plan — no nested-loop execution.
  // ---------------------------------------------------------------------------
  val q52Sql: String =
    """SELECT n.n_name, c.c_custkey, c.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3
      |) c""".stripMargin
  val q52LateralTopK: QueryFn = (s, dir) => {
    graft.Graft.registerTables(s, dir)
    s.sql(q52Sql)
  }

  // ---------------------------------------------------------------------------
  // q53_map_functions — map surface: per-order line→quantity map via
  // map_from_entries, probed with element_at / contains / size. The map is
  // an intermediate (never emitted — map columns don't canonicalize for
  // the sorted-hash compare); the oracle replays the probes relationally.
  // ---------------------------------------------------------------------------
  val q53MapFunctions: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir)
      // line numbers repeat within an order in the synthetic data, and map
      // keys must be unique -> pre-aggregate quantity per (order, line)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(dsum(col("l_quantity")).as("lq"))
      .groupBy("l_orderkey")
      .agg(map_from_entries(collect_list(
        struct(col("l_linenumber"), col("lq")))).as("m"))
      .select(
        col("l_orderkey"),
        element_at(col("m"), 1).as("qty_line1"),
        element_at(col("m"), 4).as("qty_line4"),
        map_contains_key(col("m"), 3).as("has_line3"),
        size(col("m")).cast("long").as("n_lines"))
  val q53Sql: String =
    """WITH per_line AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS lq
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_orderkey,
      | max(CASE WHEN l_linenumber = 1 THEN lq END) AS qty_line1,
      | max(CASE WHEN l_linenumber = 4 THEN lq END) AS qty_line4,
      | bool_or(l_linenumber = 3) AS has_line3,
      | count(*) AS n_lines
      |FROM per_line GROUP BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------------------
  // q54_exists_subquery — EXISTS / NOT EXISTS correlated predicates as one
  // shared SQL text; Catalyst rewrites them to semi/anti joins (the same
  // plan family the reference's dict-miss inserts decorrelate to).
  // ---------------------------------------------------------------------------
  val q54Sql: String =
    """SELECT c_custkey FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND year(o.o_orderdate) = 1997)""".stripMargin
  val q54ExistsSubquery: QueryFn = (s, dir) => {
    graft.Graft.registerTables(s, dir)
    s.sql(q54Sql)
  }

  // ---------------------------------------------------------------------------
  // q55_cross_join — explicit CROSS JOIN against a tiny literal tier table,
  // then a non-equi (>=) band per tier: cumulative customer counts per
  // region × balance tier. The literal side is broadcast; the only shuffle
  // is the final aggregate.
  // ---------------------------------------------------------------------------
  val q55CrossJoin: QueryFn = (s, dir) => {
    import s.implicits._
    val tiers = Seq(0, 5000, 9000).toDF("tier")
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    r.join(n, col("n_regionkey") === col("r_regionkey"))
      .join(c, col("c_nationkey") === col("n_nationkey"))
      .crossJoin(broadcast(tiers))
      .where(col("c_acctbal") >= col("tier"))
      .groupBy("r_name", "tier")
      .agg(count(lit(1)).as("n"))
      .select(col("r_name"), col("tier").cast("long").as("tier"), col("n"))
  }
  val q55Sql: String =
    """SELECT r_name, CAST(tier AS BIGINT) AS tier, count(*) AS n
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |CROSS JOIN (VALUES (0), (5000), (9000)) t(tier)
      |WHERE c_acctbal >= tier
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------------
  // q56_higher_order — user-facing higher-order array functions (filter /
  // transform / aggregate lambdas, codegen'd — the same machinery the ext
  // kernels build on). All three results are element-order-independent
  // (count, exact DECIMAL fold, max), so the nondeterministic collect_list
  // order never shows.
  // ---------------------------------------------------------------------------
  val q56HigherOrder: QueryFn = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(collect_list(col("l_quantity")).as("qs"))
      .select(col("l_orderkey"),
        size(filter(col("qs"), q => q > lit(30.0))).cast("long").as("n_big"),
        aggregate(col("qs"), lit(0).cast("decimal(30,4)"),
          (a, q) => (a + (q * q).cast("decimal(30,4)")).cast("decimal(30,4)"))
          .cast("double").as("sum_sq"),
        array_max(transform(col("qs"), q => q * 2)).as("max2"))
  val q56Sql: String =
    """SELECT l_orderkey,
      | CAST(len(list_filter(qs, q -> q > 30)) AS BIGINT) AS n_big,
      | CAST(list_sum(list_transform(qs, q -> CAST(q*q AS DECIMAL(30,4)))) AS DOUBLE) AS sum_sq,
      | list_max(list_transform(qs, q -> q * 2)) AS max2
      |FROM (SELECT l_orderkey, list(l_quantity) AS qs FROM lineitem GROUP BY 1)""".stripMargin

  // ---------------------------------------------------------------------------
  // q57_recursive_cte — WITH RECURSIVE (Spark 4.1+): a month spine grown
  // recursively over one order year, left-joined back for per-month
  // counts (zero months included). One shared SQL text runs verbatim on
  // both engines, like q41/q43/q52/q54. Spark executes each recursive
  // step as an iteration, so the spine is bounded to 12 steps — recursion
  // depth, not data volume, is the cost. The stop condition is a constant
  // (not the max-month CTE): a non-constant bound is re-evaluated inside
  // every iteration, which re-scanned orders 12× for one spine row each.
  // ---------------------------------------------------------------------------
  val q57Sql: String =
    """WITH RECURSIVE o AS (
      |  SELECT o_orderkey, date_trunc('month', o_orderdate) AS m
      |  FROM orders WHERE year(o_orderdate) = 1995
      |), bounds AS (
      |  SELECT min(m) AS lo FROM o
      |), months(m) AS (
      |  SELECT lo FROM bounds
      |  UNION ALL
      |  SELECT m + INTERVAL '1' MONTH FROM months
      |  WHERE m < CAST('1995-12-01' AS DATE)
      |)
      |SELECT months.m, CAST(count(o.o_orderkey) AS BIGINT) AS n
      |FROM months LEFT JOIN o ON o.m = months.m
      |GROUP BY months.m""".stripMargin
  val q57RecursiveCte: QueryFn = (s, dir) => {
    graft.Graft.registerTables(s, dir)
    s.sql(q57Sql)
  }

  // ---------------------------------------------------------------------------
  // q58_corr_regr — correlation / regression-slope aggregates computed from
  // replayable sufficient statistics: each of Σx, Σy, Σxy, Σx², Σy² is a
  // per-term-rounded exact DECIMAL sum surfaced as a scaled BIGINT, and the
  // closed-form combine is ONE shared SQL expression string evaluated by
  // both engines on identical inputs — so even float results hash-match.
  // (The built-in corr()/regr_slope() fold doubles in partition order and
  // can never be cross-engine replayable; this is the scale-correct form:
  // one map-side-combining aggregate, one tiny final projection.)
  // ---------------------------------------------------------------------------
  private val q58Combine: Seq[String] = {
    def d(c: String) = s"(CAST($c AS DOUBLE) / 1000000.0)"
    val n = "CAST(cnt AS DOUBLE)"
    val cov = s"($n * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
    val vx = s"($n * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
    val vy = s"($n * ${d("syy")} - ${d("sy")} * ${d("sy")})"
    Seq(
      "l_returnflag",
      "CAST(cnt AS BIGINT) AS n_rows",
      s"round($cov / (sqrt($vx) * sqrt($vy)), 6) AS corr_qd",
      s"round($cov / $vx, 6) AS slope_qd")
  }
  val q58CorrRegr: QueryFn = (s, dir) => {
    def sumScaled(c: Column, as: String): Column =
      (sum(round(c, 6).cast("decimal(30,6)")) * lit(1000000)).cast("long").as(as)
    val q = col("l_quantity").cast("double")
    val disc = col("l_discount").cast("double")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sumScaled(q, "sx"), sumScaled(disc, "sy"),
        sumScaled(q * disc, "sxy"), sumScaled(q * q, "sxx"),
        sumScaled(disc * disc, "syy"))
      .selectExpr(q58Combine: _*)
  }
  // ---------------------------------------------------------------------------
  // q59_bitwise — bitwise aggregate surface (bit_and/bit_or/bit_xor) plus a
  // scalar mask: integer-exact, so the whole family hash-matches trivially.
  // ---------------------------------------------------------------------------
  val q59Sql: String =
    """SELECT l_returnflag,
      | bit_and(l_orderkey) AS band, bit_or(l_orderkey) AS bor,
      | bit_xor(l_orderkey) AS bxor,
      | CAST(sum(l_orderkey & 255) AS BIGINT) AS low_sum
      |FROM lineitem GROUP BY l_returnflag""".stripMargin
  val q59Bitwise: QueryFn = (s, dir) => {
    graft.Graft.registerTables(s, dir)
    s.sql(q59Sql)
  }

  val q58Sql: String = {
    def s6(t: String) =
      s"CAST(sum(CAST(round($t, 6) AS DECIMAL(30,6))) * 1000000 AS BIGINT)"
    s"""WITH g AS (
       |  SELECT l_returnflag, count(*) AS cnt,
       |    ${s6("CAST(l_quantity AS DOUBLE)")} AS sx,
       |    ${s6("CAST(l_discount AS DOUBLE)")} AS sy,
       |    ${s6("CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE)")} AS sxy,
       |    ${s6("CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)")} AS sxx,
       |    ${s6("CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)")} AS syy
       |  FROM lineitem GROUP BY 1
       |)
       |SELECT ${q58Combine.mkString(",\n  ")}
       |FROM g""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q60_filtered_agg — per-aggregate FILTER clauses (verbatim SQL both
  // engines run): conditional counts, a DECIMAL-disciplined conditional
  // sum, and a DISTINCT aggregate under a filter. Plans as one two-phase
  // hash aggregate — the filters become per-row predicates on the
  // aggregate inputs, never separate scans.
  // ---------------------------------------------------------------------------
  val q60Sql: String =
    """SELECT l_returnflag,
      |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
      |  CAST(coalesce(sum(CAST(l_quantity AS DECIMAL(30,2)))
      |    FILTER (WHERE l_linestatus = 'O'), 0) AS DOUBLE) AS qty_open,
      |  CAST(count(DISTINCT l_suppkey) FILTER (WHERE l_discount > 0.05)
      |    AS BIGINT) AS n_disc_supp
      |FROM lineitem GROUP BY l_returnflag""".stripMargin
  val q60FilteredAgg: QueryFn = (s, dir) => {
    graft.Graft.registerTables(s, dir)
    s.sql(q60Sql)
  }

  // ---------------------------------------------------------------------------
  // q61_try_cast — error-safe casting surface (verbatim SQL): TRY_CAST
  // yields NULL instead of failing on malformed or overflowing input, so
  // ingestion over dirty columns stays total. Counts of successful parses
  // are integer-exact in both engines.
  // ---------------------------------------------------------------------------
  val q61Sql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(TRY_CAST(p_type AS DOUBLE)) AS BIGINT) AS type_numeric,
      |  CAST(count(TRY_CAST(substr(p_brand, 7, 9) AS INTEGER)) AS BIGINT)
      |    AS brand_numeric,
      |  CAST(sum(coalesce(TRY_CAST(substr(p_brand, 7, 9) AS INTEGER), -1))
      |    AS BIGINT) AS brand_sum,
      |  CAST(count(TRY_CAST('99999999999999999999' AS BIGINT)) AS BIGINT)
      |    AS overflow_nulls
      |FROM part""".stripMargin
  val q61TryCast: QueryFn = (s, dir) => {
    graft.Graft.registerTables(s, dir)
    s.sql(q61Sql)
  }

  // ---------------------------------------------------------------------------
  // q62_sliding_window — hopping (overlapping) event-time windows: 2-hour
  // span sliding every 30 minutes, so each event lands in exactly 4
  // windows. The oracle replays Spark's epoch-aligned assignment: the
  // last covering start is floor(epoch/slide)·slide and the rest step
  // back by the slide.
  // ---------------------------------------------------------------------------
  val q62SlidingWindow: QueryFn = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("value_sum"))
  }
  val q62Sql: String =
    """SELECT make_timestamp(CAST((floor(epoch(ts)/1800)*1800 - k.k*1800)
      |    * 1000000 AS BIGINT)) AS w_start,
      |  event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS value_sum
      |FROM events, unnest(generate_series(0, 3)) k(k)
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------------
  // q63_session_window — native session windows (ST3's data-driven
  // sibling): per-user activity sessions closed by a 30-minute gap;
  // window end = last event + gap. Replayed by the gaps-and-islands
  // construction — pinning Spark's session_window to the explicit SQL
  // semantics the custom sessionize operator also uses.
  // ---------------------------------------------------------------------------
  val q63SessionWindow: QueryFn = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n"))
  }
  val q63Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), isl AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked
      |)
      |SELECT user_id, min(ts) AS s_start,
      |  max(ts) + INTERVAL 30 MINUTE AS s_end,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM isl GROUP BY user_id, sid""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q60_filtered_agg"  -> q60FilteredAgg,
    "q61_try_cast"      -> q61TryCast,
    "q62_sliding_window"-> q62SlidingWindow,
    "q63_session_window"-> q63SessionWindow,
    "q57_recursive_cte" -> q57RecursiveCte,
    "q58_corr_regr"     -> q58CorrRegr,
    "q59_bitwise"       -> q59Bitwise,
    "q56_higher_order"  -> q56HigherOrder,
    "q52_lateral_topk"  -> q52LateralTopK,
    "q53_map_functions" -> q53MapFunctions,
    "q54_exists_subquery" -> q54ExistsSubquery,
    "q55_cross_join"    -> q55CrossJoin,
    "q48_full_outer"    -> q48FullOuter,
    "q49_string_funcs"  -> q49StringFuncs,
    "q50_width_bucket"  -> q50WidthBucket,
    "q51_unpivot"       -> q51Unpivot,
    "q44_rank_family"   -> q44RankFamily,
    "q45_date_functions"-> q45DateFunctions,
    "q46_array_functions"-> q46ArrayFunctions,
    "q47_null_scalars"  -> q47NullScalars,
    "q27_cube"          -> q27Cube,
    "q28_intersect"     -> q28Intersect,
    "q29_except"        -> q29Except,
    "q30_correlated_subquery" -> q30CorrelatedSubquery,
    "q31_pivot"         -> q31Pivot,
    "q32_explode"       -> q32Explode,
    "q33_asof"          -> q33Asof,
    "q37_lead_lag"      -> q37LeadLag,
    "q38_stats_agg"     -> q38StatsAgg,
    "q39_edit_distance" -> q39EditDistance,
    "q40_range_frame"   -> q40RangeFrame,
    "q41_sql_text"      -> q41SqlText,
    "q42_regexp"        -> q42Regexp,
    "q43_grouping_sets" -> q43GroupingSets,
    "q34_range_join"    -> q34RangeJoin,
    "q35_ntile"         -> q35Ntile,
    "q36_collect_list"  -> q36CollectList,
    "q25_scalar_subquery" -> q25ScalarSubquery,
    "q26_rollup"        -> q26Rollup,
    "q23_percentile"    -> q23Percentile,
    "q24_count_distinct"-> q24CountDistinct,
    "q18_running_sum"   -> q18RunningSum,
    "q19_topk_per_group"-> q19TopKPerGroup,
    "q20_having"        -> q20Having,
    "q21_conditional_agg"-> q21ConditionalAgg,
    "q22_hex"           -> q22Hex,
    "q1_agg"            -> q1Agg,
    "q2_join_chain"     -> q2JoinChain,
    "q3_left_join"      -> q3LeftJoin,
    "q4_union_branches" -> q4UnionBranches,
    "q5_first_per_key"  -> q5FirstPerKey,
    "q6_last_write_wins"-> q6LastWriteWins,
    "q7_json_extract"   -> q7JsonExtract,
    "q8_tumbling_window"-> q8TumblingWindow,
    "q9_anti_join"      -> q9AntiJoin,
    "q10_semi_join"     -> q10SemiJoin,
    "q11_tip_probe"     -> q11TipProbe,
    "q12_distinct_dim"  -> q12DistinctDim,
    "q13_surrogate_ids" -> q13SurrogateIds,
    "q14_sink_tip"      -> q14SinkTip,
    "q15_range_filter"  -> q15RangeFilter,
    "q16_topk"          -> q16TopK,
    "q17_routing"       -> q17Routing,
  )

  val oracles: Map[String, String] = Map(
    "q48_full_outer"    -> q48Sql,
    "q49_string_funcs"  -> q49Sql,
    "q50_width_bucket"  -> q50Sql,
    "q51_unpivot"       -> q51Sql,
    "q52_lateral_topk"  -> q52Sql,
    "q53_map_functions" -> q53Sql,
    "q54_exists_subquery" -> q54Sql,
    "q55_cross_join"    -> q55Sql,
    "q56_higher_order"  -> q56Sql,
    "q57_recursive_cte" -> q57Sql,
    "q58_corr_regr"     -> q58Sql,
    "q59_bitwise"       -> q59Sql,
    "q60_filtered_agg"  -> q60Sql,
    "q61_try_cast"      -> q61Sql,
    "q62_sliding_window"-> q62Sql,
    "q63_session_window"-> q63Sql,
    "q44_rank_family"   -> q44Sql,
    "q45_date_functions"-> q45Sql,
    "q46_array_functions"-> q46Sql,
    "q47_null_scalars"  -> q47Sql,
    "q27_cube"          -> q27Sql,
    "q28_intersect"     -> q28Sql,
    "q29_except"        -> q29Sql,
    "q30_correlated_subquery" -> q30Sql,
    "q31_pivot"         -> q31Sql,
    "q32_explode"       -> q32Sql,
    "q33_asof"          -> q33Sql,
    "q37_lead_lag"      -> q37Sql,
    "q38_stats_agg"     -> q38Sql,
    "q39_edit_distance" -> q39Sql,
    "q40_range_frame"   -> q40Sql,
    "q41_sql_text"      -> q41Sql,
    "q42_regexp"        -> q42Sql,
    "q43_grouping_sets" -> q43Sql,
    "q34_range_join"    -> q34Sql,
    "q35_ntile"         -> q35Sql,
    "q36_collect_list"  -> q36Sql,
    "q25_scalar_subquery" -> q25Sql,
    "q26_rollup"        -> q26Sql,
    "q23_percentile"    -> q23Sql,
    "q24_count_distinct"-> q24Sql,
    "q18_running_sum"   -> q18Sql,
    "q19_topk_per_group"-> q19Sql,
    "q20_having"        -> q20Sql,
    "q21_conditional_agg"-> q21Sql,
    "q22_hex"           -> q22Sql,
    "q1_agg"            -> q1Sql,
    "q2_join_chain"     -> q2Sql,
    "q3_left_join"      -> q3Sql,
    "q4_union_branches" -> q4Sql,
    "q5_first_per_key"  -> q5Sql,
    "q6_last_write_wins"-> q6Sql,
    "q7_json_extract"   -> q7Sql,
    "q8_tumbling_window"-> q8Sql,
    "q9_anti_join"      -> q9Sql,
    "q10_semi_join"     -> q10Sql,
    "q11_tip_probe"     -> q11Sql,
    "q12_distinct_dim"  -> q12Sql,
    "q13_surrogate_ids" -> q13Sql,
    "q14_sink_tip"      -> q14Sql,
    "q15_range_filter"  -> q15Sql,
    "q16_topk"          -> q16Sql,
    "q17_routing"       -> q17Sql,
  )
}
