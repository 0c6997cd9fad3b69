package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve clustering for
  * multi-dimensional scan pruning.
  *
  * The reference keeps its facts in insertion (time) order
  * (`app/db/postgres.py:394`), which prunes time predicates but nothing
  * else. At 100 TB a table queried by two independent keys wants its
  * files clustered on an interleaved (Z-order) key so min/max footer
  * stats prune BOTH dimensions — the same layout trick Delta/Iceberg
  * `OPTIMIZE ZORDER BY` applies. Everything here is exact integer bit
  * math, so layouts (and the oracle replay) are deterministic.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative long columns into
    * a Z-value: bit i of `x` lands at position 2i+1, bit i of `y` at 2i.
    * Pure integer expression — codegen'd, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Bucket rows of `df` by the top bits of the Z-value over
    * (`xCol` mod 2^bits, `yCol` mod 2^bits) and report each bucket's row
    * count and per-dimension min/max envelope. The envelope IS the
    * pruning guarantee: a Z-ordered file layout gives every file a small
    * rectangle in (x, y) space, so a predicate on either column skips
    * most buckets. `bucketBits` = log2(bucket count).
    *
    * Scale: one projection + one hash aggregation on the bucket id; at
    * write time the same Z-value feeds `repartitionByRange(zval)` to
    * produce the clustered files themselves.
    */
  def zOrderBuckets(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 10, bucketBits: Int = 8): DataFrame = {
    val m = lit(1L << bits)
    val x = col(xCol) % m
    val y = col(yCol) % m
    val z = zValue(x, y, bits)
    df.select(shiftright(z, 2 * bits - bucketBits).as("bucket"),
        x.as("x"), y.as("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
  }

  /** One Hilbert-curve refinement level of the classic xy→d fold
    * (Hamilton's public algorithm) as three engine-neutral SQL
    * expressions over columns named `x`, `y`, `d` — CASE/`&`/`+`/`*`
    * only, so Spark and the DuckDB oracle evaluate the SAME strings and
    * the index is identical by construction (the `interpValueExpr`
    * discipline). The XOR in `d += s²·((3rx) ^ ry)` is spelled as
    * `CASE WHEN rx=0 THEN ry ELSE 3-ry END` (its value table for
    * rx∈{0,1}, ry∈{0,1}) because XOR syntax differs across engines.
    * Returns (d', x', y') — the new x/y are the quadrant rotation, which
    * must be computed from the OLD x/y simultaneously (callers project
    * all three in one SELECT).
    */
  def hilbertLevelExprs(s: Long): (String, String, String) = {
    val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
    val dE = s"d + ${s * s} * (CASE WHEN $rx = 0 THEN $ry ELSE 3 - $ry END)"
    val nx = s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - y ELSE y END) ELSE x END"
    val ny = s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - x ELSE x END) ELSE y END"
    (dE, nx, ny)
  }

  /** Bucket rows by the top bits of the HILBERT index over
    * (`xCol` mod 2^bits, `yCol` mod 2^bits) — same contract as
    * `zOrderBuckets`, better layout: the Hilbert curve never jumps, so
    * consecutive index ranges are always edge-connected rectangles and
    * the per-file envelopes it produces are tighter than Z-order's
    * (Z-order's big-seam jumps give some buckets a full-width envelope).
    * `bits` unrolled levels of pure integer CASE arithmetic — one narrow
    * projection (codegen'd, no UDF, no join), then one hash aggregation;
    * at write time the same index feeds `repartitionByRange`.
    */
  def hilbertBuckets(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 10, bucketBits: Int = 8): DataFrame = {
    val m = lit(1L << bits)
    var cur = df.select((col(xCol) % m).cast("long").as("x"),
        (col(yCol) % m).cast("long").as("y"))
      .withColumn("x0", col("x")).withColumn("y0", col("y"))
      .withColumn("d", lit(0L))
    for (lvl <- (bits - 1) to 0 by -1) {
      val (dE, nxE, nyE) = hilbertLevelExprs(1L << lvl)
      cur = cur.select(col("x0"), col("y0"),
        expr(dE).as("d"), expr(nxE).as("x"), expr(nyE).as("y"))
    }
    cur.select(shiftright(col("d"), 2 * bits - bucketBits).as("bucket"),
        col("x0").as("x"), col("y0").as("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
  }

  /** Zone-map (data-skipping index) build: per fixed-size id range
    * ("file"), the min/max/null-count of a filter column — the footer
    * stats a lakehouse table format serves to the planner so a predicate
    * like `v > T` scans only ranges whose `v_max` crosses T. One narrow
    * projection + one hash aggregation on the zone id; the index is
    * ~rows/`zoneRows` rows, broadcastable to the planner at any scale.
    */
  def zoneMap(df: DataFrame, idCol: String, valCol: String,
      zoneRows: Long): DataFrame = {
    require(zoneRows > 0)
    df.select((col(idCol) / zoneRows).cast("long").as("zone"), col(valCol))
      .groupBy("zone")
      .agg(count(lit(1)).as("cnt"),
        sum(col(valCol).isNull.cast("long")).as("n_null"),
        min(valCol).as("v_min"), max(valCol).as("v_max"))
  }
}
