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
