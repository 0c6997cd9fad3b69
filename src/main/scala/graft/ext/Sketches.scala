package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate, mergeable aggregates — the 100 TB substitute for exact
  * re-scans. Exact `countDistinct` over a growing fact table re-shuffles
  * the full key set every period; a per-period HLL sketch column is O(kB)
  * per group, unions associatively across periods/partitions, and reads
  * back with bounded (~2% at lgK=12) error. All built-ins (DataSketches
  * HLL + HLL++ + KLL-style percentile_approx), codegen-friendly, no UDAF.
  */
object Sketches {

  /** Per-group approximate distinct count (HLL++, rsd=0.05 default). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Per-group mergeable HLL sketch (binary column — persist it next to
    * the period's facts, union later).
    */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Union previously-built sketches (e.g. one per period) back into a
    * per-group estimate — no touch of the original rows.
    */
  def mergeSketches(df: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("approx_distinct"))

  /** Per-group approximate percentiles (positional accuracy 1/accuracy). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))
}
