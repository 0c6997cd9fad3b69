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

  /** Approximate heavy hitters over one column (single-pass FreqItems /
    * lossy-counting style, per-partition summaries merged on the driver —
    * no full shuffle of the key space). Guaranteed to contain every item
    * with frequency > `support`; may contain false positives, so the
    * caller re-verifies candidates with one exact filtered count (the
    * standard two-pass heavy-hitter pattern: candidate pass is cheap,
    * exact pass only counts the few candidates).
    */
  def heavyHitters(df: DataFrame, valueCol: String,
      support: Double): DataFrame = {
    val cands = df.stat.freqItems(Seq(valueCol), support)
      .collect()(0).getSeq[Any](0)
    df.filter(col(valueCol).isin(cands: _*))
      .groupBy(valueCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > (df.count() * support).toLong)
  }

  /** Per-group approximate percentiles (positional accuracy 1/accuracy). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))
}
