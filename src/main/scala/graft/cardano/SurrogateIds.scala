package graft.cardano

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Contiguous surrogate-id assignment (SURVEY.md §2.4 T3).
  *
  * The reference assigns dense ids `max(id)+1, +2, …` in order of first
  * appearance within the time-ordered record stream
  * (`/root/reference/app/main.py:34-38,128-138`). A naive
  * `row_number().over(Window.orderBy(...))` forces all rows through one
  * partition; instead we range-repartition on the order columns, sort within
  * partitions, and use RDD `zipWithIndex` (one extra count job, no single
  * partition bottleneck) — the scalable dense-rank.
  *
  * `orderCols` MUST be a total order (include a unique tiebreaker):
  * Postgres leaves ties unspecified, we pin them for reproducibility.
  */
object SurrogateIds {

  /** Append `seqCol` = 0-based dense position of each row in the total order
    * of `orderCols`.
    */
  def withSequence(df: DataFrame, seqCol: String, orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val n = df.rdd.getNumPartitions.max(1)
    val sorted =
      if (df.isEmpty) df
      else df.repartitionByRange(n, orderCols: _*).sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(seqCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** Append `idCol` = `offset + position` (dense, contiguous ids). */
  def assign(df: DataFrame, idCol: String, offset: Long, orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.functions.col
    withSequence(df, "__seq", orderCols)
      .withColumn(idCol, col("__seq") + offset)
      .drop("__seq")
  }
}
