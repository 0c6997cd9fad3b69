package graft.ext

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators (`Aggregator[IN, BUF, OUT]` — the Spark-
  * idiomatic UDAF path: partial-aggregates map-side, merges
  * associatively, O(k) state).
  */
object Aggs {

  /** splitmix64 — deterministic 64-bit mix, the "random" order for
    * hash-based sampling (no RNG: reruns and retries see the same sample).
    */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Bottom-k-by-hash sample of a long id column: per group, the k ids
    * with the smallest `mix64(id)`. A uniform-without-replacement sample
    * that is deterministic, mergeable (union-then-truncate — the classic
    * KMV/bottom-k sketch), and O(k) per group at every point of the
    * aggregation — the distributed substitute for per-group reservoir
    * sampling with an RNG.
    */
  case class BottomKByHash(k: Int)
      extends Aggregator[Long, Seq[(Long, Long)], Seq[Long]] {

    private def truncate(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      b.sortBy(_._1).take(k)

    override def zero: Seq[(Long, Long)] = Seq.empty

    override def reduce(b: Seq[(Long, Long)], id: Long): Seq[(Long, Long)] = {
      val h = mix64(id)
      // buffer is kept sorted by truncate(); skip without re-sorting when
      // the candidate can't displace anything
      if (b.length >= k && h >= b.last._1) b
      else truncate(b :+ ((h, id)))
    }

    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      truncate(a ++ b)

    override def finish(b: Seq[(Long, Long)]): Seq[Long] = b.map(_._2)

    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `df.groupBy(g).agg(bottomKByHash(col("id"), 10))`. */
  def bottomKByHash(id: Column, k: Int): Column = udaf(BottomKByHash(k)).apply(id)
}
