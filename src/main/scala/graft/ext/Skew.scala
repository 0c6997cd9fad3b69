package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; explicit
  * salting remains the tool of choice when one side has a handful of
  * pathological hot keys and the other side is small enough to replicate:
  * the big side gets a random-but-deterministic salt in [0, factor), the
  * small side is exploded `factor`×, and the join key becomes (key, salt) —
  * splitting each hot key's row group across `factor` tasks.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side `factor` ways.
    * `small` is replicated `factor`× (keep it broadcast-sized). Result
    * columns = big's ++ small's (minus the duplicate key).
    *
    * Only big-side-preserving join types are allowed: a right/full outer
    * join would emit each unmatched small-side row `factor`× (once per
    * replica), silently corrupting the result.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 8, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports big-side-preserving join types only " +
      s"(${allowed.mkString(", ")}); '$joinType' would duplicate unmatched " +
      "small-side rows factor times")
    // deterministic salt (hash of the whole row would be costly; a salt from
    // a per-row monotonic id keeps the distribution uniform and replayable)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-`n` heaviest keys of `df` on `key` with counts — the diagnosis
    * step before choosing a salt factor (or a bucket cap).
    */
  def hotKeys(df: DataFrame, key: String, n: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(n)

  /** Semi-join reduction via a Bloom filter: when a selective join keeps
    * only a small fraction of the big side, shuffling the full big side
    * first is the dominant waste. Build a Bloom filter over the small
    * side's keys (one pass, kB–MB of driver state), broadcast it, and
    * filter the big side BEFORE its shuffle — non-matching rows never hit
    * the exchange. False positives (rate `fpp`) just ride along and drop
    * in the exact join; no false negatives, so results are identical.
    *
    * Only join types where dropping non-matching BIG rows is sound are
    * allowed: inner/semi (and right outer, which keeps all small rows
    * regardless). A left/full outer join must preserve unmatched big-side
    * rows with nulls — the prefilter would silently drop them.
    */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedKeys: Long, fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left_semi", "leftsemi", "right", "right_outer", "rightouter")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"bloomPrefilteredJoin supports ${allowed.mkString(", ")} only; " +
      s"'$joinType' must preserve unmatched big-side rows, which the " +
      "prefilter would drop")
    val bloom = small.stat.bloomFilter(smallKey, expectedKeys, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf { k: Any => k != null && bc.value.mightContainString(k.toString) }
    // long keys test faster through the typed path than via toString
    val mightContainLong = udf { k: java.lang.Long => k != null && bc.value.mightContainLong(k) }
    val keyType = big.schema(bigKey).dataType.typeName
    val pre =
      if (keyType == "long" || keyType == "integer")
        big.where(mightContainLong(col(bigKey).cast("long")))
      else big.where(mightContain(col(bigKey)))
    pre.join(small, pre(bigKey) === small(smallKey), joinType)
  }
}
