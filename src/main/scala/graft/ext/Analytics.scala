package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics and snapshot-comparison operators.
  *
  * These generalize the reference's incremental-sync bookkeeping
  * (`app/db/postgres.py:471-502` update-joins, `app/main.py:43-57` period
  * loop) into reusable set-based operators: an ordered conversion funnel,
  * cohort retention, and a CDC-style snapshot diff (the read side of a
  * MERGE).
  */
object Analytics {

  /** Ordered conversion funnel: for each step k, a user qualifies iff they
    * have an event of type steps(k) strictly after their qualifying time
    * for step k-1 (first step: their earliest steps(0) event). Returns one
    * row per step with the surviving-user count.
    *
    * Scale: one hash aggregation + one equi-join per step, all keyed by
    * the user column — at N steps the event table is scanned once per step
    * on a pruned type filter (pushed to the scan) and every shuffle
    * carries only (user, ts). The per-step stage frame is user-cardinality
    * sized, never event-cardinality.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("t"),
      col(typeCol).as("et"))
    // stages(k): (u, t_k) = earliest qualifying event per user for step k;
    // the whole funnel is one lazy plan (a union of stage counts), not a
    // driver loop of actions. Stage k's plan embeds stage k-1's, so a
    // DEEP funnel would re-compute O(N²) stages — past 4 steps each stage
    // gets a lazy checkpoint (linear, at the cost of opaque RDD scans in
    // the plan); short funnels keep the fully-declarative plan so
    // Catalyst shows the per-step pushed filters (PlanSpec pins this).
    val barrier: DataFrame => DataFrame =
      if (steps.length > 4) _.localCheckpoint(false) else identity
    val stages = steps.tail.scanLeft(
      barrier(ev.where(col("et") === steps.head)
        .groupBy("u").agg(min(col("t")).as("t")))
    ) { (prev, step) =>
      barrier(ev.where(col("et") === step)
        .join(prev.select(col("u"), col("t").as("t_prev")), Seq("u"))
        .where(col("t") > col("t_prev"))
        .groupBy("u").agg(min(col("t")).as("t")))
    }
    stages.zip(steps).zipWithIndex.map { case ((stage, step), i) =>
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("step"),
          lit(step).as("event_type"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Cohort retention: users are grouped by the week of their first event
    * (the cohort); for every (cohort, week-offset) cell, the number of
    * distinct users active in that week. One aggregation to form cohorts,
    * one join back (user-keyed), one distinct aggregation — offsets are
    * exact because both sides of the subtraction are week-truncated.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val ev = events.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).as("w"))
    val cohorts = ev.groupBy("u").agg(min(col("w")).as("cohort_week"))
    ev.dropDuplicates("u", "w")
      .join(cohorts, Seq("u"))
      .withColumn("week_offset",
        (datediff(col("w"), col("cohort_week")) / 7).cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Exponentially-weighted moving average per key: fold
    * `s ← value·alpha + s·(1−alpha)` over each key's events in
    * (ts, tiebreak) order, starting from 0.0. The fold is an explicit
    * left-to-right `aggregate` over a sorted collected list, so the float
    * result is bit-reproducible (and replayable by an ordered
    * `list_reduce`) — a window-function EWMA via `pow` would not be.
    * Pick `alpha` binary-representable (0.25, 0.5, ...) to keep every
    * step's arithmetic exact-identical across engines.
    *
    * Scale: sequential per key by definition, parallel across keys; the
    * collected list is one key's history (bounded by per-user event
    * counts). For keys with unbounded history, fold incrementally per
    * time-slice and carry the state forward (the streaming form).
    */
  def ewma(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, alpha: Double): DataFrame = {
    val a = lit(alpha)
    events.where(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col(tsCol), col(tieCol),
          col(valCol).as("v")))).as("xs"))
      .select(col(keyCol), col("n"),
        aggregate(col("xs"), lit(0.0),
          (s, x) => x.getField("v") * a + s * (lit(1.0) - a)).as("ewma"))
  }

  /** Robust per-group outlier flags via median absolute deviation. Both
    * medians are LOWER medians picked by deterministic rank — `rn =
    * (cnt+1) div 2` under a (value, id) total order — so the selected
    * values are actual input doubles and the whole pipeline is exact (no
    * interpolation, nothing to drift between engines). A point is an
    * outlier when `|x − med| > k · MAD` with k = 3·1.4826 (the normal
    * consistency constant), the robust analogue of `anomaly_zscore`'s
    * 3σ rule — unlike the z-score it doesn't let the outliers themselves
    * inflate the threshold.
    *
    * Scale: two rank passes partitioned by the group column. With few
    * huge groups the rank becomes the skew point — swap the exact lower
    * median for a distributed selection (binary search on value with one
    * count-pass per step) or `approx_percentile`; the flag expression is
    * unchanged.
    */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, k: Double = 4.4478): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the two rank passes sort whole rows — never let them carry more
    // than (group, id, value); wide payload columns (raw text, JSON
    // props) would multiply both exchanges for no reason
    val slim = df.select(col(groupCol), col(idCol), col(valCol))
    val byVal = Window.partitionBy(groupCol).orderBy(col(valCol), col(idCol))
    val whole = Window.partitionBy(groupCol)
    val med = slim
      .withColumn("__rn", row_number().over(byVal))
      .withColumn("__cnt", count(lit(1)).over(whole))
      .where(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(col(groupCol), col(valCol).as("__med"))
    val dev = slim.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valCol) - col("__med")))
    val byDev = Window.partitionBy(groupCol).orderBy(col("__dev"), col(idCol))
    val mad = dev
      .withColumn("__rn", row_number().over(byDev))
      .withColumn("__cnt", count(lit(1)).over(whole))
      .where(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(col(groupCol), col("__dev").as("__mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .select(col(idCol), col(groupCol), round(col("__dev"), 6).as("dev"),
        (col("__dev") > lit(k) * col("__mad")).as("is_outlier"))
  }

  /** CDC-style snapshot diff: compare per-key aggregate state between an
    * old snapshot and a new one, classifying each key as added / changed /
    * unchanged (removed cannot occur when old ⊆ new, as in append-only
    * sync). This is exactly the read side of the reference's UPDATE-join
    * upsert (SURVEY §2.1 SNK2) — the rows a MERGE would touch.
    *
    * `keyCol` drives a full-outer sort-merge join of two aggregates that
    * share the same key partitioning — one shuffle per side at any scale.
    * Change detection uses the exact count, never float equality.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, countCol: String, valueCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("k"),
      col(countCol).as("n_old"), col(valueCol).as("v_old"))
    val n = newSnap.select(col(keyCol).as("k"),
      col(countCol).as("n_new"), col(valueCol).as("v_new"))
    o.join(n, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("n_old").isNull, lit("added"))
          .when(col("n_new").isNull, lit("removed"))
          .when(col("n_old") =!= col("n_new"), lit("changed"))
          .otherwise(lit("unchanged")))
  }
}
