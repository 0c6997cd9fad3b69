package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale stress for the event-analytics family (funnel / cohort /
  * z-score / snapshot diff): generates a synthetic event stream with
  * PLANTED structure (pure expressions — no driver loops), runs the four
  * operators at 10-100× the bench event table, prints per-op timing, and
  * asserts the planted structure is recovered exactly:
  *  - every user emits the cycle view→click→purchase→error→signup in ts
  *    order, so funnel step k must count exactly the users with ≥ k
  *    events;
  *  - users are assigned to 3 cohort weeks round-robin and are active
  *    only in their own week, so retention must be a diagonal;
  *  - z-scores are standard: outliers (|z|>3) must be < 1% of rows and
  *    every z must be finite;
  *  - the snapshot diff of a time-split aggregation can contain no
  *    'removed' keys and n_old <= n_new everywhere.
  *
  * Run: sbt "Test/runMain graft.ext.ScaleAnalytics [nEvents]"
  */
object ScaleAnalytics {

  private val types = Seq("view", "click", "purchase", "error", "signup")

  /** nEvents rows over nEvents/8 users: user u gets 8 events at
    * ts = base + (u % 3) weeks + seq hours, types cycling through the
    * funnel order — every user completes every funnel step.
    */
  def generate(spark: SparkSession, nEvents: Long): DataFrame = {
    val typeArr = array(types.map(lit): _*)
    spark.range(0, nEvents)
      .select(
        col("id").as("event_id"),
        (col("id") / 8).cast("long").as("user_id"),
        (col("id") % 8).cast("int").as("seq"))
      .withColumn("ts",
        timestamp_seconds(
          lit(1704067200L) // 2024-01-01 00:00 UTC, a Monday
            + pmod(col("user_id"), lit(3)) * 7L * 86400L
            + col("seq") * 3600L))
      .withColumn("event_type",
        element_at(typeArr, (pmod(col("seq"), lit(5)) + 1).cast("int")))
      .withColumn("value",
        (pmod(xxhash64(col("event_id")), lit(1000)).cast("double") / 10.0))
      .drop("seq")
  }

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = graft.Graft.session("scale-analytics")
    val ev = generate(spark, nEvents).localCheckpoint() // isolate gen cost
    val nUsers = nEvents / 8
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }
    println(s"== ScaleAnalytics: $nEvents events / $nUsers users ==")

    // funnel: every user has view(seq0) < click(seq1) < purchase(seq2)
    val funnel = t("funnel") {
      Analytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
        .orderBy("step").collect()
    }
    funnel.foreach { r =>
      assert(r.getLong(2) == nUsers,
        s"funnel step ${r.getLong(0)} = ${r.getLong(2)}, want $nUsers")
    }

    // cohort: 3 cohorts, each active only at offset 0 (8 hourly events)
    val cohorts = t("cohort") {
      Analytics.cohortRetention(ev, "user_id", "ts").collect()
    }
    assert(cohorts.length == 3, s"want 3 cohort cells, got ${cohorts.length}")
    assert(cohorts.forall(_.getLong(1) == 0L), "non-diagonal retention cell")
    assert(cohorts.map(_.getLong(2)).sum == nUsers)

    // z-score outliers: uniform values -> no |z|>3 at all (bounded tails)
    val stats = ev.groupBy("event_type").agg(
      count(lit(1)).as("cnt"),
      (sum(round(col("value"), 6).cast("decimal(30,6)")) * lit(1000000))
        .cast("long").as("sx"),
      (sum(round(col("value") * col("value"), 6).cast("decimal(30,6)"))
        * lit(1000000)).cast("long").as("sxx"))
    val nOut = t("zscore") {
      ev.join(broadcast(stats), Seq("event_type"))
        .selectExpr("CAST(cnt AS DOUBLE) AS n",
          "(CAST(sx AS DOUBLE) / 1000000.0) AS sxd",
          "(CAST(sxx AS DOUBLE) / 1000000.0) AS sxxd", "value")
        .where(expr(
          "abs((value - sxd / n) / sqrt((n * sxxd - sxd * sxd) / (n * (n - 1.0)))) > 3.0"))
        .count()
    }
    assert(nOut == 0L, s"uniform values produced $nOut |z|>3 outliers")

    // snapshot diff across a time split: append-only => never 'removed'
    def snap(df: DataFrame) = df.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(30,2)")).cast("double").as("v"))
    val diff = t("snapshot-diff") {
      Analytics.snapshotDiff(
        snap(ev.where(col("ts") < timestamp_seconds(lit(1704067200L + 4L * 86400L)))),
        snap(ev), "user_id", "n", "v")
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(!diff.contains("removed"), s"append-only diff contains removed: $diff")
    assert(diff.values.sum == nUsers)
    println(s"  diff statuses: $diff")

    // ewma: one row per user; values live in [0, 100) so any convex
    // combination (and hence the fold) must too
    val ewmaBad = t("ewma") {
      Analytics.ewma(ev, "user_id", "ts", "event_id", "value", 0.25)
        .where(col("n") =!= 8 || col("ewma") < 0.0 || col("ewma") >= 100.0 ||
          isnan(col("ewma")))
        .count()
    }
    assert(ewmaBad == 0L, s"$ewmaBad users with out-of-range EWMA state")

    // MAD: uniform values have max |x − med| ≈ 50 < 4.4478·MAD (≈ 111),
    // so the robust filter must flag nothing
    val madOut = t("mad") {
      Analytics.madOutliers(ev, "event_type", "event_id", "value")
        .where(col("is_outlier")).count()
    }
    assert(madOut == 0L, s"uniform values produced $madOut MAD outliers")

    // markov: each user's stream is v,c,p,e,s,v,c,p — the transition
    // matrix is closed-form: v→c ×2/user, c→p ×2/user, p→e, e→s, s→v
    val markov = t("markov") {
      Analytics.markovTransitions(ev, "user_id", "ts", "event_id",
          "event_type")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
    }
    val wantMk = Map(
      ("view", "click") -> 2L * nUsers, ("click", "purchase") -> 2L * nUsers,
      ("purchase", "error") -> nUsers, ("error", "signup") -> nUsers,
      ("signup", "view") -> nUsers)
    assert(markov.keySet == wantMk.keySet, s"transition set ${markov.keySet}")
    wantMk.foreach { case (k, n) =>
      assert(markov(k)._1 == n, s"$k count ${markov(k)._1} != $n")
      assert(markov(k)._2 == 1.0, s"$k prob ${markov(k)._2} != 1.0 (cycle)")
    }

    // welch: even- vs odd-user values draw from the SAME uniform hash
    // distribution, so |t| stays small at any scale; counts are exact
    val welch = t("welch") {
      Analytics.welchT(ev, "event_type", "value", col("user_id") % 2 === 0)
        .collect()
    }
    assert(welch.length == types.size)
    welch.foreach { r =>
      val (na, nb, tW) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val perType = if (Seq("view", "click", "purchase")
          .contains(r.getString(0))) 2L * nUsers else nUsers
      assert(na + nb == perType, s"${r.getString(0)} cohorts $na+$nb")
      assert(math.abs(tW) < 6.0, s"same-distribution |t| = $tW")
    }

    // lag-1 forecast metrics: exactly one head row per user drops (the
    // user's first event is a 'view'), errors live in (-100, 100)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val reg = t("regression") {
      Eval.regressionMetrics(
        ev.withColumn("yhat", lag(col("value"), 1).over(w)),
        "event_type", "value", "yhat").collect()
    }
    val regN = reg.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(regN("view") == nUsers && regN("click") == 2L * nUsers,
      s"lag-1 head accounting off: $regN")
    reg.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 100.0 &&
        r.getDouble(3) >= r.getDouble(2) && r.getDouble(3) < 100.0,
        s"${r.getString(0)} mae/rmse out of range")
    }

    // sequence pattern: every user's symbol string is 'vcpesvcp' —
    // exactly two 'v+cp' matches, at any scale
    val seqBad = t("seq-pattern") {
      ev.groupBy("user_id")
        .agg(concat_ws("", transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c")))),
          e => e.getField("c"))).as("seq"))
        .where(expr("regexp_count(seq, 'v+cp')") =!= 2)
        .count()
    }
    assert(seqBad == 0L, s"$seqBad users without exactly 2 pattern matches")

    // mann-whitney: U_A + U_B = na·nb is an EXACT identity of the
    // statistic (tie half-credits cancel), so the two cohort runs must
    // conserve it at any scale; same-distribution cohorts keep |z| < 6
    // and |delta| tiny, and a disjoint planted shift drives delta to
    // EXACTLY 1 with u2a = 2·na·nb
    val mw = t("mannwhitney") {
      val a = Analytics.mannWhitneyU(ev, "event_type", "value",
        col("user_id") % 2 === 0).collect()
        .map(r => r.getString(0) -> r).toMap
      val b = Analytics.mannWhitneyU(ev, "event_type", "value",
        col("user_id") % 2 =!= 0).collect()
        .map(r => r.getString(0) -> r).toMap
      (a, b)
    }
    mw._1.foreach { case (ty, ra) =>
      val rb = mw._2(ty)
      val (na, nb) = (ra.getAs[Long]("n_a"), ra.getAs[Long]("n_b"))
      assert(ra.getAs[Double]("u2_a") + rb.getAs[Double]("u2_a") ==
        2.0 * na * nb, s"$ty: U_A + U_B must equal na*nb exactly")
      assert(math.abs(ra.getAs[Double]("z")) < 6.0,
        s"$ty same-distribution |z| = ${ra.getAs[Double]("z")}")
      assert(math.abs(ra.getAs[Double]("cliffs_delta")) < 0.01,
        s"$ty same-distribution delta = ${ra.getAs[Double]("cliffs_delta")}")
    }
    val mwShift = t("mw-shifted") {
      Analytics.mannWhitneyU(
        ev.withColumn("value", col("value") +
          when(col("user_id") % 2 === 0, 10000.0).otherwise(0.0)),
        "event_type", "value", col("user_id") % 2 === 0).collect()
    }
    mwShift.foreach { r =>
      assert(r.getAs[Double]("cliffs_delta") == 1.0,
        s"disjoint shift must give delta = 1, got ${r.getAs[Double]("cliffs_delta")}")
      assert(r.getAs[Double]("u2_a") ==
        2.0 * r.getAs[Long]("n_a") * r.getAs[Long]("n_b"))
    }

    // kruskal-wallis: four same-distribution user buckets keep H near its
    // χ²(3) expectation (mean 3, sd ~2.45 — H < 20 is a >5σ envelope);
    // shifting ONE bucket far out drives H toward its planted floor
    val kw = t("kruskal") {
      Analytics.kruskalWallis(ev, "event_type", "value",
        pmod(col("user_id"), lit(4L))).collect()
    }
    assert(kw.length == types.size)
    kw.foreach { r =>
      assert(r.getAs[Long]("n_cohorts") == 4)
      assert(r.getAs[Double]("h") >= 0.0 && r.getAs[Double]("h") < 20.0,
        s"${r.getString(0)} same-distribution H = ${r.getAs[Double]("h")}")
    }
    val kwShift = t("kw-shifted") {
      Analytics.kruskalWallis(
        ev.withColumn("value", col("value") +
          when(pmod(col("user_id"), lit(4L)) === 0, 10000.0).otherwise(0.0)),
        "event_type", "value", pmod(col("user_id"), lit(4L))).collect()
    }
    kwShift.foreach { r =>
      assert(r.getAs[Double]("h") > 100.0,
        s"${r.getString(0)} planted shift H = ${r.getAs[Double]("h")}")
    }

    // ece with an always-true label: every bin's gap is n_b − Σscores_b,
    // so ECE collapses to 1 − mean(score) — recompute that independently
    val eceRows = t("ece") {
      Eval.expectedCalibrationError(
        ev.withColumn("__sc", col("value") / 100.0),
        "event_type", "__sc", col("value") >= 0.0).collect()
    }
    val meanSc = ev.groupBy("event_type").agg(
        (sum(round(col("value") / 100.0, 6).cast("decimal(30,6)"))
          .cast("double") / count(lit(1)).cast("double")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    eceRows.foreach { r =>
      val want = 1.0 - meanSc(r.getString(0))
      assert(r.getAs[Long]("n_bins_used") == 10L, s"want all 10 bins used")
      assert(math.abs(r.getAs[Double]("ece") - want) < 1e-5,
        s"${r.getString(0)}: ece ${r.getAs[Double]("ece")} vs $want")
    }

    println("ALL SCALE-ANALYTICS ASSERTIONS PASSED")
    spark.stop()
  }
}
