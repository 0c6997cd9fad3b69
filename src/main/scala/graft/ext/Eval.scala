package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier / filter evaluation operators for a training-data
  * pipeline: once a quality filter or heuristic classifier produces
  * per-row scores, these score it against a reference label — per data
  * slice, because aggregate metrics hide slice regressions (the standard
  * eval discipline for web-scale corpus filters).
  *
  * Determinism discipline: every metric is derived from INTEGER
  * confusion / rank counts with exactly one final division rounded at 6
  * — no float accumulation anywhere — so each query replays bit-for-bit
  * in any engine.
  */
object Eval {

  /** Per-slice confusion counts for a boolean prediction vs a boolean
    * label, with accuracy / precision / recall / F1. ONE map-side
    * combining aggregation to slice granularity (4 longs of state per
    * slice); each derived metric is a single integer-ratio division.
    * Zero-denominator conventions: precision with no positive
    * predictions, recall with no positive labels, and F1 with neither
    * all report 0.0 (the filter-evaluation convention — an empty slice
    * is a failing slice, not a null one).
    */
  def binaryConfusion(df: DataFrame, sliceCol: String, label: Column,
      predicted: Column): DataFrame = {
    val y = label.cast("boolean")
    val p = predicted.cast("boolean")
    def ratio(num: Column, den: Column): Column =
      round(num.cast("double") / greatest(den, lit(1L)).cast("double"), 6)
    // a null label or prediction belongs to NO confusion cell: keeping
    // such rows would silently shrink tp+fp+fn+tn below the row count
    // (sum skips null terms), so they are excluded up front (the
    // ksDrift null rule)
    df.where(y.isNotNull && p.isNotNull)
      .groupBy(col(sliceCol))
      .agg(
        sum((y && p).cast("long")).as("tp"),
        sum((!y && p).cast("long")).as("fp"),
        sum((y && !p).cast("long")).as("fn"),
        sum((!y && !p).cast("long")).as("tn"))
      .withColumn("accuracy", ratio(col("tp") + col("tn"),
        col("tp") + col("fp") + col("fn") + col("tn")))
      .withColumn("precision", ratio(col("tp"), col("tp") + col("fp")))
      .withColumn("recall", ratio(col("tp"), col("tp") + col("fn")))
      .withColumn("f1", ratio(lit(2L) * col("tp"),
        lit(2L) * col("tp") + col("fp") + col("fn")))
  }

  /** Per-slice ROC AUC of a score column against a boolean label, exact
    * under ties (Mann–Whitney with the standard tied-rank half-credit).
    *
    * The kernel never ranks rows globally: it first aggregates to
    * (slice, score) granularity — the compressed ECDF table, the ksDrift
    * shape — then runs ONE cumulative-count window co-partitioned with
    * the slice. The AUC numerator is kept in integer half-units,
    * `Σ pos_g · (2·neg_below + neg_tied)`, so the only float operation
    * is the final division by `2·P·N`. Slices with no positives or no
    * negatives report a null AUC (undefined, not zero).
    *
    * Scale: state is distinct-score-sized, not row-sized; the window
    * partitions on the slice key, so a 1000-executor run sorts each
    * slice's score table locally after one exchange.
    */
  def aucBySlice(df: DataFrame, sliceCol: String, scoreCol: String,
      label: Column): DataFrame = {
    val y = label.cast("boolean")
    // null scores have no rank and null labels belong to neither cohort
    val counts = df.where(col(scoreCol).isNotNull && y.isNotNull)
      .groupBy(col(sliceCol), col(scoreCol))
      .agg(sum(y.cast("long")).as("__p"), sum((!y).cast("long")).as("__n"))
    val w = Window.partitionBy(sliceCol).orderBy(scoreCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("__cn", sum(col("__n")).over(w))
    cum.groupBy(col(sliceCol))
      .agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__n")).as("n_neg"),
        sum(col("__p") * (lit(2L) * (col("__cn") - col("__n")) + col("__n")))
          .as("__num2"))
      .withColumn("auc",
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("double"))
        .otherwise(round(col("__num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6)))
      .drop("__num2")
  }

  /** DeLong variance term for the paired AUC difference — built from
    * nine exact integer sufficient statistics, cast to double once:
    * m, n (positive/negative counts), spa/spb (Σ over positives of the
    * DOUBLED placement among negatives, per model), tpaa/tpab/tpbb
    * (Σ of placement products over positives), and the mirrored
    * sqa/sqb/tqaa/tqab/tqbb over negatives. S10_XY = (T_XY/(4n²) −
    * m·AUC_X·AUC_Y)/(m−1); Var = (S10_AA + S10_BB − 2S10_AB)/m +
    * (S01… )/n — the Σ(V−AUC)(V−AUC) covariances expanded so every
    * cross-row sum stays an exact integer.
    */
  val delongVarExpr: String = {
    def s10(t: String, x: String, y: String) =
      s"($t / (4.0 * n * n) - m * ($x / (2.0 * m * n)) * ($y / (2.0 * m * n))) / (m - 1.0)"
    def s01(t: String, x: String, y: String) =
      s"($t / (4.0 * m * m) - n * ($x / (2.0 * m * n)) * ($y / (2.0 * m * n))) / (n - 1.0)"
    s"((${s10("tpaa", "spa", "spa")} + ${s10("tpbb", "spb", "spb")}" +
      s" - 2.0 * ${s10("tpab", "spa", "spb")}) / m" +
      s" + (${s01("tqaa", "sqa", "sqa")} + ${s01("tqbb", "sqb", "sqb")}" +
      s" - 2.0 * ${s01("tqab", "sqa", "sqb")}) / n)"
  }

  /** DeLong z for H0: AUC_A = AUC_B (same items, paired scores). */
  val delongZExpr: String =
    s"round(((spa - spb) / (2.0 * m * n)) / sqrt($delongVarExpr), 6)"

  /** Single-model DeLong variance: Var(AUC) = S10/m + S01/n from the
    * same exact placement statistics (spa/tpaa over positives, sqa/tqaa
    * over negatives).
    */
  val delongAucVarExpr: String =
    "((tpaa / (4.0 * n * n) - m * (spa / (2.0 * m * n)) * (spa / (2.0 * m * n))) / (m - 1.0) / m" +
      " + (tqaa / (4.0 * m * m) - n * (sqa / (2.0 * m * n)) * (sqa / (2.0 * m * n))) / (n - 1.0) / n)"

  /** DeLong confidence interval for ONE model's AUC per slice — the
    * error bar every AUC point estimate should ship with (the single-
    * model companion to [[delongAucDiff]]): SE = sqrt(S10/m + S01/n)
    * from the exact integer placement statistics, CI = AUC ± 1.96·SE.
    * Same compressed-table discipline (and the same INTEGRAL-score
    * contract as [[delongAucDiff]]); slices need ≥ 2 of each class
    * and positive variance.
    */
  def delongAucCi(df: DataFrame, sliceCol: String, scoreCol: Column,
      label: Column): DataFrame = {
    val y = label.cast("boolean")
    val items = df.where(scoreCol.isNotNull && y.isNotNull)
      .select(col(sliceCol).as("__s"), scoreCol.cast("long").as("__sa"),
        y.cast("long").as("__y"))
      .localCheckpoint(true)
    val c = items.groupBy(col("__s"), col("__sa"))
      .agg(sum(col("__y")).as("__p"), sum(lit(1L) - col("__y")).as("__n"))
    val w = Window.partitionBy("__s").orderBy(col("__sa").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pl = c.select(col("__s"), col("__sa"),
      (lit(2L) * coalesce(sum(col("__n")).over(w), lit(0L)) + col("__n"))
        .as("__aN"),
      (lit(2L) * coalesce(sum(col("__p")).over(w), lit(0L)) + col("__p"))
        .as("__aP"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val pos = col("__y") === 1L
    items.join(pl, Seq("__s", "__sa"))
      .groupBy(col("__s").as(sliceCol))
      .agg(
        sum(col("__y")).as("n_pos"),
        sum(lit(1L) - col("__y")).as("n_neg"),
        sum(when(pos, dec(col("__aN"))).otherwise(lit(0))).as("__spa"),
        sum(when(pos, dec(col("__aN")) * dec(col("__aN")))
          .otherwise(lit(0))).as("__tpaa"),
        sum(when(!pos, dec(col("__aP"))).otherwise(lit(0))).as("__sqa"),
        sum(when(!pos, dec(col("__aP")) * dec(col("__aP")))
          .otherwise(lit(0))).as("__tqaa"))
      .withColumn("m", col("n_pos").cast("double"))
      .withColumn("n", col("n_neg").cast("double"))
      .withColumn("spa", col("__spa").cast("double"))
      .withColumn("tpaa", col("__tpaa").cast("double"))
      .withColumn("sqa", col("__sqa").cast("double"))
      .withColumn("tqaa", col("__tqaa").cast("double"))
      .where(col("n_pos") >= 2L && col("n_neg") >= 2L &&
        expr(delongAucVarExpr) > 0.0)
      .withColumn("auc", expr("round(spa / (2.0 * m * n), 6)"))
      .withColumn("se", expr(s"round(sqrt($delongAucVarExpr), 6)"))
      .withColumn("lo95",
        expr(s"round(spa / (2.0 * m * n) - 1.96 * sqrt($delongAucVarExpr), 6)"))
      .withColumn("hi95",
        expr(s"round(spa / (2.0 * m * n) + 1.96 * sqrt($delongAucVarExpr), 6)"))
      .select(col(sliceCol), col("n_pos"), col("n_neg"),
        col("auc"), col("se"), col("lo95"), col("hi95"))
  }

  /** DeLong's test for the paired AUC difference (DeLong, DeLong &
    * Clarke-Pearson 1988) per slice: are two models' AUCs on the SAME
    * items statistically different? The standard answer every eval
    * harness needs before declaring "model B beats model A on ROC" —
    * AUC point estimates alone can differ by sampling noise, and the
    * PAIRING (shared items) is what the naive two-sample comparison
    * throws away.
    *
    * Structural components: a positive item's placement among the
    * negatives, V10(i) = (#negs below + ½·ties)/n — carried DOUBLED
    * (2·below + ties, an exact integer) straight off the cumulative
    * counts of the compressed (slice, score) table, the [[aucBySlice]]
    * discipline (windows never see raw rows... beyond the per-item
    * placement attach, which is a keyed JOIN back by score, not a
    * window). Every covariance reduces to exact DECIMAL(38,0) sums of
    * placement products; ONE shared final expression per output.
    * Slices need ≥ 2 positives, ≥ 2 negatives, and positive variance or
    * they are dropped.
    *
    * Scale: two compressed placement tables (one per model's score
    * column), two keyed attach joins, one aggregation — no global
    * window, no driver state.
    *
    * Input contract: scores must be INTEGRAL (they are cast to long —
    * ranks, counts, or quantized scores; AUC and its variance are
    * rank-based, so quantizing a double score to a fine integer grid
    * upstream loses nothing but sub-grid ties).
    */
  def delongAucDiff(df: DataFrame, sliceCol: String, scoreA: Column,
      scoreB: Column, label: Column): DataFrame = {
    val y = label.cast("boolean")
    val items = df
      .where(scoreA.isNotNull && scoreB.isNotNull && y.isNotNull)
      .select(col(sliceCol).as("__s"), scoreA.cast("long").as("__sa"),
        scoreB.cast("long").as("__sb"), y.cast("long").as("__y"))
      .localCheckpoint(true) // feeds both placement builds AND the attach
    def placements(scoreCol: String, pre: String): DataFrame = {
      val c = items.groupBy(col("__s"), col(scoreCol))
        .agg(sum(col("__y")).as("__p"), sum(lit(1L) - col("__y")).as("__n"))
      val w = Window.partitionBy("__s").orderBy(col(scoreCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      c.select(col("__s"), col(scoreCol),
        (lit(2L) * coalesce(sum(col("__n")).over(w), lit(0L)) + col("__n"))
          .as(pre + "N"),
        (lit(2L) * coalesce(sum(col("__p")).over(w), lit(0L)) + col("__p"))
          .as(pre + "P"))
    }
    val j = items
      .join(placements("__sa", "__a"), Seq("__s", "__sa"))
      .join(placements("__sb", "__b"), Seq("__s", "__sb"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val pos = col("__y") === 1L
    val g = j.groupBy(col("__s").as(sliceCol))
      .agg(
        sum(col("__y")).as("n_pos"),
        sum(lit(1L) - col("__y")).as("n_neg"),
        sum(when(pos, dec(col("__aN"))).otherwise(lit(0))).as("__spa"),
        sum(when(pos, dec(col("__bN"))).otherwise(lit(0))).as("__spb"),
        sum(when(pos, dec(col("__aN")) * dec(col("__aN")))
          .otherwise(lit(0))).as("__tpaa"),
        sum(when(pos, dec(col("__aN")) * dec(col("__bN")))
          .otherwise(lit(0))).as("__tpab"),
        sum(when(pos, dec(col("__bN")) * dec(col("__bN")))
          .otherwise(lit(0))).as("__tpbb"),
        sum(when(!pos, dec(col("__aP"))).otherwise(lit(0))).as("__sqa"),
        sum(when(!pos, dec(col("__bP"))).otherwise(lit(0))).as("__sqb"),
        sum(when(!pos, dec(col("__aP")) * dec(col("__aP")))
          .otherwise(lit(0))).as("__tqaa"),
        sum(when(!pos, dec(col("__aP")) * dec(col("__bP")))
          .otherwise(lit(0))).as("__tqab"),
        sum(when(!pos, dec(col("__bP")) * dec(col("__bP")))
          .otherwise(lit(0))).as("__tqbb"))
      .withColumn("m", col("n_pos").cast("double"))
      .withColumn("n", col("n_neg").cast("double"))
      .withColumn("spa", col("__spa").cast("double"))
      .withColumn("spb", col("__spb").cast("double"))
      .withColumn("tpaa", col("__tpaa").cast("double"))
      .withColumn("tpab", col("__tpab").cast("double"))
      .withColumn("tpbb", col("__tpbb").cast("double"))
      .withColumn("sqa", col("__sqa").cast("double"))
      .withColumn("sqb", col("__sqb").cast("double"))
      .withColumn("tqaa", col("__tqaa").cast("double"))
      .withColumn("tqab", col("__tqab").cast("double"))
      .withColumn("tqbb", col("__tqbb").cast("double"))
    g.where(col("n_pos") >= 2L && col("n_neg") >= 2L &&
        expr(delongVarExpr) > 0.0)
      .withColumn("auc_a", expr("round(spa / (2.0 * m * n), 6)"))
      .withColumn("auc_b", expr("round(spb / (2.0 * m * n), 6)"))
      .withColumn("z", expr(delongZExpr))
      .select(col(sliceCol), col("n_pos"), col("n_neg"),
        col("auc_a"), col("auc_b"), col("z"))
  }

  /** Per-class multiclass metrics from a (label, predicted) pair: the
    * confusion table collapses to class granularity first (|classes|²
    * rows), so the per-class tp / support / predicted-count joins touch
    * only that tiny table — never the corpus. Derived metrics follow the
    * [[binaryConfusion]] integer-ratio discipline (macro averages are
    * one further tiny aggregation the caller can run on this output).
    */
  def multiclassMetrics(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val cm = df
      .where(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).as("__y"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // three class-sized readers below
    def ratio(num: Column, den: Column): Column =
      round(num.cast("double") / greatest(den, lit(1L)).cast("double"), 6)
    val byLabel = cm.groupBy(col("__y").as("clazz"))
      .agg(sum(col("__c")).as("n_true"),
        sum(when(col("__p") === col("__y"), col("__c")).otherwise(0L)).as("tp"))
    val byPred = cm.groupBy(col("__p").as("clazz"))
      .agg(sum(col("__c")).as("n_pred"))
    byLabel.join(byPred, Seq("clazz"), "full_outer")
      .na.fill(0L, Seq("n_true", "tp", "n_pred"))
      .withColumn("precision", ratio(col("tp"), col("n_pred")))
      .withColumn("recall", ratio(col("tp"), col("n_true")))
      .withColumn("f1", ratio(lit(2L) * col("tp"),
        col("n_pred") + col("n_true")))
  }

  /** Reciprocal-rank table from a ranked retrieval result: per query the
    * rank of the FIRST relevant hit within the top `k` (null if none)
    * and its reciprocal — the building block of MRR (group this output
    * by any slice and average `rr`). `rr` is a 6-dp constant per rank
    * (1/rank rounded half-up at build time — a CASE lookup, no division
    * at run time), so slice averages replay as DECIMAL sums.
    */
  def reciprocalRanks(ranked: DataFrame, queryCol: String, rankCol: String,
      relevant: Column, k: Int): DataFrame = {
    require(k >= 1)
    // aggregate over the DISTINCT query set, not the top-k-filtered rows:
    // a query with zero rows inside the top k must surface with rr = 0
    // (the "no relevant hit scores 0" convention), not silently drop out
    // of downstream MRR slice means
    val queries = ranked.select(col(queryCol)).distinct()
    val firstRel = ranked.where(col(rankCol) <= k)
      .groupBy(col(queryCol))
      .agg(min(when(relevant, col(rankCol))).as("first_rel_rank"))
    val rrLookup = (1 to k).foldLeft(when(col("first_rel_rank").isNull, 0.0)) {
      case (acc, r) => acc.when(col("first_rel_rank") === r,
        BigDecimal(1.0 / r).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    queries.join(firstRel, Seq(queryCol), "left")
      .withColumn("rr", rrLookup)
  }

  /** Average precision per query from a ranked result — standard MAP@k:
    * AP = (Σ over relevant hits at rank i ≤ k of precision@i) /
    * least(n_rel, k), where `n_rel` counts the query's relevant rows in
    * the WHOLE ranked frame (so relevant docs the ranking pushed beyond
    * k are penalized — dividing by hits-found-within-k would score a
    * query that retrieved 1 of its 50 relevant docs at rank 1 a perfect
    * 1.0). precision@i = hits_so_far / i is one integer ratio rounded at
    * 6; the AP division is one more — so slice-level MAP (a DECIMAL mean
    * of `ap`) replays exactly. The output covers the DISTINCT query set:
    * a query with no relevant rows (or none inside the top k) scores 0
    * instead of disappearing from downstream slice means.
    */
  def averagePrecision(ranked: DataFrame, queryCol: String, rankCol: String,
      relevant: Column, k: Int): DataFrame = {
    require(k >= 1)
    val w = Window.partitionBy(col(queryCol)).orderBy(col(rankCol))
    val totals = ranked.groupBy(col(queryCol))
      .agg(coalesce(sum(relevant.cast("long")), lit(0L)).as("n_rel"))
    val topk = ranked.where(col(rankCol) <= k)
      .withColumn("__hits", sum(relevant.cast("long")).over(w))
      .withColumn("__pAt",
        when(relevant, round(col("__hits").cast("double") /
          col(rankCol).cast("double"), 6)))
      .groupBy(col(queryCol))
      .agg(coalesce(sum(col("__pAt").cast("decimal(30,6)")), lit(0))
        .cast("double").as("__sum"))
    totals.join(topk, Seq(queryCol), "left")
      .withColumn("ap",
        when(col("n_rel") === 0L, 0.0)
          .otherwise(round(coalesce(col("__sum"), lit(0.0)) /
            least(col("n_rel"), lit(k.toLong)).cast("double"), 6)))
      .drop("__sum")
  }

  /** Unbiased pass@k (Chen et al. 2021, the Codex estimator): per
    * problem with `n ≥ k` samples of which `c` are correct,
    * `1 − C(n−c, k)/C(n, k)`, computed as the ordered product
    * `1 − Π_{i<k} (n−c−i)/(n−i)` — numerically safe at any n (no
    * factorials) and an exact left-to-right IEEE fold both engines
    * replay identically; rounded at 6. Problems with fewer than k
    * incorrect samples score exactly 1.0 (the binomial term is 0) —
    * emitted through the CASE so no 0/0 division ever evaluates.
    *
    * Scale: ONE map-side-combining count aggregation to problem
    * granularity; the estimator is a row-local projection of the two
    * counts. k is a literal, never data.
    */
  def passAtK(df: DataFrame, problemCol: String, correct: Column,
      k: Int): DataFrame = {
    require(k >= 1)
    df.groupBy(col(problemCol))
      .agg(count(lit(1)).as("n"), sum(correct.cast("long")).as("c"))
      .where(col("n") >= k)
      .withColumn(s"pass_at_$k",
        when(col("n") - col("c") < k, 1.0)
          .otherwise(round(lit(1.0) -
            aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
              (acc, i) => acc * ((col("n") - col("c") - i).cast("double") /
                (col("n") - i).cast("double"))), 6)))
  }

  /** Bradley–Terry preference ratings (the arena-style ranking behind
    * pairwise LLM evals), fixed MM iterations (Hunter 2004): from a
    * DIRECTED win-count table `(i, j, w)` (= times i beat j),
    *
    *   γ_i ← round6( W_i / Σ_j n_ij / (γ_i + γ_j) ),  γ⁰ = 1
    *
    * with `W_i` i's total wins and `n_ij = w_ij + w_ji`. The opponent
    * sum is a per-term round(6) DECIMAL sum — order-FREE, so the
    * aggregation buffer is one decimal regardless of a team's opponent
    * count (no sorted collect_list) — and each iteration's γ rounds at
    * 6: the number chain is deterministic and both engines replay it
    * bit-for-bit. Returns `(team, gamma, n_wins)`.
    *
    * Scale: per iteration two team-keyed broadcast-or-hash joins of the
    * pair table onto the (team-sized) rating table and one team-keyed
    * aggregation — pair-table-sized exchanges, never sample-sized.
    */
  def bradleyTerry(wins: DataFrame, iCol: String, jCol: String,
      wCol: String, iterations: Int = 2): DataFrame = {
    require(iterations >= 1)
    val w = wins.select(col(iCol).as("__i"), col(jCol).as("__j"),
        col(wCol).cast("double").as("__w"))
      .localCheckpoint(true) // read every iteration
    // every team that PLAYED is rated — a zero-win team must still
    // appear (γ → 0) and its matches must still weigh on its opponents'
    // denominators, so totals covers the full participant set
    val teams = w.select(col("__i").as("team"))
      .unionByName(w.select(col("__j").as("team"))).distinct()
    val totals = teams
      .join(w.groupBy(col("__i").as("team")).agg(sum(col("__w")).as("__w0")),
        Seq("team"), "left")
      .select(col("team"), coalesce(col("__w0"), lit(0.0)).as("__wi"))
      .localCheckpoint(true)
    val nij = w.select(col("__i"), col("__j"), col("__w"))
      .unionByName(w.select(col("__j").as("__i"), col("__i").as("__j"), col("__w")))
      .groupBy("__i", "__j").agg(sum(col("__w")).as("__n"))
      .localCheckpoint(true)
    var g = totals.select(col("team"), lit(1.0).as("gamma"))
    for (_ <- 1 to iterations) {
      val gi = g.select(col("team").as("__i"), col("gamma").as("__gi"))
      val gj = g.select(col("team").as("__j"), col("gamma").as("__gj"))
      g = nij.join(gi, Seq("__i")).join(gj, Seq("__j"))
        .select(col("__i"), col("__j"),
          (col("__n") / (col("__gi") + col("__gj"))).as("__t"))
        .groupBy(col("__i").as("team"))
        // order-free denominator: per-term round(6) DECIMAL sums commute,
        // so no j-sorted collect_list (whose buffer grew with a team's
        // opponent COUNT — a star-schedule team playing millions of
        // distinct opponents built a multi-million-element array in one
        // aggregation buffer). State is now one decimal accumulator.
        .agg(sum(round(col("__t"), 6).cast("decimal(30,6)")).as("__den"))
        .join(totals, Seq("team"))
        .select(col("team"),
          round(col("__wi") / col("__den").cast("double"), 6).as("gamma"))
    }
    g.join(totals, Seq("team"))
      .select(col("team"), col("gamma"), col("__wi").cast("long").as("n_wins"))
  }

  /** Per-slice regression error metrics (MAE / RMSE) for a prediction
    * column: per-term round(6) DECIMAL sums (order-independent), one
    * division each, one final sqrt — the forecast-quality gate for the
    * lag/seasonal predictors. Rows with a null prediction (stream heads)
    * are excluded.
    */
  def regressionMetrics(df: DataFrame, sliceCol: String, yCol: String,
      yhatCol: String): DataFrame = {
    val err = col(yCol) - col(yhatCol)
    df.where(col(yhatCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(sliceCol))
      .agg(
        count(lit(1)).as("n"),
        sum(round(abs(err), 6).cast("decimal(30,6)")).as("__sa"),
        sum(round(err * err, 6).cast("decimal(30,6)")).as("__sq"))
      .withColumn("mae",
        round(col("__sa").cast("double") / col("n").cast("double"), 6))
      .withColumn("rmse",
        round(sqrt(col("__sq").cast("double") / col("n").cast("double")), 6))
      .drop("__sa", "__sq")
  }

  /** Reliability (calibration) table: scores in [0, 1] bucketed into
    * `nBins` equi-width bins; per bin the count, mean predicted score,
    * and observed positive fraction — the curve a pipeline plots before
    * trusting a classifier threshold. The mean score is a round(6)
    * DECIMAL sum (order-independent, the entropy-term discipline);
    * frac_pos is an exact integer ratio.
    *
    * Scale: one map-side-combining aggregation to bin granularity —
    * `nBins` rows of (long, long, decimal) state per partition.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, label: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0)
    val bin = least(floor(col(scoreCol) * nBins), lit(nBins - 1.0)).cast("long")
    df.where(col(scoreCol).isNotNull && label.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(label.cast("long")).as("n_pos"),
        sum(round(col(scoreCol), 6).cast("decimal(30,6)")).as("__s"))
      .withColumn("mean_score",
        round(col("__s").cast("double") / col("n").cast("double"), 6))
      .withColumn("frac_pos",
        round(col("n_pos").cast("double") / col("n").cast("double"), 6))
      .drop("__s")
  }

  /** Per-slice average precision (area under the precision-recall curve,
    * threshold-sum form: AP = Σ_s ΔR(s)·P(s) over distinct scores
    * descending) — the imbalanced-data companion to [[aucBySlice]]'s ROC
    * AUC: when positives are rare (the usual shape of a quality-filter
    * label), ROC flatters and PR is the metric that moves. Works on the
    * COMPRESSED (slice, score) table like the AUC/KS kernels: per
    * distinct score, p positives and n negatives; cumulative counts via
    * a slice-keyed descending window; each threshold contributes
    * (p/total_pos)·(cumP/(cumP+cumN)), rounded at 6 and summed as exact
    * DECIMAL — the tied-score convention is "all items at a threshold
    * arrive together", the standard step-interpolation.
    *
    * Scale: one aggregation to (slice, score) granularity, one
    * slice-keyed window over the compressed table, one final slice
    * aggregation — never a global or per-row rank.
    */
  def averagePrecisionByScore(df: DataFrame, sliceCol: String,
      scoreCol: String, label: Column): DataFrame = {
    val c = df.where(col(scoreCol).isNotNull)
      .groupBy(col(sliceCol), col(scoreCol).as("__s"))
      .agg(sum(label.cast("long")).as("__p"),
        sum((!label).cast("long")).as("__n"))
    val w = Window.partitionBy(col(sliceCol)).orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(sliceCol))
    c.withColumn("__cp", sum(col("__p")).over(w))
      .withColumn("__cn", sum(col("__n")).over(w))
      .withColumn("__tp", sum(col("__p")).over(wAll))
      .withColumn("__term",
        when(col("__tp") === 0L, lit(0.0))
          .otherwise(round(
            (col("__p").cast("double") / col("__tp").cast("double")) *
              (col("__cp").cast("double") /
                (col("__cp") + col("__cn")).cast("double")), 6))
          .cast("decimal(30,6)"))
      .groupBy(col(sliceCol))
      .agg(max(col("__tp")).as("n_pos"),
        sum(col("__n")).as("n_neg"),
        sum(col("__term")).as("__ap"))
      .withColumn("ap",
        when(col("n_pos") === 0L, lit(0.0))
          .otherwise(round(col("__ap").cast("double"), 6)))
      .drop("__ap")
  }

  /** Shared Fleiss final expressions for `n` raters × 2 categories —
    * exact (n_items, sum_sq, s_pos) in, rounded doubles out; spelled
    * identically in Spark SQL and DuckDB. The degenerate all-unanimous-
    * one-category slice (chance agreement 1, kappa 0/0) reports 1.0 —
    * the raters DID agree perfectly.
    */
  private[graft] def fleissPBarExpr(n: Int): String =
    s"round(CAST(sum_sq - $n * n_items AS DOUBLE) / " +
      s"(${n * (n - 1)}.0 * CAST(n_items AS DOUBLE)), 6)"
  private[graft] def fleissPeExpr(n: Int): String = {
    val p = s"(CAST(s_pos AS DOUBLE) / ($n.0 * CAST(n_items AS DOUBLE)))"
    s"round($p * $p + (1.0 - $p) * (1.0 - $p), 6)"
  }
  private[graft] def fleissKappaExpr(n: Int): String = {
    val p = s"(CAST(s_pos AS DOUBLE) / ($n.0 * CAST(n_items AS DOUBLE)))"
    val pe = s"($p * $p + (1.0 - $p) * (1.0 - $p))"
    val pbar = s"(CAST(sum_sq - $n * n_items AS DOUBLE) / " +
      s"(${n * (n - 1)}.0 * CAST(n_items AS DOUBLE)))"
    s"CASE WHEN s_pos = 0 OR s_pos = $n * n_items THEN 1.0 " +
      s"ELSE round(($pbar - $pe) / (1.0 - $pe), 6) END"
  }

  /** Per-slice Fleiss' kappa for `raters.size` boolean raters — the
    * n-rater generalization of Cohen's kappa (`eval_kappa`): do MULTIPLE
    * independent quality filters agree beyond chance, per slice? The
    * sufficient statistics are three exact longs per slice (item count,
    * Σ per-item n_pos²+(n−n_pos)², Σ n_pos) and every derived scalar is
    * one shared final expression — the decision discipline of the other
    * eval kernels.
    *
    * Scale: one row-local projection (the raters are column predicates)
    * and ONE map-side-combining aggregation to slice granularity.
    */
  def fleissKappa(df: DataFrame, sliceCol: String,
      raters: Seq[Column]): DataFrame = {
    val n = raters.size
    require(n >= 2, "fleissKappa needs at least 2 raters")
    val m = raters.map(_.cast("int")).reduce(_ + _).cast("long")
    df.select(col(sliceCol), m.as("__m"))
      .groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__m") * col("__m")
          + (lit(n.toLong) - col("__m")) * (lit(n.toLong) - col("__m")))
          .as("sum_sq"),
        sum(col("__m")).as("s_pos"))
      .withColumn("p_bar", expr(fleissPBarExpr(n)))
      .withColumn("p_e", expr(fleissPeExpr(n)))
      .withColumn("kappa", expr(fleissKappaExpr(n)))
  }

  /** Shared McNemar final expression — exact discordant counts (b, c)
    * in, the continuity-corrected statistic out, spelled identically in
    * Spark SQL and DuckDB. b+c=0 (the two raters never disagree) scores
    * 0.0: no evidence of marginal difference. |b−c|≤1 also scores 0
    * (the correction floors at zero rather than going negative).
    */
  private[graft] val mcnemarExpr =
    "CASE WHEN b + c = 0 OR abs(b - c) <= 1 THEN 0.0 " +
      "ELSE round((CAST(abs(b - c) AS DOUBLE) - 1.0) * " +
      "(CAST(abs(b - c) AS DOUBLE) - 1.0) / CAST(b + c AS DOUBLE), 6) END"

  /** Per-slice McNemar's test between two boolean raters on PAIRED
    * items — the right significance check for "is the new quality
    * filter actually different from the old one on the same corpus?"
    * (marginal-homogeneity, unlike [[evalKappa]]'s agreement). Only the
    * discordant cells matter: b = rater-A-only keeps, c = rater-B-only
    * keeps; the statistic is Edwards' continuity-corrected
    * (|b−c|−1)²/(b+c), ~χ²(1) under H0.
    *
    * Scale: one row-local projection and ONE map-side-combining
    * aggregation to slice granularity; two exact longs per slice.
    */
  def mcnemar(df: DataFrame, sliceCol: String, raterA: Column,
      raterB: Column): DataFrame = {
    df.select(col(sliceCol),
        (raterA && !raterB).cast("long").as("__b"),
        (!raterA && raterB).cast("long").as("__c"))
      .groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__b")).as("b"), sum(col("__c")).as("c"))
      .withColumn("chi2_mcnemar", expr(mcnemarExpr))
  }

  /** Shared Spearman final expression — exact (n, Σd²) in, one rounded
    * double out, spelled identically in Spark SQL and DuckDB.
    */
  private[graft] val spearmanExpr =
    "CASE WHEN n < 2 THEN 0.0 ELSE round(1.0 - 6.0 * CAST(d2 AS DOUBLE) / " +
      "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)), " +
      "6) END"

  /** Per-slice Spearman rank correlation between two orderings — the
    * ranking-agreement metric (does the cheap quality score order
    * documents the way the expensive one does?). Ranks are `row_number`
    * under a PINNED total order (value, then `tiebreak`), NOT fractional
    * tied ranks: deterministic replay beats the textbook tie correction,
    * and the two coincide when values are continuous. Σd² accumulates in
    * DECIMAL(38,0) — d² reaches n² per row, so a long sum would wrap
    * near 2M rows per slice (the silent-corruption trap flagged for
    * chi2) — and ρ = 1 − 6Σd²/(n(n²−1)) is ONE shared final expression.
    *
    * Scale: both rank windows sort within the SAME slice-keyed exchange
    * (one shuffle), then one map-side-combining aggregation to slice
    * granularity; n³ never materializes in integer math.
    */
  def spearmanRho(df: DataFrame, sliceCol: String, xCol: String,
      yCol: String, tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(sliceCol))
    val rx = row_number().over(w.orderBy(col(xCol) +: tiebreak: _*))
    val ry = row_number().over(w.orderBy(col(yCol) +: tiebreak: _*))
    df.select(col(sliceCol), rx.cast("long").as("__rx"),
        ry.cast("long").as("__ry"))
      .withColumn("__d", col("__rx") - col("__ry"))
      .groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n"),
        sum((col("__d") * col("__d")).cast("decimal(38,0)")).as("__d2"))
      .withColumn("d2", col("__d2").cast("double"))
      .withColumn("rho", expr(spearmanExpr))
      .drop("__d2")
  }

  /** Shared Matthews correlation expression over exact longs
    * (tp, tn, fp, fn): (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    * — numerator in exact DECIMAL(38,0) (tp·tn reaches n²/4), the
    * four-factor denominator as a product of four double √ terms (each
    * factor ≤ n, so no overflow and the ulps land inside the final
    * half-rounding). Identical in Spark SQL and DuckDB.
    */
  private[graft] def mccExpr: String = Analytics.half6Sql(
    "CAST(CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn " +
      "AS DOUBLE) / (sqrt(CAST(tp + fp AS DOUBLE)) * " +
      "sqrt(CAST(tp + fn AS DOUBLE)) * sqrt(CAST(tn + fp AS DOUBLE)) * " +
      "sqrt(CAST(tn + fn AS DOUBLE)))")

  /** Per-slice Matthews correlation coefficient — the imbalance-robust
    * single-number confusion summary ([[binaryConfusion]]'s F1 ignores
    * true negatives and flatters the majority class; MCC is high only
    * when ALL four cells are right, which is why it's the standard
    * verdict for skewed quality-filter evals). Slices where any
    * marginal is zero (MCC undefined) drop rather than reporting a
    * convention value.
    *
    * Exactness: the same four exact longs as the confusion table from
    * ONE aggregation; MCC is one shared half-rounded expression with an
    * exact DECIMAL(38,0) numerator.
    */
  def matthewsCorrelation(df: DataFrame, sliceCol: String, label: Column,
      predicted: Column): DataFrame = {
    df.where(label.isNotNull && predicted.isNotNull)
      .select(col(sliceCol),
        label.cast("boolean").as("__y"), predicted.cast("boolean").as("__p"))
      .groupBy(col(sliceCol))
      .agg(
        sum((col("__y") && col("__p")).cast("long")).as("tp"),
        sum((!col("__y") && !col("__p")).cast("long")).as("tn"),
        sum((!col("__y") && col("__p")).cast("long")).as("fp"),
        sum((col("__y") && !col("__p")).cast("long")).as("fn"))
      .where(col("tp") + col("fp") > 0L && col("tp") + col("fn") > 0L &&
        col("tn") + col("fp") > 0L && col("tn") + col("fn") > 0L)
      .withColumn("mcc", expr(mccExpr))
      .select(col(sliceCol), col("tp"), col("tn"), col("fp"), col("fn"),
        col("mcc"))
  }

  /** Shared Wilson 95% interval expressions over (w: wins, m: decisive
    * comparisons — exact longs): the score interval
    * (p̂ + z²/2m ± z·√(p̂(1−p̂)/m + z²/4m²)) / (1 + z²/m) with
    * z = 1.959964. Unlike the Wald interval it never leaves [0,1] and
    * stays honest at small m or extreme p̂ — the arena-leaderboard
    * standard. Spelled identically in Spark SQL and DuckDB.
    */
  private[graft] def wilsonExpr(sign: String): String = {
    val p = "(CAST(w AS DOUBLE) / CAST(m AS DOUBLE))"
    val m = "CAST(m AS DOUBLE)"
    Analytics.half6Sql(
      s"(($p + 1.959964 * 1.959964 / (2.0 * $m)) $sign 1.959964 * " +
        s"sqrt($p * (1.0 - $p) / $m + 1.959964 * 1.959964 / " +
        s"(4.0 * $m * $m))) / (1.0 + 1.959964 * 1.959964 / $m)")
  }

  /** Per-slice pairwise WIN RATE with a Wilson 95% interval — the
    * arena-style "is system A beating system B, and is the sample big
    * enough to say so" readout (win-rate point estimates without an
    * interval are the classic leaderboard lie). Each row is one item
    * scored by both systems; A wins where `scoreA > scoreB`, loses
    * where `<`, ties are EXCLUDED from the denominator (the standard
    * decisive-comparison convention — report them separately via
    * n_ties). Slices with zero decisive comparisons drop.
    *
    * Exactness: wins/losses/ties are exact longs from one aggregation;
    * the rate and both Wilson bounds are shared half-rounded final
    * expressions over those integers.
    *
    * Scale: ONE map-side-combining aggregation to slice granularity —
    * three longs of state per slice.
    */
  def winRate(df: DataFrame, sliceCol: String, scoreA: Column,
      scoreB: Column): DataFrame = {
    df.where(scoreA.isNotNull && scoreB.isNotNull)
      .select(col(sliceCol),
        (scoreA > scoreB).cast("long").as("__w"),
        (scoreA < scoreB).cast("long").as("__l"),
        (scoreA === scoreB).cast("long").as("__t"))
      .groupBy(col(sliceCol))
      .agg(sum(col("__w")).as("w"), sum(col("__l")).as("l"),
        sum(col("__t")).as("n_ties"))
      .withColumn("m", col("w") + col("l"))
      .where(col("m") >= 1L)
      .withColumn("win_rate",
        expr(Analytics.half6Sql("CAST(w AS DOUBLE) / CAST(m AS DOUBLE)")))
      .withColumn("lo95", expr(wilsonExpr("-")))
      .withColumn("hi95", expr(wilsonExpr("+")))
      .select(col(sliceCol), col("m").as("n_decisive"), col("w").as("wins"),
        col("n_ties"), col("win_rate"), col("lo95"), col("hi95"))
  }

  /** Shared Kendall τ-b final expression — exact (p, q, n0, n1, n2:
    * DECIMAL(38,0) pair counts) in, one rounded double out, identical in
    * Spark SQL and DuckDB. τ-b = (P − Q)/√((n0−n1)(n0−n2)).
    */
  private[graft] def kendallExpr: String = Analytics.half6Sql(
    "(CAST(p AS DOUBLE) - CAST(q AS DOUBLE)) / " +
      "sqrt((CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE)) * " +
      "(CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE)))")

  /** Per-slice Kendall τ-b between two orderings — [[spearmanRho]]'s
    * pair-concordance companion (the standard second rank-agreement
    * number; unlike ρ it has the clean "probability a random pair is
    * ordered the same way" reading, and τ-b's tie correction is exact
    * rather than convention). P/Q/tie counts are computed on the
    * COMPRESSED joint-frequency cell table (x, y, count) — never on raw
    * rows: concordant/discordant pair counts are a cell self-join on
    * `a.x < b.x` classified by the y order, tie terms are marginal
    * Σt(t−1)/2 per axis, all in exact DECIMAL(38,0) (cell products reach
    * n², far past a long near 2M rows/slice — the spearman Σd² trap).
    * ONE shared final expression; slices with n < 2 or a constant axis
    * (denominator 0) drop.
    *
    * Scale: one aggregation to (slice, x, y) cells — the only
    * corpus-sized shuffle; the self-join is slice-keyed over cells with
    * an `a.x < b.x` in-join filter, so its cost is cells²-per-slice: the
    * INTEGRAL-SCORE contract (quantized/bucketed scores, the repo-wide
    * eval discipline) bounds cells at |X|·|Y| per slice independent of
    * corpus size. Margins and totals are three cell-sized aggregations.
    */
  def kendallTauB(df: DataFrame, sliceCol: String, xCol: String,
      yCol: String): DataFrame = {
    val cells = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(sliceCol).as("__s"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .groupBy("__s", "__x", "__y").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // feeds the self-join AND three margins
    val d38 = "decimal(38,0)"
    def tiePairs(axis: String) = cells
      .groupBy(col("__s"), col(axis)).agg(sum(col("__c")).as("__t"))
      .groupBy("__s")
      .agg(sum((col("__t").cast(d38) * (col("__t") - 1L).cast(d38) / 2)
        .cast(d38)).as(if (axis == "__x") "n1" else "n2"))
    val tot = cells.groupBy("__s")
      .agg(sum(col("__c")).as("n"))
      .withColumn("n0",
        (col("n").cast(d38) * (col("n") - 1L).cast(d38) / 2).cast(d38))
    val b = cells.select(col("__s"), col("__x").as("__bx"),
      col("__y").as("__by"), col("__c").as("__bc"))
    val pq = cells.join(b, Seq("__s"))
      .where(col("__x") < col("__bx"))
      .groupBy("__s")
      .agg(
        sum(when(col("__y") < col("__by"),
          (col("__c").cast(d38) * col("__bc").cast(d38)).cast(d38))
          .otherwise(lit(0).cast(d38))).as("p"),
        sum(when(col("__y") > col("__by"),
          (col("__c").cast(d38) * col("__bc").cast(d38)).cast(d38))
          .otherwise(lit(0).cast(d38))).as("q"))
    tot.join(pq, Seq("__s"), "left")
      .join(tiePairs("__x"), Seq("__s"))
      .join(tiePairs("__y"), Seq("__s"))
      .select(col("__s").as(sliceCol), col("n"),
        coalesce(col("p"), lit(0).cast(d38)).as("p"),
        coalesce(col("q"), lit(0).cast(d38)).as("q"),
        col("n0"), col("n1"), col("n2"))
      .where(col("n") >= 2L && col("n0") > col("n1") &&
        col("n0") > col("n2"))
      .withColumn("tau_b", expr(kendallExpr))
      .select(col(sliceCol), col("n"), col("tau_b"))
  }

  /** Shared BLEU-2 final expressions, evaluated VERBATIM by both engines
    * over the same six exact-long inputs (`ln`/`exp`/`least`/`round`
    * spell identically in Spark SQL and ANSI DuckDB), so the only float
    * work is one final scalar expression — libm ulp noise is absorbed by
    * the round-at-6 (the per-term discipline used by tf-idf/adamic-adar).
    */
  private[graft] val bleuP1Expr =
    "CASE WHEN total1 = 0 THEN 0.0 ELSE " +
      "round(CAST(match1 AS DOUBLE) / CAST(total1 AS DOUBLE), 6) END"
  private[graft] val bleuP2Expr =
    "CASE WHEN total2 = 0 THEN 0.0 ELSE " +
      "round(CAST(match2 AS DOUBLE) / CAST(total2 AS DOUBLE), 6) END"
  private[graft] val bleuBpExpr =
    "CASE WHEN cand_len = 0 THEN 0.0 ELSE round(least(1.0, " +
      "exp(1.0 - CAST(ref_len AS DOUBLE) / CAST(cand_len AS DOUBLE))), 6) END"
  private[graft] val bleuExpr =
    "CASE WHEN match1 = 0 OR match2 = 0 OR cand_len = 0 THEN 0.0 ELSE round(" +
      "least(1.0, exp(1.0 - CAST(ref_len AS DOUBLE) / CAST(cand_len AS DOUBLE))) * " +
      "exp(0.5 * (ln(CAST(match1 AS DOUBLE) / CAST(total1 AS DOUBLE)) " +
      "+ ln(CAST(match2 AS DOUBLE) / CAST(total2 AS DOUBLE)))), 6) END"

  /** Corpus-level BLEU-2 (clipped modified n-gram precision for n=1,2,
    * geometric mean, brevity penalty) between a reference text column
    * and a synthetic candidate — the reference with every `dropEvery`-th
    * token removed, the standard smoke harness for a generated-text eval
    * (a 1/7 deletion should land BLEU well below 1 but far above 0).
    * Plug a real generation in by swapping the candidate constructor.
    *
    * Everything up to the final scalar expression is exact long counts:
    * per-(doc, gram) candidate counts clipped against reference counts
    * (`least`), then ONE corpus-level sum per n.
    *
    * Scale: tokenization is touched once (checkpoint barrier); each n is
    * one explode + (doc, gram)-keyed count + left join + global sum —
    * gram-sized shuffles with map-side combining, no driver state.
    */
  def corpusBleu(docs: DataFrame, idCol: String, textCol: String,
      dropEvery: Int = 7): DataFrame = {
    require(dropEvery >= 2)
    val toks = docs.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("ref"))
      .withColumn("cand",
        expr(s"filter(ref, (x, i) -> (i + 1) % $dropEvery != 0)"))
      .localCheckpoint(true) // feeds lens + 4 gram passes
    // n-gram array of `arr`; the size guard dodges Spark's descending
    // sequence(1, 0) (same trap as Vocab.bigramCounts)
    def grams(arr: String, n: Int): Column =
      if (n == 1) col(arr)
      else expr(
        s"""CASE WHEN size($arr) >= $n
           |  THEN transform(sequence(1, size($arr) - ${n - 1}),
           |         i -> concat(element_at($arr, i), ' ',
           |                     element_at($arr, i + 1)))
           |  ELSE CAST(array() AS ARRAY<STRING>)
           |END""".stripMargin)
    def matched(n: Int): DataFrame = {
      val cc = toks.select(col("id"), explode(grams("cand", n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("cc"))
      val rc = toks.select(col("id"), explode(grams("ref", n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("rc"))
      cc.join(rc, Seq("id", "g"), "left")
        .agg(
          sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as(s"match$n"),
          sum(col("cc")).as(s"total$n"))
    }
    val lens = toks.agg(
      sum(size(col("ref"))).cast("long").as("ref_len"),
      sum(size(col("cand"))).cast("long").as("cand_len"))
    matched(1).crossJoin(matched(2)).crossJoin(lens)
      .withColumn("p1", expr(bleuP1Expr))
      .withColumn("p2", expr(bleuP2Expr))
      .withColumn("bp", expr(bleuBpExpr))
      .withColumn("bleu", expr(bleuExpr))
  }

  /** Shared ROUGE-n final expressions (precision / recall / F) over three
    * exact longs per n. F uses the algebraic identity 2PR/(P+R) =
    * 2·match/(ctotal+rtotal), so it is ONE division — no compounding of
    * two already-rounded ratios.
    */
  private[graft] def rougePExpr(n: Int): String =
    s"CASE WHEN ctotal$n = 0 THEN 0.0 ELSE " +
      s"round(CAST(match$n AS DOUBLE) / CAST(ctotal$n AS DOUBLE), 6) END"
  private[graft] def rougeRExpr(n: Int): String =
    s"CASE WHEN rtotal$n = 0 THEN 0.0 ELSE " +
      s"round(CAST(match$n AS DOUBLE) / CAST(rtotal$n AS DOUBLE), 6) END"
  private[graft] def rougeFExpr(n: Int): String =
    s"CASE WHEN match$n = 0 THEN 0.0 ELSE " +
      s"round(2.0 * CAST(match$n AS DOUBLE) " +
      s"/ CAST(ctotal$n + rtotal$n AS DOUBLE), 6) END"

  /** Corpus-level ROUGE-1 / ROUGE-2 (recall-oriented n-gram overlap —
    * the summarization-eval companion to [[corpusBleu]]) between the
    * reference text column and a synthetic candidate (the reference with
    * every `dropEvery`-th token removed). A pure deletion keeps every
    * candidate gram present in its reference, so ROUGE precision is 1 by
    * construction while recall measures the deletion loss — the
    * asymmetry that separates this metric family from BLEU's.
    *
    * All inputs to the final expressions are exact longs: per-(doc,
    * gram) candidate counts clipped against reference counts for the
    * match numerators, plus total candidate / reference gram counts.
    *
    * Scale: same shape as [[corpusBleu]] — tokenize once (checkpoint
    * barrier), per n one explode + (doc, gram)-keyed count + full-outer join +
    * global sum, gram-sized shuffles with map-side combining.
    */
  def corpusRouge(docs: DataFrame, idCol: String, textCol: String,
      dropEvery: Int = 5): DataFrame = {
    require(dropEvery >= 2)
    val toks = docs.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("ref"))
      .withColumn("cand",
        expr(s"filter(ref, (x, i) -> (i + 1) % $dropEvery != 0)"))
      .localCheckpoint(true) // feeds 4 gram passes
    def grams(arr: String, n: Int): Column =
      if (n == 1) col(arr)
      else expr(
        s"""CASE WHEN size($arr) >= $n
           |  THEN transform(sequence(1, size($arr) - ${n - 1}),
           |         i -> concat(element_at($arr, i), ' ',
           |                     element_at($arr, i + 1)))
           |  ELSE CAST(array() AS ARRAY<STRING>)
           |END""".stripMargin)
    def counts(n: Int): DataFrame = {
      val cc = toks.select(col("id"), explode(grams("cand", n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("cc"))
      val rc = toks.select(col("id"), explode(grams("ref", n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("rc"))
      // ONE full-outer join yields clipped matches AND both totals, so
      // each side's explode+count is computed once (Round8PlanSpec pin)
      cc.join(rc, Seq("id", "g"), "full_outer")
        .agg(
          coalesce(sum(least(coalesce(col("cc"), lit(0L)),
            coalesce(col("rc"), lit(0L)))), lit(0L)).as(s"match$n"),
          coalesce(sum(coalesce(col("cc"), lit(0L))), lit(0L))
            .as(s"ctotal$n"),
          coalesce(sum(coalesce(col("rc"), lit(0L))), lit(0L))
            .as(s"rtotal$n"))
    }
    counts(1).crossJoin(counts(2))
      .withColumn("rouge1_p", expr(rougePExpr(1)))
      .withColumn("rouge1_r", expr(rougeRExpr(1)))
      .withColumn("rouge1_f", expr(rougeFExpr(1)))
      .withColumn("rouge2_p", expr(rougePExpr(2)))
      .withColumn("rouge2_r", expr(rougeRExpr(2)))
      .withColumn("rouge2_f", expr(rougeFExpr(2)))
  }

  /** Per-slice macro-averaged token F1 (the SQuAD answer-overlap metric
    * generalized to a corpus): per document, the multiset token overlap
    * between the lowercased reference and a synthetic candidate (every
    * `dropEvery`-th token removed), F1 = 2·overlap/(|cand|+|ref|) — one
    * division per document, rounded at 6 — then the macro mean per slice
    * as an exact DECIMAL sum of the rounded per-document scores over the
    * document count (order-independent, the calibration-bins
    * discipline). Macro (per-doc then mean), not micro (corpus-pooled
    * counts) — the level at which [[corpusRouge]] and this differ.
    *
    * Scale: one explode + (doc, gram)-keyed count + left join + doc-
    * keyed sum + slice-keyed sum — every exchange is keyed, map-side
    * combining throughout, no driver state.
    */
  def tokenF1Macro(docs: DataFrame, sliceCol: String, idCol: String,
      textCol: String, dropEvery: Int = 4): DataFrame = {
    require(dropEvery >= 2)
    val toks = docs.select(col(sliceCol).as("slice"), col(idCol).as("id"),
        TextAnalysis.tokens(lower(col(textCol))).as("ref"))
      .withColumn("cand",
        expr(s"filter(ref, (x, i) -> (i + 1) % $dropEvery != 0)"))
      .localCheckpoint(true) // feeds the two gram passes AND the lengths
    val cc = toks.select(col("id"), explode(col("cand")).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("cc"))
    val rc = toks.select(col("id"), explode(col("ref")).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("rc"))
    val overlap = cc.join(rc, Seq("id", "g"), "left")
      .groupBy("id")
      .agg(sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as("o"))
    val perDoc = toks
      .select(col("slice"), col("id"), size(col("cand")).cast("long").as("cl"),
        size(col("ref")).cast("long").as("rl"))
      .join(overlap, Seq("id"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("f1", when(col("o") === 0, lit(0.0))
        .otherwise(round(lit(2.0) * col("o").cast("double")
          / (col("cl") + col("rl")).cast("double"), 6)))
      .withColumn("p", when(col("cl") === 0, lit(0.0))
        .otherwise(round(col("o").cast("double") / col("cl").cast("double"), 6)))
      .withColumn("r", when(col("rl") === 0, lit(0.0))
        .otherwise(round(col("o").cast("double") / col("rl").cast("double"), 6)))
    perDoc.groupBy(col("slice").as(sliceCol))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("p").cast("decimal(30,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("macro_p"),
        round(sum(col("r").cast("decimal(30,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("macro_r"),
        round(sum(col("f1").cast("decimal(30,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("macro_f1"))
  }

  /** Shared Krippendorff-alpha final expression for `m` binary raters —
    * nominal metric, no missing values, so the coincidence-matrix form
    * collapses to three exact longs per slice (n_items, n1 = total
    * positive ratings, spair = Σ_u o_u·(m−o_u)):
    * α = 1 − (n·m−1)·spair / ((m−1)·n1·n0). Degenerate slices (all
    * ratings identical ⇒ n1·n0 = 0) report NULL — α is undefined there,
    * and 0/0-as-1.0 would overstate agreement.
    */
  private[graft] def krippendorffExpr(m: Int): String =
    s"CASE WHEN s_pos = 0 OR s_pos = n_items * $m THEN CAST(NULL AS DOUBLE) " +
      s"ELSE round(1.0 - CAST((n_items * $m - 1) AS DOUBLE) * CAST(spair AS DOUBLE) " +
      s"/ (${m - 1}.0 * CAST(s_pos AS DOUBLE) " +
      s"* CAST(n_items * $m - s_pos AS DOUBLE)), 6) END"

  /** Per-slice Krippendorff's alpha across `raters.size` boolean raters
    * — the chance-corrected agreement coefficient that, unlike
    * [[fleissKappa]], is derived from the pairable-value coincidence
    * matrix (so its expected-disagreement term uses n·m−1, making the
    * two diverge on small slices — worth reporting both). ONE map-side
    * combining aggregation to slice granularity (three longs of state),
    * one shared final expression.
    */
  def krippendorffAlpha(df: DataFrame, sliceCol: String,
      raters: Seq[Column]): DataFrame = {
    val m = raters.size
    require(m >= 2, "krippendorffAlpha needs at least 2 raters")
    val o = raters.map(_.cast("boolean").cast("long")).reduce(_ + _)
    df.select(col(sliceCol), o.as("__o"))
      .groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__o")).as("s_pos"),
        sum(col("__o") * (lit(m.toLong) - col("__o"))).as("spair"))
      .withColumn("alpha", expr(krippendorffExpr(m)))
  }

  /** Per-slice Brier score of a probability-score column against a
    * boolean label — the proper scoring rule behind [[calibrationBins]]
    * (mean squared error between predicted probability and outcome).
    * Each per-row term (score−y)² is rounded at 6 and summed as an
    * exact DECIMAL, so the slice mean is order-independent; one final
    * division. Null scores or labels are excluded up front (the
    * binaryConfusion rule).
    */
  def brierScore(df: DataFrame, sliceCol: String, scoreCol: String,
      label: Column): DataFrame = {
    val y = label.cast("boolean")
    df.where(col(scoreCol).isNotNull && y.isNotNull)
      .select(col(sliceCol),
        round(pow(col(scoreCol) - y.cast("double"), 2), 6)
          .cast("decimal(30,6)").as("__t"))
      .groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__t")).cast("double")
          / count(lit(1)).cast("double"), 6).as("brier"))
  }

  /** Per-slice expected calibration error over `nBins` equi-width score
    * bins — the scalar that summarizes [[calibrationBins]]'s curve:
    * ECE = Σ_b (n_b/N)·|frac_pos_b − mean_score_b|. The algebra
    * collapses each bin's weighted gap to |n_pos_b − Σscores_b| / N,
    * where Σscores_b is the per-term-round(6) DECIMAL score sum — so the
    * whole metric is an exact DECIMAL sum of per-bin absolute
    * differences with ONE final division. Order-independent, no float
    * accumulation, bin-granularity state (nBins rows of two numbers per
    * slice).
    */
  def expectedCalibrationError(df: DataFrame, sliceCol: String,
      scoreCol: String, label: Column, nBins: Int = 10): DataFrame = {
    require(nBins > 0)
    val y = label.cast("boolean")
    val bin = least(floor(col(scoreCol) * nBins), lit(nBins - 1.0))
      .cast("long")
    df.where(col(scoreCol).isNotNull && y.isNotNull)
      .groupBy(col(sliceCol), bin.as("__b"))
      .agg(count(lit(1)).as("__n"),
        sum(y.cast("long")).as("__pos"),
        sum(round(col(scoreCol), 6).cast("decimal(30,6)")).as("__s"))
      .groupBy(col(sliceCol))
      .agg(sum(col("__n")).as("n"),
        count(lit(1)).as("n_bins_used"),
        round(sum(abs(col("__pos").cast("decimal(30,6)") - col("__s")))
          .cast("double") / sum(col("__n")).cast("double"), 6).as("ece"))
  }

  /** Shared chrF final expressions over the nine exact longs (match_n /
    * ctotal_n / rtotal_n, n = 1..3). Per-n precision/recall are exact-
    * long ratios (0 where the denominator is 0, the sacrebleu empty-
    * hypothesis convention); P/R are their plain means; chrF is the
    * β=2 harmonic blend 5PR/(4P+R) computed on the UNROUNDED means
    * inside ONE shared string, so both engines round once, at the end.
    */
  private def chrfAvg(stat: String, tot: String): String =
    "(" + (1 to 3).map(n =>
      s"(CASE WHEN $tot$n = 0 THEN 0.0 " +
        s"ELSE CAST($stat$n AS DOUBLE) / CAST($tot$n AS DOUBLE) END)")
      .mkString(" + ") + ") / 3.0"
  private[graft] val chrfPExpr: String =
    s"round(${chrfAvg("match", "ctotal")}, 6)"
  private[graft] val chrfRExpr: String =
    s"round(${chrfAvg("match", "rtotal")}, 6)"
  private[graft] val chrfExpr: String = {
    val p = chrfAvg("match", "ctotal")
    val r = chrfAvg("match", "rtotal")
    s"CASE WHEN 4.0 * ($p) + ($r) = 0.0 THEN 0.0 " +
      s"ELSE round(5.0 * ($p) * ($r) / (4.0 * ($p) + ($r)), 6) END"
  }

  /** Corpus chrF (character n-gram F-β, β=2, n=1..3 — the tokenizer-
    * independent MT metric; Popović 2015) between the reference text and
    * a synthetic candidate (the reference with every `dropEvery`-th
    * token deleted). chrF operates on the WHITESPACE-STRIPPED character
    * stream, so a token deletion also perturbs the grams that straddled
    * the deleted token's boundaries — unlike [[corpusRouge]]'s pure
    * token deletion, candidate precision is NOT structurally 1 here.
    *
    * All three orders are counted in ONE candidate pass and ONE
    * reference pass: each doc explodes its (n, gram) pairs for n = 1..3
    * together, per-(doc, n, gram) counts are clipped on a single join,
    * and the nine corpus longs come out of one n-keyed aggregation —
    * not a pass per order. Exchanges carry (doc, n, gram) counts with
    * map-side combining, the corpusBleu shape.
    */
  def corpusChrf(docs0: DataFrame, idCol: String, textCol: String,
      dropEvery: Int = 5): DataFrame = {
    require(dropEvery >= 2)
    // char grams fan out ~6× more rows than word grams — spread the
    // explode across cores even when the input is a single parquet file
    val docs = DataOps.parallelismFloor(docs0)
    val toks = docs.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("id"), array_join(col("__t"), "").as("ref"),
        array_join(expr(
          s"filter(__t, (x, i) -> (i + 1) % $dropEvery != 0)"), "")
          .as("cand"))
      .localCheckpoint(true) // feeds the candidate AND reference passes
    // All orders' grams of one string, tagged: array<struct<n, g>>.
    def grams(s: String): Column = concat((1 to 3).map(n => expr(
      s"""CASE WHEN length($s) >= $n
         |  THEN transform(sequence(1, length($s) - ${n - 1}),
         |         i -> struct($n AS n, substring($s, i, $n) AS g))
         |  ELSE CAST(array() AS ARRAY<STRUCT<n: INT, g: STRING>>)
         |END""".stripMargin)): _*)
    def perGram(side: String, cnt: String): DataFrame =
      toks.select(col("id"), explode(grams(side)).as("__g"))
        .groupBy(col("id"), col("__g.n").as("n"), col("__g.g").as("g"))
        .agg(count(lit(1)).as(cnt))
    val cc = perGram("cand", "cc")
    val rc = perGram("ref", "rc")
    // ONE full-outer join yields clipped matches AND both totals, so each
    // side's explode+count really is computed once (Round8PlanSpec pins
    // exactly two Generates)
    val m = cc.join(rc, Seq("id", "n", "g"), "full_outer")
      .groupBy("n")
      .agg(sum(least(coalesce(col("cc"), lit(0L)),
          coalesce(col("rc"), lit(0L)))).as("m"),
        sum(coalesce(col("cc"), lit(0L))).as("ct"),
        sum(coalesce(col("rc"), lit(0L))).as("rt"))
    val aggs = (1 to 3).flatMap(n => Seq(
      coalesce(sum(when(col("n") === n, col("m"))), lit(0L)).as(s"match$n"),
      coalesce(sum(when(col("n") === n, col("ct"))), lit(0L)).as(s"ctotal$n"),
      coalesce(sum(when(col("n") === n, col("rt"))), lit(0L)).as(s"rtotal$n")))
    val wide = m.agg(aggs.head, aggs.tail: _*)
    wide.withColumn("chrf_p", expr(chrfPExpr))
      .withColumn("chrf_r", expr(chrfRExpr))
      .withColumn("chrf", expr(chrfExpr))
  }

  /** Shared Gwet AC1 final expressions over the exact 2×2 confusion
    * longs (n, yy, yn, ny, nn) — spelled identically in Spark SQL and
    * DuckDB. Chance agreement is 2π(1−π) with π the MEAN of the two
    * raters' positive rates; since 2π(1−π) ≤ 1/2, the denominator
    * 1 − pe ≥ 1/2 and AC1 never divides by zero — the structural fix
    * for kappa's prevalence paradox (near-unanimous raters drive
    * kappa's pe → 1 and the score collapses; AC1 stays calibrated).
    */
  private[graft] val gwetPoExpr: String =
    "round(CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE), 6)"
  private[graft] val gwetPeExpr: String = {
    val pi = "((CAST(yy + yn AS DOUBLE) + CAST(yy + ny AS DOUBLE)) " +
      "/ (2.0 * CAST(n AS DOUBLE)))"
    s"round(2.0 * $pi * (1.0 - $pi), 6)"
  }
  private[graft] val gwetAc1Expr: String = {
    val pi = "((CAST(yy + yn AS DOUBLE) + CAST(yy + ny AS DOUBLE)) " +
      "/ (2.0 * CAST(n AS DOUBLE)))"
    val po = "(CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE))"
    val pe = s"(2.0 * $pi * (1.0 - $pi))"
    s"round(($po - $pe) / (1.0 - $pe), 6)"
  }

  /** Per-slice Gwet AC1 agreement between two boolean raters — the
    * prevalence-robust companion to Cohen's kappa (`eval_kappa`). When
    * two quality filters agree on ALMOST EVERYTHING (the normal state of
    * production filters: most documents are clearly keep or clearly
    * drop), kappa's chance term π_A·π_B + (1−π_A)(1−π_B) approaches 1
    * and kappa collapses toward 0 no matter how good the agreement — the
    * prevalence paradox. AC1's chance term 2π(1−π) is bounded by 1/2,
    * so near-unanimous slices keep an interpretable score (and the
    * division is structurally total). Standard practice is to report
    * both: kappa for comparability, AC1 for stability.
    *
    * Exactness: the four confusion cells are exact longs from ONE
    * aggregation; po, pe and AC1 are shared final expressions.
    *
    * Scale: one row-local projection + one map-side-combining
    * aggregation to slice granularity — four longs of state per slice.
    */
  def gwetAc1(df: DataFrame, sliceCol: String, raterA: Column,
      raterB: Column): DataFrame = {
    val a = raterA.cast("boolean")
    val b = raterB.cast("boolean")
    df.where(a.isNotNull && b.isNotNull)
      .select(col(sliceCol), a.as("__a"), b.as("__b"))
      .groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n"),
        sum((col("__a") && col("__b")).cast("long")).as("yy"),
        sum((col("__a") && !col("__b")).cast("long")).as("yn"),
        sum((!col("__a") && col("__b")).cast("long")).as("ny"),
        sum((!col("__a") && !col("__b")).cast("long")).as("nn"))
      .withColumn("po", expr(gwetPoExpr))
      .withColumn("pe", expr(gwetPeExpr))
      .withColumn("ac1", expr(gwetAc1Expr))
  }

  /** Per-slice split-conformal calibration over INTEGER nonconformity
    * scores: from a calibration set, the threshold q̂ = the k-th
    * smallest calibration score with k = ⌈(n+1)(1−α)⌉ — the
    * finite-sample-correct quantile such that P(test score ≤ q̂) ≥ 1−α
    * holds distribution-free (split conformal prediction, Vovk et al.;
    * the production form of "ship a guarantee, not a point estimate"
    * for any scoring model). Slices whose calibration set is too small
    * for the guarantee (k > n, i.e. n < ⌈(n+1)(1−α)⌉ impossible to
    * satisfy) report a null threshold rather than a fake one. The
    * returned empirical test coverage should straddle 1−α — the
    * standard conformal sanity readout.
    *
    * Exactness: scores are exact longs; the order statistic is picked
    * from per-slice cumulative counts over the COMPRESSED
    * (slice, score, count) table — never a global row rank (the AUC
    * discipline); coverage is one shared-rounded division.
    *
    * Scale: one aggregation to (slice, score) cells, one slice-keyed
    * window over cells (cell count bounded by distinct scores per
    * slice, corpus-size-independent under the integral-score
    * contract), one broadcast-sized join back to the test aggregate.
    */
  def conformalThreshold(df: DataFrame, sliceCol: String, score: Column,
      isCalibration: Column, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0,1)")
    val base = df.where(score.isNotNull && isCalibration.isNotNull)
      .select(col(sliceCol), score.cast("long").as("__s"),
        isCalibration.cast("boolean").as("__cal"))
    val cells = base.where(col("__cal"))
      .groupBy(col(sliceCol), col("__s"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(sliceCol).orderBy(col("__s"))
    // k = ceil((n+1)(1-alpha)) in exact integer arithmetic:
    // ceil(x/y) = (x + y - 1) div y with (1-alpha) as a rational from
    // the 6-dp alpha grid — no float rank boundary anywhere
    val num = math.round((1.0 - alpha) * 1000000L)
    val ranked = cells
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(sliceCol)))
      .withColumn("__k", expr(s"((__n + 1) * ${num}L + 999999L) div 1000000L"))
    val qhat = ranked.where(col("__cum") >= col("__k"))
      .groupBy(col(sliceCol))
      .agg(min(col("__s")).as("qhat"))
    val calN = cells.groupBy(col(sliceCol))
      .agg(sum(col("__c")).as("n_cal"))
      .withColumn("k", expr(s"((n_cal + 1) * ${num}L + 999999L) div 1000000L"))
    val thr = calN.join(qhat.select(col(sliceCol), col("qhat")),
      Seq(sliceCol), "left")
    // Outer join on both sides (ADVICE r11 #2): a calibration-only slice
    // still reports its q̂ (with null test counts/coverage) and a
    // test-only slice surfaces with a NULL threshold — neither drops.
    val test = base.where(!col("__cal"))
    val testAgg = test
      .join(thr.select(col(sliceCol), col("qhat").as("__q")),
        Seq(sliceCol), "left")
      .groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n_test"),
        sum((col("__s") <= col("__q")).cast("long")).as("n_covered"))
    thr.join(testAgg, Seq(sliceCol), "full_outer")
      .withColumn("coverage",
        when(col("qhat").isNull || col("n_test").isNull,
          lit(null).cast("double")).otherwise(
          expr(Analytics.half6Sql(
            "CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE)"))))
      .select(col(sliceCol), col("n_cal"), col("k"), col("qhat"),
        col("n_test"), col("n_covered"), col("coverage"))
  }
}
