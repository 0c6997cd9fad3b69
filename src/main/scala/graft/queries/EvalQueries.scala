package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ext.{Analytics, DataOps, Eval, Pii, TextAnalysis}
import graft.sources.Tables

/** Evaluation, scrubbing, and release-accounting operators: the steps a
  * pipeline runs AFTER filtering to decide whether the corpus ships —
  * per-slice classifier metrics (confusion / AUC / calibration), PII
  * detection and redaction, cross-split contamination, the rejection
  * funnel report, curriculum staging, and the behavioral transition
  * prior. Each pairs a shuffle-minimal Spark pipeline with a bit-exact
  * DuckDB replay.
  */
object EvalQueries {
  import Queries.QueryFn

  // ---------------------------------------------------------------- PII

  /** Deterministic PII-bearing text: every third document gets an email,
    * an IPv4, a phone, and a 12-digit account id appended, derived from
    * doc_id by the SAME expression in Spark and SQL — so the regex
    * kernels are exercised on known-positive rows (the raw synthetic
    * corpus contains no digits at all) while the other rows pin the
    * zero-match path.
    */
  private def augmentedText: Column =
    when(col("doc_id") % 3 === 0, concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example ip 10."), (col("doc_id") % 200).cast("string"),
      lit(".0."), (col("doc_id") % 250).cast("string"),
      lit(" tel +1415"),
      lpad((col("doc_id") % 10000).cast("string"), 7, "0"),
      lit(" acct "), (lit(100000000000L) + col("doc_id")).cast("string")))
    .otherwise(col("text"))

  // single line: this fragment interpolates into stripMargin'd outer SQL,
  // where a continuation line starting with '||' would be mangled
  private val augmentedTextSql: String =
    "CASE WHEN doc_id % 3 = 0 THEN text" +
      " || ' contact user' || CAST(doc_id AS VARCHAR)" +
      " || '@mail.example ip 10.' || CAST(doc_id % 200 AS VARCHAR)" +
      " || '.0.' || CAST(doc_id % 250 AS VARCHAR)" +
      " || ' tel +1415' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0')" +
      " || ' acct ' || CAST(100000000000 + doc_id AS VARCHAR) " +
      "ELSE text END"

  val piiDetect: QueryFn = (s, dir) =>
    Pii.detect(
      Tables.documents(s, dir).select(col("doc_id"), augmentedText.as("text")),
      "doc_id", "text")

  val piiDetectSql: String = {
    val cnt = Pii.categories.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(",\n  ")
    val tot = Pii.categories
      .map { case (name, _, _) => s"n_$name" }.mkString(" + ")
    s"""WITH aug AS (SELECT doc_id, $augmentedTextSql AS text FROM documents),
       |c AS (SELECT doc_id,
       |  $cnt
       |FROM aug)
       |SELECT doc_id, n_email, n_ipv4, n_phone, n_id_number,
       |  $tot AS n_pii
       |FROM c""".stripMargin
  }

  val piiRedact: QueryFn = (s, dir) =>
    Pii.redact(
      Tables.documents(s, dir).select(col("doc_id"), augmentedText.as("text")),
      "doc_id", "text")

  val piiRedactSql: String = {
    // staged texts t0..tN mirror the kernel: each category counts on the
    // text as-of its stage, then rewrites it for the next
    val stages = Pii.categories.zipWithIndex.map {
      case ((_, pat, ph), i) =>
        s"s${i + 1} AS (SELECT doc_id, t$i, " +
          s"regexp_replace(t$i, '$pat', '$ph', 'g') AS t${i + 1}, " +
          s"CAST(len(regexp_extract_all(t$i, '$pat')) AS BIGINT) AS c${i + 1}" +
          (if (i > 0) (1 to i).map(j => s", c$j").mkString("") else "") +
          s" FROM s$i)"
    }.mkString(",\n")
    val n = Pii.categories.size
    val tot = (1 to n).map(j => s"c$j").mkString(" + ")
    s"""WITH aug AS (SELECT doc_id, $augmentedTextSql AS text FROM documents),
       |s0 AS (SELECT doc_id, text AS t0 FROM aug),
       |$stages
       |SELECT doc_id, t$n AS redacted, $tot AS n_redacted
       |FROM s$n""".stripMargin
  }

  // --------------------------------------------------- classifier evals

  /** Per-source confusion metrics for a length-threshold classifier
    * predicting lang='en' — the slice-wise eval gate (aggregate metrics
    * hide slice regressions). All counts integer; one division each.
    */
  val evalConfusion: QueryFn = (s, dir) =>
    Eval.binaryConfusion(Tables.documents(s, dir), "source",
      col("lang") === "en", col("n_chars") >= 300)

  val evalConfusionSql: String =
    """WITH c AS (
      |  SELECT source,
      |    CAST(sum(CASE WHEN lang = 'en' AND n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(sum(CASE WHEN lang = 'en' AND n_chars < 300 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars < 300 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM documents GROUP BY source
      |)
      |SELECT source, tp, fp, fn, tn,
      |  round(CAST(tp + tn AS DOUBLE) / greatest(tp + fp + fn + tn, 1), 6) AS accuracy,
      |  round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 6) AS precision,
      |  round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 6) AS recall,
      |  round(CAST(2 * tp AS DOUBLE) / greatest(2 * tp + fp + fn, 1), 6) AS f1
      |FROM c""".stripMargin

  /** Per-source ROC AUC of document length as a lang='en' predictor —
    * exact tied-rank Mann–Whitney over the compressed (slice, score)
    * table; the numerator stays in integer half-units.
    */
  val evalAuc: QueryFn = (s, dir) =>
    Eval.aucBySlice(Tables.documents(s, dir), "source", "n_chars",
      col("lang") === "en")
      .select("source", "n_pos", "n_neg", "auc")

  val evalAucSql: String =
    """WITH c AS (
      |  SELECT source, n_chars AS s,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p,
      |    CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n
      |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
      |), w AS (
      |  SELECT *, sum(n) OVER (PARTITION BY source ORDER BY s
      |    ROWS UNBOUNDED PRECEDING) AS cn
      |  FROM c
      |)
      |SELECT source, CAST(sum(p) AS BIGINT) AS n_pos,
      |  CAST(sum(n) AS BIGINT) AS n_neg,
      |  CASE WHEN sum(p) = 0 OR sum(n) = 0 THEN NULL
      |       ELSE round(CAST(sum(p * (2 * (cn - n) + n)) AS DOUBLE)
      |                  / (2.0 * sum(p) * sum(n)), 6) END AS auc
      |FROM w GROUP BY source""".stripMargin

  /** Calibration of the hashed-feature quality classifier's sigmoid
    * score against lang='en': 10 equi-width bins, mean predicted vs
    * observed fraction. Composes the proven-replayable classifier
    * kernel; the bin means are round(6) DECIMAL sums.
    */
  val evalCalibration: QueryFn = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .where(col("text").isNotNull && trim(col("text")) =!= "")
    val scored = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), (col("lang") === "en").as("__y")),
        Seq("doc_id"))
    Eval.calibrationBins(scored, "score", col("__y"), nBins = 10)
  }

  val evalCalibrationSql: String =
    s"""WITH qc AS (
       |  SELECT q.doc_id, q.score FROM (${ExtQueries.qualityClassifierSql}) q
       |), j AS (
       |  SELECT qc.score, (d.lang = 'en') AS y
       |  FROM qc JOIN documents d USING (doc_id)
       |)
       |SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  round(CAST(sum(CAST(round(score, 6) AS DECIMAL(30,6))) AS DOUBLE)
       |        / count(*), 6) AS mean_score,
       |  round(CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
       |        / count(*), 6) AS frac_pos
       |FROM j GROUP BY 1""".stripMargin

  // ------------------------------------------------- split contamination

  /** Cross-split leakage: test-split documents sharing at least one
    * 8-token shingle with any train-split document — the leakage audit
    * between a train corpus and its held-out eval (the contamination
    * check turned inward). Splits are the deterministic mix64
    * assignment; candidate grams are 8-byte hashes (never text) in every
    * exchange, the contamination scale shape.
    */
  val splitLeakage: QueryFn = (s, dir) => {
    val split = DataOps.datasetSplit(Tables.documents(s, dir), "doc_id",
      Seq(("train", 80), ("val", 90), ("test", 100)))
    TextAnalysis.ngramOverlap(
      split.where(col("split") === "test").select("doc_id", "text"),
      split.where(col("split") === "train").select("doc_id", "text"),
      "doc_id", "text", n = 8, hashed = true)
      .where(col("n_hit") > 0)
  }

  val splitLeakageSql: String =
    s"""WITH d0 AS (SELECT doc_id AS id, text FROM documents),
       |${ExtQueries.mix64Cte("d0", "id, text")},
       |sp AS (
       |  SELECT id AS doc_id, text,
       |    CASE WHEN ((hv % 100) + 100) % 100 < 80 THEN 'train'
       |         WHEN ((hv % 100) + 100) % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM hs
       |), toks AS (
       |  SELECT doc_id, split, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM sp WHERE split IN ('train', 'test')
       |), grams AS (
       |  SELECT DISTINCT doc_id, split, array_to_string(t[i:i+7], ' ') AS gram
       |  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS g(i)
       |), ref AS (
       |  SELECT DISTINCT gram FROM grams WHERE split = 'train'
       |)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN r.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
       |FROM grams g LEFT JOIN ref r USING (gram)
       |WHERE g.split = 'test'
       |GROUP BY g.doc_id
       |HAVING sum(CASE WHEN r.gram IS NOT NULL THEN 1 ELSE 0 END) > 0""".stripMargin

  // ------------------------------------------------------ release audit

  private val funnelStages: Seq[(String, Column)] = Seq(
    ("nonempty", col("text").isNotNull && trim(col("text")) =!= ""),
    ("lang_known", col("lang").isin("en", "es", "de", "fr")),
    ("min_chars", col("n_chars") >= 150),
    ("min_tokens", size(TextAnalysis.tokens(col("text"))) >= 30),
    ("max_chars", col("n_chars") <= 450))

  /** Ordered rejection funnel over the standard document quality chain —
    * one scalar aggregation, per-stage accounting rows (see
    * [[graft.ext.DataOps.filterFunnel]]).
    */
  val filterFunnelQ: QueryFn = (s, dir) =>
    DataOps.filterFunnel(Tables.documents(s, dir), funnelStages)

  val filterFunnelSql: String =
    """WITH f AS (
      |  SELECT CASE
      |    WHEN NOT coalesce(text IS NOT NULL AND trim(text) <> '', false) THEN 1
      |    WHEN NOT coalesce(lang IN ('en','es','de','fr'), false) THEN 2
      |    WHEN NOT coalesce(n_chars >= 150, false) THEN 3
      |    WHEN NOT coalesce(len(regexp_split_to_array(trim(text), '\s+')) >= 30, false) THEN 4
      |    WHEN NOT coalesce(n_chars <= 450, false) THEN 5
      |    ELSE 0 END AS ff
      |  FROM documents
      |), a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS total,
      |    CAST(sum(CASE WHEN ff = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
      |    CAST(sum(CASE WHEN ff = 2 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
      |    CAST(sum(CASE WHEN ff = 3 THEN 1 ELSE 0 END) AS BIGINT) AS r3,
      |    CAST(sum(CASE WHEN ff = 4 THEN 1 ELSE 0 END) AS BIGINT) AS r4,
      |    CAST(sum(CASE WHEN ff = 5 THEN 1 ELSE 0 END) AS BIGINT) AS r5
      |  FROM f
      |)
      |SELECT CAST(1 AS INTEGER) AS stage, 'nonempty' AS stage_name,
      |  total AS n_in, r1 AS n_rejected, total - r1 AS n_out FROM a
      |UNION ALL SELECT 2, 'lang_known', total - r1, r2, total - r1 - r2 FROM a
      |UNION ALL SELECT 3, 'min_chars', total - r1 - r2, r3, total - r1 - r2 - r3 FROM a
      |UNION ALL SELECT 4, 'min_tokens', total - r1 - r2 - r3, r4,
      |  total - r1 - r2 - r3 - r4 FROM a
      |UNION ALL SELECT 5, 'max_chars', total - r1 - r2 - r3 - r4, r5,
      |  total - r1 - r2 - r3 - r4 - r5 FROM a""".stripMargin

  /** Per-source curriculum quartiles over (n_chars, doc_id) — the
    * difficulty-staging assignment, co-partitioned with the source key.
    */
  val curriculumNtile: QueryFn = (s, dir) =>
    DataOps.curriculumBuckets(Tables.documents(s, dir), "source",
      Seq(col("n_chars"), col("doc_id")), nBuckets = 4)
      .select("doc_id", "source", "n_chars", "bucket")

  val curriculumNtileSql: String =
    """SELECT doc_id, source, n_chars,
      |  CAST(ntile(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id)
      |       AS INTEGER) AS bucket
      |FROM documents""".stripMargin

  /** Event-type Markov transition matrix (integer counts, one final
    * ratio) — see [[graft.ext.Analytics.markovTransitions]].
    */
  val tsMarkov: QueryFn = (s, dir) =>
    Analytics.markovTransitions(Tables.events(s, dir),
      "user_id", "ts", "event_id", "event_type")
      .select("from_type", "to_type", "cnt", "prob")

  val tsMarkovSql: String =
    """WITH s AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS from_type,
      |    event_type AS to_type
      |  FROM events
      |), c AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
      |  FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2
      |), t AS (
      |  SELECT from_type, CAST(sum(cnt) AS BIGINT) AS tt FROM c GROUP BY 1
      |)
      |SELECT c.from_type, c.to_type, c.cnt,
      |  round(CAST(c.cnt AS DOUBLE) / CAST(t.tt AS DOUBLE), 6) AS prob
      |FROM c JOIN t USING (from_type)""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "pii_detect"       -> piiDetect,
    "pii_redact"       -> piiRedact,
    "eval_confusion"   -> evalConfusion,
    "eval_auc"         -> evalAuc,
    "eval_calibration" -> evalCalibration,
    "split_leakage"    -> splitLeakage,
    "filter_funnel"    -> filterFunnelQ,
    "curriculum_ntile" -> curriculumNtile,
    "ts_markov"        -> tsMarkov,
  )

  val oracles: Map[String, String] = Map(
    "pii_detect"       -> piiDetectSql,
    "pii_redact"       -> piiRedactSql,
    "eval_confusion"   -> evalConfusionSql,
    "eval_auc"         -> evalAucSql,
    "eval_calibration" -> evalCalibrationSql,
    "split_leakage"    -> splitLeakageSql,
    "filter_funnel"    -> filterFunnelSql,
    "curriculum_ntile" -> curriculumNtileSql,
    "ts_markov"        -> tsMarkovSql,
  )
}
