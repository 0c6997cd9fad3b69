package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Analytics, DataOps, Dedup, Layout, Ranking, VectorExprs}
import graft.sources.Tables

/** Round-4b pipeline operators: the dataset-lifecycle steps a production
  * training-data pipeline runs AROUND the per-document transforms —
  * deterministic split assignment, changelog materialization, event-stream
  * compaction, weighted sampling, ranking fusion. Each pairs a
  * shuffle-minimal Spark pipeline with a bit-exact DuckDB replay.
  */
object PipelineQueries {
  import Queries.QueryFn

  /** Deterministic 80/10/10 train/val/test assignment per document —
    * a pure mix64 projection, zero shuffles (see DataOps.datasetSplit).
    */
  val datasetSplit: QueryFn = (s, dir) =>
    DataOps.datasetSplit(Tables.documents(s, dir), "doc_id",
      Seq(("train", 80), ("val", 90), ("test", 100)))
      .select("doc_id", "bucket", "split")

  val datasetSplitSql: String =
    s"""WITH d0 AS (SELECT doc_id AS id FROM documents),
       |${ExtQueries.mix64Cte("d0", "id")}
       |SELECT id AS doc_id, ((hv % 100) + 100) % 100 AS bucket,
       |  CASE WHEN ((hv % 100) + 100) % 100 < 80 THEN 'train'
       |       WHEN ((hv % 100) + 100) % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM hs""".stripMargin

  /** Event-stream compaction: consecutive same-type events per user fold
    * into runs (head id/value, span, count). One exchange on user_id.
    */
  val dedupConsecutive: QueryFn = (s, dir) =>
    Dedup.collapseConsecutive(Tables.events(s, dir),
      "user_id", "ts", "event_id", "event_type", "value")
      .select(col("user_id"), col("run"), col("event_id"), col("event_type"),
        col("value"), col("n_in_run"), col("ts_start"), col("ts_end"))

  val dedupConsecutiveSql: String =
    """WITH l AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn0
      |  FROM events
      |), r AS (
      |  SELECT *, sum(CASE WHEN rn0 = 1 OR pt IS DISTINCT FROM event_type THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run
      |  FROM l
      |), h AS (
      |  SELECT *, first_value(event_id) OVER wr AS head_id,
      |    first_value(value) OVER wr AS head_val
      |  FROM r
      |  WINDOW wr AS (PARTITION BY user_id, run ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id, CAST(run AS BIGINT) AS run, min(head_id) AS event_id,
      |  min(event_type) AS event_type, min(head_val) AS value,
      |  CAST(count(*) AS BIGINT) AS n_in_run,
      |  min(ts) AS ts_start, max(ts) AS ts_end
      |FROM h GROUP BY user_id, run""".stripMargin

  /** CDC materialization over the event log: 'error' is the delete
    * tombstone, everything else upserts; last op per user wins. ONE
    * map-side-combining aggregation (see DataOps.cdcApply).
    */
  val cdcApply: QueryFn = (s, dir) => {
    val log = Tables.events(s, dir).withColumn("op",
      when(col("event_type") === "error", "D").otherwise("U"))
    DataOps.cdcApply(log, Seq("user_id"), "op", Seq("ts", "event_id"),
      Seq("value", "ts"))
      .select(col("user_id"), col("value"), col("ts").as("last_ts"),
        col("n_ops"), col("n_deletes"))
  }

  val cdcApplySql: String =
    """WITH log AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      |  FROM events
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM log
      |), agg AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ops,
      |    CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
      |  FROM log GROUP BY 1
      |)
      |SELECT r.user_id, r.value, r.ts AS last_ts, agg.n_ops, agg.n_deletes
      |FROM r JOIN agg USING (user_id) WHERE rn = 1 AND op <> 'D'""".stripMargin

  /** Reciprocal-rank fusion of a BM25 ranking and a TF-IDF-sum ranking
    * over the same query terms — the retrieval-fusion step of a RAG /
    * contamination-check pipeline. Ranks are assigned by the
    * zipWithIndex dense ranker (no global window); contributions are
    * rounded at 9 and summed in DECIMAL on both engines.
    */
  val rankFusion: QueryFn = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val terms = Seq("join", "vector", "spark", "window")
    val bm25 = Ranking.bm25(docs, "doc_id", "text", terms)
      .withColumn("score", round(col("score"), 6))
    val tfidfSum = Ranking.tfidf(docs, "doc_id", "text")
      .where(col("term").isInCollection(terms))
      .groupBy("doc_id")
      .agg(sum(round(col("tfidf"), 6).cast("decimal(30,6)"))
        .cast("double").as("score"))
    Ranking.rrfFusion(Seq(bm25, tfidfSum))
      .select(col("doc_id"), col("n_lists"), col("best_rank"),
        col("rrf_score"))
  }

  val rankFusionSql: String =
    """WITH withlen AS (
      |  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS dl,
      |         regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS term FROM withlen) GROUP BY 1, 2
      |), stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM withlen
      |), dfreq AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
      |  WHERE term IN ('join', 'vector', 'spark', 'window') GROUP BY 1
      |), contrib AS (
      |  SELECT tf.doc_id,
      |    ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
      |      * (tf.tf * (1.2 + 1.0))
      |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * withlen.dl / stats.avgdl)) AS c
      |  FROM tf
      |  JOIN dfreq USING (term)
      |  JOIN withlen USING (doc_id), stats
      |  WHERE tf.term IN ('join', 'vector', 'spark', 'window')
      |), bm25 AS (
      |  SELECT doc_id,
      |    round(CAST(sum(CAST(round(c, 6) AS DECIMAL(30,6))) AS DOUBLE), 6) AS score
      |  FROM contrib GROUP BY doc_id
      |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |tfidf AS (
      |  SELECT tf.doc_id,
      |    CAST(sum(CAST(round(tf.tf * ln(nn.n / dfreq2.df), 6) AS DECIMAL(30,6))) AS DOUBLE) AS score
      |  FROM tf
      |  JOIN (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1) dfreq2 USING (term),
      |  nn
      |  WHERE tf.term IN ('join', 'vector', 'spark', 'window')
      |  GROUP BY tf.doc_id
      |), ranked AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm25
      |  UNION ALL
      |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM tfidf
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
      |  min(rank) AS best_rank,
      |  CAST(sum(CAST(round(1.0 / (60.0 + rank), 9) AS DECIMAL(30,9))) AS DOUBLE) AS rrf_score
      |FROM ranked GROUP BY doc_id""".stripMargin

  /** Equi-width 20-bucket histogram of lineitem extended price. Both
    * engines replay the identical IEEE edge arithmetic (no rounding), so
    * bucket ids, bounds, and counts hash-match exactly.
    */
  val statsHistogram: QueryFn = (s, dir) =>
    Analytics.histogram(Tables.lineitem(s, dir), "l_extendedprice", 20)

  val statsHistogramSql: String =
    """WITH env AS (
      |  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS mn,
      |         CAST(max(l_extendedprice) AS DOUBLE) AS mx FROM lineitem
      |), p AS (
      |  SELECT mn, CASE WHEN mx > mn THEN (mx - mn) / 20 ELSE 1.0 END AS width
      |  FROM env
      |), b AS (
      |  SELECT CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - p.mn) / p.width),
      |              19.0) AS BIGINT) AS bucket
      |  FROM lineitem, p
      |)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
      |  p.mn + bucket * p.width AS lo, p.mn + (bucket + 1) * p.width AS hi
      |FROM b, p GROUP BY bucket, p.mn, p.width""".stripMargin

  /** k-anonymity release of per-(lang, source) document counts: groups
    * under 5 members collapse into one masked bucket.
    */
  val anonymizeK: QueryFn = (s, dir) =>
    DataOps.kAnonymize(Tables.documents(s, dir), Seq("lang", "source"),
      "n_chars", k = 5)

  val anonymizeKSql: String =
    """WITH g AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(n_chars) AS BIGINT) AS measure
      |  FROM documents GROUP BY 1, 2
      |)
      |SELECT lang, source, n, measure FROM g WHERE n >= 5
      |UNION ALL
      |SELECT '*', '*', CAST(sum(n) AS BIGINT) AS n,
      |  CAST(sum(measure) AS BIGINT) AS measure
      |FROM g WHERE n < 5 HAVING count(*) > 0""".stripMargin

  /** Zone-map build over documents: per 100-id range, the min/max/null
    * stats of `n_chars` — the data-skipping index a lakehouse planner
    * prunes with.
    */
  val indexMinmax: QueryFn = (s, dir) =>
    Layout.zoneMap(Tables.documents(s, dir), "doc_id", "n_chars", 100L)

  val indexMinmaxSql: String =
    """SELECT CAST(floor(doc_id / 100.0) AS BIGINT) AS zone,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  min(n_chars) AS v_min, max(n_chars) AS v_max
      |FROM documents GROUP BY 1""".stripMargin

  /** L2 normalization of the embedding column, exploded to scalar rows;
    * the norm is the native sequential dot-product kernel, which DuckDB's
    * list_inner_product replays bit-for-bit.
    */
  val vecNormalize: QueryFn = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(VectorExprs.dot_product(col("e"), col("e"))))
      .select(col("vec_id"), col("nrm"), posexplode(col("e")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        round(col("x") / col("nrm"), 6).as("nv"))

  val vecNormalizeSql: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), n AS (
      |  SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS nrm FROM v
      |)
      |SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos, round(e[i] / nrm, 6) AS nv
      |FROM n, unnest(generate_series(1, len(e))) s(i)""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "dataset_split"     -> datasetSplit,
    "dedup_consecutive" -> dedupConsecutive,
    "cdc_apply"         -> cdcApply,
    "rank_fusion"       -> rankFusion,
    "stats_histogram"   -> statsHistogram,
    "anonymize_k"       -> anonymizeK,
    "index_minmax"      -> indexMinmax,
    "vec_normalize"     -> vecNormalize,
  )

  val oracles: Map[String, String] = Map(
    "dataset_split"     -> datasetSplitSql,
    "dedup_consecutive" -> dedupConsecutiveSql,
    "cdc_apply"         -> cdcApplySql,
    "rank_fusion"       -> rankFusionSql,
    "stats_histogram"   -> statsHistogramSql,
    "anonymize_k"       -> anonymizeKSql,
    "index_minmax"      -> indexMinmaxSql,
    "vec_normalize"     -> vecNormalizeSql,
  )
}
