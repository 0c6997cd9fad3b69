package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One packed document: which pack it landed in and its position there.
  * (Top-level so the Catalyst encoder can codegen its constructor.)
  */
case class PackedDoc(id: Long, n_tokens: Long, pack_id: Long, pack_seq: Int,
    oversize: Boolean)

/** Internal: a (bucket, id, n_tokens) row for the bucketed packer. */
case class BucketedDoc(bucket: Long, id: Long, n_tokens: Long)

/** One packed document in the group-scoped variant: pack identity is
  * (group, pack_idx), independent of physical partitioning.
  */
case class PackedGroupDoc(group: String, id: Long, n_tokens: Long,
    pack_idx: Long, pack_seq: Int, oversize: Boolean)

/** Greedy next-fit sequence packing: assemble documents into fixed
  * token-budget packs (context windows) — the dataset-assembly step that
  * turns a deduped corpus into training sequences.
  */
object Packing {

  /** The ONE streaming next-fit fold both packers share: (id, n_tokens)
    * in iteration order → (id, n_tokens, pack_idx, pack_seq, oversize).
    * A new pack opens when the next document would overflow the budget;
    * an oversize document gets a pack of its own, flagged.
    */
  private def nextFit(it: Iterator[(Long, Long)], budget: Long)
      : Iterator[(Long, Long, Long, Int, Boolean)] = {
    var packIdx = -1L
    var fill = 0L
    var seqNo = 0
    it.map { case (id, n) =>
      val oversize = n > budget
      if (packIdx < 0 || fill + n > budget) {
        packIdx += 1; fill = 0L; seqNo = 0
      }
      fill += n
      seqNo += 1
      (id, n, packIdx, seqNo - 1, oversize)
    }
  }

  /** Deterministic bucketed greedy next-fit packing: documents are hashed
    * into `nBuckets` buckets (`floorMod(mix64(id), nBuckets)`), each
    * bucket packs its own documents in ascending-id order, and the pack
    * id is `bucket * 2^32 + packIdx` — a pure function of (data,
    * nBuckets), independent of cluster layout, partition count, or
    * restarts.
    *
    * This replaced an earlier physical-partition-scoped form (pack ids
    * derived from `TaskContext.getPartitionId`): that one had the same
    * zero-coordination scale shape but its output changed with the
    * physical layout, which made it untestable against an oracle and
    * unstable across restarts — and it had no capability this form
    * lacks. Scale shape is unchanged: packs never span buckets, so the
    * whole pass is ONE shuffle on the bucket key with a secondary sort
    * on id (`flatMapSortedGroups` — no per-group buffering), and
    * cross-executor coordination is zero. Parallelism = `nBuckets`; set
    * it to the cluster's target parallelism at scale (default 32
    * matches the local shuffle-partition count and the oracle replay).
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, nBuckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        BucketedDoc(Math.floorMod(Aggs.mix64(id), nBuckets.toLong), id, n)
      }
      .groupByKey(_.bucket)
      .flatMapSortedGroups(col("id")) { (bucket, it) =>
        nextFit(it.map(d => (d.id, d.n_tokens)), budget).map {
          case (id, n, packIdx, seq, oversize) =>
            // bucket-unique pack ids without any global counter
            PackedDoc(id, n, bucket * 4294967296L + packIdx, seq, oversize)
        }
      }
      .toDF()
  }

  /** Deterministic greedy next-fit packing scoped to a GROUP key (e.g. the
    * document source). Both packers are pure functions of the data and run
    * the same `nextFit` fold after one shuffle with a secondary sort; they
    * differ only in the scope of a pack: here it is a *semantic* key
    * (pack_idx is meaningful per source, parallelism = number of groups),
    * while `packSequences` scopes by mix64 hash bucket (pack identity is
    * synthetic, parallelism = nBuckets regardless of the key cardinality —
    * the scale form when groups are few or skewed).
    *
    * `flatMapSortedGroups` is the Spark-idiomatic form: one shuffle on the
    * group key, Spark sorts within each group (secondary sort — no
    * per-group buffering in user code), and the running-fill fold streams
    * over the sorted iterator.
    */
  def packSequencesByGroup(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("_1"),
        col(idCol).cast("long").as("_2"), col(tokensCol).cast("long").as("_3"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("_2")) { (group, it) =>
        nextFit(it.map(t => (t._2, t._3)), budget).map {
          case (id, n, packIdx, seq, oversize) =>
            PackedGroupDoc(group, id, n, packIdx, seq, oversize)
        }
      }
      .toDF()
  }

  /** Fixed-window token chunking with stride (context-window preparation):
    * each document becomes ceil-spaced overlapping chunks of up to
    * `window` tokens, starting every `stride` tokens. The converse of
    * packing — long documents are cut down to model context length before
    * short ones are packed up to it.
    *
    * Pure narrow projection + explode: no shuffle at all, so it scales
    * with scan bandwidth. Chunk identity (doc, chunk_id) is a function of
    * the data alone — restart/repartition-stable.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          floor((col("__n") - 1L) / lit(stride.toLong)))))
      .select(col(idCol), col("chunk_id"),
        least(lit(window.toLong), col("__n") - col("chunk_id") * stride)
          .as("n_in_chunk"),
        array_join(
          slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
            lit(window)), " ").as("chunk_text"))
  }

  /** T5-style span-corruption accounting: deterministically mark span
    * STARTS at token positions where `mix64(doc·100003 + pos) mod every
    * = 0`, extend each start over `spanLen` tokens (overlaps merge), and
    * report per-document how many tokens and maximal spans the mask
    * covers — the denoising-objective bookkeeping (mask rate, sentinel
    * count = n_spans) a span-corruption data build needs before it
    * materializes inputs/targets. The mask is a pure function of
    * (doc id, position): restart/repartition-stable, replayable in SQL
    * via the mix64 CTE chain.
    *
    * Scale: positions explode to token granularity, then everything is
    * per-doc windows over the SAME doc-keyed exchange (coverage via a
    * `spanLen`-preceding running max, span starts via lag) plus one
    * doc-keyed count aggregation — one shuffle end to end, no RNG, no
    * driver state.
    */
  def maskSpans(df: DataFrame, idCol: String, textCol: String,
      every: Int = 5, spanLen: Int = 3): DataFrame = {
    require(every >= 2 && spanLen >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("i"))
    val pos = df
      .select(col(idCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("__n"))
      .withColumn("i", explode(sequence(lit(1L), col("__n"))))
      .withColumn("st",
        when(pmod(HashExprs.mix64(col(idCol).cast("long") * lit(100003L)
          + col("i")), lit(every.toLong)) === 0L, 1L).otherwise(0L))
      .withColumn("cv",
        max(col("st")).over(w.rowsBetween(-(spanLen - 1L), 0L)))
      .withColumn("pv", coalesce(lag(col("cv"), 1).over(w), lit(0L)))
    pos.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("cv")).as("n_masked"),
        sum(when(col("cv") === 1L && col("pv") === 0L, 1L).otherwise(0L))
          .as("n_spans"))
      .withColumn("mask_rate",
        round(col("n_masked").cast("double") /
          col("n_tokens").cast("double"), 6))
  }
}
