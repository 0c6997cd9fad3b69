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
        var packIdx = -1L
        var fill = 0L
        var seqNo = 0
        it.map { d =>
          val oversize = d.n_tokens > budget
          if (packIdx < 0 || fill + d.n_tokens > budget) {
            packIdx += 1; fill = 0L; seqNo = 0
          }
          fill += d.n_tokens
          seqNo += 1
          // bucket-unique pack ids without any global counter
          PackedDoc(d.id, d.n_tokens, bucket * 4294967296L + packIdx,
            seqNo - 1, oversize)
        }
      }
      .toDF()
  }

  /** Deterministic greedy next-fit packing scoped to a GROUP key (e.g. the
    * document source): within each group, documents are packed in ascending
    * id order, so the result is a pure function of the data — independent
    * of partition count or layout (unlike `packSequences`, whose packs
    * follow physical partitions for zero-coordination scale-out).
    *
    * `flatMapSortedGroups` is the Spark-idiomatic form: one shuffle on the
    * group key, Spark sorts within each group (secondary sort — no
    * per-group buffering in user code), and the running-fill fold streams
    * over the sorted iterator. Parallelism = number of groups; use it when
    * pack identity must be reproducible, `packSequences` when raw
    * throughput matters.
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
        var packIdx = -1L
        var fill = 0L
        var seqNo = 0
        it.map { case (_, id, n) =>
          val oversize = n > budget
          if (packIdx < 0 || fill + n > budget) {
            packIdx += 1; fill = 0L; seqNo = 0
          }
          fill += n
          seqNo += 1
          PackedGroupDoc(group, id, n, packIdx, seqNo - 1, oversize)
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
}
