package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One packed document: which pack it landed in and its position there.
  * (Top-level so the Catalyst encoder can codegen its constructor.)
  */
case class PackedDoc(id: Long, n_tokens: Long, pack_id: Long, pack_seq: Int,
    oversize: Boolean)

/** One packed document in the group-scoped variant: pack identity is
  * (group, pack_idx), independent of physical partitioning.
  */
case class PackedGroupDoc(group: String, id: Long, n_tokens: Long,
    pack_idx: Long, pack_seq: Int, oversize: Boolean)

/** Greedy next-fit sequence packing: assemble documents into fixed
  * token-budget packs (context windows) — the dataset-assembly step that
  * turns a deduped corpus into training sequences.
  *
  * Genuinely imperative per-partition logic (running fill state), so this
  * is the rare legitimate `mapPartitions`: each partition packs its own
  * documents independently (packs never span partitions — at scale that's
  * exactly what you want: no cross-executor coordination), deterministic
  * via sortWithinPartitions + hash repartition on the id.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .repartition(col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
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
          // partition-unique pack ids without any global counter
          PackedDoc(id, n, pid * 1000000000L + packIdx, seqNo - 1, oversize)
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
