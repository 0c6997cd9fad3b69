package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cardano.{Schemas, SyncDriver, TableStore}

/** ST3 "v2": the incremental sync driven by Structured Streaming
  * (SURVEY.md §7 phase 4 — "optional Structured Streaming front-end behind
  * the same Transform/Load").
  *
  * Streaming is the *scheduler* here: a stream over the `block` table
  * fires a micro-batch whenever new blocks land, and each micro-batch runs
  * the exact same tip-probe → period-grid → extract/transform/load cycle
  * as the batch driver (so the 3-block ingestion lag, `(from, to]` period
  * semantics, and idempotent versioned commits are identical — streaming
  * and batch cannot drift). State lives in the output tables (anti-join
  * design, ST5), so the stream needs no state store and restarts resume
  * from the sink tip like the reference does.
  */
class StreamingSyncDriver(
    spark: SparkSession,
    sourceDir: String,
    store: TableStore,
    intervalMinutes: Long = 120) {

  private val inner = new SyncDriver(spark, sourceDir, store, intervalMinutes)

  /** Periods run across all micro-batches of this query's lifetime. */
  @volatile var periodsRun: Int = 0

  /** Start the streaming front-end. `availableNow = true` drains what is
    * currently on disk and stops (test/backfill mode); otherwise a
    * continuous `ProcessingTime` trigger polls like the reference's 10 s
    * idle loop.
    */
  def start(availableNow: Boolean = false): StreamingQuery = {
    val blocks = spark.readStream
      .schema(Schemas.block)
      .parquet(s"$sourceDir/block.parquet")
    val writer = blocks.writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        // the micro-batch content is only the wake-up signal; the sync
        // re-probes tips itself so lag + resume semantics match batch mode
        periodsRun += inner.catchUp()
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds")))
      .start()
  }
}
