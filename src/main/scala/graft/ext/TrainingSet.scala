package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-set assembly: the whole phase-E pipeline as one
  * composition, from raw documents to packed fixed-budget training
  * sequences. Order matters and is the standard one:
  *
  *   scrub -> quality filter -> exact dedup -> fuzzy (MinHash) dedup
  *     -> benchmark-contamination filter -> per-source quota
  *     -> mixture weighting -> greedy sequence packing
  *
  * (Cheap row-local filters first so every expensive shuffle-bearing
  * stage — dedup candidates, contamination grams, packing — sees the
  * smallest possible corpus. Contamination runs on the hashed-kernel
  * path: 8-byte shingle hashes on the wire, never gram strings.)
  */
object TrainingSet {

  def assemble(docs: DataFrame, benchmark: DataFrame,
      weights: Map[String, Int], capPerSource: Int = 1000000,
      tokenBudget: Long = 256, maxContamination: Double = 0.5,
      ngram: Int = 5): DataFrame = {
    // Parallelism floor before the per-row-heavy chain (regex scrub,
    // quality stats, shingle hashing): a no-op at scale, a 32× win when
    // the corpus arrives as one unsplittable parquet row group.
    val scrubbed = DataOps.parallelismFloor(docs)
      .withColumn("text", TextAnalysis.scrub(col("text")))
    val quality = TextAnalysis.qualityFlags(scrubbed, "text")
      .where(col("keep")).select(docs.columns.map(col): _*)
    // Plan barrier: `exact` feeds BOTH dedupByMinhash (itself iterative —
    // many actions) and the left side of the fuzzy semi-join; without the
    // checkpoint the scrub -> quality -> exact-dedup chain re-runs once
    // per downstream action. Same for `fuzzy`, read by the contamination
    // branch and the left-anti join.
    val exact = quality.join(
      Dedup.exact(quality, "doc_id", "text").select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val fuzzy = exact.join(
      Dedup.dedupByMinhash(exact, "doc_id", "text")
        .where(col("keep")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val contaminated = TextAnalysis
      .ngramOverlap(fuzzy, benchmark, "doc_id", "text", ngram, hashed = true)
      .where(col("n_hit") > col("n_grams") * maxContamination)
      .select("doc_id")
    val clean = fuzzy.join(contaminated, Seq("doc_id"), "left_anti")
    val capped = DataOps.capPerGroup(clean, Seq("source"), Seq("doc_id"), capPerSource)
    val mixed = DataOps.weightedMixture(capped, "source", weights)
      // replica-unique packing id; rep is small (epoch count), so shifting
      // the doc id by a few bits keeps uid collision-free and stable
      .withColumn("uid", col("doc_id") * 64 + col("rep"))
    // Pack per source in ascending uid order: pack identity is
    // (source, pack_idx), a pure function of the data — reproducible
    // across partitionings/restarts AND replayable by the driver's SQL
    // oracle. (At larger scale, shard the group key — e.g. source ×
    // hash-bucket — to widen packing parallelism; pack ids stay
    // deterministic per shard.)
    Packing.packSequencesByGroup(
      mixed.withColumn("n_tokens", size(TextAnalysis.tokens(col("text")))),
      "source", "uid", "n_tokens", tokenBudget)
      .withColumn("doc_id", floor(col("id") / 64).cast("long"))
      .withColumn("rep", pmod(col("id"), lit(64L)))
      .select(col("group").as("source"), col("doc_id"), col("rep"),
        col("n_tokens"), col("pack_idx"), col("pack_seq"), col("oversize"))
  }
}
