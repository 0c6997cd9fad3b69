package graft.cardano

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CardanoFunctions._

/** Set-based re-expression of the reference's row-at-a-time transform loop
  * (`/root/reference/app/main.py:109-330`; SURVEY.md §2.4 A1-A5, T1-T3).
  *
  * The loop's dict-probe-then-insert becomes: dedup within the batch by
  * first appearance (min record-sequence), anti-join against the existing
  * dimension, dense id assignment continuing from the table's max id. Its
  * "queue an UPDATE per record, apply in order" becomes last-by-sequence
  * aggregates (max_by) — deterministic where the reference's
  * UPDATE..FROM VALUES with duplicate keys is not (SURVEY §2 SNK2 note).
  */
object Transform {

  /** Current state of the target tables, as read by a sync cycle. */
  case class State(
      wallet: DataFrame,
      collection: DataFrame,
      asset: DataFrame,
      assetExt: DataFrame,
      nextWalletId: Long,
      nextCollectionId: Long,
      nextAssetId: Long,
      nextAssetTxId: Long,
      nextAssetMintTxId: Long)

  /** One period's delta: rows to append + the mutable tables both as
    * fully-updated contents (the recompute/spec view) and as keyed
    * upserts (changed + inserted rows only — what a MERGE sink stages;
    * `TableStore.mergeNext` and `writeNext` of these are equivalent by
    * construction). All fields are lazy plans; only what the sink uses
    * is ever computed.
    */
  case class Delta(
      walletInserts: DataFrame,
      collectionInserts: DataFrame,
      assetInserts: DataFrame,
      assetTxInserts: DataFrame,
      assetMintTxInserts: DataFrame,
      assetExtInserts: DataFrame,
      assetUpdated: DataFrame,     // full asset table after current_wallet_id LWW
      assetExtUpdated: DataFrame,  // full asset_ext table after latest-ptr LWW
      assetUpserts: DataFrame,     // changed existing + inserted asset rows
      assetExtUpserts: DataFrame)  // changed existing + inserted asset_ext rows

  /** Record-stream total order: block time, then pinned tiebreakers. */
  private val recordOrder =
    Seq(col("tx_time"), col("tx_id"), col("ma_id"), col("tx_out_id").asc_nulls_first)

  def apply(records: DataFrame, st: State): Delta = {
    val spark = records.sparkSession

    // ---- record sequence + wallet-key resolution (A1) ----------------------
    val r = SurrogateIds.withSequence(
      records
        .withColumn("stake_derived", stake_address(col("address")))
        .withColumn("wallet_key", coalesce(col("stake_derived"), col("address")))
        .withColumn("addr_type",
          when(col("address").isNull, lit(null).cast("string"))
            .when(col("stake_derived").isNotNull, lit("STAKE"))
            .otherwise(lit("ENTERPRISE")))
        .withColumn("is_mint", coalesce(col("is_mint_tx"), lit(false))), // T1 NULL trap
      "rec_seq", recordOrder)
      .localCheckpoint() // sequence is reused by every branch below; pin it

    // ---- new wallets (A1) --------------------------------------------------
    val walletCandidates = r
      .where(col("wallet_key").isNotNull)
      .groupBy(col("wallet_key"), col("addr_type"))
      .agg(min(col("rec_seq")).as("first_seq"))
      .join(st.wallet.select(col("address").as("wallet_key")), Seq("wallet_key"), "left_anti")
    val walletInserts = SurrogateIds.assign(
      walletCandidates, "id", st.nextWalletId, Seq(col("first_seq")))
      .select(col("id"), col("wallet_key").as("address"),
        col("addr_type").as("address_type"), lit(null).cast("int").as("user_id"))

    val walletIds = st.wallet.select(col("address"), col("id"))
      .unionByName(walletInserts.select(col("address"), col("id")))
      .withColumnRenamed("address", "w_key").withColumnRenamed("id", "wallet_id")

    // ---- new collections (A2) ----------------------------------------------
    val collectionCandidates = r
      .groupBy(col("policy_id"))
      .agg(min(col("rec_seq")).as("first_seq"))
      .join(st.collection.select(col("policy_id")), Seq("policy_id"), "left_anti")
    val collectionInserts = SurrogateIds.assign(
      collectionCandidates, "id", st.nextCollectionId, Seq(col("first_seq")))
      .select(col("id").cast("int").as("id"), col("policy_id"),
        lit(null).cast("string").as("name"))

    val collectionIds = st.collection.select(col("policy_id"), col("id"))
      .unionByName(collectionInserts.select(col("policy_id"), col("id")))
      .withColumnRenamed("id", "collection_id")

    // ---- new assets (A3): first record per fingerprint wins ----------------
    val firstPerAsset = r
      .groupBy(col("asset_fingerprint"))
      .agg(
        min(col("rec_seq")).as("first_seq"),
        min_by(
          struct(col("policy_id"), col("asset_name_hash"), col("wallet_key")),
          col("rec_seq")).as("f"))
      .select(col("asset_fingerprint"), col("first_seq"),
        col("f.policy_id").as("policy_id"),
        col("f.asset_name_hash").as("asset_name_hash"),
        col("f.wallet_key").as("first_wallet_key"))

    val assetCandidates = firstPerAsset
      .join(st.asset.select(col("fingerprint").as("asset_fingerprint")),
        Seq("asset_fingerprint"), "left_anti")
    val newAssetsRaw = SurrogateIds.assign(
      assetCandidates, "id", st.nextAssetId, Seq(col("first_seq")))

    // ---- fact routing (T1) + fact ids (T3) ---------------------------------
    val mints     = r.where(col("is_mint"))
    val transfers = r.where(!col("is_mint"))

    // rec_seq already encodes the pinned total order — sorting by the single
    // long is cheaper than re-sorting by the 4-column record order
    val mintFacts = SurrogateIds.assign(mints, "id", st.nextAssetMintTxId, Seq(col("rec_seq")))
    val txFacts   = SurrogateIds.assign(transfers, "id", st.nextAssetTxId, Seq(col("rec_seq")))

    val assetIds = st.asset.select(col("fingerprint").as("asset_fingerprint"), col("id"))
      .unionByName(newAssetsRaw.select(col("asset_fingerprint"), col("id")))
      .withColumnRenamed("id", "asset_id")

    // ---- asset inserts (A3 projection) -------------------------------------
    val assetInserts = newAssetsRaw
      .join(collectionIds, Seq("policy_id"))
      // current_wallet_id: last transfer in batch, else first record's wallet (A4)
      .join(
        transfers.groupBy(col("asset_fingerprint"))
          .agg(max_by(col("wallet_key"), col("rec_seq")).as("last_transfer_key")),
        Seq("asset_fingerprint"), "left")
      .withColumn("cw_key", coalesce(col("last_transfer_key"), col("first_wallet_key")))
      .join(walletIds, col("cw_key") === col("w_key"), "left")
      .select(
        col("id"),
        col("collection_id").cast("int").as("collection_id"),
        concat_ws(".", col("policy_id"), col("asset_name_hash")).as("hash"),
        hex_to_string(col("asset_name_hash")).as("name"),
        col("asset_fingerprint").as("fingerprint"),
        col("wallet_id").as("current_wallet_id"))

    // ---- fact-row construction (T2) ----------------------------------------
    val assetMintTxInserts = mintFacts
      .join(assetIds, Seq("asset_fingerprint"))
      .join(walletIds, col("wallet_key") === col("w_key"), "left")
      .select(col("id"), col("asset_id"), col("wallet_id"),
        col("quantity"), col("tx_hash"), col("tx_time"),
        col("image"), col("metadata"), col("files"))

    val assetTxInserts = txFacts
      .join(assetIds, Seq("asset_fingerprint"))
      .join(walletIds, col("wallet_key") === col("w_key"), "left")
      .select(col("id"), col("asset_id"), col("wallet_id"),
        col("quantity"), col("tx_hash"), col("tx_time"))

    // ---- current_wallet_id LWW for existing assets (A4) --------------------
    val lastTransfer = txFacts
      .join(assetIds, Seq("asset_fingerprint"))
      .groupBy(col("asset_id"))
      .agg(max_by(col("wallet_key"), col("rec_seq")).as("lw_key"))
      .join(walletIds, col("lw_key") === col("w_key"), "left")
      .select(col("asset_id"), col("wallet_id").as("new_cw"), lit(true).as("has_lw"))

    // An explicit has-update marker, not coalesce(new_cw, current): the
    // reference queues `UPDATE current_wallet_id = <resolved>` for every asset
    // with a transfer this batch, so a transfer whose wallet key resolves to
    // NULL must overwrite (pantasia main.py A4) rather than silently keep the
    // stale owner.
    val assetUpdated = st.asset
      .join(lastTransfer, st.asset("id") === lastTransfer("asset_id"), "left")
      .select(st.asset("id"), col("collection_id"), col("hash"), col("name"),
        col("fingerprint"),
        when(col("has_lw"), col("new_cw")).otherwise(col("current_wallet_id"))
          .as("current_wallet_id"))
      .unionByName(assetInserts)

    // ---- asset_ext inserts + latest-pointer LWW (A5) -----------------------
    // qualifying: positive-quantity mints bump latest_mint_tx_id; transfers
    // bump latest_tx_id; burns (qty<0 mints) never touch asset_ext.
    val mintPointer = mintFacts.where(col("quantity") > 0)
      .join(assetIds, Seq("asset_fingerprint"))
      .groupBy(col("asset_id")).agg(max(col("id")).as("b_mint"))
    val txPointer = txFacts
      .join(assetIds, Seq("asset_fingerprint"))
      .groupBy(col("asset_id")).agg(max(col("id")).as("b_tx"))

    val batchPointers = mintPointer
      .join(txPointer, Seq("asset_id"), "full")

    val extExisting = st.assetExt.select(col("asset_id")).withColumn("has_ext", lit(true))

    val assetExtInserts = batchPointers
      .join(extExisting, Seq("asset_id"), "left_anti")
      .select(col("asset_id").as("id"), col("asset_id"),
        col("b_mint").as("latest_mint_tx_id"), col("b_tx").as("latest_tx_id"))

    val assetExtUpdated = st.assetExt
      .join(batchPointers, Seq("asset_id"), "left")
      .select(col("id"), col("asset_id"),
        coalesce(col("b_mint"), col("latest_mint_tx_id")).as("latest_mint_tx_id"),
        coalesce(col("b_tx"), col("latest_tx_id")).as("latest_tx_id"))
      .unionByName(assetExtInserts)

    // ---- MERGE-shaped upserts (changed existing rows + inserts) ------------
    // Inner-join variants of the two LEFT joins above: exactly the rows a
    // keyed MERGE would write. lastTransfer/batchPointers only carry
    // pre-period asset ids into these joins (new assets enter via the
    // insert sets), so upserts ∪ untouched == the full recomputed tables.
    val assetUpserts = st.asset
      .join(lastTransfer, st.asset("id") === lastTransfer("asset_id"))
      .select(st.asset("id"), col("collection_id"), col("hash"), col("name"),
        col("fingerprint"), col("new_cw").as("current_wallet_id"))
      .unionByName(assetInserts)

    val assetExtUpserts = st.assetExt
      .join(batchPointers, Seq("asset_id"))
      .select(col("id"), col("asset_id"),
        coalesce(col("b_mint"), col("latest_mint_tx_id")).as("latest_mint_tx_id"),
        coalesce(col("b_tx"), col("latest_tx_id")).as("latest_tx_id"))
      .unionByName(assetExtInserts)

    Delta(walletInserts, collectionInserts, assetInserts, assetTxInserts,
      assetMintTxInserts, assetExtInserts, assetUpdated, assetExtUpdated,
      assetUpserts, assetExtUpserts)
  }
}
