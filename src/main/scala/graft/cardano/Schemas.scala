package graft.cardano

import org.apache.spark.sql.types._

/** Source (cardano-db-sync) and target (pantasia) schemas.
  *
  * Source: every column the reference's queries read
  * (`/root/reference/app/db/postgres.py:264-268,332-395`; SURVEY.md §1.4).
  * Target: the 7-table DDL (`/root/reference/app/db/postgres.py:94-154`;
  * SURVEY.md §1.3).
  */
object Schemas {

  // ---- source --------------------------------------------------------------

  val block: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("time", TimestampType, nullable = false)))

  val tx: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("hash", BinaryType, nullable = false),
    StructField("block_id", LongType, nullable = false)))

  val txOut: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("tx_id", LongType, nullable = false),
    StructField("address", StringType, nullable = false),
    StructField("stake_address_id", LongType, nullable = true)))

  val maTxOut: StructType = StructType(Seq(
    StructField("ident", LongType, nullable = false),
    StructField("quantity", DecimalType(20, 0), nullable = false),
    StructField("tx_out_id", LongType, nullable = false)))

  val maTxMint: StructType = StructType(Seq(
    StructField("ident", LongType, nullable = false),
    StructField("quantity", DecimalType(20, 0), nullable = false),
    StructField("tx_id", LongType, nullable = false)))

  val multiAsset: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("policy", BinaryType, nullable = false),
    StructField("name", BinaryType, nullable = false),
    StructField("fingerprint", StringType, nullable = false)))

  val stakeAddress: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("view", StringType, nullable = false)))

  val txMetadata: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("key", DecimalType(20, 0), nullable = false),
    StructField("json", StringType, nullable = false),
    StructField("tx_id", LongType, nullable = false)))

  val sourceTables: Map[String, StructType] = Map(
    "block" -> block, "tx" -> tx, "tx_out" -> txOut, "ma_tx_out" -> maTxOut,
    "ma_tx_mint" -> maTxMint, "multi_asset" -> multiAsset,
    "stake_address" -> stakeAddress, "tx_metadata" -> txMetadata)

  // ---- target --------------------------------------------------------------

  val wallet: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("address", StringType, nullable = false),
    StructField("address_type", StringType, nullable = false), // STAKE | ENTERPRISE
    StructField("user_id", IntegerType, nullable = true)))     // app-owned, never set

  val collection: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("policy_id", StringType, nullable = false),
    StructField("name", StringType, nullable = true)))         // never set by sync

  val asset: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("collection_id", IntegerType, nullable = false),
    StructField("hash", StringType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("fingerprint", StringType, nullable = false),
    StructField("current_wallet_id", LongType, nullable = true)))

  val assetTx: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("asset_id", LongType, nullable = false),
    StructField("wallet_id", LongType, nullable = true),
    StructField("quantity", DecimalType(20, 0), nullable = false),
    StructField("tx_hash", StringType, nullable = false),
    StructField("tx_time", TimestampType, nullable = false)))

  val assetMintTx: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("asset_id", LongType, nullable = false),
    StructField("wallet_id", LongType, nullable = true),       // null for burns
    StructField("quantity", DecimalType(20, 0), nullable = false),
    StructField("tx_hash", StringType, nullable = false),
    StructField("tx_time", TimestampType, nullable = false),
    StructField("image", StringType, nullable = true),
    StructField("metadata", StringType, nullable = true),      // canonical JSON
    StructField("files", StringType, nullable = true)))        // canonical JSON

  val assetExt: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),             // = asset_id
    StructField("asset_id", LongType, nullable = false),
    StructField("latest_mint_tx_id", LongType, nullable = true),
    StructField("latest_tx_id", LongType, nullable = true)))

  /** App-owned user accounts (`app/db/postgres.py:96-104`): the sync
    * never writes a row here, but the table is part of the 7-table DDL
    * bootstrap because it is the FK target of `wallet.user_id`
    * (`postgres.py:243`) — a user of the reference expects it to exist.
    */
  val user: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("pfp_asset_id", LongType, nullable = true),
    StructField("alias", StringType, nullable = false),       // varchar(16) UNIQUE
    StructField("created_on", TimestampType, nullable = false),
    StructField("modified", TimestampType, nullable = false),
    StructField("last_login", TimestampType, nullable = true)))

  val targetTables: Map[String, StructType] = Map(
    "user" -> user, "wallet" -> wallet, "collection" -> collection,
    "asset" -> asset, "asset_tx" -> assetTx, "asset_mint_tx" -> assetMintTx,
    "asset_ext" -> assetExt)
}
