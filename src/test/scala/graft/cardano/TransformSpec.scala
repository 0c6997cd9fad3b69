package graft.cardano

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Focused unit tests of the A4 last-write-wins semantics
  * (`/root/reference/app/main.py` queues `UPDATE current_wallet_id = <resolved>`
  * for every asset transferred in the batch — including when the resolved
  * wallet is NULL, e.g. a tx_out with no address). A coalesce-based fallback
  * would silently keep the stale owner; the transform must use an explicit
  * has-update marker instead.
  */
class TransformSpec extends AnyFunSuite with SparkTest {

  private val recordsSchema = StructType(Seq(
    StructField("policy_id", StringType),
    StructField("asset_fingerprint", StringType),
    StructField("asset_name_hash", StringType),
    StructField("tx_hash", StringType),
    StructField("quantity", DecimalType(20, 0)),
    StructField("address", StringType),
    StructField("is_mint_tx", BooleanType),
    StructField("tx_time", TimestampType),
    StructField("image", StringType),
    StructField("files", StringType),
    StructField("metadata", StringType),
    StructField("ma_id", LongType),
    StructField("tx_id", LongType),
    StructField("tx_out_id", LongType)))

  private def df(schema: StructType, rows: Seq[Any]*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq)), schema)

  private def transfer(fp: String, address: String, txId: Long): Seq[Any] =
    Seq("aa" * 28, fp, "4e4654", "cc" * 32, new java.math.BigDecimal(1),
      address, false, Timestamp.valueOf("2021-03-02 10:00:00"),
      null, null, null, 1L, txId, txId * 10)

  private def state(assets: Seq[Any]*): Transform.State = Transform.State(
    wallet = df(Schemas.wallet,
      Seq(7L, "addr_w7", "ENTERPRISE", null),
      Seq(8L, "addr_w8", "ENTERPRISE", null)),
    collection = df(Schemas.collection, Seq(1, "aa" * 28, null)),
    asset = df(Schemas.asset, assets: _*),
    assetExt = df(Schemas.assetExt, Seq(1L, 1L, null, null)),
    nextWalletId = 9L, nextCollectionId = 2L, nextAssetId = 2L,
    nextAssetTxId = 1L, nextAssetMintTxId = 1L)

  private def currentWallets(d: Transform.Delta): Map[Long, Any] =
    d.assetUpdated.collect()
      .map(r => r.getLong(0) -> r.get(5)).toMap

  test("A4: a transfer whose address is NULL overwrites current_wallet_id with NULL") {
    val st = state(Seq(1L, 1, "h1", "n1", "fpA", 7L))
    val d = Transform(df(recordsSchema, transfer("fpA", null, 100L)), st)
    assert(currentWallets(d) == Map(1L -> null),
      "last transfer resolved to no wallet: the UPDATE must still apply")
  }

  test("A4: last transfer in record order wins; untouched assets keep their owner") {
    val st = state(
      Seq(1L, 1, "h1", "n1", "fpA", 7L),
      Seq(2L, 1, "h2", "n2", "fpB", 7L))
    val d = Transform(df(recordsSchema,
      transfer("fpA", "addr_w8", 100L),
      transfer("fpA", null, 101L)), st) // later tx_id: null owner wins
    assert(currentWallets(d) == Map(1L -> null, 2L -> 7L))
  }

  test("A4: a resolvable last transfer updates the owner") {
    val st = state(Seq(1L, 1, "h1", "n1", "fpA", 7L))
    val d = Transform(df(recordsSchema,
      transfer("fpA", null, 100L),
      transfer("fpA", "addr_w8", 101L)), st)
    assert(currentWallets(d) == Map(1L -> 8L))
  }
}
