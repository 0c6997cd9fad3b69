package graft.cardano

import java.sql.Timestamp
import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Row, SparkSession}

import graft.functions.Bech32

/** Mini Cardano source fixture implementing the 10 scenarios of
  * FIXTURES.md §A. Written as parquet (one file per source table) so
  * MainQuery/SyncDriver read it exactly like production input.
  */
object Fixture {

  // --- addresses (CIP-19 payloads built from public spec) -------------------
  private def bytes(n: Int, v: Int) = Array.fill(n)(v.toByte)

  val paymentHash1: Array[Byte] = bytes(28, 0x11)
  val paymentHash2: Array[Byte] = bytes(28, 0x33)
  val paymentHash3: Array[Byte] = bytes(28, 0x55)
  val stakeHash1: Array[Byte]   = bytes(28, 0x22)
  val stakeHash2: Array[Byte]   = bytes(28, 0x44)

  /** base address (type 0, mainnet): payment key + stake key */
  def baseAddr(payment: Array[Byte], stake: Array[Byte]): String =
    Bech32.encode("addr", Array(0x01.toByte) ++ payment ++ stake)

  /** enterprise address (type 6, mainnet): payment key only */
  def enterpriseAddr(payment: Array[Byte]): String =
    Bech32.encode("addr", Array(0x61.toByte) ++ payment)

  /** reward address (type 14, mainnet, key hash) */
  def stakeAddr(stake: Array[Byte]): String =
    Bech32.encode("stake", Array(0xe1.toByte) ++ stake)

  val addrA1: String = baseAddr(paymentHash1, stakeHash1)
  val addrA2: String = baseAddr(paymentHash2, stakeHash2)
  val addrE1: String = enterpriseAddr(paymentHash3)
  val stake1: String = stakeAddr(stakeHash1)
  val stake2: String = stakeAddr(stakeHash2)

  // --- policies / names / fingerprints --------------------------------------
  val polX: Array[Byte] = bytes(28, 0xAA)
  val polY: Array[Byte] = bytes(28, 0xBB)
  val polXHex: String = polX.map(b => f"${b & 0xff}%02x").mkString
  val polYHex: String = polY.map(b => f"${b & 0xff}%02x").mkString

  val nameA: Array[Byte] = "NFT-A".getBytes("UTF-8")
  val nameB: Array[Byte] = "NFT-B".getBytes("UTF-8")
  val nameC: Array[Byte] = "TOK".getBytes("UTF-8")
  val nameD: Array[Byte] = Array(0xFF.toByte, 0x41.toByte)          // invalid UTF-8
  val nameE: Array[Byte] = Array(0x00.toByte, 0x27.toByte, 0x42.toByte) // NUL + quote
  val nameF: Array[Byte] = "NFT-F".getBytes("UTF-8")

  def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  val fpA = "asset1qqqa"; val fpB = "asset1qqqb"; val fpC = "asset1qqqc"
  val fpD = "asset1qqqd"; val fpE = "asset1qqqe"; val fpF = "asset1qqqf"

  def txHashBytes(i: Int): Array[Byte] = bytes(32, i)
  def txHashHex(i: Int): String = hex(txHashBytes(i))

  private def ts(s: String) = Timestamp.valueOf(s)
  private def dec(v: Long) = new JBigDecimal(v)

  // --- metadata JSON (CIP-25; keys are hex policy + escape-encoded name) ----
  val meta1: String =
    s"""{"$polXHex": {"NFT-A": {"name": "Asset A", "image": "ipfs://imgA", "files": [{"src": "ipfs://fA", "mediaType": "image/png"}]}}}"""
  val meta2: String =
    s"""{"$polXHex": {"NFT-B": {"image": "ipfs://imgB"}}}"""
  val meta7: String =
    s"""{"$polYHex": {"\\\\377A": {"image": "ipfs://imgD"}, "\\\\000'B": {"image": "ipfs://imgE"}}}"""

  /** Write all 8 source tables under `dir`. */
  def write(spark: SparkSession, dir: String): Unit = {
    def save(name: String, rows: Seq[Row]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), Schemas.sourceTables(name))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")

    // blocks: b0 pre-genesis; b1..b8 activity; b9-b11 empty tail (tip lag)
    save("block", Seq(
      Row(100L, ts("2021-03-01 20:00:00")),
      Row(101L, ts("2021-03-02 10:00:00")),
      Row(102L, ts("2021-03-02 10:30:00")),
      Row(103L, ts("2021-03-02 11:30:00")),
      Row(104L, ts("2021-03-02 13:47:00")), // exactly on a 120-min boundary
      Row(105L, ts("2021-03-02 13:48:00")),
      Row(106L, ts("2021-03-02 14:10:00")),
      Row(107L, ts("2021-03-02 14:30:00")),
      Row(108L, ts("2021-03-02 16:00:00")),
      Row(109L, ts("2021-03-02 17:00:00")),
      Row(110L, ts("2021-03-02 17:30:00")),
      Row(111L, ts("2021-03-02 18:00:00"))))

    save("tx", Seq(
      Row(10L, txHashBytes(10), 100L), // pre-genesis mint of F
      Row(11L, txHashBytes(11), 101L),
      Row(12L, txHashBytes(12), 102L),
      Row(13L, txHashBytes(13), 103L),
      Row(14L, txHashBytes(14), 104L),
      Row(15L, txHashBytes(15), 105L),
      Row(16L, txHashBytes(16), 106L),
      Row(17L, txHashBytes(17), 107L),
      Row(18L, txHashBytes(18), 108L)))

    save("multi_asset", Seq(
      Row(1L, polX, nameA, fpA),
      Row(2L, polX, nameB, fpB),
      Row(3L, polY, nameC, fpC),
      Row(4L, polY, nameD, fpD),
      Row(5L, polY, nameE, fpE),
      Row(6L, polX, nameF, fpF)))

    save("stake_address", Seq(Row(1L, stake1), Row(2L, stake2)))

    save("tx_out", Seq(
      Row(5L, 10L, addrA1, 1L),        // pre-genesis F -> A1
      Row(21L, 11L, addrA1, 1L),       // mint A -> A1 (STAKE)
      Row(22L, 12L, addrE1, null),     // mint B + C -> E1 (ENTERPRISE, shared out)
      Row(31L, 13L, addrA2, 2L),       // transfer A -> A2
      Row(32L, 13L, addrA2, 2L),       // transfer F -> A2 (first-seen-by-transfer)
      Row(41L, 14L, addrA1, 1L),       // split C 60 -> A1
      Row(42L, 14L, addrA2, 2L),       // split C 40 -> A2
      Row(61L, 16L, addrA1, 1L),       // re-mint C 50 -> A1
      Row(71L, 17L, addrA2, 2L),       // mint D -> A2
      Row(72L, 17L, addrE1, null),     // mint E -> E1
      Row(81L, 18L, addrA1, 1L)))      // transfer D -> A1

    save("ma_tx_out", Seq(
      Row(6L, dec(1L), 5L),
      Row(1L, dec(1L), 21L),
      Row(2L, dec(1L), 22L),
      Row(3L, dec(100L), 22L),
      Row(1L, dec(1L), 31L),
      Row(6L, dec(1L), 32L),
      Row(3L, dec(60L), 41L),
      Row(3L, dec(40L), 42L),
      Row(3L, dec(50L), 61L),
      Row(4L, dec(1L), 71L),
      Row(5L, dec(1L), 72L),
      Row(4L, dec(1L), 81L)))

    save("ma_tx_mint", Seq(
      Row(6L, dec(1L), 10L),   // F minted pre-genesis
      Row(1L, dec(1L), 11L),
      Row(2L, dec(1L), 12L),
      Row(3L, dec(100L), 12L),
      Row(1L, dec(-1L), 15L),  // burn A
      Row(3L, dec(50L), 16L),  // FT top-up
      Row(4L, dec(1L), 17L),
      Row(5L, dec(1L), 17L)))

    save("tx_metadata", Seq(
      Row(1L, dec(721L), meta1, 11L),
      Row(2L, dec(721L), meta2, 12L),
      Row(3L, dec(674L), """{"msg": ["hello"]}""", 13L), // non-721: filtered
      Row(4L, dec(721L), meta7, 17L)))
  }
}
