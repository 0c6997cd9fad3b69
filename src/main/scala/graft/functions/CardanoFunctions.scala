package graft.functions

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's three scalar functions (SURVEY.md §2.7 S2/S4/S5), as pure
  * cores + `udf()` wrappers. Pure cores are property-tested in
  * CardanoFunctionsSpec.
  */
object CardanoFunctions {

  // --------------------------------------------------------------------------
  // S2: Postgres encode(bytea, 'escape').
  // Reference use: the CIP-25 metadata JSON key for an asset name
  // (`/root/reference/app/db/postgres.py:336,352`).
  // Per Postgres docs: zero bytes and high-bit-set bytes become \nnn octal;
  // backslash is doubled; everything else (incl. control chars) is raw.
  // --------------------------------------------------------------------------
  def escapeEncode(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val sb = new StringBuilder(bytes.length)
    for (b <- bytes) {
      val u = b & 0xff
      if (u == 0 || u >= 0x80) sb.append(f"\\$u%03o")
      else if (u == '\\') sb.append("\\\\")
      else sb.append(u.toChar)
    }
    sb.toString
  }

  // --------------------------------------------------------------------------
  // S4: hex_to_string (`/root/reference/app/misc.py:15-23`).
  // hex -> bytes; NUL -> space; strict UTF-8 decode; on failure return the
  // hex string unchanged. The reference's quote-doubling is SQL-literal
  // escaping that cancels out on insert (stored value keeps a single quote)
  // so it is intentionally NOT replicated.
  // --------------------------------------------------------------------------
  def hexToString(hexStr: String): String = {
    if (hexStr == null) return null
    parseHex(hexStr) match {
      case None => hexStr
      case Some(raw) =>
        val replaced = raw.map(b => if (b == 0) ' '.toByte else b)
        try {
          val dec = StandardCharsets.UTF_8.newDecoder()
            .onMalformedInput(CodingErrorAction.REPORT)
            .onUnmappableCharacter(CodingErrorAction.REPORT)
          dec.decode(ByteBuffer.wrap(replaced)).toString
        } catch { case _: CharacterCodingException => hexStr }
    }
  }

  private def parseHex(s: String): Option[Array[Byte]] = {
    if (s.length % 2 != 0) return None
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(s.charAt(2 * i), 16)
      val lo = Character.digit(s.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0) return None
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    Some(out)
  }

  // --------------------------------------------------------------------------
  // S5: get_staking_address (`/root/reference/app/cardano.py:12-27`).
  // Shelley payment address -> mainnet reward address when the delegation
  // part is a *key* hash (CIP-19 header types 0 and 1); None for
  // pointer/script delegation, enterprise, Byron, and non-`addr` strings.
  // The reference raises on malformed bech32 (crashing the batch); we map
  // malformed input to null instead — documented deviation.
  // --------------------------------------------------------------------------
  def stakeAddress(address: String): String = {
    if (address == null || !address.startsWith("addr")) return null
    Bech32.decode(address) match {
      case Some((hrp, payload))
          if (hrp == "addr" || hrp == "addr_test") && payload.length == 57 =>
        val addrType = (payload(0) & 0xf0) >>> 4
        if (addrType == 0 || addrType == 1) {
          val stakePayload = new Array[Byte](29)
          stakePayload(0) = 0xe1.toByte // reward address, key hash, mainnet
          System.arraycopy(payload, 29, stakePayload, 1, 28)
          Bech32.encode("stake", stakePayload)
        } else null
      case _ => null
    }
  }

  // ---- Column-level API ----------------------------------------------------

  private val hexToStringUdf   = udf(hexToString _)
  private val stakeAddressUdf  = udf(stakeAddress _)
  private val escapeEncodeUdf  = udf(escapeEncode _)

  def hex_to_string(c: Column): Column  = hexToStringUdf(c)
  def stake_address(c: Column): Column  = stakeAddressUdf(c)
  def escape_encode(c: Column): Column  = escapeEncodeUdf(c)

  /** S1: Postgres encode(bytea,'hex') is lowercase; Spark's hex() is upper. */
  def lhex(c: Column): Column = lower(hex(c))
}
