package graft.functions

/** Bech32 encoding/decoding per BIP-173 (public spec,
  * https://github.com/bitcoin/bips/blob/master/bip-0173.mediawiki).
  *
  * Cardano Shelley addresses (CIP-19) are bech32-encoded with HRPs
  * `addr`/`addr_test`/`stake`/`stake_test` and no witness-version byte —
  * the data part is just the base32'd payload bytes.
  */
object Bech32 {

  private val Charset = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
  private val Gen     = Array(0x3b6a57b2, 0x26508e6d, 0x1ea119fa, 0x3d4233dd, 0x2a1462b3)

  private def polymod(values: Iterable[Int]): Int = {
    var chk = 1
    for (v <- values) {
      val top = chk >>> 25
      chk = ((chk & 0x1ffffff) << 5) ^ v
      var i = 0
      while (i < 5) {
        if (((top >>> i) & 1) != 0) chk ^= Gen(i)
        i += 1
      }
    }
    chk
  }

  private def hrpExpand(hrp: String): Seq[Int] =
    hrp.map(_.toInt >>> 5) ++ Seq(0) ++ hrp.map(_.toInt & 31)

  private def verifyChecksum(hrp: String, data: Seq[Int]): Boolean =
    polymod(hrpExpand(hrp) ++ data) == 1

  private def createChecksum(hrp: String, data: Seq[Int]): Seq[Int] = {
    val pm = polymod(hrpExpand(hrp) ++ data ++ Seq(0, 0, 0, 0, 0, 0)) ^ 1
    (0 until 6).map(i => (pm >>> (5 * (5 - i))) & 31)
  }

  /** 8-bit bytes -> 5-bit groups (with padding), for encoding. */
  private def to5Bit(bytes: Array[Byte]): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var acc = 0; var bits = 0
    for (b <- bytes) {
      acc = (acc << 8) | (b & 0xff)
      bits += 8
      while (bits >= 5) { bits -= 5; out += ((acc >>> bits) & 31) }
    }
    if (bits > 0) out += ((acc << (5 - bits)) & 31)
    out.result()
  }

  /** 5-bit groups -> 8-bit bytes, rejecting non-zero padding. */
  private def to8Bit(data: Seq[Int]): Option[Array[Byte]] = {
    val out = Array.newBuilder[Byte]
    var acc = 0; var bits = 0
    for (v <- data) {
      acc = (acc << 5) | v
      bits += 5
      while (bits >= 8) { bits -= 8; out += ((acc >>> bits) & 0xff).toByte }
    }
    if (bits >= 5 || ((acc << (8 - bits)) & 0xff) != 0) None else Some(out.result())
  }

  /** Decode `s` into (hrp, payload bytes). None on any malformation. */
  def decode(s: String): Option[(String, Array[Byte])] = {
    if (s.length < 8 || s.length > 1023) return None
    if (s.exists(c => c < 33 || c > 126)) return None
    val hasLower = s.exists(_.isLower)
    val hasUpper = s.exists(_.isUpper)
    if (hasLower && hasUpper) return None
    val lower = s.toLowerCase
    val pos = lower.lastIndexOf('1')
    if (pos < 1 || pos + 7 > lower.length) return None
    val hrp = lower.substring(0, pos)
    val dataPart = lower.substring(pos + 1)
    val data = dataPart.map(Charset.indexOf(_))
    if (data.contains(-1)) return None
    if (!verifyChecksum(hrp, data)) return None
    to8Bit(data.dropRight(6)).map(bytes => (hrp, bytes))
  }

  /** Encode payload bytes under `hrp`. */
  def encode(hrp: String, payload: Array[Byte]): String = {
    val data = to5Bit(payload)
    val full = data ++ createChecksum(hrp, data)
    hrp + "1" + full.map(Charset.charAt).mkString
  }
}
