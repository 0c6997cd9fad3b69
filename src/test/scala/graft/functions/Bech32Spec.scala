package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** BIP-173 conformance + seeded roundtrip properties. */
class Bech32Spec extends AnyFunSuite {

  // Valid test strings from BIP-173 (public spec).
  val validVectors = Seq(
    "A12UEL5L",
    "a12uel5l",
    "an83characterlonghumanreadablepartthatcontainsthenumber1andtheexcludedcharactersbio1tt5tgs",
    "abcdef1qpzry9x8gf2tvdw0s3jn54khce6mua7lmqqqxw",
    "split1checkupstagehandshakeupstreamerranterredcaperred2y9e3w")

  test("BIP-173 valid vectors decode") {
    validVectors.foreach { v =>
      assert(Bech32.decode(v).isDefined, s"should decode: $v")
    }
  }

  test("BIP-173 invalid vectors are rejected") {
    val invalid = Seq(
      " 1nwldj5",               // HRP char out of range
      "pzry9x0s0muk",           // no separator
      "1pzry9x0s0muk",          // empty HRP
      "x1b4n0q5v",              // invalid data char
      "li1dgmt3",               // too-short checksum
      "A1G7SGD8",               // checksum error
      "10a06t8",                // empty HRP
      "1qzzfhee",               // empty HRP
      "A12UeL5L")               // mixed case
    invalid.foreach { v => assert(Bech32.decode(v).isEmpty, s"should reject: $v") }
  }

  test("roundtrip: encode then decode recovers hrp + payload (500 seeded cases)") {
    val rnd = new Random(42)
    (1 to 500).foreach { _ =>
      val payload = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val hrp = Seq("addr", "stake", "addr_test")(rnd.nextInt(3))
      val enc = Bech32.encode(hrp, payload)
      val dec = Bech32.decode(enc)
      assert(dec.isDefined, s"roundtrip failed for ${payload.toSeq}")
      assert(dec.get._1 == hrp)
      assert(dec.get._2.toSeq == payload.toSeq)
    }
  }

  test("checksum catches single-char corruption (200 seeded cases)") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val payload = Array.fill(29)(rnd.nextInt(256).toByte)
      val s = Bech32.encode("stake", payload)
      val pos = 6 + rnd.nextInt(s.length - 6) // stay in the data part
      val charset = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
      val cur = s(pos)
      val repl = charset((charset.indexOf(cur).max(0) + 1) % 32)
      if (repl != cur) {
        val corrupted = s.updated(pos, repl)
        assert(Bech32.decode(corrupted).isEmpty, s"corruption undetected in $corrupted")
      }
    }
  }
}
