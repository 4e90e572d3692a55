package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PpmDecoder

/** Byte-level cases for the real P6 parser — fed raw hand-built arrays,
  * independent of the m04 synthesis (which the oracle cross-checks).
  */
class PpmDecoderSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  test("parses a minimal P6 with exact pixel payload") {
    val pix = Array.tabulate[Byte](2 * 3 * 3)(i => (i * 7).toByte)
    val img = ascii("P6\n2 3\n255\n") ++ pix
    assert(PpmDecoder.parse(img) == Some((2, 3, 255, md5hex(pix))))
  }

  test("tolerates comments and arbitrary whitespace in the header") {
    val pix = Array.fill[Byte](1 * 1 * 3)(42)
    val img = ascii("P6 # inline\n#full line\n  1\t\r\n# again\n 1 \n 255 ") ++ pix
    assert(PpmDecoder.parse(img) == Some((1, 1, 255, md5hex(pix))))
  }

  test("hashes exactly w*h*3 bytes, ignoring trailing junk") {
    val pix = Array.fill[Byte](3)(9)
    val img = ascii("P6\n1 1\n255\n") ++ pix ++ ascii("TRAILING")
    assert(PpmDecoder.parse(img) == Some((1, 1, 255, md5hex(pix))))
  }

  test("rejects bad magic, truncated headers, and short pixel data") {
    assert(PpmDecoder.parse(ascii("P5\n1 1\n255\nabc")).isEmpty) // not P6
    assert(PpmDecoder.parse(ascii("P6")).isEmpty)               // no dims
    assert(PpmDecoder.parse(ascii("P6\n2 2\n255\nxy")).isEmpty) // 2 of 12 bytes
    assert(PpmDecoder.parse(ascii("P6\n1 x\n255\nabc")).isEmpty) // non-digit
    assert(PpmDecoder.parse(Array.empty[Byte]).isEmpty)
  }

  test("rejects an absurd width that would overflow the pixel count") {
    assert(PpmDecoder.parse(ascii("P6\n1234567890123 1\n255\nabc")).isEmpty)
  }
}
