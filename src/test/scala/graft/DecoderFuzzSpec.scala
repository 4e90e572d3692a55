package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PpmDecoder, WavDecoder}

/** The never-throws contract, enforced by construction: both real
  * decoders (m04's P6, m05's RIFF/WAVE) promise that malformed input
  * yields None — one corrupt blob must not fail an intake batch. The
  * hand-built rejection cases in PpmDecoderSpec/WavDecoderSpec cover the
  * KNOWN malformations; this spec covers the unknown ones by seeded
  * fuzzing: thousands of random mutations of valid payloads — byte
  * flips, truncations, and 32-bit field splices aimed at the length
  * arithmetic — must parse to Some or None, never throw. The targeted
  * cases pin the two historical gaps: a RIFF chunk size near 2^32 that
  * an Int step would turn into a zero/negative advance (infinite loop /
  * StringIndexOutOfBounds), and P6 header dims whose w*h*3 overflows
  * Int into a negative byte count (copyOfRange throw).
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32At(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** A canonical valid WAV: RIFF/WAVE + LIST + fmt(PCM 2ch 16-bit) +
    * odd-sized data (exercises the pad arithmetic under mutation).
    */
  private val validWav: Array[Byte] = {
    def le16(x: Int) = Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)
    def le32(x: Int) = Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
      ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
    def tag(s: String) = s.getBytes("US-ASCII").toSeq
    val pcm = Array.tabulate[Byte](37)(i => (i * 11).toByte).toSeq
    val body = tag("WAVE") ++
      (tag("LIST") ++ le32(4) ++ tag("INFO")) ++
      (tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
        le32(44100 * 4) ++ le16(4) ++ le16(16)) ++
      (tag("data") ++ le32(pcm.length) ++ pcm ++ Seq(0.toByte))
    (tag("RIFF") ++ le32(body.length) ++ body).toArray
  }

  private val validPpm: Array[Byte] = {
    val pix = Array.tabulate[Byte](5 * 4 * 3)(i => (i * 13).toByte)
    ascii("P6\n# fuzz seed\n5 4\n255\n") ++ pix
  }

  private def never[T](what: String, parse: Array[Byte] => Option[T],
                       payload: Array[Byte]): Unit =
    try parse(payload)
    catch {
      case e: Throwable =>
        fail(s"$what threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
          s"on ${payload.take(64).map(b => f"${b & 0xff}%02x").mkString}")
    }

  private def fuzz[T](what: String, parse: Array[Byte] => Option[T],
                      valid: Array[Byte]): Unit = {
    val rnd = new scala.util.Random(0x5eed + valid.length)
    (0 until 4000).foreach { _ =>
      val m = valid.clone()
      rnd.nextInt(3) match {
        case 0 => // byte flips (1..8 of them)
          (0 to rnd.nextInt(8)).foreach { _ =>
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          }
          never(what, parse, m)
        case 1 => // truncate anywhere (including length 0)
          never(what, parse, m.take(rnd.nextInt(m.length + 1)))
        case 2 => // splice an extreme u32 over any 4-byte window — the
          // attack shape for every length/size field either format has
          val extremes = Seq(0L, 1L, 0x7fffffffL, 0x80000000L,
            0xfffffff0L, 0xfffffff8L, 0xffffffffL,
            rnd.nextLong() & 0xffffffffL)
          le32At(m, rnd.nextInt(m.length - 3),
            extremes(rnd.nextInt(extremes.size)))
          never(what, parse, m)
      }
    }
  }

  test("WavDecoder never throws under 4000 seeded mutations") {
    fuzz("WavDecoder", WavDecoder.parse, validWav)
  }

  test("PpmDecoder never throws under 4000 seeded mutations") {
    fuzz("PpmDecoder", PpmDecoder.parse, validPpm)
  }

  test("WAV chunk size near 2^32 returns None (no loop, no throw)") {
    // craft: valid header, then a chunk whose declared size is
    // 0xFFFFFFF8 — an Int step would compute 8 + (-8) = 0 (infinite
    // loop); the Long walk clamps and rejects
    val m = validWav.clone()
    le32At(m, 16, 0xfffffff8L) // the LIST chunk's size field
    assert(WavDecoder.parse(m).isEmpty)
    le32At(m, 16, 0x80000000L) // negative-Int size: tag(p) once threw
    assert(WavDecoder.parse(m).isEmpty)
  }

  test("P6 dims overflowing w*h*3 past Int return None") {
    // 99999999 x 99999999 x 3 = 3e16: as Int this wrapped negative and
    // passed the fit check; the Long count rejects it against the
    // actual payload length
    val img = ascii("P6\n99999999 99999999\n255\n") ++
      Array.fill[Byte](32)(1)
    assert(PpmDecoder.parse(img).isEmpty)
  }

  test("valid seeds still parse after the hardening") {
    assert(WavDecoder.parse(validWav).contains(
      (2, 44100, 16, 9L, // 37 bytes / blockAlign 4 = 9 frames... (37/4)
        java.security.MessageDigest.getInstance("MD5")
          .digest(Array.tabulate[Byte](37)(i => (i * 11).toByte))
          .map(x => f"${x & 0xff}%02x").mkString)))
    assert(PpmDecoder.parse(validPpm).isDefined)
  }
}
