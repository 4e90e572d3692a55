package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WavDecoder

/** WavDecoder — hand-assembled RIFF bytes for every parse branch: the
  * canonical 44-byte layout, chunk-walking past unknown chunks, the
  * odd-size word-alignment pad, data-before-fmt chunk order, and the
  * three rejection paths (bad magic, non-PCM, truncated data).
  */
class WavDecoderSpec extends AnyFunSuite {

  private def le16(x: Int): Seq[Byte] =
    Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)
  private def le32(x: Int): Seq[Byte] =
    Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
        ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
  private def tag(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq

  private def fmtChunk(channels: Int, rate: Int, bits: Int,
                       audioFormat: Int = 1): Seq[Byte] =
    tag("fmt ") ++ le32(16) ++ le16(audioFormat) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * bits / 8) ++
      le16(channels * bits / 8) ++ le16(bits)

  private def wav(chunks: Seq[Byte]*): Array[Byte] = {
    val body = tag("WAVE") ++ chunks.flatten
    (tag("RIFF") ++ le32(body.length) ++ body).toArray
  }

  private val pcm = "abcdefgh".getBytes("US-ASCII").toSeq
  private def dataChunk(payload: Seq[Byte], declared: Int = -1): Seq[Byte] =
    tag("data") ++ le32(if (declared < 0) payload.length else declared) ++
      payload

  private def md5hex(b: Seq[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b.toArray)
      .map(x => f"${x & 0xff}%02x").mkString

  test("canonical 44-byte PCM file parses exactly") {
    val got = WavDecoder.parse(wav(fmtChunk(2, 44100, 16), dataChunk(pcm)))
    assert(got.contains((2, 44100, 16, 2L, md5hex(pcm))))
  }

  test("unknown chunks are walked over, including the odd-size pad") {
    val odd = tag("LIST") ++ le32(3) ++ Seq[Byte]('I', 'N', 'F') ++
      Seq[Byte](0) // 3-byte chunk + 1 alignment pad
    val got = WavDecoder.parse(
      wav(odd, fmtChunk(1, 8000, 8), dataChunk(pcm)))
    assert(got.contains((1, 8000, 8, 8L, md5hex(pcm))))
  }

  test("data chunk before fmt chunk still parses") {
    val got = WavDecoder.parse(wav(dataChunk(pcm), fmtChunk(1, 8000, 8)))
    assert(got.contains((1, 8000, 8, 8L, md5hex(pcm))))
  }

  test("bad magic, non-PCM, and truncated data all reject with None") {
    val ok = wav(fmtChunk(1, 8000, 8), dataChunk(pcm))
    val rifx = ok.clone(); rifx(3) = 'X'
    assert(WavDecoder.parse(rifx).isEmpty, "RIFX magic must reject")
    assert(WavDecoder.parse(
      wav(fmtChunk(1, 8000, 8, audioFormat = 3), dataChunk(pcm))).isEmpty,
      "non-PCM audioFormat must reject")
    assert(WavDecoder.parse(
      wav(fmtChunk(1, 8000, 8), dataChunk(pcm.take(4), declared = 8))).isEmpty,
      "declared data size beyond the actual bytes must reject")
    assert(WavDecoder.parse(Array[Byte]('R', 'I')).isEmpty,
      "a two-byte blob must reject, not throw")
  }
}
