package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, WavDecoder}

/** m07_wht_spectrum's decoder leg: channel-0 sample extraction on
  * hand-built WAV bytes (including the signed-16-bit and 8-bit-recentre
  * cases the synthetic gate feed never produces), and the WHT identity
  * cases the in-plan transform must satisfy.
  */
class WhtSpectrumSpec extends AnyFunSuite with SparkFixture {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def wav(channels: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
    val ba = channels * bits / 8
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(8000) ++ le32(8000 * ba) ++ le16(ba) ++ le16(bits)
    val dataCh = "data".getBytes ++ le32(data.length) ++ data
    val body = "WAVE".getBytes ++ fmt ++ dataCh
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  test("16-bit signed decode, stereo channel-0 stride") {
    // stereo: ch0 = [1000, -2], ch1 = [7, 7] — ch1 must be skipped
    val data = le16(1000) ++ le16(7) ++ le16(-2 & 0xffff) ++ le16(7)
    val got = WavDecoder.channel0(wav(2, 16, data), 64)
    assert(got.exists(_.sameElements(Array(1000, -2))),
      s"got ${got.map(_.toSeq)}")
  }

  test("8-bit unsigned decode recentres to [-128, 127]") {
    val data = Array[Byte](0, 128.toByte, 255.toByte)
    val got = WavDecoder.channel0(wav(1, 8, data), 64)
    assert(got.exists(_.sameElements(Array(-128, 0, 127))))
  }

  test("maxSamples caps the extraction; odd bit depths refuse") {
    val data = (0 until 10).flatMap(i => le16(i)).toArray
    assert(WavDecoder.channel0(wav(1, 16, data), 4).get.length == 4)
    // 24-bit PCM is real but unimplemented: must be None, never a guess
    val w24 = wav(1, 24, Array.fill(12)(1.toByte))
    assert(WavDecoder.channel0(w24, 64).isEmpty)
  }

  test("WHT identities on the gate kernel") {
    // impulse at n=0 -> every coefficient 1; constant 3 -> only k=0 (=48)
    val impulse = Array(1) ++ Array.fill(15)(0)
    val const = Array.fill(16)(3)
    assert(Multimodal.whtFrames(impulse).map(_._3) == Seq.fill(8)(1L))
    assert(Multimodal.whtFrames(const).map(_._3) == 48L +: Seq.fill(7)(0L))
    // two frames emit independent spectra; a 17-sample clip has one
    assert(Multimodal.whtFrames(impulse ++ const).map(t => (t._1, t._2))
      == (for (f <- 0 to 1; k <- 0 to 7) yield (f, k)))
    assert(Multimodal.whtFrames(Array.fill(17)(1)).map(_._1).distinct == Seq(0))
  }

  test("gate entry emits only full frames of decodable docs") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("m07_wht_spectrum")(spark, sfDir)
    val byDoc = out.groupBy("doc_id")
      .agg(countDistinct("frame").as("nf"), count(lit(1)).as("n"))
      .collect()
    assert(byDoc.nonEmpty)
    // 8 coefficients per frame, at most 4 frames (64-sample cap)
    byDoc.foreach { r =>
      assert(r.getLong(2) == 8 * r.getLong(1) && r.getLong(1) <= 4)
    }
    // the corrupt classes never appear
    val ids = out.select("doc_id").distinct()
      .collect().map(_.getLong(0))
    assert(ids.forall(id => id % 13 != 0 && id % 19 != 0))
  }
}
