package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** m06_format_route — the dispatch semantics the gate hash proves only
  * in aggregate: magic recognition, the broken-but-recognized posture
  * (fmt kept, features nulled — downstream wants "broken wav", not
  * "unknown"), junk rejection, and total coverage (no payload lost).
  */
class FormatRouteSpec extends AnyFunSuite with SparkFixture {

  private def wavBytes(c: Int, rate: Int, ns: Int): Array[Byte] = {
    def le(v: Int, n: Int) = (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte)
    val data = Array.tabulate(ns * c)(i => (i % 251).toByte)
    ("RIFF".getBytes("ASCII") ++ le(4 + 24 + 8 + data.length, 4) ++
      "WAVE".getBytes("ASCII") ++
      "fmt ".getBytes("ASCII") ++ le(16, 4) ++ le(1, 2) ++ le(c, 2) ++
      le(rate, 4) ++ le(rate * c, 4) ++ le(c, 2) ++ le(8, 2) ++
      "data".getBytes("ASCII") ++ le(data.length, 4)).toArray ++ data
  }

  test("valid payloads route to their format's real decoder") {
    val ppm = "P6\n2 3\n255\n".getBytes("ASCII") ++ Array.fill(18)('x'.toByte)
    val p = Multimodal.route(1L, ppm)
    assert(p.fmt == "ppm" && p.width.contains(2) && p.height.contains(3)
      && p.content_md5.isDefined)
    val w = Multimodal.route(2L, wavBytes(2, 16000, 40))
    assert(w.fmt == "wav" && w.n_channels.contains(2)
      && w.sample_rate.contains(16000) && w.content_md5.isDefined)
  }

  test("recognized magic with a damaged body keeps fmt, nulls features") {
    val torn = wavBytes(1, 8000, 40).take(30) // RIFF magic, truncated fmt
    val r = Multimodal.route(3L, torn)
    assert(r.fmt == "wav" && r.n_channels.isEmpty && r.content_md5.isEmpty,
      s"torn wav must stay routed as wav with null features: $r")
    val p = Multimodal.route(4L, "P6".getBytes("ASCII"))
    assert(p.fmt == "ppm" && p.width.isEmpty)
  }

  test("junk and near-miss magics are unknown") {
    assert(Multimodal.route(5L, "p6\n1 1\n255\nabc".getBytes("ASCII")).fmt
      == "unknown", "magic match is case-exact")
    assert(Multimodal.route(6L, "RIF".getBytes("ASCII")).fmt == "unknown")
    assert(Multimodal.route(7L, Array.emptyByteArray).fmt == "unknown")
    assert(Multimodal.route(8L, "0a1b2c3d".getBytes("ASCII")).fmt == "unknown")
  }

  test("the gate feed covers all three routes and loses no payload") {
    val out = SparkEntry.queries("m06_format_route")(spark, sfDir).collect()
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.length == nDocs, "every payload must emit exactly one row")
    val byFmt = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byFmt.keySet == Set("ppm", "wav", "unknown"), s"got $byFmt")
    assert(out.forall(r => !r.isNullAt(1)), "fmt is never null")
  }
}
