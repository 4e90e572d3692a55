package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for d27_span_dedup: 8-word spans, md5-60-bit
  * hashes, and the repeated-across-docs counting all recomputed with
  * java.security.MessageDigest + plain collections — no Spark
  * expressions shared with the implementation under test.
  */
class SpanDedupSpec extends AnyFunSuite with SparkFixture {

  private def spanHashes(text: String, n: Int): Set[Long] = {
    val ws = text.trim.split("\\s+").filter(_.nonEmpty)
    (0 to ws.length - n).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(ws.slice(i, i + n).mkString(" ").getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }.toSet
  }

  test("d27 span counts equal a plain-Scala repeated-span fold") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), spanHashes(r.getString(1), 8)))
      .filter(_._2.nonEmpty)
    val docFreq = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
    val repeated = docFreq.filter(_._2 >= 2).keySet
    val expected = docs.map { case (id, hs) =>
      id -> ((hs.size, hs.count(repeated), // n_spans, n_repeated
        BigDecimal(hs.count(repeated).toDouble / hs.size + 1e-8)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    assert(expected.values.exists(_._2 > 0),
      "no repeated spans anywhere; spec is vacuous")
    assert(expected.values.exists(v => v._2 < v._1),
      "every span repeated; spec is vacuous")

    val got = SparkEntry.queries("d27_span_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2).toInt, r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet,
      s"doc sets diverge: extra=${(got.keySet -- expected.keySet).take(3)} " +
        s"missing=${(expected.keySet -- got.keySet).take(3)}")
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id scored $v, expected ${expected(id)}")
    }
  }
}
