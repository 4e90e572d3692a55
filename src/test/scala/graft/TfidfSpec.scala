package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for d20_tfidf: tf/df/N and the
  * reciprocal-df score recomputed with plain collections, ranking
  * replicated with an explicit (-score, term) sort.
  */
class TfidfSpec extends AnyFunSuite with SparkFixture {

  private def r4(x: Double): Double =
    BigDecimal(x + 1e-8).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("d20 ranks each doc's terms by tf*(N/df) with term tie-break") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toLong
    val tf = docs.flatMap { case (id, text) =>
      text.split("\\s+").filter(_.nonEmpty).groupBy(identity)
        .map { case (t, hits) => (id, t, hits.length.toLong) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = tf.groupBy(_._1).view.mapValues { terms =>
      terms.map { case (_, t, f) => (t, f, df(t), r4(f.toDouble * n / df(t))) }
        .sortBy { case (t, _, _, score) => (-score, t) }
        .take(3)
    }.toMap

    val got = SparkEntry.queries("d20_tfidf")(spark, sfDir).collect()
    assert(got.nonEmpty)
    // scores must actually vary within some doc, or ranking is untested
    assert(expected.values.exists(ts => ts.map(_._4).distinct.length > 1),
      "every doc's top-3 scores are equal; ranking spec is vacuous")
    got.foreach { r =>
      val (t, f, d, score) = expected(r.getLong(0))(r.getInt(1) - 1)
      assert(r.getString(2) == t && r.getLong(3) == f && r.getLong(4) == d &&
             r.getDouble(5) == score,
        s"doc ${r.getLong(0)} rk ${r.getInt(1)}: " +
          s"(${r.getString(2)},${r.getLong(3)},${r.getLong(4)},${r.getDouble(5)}) " +
          s"!= expected ($t,$f,$d,$score)")
    }
    assert(got.length == expected.values.map(_.length.min(3)).sum)
  }
}
