package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for the curation verdict and the corpus
  * report: d21's rule flags and d22's per-(source, lang, split) budgets
  * recomputed with scala.util.matching regexes and MessageDigest — no
  * Spark expressions shared with the implementations under test.
  */
class QualityStatsSpec extends AnyFunSuite with SparkFixture {

  private case class Doc(id: Long, text: String, lang: String, source: String)

  private lazy val docs: Seq[Doc] =
    graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq

  private def words(t: String): Seq[String] = "\\S+".r.findAllIn(t).toSeq

  test("d21 flags and verdict match the rule set recomputed independently") {
    val stops = Seq("the|and|of|a|is", "el|la|los|las|es",
                    "der|die|das|und|ist", "le|les|et|est|une")
      .map(alt => s"\\b($alt)\\b".r)
    val expected = docs.map { d =>
      val w = words(d.text)
      val nonws = d.text.replaceAll("\\s", "").length
      val stopHits = stops.map(_.findAllIn(d.text).length).sum
      val okLen = w.length >= 10 && w.length <= 5000
      val okRep = w.distinct.length * 5 >= w.length
      val okStop = stopHits >= 1
      val okTok = nonws >= w.length * 2 && nonws <= w.length * 12
      d.id -> ((w.length, okLen, okRep, okStop, okTok,
                okLen && okRep && okStop && okTok))
    }.toMap
    // both verdicts must occur, or the thresholds never discriminate
    assert(expected.values.map(_._6).toSet.size == 2,
      "every doc keeps (or every doc drops); threshold spec is vacuous")

    val got = SparkEntry.queries("d21_quality_filter")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getLong(0))
      val row = (r.getInt(1), r.getBoolean(2), r.getBoolean(3),
                 r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))
      assert(row == e, s"doc ${r.getLong(0)}: $row != expected $e")
    }
  }

  test("d23 OOV counts match a plain-collections vocabulary probe") {
    val toks = docs.map(d => (d.id, d.lang, words(d.text)))
    // filter + keySet, NOT collect{...=> k}: a Map.collect producing
    // pairs re-forms a Map keyed by lang and silently drops the terms
    val vocab = toks.flatMap { case (_, lang, ws) => ws.map(w => (lang, w)) }
      .groupBy(identity).filter(_._2.length >= 20).keySet
    val expected = toks.collect { case (id, lang, ws) if ws.nonEmpty =>
      val oov = ws.count(w => !vocab((lang, w)))
      id -> ((ws.length.toLong, oov.toLong,
              BigDecimal(oov.toDouble / ws.length + 1e-8)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
              oov * 2 > ws.length))
    }.toMap
    assert(expected.values.exists(_._2 > 0),
      "no OOV token anywhere; the vocabulary probe is vacuous")

    val got = SparkEntry.queries("d23_oov_ratio")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getLong(0))
      val row = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(row == e, s"doc ${r.getLong(0)}: $row != expected $e")
    }
  }

  test("d26 adjacent-pair counts match a plain sliding-window recount") {
    val expected = docs.flatMap(d => words(d.text).sliding(2)
        .collect { case Seq(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= 20).toMap
    assert(expected.nonEmpty, "no pair reaches the floor; spec is vacuous")
    assert(docs.flatMap(d => words(d.text).sliding(2).collect { case Seq(a, b) => (a, b) })
      .groupBy(identity).exists(_._2.length < 20),
      "every pair clears the floor; the HAVING filter is untested")

    val got = SparkEntry.queries("d26_bpe_pairs")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"pair tables diverge: extra=${(got.keySet -- expected.keySet).take(3)} " +
        s"missing=${(expected.keySet -- got.keySet).take(3)}")
  }

  test("d22 budgets match a plain-collections rollup under the d11 split") {
    def split(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      val b = java.lang.Long.parseLong(hex, 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val expected = docs.groupBy(d => (d.source, d.lang, split(d.id)))
      .view.mapValues { ds =>
        val toks = ds.map(d => words(d.text).length.toLong)
        (ds.length.toLong, toks.sum, ds.map(_.text.length.toLong).sum,
         toks.min.toInt, toks.max.toInt,
         BigDecimal(toks.sum.toDouble / ds.length + 1e-8)
           .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    assert(expected.keys.map(_._3).toSet == Set("train", "val", "test"),
      "a split level is empty at this sf; the report spec is weaker than intended")

    val got = SparkEntry.queries("d22_corpus_stats")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected((r.getString(0), r.getString(1), r.getString(2)))
      val row = (r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6),
                 r.getInt(7), r.getDouble(8))
      assert(row == e,
        s"(${r.getString(0)},${r.getString(1)},${r.getString(2)}): $row != $e")
    }
  }
}
