package graft

import org.scalatest.funsuite.AnyFunSuite

/** d37_winnow — the winnowing invariants, re-derived independently: an
  * exact Scala replay of the window-min rule, the defining coverage
  * guarantee (every window of W shingles contains a selected position),
  * the ~2/(W+1) sampling density, and the copy-detection property that
  * identical texts produce identical fingerprint sets.
  */
class WinnowSpec extends AnyFunSuite with SparkFixture {

  private val W = 4

  private def md60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)

  /** The exact rule the plan encodes: shingle hashes at positions
    * 1..n-2, windows of W starting at s = 1..max(nsh-W+1, 1) (tail
    * clamped), per window the leftmost minimum with its position.
    */
  private def replay(text: String): Set[(Long, Int)] = {
    val ws = java.util.regex.Pattern.compile("\\s+").split(text, -1)
    if (ws.length < 3) return Set.empty
    val hs = (0 until ws.length - 2)
      .map(i => md60(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}"))
    (1 to math.max(hs.length - (W - 1), 1)).map { s =>
      val win = hs.slice(s - 1, math.min(s - 1 + W, hs.length))
      val mn = win.min
      (mn, s + win.indexOf(mn))
    }.toSet
  }

  private lazy val got: Map[Long, Set[(Long, Int)]] =
    SparkEntry.queries("d37_winnow")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (d, rs) =>
        d -> rs.map(t => (t._2, t._3)).toSet }

  private lazy val texts: Map[Long, String] =
    graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("the plan's fingerprints equal the Scala replay exactly") {
    val expect = texts.map { case (id, t) => id -> replay(t) }
      .filter(_._2.nonEmpty)
    assert(got.keySet == expect.keySet)
    for ((id, fps) <- expect)
      assert(got(id) == fps, s"doc $id fingerprints diverged")
  }

  test("coverage guarantee: every W-window contains a fingerprint") {
    for ((id, fps) <- got) {
      val positions = fps.map(_._2)
      val nsh = math.max(
        java.util.regex.Pattern.compile("\\s+")
          .split(texts(id), -1).length - 2, 0)
      for (s <- 1 to math.max(nsh - (W - 1), 1))
        assert(positions.exists(p => p >= s && p <= s + W - 1),
          s"doc $id: window starting at shingle $s has no fingerprint")
    }
  }

  test("density: sub-linear selection near the 2/(W+1) theory rate") {
    val longDocs = got.filter { case (id, _) =>
      java.util.regex.Pattern.compile("\\s+")
        .split(texts(id), -1).length - 2 >= 40 }
    assert(longDocs.nonEmpty, "sf0.01 must contain long documents")
    val rates = longDocs.map { case (id, fps) =>
      val nsh = java.util.regex.Pattern.compile("\\s+")
        .split(texts(id), -1).length - 2
      fps.size.toDouble / nsh
    }
    val mean = rates.sum / rates.size
    info(f"mean selection rate = $mean%.3f (theory 2/(W+1) = ${2.0 / (W + 1)}%.3f)")
    assert(mean < 0.6, f"winnowing selected $mean%.2f of shingles - not sub-linear")
  }

  test("a shifted copy shares fingerprint values (copy detection)") {
    // The winnowing guarantee in its useful form: a plagiarized passage
    // is found even when it lands at a DIFFERENT offset in the copying
    // document. Build the pair through the same replay the plan is
    // pinned to (test 1): original vs prefix-shifted copy must share
    // most fingerprint VALUES (positions shift; values don't).
    val original = texts.values.find(t =>
      java.util.regex.Pattern.compile("\\s+").split(t, -1).length >= 50).get
    val shifted = "totally unrelated preamble words here then " + original
    val a = replay(original).map(_._1)
    val b = replay(shifted).map(_._1)
    val shared = (a & b).size.toDouble / a.size
    info(f"fingerprint values surviving the shift: ${shared * 100}%.0f%%")
    assert(shared >= 0.8,
      f"only ${shared * 100}%.0f%% of fingerprints survived an offset shift")
  }
}
