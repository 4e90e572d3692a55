package graft

import org.scalatest.funsuite.AnyFunSuite

/** d36_chunk — the sliding-window invariants re-derived independently:
  * every token of every document is covered, consecutive full windows
  * overlap by exactly W-S tokens, the final window ends at the last
  * token, and the plan is a pure map (no join, no aggregate, no
  * corpus shuffle beyond the gate's ORDER BY sort).
  */
class ChunkSpec extends AnyFunSuite with SparkFixture {

  private val W = 64
  private val S = 48

  private lazy val rows =
    SparkEntry.queries("d36_chunk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  private lazy val docs = graft.sources.Tables.documents(spark, sfDir)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) ->
      // Spark SQL split keeps trailing empties (Pattern.split limit -1)
      java.util.regex.Pattern.compile("\\s+").split(r.getString(1), -1))
    .toMap

  test("window count, sizes, and content match the W=64/S=48 rule") {
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every document must be chunked")
    for ((id, toks) <- docs) {
      val n = toks.length
      val expectNc = if (n <= W) 1 else (n - W + S - 1) / S + 1
      val chunks = byDoc(id).sortBy(_._2)
      assert(chunks.length == expectNc, s"doc $id: window count")
      assert(chunks.map(_._2).toSeq == (0 until expectNc).map(_.toLong),
        s"doc $id: chunk ids must be dense from 0")
      for ((_, cid, nTok, text) <- chunks) {
        val start = cid.toInt * S
        val expect = toks.slice(start, start + W)
        assert(nTok == expect.length, s"doc $id chunk $cid: n_tok")
        assert(text == expect.mkString(" "), s"doc $id chunk $cid: text")
      }
      // the final window must reach the last token => full coverage
      val lastStart = (expectNc - 1) * S
      assert(lastStart + W >= n, s"doc $id: tail tokens uncovered")
      // consecutive full windows share exactly W-S tokens
      if (expectNc > 1)
        assert(S < W && lastStart < n, s"doc $id: degenerate overlap")
    }
  }

  test("chunking is a pure map: no join, no aggregate, one scan") {
    val p = SparkEntry.queries("d36_chunk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "chunking must not join")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      "chunking must not aggregate")
    // the only exchange allowed is the gate ORDER BY's range partition
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"unexpected shuffles in a map-only op:\n$p")
  }
}
