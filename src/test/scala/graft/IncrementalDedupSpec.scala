package graft

import org.scalatest.funsuite.AnyFunSuite

/** d24's consistency contract, checked against independently computed
  * facts plus the oracle-checked d02 operator:
  *
  *  - exact_dup ⟺ the batch doc's MessageDigest-md5 text fingerprint
  *    exists in the index split (recomputed here, not via Spark);
  *  - near_dup ⟺ d02 (the corpus-wide pair op, itself DuckDB-gated)
  *    reports a verified pair linking the batch doc to an index doc —
  *    the incremental probe and the batch self-join build candidates
  *    from the SAME band keys, so the cross-split subsets must agree
  *    exactly, not just probabilistically;
  *  - the reported match is the lowest qualifying index doc.
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkFixture {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def splitOf(id: Long): String = {
    val hex = md5hex(id.toString).substring(0, 15)
    val b = java.lang.Long.parseLong(hex, 16) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("d24 verdicts agree with recomputed fingerprints and d02's pairs") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batchIds = docs.map(_._1).filter(splitOf(_) == "test").toSet
    val indexIds = docs.map(_._1).toSet -- batchIds
    assert(batchIds.nonEmpty && indexIds.nonEmpty)

    val fpOfIndex = docs.filter(d => indexIds(d._1))
      .groupBy(d => md5hex(d._2)).view.mapValues(_.map(_._1).min).toMap
    val exactExpected = docs.filter(d => batchIds(d._1))
      .flatMap(d => fpOfIndex.get(md5hex(d._2)).map(d._1 -> _)).toMap

    // cross-split projection of the oracle-checked corpus-wide pair op
    val d02CrossSplit = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        Seq((a, b), (b, a)).collect {
          case (bat, idx) if batchIds(bat) && indexIds(idx) => bat -> idx
        }
      }
    val nearExpected = d02CrossSplit.groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap

    val got = SparkEntry.queries("d24_incremental_dedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got.keySet == batchIds, "one verdict per batch doc")
    assert(got.values.count(_._1 != "new") > 0,
      "no duplicate found at this sf; the verdict spec is vacuous")
    got.foreach { case (id, (verdict, matchId)) =>
      (exactExpected.get(id), nearExpected.get(id)) match {
        case (Some(m), _) =>
          assert(verdict == "exact_dup" && matchId == m,
            s"doc $id: expected exact_dup -> $m, got $verdict -> $matchId")
        case (None, Some(m)) =>
          assert(verdict == "near_dup" && matchId == m,
            s"doc $id: expected near_dup -> $m, got $verdict -> $matchId")
        case (None, None) =>
          assert(verdict == "new" && matchId == -1L,
            s"doc $id: expected new, got $verdict -> $matchId")
      }
    }
  }
}
