package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for q34_latest_snapshot: per part, the
  * recency-max row under the (l_shipdate, l_orderkey, l_linenumber)
  * total order, recomputed with plain collections.
  */
class LatestSnapshotSpec extends AnyFunSuite with SparkFixture {

  private def r2(x: Double): Double =
    BigDecimal(x + 1e-6).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q34 keeps exactly the recency-max listing per part") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_shipdate", "l_orderkey", "l_linenumber",
              "l_extendedprice", "l_quantity")
      .collect()
      .map(r => (r.getLong(0),
                 // l_shipdate is TIMESTAMP_NTZ in Spark 4: LocalDateTime
                 r.getAs[java.time.LocalDateTime](1)
                   .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
                 r.getLong(2), r.getInt(3), r.getDouble(4), r.getDouble(5)))
    val expected = li.groupBy(_._1).view.mapValues(rows =>
      rows.maxBy(r => (r._2, r._3, r._4.toLong))).toMap

    val got = SparkEntry.queries("q34_latest_snapshot")(spark, sfDir).collect()
    assert(got.length == expected.size,
      s"one row per part expected: got ${got.length}, parts ${expected.size}")
    // duplicate timestamps per part must exist, or the tie-break is untested
    assert(li.groupBy(r => (r._1, r._2)).values.exists(_.length > 1),
      "no (part, shipdate) collision in the corpus; tie-break spec is vacuous")
    got.foreach { r =>
      val e = expected(r.getLong(0))
      assert(r.getLong(2) == e._3 && r.getInt(3) == e._4,
        s"part ${r.getLong(0)}: winner (${r.getLong(2)},${r.getInt(3)}) " +
          s"!= expected (${e._3},${e._4})")
      assert(r.getDouble(4) == r2(e._5) && r.getDouble(5) == r2(e._6),
        s"part ${r.getLong(0)}: payload mismatch")
    }
  }
}
