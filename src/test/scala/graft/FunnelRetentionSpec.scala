package graft

import org.scalatest.funsuite.AnyFunSuite

/** q40_funnel and q41_retention — behavior re-derived independently in
  * Scala on sf0.001 (per-user event replay for the funnel; per-customer
  * month replay for the cohort grid), plus the window-shape claims.
  */
class FunnelRetentionSpec extends AnyFunSuite with SparkFixture {

  test("q40 conversion counts match a per-user event replay") {
    val events = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "ts_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    byUser.values.foreach { evs =>
      val buys = evs.filter(_._2 == "purchase").map(_._3).sorted
      evs.filter(_._2 == "click").foreach { case (_, _, ts) =>
        val day = ts / 86400000000L
        val conv = buys.exists(b => b >= ts && b <= ts + 86400000000L)
        val (c, k) = want.getOrElse(day, (0L, 0L))
        want(day) = (c + 1, k + (if (conv) 1 else 0))
      }
    }
    val got = SparkEntry.queries("q40_funnel")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want.toMap, s"funnel diverged: got $got want $want")
    assert(want.values.exists(_._2 > 0), "test data should convert somewhere")
    assert(want.values.map(t => t._1 - t._2).sum > 0,
      "test data should also have non-converting clicks")
  }

  test("q40 window partitions on the high-cardinality user key with a range frame") {
    val p = SparkEntry.queries("q40_funnel")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), "expected the next-buy window")
    assert(p.contains("RangeFrame") && p.contains("86400000000"),
      "next-purchase frame must be VALUE-based (tie-order independent)")
  }

  test("q41 retention grid matches a per-customer month replay") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey",
        "year(o_orderdate) * 12 + month(o_orderdate) AS m").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val want = orders.groupBy(_._1).toSeq.flatMap { case (cust, os) =>
      val m0 = os.map(_._2).min
      os.map(_._2 - m0).distinct.map(off => ((m0, off), cust))
    }.groupBy(_._1).map { case ((m0, off), g) =>
      ((m0 - 1) / 12, (m0 - 1) % 12 + 1, off) -> g.map(_._2).distinct.size.toLong
    }
    val got = SparkEntry.queries("q41_retention")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == want, s"retention grid diverged (got ${got.size} cells)")
    assert(want.keys.map(_._3).max > 0, "grid should extend past offset 0")
  }

  test("q41 aggregates combine map-side") {
    val p = SparkEntry.queries("q41_retention")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_"), "cohort/grid aggregates must combine map-side")
    assert(!p.contains("CartesianProduct"))
  }
}
