package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOf

/** The custom as-of join plan: correctness against the composed
  * union+window twin, plan shape, and edge semantics.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  test("custom as-of join equals the composed q26 on real events") {
    val custom = SparkEntry.queries("q26_asof_custom")(spark, sfDir).collect()
    val composed = SparkEntry.queries("q26_asof_join")(spark, sfDir).collect()
    assert(custom.nonEmpty)
    assert(custom.map(_.toSeq).toSeq == composed.map(_.toSeq).toSeq)
  }

  test("the physical plan is the custom AsOfJoinExec merge sweep") {
    val df = SparkEntry.queries("q26_asof_custom")(spark, sfDir)
    df.collect()
    // AQE wraps stages in leaf QueryStageExec nodes, so walk the printed
    // tree instead of the node structure
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin "), planStr)
    // the pinned-partition shuffles that keep both sides co-partitioned
    assert(planStr.contains("REQUIRED_BY_STATEFUL_OPERATOR"), planStr)
  }

  test("equal timestamps match (<=), missing signup drops the row") {
    val sp = spark
    import sp.implicits._
    val purchases = Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 99L))
      .toDF("p_id", "user", "p_ts")
    val signups = Seq((200L, 1L, 50L), (201L, 3L, 1L))
      .toDF("s_id", "s_user", "s_ts")
    val out = AsOf.join(purchases, signups, "user", "s_user", "p_ts", "s_ts")
      .select("p_id", "s_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // p100 at t=50 matches s200 at t=50 (<=); p101 at t=10 has no prior
    // signup; p102's user has none
    assert(out.toSeq == Seq((100L, 200L)))
  }

  test("matches a naive reference on randomized inputs") {
    val sp = spark
    import sp.implicits._
    val r = new scala.util.Random(99)
    for (round <- 1 to 3) {
      val nL = 40 + r.nextInt(40)
      val nR = 30 + r.nextInt(30)
      val lefts = (0 until nL).map(i =>
        (i.toLong, r.nextInt(8).toLong, r.nextInt(1000).toLong))
      val rights = (0 until nR).map(i =>
        (1000L + i, r.nextInt(8).toLong, r.nextInt(1000).toLong))
      val expected = lefts.flatMap { case (lid, u, lt) =>
        val prior = rights.filter(s => s._2 == u && s._3 <= lt)
        if (prior.isEmpty) None
        else {
          // latest time; ambiguous on exact ties, so skip tied cases
          val best = prior.maxBy(_._3)
          if (prior.count(_._3 == best._3) > 1) None else Some((lid, best._1))
        }
      }.toSet
      val got = AsOf.join(
          lefts.toDF("p_id", "user", "p_ts"),
          rights.toDF("s_id", "s_user", "s_ts"),
          "user", "s_user", "p_ts", "s_ts")
        .select("p_id", "s_id").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      assert(expected.subsetOf(got), s"round $round missing: ${expected.diff(got)}")
      // every emitted pair must be a valid as-of match
      got.foreach { case (lid, sid) =>
        val (_, u, lt) = lefts.find(_._1 == lid).get
        val s = rights.find(_._1 == sid).get
        assert(s._2 == u && s._3 <= lt, s"invalid pair ($lid,$sid)")
        val bestTime = rights.filter(x => x._2 == u && x._3 <= lt).map(_._3).max
        assert(s._3 == bestTime, s"($lid,$sid) not the latest prior")
      }
    }
  }

  test("string keys and double times sweep via the generic path, same semantics") {
    val sp = spark
    import sp.implicits._
    val purchases = Seq((100L, "u1", 50.0), (101L, "u1", 10.0), (102L, "u2", 99.0))
      .toDF("p_id", "user", "p_ts")
    val signups = Seq((200L, "u1", 50.0), (201L, "u3", 1.0))
      .toDF("s_id", "s_user", "s_ts")
    val out = AsOf.join(purchases, signups, "user", "s_user", "p_ts", "s_ts")
      .select("p_id", "s_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((100L, 200L)))
  }

  test("overlapping column names between the sides fail fast") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, 2L, 3L)).toDF("id", "user", "ts")
    val r = Seq((1L, 2L, 3L)).toDF("s_id", "user", "ts")
    val e = intercept[IllegalArgumentException](
      AsOf.join(l, r, "user", "user", "ts", "ts"))
    assert(e.getMessage.contains("disjoint"))
  }

  test("picks the latest of several prior signups") {
    val sp = spark
    import sp.implicits._
    val purchases = Seq((1L, 7L, 100L)).toDF("p_id", "user", "p_ts")
    val signups = Seq((10L, 7L, 1L), (11L, 7L, 99L), (12L, 7L, 101L))
      .toDF("s_id", "s_user", "s_ts")
    val out = AsOf.join(purchases, signups, "user", "s_user", "p_ts", "s_ts")
      .select("s_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(11L))
  }
}
