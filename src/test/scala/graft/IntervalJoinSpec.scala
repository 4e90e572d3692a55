package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q44_interval_join — the claims the gate hash can't make.
  *
  * The gate plan is the PREFIX-SUM formulation (Events.
  * intervalAggPrefixSum): each window's count+sum is F(hi-1) - F(lo-1)
  * over cumulative click series, cost O(clicks + windows). The previous
  * binned equi-join fixed the nested-loop plan but still enumerated
  * every (purchase, click) containment pair — ~quadratic in event
  * density for un-keyed windows (measured 18x time for 10x data at
  * sf10). Here we pin:
  *   1. the plan has NO row-per-match join stage at all — no nested
  *      loop, no cartesian, and no shuffle join between clicks and
  *      windows (the only join is the broadcast of the model-sized
  *      dense bin-prefix table);
  *   2. prefix-sum == the naive non-equi join on hand boundary cases
  *      (inclusive lo, exclusive hi, bin-crossing window, out-of-range
  *      probes);
  *   3. prefix-sum == the match-enumerating binned join on the real
  *      gate data.
  */
class IntervalJoinSpec extends AnyFunSuite with SparkFixture {

  private val W = 7200000000L

  /** The retired match-enumerating binned rewrite, kept as an oracle:
    * correct output, scale-unsafe volume.
    */
  private def binned(rows: org.apache.spark.sql.DataFrame) = {
    val iv = rows.filter(col("event_type") === "purchase")
      .select(col("event_id").as("window_id"), col("ts_us").as("lo"),
              (col("ts_us") + lit(W)).as("hi"))
      .withColumn("bin", explode(array_distinct(array(
        expr(s"lo DIV $W"), expr(s"(hi - 1) DIV $W")))))
    rows.filter(col("event_type") === "click")
      .withColumn("bin", expr(s"ts_us DIV $W"))
      .join(iv, "bin")
      .filter(col("ts_us") >= col("lo") && col("ts_us") < col("hi"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n"),
           round(sum("value") + lit(1e-6), 2).as("total_value"))
  }

  test("no row-per-match stage: broadcast-only joins, no SMJ/BNLJ/cartesian") {
    val df = SparkEntry.queries("q44_interval_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    for (bad <- Seq("BroadcastNestedLoopJoin", "CartesianProduct",
                    "SortMergeJoin", "ShuffledHashJoin"))
      assert(!plan.contains(bad),
        s"prefix-sum plan regressed to a $bad (row-per-match risk):\n$plan")
    assert(df.count() > 0, "gate window catches no clicks at this SF")
  }

  test("prefix-sum == naive non-equi join, bin-boundary cases included") {
    val sp = spark
    import sp.implicits._
    // hand events in epoch micros: window at a bin EDGE (lo = 3W - 1h,
    // spans bins 2 and 3), probes at lo (inclusive), hi - 1 (last in),
    // hi (exclusive — out), one in the window's second bin, one before
    // lo, and a far-future purchase whose window catches nothing (its
    // probe bins fall past every click bin — must NOT emit a row)
    val lo = 3 * W - 1800000000L
    val rows = Seq(
      (100L, lo, "purchase", 0.0),
      (200L, 50 * W, "purchase", 0.0),   // empty window, out of range
      (1L, lo, "click", 1.5),            // at lo: in
      (2L, lo + W - 1L, "click", 2.5),   // last microsecond: in
      (3L, lo + W, "click", 4.0),        // at hi: OUT (exclusive)
      (4L, 3 * W + 10L, "click", 8.0),   // second bin of the window: in
      (5L, lo - 1L, "click", 16.0))      // before lo: OUT
      .toDF("event_id", "ts_us", "event_type", "value")

    val naive = {
      val iv = rows.filter(col("event_type") === "purchase")
        .select(col("event_id").as("window_id"), col("ts_us").as("lo"),
                (col("ts_us") + lit(W)).as("hi"))
      rows.filter(col("event_type") === "click").as("p")
        .join(iv, col("p.ts_us") >= col("lo") && col("p.ts_us") < col("hi"))
        .groupBy("window_id")
        .agg(count(lit(1)).as("n"),
             round(sum("value") + lit(1e-6), 2).as("total_value"))
    }
    val p = graft.operators.Events.intervalAggPrefixSum(rows, W)
      .collect().map(_.toString).sorted.toSeq
    val n = naive.collect().map(_.toString).sorted.toSeq
    assert(p == n, s"prefix-sum $p != naive $n")
    // and the expected membership by hand: clicks 1, 2, 4 in; 3, 5 out;
    // window 200 absent (zero matches)
    assert(p == Seq(s"[100,3,${1.5 + 2.5 + 8.0}]"))
  }

  test("prefix-sum == binned match-enumeration on the gate data") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val p = SparkEntry.queries("q44_interval_join")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val b = binned(ev).collect().map(_.toString).sorted.toSeq
    assert(p == b,
      s"prefix-sum and binned disagree on gate data: ${p.size} vs ${b.size}")
  }
}
