package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q44_interval_join — the two claims the gate hash can't make:
  * the binned plan contains NO nested-loop/cartesian join (that's the
  * entire point of the rewrite), and it computes exactly what the
  * naive non-equi join computes — including an interval that crosses
  * a bin boundary (the two-bin explode) and a probe at the exclusive
  * upper bound.
  */
class IntervalJoinSpec extends AnyFunSuite with SparkFixture {

  test("the binned plan joins on the bin, never nested-loop") {
    val df = SparkEntry.queries("q44_interval_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi physical join:\n$plan")
    assert(df.count() > 0, "gate window catches no clicks at this SF")
  }

  test("binned == naive non-equi join, bin-boundary cases included") {
    val sp = spark
    import sp.implicits._
    val W = 7200000000L
    // hand events in epoch micros: window at a bin EDGE (lo = 3W - 1h,
    // spans bins 2 and 3), probes at lo (inclusive), hi - 1 (last in),
    // hi (exclusive — out), and one in the window's second bin
    val lo = 3 * W - 1800000000L
    val rows = Seq(
      (100L, lo, "purchase", 0.0),
      (1L, lo, "click", 1.5),            // at lo: in
      (2L, lo + W - 1L, "click", 2.5),   // last microsecond: in
      (3L, lo + W, "click", 4.0),        // at hi: OUT (exclusive)
      (4L, 3 * W + 10L, "click", 8.0),   // second bin of the window: in
      (5L, lo - 1L, "click", 16.0))      // before lo: OUT
      .toDF("event_id", "ts_us", "event_type", "value")

    def binned = {
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
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
    }
    def naive = {
      val iv = rows.filter(col("event_type") === "purchase")
        .select(col("event_id").as("window_id"), col("ts_us").as("lo"),
                (col("ts_us") + lit(W)).as("hi"))
      rows.filter(col("event_type") === "click").as("p")
        .join(iv, col("p.ts_us") >= col("lo") && col("p.ts_us") < col("hi"))
        .groupBy("window_id")
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
    }
    val b = binned.collect().map(_.toString).sorted.toSeq
    val n = naive.collect().map(_.toString).sorted.toSeq
    assert(b == n, s"binned $b != naive $n")
    // and the expected membership by hand: probes 1, 2, 4 in; 3, 5 out
    assert(b == Seq(s"[100,3,${1.5 + 2.5 + 8.0}]"))
  }
}
