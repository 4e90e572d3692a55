package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** l05_incr_mv — the incremental-view-maintenance invariants: the merged
  * refresh equals a full recompute exactly, the mid-month cutoff makes
  * all three group classes (MV-only, delta-only, genuinely merged)
  * occur, and the refresh plan reads ONLY the delta from the fact table
  * (base predicate absent, delta predicate pushed to the scan).
  */
class IncrMvSpec extends AnyFunSuite with SparkFixture {

  private lazy val refreshed =
    SparkEntry.queries("l05_incr_mv")(spark, sfDir)

  private lazy val full = graft.sources.Tables.orders(spark, sfDir)
    .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
    .groupBy("o_orderpriority", "ym")
    .agg(count(lit(1)).as("n_orders"),
         sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_price"))
    .select(col("o_orderpriority"), col("ym"), col("n_orders"),
            round(col("sum_price").cast("double") + lit(1e-6), 2)
              .as("sum_price"),
            round(col("sum_price").cast("double") / col("n_orders")
                    + lit(1e-6), 2).as("avg_price"))

  test("merged refresh equals a full recompute exactly") {
    assert(refreshed.exceptAll(full).isEmpty &&
           full.exceptAll(refreshed).isEmpty,
      "partial-aggregate merge must reproduce the full recompute")
  }

  test("the cutoff exercises MV-only, delta-only, and merged groups") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
    val baseYms = orders.filter(col("o_orderdate") < lit("1996-06-15"))
      .select("ym").distinct().collect().map(_.getString(0)).toSet
    val deltaYms = orders.filter(col("o_orderdate") >= lit("1996-06-15"))
      .select("ym").distinct().collect().map(_.getString(0)).toSet
    assert((baseYms -- deltaYms).nonEmpty, "need MV-only months")
    assert((deltaYms -- baseYms).nonEmpty, "need delta-only months")
    assert(baseYms.contains("1996-06") && deltaYms.contains("1996-06"),
      "the boundary month must appear on BOTH sides so the merge merges")
    // and the merged boundary row is the sum of its two halves
    val both = orders.filter(col("ym") === "1996-06").count()
    val got = refreshed.filter(col("ym") === "1996-06")
      .agg(sum("n_orders")).collect()(0).getLong(0)
    assert(got == both, "boundary month counts must merge additively")
  }

  test("refresh scans only the delta: base predicate never reappears") {
    val p = refreshed.queryExecution.executedPlan.toString
    val ordersScans = p.linesIterator
      .filter(l => l.contains("orders.parquet") || l.contains("FileScan"))
      .filter(_.contains("orders")).toSeq
    assert(ordersScans.nonEmpty, "the delta leg must scan the fact table")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"delta date predicate must push to the parquet scan:\n$p")
    assert(!p.contains("LessThan(o_orderdate"),
      "the BASE predicate must not appear anywhere in a refresh plan")
    assert(p.contains("mv_v1"), "the refresh must read the stored MV")
  }
}
