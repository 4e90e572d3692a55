package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q47_distinct_window + q48_mode_median: hand-pinned semantics (the
  * oracle proves cross-engine parity; these pin the intended meaning),
  * and q47's plan must be the first-occurrence identity, not a
  * growing-set window.
  */
class DistinctWindowSpec extends AnyFunSuite with SparkFixture {

  test("q47: cumulative distinct per supplier matches a hand trace") {
    val s = spark
    import s.implicits._
    // supplier 1: day1 ships parts {10, 11}; day2 re-ships 10 (no new);
    // day3 ships 12. supplier 2: one day, one part.
    val li = Seq(
      (1L, 10L, "1995-01-01"), (1L, 11L, "1995-01-01"),
      (1L, 10L, "1995-01-02"), (1L, 12L, "1995-01-03"),
      (2L, 10L, "1995-01-01")
    ).toDF("l_suppkey", "l_partkey", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("q47").toString
    li.select("l_suppkey", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q47_distinct_window")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "1995-01-01", 2L), (1L, "1995-01-02", 2L),
      (1L, "1995-01-03", 3L), (2L, "1995-01-01", 1L)))
  }

  test("q47: plan carries no per-row set state") {
    val plan = SparkEntry.queries("q47_distinct_window")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_set"),
      "cum-distinct must use the first-occurrence identity, not a growing set")
    // the one window runs partitioned by supplier — no global sort of
    // the corpus ahead of it
    assert(plan.contains("Window"), "expected the windowed running sum")
  }

  test("q48: mode tie-break is (highest count, then smallest size)") {
    val s = spark
    import s.implicits._
    // brand A: sizes 3 and 7 both appear twice -> mode must be 3
    val part = Seq(
      ("A", 7, 1.0), ("A", 7, 2.0), ("A", 3, 3.0), ("A", 3, 4.0),
      ("B", 5, 10.0)
    ).toDF("p_brand", "p_size", "p_retailprice")
    val dir = java.nio.file.Files.createTempDirectory("q48").toString
    part.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = SparkEntry.queries("q48_mode_median")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(out(0) == ("A", 3, 2.5) && out(1) == ("B", 5, 10.0))
  }
}
