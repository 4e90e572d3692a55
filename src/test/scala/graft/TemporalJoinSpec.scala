package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q50_temporal_join + q49_histogram: the invariants the oracle hash
  * can't state — point-in-time joins land every fact in EXACTLY one
  * dimension version, and the histogram partitions the row count with
  * visible empty bins.
  */
class TemporalJoinSpec extends AnyFunSuite with SparkFixture {

  test("q50: every order lands in exactly one dimension version") {
    val out = SparkEntry.queries("q50_temporal_join")(spark, sfDir).cache()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    assert(out.count() == orders.count(),
      "a point-in-time join must neither drop nor duplicate facts")
    assert(out.groupBy("o_orderkey").count().filter(col("count") > 1).isEmpty)
    out.unpersist()
  }

  test("q50: the joined version's validity brackets the order date") {
    val dim = graft.operators.Relational.scd2Dim(spark, sfDir)
    val bad = SparkEntry.queries("q50_temporal_join")(spark, sfDir)
      .join(dim, Seq("o_custkey", "version"))
      .join(spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us")),
        "o_orderkey")
      .filter(col("ts_us") < col("valid_from_us") ||
        (col("valid_to_us").isNotNull && col("ts_us") >= col("valid_to_us")))
    assert(bad.isEmpty)
  }

  test("q50: hand trace — priority flips route facts to their era") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q50").toString
    // customer 1: prio A on day 1-2, B from day 3 on; the day-2 order
    // must join version 1 even though version 2 exists
    Seq(
      (1L, 1L, "1995-01-01", "A"), (2L, 1L, "1995-01-02", "A"),
      (3L, 1L, "1995-01-03", "B"), (4L, 1L, "1995-01-05", "B")
    ).toDF("o_orderkey", "o_custkey", "dt", "o_orderpriority")
      .withColumn("o_orderdate", col("dt").cast("timestamp")).drop("dt")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q50_temporal_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 1, "A"), (2L, 1, "A"),
                            (3L, 2, "B"), (4L, 2, "B")))
  }

  test("q49: bins partition the row count and empty bins are visible") {
    val out = SparkEntry.queries("q49_histogram")(spark, sfDir).cache()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    assert(out.agg(sum("n")).head.getLong(0) == orders.count())
    // the full (priority x 10) grid is present, zeros included
    val nPrio = orders.select("o_orderpriority").distinct().count()
    assert(out.count() == nPrio * 10)
    assert(out.groupBy("o_orderpriority").count()
      .filter(col("count") =!= 10).isEmpty)
    out.unpersist()
  }
}
