package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** q45_scd2 — the run-collapse semantics on a hand changelog, the
  * interval invariants every SCD2 table must satisfy on real data, and
  * the one-Exchange plan claim (both windows share the same partition
  * key and sort).
  */
class Scd2Spec extends AnyFunSuite with SparkFixture {

  test("runs collapse and validity intervals chain on a hand changelog") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q45spec")
    // one customer: P1,P1,P2,P1 -> three versions; a second customer
    // with a single run -> one current row
    Seq(
      (101L, 7L, "P1", "2024-01-01", 9.0, "x"),
      (102L, 7L, "P1", "2024-02-01", 9.0, "x"),
      (103L, 7L, "P2", "2024-03-01", 9.0, "x"),
      (104L, 7L, "P1", "2024-04-01", 9.0, "x"),
      (105L, 8L, "P9", "2024-01-15", 9.0, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "d",
            "o_totalprice", "o_orderstatus")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.col("d").cast("timestamp_ntz"))
      .drop("d")
      .write.mode("overwrite").parquet(dir.resolve("orders.parquet").toString)
    val out = SparkEntry.queries("q45_scd2")(spark, dir.toString)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
                 if (r.isNullAt(4)) -1L else r.getLong(4)))
    def us(s: String) = java.time.LocalDate.parse(s)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    assert(out.toSeq == Seq(
      (7L, 1, "P1", us("2024-03-01")),
      (7L, 2, "P2", us("2024-04-01")),
      (7L, 3, "P1", -1L),
      (8L, 1, "P9", -1L)),
      s"run collapse wrong: ${out.toSeq}")
  }

  test("interval invariants hold on the real corpus") {
    val rows = SparkEntry.queries("q45_scd2")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
                 if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val s = vs.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1 to s.length).toSeq,
        s"versions not contiguous for $k")
      s.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._5 == b._4, s"interval chain broken for $k: $a -> $b")
        assert(a._3 != b._3, s"un-collapsed run for $k: $a -> $b")
        assert(a._4 < b._4, s"valid_from not increasing for $k")
      }
      assert(s.count(_._5 == Long.MaxValue) == 1,
        s"exactly one current row per key, got ${s.count(_._5 == Long.MaxValue)} for $k")
      assert(s.last._5 == Long.MaxValue, s"current row must be the last version for $k")
    }
    assert(rows.nonEmpty)
  }

  test("both windows share one shuffle (plus the output sort)") {
    val df = SparkEntry.queries("q45_scd2")(spark, sfDir)
    df.collect()
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(exchanges.length <= 2,
      s"expected at most window-shuffle + output-sort, got ${exchanges.length}")
  }
}
