package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** l03_schema_evolution and q42_profile — the lake takes a new column
  * without a rewrite (old files backfill NULL at scan time), and the
  * profiler's numbers re-derive from direct per-column queries.
  */
class ProfileEvolutionSpec extends AnyFunSuite with SparkFixture {

  test("l03 generation-1 rows surface the evolved column as null") {
    val rows = SparkEntry.queries("l03_schema_evolution")(spark, sfDir)
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .withColumn("yr", year(col("o_orderdate")))
    val n94 = orders.filter(col("yr") === 1994).count()
    val n95 = orders.filter(col("yr") === 1995).count()
    val got = rows.collect()
    assert(got.length == n94 + n95)
    assert(got.count(_.isNullAt(2)) == n94,
      "every generation-1 row must backfill the evolved column as null")
    assert(got.count(!_.isNullAt(2)) == n95)
  }

  test("l03 merged read carries the union schema") {
    val schema = SparkEntry.queries("l03_schema_evolution")(spark, sfDir).schema
    assert(schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_totalprice", "o_orderpriority"))
    assert(schema("o_orderpriority").nullable)
  }

  test("q42 profile numbers re-derive from direct per-column queries") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val got = SparkEntry.queries("q42_profile")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6))).toMap
    assert(got.keySet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    for ((c, (n, nNull, nd, mean)) <- got) {
      val direct = li.agg(
        count(col(c)), sum(when(col(c).isNull, 1L).otherwise(0L)),
        countDistinct(col(c)),
        round(avg(col(c)) + lit(1e-8), 4)).head()
      assert(n == direct.getLong(0), s"$c n")
      assert(nNull == direct.getLong(1), s"$c n_null")
      assert(nd == direct.getLong(2), s"$c n_distinct")
      assert(mean == direct.getDouble(3), s"$c mean")
    }
  }

  test("q42 profiles every column in one scan (single Expand, partial aggs)") {
    val p = SparkEntry.queries("q42_profile")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(p).size >= 1, "distincts should share one Expand")
    assert(p.contains("partial_"))
    assert("FileScan".r.findAllIn(p).size <= 1, "profiling must be one scan")
  }
}
