package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.sources.Catalog — ad-hoc SQL over registered table names must see
  * the same data (and the same events-time normalization) as the
  * programmatic registry.
  */
class CatalogSpec extends AnyFunSuite with SparkFixture {

  test("registered views answer ad-hoc SQL over every table") {
    graft.sources.Catalog.register(spark, sfDir)
    val n = spark.sql(
      """SELECT count(*) FROM lineitem
        |JOIN part ON l_partkey = p_partkey""".stripMargin).head().getLong(0)
    assert(n > 0)
    val tables = graft.sources.Catalog.TableNames :+ "events"
    tables.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) > 0, t)
    }
  }

  test("the events view carries the normalized nanos ts and ts_us") {
    graft.sources.Catalog.register(spark, sfDir)
    val r = spark.sql(
      "SELECT ts, ts_us FROM events ORDER BY event_id LIMIT 1").head()
    assert(r.getLong(0) == r.getLong(1) * 1000L,
      "ad-hoc events SQL must see the canonical nanos-long ts + ts_us")
  }

  test("views stay lazy parquet references (pushdown intact)") {
    graft.sources.Catalog.register(spark, sfDir)
    val f = spark.sql("SELECT l_partkey FROM lineitem WHERE l_quantity < 5")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(f.contains("PushedFilters") && f.contains("LessThan"),
      "filter must reach the parquet scan through the view")
  }
}
