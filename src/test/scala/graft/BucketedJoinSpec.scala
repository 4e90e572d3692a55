package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The bucketed-lake co-located join story: at 100 TB the fact tables are
  * written into the lake bucketed (and sorted) by their join key ONCE, and
  * every downstream join on that key then runs with ZERO shuffle on both
  * sides — the per-bucket files align, so the join is a local merge of
  * co-located buckets. This spec demonstrates the whole path on the real
  * tables: write orders and lineitem bucketed by the order key, join them,
  * and assert (a) the result matches the plain shuffled join, and (b) the
  * executed plan contains NO shuffle exchange.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkFixture {

  test("orders-lineitem join over bucketed lake tables runs shuffle-free") {
    assume(new java.io.File(sfDir).isDirectory)
    val buckets = 8
    // broadcast would bypass the bucket demonstration; force a merge join
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sfDir).write
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_orders_bkt")
      Tables.lineitem(spark, sfDir).write
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_lineitem_bkt")

      // the join alone: its whole executed plan must be exchange-free
      // (the downstream aggregate/sort shuffle on OTHER keys as usual —
      // what bucketing removes is the join's own two corpus shuffles)
      val bare = spark.table("graft_orders_bkt")
        .join(spark.table("graft_lineitem_bkt"),
              col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_orderpriority", "l_extendedprice")
      bare.write.format("noop").mode("overwrite").save()
      val plan = bare.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffled:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")

      val joined = spark.table("graft_orders_bkt")
        .join(spark.table("graft_lineitem_bkt"),
              col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
             round(sum("l_extendedprice") + lit(1e-6), 2).as("rev"))
        .orderBy("o_orderpriority")
      val rows = joined.collect()

      // same numbers as the plain (shuffling) join over the raw parquet
      val plain = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir),
              col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
             round(sum("l_extendedprice") + lit(1e-6), 2).as("rev"))
        .orderBy("o_orderpriority")
        .collect()
      assert(rows.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
      assert(rows.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
      spark.sql("DROP TABLE IF EXISTS graft_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_bkt")
    }
  }
}
