package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Bucketed co-located joins: pre-bucketing both sides on the join key
  * removes the shuffle entirely — the layout strategy for repeated
  * fact⋈fact joins at 100 TB (dims are broadcast instead; see PlanSpec).
  */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("join of co-bucketed tables plans with no shuffle exchange") {
    val li = Tables.lineitem(spark, sfDir).select("l_partkey", "l_quantity")
    val pt = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_part_bucketed")
    li.write.bucketBy(8, "l_partkey").sortBy("l_partkey")
      .saveAsTable("graft_li_bucketed")
    pt.write.bucketBy(8, "p_partkey").sortBy("p_partkey")
      .saveAsTable("graft_part_bucketed")

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_part_bucketed"),
              col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the only exchange allowed is the post-join aggregation's; the join
      // inputs must read bucketed files directly
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      // result matches the plain (unbucketed) join
      val expected = li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
