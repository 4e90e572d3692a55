package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling: a join with one hot key gets its skewed partition
  * split at runtime (the mechanism SURVEY §5 relies on at 100 TB).
  */
class SkewSpec extends AnyFunSuite with SparkFixture {

  test("AQE splits a skewed join partition at runtime") {
    val sp = spark
    import sp.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on ONE key, a handful elsewhere: partition holding key 1
      // dwarfs the median
      val hot = spark.range(200000).select(lit(1L).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val rest = spark.range(2, 50).select(col("id").as("k"),
        concat(lit("x"), col("id")).as("v"))
      val left = hot.unionAll(rest)
      val right = spark.range(1, 50).select(col("id").as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k")
      // collect() executes THIS queryExecution (count() would plan its own)
      assert(joined.collect().length == 200000 + 48)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("skew="), s"no skew handling marker:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
