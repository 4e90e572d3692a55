package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.sources.Tables

/** q43_skew_join — the planted heavy-hitter fact⋈fact join, on the REAL
  * tables (SkewSpec proves the AQE mechanism on a synthetic frame; this
  * proves it fires on the gate query itself). Two scale-downs to make
  * runtime conditions reachable at test scale:
  *
  *  - the tables are re-laid as MULTI-FILE parquet first: AQE splits a
  *    skewed partition at MAP-OUTPUT granularity, and the driver's
  *    single-row-group gate files give the join's shuffle exactly one
  *    mapper — one indivisible block, nothing to split. Production
  *    lakes are many-files/many-row-groups by construction (l01's
  *    whole point), so the multi-file copy is the realistic shape, not
  *    a trick;
  *  - the skew thresholds drop until the planted key trips them (the
  *    hot partition is well under the production 256 MB default).
  *
  * Asserts the final adaptive plan carries the skew-split markers and
  * that the split changes nothing about the answer (row-identical to
  * the same query with AQE off).
  */
class SkewJoinSpec extends AnyFunSuite with SparkFixture {

  private val d = "/root/testdata/sf0.01"

  test("GraftSession ships the tuned 64 MB skew threshold") {
    // bench/BENCH_skew_probe_r12.json: at sf10 the planted hot partition
    // compresses under the stock 256 MB floor (AQE declines, 17.9 s)
    // but crosses 64 MB (split fires, 7.5 s). GraftSession ships the
    // tuned floor so the committed ladder reflects the split; this leg
    // pins the conf so a revert is loud. (getOrCreate applies the
    // builder's runtime confs onto the shared fixture session — that IS
    // the production default landing; the test-scale knobs it also
    // carries are put back so other suites keep their sizing.)
    val restore = Seq("spark.sql.shuffle.partitions",
        "spark.sql.streaming.minBatchesToRetain")
      .map(k => k -> spark.conf.getOption(k))
    val s = GraftSession.getOrCreate()
    try assert(s.conf.get(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      == "64MB")
    finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q43: AQE splits the planted hot partition and the answer is unchanged") {
    assume(new java.io.File(d).isDirectory)
    val base = java.nio.file.Files.createTempDirectory("graft_skew").toString
    Tables.lineitem(spark, d).repartition(8)
      .write.mode("overwrite").parquet(s"$base/lineitem.parquet")
    Tables.orders(spark, d).repartition(4)
      .write.mode("overwrite").parquet(s"$base/orders.parquet")

    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }

    // baseline: AQE off entirely — the static sort-merge plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val expect =
      try Relational.skewJoinAgg(spark, base).collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = Relational.skewJoinAgg(spark, base)
      val got = q.collect().map(_.toString).toSeq
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"OptimizeSkewedJoin did not fire on the gate query:\n${plan.take(3000)}")
      assert(plan.contains("AQEShuffleRead skewed"),
        s"the hot partition's shuffle read was not skew-split:\n${plan.take(3000)}")
      assert(got == expect,
        "the skew split must not change the aggregated answer")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      graft.operators.Lake.deleteTree(java.nio.file.Paths.get(base))
    }
  }
}
