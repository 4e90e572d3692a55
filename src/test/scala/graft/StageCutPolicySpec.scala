package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The size-gated stage-materialization policy (Lake.stageCutAuto):
  * under the conf'd byte bound a scratch stage is an eager
  * localCheckpoint (lineage cut, no files); above it the stage lands as
  * durable scratch parquet (recoverable on a cluster). Both arms must
  * return the same rows and a flat (lineage-cut) plan.
  */
class StageCutPolicySpec extends AnyFunSuite with SparkFixture {
  import graft.operators.Lake

  private def df = {
    val sp = spark
    import sp.implicits._
    (1L to 100L).map(i => (i, s"row_$i")).toDF("doc_id", "payload")
  }

  test("under the bound: localCheckpoint, nothing written to the spill dir") {
    val spill = java.nio.file.Files.createTempDirectory("graft_cutspec")
      .toString + "/stage_local"
    val cut = Lake.stageCutAuto(spark, df, spill) // default bound 256 MB
    assert(cut.count() == 100L)
    assert(!new java.io.File(spill).exists(),
      "small stage must not pay a parquet round trip")
    // lineage is cut: the analyzed plan roots at a checkpointed RDD scan
    val root = cut.queryExecution.analyzed
    assert(root.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      s"expected a LogicalRDD root, got ${root.getClass.getSimpleName}")
  }

  test("a stage over the bound takes the durable disk path, same rows") {
    val spill = java.nio.file.Files.createTempDirectory("graft_cutspec")
      .toString + "/stage_disk"
    spark.conf.set("spark.graft.stage.localMaxBytes", "0")
    try {
      val cut = Lake.stageCutAuto(spark, df, spill)
      val files = new java.io.File(spill).listFiles()
      assert(files != null && files.exists(_.getName.endsWith(".parquet")),
        "forced-durable stage must land parquet files in the spill dir")
      assert(cut.select("doc_id", "payload").collect().map(r =>
          (r.getLong(0), r.getString(1))).sorted.toSeq ==
        (1L to 100L).map(i => (i, s"row_$i")))
    } finally spark.conf.unset("spark.graft.stage.localMaxBytes")
  }
}
