package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake
import graft.sources.Tables

/** l09_stats_manifest — what the gate hash can't show: that the
  * manifest actually PRUNES (a 2-month window admits a small fraction
  * of the lake's files), that the planned scan opens ONLY admitted
  * files, and that an empty window reads nothing while keeping the
  * schema.
  */
class ManifestSpec extends AnyFunSuite with SparkFixture {

  private lazy val base = {
    val b = java.nio.file.Files.createTempDirectory("l09spec").toString
    Lake.writeManifestLake(spark, Tables.lineitem(spark, sfDir), b)
    b
  }

  test("a 2-month window admits a small fraction of the lake's files") {
    val total = spark.read.parquet(s"$base/lake").inputFiles.length
    val admitted = Lake.manifestAdmitted(spark, base,
      "1995-03-01", "1995-05-01")
    assert(total >= 16, s"layout produced only $total files")
    assert(admitted.nonEmpty, "the window matches data; admission empty")
    assert(admitted.length * 4 <= total,
      s"pruning too weak: ${admitted.length} of $total files admitted " +
        "for a 2-month window of a ~7-year lake")
  }

  test("the planned scan opens only admitted files, result unchanged") {
    val admitted = Lake.manifestAdmitted(spark, base,
      "1995-03-01", "1995-05-01").toSet
    val scan = Lake.manifestScan(spark, base, "1995-03-01", "1995-05-01")
    assert(scan.inputFiles.toSet.subsetOf(admitted),
      "the scan read a file the manifest did not admit")
    val viaManifest = scan.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(_.toString).sorted.toSeq
    val fullScan = spark.read.parquet(s"$base/lake")
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-03-01")) &&
              col("l_shipdate") < to_timestamp(lit("1995-05-01")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaManifest == fullScan,
      "manifest planning changed the answer")
  }

  test("an empty window admits nothing and returns an empty typed frame") {
    val admitted = Lake.manifestAdmitted(spark, base,
      "2050-01-01", "2050-02-01")
    assert(admitted.isEmpty)
    val scan = Lake.manifestScan(spark, base, "2050-01-01", "2050-02-01")
    assert(scan.isEmpty)
    assert(scan.schema == spark.read.parquet(s"$base/lake").schema,
      "empty-window frame must keep the lake schema")
  }
}
