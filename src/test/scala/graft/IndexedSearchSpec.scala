package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** q46_indexed_search — the properties the gate hash (same oracle as
  * q33) can't carry: the probe is INDEX-ONLY (it never opens a catalog
  * file, and of the index it opens only the probed gram partitions),
  * and the index builds once per catalog content stamp.
  */
class IndexedSearchSpec extends AnyFunSuite with SparkFixture {

  private val d = "/root/testdata/sf0.01"

  test("indexed search == scan search, row for row") {
    assume(new java.io.File(d).isDirectory)
    val scan = SparkEntry.queries("q33_item_search_norm")(spark, d)
      .collect().map(_.toString).toSeq
    val idx = SparkEntry.queries("q46_indexed_search")(spark, d)
      .collect().map(_.toString).toSeq
    assert(idx == scan, s"indexed path diverged: ${idx.size} vs ${scan.size} rows")
    assert(scan.nonEmpty, "gate term matches nothing at this SF")
  }

  test("the probe is index-only and partition-pruned to the probed grams") {
    assume(new java.io.File(d).isDirectory)
    val df = Relational.indexedSearch(spark, d, "widget")
    df.collect()
    // inputFiles reports the relation pre-pruning; the executed scan's
    // metrics report what was actually opened
    val files = df.inputFiles.toSeq
    assert(files.nonEmpty)
    assert(!files.exists(_.contains("part.parquet")),
      s"probe touched the catalog:\n${files.filter(_.contains("part.parquet")).take(3)}")
    // AQE nests materialized stages (QueryStageExec) under the adaptive
    // root — walk every nested plan to reach the actual file scan
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          scans(r.child)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("no file scan in the probe plan"))
    assert(scan.toString.contains("PartitionFilters") &&
           scan.toString.contains("g1"),
      s"no g1 partition filter on the scan:\n${scan.toString.take(1500)}")
    // trigrams of "widget": wid idg dge get -> first chars w, i, d, g
    val allowed = Set("w", "i", "d", "g")
    val idxDir = Relational.searchIndexDir(spark, d)
    val allowedFiles = allowed.toSeq.map { c =>
      Option(new java.io.File(s"$idxDir/g1=$c").listFiles())
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }.sum
    val opened = scan.metrics("numFiles").value
    assert(opened > 0 && opened <= allowedFiles,
      s"probe opened $opened files but the probed grams span only " +
        s"$allowedFiles — an unprobed partition was read")
  }

  test("the index builds once per catalog stamp and is reused") {
    assume(new java.io.File(d).isDirectory)
    val dir = Relational.searchIndexDir(spark, d)
    val success = java.nio.file.Paths.get(dir, "_SUCCESS")
    val t0 = java.nio.file.Files.getLastModifiedTime(success)
    Relational.indexedSearch(spark, d, "widget").collect()
    Relational.indexedSearch(spark, d, "gizmo").collect()
    assert(java.nio.file.Files.getLastModifiedTime(success) == t0,
      "a repeated search rebuilt the index")
  }

  test("a different term probes correctly (no widget-specific baking)") {
    assume(new java.io.File(d).isDirectory)
    val sp = spark
    // recompute the scan answer for 'gizmo' inline
    import org.apache.spark.sql.functions._
    val scan = graft.sources.Tables.part(sp, d)
      .withColumn("norm_name", lower(col("p_name")))
      .filter(instr(Relational.normName(col("p_name")), "gizmo") > 0)
      .count()
    val idx = Relational.indexedSearch(sp, d, "gizmo").count()
    assert(idx == scan, s"gizmo: indexed $idx != scan $scan")
    assert(idx > 0, "gizmo matches nothing at this SF")
  }
}
