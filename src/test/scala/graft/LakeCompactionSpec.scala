package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.Lake

/** l01_compact_lake — the layout claims, asserted: the debris really is
  * the pathological form (every file spans every month), compaction really
  * yields one file per partition, a month predicate really prunes to one
  * directory at PLANNING time, and dynamic partition overwrite rewrites
  * only the touched month.
  */
class LakeCompactionSpec extends AnyFunSuite with SparkFixture {

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  private lazy val base: String = {
    val b = Lake.writeRawDebris(spark, sfDir)
    Lake.compact(spark, b)
    b
  }

  test("debris is 64 files; compacted is exactly one file per month") {
    assert(parquetFiles(s"$base/raw").size == 64)
    val byMonth = parquetFiles(s"$base/compacted")
      .groupBy(_.getParentFile.getName)
    assert(byMonth.nonEmpty && byMonth.keys.forall(_.startsWith("month=")))
    byMonth.foreach { case (m, fs) =>
      assert(fs.size == 1, s"$m has ${fs.size} files after compaction")
    }
  }

  test("a month filter prunes the compacted scan to one partition") {
    val months = spark.read.parquet(s"$base/compacted")
      .select("month").distinct().collect().map(_.getString(0)).sorted
    val df = spark.read.parquet(s"$base/compacted")
      .filter(col("month") === months.head)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")
  }

  test("compaction preserves content exactly") {
    val src = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val back = spark.read.parquet(s"$base/compacted")
      .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(back.sameElements(src))
  }

  test("dynamic partition overwrite rewrites only the touched month") {
    val touched = spark.read.parquet(s"$base/compacted")
      .select("month").distinct().orderBy("month")
      .collect().map(_.getString(0)).head
    val before = parquetFiles(s"$base/compacted")
      .map(f => f.getParentFile.getName -> f.getName).toSet
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.read.parquet(s"$base/compacted")
        .filter(col("month") === touched)
        .repartition(col("month"))
        .write.mode("overwrite").partitionBy("month")
        .parquet(s"$base/compacted")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = parquetFiles(s"$base/compacted")
      .map(f => f.getParentFile.getName -> f.getName).toSet
    val untouchedBefore = before.filterNot(_._1 == s"month=$touched")
    val untouchedAfter = after.filterNot(_._1 == s"month=$touched")
    assert(untouchedAfter == untouchedBefore,
      "dynamic overwrite must leave untouched partitions' files in place")
    assert(after.count(_._1 == s"month=$touched") == 1)
    // leave the lake consistent for any later test in this JVM
    Lake.compact(spark, base)
  }
}
