package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake
import graft.sources.GraftTable

/** l13_version_diff: the diff algebra the oracle hash can't express —
  * identity (diff(v,v) = ∅), completeness (re-applying the diff as a
  * changelog reproduces the target version), and loudness on retired
  * versions.
  */
class VersionDiffSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(tag: String): GraftTable = {
    val base = java.nio.file.Files.createTempDirectory(s"l13_$tag").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text")
    val t = GraftTable.create(spark, s"$base/tbl", docs)
    t.merge(Lake.cdcChangelog(t.read()))
    t
  }

  test("diff(v, v) is empty") {
    val t = freshTable("ident")
    assert(t.diff(1, 1).isEmpty)
    assert(t.diff(0, 0).isEmpty)
  }

  test("re-applying diff(0,1) to v0 reproduces v1 exactly") {
    val t = freshTable("apply")
    // a diff row converts to a changelog row: D stays D, I/U become
    // upserts carrying the B side's payload
    val log = t.diff(0, 1).select(
      when(col("op") === "D", "D").otherwise("U").as("op"),
      col("doc_id"), col("b_source").as("source"), col("b_text").as("text"))
    val rebuilt = Lake.cdcMerge(t.readAsOf(0), log)
    val v1 = t.readAsOf(1)
    assert(rebuilt.exceptAll(v1).isEmpty && v1.exceptAll(rebuilt).isEmpty,
      "v0 + diff(0,1) must equal v1 row-for-row")
  }

  test("diff against a vacuumed version fails loudly by name") {
    val t = freshTable("vac")
    t.merge(Lake.cdcChangelog(t.read()).filter(col("doc_id") % 2 === 0))
    t.vacuum(keep = 2)
    val e = intercept[java.util.NoSuchElementException](t.diff(0, 2))
    assert(e.getMessage.contains("retention"))
  }

  test("diff classifies every op with both payload sides") {
    val t = freshTable("ops")
    val d = t.diff(0, 1).cache()
    val ops = d.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("I", "U", "D").subsetOf(ops.keySet), s"got $ops")
    // D rows carry only the A side; I rows only the B side; U both
    assert(d.filter(col("op") === "D" &&
      (col("b_text").isNotNull || col("a_text").isNull)).isEmpty)
    assert(d.filter(col("op") === "I" &&
      (col("a_text").isNotNull || col("b_text").isNull)).isEmpty)
    assert(d.filter(col("op") === "U" &&
      (col("a_text").isNull || col("b_text").isNull)).isEmpty)
    d.unpersist()
  }
}
