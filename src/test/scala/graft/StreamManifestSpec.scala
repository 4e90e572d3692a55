package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamQueries

/** s21_stream_manifest — the commit contract the gate hash can't show:
  * a TORN write (data files landed, manifest row missing) is invisible
  * to manifest-planned readers, and a replayed commit rewrites its
  * batch in place instead of duplicating rows.
  */
class StreamManifestSpec extends AnyFunSuite with SparkFixture {

  test("torn data writes stay invisible; replayed commits don't duplicate") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("s21spec").toString
    def rows(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"src${i % 3}", i * 10)).toDF(
        "doc_id", "source", "n_chars")
    // the empty-admission fallback resolves the schema from the feed dir
    rows(1, 1).write.mode("overwrite").parquet(s"$base/feed")

    StreamQueries.s21Commit(spark, base, rows(1, 50), 0L)
    StreamQueries.s21Commit(spark, base, rows(51, 100), 1L)
    def window() = StreamQueries.s21ManifestScan(spark, base, 20L, 80L)
      .collect().map(_.toString).sorted.toSeq
    val before = window()
    assert(before.length == 61)

    // torn write: in-window data lands WITHOUT its manifest commit
    rows(20, 30).write.mode("overwrite").parquet(s"$base/lake/b99")
    assert(window() == before,
      "a data subdir without its manifest must stay invisible")

    // replay: batch 0 commits again (same input) — no duplicates, and
    // the manifest still lists exactly the live files
    StreamQueries.s21Commit(spark, base, rows(1, 50), 0L)
    assert(window() == before,
      "a replayed commit must rewrite its batch, not duplicate it")

    // pruning is real: a window inside batch 1 admits no batch-0 files
    val admitted = StreamQueries.s21ManifestScan(spark, base, 60L, 70L)
      .inputFiles
    assert(admitted.nonEmpty && admitted.forall(_.contains("/b1/")),
      s"window inside batch 1 admitted foreign files: ${admitted.toSeq}")
  }
}
