package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d40_edit_dedup — the segment filter must be COMPLETE (the pigeonhole
  * guarantees every true pair shares a verbatim segment), the threshold
  * exact at the k boundary, and the candidate stage an equi-join. The
  * gate's DuckDB oracle proves value parity; this spec proves the two
  * things the hash can't: the filter's zero-false-negative claim on an
  * adversarial corpus built to minimize surviving segments, and the
  * brute-force identity on real data.
  */
class EditDedupSpec extends AnyFunSuite with SparkFixture {

  private val K = 8
  private val L = 128

  private def runOn(rows: Seq[(Long, String, String)]) = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d40spec")
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    SparkEntry.queries("d40_edit_dedup")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("matches brute-force all-pairs on the real corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= L)
      .select(col("doc_id"), substring(col("text"), 1, L).as("w"))
    val brute = docs.toDF("a", "wa")
      .crossJoin(docs.toDF("b", "wb"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
              levenshtein(col("wa"), col("wb")).as("lev"))
      .filter(col("lev") <= K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .toSet
    val got = SparkEntry.queries("d40_edit_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"segment filter diverged from brute force: missing=${brute -- got} extra=${got -- brute}")
    assert(brute.nonEmpty, "corpus must contain at least one near pair")
  }

  test("worst-case pair with k edits in k distinct segments is caught") {
    // exactly one segment survives the edit script — the pigeonhole's
    // boundary. Segment i spans [i*L/9, (i+1)*L/9); plant one
    // substitution inside each of segments 0..7, none in segment 8.
    val base = ("the quick brown fox jumps over the lazy dog again and " * 4)
      .take(L)
    val chars = base.toCharArray
    (0 until K).foreach { i => chars(i * L / 9 + 3) = '#' }
    val edited = new String(chars)
    val out = runOn(Seq((1L, "s", base), (2L, "s", edited)))
    assert(out == Seq((1L, 2L, K.toLong)),
      s"k-edit worst case must surface with lev=$K (got $out)")
  }

  test("a pair one edit past the threshold is excluded") {
    val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 4)
      .take(L)
    val chars = base.toCharArray
    (0 to K).foreach { i => chars(i * L / 9 + 2) = '@' } // k+1 edits
    val out = runOn(Seq((1L, "s", base), (2L, "s", new String(chars))))
    assert(out.isEmpty, s"lev=${K + 1} pair must not surface (got $out)")
  }

  test("sub-window docs are out of this tier entirely") {
    // a 40-char near pair belongs to the short tier (whole-string
    // comparison); admitting it here would hand every short doc the
    // same all-space tail segment — one quadratic join key.
    val a = "a tiny document about spark and scala!!"
    val b = "a tiny document about spark and scala??"
    val long1 = ("repeatable filler content for the window " * 4).take(L + 20)
    val out = runOn(Seq((1L, "s", a), (2L, "s", b), (3L, "s", long1)))
    assert(out.isEmpty, s"short docs must not enter the 128-window tier: $out")
  }

  test("candidate stage plans as an equi-join, never a cartesian") {
    val df = SparkEntry.queries("d40_edit_dedup")(spark, sfDir)
    df.collect()
    val bad = df.queryExecution.executedPlan.collect {
      case c: CartesianProductExec        => c.nodeName
      case b: BroadcastNestedLoopJoinExec => b.nodeName
    }
    assert(bad.isEmpty, s"non-equi join in the d40 plan: $bad")
  }
}
