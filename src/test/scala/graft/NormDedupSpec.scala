package graft

import org.scalatest.funsuite.AnyFunSuite

/** d25_norm_dedup behavior on REAL case/punctuation/spacing variants
  * (the driver corpus is already lowercase and punctuation-free, so its
  * gate rows are all singleton groups): a synthetic documents table
  * whose texts collapse under normalization, with hand-computed groups.
  */
class NormDedupSpec extends AnyFunSuite with SparkFixture {

  test("d25 collapses case/punct/whitespace variants to one keeper") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // group A: four ways to write the same sentence
      (10L, "The quick brown fox."),
      (11L, "the quick   brown fox"),
      (12L, "THE QUICK BROWN FOX!?"),
      (13L, "  the quick brown fox;  "),
      // group B: byte-identical copies (1 raw variant, 2 copies)
      (20L, "spark shuffles partitions"),
      (21L, "spark shuffles partitions"),
      // group C: singleton — punctuation INSIDE a word stays distinct
      (30L, "sp.ark shuffles partitions"),
      (31L, "unique document"))
    val dir = java.nio.file.Files.createTempDirectory("graft_norm").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("d25_norm_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // group C note: stripping '.' inside "sp.ark" yields "spark ..." which
    // EQUALS group B's normalized text — so 30 joins B's group
    val expected = Map(
      10L -> ((4L, 4L)), // 4 copies, 4 distinct raw texts
      20L -> ((3L, 2L)), // 20, 21 byte-identical + 30's normalized join
      31L -> ((1L, 1L)))
    assert(got == expected,
      s"groups diverge: got $got expected $expected")
  }
}
