package graft

import org.scalatest.funsuite.AnyFunSuite

/** d41_containment_dedup — the planted semantics on a hand corpus fed
  * through the gate pipeline shape: a tweet quoted whole inside an
  * article is dropped with the article as container (high containment,
  * LOW Jaccard — the case near-dup dedup misses); a half-contained doc
  * survives; the larger doc always wins; disjoint docs never pair.
  */
class ContainmentSpec extends AnyFunSuite with SparkFixture {

  test("fragments drop, partial overlaps survive, supersets win") {
    val sp = spark
    import sp.implicits._
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i$tag")
    val tweet = words("tw", 12)
    val article = (words("ar", 30) ++ tweet ++ words("az", 30))
    val half = (tweet.take(6) ++ words("hf", 10))
    val loner = words("ln", 15)
    val rows = Seq(
      (1L, "src0", article.mkString(" ")),
      (2L, "src0", tweet.mkString(" ")),   // fully inside 1 -> drops
      (3L, "src0", half.mkString(" ")),    // ~40% inside -> survives
      (4L, "src0", loner.mkString(" ")))   // disjoint -> survives
      .toDF("doc_id", "source", "text")
    rows.createOrReplaceTempView("d41spec_docs")

    // drive the gate plan over the hand corpus by pointing the same
    // code at a scratch dir holding it as documents.parquet
    val dir = java.nio.file.Files.createTempDirectory("d41spec")
    rows.write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val out = SparkEntry.queries("d41_containment_dedup")(
        spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(out.map(_._1).toSeq == Seq(2L),
      s"exactly the contained tweet must drop (got ${out.toSeq})")
    val (_, container, cont) = out.head
    assert(container == 1L, "the article must be the container")
    assert(cont >= 0.9, s"containment of a verbatim quote was $cont")

    // Jaccard between tweet and article is LOW — the pair near-dup
    // dedup would not have merged
    val j = 10.0 / (70.0 + 10.0 - 10.0) // shingle counts, approx
    assert(j < 0.3)
  }
}
