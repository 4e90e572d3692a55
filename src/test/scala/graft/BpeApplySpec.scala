package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** d35_bpe_apply — tokenization under the trained merges replayed
  * independently in Scala: per word, chars folded through the merge list
  * in rank order, counts summed per document.
  */
class BpeApplySpec extends AnyFunSuite with SparkFixture {

  test("per-doc token counts equal a Scala replay under the same model") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val merges = graft.operators.TextAnalysis.trainedMerges(spark, sfDir)
    assert(merges.size == 8)
    def tokenize(w: String): Int = {
      var sym = w.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        sym.foreach { t =>
          if (acc.nonEmpty && acc.last == a && t == b) acc(acc.size - 1) = a + b
          else acc += t
        }
        sym = acc.toVector
      }
      sym.size
    }
    val want = docs.select("doc_id", "text").collect().map { r =>
      val ws = r.getString(1).split("\\s+").filter(_.nonEmpty)
      (r.getLong(0), ws.length.toLong, ws.map(tokenize(_).toLong).sum)
    }.toSet
    val got = SparkEntry.queries("d35_bpe_apply")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // the trained merges must actually compress relative to characters
    val chars = docs.select(sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .head().getLong(0)
    val bpe = got.toSeq.map(_._3).sum
    assert(bpe < chars, s"BPE tokens ($bpe) should undercut characters ($chars)")
  }
}
