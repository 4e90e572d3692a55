package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** d34_bpe_train — the whole training loop replayed independently in
  * Scala from the same word-frequency table, plus a hand corpus whose
  * merge sequence is known arithmetically (including the overlapping-
  * occurrence case the greedy fold must handle non-overlapping).
  */
class BpeTrainSpec extends AnyFunSuite with SparkFixture {

  /** Reference implementation: Sennrich BPE over a word-freq map. */
  private def replay(freqs: Map[String, Long],
      k: Int): Seq[(Int, String, String, String, Long)] = {
    var words = freqs.map { case (w, f) => w.map(_.toString).toVector -> f }.toSeq
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sym, f) =>
        sym.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.sortBy { case ((l, rr), c) => (-c, l, rr) }.head
        out += ((r, a, b, a + b, n))
        words = words.map { case (sym, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          sym.foreach { t =>
            if (acc.nonEmpty && acc.last == a && t == b) acc(acc.size - 1) = a + b
            else acc += t
          }
          acc.toVector -> f
        }
      }
    }
    out.toSeq
  }

  private def trained(docs: org.apache.spark.sql.DataFrame, k: Int) =
    graft.operators.TextAnalysis.bpeTrain(spark, docs, k)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("hand corpus trains the arithmetically known merge sequence") {
    val sp = spark
    import sp.implicits._
    // "low" x5, "lower" x2, "newest" x6, "widest" x3  (the textbook set)
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
            Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val want = replay(freqs, 5)
    val got = trained(docs, 5)
    assert(got == want, s"got $got want $want")
    // round 1 must be the 9-count (e,s) or (s,t) tie broken pair-asc:
    // es=9, st=9 -> (e,s) wins lexically
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._5 == 9L)
  }

  test("overlapping occurrences merge non-overlapping (aaaa under (a,a))") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val got = trained(docs, 2)
    // counting phase sees 3 overlapping (a,a) pairs x freq 3 = 9, but the
    // greedy fold must produce [aa, aa]: round 2 then merges (aa, aa)
    assert(got(0) == (1, "a", "a", "aa", 9L), got.toString)
    assert(got(1) == (2, "aa", "aa", "aaaa", 3L), got.toString)
  }

  test("sf0.001 training equals the independent Scala replay") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val freqs = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = replay(freqs, 8)
    val got = trained(docs, 8)
    assert(got == want, s"training diverged from the replay:\n$got\n$want")
    assert(got.size == 8)
  }
}
