package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** d04/d10 density-derived length-band widths: the ladder's Spark/Scala
  * agreement, gate-scale invariance (the derived widths equal the old
  * fixed constants, so gate results are unchanged), and bounded block
  * sizes on a 10x corpus — the property the fixed widths lacked.
  */
class BandWidthSpec extends AnyFunSuite with SparkFixture {

  private val Configs = Seq(
    ("d04", Dedup.CharBandBase, Dedup.CharBandMin),
    ("d10", Dedup.NgramBandBase, Dedup.NgramBandMin))

  test("the SQL width ladder agrees with the Scala twin for both configs") {
    val sp = spark
    import sp.implicits._
    val ns = Seq(1L, 500L, 512L, 513L, 1024L, 2000L, 5000L, 20000L,
      200000L, 1000000L, 100000000L)
    for ((tag, base, minW) <- Configs) {
      val fromSql = ns.toDF("corpus_n")
        .selectExpr("corpus_n",
          Dedup.lenBandWidthCase("corpus_n", base, minW) + " AS w")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      ns.foreach { n =>
        assert(fromSql(n) == Dedup.lenBandWidth(base, minW, n),
          s"$tag ladder disagrees at n=$n")
        assert(fromSql(n) >= minW && fromSql(n) <= base)
      }
    }
  }

  test("derived widths equal the historic constants at gate counts") {
    // sf0.001/sf0.01 have 500 docs <= LenBandRef, so the gate outputs
    // (and their DuckDB hashes) are identical to the fixed-width rounds'
    for ((tag, base, minW) <- Configs; n <- Seq(1L, 500L, Dedup.LenBandRef))
      assert(Dedup.lenBandWidth(base, minW, n) == base,
        s"$tag width moved at gate count $n")
  }

  test("width halves per count doubling, so block density stays flat") {
    for ((tag, base, minW) <- Configs) {
      var n = Dedup.LenBandRef
      var w = base
      while (w > minW) {
        val next = Dedup.lenBandWidth(base, minW, n + 1) // just past the step
        assert(next == math.max(minW, w / 2),
          s"$tag: expected width ${math.max(minW, w / 2)} just past n=$n, got $next")
        n = n * 2
        w = math.max(minW, w / 2)
      }
    }
  }

  test("a 10x corpus keeps block sizes bounded under the derived width") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "lang", "text")
    // 10 shifted-id copies with copy-dependent padding, so lengths stay
    // DIVERSE like independently-grown corpora (same-length exact copies
    // would co-band at any width — that floor is the true-dup cluster
    // size, d01's job, not the band parameter's)
    val rep10 = (0 until 10).map(i => docs.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("source"), col("lang"),
        concat(col("text"), lit(" " + "x" * (i * 13))).as("text")))
      .reduce(_ union _)

    def maxBlock(df: DataFrame, w: Int): Long = df
      .groupBy(col("source"), col("lang"),
               (length(col("text")) / w).cast("int").as("len_band"))
      .count().agg(max("count")).head.getLong(0)

    for ((tag, base, minW) <- Configs) {
      val n1 = docs.count()
      val n10 = rep10.count()
      val at1 = maxBlock(docs, Dedup.lenBandWidth(base, minW, n1))
      val adaptive = maxBlock(rep10, Dedup.lenBandWidth(base, minW, n10))
      val fixed = maxBlock(rep10, base)
      info(s"$tag: max block at 1x = $at1, at 10x adaptive = $adaptive, at 10x fixed = $fixed")
      // the parameter holds the worst block near its 1x size (pair work
      // per block is size^2 — this is the whole point of the ladder) ...
      assert(adaptive <= at1 * 2,
        s"$tag: 10x adaptive max block $adaptive vs 1x $at1 — not bounded")
      // ... where the fixed width demonstrably does not
      assert(fixed >= adaptive * 2,
        s"$tag: fixed width's 10x max block $fixed no worse than adaptive $adaptive" +
          " — the parameter buys nothing on this corpus")
    }
  }
}
