package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared operator builds and executes at sf0.001; spot checks pin
  * semantics that the DuckDB oracle can't see (rows-only ops).
  */
class QueriesSpec extends AnyFunSuite with SparkFixture {

  // Every query must plan and run; most must return rows at sf0.001.
  // Pair-finding ops may legitimately be empty at tiny scale.
  // (q14's HAVING threshold and the pair finders can be legitimately empty
  // on 200-part / 500-doc inputs.)
  private val mayBeEmpty = Set("q10_unmet_demand", "q14_having",
    "d02_minhash_lsh", "d03_simhash", "d04_char_jaccard", "d09_embed_dup",
    "d10_ngram_jaccard", "e02_ann_lsh")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns the flagship pricelist") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq ==
      Seq("l_partkey", "n_auctions", "volume", "min_price", "max_price", "avg_price"))
  }

  test("every oracleSql key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q28 miniauction counts re-sum to the lineitem total") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir).count()
    val collapsed = SparkEntry.queries("q28_miniauctions")(spark, sfDir)
      .agg(sum("n_listings")).head.getLong(0)
    assert(collapsed == li)
  }

  test("d01 exact-dedup copy counts re-sum to the documents total") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    val total = SparkEntry.queries("d01_exact_dedup")(spark, sfDir)
      .agg(sum("n_copies")).head.getLong(0)
    assert(total == docs)
  }

  test("d12 vocab rows respect the count floor, and df never exceeds n") {
    val rows = SparkEntry.queries("d12_vocab")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, df) = (r.getLong(2), r.getLong(3))
      assert(n >= 20, s"term below floor: $r")
      assert(df >= 1 && df <= n, s"df out of range: $r")
    }
  }

  test("d15 repetition ratios are in (0, 1.01] and present for non-trivial docs") {
    val rows = SparkEntry.queries("d15_repetition")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getInt(1)
      // epsilon-rounded ratios may exceed 1.0 by at most the epsilon; a
      // doc with edge whitespace can also push word-distinct slightly
      // over its nonwhitespace denominator
      for (i <- 2 to 4 if !r.isNullAt(i)) {
        val v = r.getDouble(i)
        assert(v > 0 && v <= 1.5, s"ratio out of range in $r")
      }
      if (nWords >= 3) assert(!r.isNullAt(4), s"shingle ratio missing in $r")
    }
  }

  test("q30 sketch distinct is within 5% of the exact count per segment") {
    val approx = SparkEntry.queries("q30_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("q08_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (seg, n) =>
      val a = approx(seg)
      assert(math.abs(a - n) <= math.max(1L, (0.05 * n).toLong),
        s"$seg: approx=$a exact=$n")
    }
  }

  test("q32 sketch percentiles land within 2% of the exact values") {
    val approx = SparkEntry.queries("q32_approx_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("q15_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (seg, (m, p90)) =>
      val (am, ap90) = approx(seg)
      val span = math.max(math.abs(p90), 1.0)
      assert(math.abs(am - m) <= 0.02 * span, s"$seg median: $am vs $m")
      assert(math.abs(ap90 - p90) <= 0.02 * span, s"$seg p90: $ap90 vs $p90")
    }
  }

  test("e01 top-k is k rows per query, ranked by descending similarity") {
    val rows = SparkEntry.queries("e01_knn_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 5)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 10)
      val sims = rs.sortBy(_._2).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }
}
