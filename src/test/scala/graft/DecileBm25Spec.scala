package graft

import org.scalatest.funsuite.AnyFunSuite

/** d31_quality_deciles and d32_bm25 — behavior re-derived independently in
  * Scala on sf0.001, plus the plan shapes that make each scale: d31 must
  * bucket without ANY window (the naive per-source ntile is q18's
  * low-cardinality-window anti-pattern), d32's global top-10 must be a
  * TakeOrderedAndProject (per-partition heads), never a full sort.
  */
class DecileBm25Spec extends AnyFunSuite with SparkFixture {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  /** Spark/DuckDB shared quantile_cont interpolation at q over sorted xs. */
  private def quantile(xs: Array[Int], q: Double): Double = {
    val pos = (xs.length - 1) * q
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 < xs.length) xs(lo) + frac * (xs(lo + 1) - xs(lo))
    else xs(lo).toDouble
  }

  test("d31 deciles match an independent Scala re-derivation") {
    val got = rows("d31_quality_deciles")
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    val bySource = got.groupBy(_._2)
    assert(bySource.size > 1, "expected several sources in testdata")
    bySource.foreach { case (_, docs) =>
      val sorted = docs.map(_._3).sorted
      val cuts = (1 to 9).map(i =>
        math.round((quantile(sorted, i / 10.0) + 1e-8) * 1e4) / 1e4)
      docs.foreach { case (id, src, nTok, dec) =>
        val expect = 1 + cuts.count(nTok.toDouble > _)
        assert(dec == expect, s"doc $id in $src: n_tok=$nTok got $dec want $expect")
      }
    }
  }

  test("d31 equal metric values always share a bucket (curation semantics)") {
    val got = rows("d31_quality_deciles")
      .map(r => (r.getString(1), r.getInt(2), r.getInt(3)))
    got.groupBy(t => (t._1, t._2)).foreach { case ((src, nTok), g) =>
      assert(g.map(_._3).distinct.size == 1,
        s"value $nTok in $src split across buckets ${g.map(_._3).distinct}")
    }
  }

  test("unknown sources pass through withDecile with decile NULL, never vanish") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val docs = TextAnalysis.withNTok(graft.sources.Tables.documents(spark, sfDir))
    val cuts = TextAnalysis.decileCuts(docs)
    val novel = docs.limit(3).withColumn("source", lit("brand_new_source"))
    val out = TextAnalysis.withDecile(docs.union(novel), cuts)
    // the three novel-source docs survive the left join, with decile NULL
    // as the visible "no model for this source" signal
    val unknown = out.filter(col("source") === "brand_new_source").collect()
    assert(unknown.length == 3, "unknown-source docs must not be dropped")
    assert(unknown.forall(_.isNullAt(unknown.head.fieldIndex("decile"))),
      "unknown sources must carry decile NULL, not a fabricated bucket")
    // and every known-source doc still gets a real bucket
    assert(out.filter(col("source") =!= "brand_new_source" &&
      col("decile").isNull).count() == 0)
  }

  test("d31 buckets without a window; the cut table is broadcast") {
    val p = SparkEntry.queries("d31_quality_deciles")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "decile assignment must not sort the corpus through a window")
    assert(p.contains("BroadcastHashJoin"),
      "the sources x 9 cut table must broadcast, not shuffle the corpus")
  }

  test("d32 BM25 top-10 matches an independent Scala re-derivation") {
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tf = texts.toSeq.flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).groupBy(identity)
        .map { case (term, g) => (id, term, g.length.toLong) }
    }
    val dl = tf.groupBy(_._1).map { case (id, g) => id -> g.map(_._3).sum }
    val nDocs = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nDocs
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val qterms = df.filter(_._1.length >= 4).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(5).map(_._1).toSet
    val scored = tf.filter(t => qterms(t._2))
      .groupBy(_._1).map { case (id, hits) =>
        val s = hits.map { case (_, term, f) =>
          val idf = (nDocs - df(term) + 0.5) / (df(term) + 0.5)
          idf * ((f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl(id) / avgdl))))
        }.sum
        (id, hits.size.toLong, math.round((s + 1e-8) * 1e4) / 1e4)
      }.toSeq
    val want = scored.sortBy { case (id, _, s) => (-s, id) }.take(10)
    val got = rows("d32_bm25").map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && math.abs(g._3 - w._3) < 1e-9,
        s"got $g want $w")
    }
  }

  test("d32 plan: query terms broadcast into the scan; top-10 is a partial top-k") {
    val p = SparkEntry.queries("d32_bm25")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      "global top-10 must be per-partition heads, not a full sort")
    assert(p.contains("BroadcastHashJoin"),
      "query-term and stats tables must broadcast")
    assert(p.contains("partial_"), "index aggregates must combine map-side")
  }
}
