package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The bucketed-lake demonstration for d24: in production the index-side
  * artifacts (fingerprint index, band-key index, shingle index) are lake
  * tables written ONCE, when documents entered the corpus — so the
  * per-crawl probe must be able to join them WITHOUT re-shuffling the
  * index. This spec writes the three artifacts bucketed on their join
  * keys, plus the batch-side probes bucketed the same way (a batch-sized
  * write a real pipeline does per crawl), and asserts:
  *
  *  1. the exact-dup probe (fp join) and the LSH candidate probe
  *     (band-key join) each plan as a SortMergeJoin over `Bucketed: true`
  *     scans with ZERO Exchange nodes — the join cost at 100 TB is the
  *     batch's sort, never a corpus shuffle;
  *  2. the full d24 pipeline re-run from the bucketed tables produces
  *     exactly the gate entry's output (the pipeline's remaining
  *     exchanges — candidate distinct, near-match groupBy — are all on
  *     batch-sized frames, which is the design's point).
  */
class IncrementalDedupLakeSpec extends AnyFunSuite with SparkFixture {

  test("d24 index probes join bucketed lake artifacts shuffle-free; output identical") {
    assume(new java.io.File(sfDir).isDirectory)
    val buckets = 8
    // broadcast would bypass the bucket demonstration; force merge joins
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val tables = Seq("d24_fp_idx_bkt", "d24_band_idx_bkt", "d24_sh_idx_bkt",
                     "d24_fp_bat_bkt", "d24_band_bat_bkt")
    try {
      val (batchFp, shBat, fpIdx, bandIdx, shIdx) =
        Dedup.d24Artifacts(spark, sfDir)
      // the lake: index artifacts bucketed on their probe keys
      fpIdx.write.bucketBy(buckets, "fp").sortBy("fp")
        .mode("overwrite").saveAsTable("d24_fp_idx_bkt")
      bandIdx.write.bucketBy(buckets, "band_id", "band_sig")
        .sortBy("band_id", "band_sig")
        .mode("overwrite").saveAsTable("d24_band_idx_bkt")
      shIdx.write.bucketBy(buckets, "i_id").sortBy("i_id")
        .mode("overwrite").saveAsTable("d24_sh_idx_bkt")
      // today's crawl, written bucketed the same way (batch-sized writes)
      batchFp.write.bucketBy(buckets, "fp").sortBy("fp")
        .mode("overwrite").saveAsTable("d24_fp_bat_bkt")
      Dedup.minhashBands(shBat).toDF("b_id", "band_id", "band_sig")
        .write.bucketBy(buckets, "band_id", "band_sig")
        .sortBy("band_id", "band_sig")
        .mode("overwrite").saveAsTable("d24_band_bat_bkt")

      def assertShuffleFree(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"$what: expected merge join:\n$plan")
        assert(!plan.contains("Exchange"), s"$what still shuffled:\n$plan")
        assert(plan.contains("Bucketed: true"), s"$what scan not bucketed:\n$plan")
      }
      assertShuffleFree(
        spark.table("d24_fp_bat_bkt")
          .join(spark.table("d24_fp_idx_bkt"), Seq("fp"), "left")
          .select("doc_id", "exact_match"),
        "exact-dup fp probe")
      assertShuffleFree(
        spark.table("d24_band_bat_bkt")
          .join(spark.table("d24_band_idx_bkt"), Seq("band_id", "band_sig"))
          .select("b_id", "i_id"),
        "LSH band-key probe")

      // the full verdict pipeline, index side read from the lake tables
      val fromLake = Dedup.d24Verdicts(
          spark.table("d24_fp_bat_bkt"), shBat,
          spark.table("d24_fp_idx_bkt"), spark.table("d24_band_idx_bkt"),
          spark.table("d24_sh_idx_bkt"))
        .collect().map(_.toSeq)
      val gate = SparkEntry.queries("d24_incremental_dedup")(spark, sfDir)
        .collect().map(_.toSeq)
      assert(fromLake.nonEmpty, "empty verdict set; spec is vacuous")
      assert(fromLake.toSeq == gate.toSeq,
        s"lake-backed probe diverges from the gate: " +
          s"lake=${fromLake.take(2)} gate=${gate.take(2)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
