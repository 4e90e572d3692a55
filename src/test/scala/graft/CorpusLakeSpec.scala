package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Ingest, Tables}

/** The dedup-to-trainer loop closed: d14's survivor selection written as
  * a split/source-partitioned, doc_id-bucketed lake (Ingest's layout),
  * the documents bytes written bucketed by the same key — and the join a
  * trainer runs to fetch its bytes proven EXCHANGE-FREE on the executed
  * plan, with the split filter pruning partitions before IO. At 100 TB
  * the selection table is rewritten per curation run while the bytes
  * table is written once; co-located buckets make every rerun's
  * bytes-fetch a local merge instead of two corpus shuffles.
  */
class CorpusLakeSpec extends AnyFunSuite with SparkFixture {

  test("trainer's survivors-to-bytes join over the corpus lake runs shuffle-free") {
    assume(new java.io.File(sfDir).isDirectory)
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val survivors = SparkEntry.queries("d14_corpus_select")(spark, sfDir)
      Ingest.writeCorpusLake(survivors, "graft_corpus_bkt")
      Ingest.writeDocumentLake(
        Tables.documents(spark, sfDir).select("doc_id", "text", "n_chars"),
        "graft_docs_bkt")

      // the read a trainer issues: train-split survivors, joined to bytes
      val trainRead = spark.table("graft_corpus_bkt")
        .filter(col("split") === "train")
        .join(spark.table("graft_docs_bkt"), "doc_id")
        .select("doc_id", "source", "text")
      trainRead.write.format("noop").mode("overwrite").save()
      val plan = trainRead.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"corpus-lake join still shuffled:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      // the split filter must reach the DIRECTORY layer (partition
      // pruning), not run as a row predicate after a full scan
      assert(plan.contains("PartitionFilters") && plan.contains("split"),
        s"split filter did not prune partitions:\n$plan")

      // same rows as the plain shuffled join over the unbucketed frames
      val got = trainRead.collect().map(_.toSeq).toSet
      val plain = survivors.filter(col("split") === "train")
        .join(Tables.documents(spark, sfDir).select("doc_id", "text"), "doc_id")
        .select("doc_id", "source", "text")
        .collect().map(_.toSeq).toSet
      assert(got == plain)
      assert(got.nonEmpty, "no train-split survivors; spec is vacuous")

      // the layout really is one file per (partition, bucket): no
      // write-side fragmentation (the repartition's job)
      val loc = spark.sql("DESCRIBE FORMATTED graft_corpus_bkt")
        .filter(col("col_name") === "Location")
        .collect()(0).getString(1).stripPrefix("file:")
      val parquets = java.nio.file.Files.walk(java.nio.file.Paths.get(loc))
        .filter(_.toString.endsWith(".parquet")).count()
      val partitions = survivors.select("split", "source").distinct().count()
      assert(parquets <= partitions * 8,
        s"$parquets files for $partitions partitions x 8 buckets — write fragmented")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
      spark.sql("DROP TABLE IF EXISTS graft_corpus_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_docs_bkt")
    }
  }
}
