package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lake

import java.nio.file.{Files, Paths}

/** s19's restart-under-fire proof (judge r11 #8): the CDC stream's
  * versioned-idempotence claim — a batch killed AFTER its snapshot
  * version landed but BEFORE the source offset committed must, on
  * restart, REWRITE the same version from the same input rather than
  * double-applying the changelog. Simulated exactly: run tick 0 to
  * completion, delete the checkpoint's commit record (offsets stay),
  * restart — Spark replays batch 0 — then feed tick 1. Run under both
  * state-store providers (the leg carries no keyed state, so this also
  * pins that provider choice cannot perturb a foreachBatch pipeline).
  */
class CdcStreamRestartSpec extends AnyFunSuite with SparkFixture {

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  private val providers = Seq(
    "hdfs" -> None,
    "rocksdb" -> Some(GraftSession.RocksDbProvider))

  /** Write `df` as exactly one parquet FILE at `dest` (the file stream's
    * one-file-per-tick contract).
    */
  private def oneFile(df: DataFrame, dest: String): Unit = {
    val tmp = Files.createTempDirectory("graft_cdc_tick").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(dest).getParent)
    Files.move(part.toPath, Paths.get(dest))
    Lake.deleteTree(Paths.get(tmp))
  }

  for ((provName, confValue) <- providers)
  test(s"s19 replayed batch rewrites the same version, never double-applies ($provName)") {
    val sp = spark
    import sp.implicits._
    val before = spark.conf.getOption(ProviderConf)
    confValue.foreach(spark.conf.set(ProviderConf, _))
    val base = Files.createTempDirectory(s"graft_cdc_restart_$provName").toString
    try {
      val v0 = (1L to 20L).map(i => (i, "src0", s"doc number $i body"))
        .toDF("doc_id", "source", "text")
      v0.write.mode("overwrite").parquet(s"$base/snap/v0")

      val tick0 = Seq(
        ("D", 2L, "src0", ""), ("D", 4L, "src0", ""),
        ("U", 6L, "src0", "doc number 6 REVISED"),
        ("U", 102L, "src0", "doc number 102 inserted"))
        .toDF("op", "doc_id", "source", "text")
      val tick1 = Seq(
        ("D", 1L, "src0", ""),
        ("U", 7L, "src0", "doc number 7 REVISED"),
        ("U", 101L, "src0", "doc number 101 inserted"))
        .toDF("op", "doc_id", "source", "text")

      def start() = {
        val schema = tick0.schema
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$base/stage")
          .writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            Lake.cdcMerge(
                spark.read.parquet(s"$base/snap/v$batchId"), batch)
              .write.mode("overwrite").parquet(s"$base/snap/v${batchId + 1}")
            ()
          }
          .start()
      }

      // a stopped query deregisters asynchronously; starting the next
      // one against the same checkpoint before that races the manager's
      // "concurrently using" guard
      def awaitQuiesce(): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(spark.streams.active.isEmpty, "prior query did not deregister")
      }

      // phase 1: tick 0 lands, v1 is written and committed
      oneFile(tick0, s"$base/stage/tick0.parquet")
      val q1 = start()
      try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
      awaitQuiesce()
      val v1Before = spark.read.parquet(s"$base/snap/v1")
        .collect().map(_.toString).sorted.toSeq

      // the kill: version written, offset recorded, COMMIT lost — the
      // exact window where a naive sink would double-apply on restart.
      // (ChecksumFileSystem keeps a .crc sibling; leaving it behind
      // makes the replayed commit's rename fail as "already exists")
      assert(Files.deleteIfExists(Paths.get(s"$base/ckpt/commits/0")),
        "test setup: batch 0's commit record should exist")
      Files.deleteIfExists(Paths.get(s"$base/ckpt/commits/.0.crc"))

      // phase 2: restart replays batch 0, then tick 1 arrives
      val q2 = start()
      try {
        q2.processAllAvailable() // replay of batch 0 rewrites v1
        oneFile(tick1, s"$base/stage/tick1.parquet")
        q2.processAllAvailable()
      } finally { q2.stop(); q2.awaitTermination() }
      awaitQuiesce()

      val v1After = spark.read.parquet(s"$base/snap/v1")
        .collect().map(_.toString).sorted.toSeq
      assert(v1After == v1Before,
        "the replayed batch must rewrite v1 bit-identically (pure " +
          "function of v0 and tick 0), not re-merge on top of it")

      val versions = new java.io.File(s"$base/snap").listFiles()
        .map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toInt).sorted
      assert(versions.toSeq == Seq(0, 1, 2),
        s"replay must not mint extra versions: ${versions.mkString(",")}")

      // final state == one batch merge of the full changelog
      val expect = Lake.cdcMerge(v0, tick0.unionByName(tick1))
        .collect().map(_.toString).sorted.toSeq
      val got = spark.read.parquet(s"$base/snap/v2")
        .collect().map(_.toString).sorted.toSeq
      assert(got == expect,
        "chained stream merges across the restart must equal the batch merge")
    } finally {
      before match {
        case Some(v) => spark.conf.set(ProviderConf, v)
        case None => spark.conf.unset(ProviderConf)
      }
      Lake.deleteTree(Paths.get(base))
    }
  }
}
