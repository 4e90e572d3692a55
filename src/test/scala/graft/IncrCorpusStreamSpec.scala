package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Lake, Pipeline}

import java.nio.file.{Files, Paths}

/** s20's restart-under-fire proof (CdcStreamRestartSpec's discipline on
  * the incremental corpus tick): a tick killed AFTER its artifact
  * versions landed but BEFORE the source offset committed must, on
  * restart, rewrite the SAME versions from the same input — state and
  * bench at v{b+1}, the t{b+1} index slices — and the lake patch must
  * CONVERGE (the replayed diff runs against the already-patched lake
  * and applies nothing). Then a second tick lands, and the final lake
  * must equal the from-scratch p01 rebuild over all three corpora.
  */
class IncrCorpusStreamSpec extends AnyFunSuite with SparkFixture {

  private def oneFile(df: DataFrame, dest: String): Unit = {
    val tmp = Files.createTempDirectory("graft_s20_tick").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(dest).getParent)
    Files.move(part.toPath, Paths.get(dest))
    Lake.deleteTree(Paths.get(tmp))
  }

  private def awaitQuiesce(): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(spark.streams.active.isEmpty, "prior query did not deregister")
  }

  private def snap(dir: String): Seq[String] =
    spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq

  test("s20 replayed tick rewrites the same artifact versions; lake converges") {
    val sp = spark
    import sp.implicits._
    def doc(i: Long, tag: String) = (i, "src0",
      "the " + ('a' to 'l').map(c => s"$tag$i$c$c").mkString(" "))
    val baseRows = (1L to 24L).map(doc(_, "m"))
    // tick 0 carries a fresh doc plus an exact dup of a base doc (the
    // replayed tick must not re-steal or double-count anything); tick 1
    // is pure growth
    val t0Rows = Seq(doc(31L, "m"), (32L, "src0", doc(7L, "m")._3))
    val t1Rows = Seq(doc(41L, "m"), doc(42L, "m"))

    val base = Files.createTempDirectory("graft_s20_restart").toString
    try {
      Pipeline.p02Build1(spark, baseRows.toDF("doc_id", "source", "text"),
        s"$base/b")

      def start() = {
        val schema = spark.read.parquet(s"$base/feed").schema
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
          .writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            Pipeline.p02Tick(spark, s"$base/b", batch, batchId)
            ()
          }
          .start()
      }

      // phase 1: tick 0 lands; v1 artifacts written and committed
      oneFile(t0Rows.toDF("doc_id", "source", "text"),
        s"$base/feed/tick0.parquet")
      val q1 = start()
      try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
      awaitQuiesce()
      val state1Before = snap(s"$base/b/state/v1")
      val bench1Before = snap(s"$base/b/bench/v1")
      val lakeBefore = snap(s"$base/b/lake")

      // the kill window: versions written, offset recorded, commit lost
      assert(Files.deleteIfExists(Paths.get(s"$base/ckpt/commits/0")),
        "test setup: batch 0's commit record should exist")
      Files.deleteIfExists(Paths.get(s"$base/ckpt/commits/.0.crc"))

      // phase 2: restart replays tick 0, then tick 1 arrives
      val q2 = start()
      try {
        q2.processAllAvailable()
        assert(snap(s"$base/b/state/v1") == state1Before,
          "replayed tick must rewrite state/v1 bit-identically")
        assert(snap(s"$base/b/bench/v1") == bench1Before,
          "replayed tick must rewrite bench/v1 bit-identically")
        assert(snap(s"$base/b/lake") == lakeBefore,
          "the replayed lake patch must converge (empty changelog)")
        oneFile(t1Rows.toDF("doc_id", "source", "text"),
          s"$base/feed/tick1.parquet")
        q2.processAllAvailable()
      } finally { q2.stop(); q2.awaitTermination() }
      awaitQuiesce()

      val versions = new java.io.File(s"$base/b/state").listFiles()
        .map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toInt).sorted
      assert(versions.toSeq == Seq(0, 1, 2),
        s"replay must not mint extra versions: ${versions.mkString(",")}")

      // final lake == the from-scratch rebuild over all three corpora
      val expect = Pipeline.p01Build(spark,
          (baseRows ++ t0Rows ++ t1Rows).toDF("doc_id", "source", "text"),
          "s20specref", "s20-restart-stamp")
        .collect().map(_.toString).sorted.toSeq
      val got = spark.read.parquet(s"$base/b/lake")
        .select("doc_id", "source", "split", "n_tokens", "shard",
                "bin_id", "bin_offset")
        .collect().map(_.toString).sorted.toSeq
      assert(got == expect,
        "streamed ticks across the restart must equal the full rebuild")
    } finally Lake.deleteTree(Paths.get(base))
  }
}
