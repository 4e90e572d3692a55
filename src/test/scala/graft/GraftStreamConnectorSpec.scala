package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake
import graft.sources.{GraftTable, Tables}

/** The streaming half of the `format("graft")` connector (s32/s33's
  * contract pieces): `readStream` must tail the version chain with
  * version-number offsets (checkpoint restart resumes EXACTLY at the
  * next step, replaying nothing), the three `startingVersion` positions
  * must select the documented slices, the default mode must carry
  * post-images only while feed mode carries the full CDF, and the sink
  * must own the version chain loudly — batch b ↔ version b+1, refusing
  * a chain that moved underneath it and applying an `op` column as a
  * CDC changelog (deletes at the wire).
  */
class GraftStreamConnectorSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  private def docs: DataFrame =
    Tables.documents(spark, sfDir).select("doc_id", "source", "text")

  /** Normalized CDF projection for order-free comparison. */
  private def norm(df: DataFrame): Seq[String] =
    df.select(col("_commit_version").cast("int").as("v"),
        col("_change_type").as("ct"), col("doc_id"),
        md5(col("text").cast("binary")).as("fp"))
      .orderBy("v", "ct", "doc_id")
      .collect().map(_.toString).toSeq

  private def snapshotAsInserts(t: GraftTable, v: Int): DataFrame =
    t.readAsOf(v)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(v))

  test("CDF stream: earliest replays snapshot+steps; restart resumes at " +
      "the next step only") {
    val dir = tmp("gstream_cdf")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    val log = Lake.cdcChangelog(t.read())
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 0))
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 1))

    // the file sink is the recoverable one (memory sink refuses
    // checkpoint restarts), so the restart leg drains into parquet
    def drainOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .load(s"$dir/tbl")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    drainOnce()
    val expected1 = snapshotAsInserts(t, 0)
      .unionByName(t.changes(0, 2), allowMissingColumns = true)
    assert(norm(spark.read.parquet(s"$dir/out")) == norm(expected1))

    // a third merge lands while the stream is DOWN; the restart (same
    // checkpoint) must deliver step 3 and nothing else — the drained
    // total is exactly expected1 ∪ the one new step
    val extra = log.filter(pmod(col("doc_id"), lit(2)) === 0)
      .withColumn("text", concat(col("text"), lit(" (rev 3)")))
      .filter(col("op") === "U")
    t.merge(extra)
    drainOnce()
    assert(norm(spark.read.parquet(s"$dir/out")) ==
      norm(expected1.unionByName(t.changes(2, 3),
        allowMissingColumns = true)))
  }

  test("default mode carries post-images in the table schema; " +
      "startingVersion int and latest select their slices") {
    val dir = tmp("gstream_post")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    val log = Lake.cdcChangelog(t.read())
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 0))
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 1))

    def drain(name: String, opts: (String, String)*): DataFrame = {
      val r = spark.readStream.format("graft")
      opts.foreach { case (k, v) => r.option(k, v) }
      val q = r.load(s"$dir/tbl")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name)
    }

    def key(df: DataFrame): Seq[String] =
      df.select(col("doc_id"), md5(col("text").cast("binary")))
        .orderBy("doc_id").collect().map(_.toString).toSeq

    // startingVersion=0: the post-images of every step in (0, 2] — the
    // table's schema, no CDF meta columns
    val got = drain("gstream_post_a", "startingVersion" -> "0")
    assert(got.columns.toSeq == t.read().columns.toSeq)
    assert(key(got) == key(t.changes(0, 2)
      .filter(col("_change_type").isin("insert", "update_postimage"))))

    // earliest: v0's snapshot rows arrive too (every key appears)
    val all = drain("gstream_post_b")
    assert(all.count() ==
      t.readAsOf(0).count() + t.changes(0, 2)
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .count())

    // latest: nothing available at start — and the query stays silent
    val none = drain("gstream_post_c", "startingVersion" -> "latest")
    assert(none.count() == 0)

    // a startingVersion beyond the chain is loud
    val e = intercept[Exception] { drain("gstream_post_d",
      "startingVersion" -> "99") }
    assert(e.getMessage != null)
  }

  test("maxStepsPerTrigger bounds every micro-batch to one step and " +
      "loses nothing across the drain") {
    val dir = tmp("gstream_rate")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    val log = Lake.cdcChangelog(t.read())
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 0))
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 1))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("maxStepsPerTrigger", "1")
      .load(s"$dir/tbl")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.synchronized {
          batches += b.select("_commit_version").distinct()
            .collect().map(_.getInt(0)).toSet
        }
        b.write.mode("append").parquet(s"$dir/out")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // three micro-batches — snapshot (v0), step 1, step 2 — one version
    // step each, and the drained union is the full earliest replay
    assert(batches.toSeq == Seq(Set(0), Set(1), Set(2)), batches)
    assert(norm(spark.read.parquet(s"$dir/out")) ==
      norm(snapshotAsInserts(t, 0)
        .unionByName(t.changes(0, 2), allowMissingColumns = true)))
  }

  test("Trigger.AvailableNow drains the backlog in rate-limited batches " +
      "and terminates") {
    val dir = tmp("gstream_avail")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    val log = Lake.cdcChangelog(t.read())
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 0))
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 1))

    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("maxStepsPerTrigger", "1")
      .load(s"$dir/tbl")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow must self-terminate after draining what existed at
    // start — the scheduled-batch shape (cron-driven catch-up runs)
    assert(q.awaitTermination(120000), "AvailableNow did not terminate")
    assert(norm(spark.read.parquet(s"$dir/out")) ==
      norm(snapshotAsInserts(t, 0)
        .unionByName(t.changes(0, 2), allowMissingColumns = true)))
  }

  test("replication: CDF source → op changelog → graft sink converges " +
      "a follower table, format strings only") {
    val dir = tmp("gstream_repl")
    val t = GraftTable.create(spark, s"$dir/src", docs)
    val log = Lake.cdcChangelog(t.read())
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 0))
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 1))

    // follower starts from the leader's v0 snapshot; the stream then
    // replays each step as a CDC changelog batch. maxStepsPerTrigger=1
    // keeps per-batch keys unique (one step per batch), which is what
    // makes the feed→changelog projection sound.
    GraftTable.create(spark, s"$dir/dst", t.readAsOf(0))
    val follower = GraftTable.open(spark, s"$dir/dst")
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0") // the follower owns v0 already
      .option("maxStepsPerTrigger", "1")
      .load(s"$dir/src")
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("op",
        when(col("_change_type") === "delete", "D").otherwise("U"))
      .drop("_change_type", "_commit_version")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(s"$dir/dst")
    try q.processAllAvailable() finally q.stop()

    // the follower converges to the leader, step for step
    assert(follower.currentVersion == 2)
    assert(follower.read().orderBy("doc_id").collect().toSeq ==
      t.read().orderBy("doc_id").collect().toSeq)
  }

  test("replication survives a restart: the resumed stream picks up at " +
      "the next unseen step and converges on later leader writes") {
    val dir = tmp("gstream_repl_restart")
    val t = GraftTable.create(spark, s"$dir/src", docs)
    val log = Lake.cdcChangelog(t.read())
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 0)) // step 1
    GraftTable.create(spark, s"$dir/dst", t.readAsOf(0))
    val follower = GraftTable.open(spark, s"$dir/dst")
    def replicate(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .option("maxStepsPerTrigger", "1")
        .load(s"$dir/src")
        .filter(col("_change_type") =!= "update_preimage")
        .withColumn("op",
          when(col("_change_type") === "delete", "D").otherwise("U"))
        .drop("_change_type", "_commit_version")
        .writeStream.format("graft")
        .option("checkpointLocation", s"$dir/ckpt")
        .start(s"$dir/dst")
      try q.processAllAvailable() finally q.stop()
    }
    replicate() // drains step 1, then the stream STOPS
    assert(follower.currentVersion == 1)
    // the leader moves on while no replica stream is running
    t.merge(log.filter(pmod(col("doc_id"), lit(2)) === 1))  // step 2
    t.delete(pmod(col("doc_id"), lit(9)) === 5)             // step 3
    // the resumed stream recovers its offset from the checkpoint: it
    // must apply exactly steps 2..3 (never re-apply 1 — version
    // ownership would fail loudly on a re-landed batch) and converge
    replicate()
    assert(follower.currentVersion == 3)
    assert(follower.read().orderBy("doc_id").collect().toSeq ==
      t.read().orderBy("doc_id").collect().toSeq)
  }

  test("batch relation reports the manifest's real byte size, so small " +
      "graft tables auto-broadcast") {
    val dir = tmp("gstream_size")
    val t = GraftTable.create(spark, s"$dir/tbl", docs.limit(200))
    val rel = spark.read.format("graft").load(s"$dir/tbl")
    val manifestBytes = t.manifest(t.currentVersion)
      .agg(sum("n_bytes")).head().getLong(0)
    // the optimizer's view of the relation is the manifest sum — real
    // bytes, not spark.sql.defaultSizeInBytes
    val stats = rel.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats.toLong == manifestBytes,
      s"optimizer sees $stats, manifest says $manifestBytes")
    // and a join against a big frame picks the broadcast side unhinted
    val big = docs.withColumnRenamed("text", "t2")
    val plan = big.join(rel.select("doc_id", "text"), "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("sink: batch b lands as version b+1, op column applies as CDC, " +
      "moved chain and Complete mode refuse loudly") {
    val dir = tmp("gstream_sink")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    val log = Lake.cdcChangelog(t.read())

    // stage the changelog as two arrival ticks (op column present →
    // applied verbatim, deletes included)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/stage"))
    log.filter(pmod(col("doc_id"), lit(2)) === 0).coalesce(1)
      .write.parquet(s"$dir/stage/t0")
    val tick0 = spark.read.parquet(s"$dir/stage/t0")
    log.filter(pmod(col("doc_id"), lit(2)) === 1).coalesce(1)
      .write.parquet(s"$dir/stage/t1")
    val schema = tick0.schema
    // feed tick dirs in order through the file source
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/stage/*")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Update())
      .start(s"$dir/tbl")
    try q.processAllAvailable() finally q.stop()

    // the chain grew by exactly the tick count, and the final state is
    // the full CDC replay (tick composition invisible)
    assert(t.currentVersion == 2)
    val twinDir = tmp("gstream_twin")
    val twin = GraftTable.create(spark, s"$twinDir/tbl", docs)
    twin.merge(log)
    assert(t.read().orderBy("doc_id").collect().toSeq ==
      twin.read().orderBy("doc_id").collect().toSeq)

    // Complete mode is refused at sink creation
    val ce = intercept[Exception] {
      spark.readStream.schema(schema).parquet(s"$dir/stage/*")
        .groupBy("op").count()
        .writeStream.format("graft")
        .option("checkpointLocation", s"$dir/ckpt_c")
        .outputMode(OutputMode.Complete())
        .start(s"$dir/tbl")
    }
    assert(ce.getMessage.contains("Complete"))

    // a chain that moved off the batch↔version mapping fails the batch
    // loudly instead of rewriting history: the table is at v2, so a
    // fresh stream's batch 0 (→ v1) must refuse
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/stage2"))
    log.limit(5).coalesce(1).write.parquet(s"$dir/stage2/t0")
    val q2 = spark.readStream.schema(schema)
      .parquet(s"$dir/stage2/*")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt2")
      .start(s"$dir/tbl")
    val se = intercept[StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(se.getCause != null &&
      (se.getCause.getMessage.contains("owns the version chain") ||
        String.valueOf(se.getMessage).contains("owns the version chain")))
  }
}
