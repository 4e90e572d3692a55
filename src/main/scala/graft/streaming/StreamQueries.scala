package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.OpDef

/** Driver-gate entries for the streaming operators: each runs a REAL
  * Structured Streaming query (file source over the sf dir's events
  * parquet -> the StreamOps transform -> memory sink, drained with
  * `processAllAvailable`) and returns the sink table as a batch DataFrame,
  * so the DuckDB oracle hash-checks the streaming path exactly like any
  * batch operator. s02/s04 (event-time-timeout sessionization) cannot
  * finalize on a finite file feed without sentinel games — they stay
  * spec-tested and in the [[StreamParity]] artifact instead.
  */
object StreamQueries {

  /** The file-stream source only reads directories (it force-sets its own
    * `basePath` to the source path, which must then be a dir), and the
    * driver's `events.parquet` is a single file — stage a copy of it into
    * a scratch directory per sf dir. The copy is refreshed whenever the
    * source's (size, mtime) changes (regenerated test data must not stream
    * stale rows) and written via temp-file + atomic move so a killed run
    * can never leave a truncated parquet behind for later runs to reuse.
    */
  private def stagedEventsDir(d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "events.parquet")
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_stream_events_${Integer.toHexString(d.hashCode)}")
    val dst = stage.resolve("events.parquet")
    val srcStamp = s"${Files.size(src)}_${Files.getLastModifiedTime(src).toMillis}"
    // NOT inside the staged dir — the file stream source reads everything
    // in it, and a stray non-parquet file fails the whole query
    val stampFile = stage.resolveSibling(stage.getFileName.toString + ".stamp")
    val fresh = Files.exists(dst) && Files.exists(stampFile) &&
      new String(Files.readAllBytes(stampFile), "UTF-8") == srcStamp
    if (!fresh) {
      Files.createDirectories(stage)
      val tmp = stage.resolve("events.parquet.tmp")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      Files.write(stampFile, srcStamp.getBytes("UTF-8"))
    }
    stage.toString
  }

  /** The events parquet lifted to a STREAMING DataFrame with an event-time
    * `ts` (TimestampType, microsecond-exact from the nanos long) plus the
    * integer `ts_us` the oracles' time math uses (lifting shared with the
    * batch reader via [[graft.sources.Tables.withTsUs]]).
    */
  private def eventStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val raw = s.readStream.schema(schema).parquet(stagedEventsDir(d))
    graft.sources.Tables.withTsUs(raw)
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  /** Runs `streamed` into a fresh memory-sink table, drains the source,
    * stops the query, and returns the sink as a DataFrame tracked under
    * `name` (the previous run's cache is dropped).
    */
  private def drain(s: SparkSession, name: String, streamed: DataFrame,
                    mode: String): DataFrame =
    StreamRun.drain(s, streamed, mode, name)

  val defs: Map[String, OpDef] = Map(

    // s01: watermarked tumbling windows, complete mode (every window is
    // final once the file feed drains). Same oracle text as the batch twin
    // q27_event_windows — the whole point: one oracle, two engines paths.
    "s01_stream_windows" -> OpDef.sql(
      (s, d) => drain(s, "s01",
          StreamOps.tumblingWindows(
            eventStream(s, d).select(col("ts"), col("event_type"), col("value"))),
          "complete")
        .orderBy("hour_s", "event_type"),
      """SELECT (epoch_ns(ts) // 1000 // 3600000000) * 3600 AS hour_s,
        |       event_type, count(*) AS n, round(sum(value) + 1e-6, 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin),

    // s03: streaming dedup fed every event TWICE (the stream unioned with
    // itself, the reference's repeated-intake-dump shape); exactly one row
    // per event_id must survive, so the oracle is the plain events table.
    "s03_stream_dedup" -> OpDef.sql(
      (s, d) => {
        val one = eventStream(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val two = eventStream(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        drain(s, "s03", StreamOps.dedupStream(one.union(two))
            .select(col("event_id"), col("user_id"), col("event_type"),
                    unix_micros(col("ts")).as("ts_us"), col("value")),
          "append")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, value
        |FROM events ORDER BY event_id""".stripMargin),

    // s05: stream-stream interval join (purchases x in-window signups),
    // both sides streamed from the same file feed.
    "s05_stream_interval_join" -> OpDef.sql(
      (s, d) => {
        def side(t: String, k: String, ts: String, id: String) =
          eventStream(s, d).filter(col("event_type") === t)
            .select(col("user_id").as(k), col("ts").as(ts), col("event_id").as(id))
        drain(s, "s05",
            StreamOps.intervalJoin(
              side("purchase", "p_user", "p_ts", "p_id"),
              side("signup", "s_user", "s_ts", "s_id")),
          "append")
          .orderBy("p_id", "s_id")
      },
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, event_type
        |  FROM events)
        |SELECT p.event_id AS p_id, s.event_id AS s_id, p.user_id AS user_id,
        |       p.ts_us // 1000000 AS p_s, s.ts_us // 1000000 AS s_s
        |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM e WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id
        | AND s.ts_us <= p.ts_us AND s.ts_us >= p.ts_us - 3600000000
        |ORDER BY p_id, s_id""".stripMargin)
  )
}
