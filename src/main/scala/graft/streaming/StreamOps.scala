package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A single intake event on the stream (the streaming twin of the
  * `events` batch table; ts in epoch microseconds).
  */
final case class StreamEvent(user_id: Long, event_type: String,
                             ts_us: Long, value: Double)

/** A closed user session: emitted once the gap to the next event exceeds
  * the session gap (streaming twin of q25_sessionize's output rows).
  */
final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                            start_s: Long, dur_s: Long, session_value: Double)

private final case class SessionState(sessionId: Long, startUs: Long,
                                      lastUs: Long, n: Long, sum: Double)

/** Structured Streaming operators — the streaming twins of the batch
  * event-time ops (q25_sessionize, q27_event_windows). Both are pure
  * stream-to-stream transforms: callers attach any source (`readStream`
  * on the lake in production, `MemoryStream` in the specs) and sink.
  *
  * Scale notes: the windowed aggregate is a standard watermarked
  * stateful agg (state pruned at the watermark, partial aggregation
  * map-side); sessionization keys state by user_id so state size is
  * O(active users), not O(events).
  */
object StreamOps {

  val SessionGapUs: Long = 1800L * 1000000L // 30 minutes
  /** How long a flushed user's idle marker (the session counter) is kept
    * before state is dropped entirely; a user returning later restarts at
    * session id 1.
    */
  val IdleRetentionUs: Long = 7L * 24 * 3600 * 1000000L // 7 days

  /** The batch oracles' epsilon-rounding convention (see Relational.r2e),
    * applied JVM-side for streaming session values: +1e-6 then HALF_UP at
    * 2dp, so streaming sums agree with the batch twins at half-cent
    * boundaries.
    */
  private def r2(x: Double): Double =
    BigDecimal(x + 1e-6).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** s01: tumbling 1-hour windows per event type over an event-time
    * timestamp column `ts` (TimestampType), watermarked so state for
    * closed windows is dropped. Matches q27_event_windows per window.
    */
  def tumblingWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum("value") + lit(1e-6), 2).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("hour_s"),
              col("event_type"), col("n"), col("total_value"))

  /** s02: gap-based sessionization with explicit state per user via
    * flatMapGroupsWithState. Emits a session as soon as an event arrives
    * more than [[SessionGapUs]] after the previous one (and flushes the
    * open session on processing-timeout in production; the spec drives
    * only the gap path so results are deterministic).
    *
    * Events must arrive in event-time order per user within the test
    * feed; production fronts this with a watermarked sort or accepts
    * provisional sessions (same trade-off the reference's intake loop
    * makes by processing dumps in arrival order).
    */
  def sessionize(events: Dataset[StreamEvent]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[StreamEvent],
         state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption.orNull
          batch.toSeq.sortBy(e => e.ts_us).foreach { e =>
            st match {
              case null =>
                st = SessionState(1L, e.ts_us, e.ts_us, 1L, e.value)
              case s if e.ts_us - s.lastUs > SessionGapUs =>
                out += SessionOut(userId, s.sessionId, s.n,
                  s.startUs / 1000000L, (s.lastUs - s.startUs) / 1000000L,
                  r2(s.sum))
                st = SessionState(s.sessionId + 1, e.ts_us, e.ts_us, 1L, e.value)
              case s =>
                st = s.copy(lastUs = e.ts_us, n = s.n + 1, sum = s.sum + e.value)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** s04: sessionization with event-time timeout — like [[sessionize]],
    * but open sessions are FLUSHED once the watermark passes the session
    * gap after their last event, so every session is eventually emitted.
    * After a flush the user's state shrinks to an idle marker carrying
    * the session counter (so a returning user's next session id doesn't
    * collide with the emitted one), and the marker itself expires after
    * [[IdleRetentionUs]] — state stays bounded by recently-active users.
    *
    * Input must carry an event-time `ts` (TimestampType), `user_id` and
    * `value`; the watermark is set here (gap + delay) so the timeout
    * clock is the stream's own event time.
    */
  def sessionizeWithTimeout(events: DataFrame,
                            watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      // the watermarked ts column itself must reach the stateful operator
      // (converting it to a long here would strip the watermark metadata)
      .select(col("user_id").cast("long"),
              col("ts"),
              col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) =>
          def micros(t: java.sql.Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
          def emit(s: SessionState): SessionOut =
            SessionOut(userId, s.sessionId, s.n, s.startUs / 1000000L,
              (s.lastUs - s.startUs) / 1000000L, r2(s.sum))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          // timeouts must never be set at or below the current watermark
          // (Spark rejects that and kills the query — e.g. on a backfill
          // whose watermark jumps far ahead in one batch)
          def armTimeout(atUs: Long): Unit =
            state.setTimeoutTimestamp(
              math.max(atUs / 1000L, state.getCurrentWatermarkMs() + 1))
          if (state.hasTimedOut) {
            state.getOption match {
              case Some(s) if s.n > 0 =>
                // watermark passed lastUs + gap: the session can never
                // extend. Keep an idle marker (n = 0) so the session
                // counter survives the flush, with its own retention
                // timeout so state stays bounded.
                out += emit(s)
                state.update(s.copy(sessionId = s.sessionId + 1, n = 0))
                armTimeout(s.lastUs + IdleRetentionUs)
              case _ =>
                state.remove() // idle marker expired: drop the user's state
            }
          } else {
            var st = state.getOption.orNull
            batch.toSeq.sortBy(e => micros(e._2)).foreach { case (_, t, value) =>
              val tsUs = micros(t)
              st match {
                case null =>
                  st = SessionState(1L, tsUs, tsUs, 1L, value)
                case s if s.n == 0 => // idle marker from a timeout flush
                  st = SessionState(s.sessionId, tsUs, tsUs, 1L, value)
                case s if tsUs - s.lastUs > SessionGapUs =>
                  out += emit(s)
                  st = SessionState(s.sessionId + 1, tsUs, tsUs, 1L, value)
                case s =>
                  // a late-but-valid event from a previous batch may sort
                  // before the session's current bounds: extend, never
                  // shrink, so duration and the timeout stay correct
                  st = s.copy(startUs = math.min(s.startUs, tsUs),
                              lastUs = math.max(s.lastUs, tsUs),
                              n = s.n + 1, sum = s.sum + value)
              }
            }
            if (st != null) {
              state.update(st)
              // st.n >= 1 here (the batch was non-empty for this key):
              // fires when the event-time watermark passes last + gap
              armTimeout(st.lastUs + SessionGapUs)
            }
          }
          out.iterator
      }
  }

  /** s08: hopping (sliding) windows — 1-hour windows advancing every 30
    * minutes, so each event lands in exactly 2 overlapping windows (the
    * smoothed-dashboard twin of s01's tumbling windows). Same watermark
    * discipline: closed windows' state is dropped; state size is
    * (windows in flight) x types = 2x s01's, fixed, regardless of rate.
    */
  def hoppingWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum("value") + lit(1e-6), 2).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_s"),
              col("event_type"), col("n"), col("total_value"))

  /** s07: stream-static enrichment — the event stream joined to a static
    * dimension (user -> market segment) and aggregated into tumbling
    * windows per segment. The join itself is STATELESS: the static side
    * is broadcast to every task and each stream row maps to at most one
    * dim row, so the only state in the query is the windowed aggregate's
    * (watermark-pruned) — the production shape for enriching a firehose
    * with reference data. Spark re-plans the static side per run, so a
    * restart picks up a refreshed dimension snapshot; a slowly-changing
    * dim that must be versioned WITHIN a run is s05's interval-join shape
    * instead.
    *
    * Inputs: events(ts timestamp, user_id, value); dim(c_custkey,
    * c_mktsegment).
    */
  def enrichWindows(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
           round(sum("value") + lit(1e-6), 2).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("hour_s"),
              col("c_mktsegment"), col("n"), col("total_value"))

  /** s09: streaming content dedup — normalized-text fingerprint groups
    * over a DOCUMENT stream (complete mode): the intake-side twin of the
    * batch d25 canonicalization dedup, sharing its normalization
    * definition through [[graft.operators.Dedup.normText]]. A standard
    * streaming aggregate: map-side partial, state one row per distinct
    * fingerprint — which IS the content-dedup index an intake pipeline
    * keeps; on a real deployment back it with the RocksDB provider (one
    * knob, see GraftSession) once fingerprints outgrow heap.
    */
  def normDedupCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm_fp",
        md5(graft.operators.Dedup.normText(col("text")).cast("binary")))
      .groupBy("norm_fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies", "norm_fp")

  /** s03: streaming exact-dedup — drop repeated (event_id) rows across
    * micro-batches (the reference's intake sees the same auction rows in
    * consecutive dumps). State is bounded by the watermark: an id older
    * than the delay is dropped from state, so memory is O(events per
    * watermark window), not O(stream).
    */
  def dedupStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      // id-only keys: a re-ingested event with a re-stamped timestamp is
      // still a duplicate; WithinWatermark keeps state bounded without
      // requiring the event-time column in the key set
      .dropDuplicatesWithinWatermark("event_id")

  /** s05: stream-stream interval join — each purchase joins signups of
    * the same user that happened in the hour BEFORE it. Both sides are
    * watermarked so Spark can discard join state once the interval can no
    * longer match (state is bounded by watermark + interval, the standard
    * stream-stream join discipline).
    *
    * Inputs: purchases(p_user, p_ts timestamp, p_id), signups(s_user,
    * s_ts timestamp, s_id).
    */
  def intervalJoin(purchases: DataFrame, signups: DataFrame): DataFrame =
    purchases.withWatermark("p_ts", "1 hour")
      .join(signups.withWatermark("s_ts", "1 hour"),
        expr("""p_user = s_user AND
               |s_ts <= p_ts AND s_ts >= p_ts - interval 1 hour""".stripMargin))
      .select(col("p_id"), col("s_id"), col("p_user").as("user_id"),
              unix_timestamp(col("p_ts")).as("p_s"),
              unix_timestamp(col("s_ts")).as("s_s"))

  /** Convenience: the batch `events` table lifted to the shape the
    * streaming ops expect (used by specs to cross-check stream results
    * against the batch twins on identical data).
    */
  def eventsAsStreamInput(spark: SparkSession, dir: String): Dataset[StreamEvent] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("value"))
      .as[StreamEvent]
  }
}
