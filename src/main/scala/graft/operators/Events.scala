package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.OpDef
import graft.sources.Tables

/** Event-time operators over the `events` intake stream (batch twins of the
  * Structured Streaming ops in `graft.streaming.StreamOps`).
  *
  * All time arithmetic is integer math on `ts_us` (epoch microseconds,
  * see [[graft.sources.Tables.events]]) so Spark and the DuckDB oracle
  * (`epoch_ns(ts)//1000`) are bit-identical.
  */
object Events {

  // one constant for the batch/streaming sessionization twins
  private val SessionGapUs = graft.streaming.StreamOps.SessionGapUs

  /** The gap-sessionization oracle, shared verbatim by the batch q25 and
    * the streaming s02/s04 gate entries — all three must produce these
    * exact sessions.
    */
  val SessionOracleSql: String =
    """WITH e AS (
      |  SELECT *, epoch_ns(ts) // 1000 AS ts_us FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, ts_us, value,
      |         CASE WHEN lag(ts_us) OVER w IS NULL
      |                OR ts_us - lag(ts_us) OVER w > 1800000000
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), sessed AS (
      |  SELECT *, CAST(sum(new_sess) OVER (
      |    PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(ts_us) // 1000000 AS start_s,
      |       (max(ts_us) - min(ts_us)) // 1000000 AS dur_s,
      |       round(sum(value) + 1e-6, 2) AS session_value
      |FROM sessed GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** The q44 prefix-sum interval aggregate, factored out so
    * IntervalJoinSpec can replay it over hand-built boundary cases and
    * assert identity with the naive non-equi join. `ev` needs columns
    * (event_id, ts_us, event_type, value); `W` is the window width in
    * epoch micros. See the q44 entry below for the full design note.
    */
  def intervalAggPrefixSum(ev: org.apache.spark.sql.DataFrame,
                           W: Long): org.apache.spark.sql.DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("ts_us")
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,2)"))
             .cast("decimal(28,2)").as("val"))
      .withColumn("bin", expr(s"ts_us DIV $W"))
    // two probes per window: +F(hi-1), -F(lo-1)
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("window_id"), col("ts_us").as("lo"))
    val probes = windows
      .select(col("window_id"), (col("lo") + lit(W - 1)).as("t"),
              lit(1).as("sign"))
      .unionByName(windows.select(col("window_id"),
              (col("lo") - lit(1L)).as("t"), lit(-1).as("sign")))
      .withColumn("bin", expr(s"t DIV $W"))
    // one row per W-bin of the combined click+probe range, so every
    // probe bin hits the dense table by exact equi-join (no clamp,
    // no cross join) — model-sized: one row per 2h of time range
    val rng = clicks.select("bin").unionByName(probes.select("bin"))
      .agg(min("bin").as("lo_b"), max("bin").as("cap_b"))
    val binTotals = clicks.groupBy("bin")
      .agg(sum("cnt").as("b_cnt"), sum("val").as("b_val"))
    val wBins = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val densePrefix = rng
      .select(explode(sequence(col("lo_b"), col("cap_b"))).as("bin"))
      .join(binTotals, Seq("bin"), "left")
      .withColumn("p_cnt", coalesce(sum("b_cnt").over(wBins), lit(0L)))
      .withColumn("p_val", coalesce(sum("b_val").over(wBins),
                                    lit(0).cast("decimal(38,2)")))
      .select(col("bin"), col("p_cnt"), col("p_val"))
    // within-bin running sum carries probes in the same pass
    val u = clicks.select(col("bin"), col("ts_us").as("t"),
            lit(0).as("tag"), col("cnt"), col("val"),
            lit(null).cast("long").as("window_id"),
            lit(null).cast("int").as("sign"))
      .unionByName(probes.select(col("bin"), col("t"), lit(1).as("tag"),
            lit(0L).as("cnt"), lit(0).cast("decimal(28,2)").as("val"),
            col("window_id"), col("sign")))
    val wIn = Window.partitionBy("bin").orderBy("t", "tag", "window_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("c_cnt", sum("cnt").over(wIn))
      .withColumn("c_val", sum("val").over(wIn))
      .filter(col("tag") === 1)
      .join(broadcast(densePrefix), Seq("bin"))
      .groupBy("window_id")
      .agg(sum(col("sign") * (col("p_cnt") + col("c_cnt"))).as("n"),
           sum(when(col("sign") === 1, col("p_val") + col("c_val"))
             .otherwise(-(col("p_val") + col("c_val")))).as("tv"))
      .filter(col("n") > 0)
      .select(col("window_id"), col("n"),
              round(col("tv").cast("double") + lit(1e-6), 2)
                .as("total_value"))
      .orderBy("window_id")
  }

  val defs: Map[String, OpDef] = Map(

    // Gap-based sessionization: lag + cumulative-sum session ids per user.
    // One shuffle on user_id; the window sort is the only per-key work, so
    // this scales as a single sort-merge pass at 100 TB.
    "q25_sessionize" -> OpDef.sql(
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, d)
          .withColumn("prev_us", lag("ts_us", 1).over(wOrd))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
                 col("ts_us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
          .withColumn("session_id", sum("new_sess").over(wCum))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               expr("min(ts_us) DIV 1000000").as("start_s"),
               expr("(max(ts_us) - min(ts_us)) DIV 1000000").as("dur_s"),
               round(sum("value") + lit(1e-6), 2).as("session_value"))
          .orderBy("user_id", "session_id")
      },
      SessionOracleSql),

    // As-of join (most-recent-<=): each purchase matched to the user's
    // latest prior signup. Implemented as the scalable union+window pattern
    // (tag both sides, one shuffle on the key, one sort, last-non-null) —
    // no per-row probe; DuckDB verifies with a native ASOF JOIN.
    "q26_asof_join" -> OpDef.sql(
      (s, d) => {
        val ev = Tables.events(s, d)
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts_us"),
                  lit(0).as("tag"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"),
                  lit(1).as("tag"), col("event_id"))
        // At equal ts the signup sorts first (tag 0), matching ASOF's <=;
        // event_id breaks ties between equal-ts signups deterministically.
        val w = Window.partitionBy("user_id").orderBy("ts_us", "tag", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        signups.unionByName(purchases)
          .withColumn("last_signup",
            last(when(col("tag") === 0,
              struct(col("ts_us").as("s_us"), col("event_id").as("s_id"))),
              ignoreNulls = true).over(w))
          .filter(col("tag") === 1 && col("last_signup").isNotNull)
          .select(col("event_id"), col("user_id"),
                  col("last_signup.s_id").as("signup_id"),
                  expr("(ts_us - last_signup.s_us) DIV 1000000").as("wait_s"))
          .orderBy("event_id")
      },
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
        |       s.event_id AS signup_id,
        |       (epoch_ns(p.ts) // 1000 - epoch_ns(s.ts) // 1000) // 1000000 AS wait_s
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY event_id""".stripMargin),

    // The same as-of join through graft's custom whole-operator plan:
    // LogicalPlan + SparkStrategy + physical merge-sweep SparkPlan
    // (graft.plans.AsOfJoin*). Same oracle as q26 — both implementations
    // must agree with DuckDB's native ASOF JOIN.
    "q26_asof_custom" -> OpDef.sql(
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"),
                  col("user_id").as("s_user"), col("ts_us").as("s_us"))
        graft.plans.AsOf.join(purchases, signups,
            "user_id", "s_user", "ts_us", "s_us",
            rightTieBreak = Some("signup_id"))
          .select(col("event_id"), col("user_id"), col("signup_id"),
                  expr("(ts_us - s_us) DIV 1000000").as("wait_s"))
          .orderBy("event_id")
      },
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
        |       s.event_id AS signup_id,
        |       (epoch_ns(p.ts) // 1000 - epoch_ns(s.ts) // 1000) // 1000000 AS wait_s
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY event_id""".stripMargin),

    // Tumbling 1-hour windows per event type (intake micro-batch rollup).
    "q27_event_windows" -> OpDef.sql(
      (s, d) => Tables.events(s, d)
        .withColumn("hour_s", expr("(ts_us DIV 3600000000) * 3600"))
        .groupBy("hour_s", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value") + lit(1e-6), 2).as("total_value"))
        .orderBy("hour_s", "event_type"),
      """SELECT (epoch_ns(ts) // 1000 // 3600000000) * 3600 AS hour_s,
        |       event_type, count(*) AS n, round(sum(value) + 1e-6, 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin),

    // Funnel conversion: of the clicks each day, how many were followed
    // by a `purchase` from the same user within 24 hours (the events
    // table's inter-event gaps run to hours, so a same-session funnel
    // would be empty — this is the day-scale funnel). The per-click
    // "next purchase" comes from ONE window pass — min(purchase ts)
    // over a VALUE-based RANGE frame [current ts, ts + 24 h] — instead
    // of the naive self-join of clicks against purchases (an interval
    // join that explodes on active users). The frame is value-based on ts_us
    // deliberately: a ROWS frame would depend on tie ORDER between
    // equal timestamps (engine-dependent), a RANGE frame cannot.
    // user_id is a HIGH-cardinality partition key, so the window
    // parallelizes with the corpus (the q18 anti-pattern is only the
    // low-cardinality window); one shuffle on user_id total.
    // q44: INTERVAL (range) aggregate via PREFIX SUMS. Each purchase
    // opens a 2-hour window; the answer per window is only
    // count+sum of the clicks (from ANY user) it contains. The naive
    // non-equi join is a nested loop; the binned equi-join rewrite
    // (kept in IntervalJoinSpec as the cross-check) fixes the plan
    // shape but still ENUMERATES every (purchase, click) containment
    // pair — and for un-keyed windows that volume grows ~quadratically
    // with event density at fixed width (measured 18x for 10x data at
    // sf10). For a pure count/sum-over-range aggregate the scale-safe
    // plan is a distributed prefix sum: F(t) = (count, value-sum) of
    // clicks with ts <= t, and each window's answer is F(hi-1)-F(lo-1)
    // — two probe points per window, cost O(clicks + windows), ZERO
    // match enumeration. F is built without a global sort: clicks
    // aggregate per timestamp (exact DECIMAL sums — `value` is
    // 2-decimal, so cumulative differences are bit-equal to direct
    // per-window sums), a within-bin running sum over W-bins carries
    // the probes in the SAME window pass (clicks tag 0 sort before
    // probes tag 1 at equal ts => inclusive <=), and the cross-bin
    // carry comes from a DENSE model-sized bin-prefix table (one row
    // per 2h of the combined click+probe time range) broadcast back.
    // IntervalJoinSpec pins broadcast-only joins (no SMJ/BNLJ/
    // cartesian past the probe stage) and naive-join identity.
    "q44_interval_join" -> OpDef.sql(
      (s, d) => intervalAggPrefixSum(Tables.events(s, d), 7200000000L),
      """WITH iv AS (
        |  SELECT event_id AS window_id,
        |         epoch_ns(ts) // 1000 AS lo,
        |         epoch_ns(ts) // 1000 + 7200000000 AS hi
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT epoch_ns(ts) // 1000 AS ts_us, value
        |  FROM events WHERE event_type = 'click')
        |SELECT iv.window_id, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(p.value) + 1e-6, 2) AS total_value
        |FROM iv JOIN p ON p.ts_us >= iv.lo AND p.ts_us < iv.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    "q40_funnel" -> OpDef.sql(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(Window.currentRow, 86400000000L)
        Tables.events(s, d)
          .withColumn("next_buy_us",
            min(when(col("event_type") === "purchase", col("ts_us"))).over(w))
          .filter(col("event_type") === "click")
          .withColumn("day", expr("ts_us DIV 86400000000"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_clicks"),
               sum(when(col("next_buy_us").isNotNull, 1L).otherwise(0L))
                 .as("n_converted"))
          .withColumn("conv_rate",
            round(col("n_converted").cast("double") / col("n_clicks")
                    + lit(1e-8), 4))
          .orderBy("day")
      },
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_type, ts_us,
        |         min(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER (
        |           PARTITION BY user_id ORDER BY ts_us
        |           RANGE BETWEEN CURRENT ROW AND 86400000000 FOLLOWING)
        |           AS next_buy_us
        |  FROM e)
        |SELECT ts_us // 86400000000 AS day,
        |       CAST(count(*) AS BIGINT) AS n_clicks,
        |       CAST(sum(CASE WHEN next_buy_us IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_converted,
        |       round(CAST(sum(CASE WHEN next_buy_us IS NOT NULL THEN 1 ELSE 0
        |                      END) AS DOUBLE) / count(*) + 1e-8, 4)
        |         AS conv_rate
        |FROM f WHERE event_type = 'click'
        |GROUP BY 1 ORDER BY day""".stripMargin)
  )
}
