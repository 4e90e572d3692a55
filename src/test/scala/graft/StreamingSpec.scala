package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{SessionOut, StreamEvent, StreamOps}

import java.sql.Timestamp

/** Structured Streaming specs driven through MemoryStream — the streaming
  * twins must agree with their batch counterparts on identical data.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  private val HourUs = 3600L * 1000000L

  test("s01 tumbling windows aggregate per hour and event type") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val query = StreamOps.tumblingWindows(events).writeStream
      .format("memory").queryName("s01_out").outputMode("complete").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      input.addData(
        (t(10, 5), "click", 1.0), (t(10, 40), "click", 2.0),
        (t(10, 50), "buy", 10.0), (t(11, 10), "click", 4.0))
      query.processAllAvailable()
      val rows = spark.table("s01_out")
        .orderBy("hour_s", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq == Seq(
        (1704103200L, "buy", 1L, 10.0),   // 10:00 window
        (1704103200L, "click", 2L, 3.0),
        (1704106800L, "click", 1L, 4.0))) // 11:00 window
    } finally query.stop()
  }

  test("s02 sessionization closes a session once the 30-min gap passes") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[StreamEvent]
    val query = StreamOps.sessionize(input.toDS()).writeStream
      .format("memory").queryName("s02_out").outputMode("append").start()
    try {
      // user 1: two events 10 min apart, then a 40-min gap -> session closes.
      input.addData(
        StreamEvent(1L, "click", 0L, 1.0),
        StreamEvent(1L, "click", 600L * 1000000L, 2.5))
      query.processAllAvailable()
      assert(spark.table("s02_out").isEmpty) // session still open
      input.addData(StreamEvent(1L, "click", 3000L * 1000000L, 7.0))
      query.processAllAvailable()
      val closed = spark.table("s02_out").as[SessionOut].collect().toSeq
      assert(closed == Seq(SessionOut(1L, 1L, 2L, 0L, 600L, 3.5)))
    } finally query.stop()
  }

  test("s02 stream sessions match the batch q25 twin on real events data") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    // Feed the sf0.001 events table through the stream op in one batch per
    // user-ordered chunk, then compare CLOSED sessions against q25's rows
    // (batch also sees the final open session per user, so compare on the
    // closed prefix).
    val evs = StreamOps.eventsAsStreamInput(spark, sfDir)
      .orderBy("user_id", "ts_us").collect().toSeq
    val input = MemoryStream[StreamEvent]
    val query = StreamOps.sessionize(input.toDS()).writeStream
      .format("memory").queryName("s02_batch_cmp").outputMode("append").start()
    try {
      input.addData(evs)
      query.processAllAvailable()
      val streamed = spark.table("s02_batch_cmp").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_id) ->
          (s.n_events, s.start_s, s.dur_s, s.session_value))
        .toMap
      val batch = SparkEntry.queries("q25_sessionize")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toMap
      assert(streamed.nonEmpty)
      // every streamed (closed) session exists in the batch result with
      // identical stats
      streamed.foreach { case (k, v) =>
        assert(batch.get(k).contains(v), s"session $k differs: stream=$v batch=${batch.get(k)}")
      }
      // batch has exactly one extra (open) session per user seen in stream output
      val usersWithClosed = streamed.keySet.map(_._1)
      usersWithClosed.foreach { u =>
        val nb = batch.keySet.count(_._1 == u)
        val ns = streamed.keySet.count(_._1 == u)
        assert(nb == ns + 1, s"user $u: batch=$nb stream-closed=$ns")
      }
    } finally query.stop()
  }
}
