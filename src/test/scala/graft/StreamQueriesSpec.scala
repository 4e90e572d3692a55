package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamParity

/** The streaming driver-gate entries: real stream runs must reproduce
  * their batch twins, and the parity artifact must be all-green.
  */
class StreamQueriesSpec extends AnyFunSuite with SparkFixture {

  test("s01 gate entry reproduces the batch q27 result exactly") {
    val streamed = SparkEntry.queries("s01_stream_windows")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q27_event_windows")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("s03 gate entry emits each event exactly once despite the doubled feed") {
    val ids = SparkEntry.queries("s03_stream_dedup")(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val n = graft.sources.Tables.events(spark, sfDir).count()
    assert(ids.length == n, s"expected $n unique events, got ${ids.length}")
    assert(ids.distinct.length == ids.length, "duplicate event ids survived dedup")
  }

  test("kafka wire round-trip preserves every event to the microsecond") {
    import graft.streaming.KafkaShape
    val raw = graft.sources.Tables.events(spark, sfDir)
    // props included: it is the escaping-prone field (nested JSON text)
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
       r.getLong(4), r.getString(5))
    val cols = Seq("event_id", "user_id", "event_type", "value", "ts_us", "props")
    val before = raw.select(cols.head, cols.tail: _*).collect().map(keyOf).toSet
    val after = KafkaShape.fromKafkaShape(KafkaShape.toKafkaShape(raw))
      .select(cols.head, cols.tail: _*).collect().map(keyOf).toSet
    assert(before.nonEmpty)
    assert(after == before)
  }

  test("kafka adapter drops tombstones and malformed payloads, keeps good rows") {
    import graft.streaming.KafkaShape
    val sp = spark
    import sp.implicits._
    val good = """{"event_id":7,"ts":1700000000000000000,"user_id":3,""" +
      """"event_type":"purchase","value":1.5,"props":null}"""
    val wire = Seq(
      (Array[Byte](51), good.getBytes("UTF-8")),        // decodable event
      (Array[Byte](52), null.asInstanceOf[Array[Byte]]), // tombstone
      (Array[Byte](53), "not json".getBytes("UTF-8")))   // malformed
      .toDF("key", "value")
    val out = KafkaShape.fromKafkaShape(wire).collect()
    assert(out.length == 1, s"expected only the decodable row, got ${out.length}")
    assert(out.head.getAs[Long]("event_id") == 7L)
    assert(out.head.getAs[Long]("ts_us") == 1700000000000000L)
  }

  test("kafka adapter counts its drops in the kafka_decode observed metric") {
    import graft.streaming.KafkaShape
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    def ev(id: Long) =
      (s"""{"event_id":$id,"ts":170000000000000000$id,"user_id":$id,""" +
        """"event_type":"click","value":1.0,"props":null}""").getBytes("UTF-8")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Array[Byte], Array[Byte])]
    val q = KafkaShape.fromKafkaShape(input.toDF().toDF("key", "value"))
      .writeStream.format("memory").queryName("kafka_drop_metric")
      .outputMode("append").start()
    try {
      input.addData(
        (Array[Byte](1), ev(1)),
        (Array[Byte](2), null.asInstanceOf[Array[Byte]]),  // tombstone
        (Array[Byte](3), "not json".getBytes("UTF-8")),    // malformed
        (Array[Byte](4), "{\"other\":1}".getBytes("UTF-8")), // schema drift
        (Array[Byte](5), ev(5)))
      q.processAllAvailable()
      // the batch's progress carries the intake accounting: every wire
      // row counted, the three undecodable ones counted as dropped —
      // this is the production drop-rate signal, not a side query
      val m = q.lastProgress.observedMetrics.get(KafkaShape.DecodeMetric)
      assert(m != null, "kafka_decode metric missing from query progress")
      assert(m.getAs[Long]("rows_in") == 5L, s"rows_in: $m")
      assert(m.getAs[Long]("rows_dropped") == 3L, s"rows_dropped: $m")
      assert(spark.table("kafka_drop_metric").count() == 2)
    } finally {
      q.stop()
      spark.catalog.dropTempView("kafka_drop_metric")
    }
  }

  test("s06 kafka-shaped gate entry equals the s01 file-feed result") {
    val viaKafka = SparkEntry.queries("s06_stream_kafka_windows")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val viaFiles = SparkEntry.queries("s01_stream_windows")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaKafka.nonEmpty)
    assert(viaKafka == viaFiles)
  }

  test("StreamParity reports stream/batch parity for all twenty entries") {
    val results = StreamParity.run(spark)
    assert(results.map(_.op).sorted == Seq(
      "s01_stream_windows", "s02_stream_sessions", "s03_stream_dedup",
      "s04_stream_sessions_timeout", "s05_stream_interval_join",
      "s06_stream_kafka_windows", "s07_stream_enrich", "s08_stream_hopping",
      "s09_stream_norm_dedup", "s10_stream_incr_dedup",
      "s11_stream_quality_filter", "s12_stream_mixture", "s13_stream_scrub",
      "s14_stream_semdedup", "s15_stream_decontam", "s16_stream_deciles",
      "s17_stream_lake_sink", "s18_stream_bpe", "s19_stream_cdc",
      "s24_stream_lm_score"))
    results.foreach(r => assert(r.ok, s"parity failed: $r"))
  }

  test("s16 decile gate is stateless (no state store in the progress)") {
    val q = SparkEntry.queries("s16_stream_deciles")(spark, sfDir)
    assert(q.collect().nonEmpty)
    // the entry drains its own query; statelessness is asserted on the
    // plan of the same transform over a memory stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Long, String, String)]
    val cuts = graft.operators.TextAnalysis.decileCuts(
      graft.operators.TextAnalysis.withNTok(
        graft.sources.Tables.documents(spark, sfDir)))
    val stream = graft.operators.TextAnalysis.withDecile(
      graft.operators.TextAnalysis.withNTok(
        in.toDF().toDF("doc_id", "source", "text")),
      cuts).filter(org.apache.spark.sql.functions.col("decile") >= 8)
    val query = stream.writeStream.format("memory")
      .queryName("s16_stateless_probe").outputMode("append").start()
    try {
      in.addData((1L, "web", "tok tok tok"))
      query.processAllAvailable()
      val progress = query.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        "decile gate must carry zero streaming state")
    } finally query.stop()
  }
}
