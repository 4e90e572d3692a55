package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter between the events table shape and the Kafka WIRE shape — the
  * exact schema Spark's Kafka source emits (key/value binary, topic,
  * partition, offset, timestamp, timestampType). A real deployment swaps
  * the file feed for `spark.readStream.format("kafka")` and everything
  * downstream of [[fromKafkaShape]] is unchanged; the gate runs the same
  * adapter over a kafka-shaped file feed (s06) and hash-checks the result
  * against the batch oracle.
  *
  * Payload encoding: the event row as JSON in `value` (nanosecond `ts`
  * carried as a JSON integer — exact for 64-bit longs in both to_json and
  * from_json), the partition key in `key` (user_id — the same key the
  * stateful ops shuffle on, so a real topic partitioned this way feeds
  * sessionization without a re-shuffle of hot users across partitions).
  */
object KafkaShape {

  val Topic = "graft_events"

  /** The `value` payload schema ([[fromKafkaShape]]'s from_json target). */
  val ValueSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanoseconds, as in the lake
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Events (raw lake shape: nanos-long `ts`) -> Kafka wire rows. */
  def toKafkaShape(events: DataFrame, partitions: Int = 8): DataFrame =
    events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("event_id"), col("ts"), col("user_id"),
                     col("event_type"), col("value"), col("props")))
        .cast("binary").as("value"),
      lit(Topic).as("topic"),
      pmod(col("user_id"), lit(partitions.toLong)).cast("int").as("partition"),
      col("event_id").as("offset"),
      // producer-assigned CreateTime (type 0): the event time at micros —
      // a LogAppendTime topic would carry type 1 and broker clocks here
      timestamp_micros(expr("ts DIV 1000")).as("timestamp"),
      lit(0).as("timestampType"))

  /** The observe() metric name under which [[fromKafkaShape]] reports its
    * intake accounting (`rows_in`, `rows_dropped`) — in streaming it
    * surfaces per micro-batch in `StreamingQueryProgress.observedMetrics`;
    * in batch, through any registered QueryExecutionListener.
    */
  val DecodeMetric = "kafka_decode"

  /** Kafka wire rows -> the events column shape the operators consume,
    * with the shared `ts_us`/`ts` lifting (identical to the file path, so
    * oracles and batch twins agree to the microsecond).
    *
    * Undecodable payloads — tombstones (null value) and non-JSON bytes,
    * both routine on a real topic — are dropped at this boundary rather
    * than decoded into rows that would poison downstream aggregates with
    * a spurious null-key group. PERMISSIVE from_json yields a NULL
    * struct for a null input but an all-null-FIELDS struct for malformed
    * bytes, so the guard requires the event identity (event_id, ts) to
    * have decoded — a spec feeds both shapes through. The drops are NOT
    * silent: an observe() aggregate ([[DecodeMetric]]) counts total and
    * dropped rows inline — zero extra passes, visible in every query
    * progress — so a topic whose producer quietly changes schema shows up
    * as a drop-rate step, not as slowly-thinning sessions. A deployment
    * that must account for every message routes the failing rows to a
    * dead-letter sink as well.
    *
    * `metricName` exists because observe() names must be unique within
    * one query plan — a query decoding two topics (join/union of two
    * [[fromKafkaShape]] legs) names each leg's metric distinctly.
    */
  def fromKafkaShape(df: DataFrame,
                     metricName: String = DecodeMetric): DataFrame = {
    val flagged = df
      .select(from_json(col("value").cast("string"), ValueSchema).as("e"))
      .withColumn("decoded",
        col("e").isNotNull &&
        col("e.event_id").isNotNull && col("e.ts").isNotNull)
      .observe(metricName,
        count(lit(1)).as("rows_in"),
        count(when(!col("decoded"), 1)).as("rows_dropped"))
    graft.sources.Tables.withTsUs(
        flagged.filter(col("decoded")).select("e.*"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  /** The DEAD-LETTER leg: exactly the wire rows [[fromKafkaShape]]'s
    * guard drops — same from_json + identity test, complemented — with
    * the ORIGINAL bytes and whatever wire metadata the frame carries
    * (topic/partition/offset/timestamp when fed by a real Kafka source),
    * plus a coarse `reason`. Keeping the raw `value` is the point: a
    * dead-letter row is replayable after the producer bug is fixed,
    * where the decode metric alone only proves rows went missing.
    *
    * Run it as a SECOND query over the same source (file/Kafka sources
    * serve multiple queries, each with its own offsets), e.g.
    * `deadLetters(wire).writeStream.format("parquet")...` — or inside a
    * foreachBatch that writes both legs from one persisted batch.
    * KafkaDeadLetterSpec drives the two-query shape and reconciles the
    * sink's count against [[DecodeMetric]].
    *
    * `reason`: a null payload is a tombstone (routine compaction
    * traffic, often filtered before the sink); anything else that failed
    * is `undecodable` (PERMISSIVE from_json cannot distinguish non-JSON
    * bytes from schema drift without a second parse — both decode to a
    * struct whose identity fields are null).
    */
  def deadLetters(df: DataFrame): DataFrame = {
    val meta = Seq("topic", "partition", "offset", "timestamp")
      .filter(df.columns.contains).map(col)
    df.withColumn("e", from_json(col("value").cast("string"), ValueSchema))
      .filter(col("e").isNull ||
        col("e.event_id").isNull || col("e.ts").isNull)
      .select(col("key") +: col("value") +: meta :+
        when(col("value").isNull, "tombstone")
          .otherwise("undecodable").as("reason"): _*)
  }
}
