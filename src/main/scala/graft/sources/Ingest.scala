package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Intake-side sources and sinks (the reference ingests periodic JSON
  * auction dumps and serves from storage; here: schema'd JSON line ingest
  * and a partitioned-parquet lake sink whose layout prunes at read time).
  */
object Ingest {

  /** Schema for JSON-lines event dumps (the `events` table's shape with a
    * string timestamp). An explicit schema keeps ingest single-pass —
    * schema inference would read every dump twice at 100 TB.
    */
  val eventDumpSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("ts", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true)))

  /** Read newline-delimited JSON dumps into the normalized event shape
    * (`ts_us` epoch microseconds, like [[Tables.events]]). Corrupt lines
    * land in `_corrupt_record`-free mode PERMISSIVE as nulls and are
    * dropped explicitly, so one bad dump line can't fail an intake batch.
    * The `props` payload is extracted into typed columns here, BY
    * CONSTRUCTION — everything downstream of intake sees `props_k` as a
    * plain column (see [[withTypedProps]]).
    */
  def readEventDumps(spark: SparkSession, path: String): DataFrame =
    withTypedProps(spark.read
      .schema(eventDumpSchema)
      .option("mode", "PERMISSIVE")
      .json(path)
      .filter(col("event_id").isNotNull)
      // try_to_timestamp: ANSI mode is on by default in Spark 4, and a
      // plain to_timestamp would throw on one malformed ts and fail the
      // whole intake batch
      .withColumn("ts_us", unix_micros(expr("try_to_timestamp(ts)")))
      .filter(col("ts_us").isNotNull)
      .drop("ts"))

  /** Schema of the `props` JSON payload carried by events. */
  val propsSchema: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = true)))

  /** Extract the `props` JSON into typed columns ONCE, at intake. A
    * per-query `get_json_object` (the q24 shape) re-parses every payload
    * on every query — fine ad hoc, wasteful recurring at 100 TB. Applied
    * before [[writeEventLake]], the lake carries `props_k` as a plain
    * column and downstream extraction queries become column scans with
    * full pushdown. `from_json` is lenient per field: a malformed payload
    * yields nulls, never a failed intake batch. NOTE the deliberate
    * semantic difference from q24's ad-hoc shape: `get_json_object(...)
    * .cast("int")` THROWS under ANSI mode on a non-integer `k` (as does
    * its DuckDB oracle's CAST), while intake extraction degrades that row
    * to null — strictness belongs in ad-hoc queries, resilience at intake.
    */
  def withTypedProps(df: DataFrame): DataFrame =
    df.withColumn("props_k", from_json(col("props"), propsSchema).getField("k"))

  /** Write a day-partitioned event lake: directory layout `day=YYYY-MM-DD`
    * so date-bounded reads prune whole partitions before any IO.
    */
  def writeEventLake(df: DataFrame, path: String): Unit =
    df.withColumn("day", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
      .repartition(col("day")) // one shuffle -> one file set per day
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  /** Read the event lake with partition pruning driven by `day` filters. */
  def readEventLake(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write the event lake day-partitioned AND bucketed+sorted by
    * `user_id` — the produce-side of the zero-exchange story: `day=`
    * directories prune time-bounded scans before any IO, and the bucket
    * layout pre-shuffles the key every stateful consumer (sessionize,
    * per-user joins, per-user aggs) groups on, ONCE at write time, so
    * downstream joins/aggregations on `user_id` read co-located buckets
    * with no exchange on the lake side (IngestSpec proves both plan
    * properties). Bucket metadata lives in the table catalog —
    * `saveAsTable`, not a bare path write, which would silently drop it.
    *
    * Bucket count is a layout constant, not a per-write tunable: every
    * writer of the same table must agree (Spark refuses mismatched
    * appends), and consumers see `buckets` parallel tasks per partition
    * — size it to executor count at the target scale.
    */
  def writeBucketedEventLake(df: DataFrame, table: String,
      buckets: Int = 8): Unit =
    df.withColumn("day", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
      // bucketed writes do NOT shuffle — each input task emits its own
      // file per (day, bucket), so an unpartitioned 100-TB write would
      // fragment into tasks x days x buckets files. Repartitioning on
      // (day, bucket-id) — hash() is the same Murmur3 family bucketing
      // uses — lands each (day, bucket) in ONE task: one file each,
      // the bucketed twin of writeEventLake's repartition("day").
      .repartition(col("day"), pmod(hash(col("user_id")), lit(buckets)))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("day")
      .bucketBy(buckets, "user_id")
      .sortBy("user_id")
      .saveAsTable(table)

  /** Write the curated-corpus selection (doc_id, source, split — the
    * d14/d28 survivor shape) as the TRAINING lake, closing the loop from
    * dedup to the bytes a trainer reads: split/source directory
    * partitions prune a trainer's read ("train split, these sources")
    * before any IO, and doc_id bucketing+sorting pre-shuffles the key
    * every bytes-fetch join uses, once, at write time. Written through
    * the catalog ([[writeBucketedEventLake]]'s discipline — a bare path
    * write silently drops bucket metadata), with one task per
    * (partition, bucket) so the file count is partitions x buckets, not
    * x input tasks.
    */
  def writeCorpusLake(survivors: DataFrame, table: String,
      buckets: Int = 8): Unit =
    survivors
      .repartition(col("split"), col("source"),
                   pmod(hash(col("doc_id")), lit(buckets)))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("split", "source")
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .saveAsTable(table)

  /** The bytes side of the corpus lake: the documents table bucketed by
    * the SAME key and count, so the survivors-to-bytes join is a local
    * merge of co-located buckets — zero exchange on either side
    * (CorpusLakeSpec proves it on the executed plan).
    */
  def writeDocumentLake(docs: DataFrame, table: String,
      buckets: Int = 8): Unit =
    docs
      .repartition(pmod(hash(col("doc_id")), lit(buckets)))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .saveAsTable(table)
}
