package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Schema-aware loaders for the driver-provided parquet tables.
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom; nothing is cached or materialized here.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads with
    * `nanosAsLong` (as a raw Long of epoch nanoseconds). To keep time
    * arithmetic bit-identical with the DuckDB oracle we expose `ts_us`
    * (epoch microseconds, floor division — matches `epoch_ns(ts)//1000`)
    * and do all bucketing/gap math on it numerically.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withTsUs(load(spark, dir, "events"))
  }

  /** The ts_us lifting, shared with the streaming readers so batch twins,
    * oracles, and streams all derive event time identically.
    */
  def withTsUs(df: DataFrame): DataFrame = {
    val tsUs = df.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000")
      case _        => unix_micros(col("ts"))
    }
    df.withColumn("ts_us", tsUs)
  }
}
