package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator: a Spark plan builder plus (when SQL-expressible)
  * a DuckDB oracle query over the same parquet tables. The driver's
  * correctness gate hash-compares the two at sf0.01.
  */
final case class OpDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpDef {
  def sql(build: (SparkSession, String) => DataFrame, oracle: String): OpDef =
    OpDef(build, Some(oracle))
  def rowsOnly(build: (SparkSession, String) => DataFrame): OpDef =
    OpDef(build, None)
}

/** Persist with per-name tracking: rebuilding the same operator in a
  * long-lived session (bench warmup + timed passes, repeated driver runs)
  * unpersists the previous incarnation instead of accumulating cached
  * partitions until LRU eviction.
  */
object Caching {
  private val tracked = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  def persistTracked(name: String, df: DataFrame): DataFrame = {
    val old = tracked.put(name, df)
    if (old != null) old.unpersist(blocking = false)
    df.persist()
  }
}
