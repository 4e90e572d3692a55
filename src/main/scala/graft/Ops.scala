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
