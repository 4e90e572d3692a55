package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Corpus, Dedup, Events, Lake, Multimodal, Pipeline, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory and §7 for the build plan.
  */
object SparkEntry {

  private val allDefs: Map[String, OpDef] =
    Relational.defs ++ Events.defs ++ TextAnalysis.defs ++
      Dedup.defs ++ Corpus.defs ++ Similarity.defs ++ Multimodal.defs ++
      Lake.defs ++ Pipeline.defs ++
      graft.streaming.StreamQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs("q01_pricelist").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, op) => name -> op.build }

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, OpDef(_, Some(sql))) => name -> sql }
}
