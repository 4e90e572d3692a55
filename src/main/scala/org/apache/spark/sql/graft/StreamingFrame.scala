package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** The one Spark-internal seam the graft streaming source needs.
  *
  * A V1 streaming `Source.getBatch` must return a frame whose logical
  * plan carries `isStreaming = true` — `MicroBatchExecution` asserts it
  * ("DataFrame returned by getBatch ... did not have isStreaming=true").
  * The only constructor that sets the flag is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`,
  * which is `private[sql]` — exactly how Spark's own V1 sources
  * (FileStreamSource, the V1 Kafka source) built their batch frames.
  * This object lives under `org.apache.spark.sql` purely to satisfy
  * that access qualifier; it contains no other internal use, and the
  * wrapped plan is the graft-side frame's own executed plan — Spark
  * still owns the scan, codegen, and shuffle below it.
  */
object StreamingFrame {

  /** `df` re-wrapped as a streaming-flagged frame with the same schema
    * and the same (lazy, distributed) row computation.
    */
  def of(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse seam, for the V1 SINK side: the frame `addBatch`
    * receives wraps the micro-batch's IncrementalExecution directly, so
    * any further transformation re-analyzes a streaming plan and fails
    * with "must be executed with writeStream.start()". Rewrapping the
    * executed plan's RDD as a batch frame is exactly what Spark's own
    * `ForeachBatchSink` does before handing the frame to user code.
    * Same caveat as foreachBatch: each action on the result re-runs the
    * batch's plan — persist it when consuming more than once.
    */
  def batchOf(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
