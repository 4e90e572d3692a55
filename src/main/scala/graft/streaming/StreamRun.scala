package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.atomic.AtomicInteger

/** The one memory-sink drain lifecycle, shared by the gate entries
  * ([[StreamQueries]]) and the parity harness ([[StreamParity]]): start
  * the query on a uniquely-named sink, apply each feed step and drain
  * between them, stop, and hand back the sink rows as a DataFrame that
  * outlives the dropped temp view (persisted + tracked under `name` so
  * repeated bench/verify invocations replace rather than accumulate).
  */
private[streaming] object StreamRun {

  private val runId = new AtomicInteger()

  def drain(spark: SparkSession, streamed: DataFrame, mode: String,
            name: String, feeds: Seq[() => Unit] = Seq.empty): DataFrame = {
    val sink = s"${name}_${runId.incrementAndGet()}"
    val q = streamed.writeStream.format("memory").queryName(sink)
      .outputMode(mode).start()
    try {
      if (feeds.isEmpty) q.processAllAvailable()
      else feeds.foreach { f => f(); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(sink)
    graft.Caching.persistTracked(name, out)
    spark.catalog.dropTempView(sink)
    out
  }
}
