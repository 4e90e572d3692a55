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
    // Stateful streaming ops allocate one state store PER shuffle
    // partition per operator (a stream-stream join allocates four) and
    // pay their checkpoint/commit overhead per micro-batch; at the gate's
    // data sizes that fixed cost dwarfs the work, so the drain runs with
    // fewer partitions. The streaming thread clones the session and
    // captures confs ASYNCHRONOUSLY after start() returns, so the conf is
    // held at 8 until the drain completes (restoring right after start()
    // would race the clone and let the first micro-batch run at the
    // session default). On a real cluster this knob sizes state shards to
    // executors as usual.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = streamed.writeStream.format("memory").queryName(sink)
        .outputMode(mode).start()
      try {
        if (feeds.isEmpty) q.processAllAvailable()
        else feeds.foreach { f => f(); q.processAllAvailable() }
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    val out = spark.table(sink)
    graft.Caching.persistTracked(name, out)
    spark.catalog.dropTempView(sink)
    out
  }
}
