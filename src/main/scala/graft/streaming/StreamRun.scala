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

  /** [[drain]] for append-mode legs whose RESULT is large (sf10's
    * sessionization emits millions of sessions, the dedup leg re-emits
    * the whole feed): the memory sink appends every result row into one
    * driver-side buffer — a single-threaded collect that dwarfs the
    * operator at scale — so these legs sink to PARQUET instead (the s17
    * transport shape: transactional file sink + checkpoint) and hand
    * back a distributed scan of the committed files. Identical rows,
    * identical oracle hashes; the result never funnels through the
    * driver. `scratch` must be a per-(leg, corpus) dir — it is wiped at
    * start so a rerun sees a fresh sink+checkpoint, never a resumed one.
    */
  def drainToFiles(spark: SparkSession, streamed: DataFrame,
                   name: String, scratch: String,
                   inputBytes: Long = -1L): DataFrame = {
    graft.operators.Lake.deleteTree(java.nio.file.Paths.get(scratch))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val parts = sys.env.get("SPARK_GRAFT_STREAM_PARTS")
      .map(_.toLong).getOrElse {
        if (inputBytes <= 0L) 8L
        else math.max(8L, math.min(before.toLong,
          inputBytes / (2L * 1024 * 1024)))
      }
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val q = streamed.writeStream.format("parquet")
        .option("path", s"$scratch/out")
        .option("checkpointLocation", s"$scratch/ckpt")
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    val outPath = java.nio.file.Paths.get(scratch, "out")
    val out =
      if (java.nio.file.Files.isDirectory(outPath))
        spark.read.parquet(outPath.toString)
      else // zero committed batches: an empty frame in the stream's shape
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          streamed.schema)
    graft.Caching.persistTracked(name, out)
    out
  }

  def drain(spark: SparkSession, streamed: DataFrame, mode: String,
            name: String, feeds: Seq[() => Unit] = Seq.empty,
            inputBytes: Long = -1L): DataFrame = {
    val sink = s"${name}_${runId.incrementAndGet()}"
    // Stateful streaming ops allocate one state store PER shuffle
    // partition per operator (a stream-stream join allocates four) and
    // pay their checkpoint/commit overhead per micro-batch; at the gate's
    // data sizes that fixed cost dwarfs the work, so the drain runs with
    // fewer partitions — but a BIG drain (sf10's 20M-event feeds) is the
    // opposite regime: the stateful phase is CPU-bound on per-row object
    // work and 8 state partitions cap it at 8 threads. Callers that know
    // their feed size pass `inputBytes` and the drain scales its state
    // shard count with the data (~one shard per 2 MB of feed, clamped to
    // [8, session default]) — the spill-aware sizing rule: partition
    // count follows data volume, and results are partition-count
    // invariant (keyed state and aggregates don't care how keys shard).
    // The streaming thread clones the session and
    // captures confs ASYNCHRONOUSLY after start() returns, so the conf is
    // held until the drain completes (restoring right after start()
    // would race the clone and let the first micro-batch run at the
    // session default). On a real cluster this knob sizes state shards to
    // executors as usual.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // SPARK_GRAFT_STREAM_PARTS pins the drain's state shard count
    // outright (cluster tuning / experiments); otherwise size from the
    // feed when known
    val parts = sys.env.get("SPARK_GRAFT_STREAM_PARTS")
      .map(_.toLong).getOrElse {
        if (inputBytes <= 0L) 8L
        else math.max(8L, math.min(before.toLong,
          inputBytes / (2L * 1024 * 1024)))
      }
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
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
