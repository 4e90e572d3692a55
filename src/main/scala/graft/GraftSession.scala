package graft

import org.apache.spark.sql.SparkSession

/** Builds a SparkSession configured for graft's workloads. One place for
  * the settings that matter at scale, so every entry point (Bench, Verify,
  * user jobs) agrees:
  *
  *  - AQE on: runtime partition coalescing and skew-join splitting;
  *  - shuffle partitions sized to the machine locally (a real cluster
  *    should set ~2-3x total executor cores instead);
  *  - UTC session timezone (all oracle comparisons assume it);
  *  - nanosAsLong for the TIMESTAMP(NANOS) events parquet;
  *  - graft's native functions installed via [[GraftExtensions]].
  */
object GraftSession {

  /** The RocksDB streaming state-store provider (ships with Spark; the
    * rocksdbjni native library is on the classpath). The default
    * HDFS-backed provider keeps every state key on the executor heap —
    * fine at gate scale, but a 100-TB stream's keyed state (sessions,
    * dedup keys, join buffers) must spill: RocksDB keeps the working set
    * on local disk with changelog/snapshot checkpointing. Select it with
    * SPARK_GRAFT_ROCKSDB=1 or `builder(rocksDbStateStore = true)`.
    */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def envRocksDb: Boolean =
    sys.env.get("SPARK_GRAFT_ROCKSDB").exists(v =>
      v == "1" || v.equalsIgnoreCase("true"))

  /** SPARK_GRAFT_CPUS, defaulting to every available core — a bench or
    * verify run on a 32-core box should use all 32 without extra flags.
    */
  private def cpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)

  def builder(master: String = s"local[$cpus]",
              shufflePartitions: Int = cpus,
              rocksDbStateStore: Boolean = envRocksDb): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // NOTE on initialPartitionNum: starting shuffles 8x wider and
      // letting AQE coalesce looked like free spill relief for the
      // 100M-row sorts, and measured FASTER at sf1 — but at sf10 the
      // map-side spill merges (256 output segments per spill instead of
      // 32) turned the big exchanges into multi-minute stragglers.
      // Deliberately left at the default (= shuffle.partitions).
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Stock skew detection needs a partition to exceed 256 MB
      // (compressed shuffle bytes) AND 5x the median. On this engine's
      // workload sizes the hot partitions that actually straggle sit in
      // the tens-of-MB range after compression — q43's planted
      // 30%-of-lineitem key at sf10 compresses under the stock floor,
      // so AQE declined to split it and the join ran 17.9 s where the
      // split runs 7.5 s (bench/BENCH_skew_probe_r12.json: 64 MB -> 2.2x).
      // 64 MB matches the advisory partition size (the slice target), so
      // a partition is "skewed" as soon as it is worth slicing; the 5x
      // median factor still gates false positives on uniform shuffles.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64MB")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The generated-class cache (static conf) holds 100 entries by
      // default — sized for a handful of long-running queries, not a
      // 185-entry suite whose operators each compile several
      // whole-stage-codegen units: at 100 the suite cycles the cache
      // and re-runs janino on plans the warmup already compiled. A
      // compiled-class entry is small (bytecode + source key); 5000
      // covers the full suite with headroom at a few hundred MB worst
      // case on a 48g heap. Scale-independent: a production job with
      // fewer distinct plans simply never fills it.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // The HDFS-backed state store retains `minBatchesToRetain` full
      // in-memory STATE VERSIONS per stateful operator (default 100 —
      // sized for deep lineage recovery, not for a suite that runs 19
      // streaming legs in one JVM; the sentinel-staged legs tick
      // hundreds of micro-batches, so 100 retained versions of
      // per-user session state is pure heap ballast). 2 = current +
      // previous, the minimum that still serves checkpoint recovery;
      // the RocksDB path keeps its own on-disk retention regardless.
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      // Managed tables (the bucketed lakes: writeCorpusLake, l07's
      // snap/log) land in a PER-PROCESS warehouse: the default
      // ./spark-warehouse survives the JVM, and a fresh session's
      // in-memory catalog doesn't know the leftover directory — the
      // next saveAsTable then dies with LOCATION_ALREADY_EXISTS. A
      // pid-scoped tmp dir makes every JVM's catalog namespace clean
      // by construction (and lets a test JVM and a verify JVM run
      // concurrently). Nothing reads these tables across JVMs: durable
      // artifacts go through Lake.scratch parquet paths instead.
      .config("spark.sql.warehouse.dir", java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft_wh_${ProcessHandle.current().pid()}").toString)
      .config("spark.ui.enabled", "false")
    if (rocksDbStateStore)
      b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    else b
  }

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
