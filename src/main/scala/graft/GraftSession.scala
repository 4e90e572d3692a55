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

  /** SPARK_GRAFT_CPUS, defaulting to every available core — a bench or
    * verify run on a 32-core box should use all 32 without extra flags.
    */
  private def cpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)

  def builder(master: String = s"local[$cpus]",
              shufflePartitions: Int = cpus): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
