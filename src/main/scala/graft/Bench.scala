package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: every SparkEntry query at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout.
  *
  * Harness design (the properties that make the numbers a gate signal):
  *  - execution is a noop-sink WRITE, not `.count()` — count lets Catalyst
  *    drop final sorts and prune projections, so it times a different plan
  *    than the one users run;
  *  - fixed alphabetical query order, so run-to-run deltas are code deltas,
  *    not schedule deltas;
  *  - an untimed warmup pass at the smallest SF compiles the same
  *    whole-stage-codegen classes the timed runs reuse (the cache keys on
  *    generated source, which is data-independent);
  *  - >= 3 timed reps per query, reporting the MEDIAN — a single pass
  *    cannot resolve sub-second differences (r1->r2 showed +/-4x swings on
  *    unchanged plans).
  */
object Bench {
  private val Reps = 3

  /** Fully executes the plan without Catalyst's count-specific pruning. */
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  // Box-noise self-defense (the r4/r5/r6 lesson: driver benches on a
  // loaded box produced 10-30x per-query inflations on unchanged code,
  // each costing a judge session to adjudicate): the artifact carries
  // the 1-minute loadavg around the run and per-query JVM CPU seconds.
  // A noisy run is then self-diagnosing — wall time ballooning while
  // CPU-per-query holds at historical levels (and loadavg >> this JVM's
  // share) is external load, not a regression.
  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
  private def loadAvg: Double = osBean.getSystemLoadAverage
  private def procCpuSec: Double = osBean match {
    case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
    case _ => -1.0 // non-HotSpot bean: field reads -1, never lies as 0
  }

  // true median: averages the middle pair on even counts (a rep that
  // failed leaves 2 survivors — taking the upper one would bias upward)
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // optional comma-separated name-prefix allowlist (e.g. "q,d01,e" =
    // all relational + exact dedup + the ANN family) — for selective
    // scale probes; absent = the full driver-contract run
    val filter = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // "" or ",," = no filter, not "run nothing"
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filter.forall(_.exists(name.startsWith)) }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      ordered.foreach { case (name, fn) =>
        // surface the first warmup failure per query on stderr — a query
        // broken at warmup would otherwise hide until the timed reps
        try run(fn(spark, warmDir)) catch {
          case t: Throwable =>
            System.err.println(s"[bench] warmup failed for $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
        }
      }
    val loadStart = loadAvg
    val results = ordered.map { case (name, fn) =>
      val la = loadAvg
      val reps = (1 to Reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val c0 = procCpuSec
        try {
          run(fn(spark, sfDir))
          Some(((System.nanoTime() - t0) / 1e9, procCpuSec - c0))
        } catch { case _: Throwable => None }
      }
      // -1 marks a query that failed every rep (a failure, not a timing)
      val wall = if (reps.isEmpty) -1.0 else median(reps.map(_._1))
      val cpu = if (reps.isEmpty) -1.0 else median(reps.map(_._2))
      (name, wall, cpu, la)
    }
    // The stdout contract line must stay COMPACT: the driver machine-reads
    // it from a bounded tail capture, and r6/r7 both came back
    // `parsed: null` because the line (grown by the diag block and
    // full-precision doubles) outran that window. Wall times at 3 decimals
    // keep ~90 queries under ~3 KB; everything diagnostic goes to a file.
    val qs = results.map { case (k, w, _, _) => f""""$k":$w%.3f""" }
      .mkString("{", ",", "}")
    val diag = results
      .map { case (k, w, c, l) =>
        f""""$k":{"wall_sec":$w%.3f,"cpu_sec":$c%.3f,"loadavg":$l%.2f}""" }
      .mkString(
        s"""{"loadavg_start":$loadStart,"loadavg_end":$loadAvg,"sf":"$sfDir","queries":{""",
        ",", "}}")
    val diagFile = new java.io.File("bench/BENCH_diag_last.json")
    diagFile.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(diagFile, "UTF-8")
    try w.println(diag) finally w.close()
    val total = results.map(_._2).filter(_ >= 0).sum
    spark.stop()
    // printed AFTER spark.stop() so no late executor/log line can land
    // between the contract line and the end of stdout
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","diag_file":"${diagFile.getPath}"}""")
  }
}
