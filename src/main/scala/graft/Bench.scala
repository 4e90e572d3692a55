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

  // Cross-box calibration: a fixed single-thread integer loop timed at
  // bench start. The r10 lesson: the whole 91-query suite came back a
  // uniform ~2x r8's walls — same code, same data sizes, trivial scans
  // included — i.e. the BOX changed speed between rounds, and nothing in
  // the artifact could prove it. This scalar normalizes round-over-round
  // comparisons: wall_r10/wall_r8 ≈ calib_r10/calib_r8 => environment,
  // not regression.
  private def calibrate(): Double = {
    var acc = 0L
    var i = 0
    val t0 = System.nanoTime()
    while (i < 300000000) {
      acc = acc * 6364136223846793005L + 1442695040888963407L + i
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    if (acc == 42L) System.err.print("") // defeat dead-code elimination
    dt
  }

  // Corpus content stamp: a digest over the input directory's data
  // files (sorted relative path, size, first/last 64 KiB — the
  // Tables.stamp recipe, whole-corpus). Round-over-round comparisons
  // broke silently when the driver regenerated /root/testdata between
  // rounds (r15→r16: same paths, different bytes, PERF paired nothing);
  // the stamp in the summary lets any consumer detect a regen instead
  // of mis-reading data deltas as code deltas. Additions-only: nothing
  // existing in the contract line moves.
  private def corpusStamp(sfDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val root = java.nio.file.Paths.get(sfDir)
    if (!java.nio.file.Files.isDirectory(root)) return "absent"
    val walk = java.nio.file.Files.walk(root)
    val files =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .map(p => (root.relativize(p).toString, p)).toSeq.sortBy(_._1)
      } finally walk.close()
    files.foreach { case (rel, p) =>
      val size = java.nio.file.Files.size(p)
      md.update(rel.getBytes("UTF-8"))
      md.update(java.nio.ByteBuffer.allocate(8).putLong(size).array())
      val ch = java.nio.channels.FileChannel.open(p)
      try {
        def chunk(pos: Long, len: Int): Unit = {
          val buf = java.nio.ByteBuffer.allocate(len)
          var off = pos
          while (buf.hasRemaining) {
            val n = ch.read(buf, off)
            if (n < 0) return
            off += n
          }
          buf.flip(); md.update(buf)
        }
        chunk(0L, math.min(size, 65536L).toInt)
        if (size > 65536L) {
          val pos = math.max(65536L, size - 65536L)
          chunk(pos, (size - pos).toInt)
        }
      } finally ch.close()
    }
    md.digest().map("%02x".format(_)).mkString
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
    val calib = calibrate()
    val results = ordered.map { case (name, fn) =>
      // Per-query cache isolation (the r14 lesson: the new d40/d42
      // entries run alphabetically just before the e-family and their
      // cached frames + heap pressure bled into e05/e08/e09's walls —
      // +8-18 s in the ladder vs unchanged isolation probes). Each
      // query is timed against ITS OWN working set: leftover cached
      // relations from earlier entries are dropped and a GC hint clears
      // the dead heap before the first rep. Warm-model timing is
      // preserved — rep 1 rebuilds the query's own caches, the median
      // of 3 reports the warm steady state; disk-memoized models
      // (AnnIndexLake, BPE merges) are untouched.
      spark.catalog.clearCache()
      System.gc()
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
    // it from a ~2000-char tail capture (with sbt's `[success]` line
    // eating the end), and at 90+ queries even a 3-decimal per-query map
    // is ~2300 chars — r5 through r9 all came back `parsed: null`. So the
    // LINE carries only totals + the slowest three + failure accounting;
    // the full per-query map and the cpu/loadavg diagnostics live in
    // bench/ artifact files whose paths the line names.
    //
    // A probe run (SPARK_GRAFT_QUERIES set) writes its artifacts to
    // *_probe.json so a one-query iteration never clobbers the committed
    // full-run record (the r9 lesson: a q24 probe overwrote the full
    // diag).
    val suffix = if (filter.isDefined) "probe" else "last"
    def writeJson(path: String, body: String): String = {
      val f = new java.io.File(path)
      f.getParentFile.mkdirs()
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(body) finally w.close()
      f.getPath
    }
    val stamp = corpusStamp(sfDir)
    val qs = results.map { case (k, w, _, _) => f""""$k":$w%.3f""" }
      .mkString("{", ",", "}")
    val queriesFile = writeJson(s"bench/BENCH_queries_$suffix.json",
      s"""{"sf":"$sfDir","corpus_stamp":"$stamp","queries":$qs}""")
    val diagFile = writeJson(s"bench/BENCH_diag_$suffix.json",
      results
        .map { case (k, w, c, l) =>
          f""""$k":{"wall_sec":$w%.3f,"cpu_sec":$c%.3f,"loadavg":$l%.2f}""" }
        .mkString(
          f"""{"loadavg_start":$loadStart,"loadavg_end":$loadAvg,"calib_sec":$calib%.3f,"sf":"$sfDir","corpus_stamp":"$stamp","queries":{""",
          ",", "}}"))
    val ok = results.filter(_._2 >= 0)
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = ok.map(_._2).sum
    // a run with hard-failed queries must not read as a speedup: the
    // contract line carries n_failed + the failed names so a gate
    // summing `value` can see the coverage hole (r9: 14 crashes
    // presented as rc=0 with a lower total)
    val failedJson = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    val slowest = ok.sortBy(-_._2).take(3)
      .map { case (k, w, _, _) => f""""$k":$w%.3f""" }.mkString("{", ",", "}")
    spark.stop()
    // The same contract object ALSO lands in a bare-JSON file: six rounds
    // of driver tails came back `parsed: null` because sbt frames stdout
    // with `[info] `/`[success]` noise the builder does not control. Any
    // consumer that wants the contract without log scraping reads the
    // summary file (probe runs write *_probe so they never clobber it).
    val contract = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"slowest":$slowest,"calib_sec":$calib%.3f,"sf":"$sfDir","corpus_stamp":"$stamp","queries_file":"$queriesFile","diag_file":"$diagFile","summary_file":"bench/BENCH_summary_$suffix.json"}"""
    writeJson(s"bench/BENCH_summary_$suffix.json", contract)
    // printed AFTER spark.stop() so no late executor/log line can land
    // between the contract line and the end of stdout
    println(contract)
  }
}
