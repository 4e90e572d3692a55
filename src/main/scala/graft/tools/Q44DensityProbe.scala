package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Events
import graft.sources.Tables

/** Probes q44's one documented scale watch item (r14 verdict): the
  * prefix-sum interval join's WITHIN-BIN window is partitioned by
  * 2-hour time bin, so its parallelism is time-range/W bins and its
  * per-task work grows with EVENT DENSITY at a fixed time range. This
  * probe holds the range fixed and multiplies density 1x/10x/100x —
  * each source row replicated with a deterministic large-prime jitter
  * that stays inside [min_ts, max_ts], purchases included (so window
  * count scales with density too, like a busier shop, not a longer
  * history). If per-bin sorts were the wall, wall(D) would grow
  * superlinearly in D as bins saturate; flat-or-linear wall per row
  * means the plan absorbs density with its existing shape and the
  * two-level bin split stays unimplemented by evidence.
  *
  * Prints one JSON line and writes `bench/BENCH_q44_density_<tag>.json`.
  *
  * Usage: runMain graft.tools.Q44DensityProbe <sfDir> <tag> [reps]
  */
object Q44DensityProbe {
  private val W = 7200000000L // q44's 2 h window in epoch micros

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "last"
    val reps = if (args.length > 2) args(2).toInt else 2
    val s = GraftSession.getOrCreate()

    val base = Tables.events(s, sfDir)
      .select("event_id", "ts_us", "event_type", "value")
      .filter(col("event_type").isin("click", "purchase"))
    val bounds = base.agg(min("ts_us").as("lo"), max("ts_us").as("hi")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = hi - lo + 1
    val bins = span / W + 1

    def densified(d: Int): DataFrame =
      if (d == 1) base
      else base
        .crossJoin(broadcast(s.range(d).select(col("id").as("r"))))
        .withColumn("ts_us",
          lit(lo) + pmod(col("ts_us") - lit(lo) + col("r") * lit(7919L * 1000003L),
                         lit(span)))
        .withColumn("event_id", col("event_id") * d + col("r"))
        .drop("r")

    def run(d: Int): (Double, Long, Long, Long) = {
      val ev = densified(d)
      def once(): Double = {
        val t0 = System.nanoTime()
        Events.intervalAggPrefixSum(ev, W)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // untimed warmup (codegen, scan cache)
      val wall = (1 to reps).map(_ => once()).min
      val rows = ev.count()
      val maxBin = ev.filter(col("event_type") === "click")
        .groupBy(expr(s"ts_us DIV $W")).count()
        .agg(max("count")).head().getLong(0)
      val outRows = Events.intervalAggPrefixSum(ev, W).count()
      (wall, rows, maxBin, outRows)
    }

    val results = Seq(1, 10, 100).map { d =>
      val (wall, rows, maxBin, outRows) = run(d)
      System.err.println(
        f"[q44 probe] density x$d%d: $wall%.2f s, $rows%d rows, " +
          f"max-bin $maxBin%d, $outRows%d windows")
      (d, wall, rows, maxBin, outRows)
    }

    val per = results.map { case (d, wall, rows, maxBin, outRows) =>
      f""""x$d":{"wall_sec":$wall%.3f,"rows":$rows%d,""" +
        f""""max_bin_rows":$maxBin%d,"windows":$outRows%d}"""
    }.mkString(",")
    val (w1, w100) = (results.head._2, results.last._2)
    val json =
      f"""{"probe":"q44_density","sf_dir":"$sfDir","reps":$reps,""" +
        f""""bins":$bins%d,"window_us":$W%d,$per,""" +
        f""""wall_ratio_100x":${w100 / w1}%.2f,""" +
        f""""per_row_ratio_100x":${w100 / w1 / 100.0}%.3f}"""
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("bench"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench/BENCH_q44_density_$tag.json"), json)
    s.stop()
  }
}
