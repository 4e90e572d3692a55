package graft.tools

import graft.GraftSession
import graft.operators.Relational

/** Measures q43's planted-heavy-hitter join with AQE's skew-join
  * handling ON vs OFF at a given SF. At sf10 the hot shuffle partition
  * (~30% of lineitem behind one key) crosses the PRODUCTION thresholds
  * (256 MB / 5x median), so this is the realistic demonstration: no
  * lowered knobs, the stock runtime decides to split. Reports walls for
  * both modes and whether the split actually fired (from the executed
  * plan). Prints one JSON line and writes it to
  * `bench/BENCH_skew_probe_<tag>.json`.
  *
  * Usage: runMain graft.tools.SkewProbe <sfDir> <tag> [reps]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "last"
    val reps = if (args.length > 2) args(2).toInt else 2
    val s = GraftSession.getOrCreate()

    def run(): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val q = Relational.skewJoinAgg(s, sfDir)
      q.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, q.queryExecution.executedPlan.toString
        .contains("SortMergeJoin(skew=true)"))
    }

    // one untimed warmup per mode (scan caching, codegen), then best-of
    def mode(skewOn: Boolean, thresholdMb: Int = 256): (Double, Boolean) = {
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        s"${thresholdMb}MB")
      run()
      val rs = (1 to reps).map(_ => run())
      (rs.map(_._1).min, rs.exists(_._2))
    }

    val savedThreshold = s.conf.get(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    val (offWall, _) = mode(skewOn = false)
    // stock thresholds (256 MB compressed / 5x median): at sf10 the hot
    // partition compresses under the byte floor, so stock leaves the
    // plan alone — recorded to show the runtime's own judgment
    val (stockWall, stockFired) = mode(skewOn = true)
    // 64 MB: the common tuned floor on mid-size clusters, and since r14
    // GraftSession's session default (see the builder comment); the
    // planted partition crosses it and the split fires
    val (tunedWall, tunedFired) = mode(skewOn = true, thresholdMb = 64)
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      savedThreshold)

    val json =
      f"""{"probe":"skew_join","sf_dir":"$sfDir","reps":$reps,""" +
        f""""skew_off_sec":$offWall%.3f,""" +
        f""""stock_on_sec":$stockWall%.3f,"stock_fired":$stockFired,""" +
        f""""tuned64mb_on_sec":$tunedWall%.3f,"tuned_fired":$tunedFired}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench/BENCH_skew_probe_$tag.json"), json)
    s.stop()
  }
}
