package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Lake
import graft.sources.{GraftTable, Tables}

/** Measures the claim behind the format("graft") connector (l19): a
  * pushed key-range filter is evaluated against the version MANIFEST at
  * planning time, so the data scan opens only span-admitted files —
  * while the same filter over a plain read of the same version's file
  * set must open every file and rely on row-group stats alone. The
  * probe lands lineitem as a graft table (range-partitioned on
  * l_orderkey, so per-file key spans are tight), then runs the same
  * narrow-range aggregate both ways and reports: admitted vs total
  * files and bytes (from the manifest — the IO the plan can touch),
  * and the median wall of each path. The spec (GraftSourceSpec)
  * already proves answer identity and that the admission narrows; this
  * artifact is the COST side — admitted bytes track selectivity with a
  * one-file floor, full-scan bytes track the snapshot.
  *
  * Prints one JSON line and writes `bench/BENCH_connector_prune_<tag>.json`.
  *
  * Usage: runMain graft.tools.ConnectorPruneProbe <sfDir> <tag> [reps]
  */
object ConnectorPruneProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "last"
    val reps = if (args.length > 2) args(2).toInt else 3
    val s = GraftSession.getOrCreate()

    val base = Lake.scratch("connprobe", sfDir)
    Lake.deleteTree(java.nio.file.Paths.get(base))
    val cols = Tables.lineitem(s, sfDir).select("l_orderkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_shipdate")
    val t = GraftTable.create(s, s"$base/tbl", cols, key = "l_orderkey")

    val mx = cols.agg(max("l_orderkey")).head().getLong(0)
    val lo = mx / 2
    val hi = lo + math.max(1L, mx / 1000) // ~0.1% of the key range

    val m = t.manifest(t.currentVersion).select("key_lo", "key_hi", "n_bytes")
      .collect()
    val (totFiles, totBytes) = (m.length.toLong, m.map(_.getLong(2)).sum)
    val adm = m.filter(r => r.getLong(1) >= lo && r.getLong(0) < hi)
    val (admFiles, admBytes) = (adm.length.toLong, adm.map(_.getLong(2)).sum)

    def timed(build: => org.apache.spark.sql.DataFrame): Double = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        build.collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      walls(walls.length / 2)
    }
    def rangeAgg(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("l_orderkey") >= lo && col("l_orderkey") < hi)
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))

    val viaConnector = timed(rangeAgg(
      s.read.format("graft").option("key", "l_orderkey").load(s"$base/tbl")))
    val viaFullScan = timed(rangeAgg(t.read()))

    val json =
      s"""{"metric":"connector_prune","sf_dir":"$sfDir","reps":$reps,""" +
      s""""key_range":[$lo,$hi],""" +
      s""""total_files":$totFiles,"total_bytes":$totBytes,""" +
      s""""admitted_files":$admFiles,"admitted_bytes":$admBytes,""" +
      s""""connector_wall_s":${f"$viaConnector%.3f"},""" +
      s""""fullscan_wall_s":${f"$viaFullScan%.3f"}}"""
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("bench"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench/BENCH_connector_prune_$tag.json"),
      json + "\n")
  }
}
