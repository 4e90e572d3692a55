package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Lake
import graft.sources.{GraftTable, Tables}

/** Measures the claim behind the format("graft") connector (l19): a
  * pushed key-range filter is evaluated against the version MANIFEST at
  * planning time, so the data scan opens only span-admitted files. The
  * probe runs the same narrow-range aggregate three ways:
  *
  *  - `connector`: format("graft") — manifest admission, then the
  *    pruned parquet scan;
  *  - `table_scan`: the facade's plain read + filter — no manifest
  *    admission, but the table's KEY-CLUSTERED layout lets parquet
  *    row-group stats reject almost everything (at a handful of files
  *    this ties or beats the connector, whose fixed cost is the
  *    metadata reads — the manifest's win over footer stats is
  *    planning IO at 10M-file counts, not scan bytes on 8);
  *  - `debris_scan`: the same rows as an ARRIVAL-ORDER lake (no
  *    layout, every file/row-group spanning the whole key range) —
  *    what a lake without maintenance actually looks like, where stats
  *    reject nothing and the filter pays the full snapshot.
  *
  * The connector-vs-debris gap is the product claim (layout + manifest
  * + pushdown vs raw parquet); the connector-vs-table gap is the
  * connector's fixed overhead. Admitted files/bytes come from the
  * manifest — the IO bound a 1000-executor scan obeys.
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

    // the unmaintained twin in its real shape: hundreds of arrival-order
    // micro-files (ingest debris — l01's before-picture), every one
    // spanning the whole key range, so stats reject nothing and the
    // range pays listing + footer + scan for all of them
    val DebrisFiles = 512
    cols.repartition(DebrisFiles)
      .write.mode("overwrite").parquet(s"$base/debris")

    val viaConnector = timed(rangeAgg(
      s.read.format("graft").option("key", "l_orderkey").load(s"$base/tbl")))
    val viaTableScan = timed(rangeAgg(t.read()))
    val viaDebris = timed(rangeAgg(s.read.parquet(s"$base/debris")))

    val json =
      s"""{"metric":"connector_prune","sf_dir":"$sfDir","reps":$reps,""" +
      s""""key_range":[$lo,$hi],""" +
      s""""total_files":$totFiles,"total_bytes":$totBytes,""" +
      s""""admitted_files":$admFiles,"admitted_bytes":$admBytes,""" +
      s""""connector_wall_s":${f"$viaConnector%.3f"},""" +
      s""""table_scan_wall_s":${f"$viaTableScan%.3f"},""" +
      s""""debris_scan_wall_s":${f"$viaDebris%.3f"}}"""
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("bench"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench/BENCH_connector_prune_$tag.json"),
      json + "\n")
  }
}
