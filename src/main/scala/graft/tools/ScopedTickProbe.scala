package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.{GraftTable, Tables}

/** Measures the claim behind GraftTable's scoped merge family (l15/s27):
  * a TRICKLE tick — a changelog touching a small key-local slice — must
  * cost touched-files + changelog through the scoped path, while the
  * full path pays the whole snapshot rewrite regardless of how small
  * the tick is. The probe lands the same trickle changelog (an update
  * of the lowest ~0.2% of the key range) on two fresh tables of the
  * same snapshot, once via mergeAs (full, self-contained) and once via
  * mergeScopedAs (scoped, carry-forward), and reports for each: tick
  * wall, bytes written into the new version, files written, and the
  * touched-file fraction. The spec (GraftTableSpec) already proves the
  * two produce identical table content; this artifact is the COST side
  * — at a fixed tick size the full path's bytes grow with the
  * snapshot, the scoped path's stay flat.
  *
  * Prints one JSON line and writes `bench/BENCH_scoped_tick_<tag>.json`.
  *
  * Usage: runMain graft.tools.ScopedTickProbe <sfDir> <tag> [reps]
  */
object ScopedTickProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "last"
    val reps = if (args.length > 2) args(2).toInt else 2
    val s = GraftSession.getOrCreate()

    val docs = Tables.documents(s, sfDir).select("doc_id", "source", "text")
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val log = docs.filter(col("doc_id") < mx / 512)
      .select(lit("U").as("op"), col("doc_id"), col("source"),
              concat(col("text"), lit(" (tick)")).as("text"))
    val logRows = log.count()

    // DATA bytes/files only: the _manifest parquet is metadata, not
    // tick write cost — counting it would inflate the scoped side
    // (whose data writes are tiny) far more than the full side.
    def dirBytesFiles(p: java.nio.file.Path): (Long, Long) = {
      var bytes = 0L; var files = 0L
      val walk = java.nio.file.Files.walk(p)
      try walk.forEach { f =>
        if (java.nio.file.Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet") &&
            !f.toString.contains("_manifest")) {
          bytes += java.nio.file.Files.size(f); files += 1
        }
      } finally walk.close()
      (bytes, files)
    }

    def tick(kind: String): (Double, Long, Long, Long, Long) = {
      var best = (Double.MaxValue, 0L, 0L, 0L, 0L)
      (1 to reps).foreach { _ =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_tick_$kind").toString
        val t = GraftTable.create(s, dir, docs)
        val snapFiles = t.manifest(0).count()
        val t0 = System.nanoTime()
        kind match {
          case "full"   => t.mergeAs(log, 1)
          case "scoped" => t.mergeScopedAs(log, 1)
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val (bytes, files) =
          dirBytesFiles(java.nio.file.Paths.get(dir, "v1"))
        val carried = t.manifest(1)
          .filter(!col("path").contains("/v1/")).count()
        graft.operators.Lake.deleteTree(java.nio.file.Paths.get(dir))
        if (wall < best._1) best = (wall, bytes, files, carried, snapFiles)
      }
      best
    }

    val results = Seq("full", "scoped").map { kind =>
      val (wall, bytes, files, carried, snapFiles) = tick(kind)
      f""""$kind":{"tick_wall_sec":$wall%.3f,"v1_bytes":$bytes,""" +
        f""""v1_files":$files,"carried_files":$carried,""" +
        f""""snapshot_files":$snapFiles}"""
    }
    val json =
      s"""{"probe":"scoped_tick","sf_dir":"$sfDir","log_rows":$logRows,""" +
        s""""reps":$reps,${results.mkString(",")}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench/BENCH_scoped_tick_$tag.json"), json)
    s.stop()
  }
}
