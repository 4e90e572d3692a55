package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.{GraftTable, Tables}

/** Measures the claim behind deletion vectors (l27): a SCATTERED
  * delete — a few rows in (nearly) every file, the layout-adversarial
  * case — costs a full touched-file rewrite through the l22 scoped
  * path, but only a churn-sized tombstone write through
  * `deleteVectored`. The probe lands the same scattered predicate
  * (`doc_id % 997 == 0`, ~0.1% of rows spread across the whole key
  * range so virtually every file holds a match) on two fresh tables of
  * the same snapshot, once via `delete` (scoped rewrite) and once via
  * `deleteVectored` (DV), and reports for each: delete wall, DATA bytes
  * and files written into the new version, and the tombstone bytes (the
  * DV side's entire payload; zero on the rewrite side). It then prices
  * the DV's READ tax — the broadcast (file, key) anti-join every reader
  * pays until compaction collects the tombstones — as a full-snapshot
  * aggregate wall before and after the DV delete on the same table.
  * DeletionVectorSpec proves the two paths produce identical content;
  * this artifact is the COST side: at a fixed match count the rewrite
  * side's bytes grow with the snapshot (every file touched), the DV
  * side's stay at tombstone size.
  *
  * Prints one JSON line and writes `bench/BENCH_dv_<tag>.json`.
  *
  * Usage: runMain graft.tools.DvProbe <sfDir> <tag> [reps]
  */
object DvProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "last"
    val reps = if (args.length > 2) args(2).toInt else 2
    val s = GraftSession.getOrCreate()

    val docs = Tables.documents(s, sfDir).select("doc_id", "source", "text")
    val cond = pmod(col("doc_id"), lit(997)) === 0
    val matches = docs.filter(cond).count()

    // DATA bytes/files vs tombstone bytes, split: the _manifest parquet
    // is metadata on both sides and excluded; the _graft_dv parquet IS
    // the DV side's write payload and is reported as its own number
    def dirCost(p: java.nio.file.Path): (Long, Long, Long) = {
      var bytes = 0L; var files = 0L; var dvBytes = 0L
      val walk = java.nio.file.Files.walk(p)
      try walk.forEach { f =>
        if (java.nio.file.Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet") &&
            !f.toString.contains("_manifest")) {
          if (f.toString.contains("_graft_dv"))
            dvBytes += java.nio.file.Files.size(f)
          else { bytes += java.nio.file.Files.size(f); files += 1 }
        }
      } finally walk.close()
      (bytes, files, dvBytes)
    }

    def agg(t: GraftTable): Long =
      t.read().agg(sum(length(col("text")))).head().getLong(0)

    def run(kind: String): (Double, Long, Long, Long, Long, Double, Double) = {
      var best: (Double, Long, Long, Long, Long, Double, Double) = null
      (1 to reps).foreach { _ =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_dv_$kind").toString
        val t = GraftTable.create(s, dir, docs)
        val snapFiles = t.manifest(0).count()
        val r0 = System.nanoTime(); agg(t)
        val readBefore = (System.nanoTime() - r0) / 1e9
        val t0 = System.nanoTime()
        kind match {
          case "scoped" => t.delete(cond)
          case "dv"     => t.deleteVectored(cond)
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val (bytes, files, dvBytes) =
          dirCost(java.nio.file.Paths.get(dir, "v1"))
        val r1 = System.nanoTime(); agg(t)
        val readAfter = (System.nanoTime() - r1) / 1e9
        graft.operators.Lake.deleteTree(java.nio.file.Paths.get(dir))
        if (best == null || wall < best._1)
          best = (wall, bytes, files, dvBytes, snapFiles,
            readBefore, readAfter)
      }
      best
    }

    val results = Seq("scoped", "dv").map { kind =>
      val (wall, bytes, files, dvBytes, snapFiles, rb, ra) = run(kind)
      f""""$kind":{"delete_wall_sec":$wall%.3f,"v1_data_bytes":$bytes,""" +
        f""""v1_data_files":$files,"dv_bytes":$dvBytes,""" +
        f""""snapshot_files":$snapFiles,"read_before_sec":$rb%.3f,""" +
        f""""read_after_sec":$ra%.3f}"""
    }
    val json =
      s"""{"probe":"dv_delete","sf_dir":"$sfDir","matches":$matches,""" +
        s""""reps":$reps,${results.mkString(",")}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench/BENCH_dv_$tag.json"), json)
    s.stop()
  }
}
