package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.{AnnIndexLake, Tables}

/** Measures the train-once/probe-many split's actual payoff at a given
  * SF: one-time index build (train + write) vs the per-job probe cost
  * when the model is read from the lake, vs the retrain-every-run cost
  * the gate entries pay. Prints one JSON line and writes
  * `bench/BENCH_ann_lake_<tag>.json`.
  *
  * Usage: runMain graft.tools.AnnLakeProbe <sfDir> <tag>
  */
object AnnLakeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "last"
    val s = GraftSession.getOrCreate()
    val emb = Tables.embeddings(s, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_lake").toString

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // e08: one-time build vs lake-probe dedup vs retrain-every-run dedup
    val e08Build = time { AnnIndexLake.writeE08Index(s, emb, s"$dir/e08") }
    val e08Probe = time { run(AnnIndexLake.e08DedupFromIndex(s, s"$dir/e08", emb)) }
    val e08Retrain = time { run(Similarity.e08BodyFrom(s, emb)) }

    // e03: one-time build vs lake-probe search vs retrain-every-run search
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val e03Build = time { AnnIndexLake.writeE03Index(s, emb, s"$dir/e03") }
    val e03Probe = time { run(
      AnnIndexLake.e03SearchFromIndex(s, s"$dir/e03", emb, queries)) }
    val e03Retrain = time {
      val centroids = graft.Caching.persistTracked("e03_probe_centroids",
        Similarity.e03TrainCentroids(s, emb))
      run(Similarity.e03Search(s, Similarity.e03Postings(emb, centroids),
        centroids, queries))
    }

    val json =
      f"""{"sf":"$sfDir","e08_build_sec":$e08Build%.3f,"e08_lake_probe_sec":$e08Probe%.3f,"e08_retrain_sec":$e08Retrain%.3f,"e03_build_sec":$e03Build%.3f,"e03_lake_probe_sec":$e03Probe%.3f,"e03_retrain_sec":$e03Retrain%.3f}"""
    val f = new java.io.File(s"bench/BENCH_ann_lake_$tag.json")
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.println(json) finally w.close()
    s.stop()
    println(json)
  }
}
