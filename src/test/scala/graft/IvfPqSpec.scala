package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** e12_ivfpq_search — recall vs exact brute force, the structural
  * guarantee (every emitted neighbor lies in one of its query's probed
  * coarse cells — the pruning is real, not decorative), and train-once
  * reuse of BOTH persisted index artifacts.
  */
class IvfPqSpec extends AnyFunSuite with SparkFixture {

  private def topByQuery(name: String): Map[Long, Seq[Long]] =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._2).map(_._3).toSeq }

  test("IVFPQ recall@10 vs exact e01") {
    val exact = topByQuery("e01_knn_brute")
    val got = topByQuery("e12_ivfpq_search")
    val recalls = exact.map { case (q, truth) =>
      val r = (truth.toSet & got(q).toSet).size.toDouble / truth.size
      info(f"q$q recall@10 = $r%.2f")
      r
    }.toSeq
    val mean = recalls.sum / recalls.size
    info(f"mean recall@10 = $mean%.2f (probe ${Similarity.NProbe}/" +
      f"${Similarity.NumCells} cells, 16-byte codes, exact re-rank)")
    // the compounding of e03's probe miss (floor 0.85 mean / 0.7 worst)
    // and e11's code coarseness (floor 0.75/0.5) on the near-uniform
    // adversarial corpus; real clustered corpora sit higher
    assert(mean >= 0.7, f"mean IVFPQ recall $mean%.2f below floor 0.70")
    recalls.foreach(r => assert(r >= 0.4, f"a query fell to recall $r%.2f"))
  }

  test("every emitted neighbor lies in one of its query's probed cells") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val e03Dir = graft.sources.AnnIndexLake.ensureE03Index(spark, sfDir, emb)
    val postings = spark.read.parquet(s"$e03Dir/postings")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (v, rs) => v -> rs.map(_._2).toSet }
    val centroids = spark.read.parquet(s"$e03Dir/centroids")
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // re-derive the probe list with the operator's own assignment
    val probes = Similarity.e03ProbeCells(queries, centroids)
      .select("q_id", "cell")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    SparkEntry.queries("e12_ivfpq_search")(spark, sfDir).collect()
      .foreach { r =>
        val (q, n) = (r.getLong(0), r.getLong(2))
        assert(postings(n).intersect(probes(q)).nonEmpty,
          s"neighbor $n of q$q is not posted in any probed cell " +
            s"(probed ${probes(q)}, posted ${postings(n)})")
      }
  }

  test("reuse runs zero Lloyd jobs (both artifacts current)") {
    SparkEntry.queries("e12_ivfpq_search")(spark, sfDir).count()
    val before = Similarity.lloydRuns.get()
    SparkEntry.queries("e12_ivfpq_search")(spark, sfDir).count()
    assert(Similarity.lloydRuns.get() == before,
      "a second IVFPQ search retrained an index stage")
  }
}
