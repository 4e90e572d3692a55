package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.sources.{AnnIndexLake, Tables}

/** AnnIndexLake.search — the ONE user-facing entry point over the ANN
  * family (r14 verdict gap #3: every e-tier was gate-shaped, hard-coding
  * `vec_id < NumQueries` as the query set). Two contracts:
  *
  *  1. VERDICT IDENTITY: on the gate's own query set, each tier returns
  *     the gate entry's result exactly — the facade is a re-plumbing,
  *     never a re-implementation.
  *  2. REAL QUERIES: a disjoint hand query set (ids outside the corpus,
  *     vectors the caller brings) flows through every tier — k is
  *     honored, ranks are 1..k, and a query that IS a corpus vector
  *     finds that planted twin at rank 1 in every tier (the identical
  *     vector has identical codes/cells/codes-of-codes, so even the
  *     approximate tiers cannot miss it).
  */
class AnnSearchApiSpec extends AnyFunSuite with SparkFixture {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("every tier reproduces its gate entry on the gate query set") {
    val emb = Tables.embeddings(spark, sfDir)
    val gateQ = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // "exact" maps to e01 too: the cascade's contract is brute force's
    // answer exactly (the no-loss proof), through a different plan
    val gateOf = Map(
      "brute" -> "e01_knn_brute", "exact" -> "e01_knn_brute",
      "lsh" -> "e02_ann_lsh",
      "ivf" -> "e03_ann_ivf", "int8" -> "e09_knn_int8",
      "pq" -> "e11_pq_search", "ivfpq" -> "e12_ivfpq_search")
    assert(gateOf.keySet == AnnIndexLake.SearchTiers.toSet)
    for (tier <- AnnIndexLake.SearchTiers) {
      val api = AnnIndexLake.search(spark, sfDir, gateQ, tier)
      val gate = SparkEntry.queries(gateOf(tier))(spark, sfDir)
      assert(rows(api) == rows(gate),
        s"tier '$tier' diverges from its gate entry ${gateOf(tier)}")
    }
  }

  test("a disjoint hand query set finds its planted corpus twin at rank 1") {
    val emb = Tables.embeddings(spark, sfDir)
    // the caller's own vectors: two corpus embeddings under ids far
    // outside the corpus id space (no self-exclusion applies)
    val hand = emb.filter(col("vec_id").isin(17L, 23L))
      .select((col("vec_id") + lit(1000000L)).as("q_id"),
              col("embedding").as("q_vec"))
    for (tier <- AnnIndexLake.SearchTiers) {
      val res = AnnIndexLake.search(spark, sfDir, hand, tier, k = 3)
        .collect()
      // k honored, both queries answered, ranks dense 1..k
      assert(res.length == 6, s"$tier: expected 2 queries x k=3 rows")
      for (q <- Seq(1000017L, 1000023L)) {
        val mine = res.filter(_.getLong(0) == q).sortBy(_.getInt(1))
        assert(mine.map(_.getInt(1)).toSeq == Seq(1, 2, 3),
          s"$tier: ranks not dense for query $q")
        // sims non-increasing down the ranks
        val sims = mine.map(_.getDouble(3)).toSeq
        assert(sims == sims.sorted.reverse, s"$tier: sims not ranked")
        // the planted twin: rank 1 is (near-)perfect similarity — exact
        // tiers see 1.0, int8 sees the quantized reconstruction's ~1.0
        assert(sims.head >= 0.99,
          s"$tier: query $q missed its planted twin (top sim ${sims.head})")
      }
    }
    // the twin itself surfaces by id on the exact tier
    val brute = AnnIndexLake.search(spark, sfDir, hand, "brute", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(brute(1000017L) == 17L && brute(1000023L) == 23L)

    // an unknown tier fails loudly, naming the menu
    val bad = intercept[IllegalArgumentException](
      AnnIndexLake.search(spark, sfDir, hand, "hnsw"))
    assert(bad.getMessage.contains("ivfpq"))
  }

  test("searchWhere: filtered exact top-k is the filtered brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    // gate queries + disjoint hand ids in one frame: self-exclusion for
    // the former, none for the latter — both must match brute force
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .unionByName(emb.filter(col("vec_id").isin(17L, 23L))
        .select((col("vec_id") + lit(1000000L)).as("q_id"),
                col("embedding").as("q_vec")))
    val predicates = Seq(
      "gate band" -> col("label").between(Similarity.FilterLabelLo,
                                          Similarity.FilterLabelHi),
      "one label" -> (col("label") === 7),
      "id stripe" -> (pmod(col("vec_id"), lit(3L)) === 1),
      // admits fewer than k vectors: per-query results must shrink to
      // the admitted count, never pad or recall-lose
      "tiny" -> (col("label") === 3 && col("vec_id") < lit(40L)))
    for ((name, pred) <- predicates) {
      val api = rows(AnnIndexLake.searchWhere(spark, sfDir, queries, pred))
      val brute = rows(Similarity.knnBruteSearch(spark,
        emb.filter(pred), queries))
      assert(api == brute, s"searchWhere('$name') diverges from the " +
        "filtered brute force")
    }
    // the "tiny" predicate really exercised the under-k path
    val admitted = emb.filter(col("label") === 3 && col("vec_id") < 40L)
      .count()
    assert(admitted > 0 && admitted < Similarity.TopK,
      s"tiny predicate admits $admitted — under-k leg is vacuous")

    // on the gate's query set and predicate, the API reproduces e14
    val gateQ = emb.filter(col("vec_id") < Similarity.RangeQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    assert(rows(AnnIndexLake.searchWhere(spark, sfDir, gateQ,
        col("label").between(Similarity.FilterLabelLo,
                             Similarity.FilterLabelHi))) ==
      rows(SparkEntry.queries("e14_filtered_knn")(spark, sfDir)))
  }

  test("exact tiers scan the persisted sketch; its ReadSchema has no embedding") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = AnnIndexLake.ensureCascadeSketch(spark, sfDir, emb)

    // the artifact physically lacks the embedding column: no scan of it
    // can read one, whatever the plan does
    assert(!AnnIndexLake.readCascadeSketch(spark, dir)
      .columns.contains("embedding"))

    // plan shape, asserted on the uncached artifact-backed kernel: the
    // sketch FileScan's ReadSchema excludes embedding, and the float
    // column enters ONLY through the embeddings-side fetch scan
    val q = emb.filter(col("vec_id").isin(17L, 23L))
      .select((col("vec_id") + lit(1000000L)).as("q_id"),
              col("embedding").as("q_vec"))
    val res = Similarity.cascadeKnnSearch(spark,
      AnnIndexLake.readCascadeSketch(spark, dir)
        .filter(col("label") >= 0),
      Similarity.cascadeQuerySketch(q),
      emb.select("vec_id", "embedding"), k = 3)
    val scans = res.queryExecution.executedPlan.toString.split("\\n")
      .filter(_.contains("FileScan"))
    val sketchScans = scans.filter(_.contains(dir.replace("file:", "")))
    assert(sketchScans.nonEmpty, "the plan never scans the sketch artifact")
    assert(sketchScans.forall(!_.contains("embedding")),
      "a sketch scan reads the embedding column")
    // the answer is still exactly brute force over the filtered corpus
    assert(rows(res) == rows(Similarity.knnBruteSearch(spark,
      emb.select("vec_id", "embedding"), q, k = 3)))
  }
}
