package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** e08_semantic_dedup_trained's quantitative gate (the operator is
  * rows-only by design — Lloyd means are distributed float averages, so
  * cell ids aren't bit-reproducible SQL; these floors are the oracle):
  *
  *  - survivor-set parity with e04_large at gate scale: both operators
  *    apply the same drop rule (lower-id in-cell near-dup, rounded
  *    cosine >= 0.35) under different quantizers, so their survivor
  *    sets must largely agree (measured Jaccard 0.877 at sf0.01;
  *    floored at 0.8 to absorb float-avg nondeterminism in training);
  *  - in-cell density: the whole point of the trained budget ladder —
  *    mean composite-cell density <= TargetCell, and the trained
  *    codebook actually USES its cells (a degenerate quantizer that
  *    parks everything in one cell would pass a mean-only check
  *    computed over active cells... so active-cell count is floored
  *    too);
  *  - a planted duplicate vector can NEVER escape: identical embeddings
  *    get identical level-1 cells, identical residuals, identical
  *    level-2 cells — so exact dups always share a composite cell and
  *    the higher id is always dropped, whatever training did.
  */
class TrainedSemDedupSpec extends AnyFunSuite with SparkFixture {

  private val GateDir = "/root/testdata/sf0.01"

  test("e08 budget ladder: density-bounded, near-square levels, no cap") {
    import graft.operators.Similarity.{e08CellBudget, e08Levels, MinSemCells, TargetCell}
    assert(e08CellBudget(1) == MinSemCells)
    var n = 1L
    while (n < (1L << 40)) {
      val budget = e08CellBudget(n)
      assert(n <= budget * TargetCell, s"density unbounded at n=$n")
      // never over-split: half the budget would already exceed density
      assert(budget == MinSemCells || n > (budget / 2) * TargetCell,
        s"over-split to $budget at n=$n")
      val (k1, k2) = e08Levels(budget)
      assert(k1.toLong * k2 == budget, s"levels don't tile the budget at n=$n")
      assert(k1 >= k2 && k1 <= 2L * k2, s"levels not near-square at n=$n")
      n = n * 7 / 2 + 1
    }
    // the ladder-free claim: the budget keeps growing where the static
    // families capped (e04 at 256 cells, e04_large at 65536)
    assert(e08CellBudget(1L << 30) == (1L << 30) / TargetCell)
  }

  test("e08 survivors agree with e04_large's at gate scale (Jaccard >= 0.8)") {
    val s08 = graft.operators.Similarity
      .e08BodyFrom(spark, graft.sources.Tables.embeddings(spark, GateDir))
      .collect().map(_.getLong(0)).toSet
    val sL = graft.operators.Similarity.e04LargeBody(spark, GateDir)
      .collect().map(_.getLong(0)).toSet
    val jacc = (s08 & sL).size.toDouble / (s08 | sL).size
    assert(jacc >= 0.8, s"survivor parity $jacc (e08=${s08.size}, e04L=${sL.size})")
    // and e08 actually deduplicates — it is not vacuously keeping all
    val n = spark.read.parquet(s"$GateDir/embeddings.parquet").count()
    assert(s08.size < n, "e08 dropped nothing")
  }

  test("e08 trained cells: mean density <= TargetCell, codebook used") {
    import graft.operators.Similarity.{e08CellBudget, TargetCell}
    val emb = graft.sources.Tables.embeddings(spark, GateDir)
    val n = emb.count()
    val cells = graft.operators.Similarity.e08Assigned(spark, emb)
      .groupBy("cell", "cell2").count()
      .agg(count(lit(1)).as("active"), max("count").as("mx")).collect()(0)
    val active = cells.getLong(0)
    val budget = e08CellBudget(n)
    assert(active >= budget / 2, s"only $active of $budget cells active")
    assert(n.toDouble / active <= TargetCell,
      s"mean density ${n.toDouble / active} over $active cells")
    // trained balance: no cell collapses the pair stage to density^2
    // over a large fraction of the corpus (measured max 37 at sf0.01)
    assert(cells.getLong(1) <= 4 * TargetCell,
      s"hottest cell holds ${cells.getLong(1)}")
  }

  test("e08 always drops a planted duplicate vector") {
    val emb = graft.sources.Tables.embeddings(spark, GateDir)
    val maxId = emb.agg(max("vec_id")).collect()(0).getLong(0)
    val clone = emb.filter(col("vec_id") === 0L)
      .select((col("vec_id") + lit(maxId + 1)).as("vec_id"), col("embedding"))
    val survivors = graft.operators.Similarity
      .e08BodyFrom(spark, emb.select("vec_id", "embedding").union(clone))
      .collect().map(_.getLong(0)).toSet
    assert(!survivors.contains(maxId + 1),
      "an exact duplicate (same cells by construction) escaped the drop rule")
    assert(survivors.contains(0L), "the lower-id original must be the keeper")
  }
}
