package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape checks — the properties that make these plans hold
  * at 100 TB (broadcasts, scan pushdown, partial aggregation) are asserted
  * so a regression shows up as a test failure, not a slow cluster.
  */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q03 fact-dim join broadcasts the dimension (no lineitem shuffle)") {
    assert(planOf("q03_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("q04 five-way join broadcasts every dimension") {
    val p = planOf("q04_multi_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q02 filters reach the parquet scan") {
    val f = formatted("q02_filter_scan")
    assert(f.contains("PushedFilters"))
    assert(f.contains("l_quantity") && f.contains("LessThan"),
      "quantity filter not pushed to scan")
  }

  test("q01 scan is pruned to the referenced columns only") {
    val f = formatted("q01_pricelist")
    val readSchema = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_partkey"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"scan reads unused columns: $readSchema")
  }

  test("q01 aggregation is partial (map-side combine before the shuffle)") {
    val p = planOf("q01_pricelist")
    assert(p.contains("partial_"), "no partial aggregation in plan")
  }

  test("q02 single-row agg stays inside whole-stage codegen") {
    // AQE only materializes codegen stages at execution: run, then inspect
    // the finalized adaptive plan.
    val df = SparkEntry.queries("q02_filter_scan")(spark, sfDir)
    df.collect()
    val cg = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(!cg.contains("Found 0 WholeStageCodegen"), cg.linesIterator.next())
  }

  test("d03 signature is computed in-scan by the native kernel (no signature shuffle)") {
    val p = planOf("d03_simhash")
    assert(p.contains("simhash60_md5"), "native simhash60_md5 kernel not in the plan")
    assert(!p.contains("partial_sum"),
      "signature still built by bit-sum aggregates instead of the kernel")
  }

  test("d12 vocab aggregation is partial and prunes the documents scan") {
    val p = planOf("d12_vocab")
    assert(p.contains("partial_"), "vocab counts not map-side combined")
    assert(!p.contains("Window"), "vocab must not rank with a window")
    val f = formatted("d12_vocab")
    val readSchema = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("source") && !readSchema.contains("n_chars"),
      s"vocab scan reads unused columns: $readSchema")
  }

  test("q18 share-of-total has no low-cardinality window exchange") {
    val p = planOf("q18_owner_share")
    assert(!p.contains("Window"),
      "q18 still windows over n_name (25 partitions caps cluster parallelism)")
    assert(p.contains("BroadcastHashJoin"), "nation totals not broadcast back")
  }

  test("e01 broadcasts the query set, not the corpus") {
    val p = planOf("e01_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("e01 top-k selection is a partial (map-side) custom aggregate") {
    val p = planOf("e01_knn_brute")
    assert(p.contains("partial_topk_by"),
      s"TopKBy not map-side combined:\n$p")
  }
}
