package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** q42's executable 100-TB form: profileDf(approx = true) must keep the
  * exact variant's plan shape minus the distinct Expand, and its HLL
  * n_distinct must stay within the configured rsd of the exact counts
  * (q30's error-bounding discipline applied to the profiler).
  */
class ProfileApproxSpec extends AnyFunSuite with SparkFixture {

  private lazy val exact =
    Relational.profileDf(spark, sfDir, approx = false)
  private lazy val approx =
    Relational.profileDf(spark, sfDir, approx = true)

  test("approx profile erases the Expand; exact profile carries it") {
    val pe = exact.queryExecution.executedPlan.toString
    val pa = approx.queryExecution.executedPlan.toString
    assert(pe.contains("Expand"),
      "exact per-column DISTINCT must ride the shared Expand (the shape the swap removes)")
    assert(!pa.contains("Expand"),
      "approx profile must not Expand — HLL sketches are plain combinable aggregates")
    // everything else is the same single-scan shape: one parquet scan,
    // a partial/final aggregate pair, no shuffle beyond the aggregation
    Seq(pe, pa).foreach { p =>
      assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        "the profiler is one scan + one aggregate; no join belongs here")
    }
    assert(pa.contains("partial_"), "sketch aggregates must combine map-side")
  }

  test("approx n_distinct is within HLL error of exact; all other fields identical") {
    val e = exact.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val a = approx.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(e.keySet == a.keySet && e.size == 4)
    e.foreach { case (c, (n, nn, nd, mn, mx, mean)) =>
      val (an, ann, and, amn, amx, amean) = a(c)
      assert((n, nn, mn, mx, mean) == ((an, ann, amn, amx, amean)),
        s"$c: non-distinct profile fields must be bit-identical across variants")
      // 2.3% rsd: allow 5 sigma plus slack for tiny exact counts — the
      // q30 bound shape (relative error, floored absolutely for small n)
      val tol = math.max(0.115 * nd, 3.0)
      assert(math.abs(and - nd) <= tol,
        s"$c: approx distinct $and vs exact $nd exceeds ${tol.round} tolerance")
    }
  }
}
