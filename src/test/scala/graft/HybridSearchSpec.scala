package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** e15 hybrid retrieval — the fusion-contract pieces the gate hash
  * can't carry: per-query shape, RRF bounds (a score can only come
  * from rank arithmetic over the two legs), monotone fused order, and
  * query-by-example hygiene (a query never retrieves itself).
  */
class HybridSearchSpec extends AnyFunSuite with SparkFixture {

  test("fusion shape, RRF bounds, monotone order, no self-retrieval") {
    val rows = Similarity.hybridSearch(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until Similarity.HybridQueries).toSet)
    val maxRrf = 2.0 / (Similarity.RrfK + 1) + 1e-9
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to Similarity.TopK),
        s"query $q: ranks not contiguous")
      assert(rs.forall(_.getLong(2) != q), s"query $q retrieved itself")
      val rrfs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(rrfs.forall(v => v > 0.0 && v <= maxRrf),
        s"query $q: rrf outside rank-arithmetic bounds: ${rrfs.toSeq}")
      assert(rrfs.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
        s"query $q: fused order not monotone")
      val ids = rs.map(_.getLong(2))
      assert(ids.distinct.length == ids.length,
        s"query $q: duplicate neighbors")
    }
  }
}
