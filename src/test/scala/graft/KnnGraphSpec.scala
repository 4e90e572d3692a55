package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Independent ground truth for e05_knn_graph: band codes, candidate
  * union, cosine, and per-vector top-3 recomputed with plain loops (the
  * double fold in VecMath's index order), plus the graph-shape claims.
  */
class KnnGraphSpec extends AnyFunSuite with SparkFixture {

  private def r6(x: Double): Double =
    BigDecimal(x + 1e-10).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def signCode(planes: Array[Array[Double]], v: Array[Float]): Long =
    planes.zipWithIndex.foldLeft(0L) { case (acc, (p, j)) =>
      var dot = 0.0; var i = 0
      while (i < v.length) { dot += p(i) * v(i).toDouble; i += 1 }
      if (dot > 0) acc | (1L << j) else acc
    }

  test("e05 edges = banded candidates ranked by cosine, top-3 per vector") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bits = Similarity.bandBits(vecs.length.toLong)
    val mask = (1L << bits) - 1
    val bandCodes = (0 until Similarity.NumDupBands).map { t =>
      val planes = Similarity.bandPlanes(t)
      vecs.map { case (id, v) => id -> (signCode(planes, v) & mask) }.toMap
    }
    def collide(a: Long, b: Long): Boolean =
      bandCodes.exists(c => c(a) == c(b))
    val byId = vecs.toMap
    val expected = vecs.map { case (id, v) =>
      id -> vecs.collect { case (n, nv) if n != id && collide(id, n) =>
        (r6(cos(v, nv)), n)
      }.sortBy { case (s, n) => (-s, n) }.take(3)
    }.toMap
    assert(expected.values.exists(_.nonEmpty), "no candidate pair; vacuous")

    val got = SparkEntry.queries("e05_knn_graph")(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    // every vector with >= 1 candidate appears, ranked exactly
    expected.foreach { case (id, exp) =>
      val rows = got.getOrElse(id, Array.empty).sortBy(_.getInt(1))
      assert(rows.length == exp.length, s"vec $id: ${rows.length} != ${exp.length} edges")
      rows.zip(exp).foreach { case (r, (s, n)) =>
        assert(r.getLong(2) == n && r.getDouble(3) == s,
          s"vec $id rk ${r.getInt(1)}: (${r.getLong(2)},${r.getDouble(3)}) != ($n,$s)")
      }
    }
    assert(got.keySet.subsetOf(byId.keySet))
  }
}
