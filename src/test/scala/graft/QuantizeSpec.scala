package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for e07_quantize_int8: per-dim max-abs scales
  * and the floor-based symmetric quantization recomputed with plain
  * Scala doubles, plus the range/zero-dim invariants.
  */
class QuantizeSpec extends AnyFunSuite with SparkFixture {

  test("e07 quantized values equal a plain-Scala fold; int8 range holds") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = vecs.head._2.length
    val mx = Array.tabulate(dim)(i =>
      vecs.map { case (_, v) => math.abs(v(i).toDouble) }.max)
    val expected = vecs.flatMap { case (id, v) =>
      v.indices.map { i =>
        val q = if (mx(i) == 0.0) 0
                else math.floor(v(i).toDouble / mx(i) * 127 + 0.5 + 1e-9).toInt
        (id, i) -> q
      }
    }.toMap

    val got = SparkEntry.queries("e07_quantize_int8")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got.size == expected.size && got.nonEmpty)
    got.foreach { case (k, q) =>
      assert(q >= -127 && q <= 127, s"$k quantized out of int8 range: $q")
      assert(q == expected(k), s"$k: got $q, expected ${expected(k)}")
    }
    // the scale definition means every dim's extreme hits +/-127
    assert((0 until dim).forall(i =>
      got.collect { case ((_, p), q) if p == i => math.abs(q) }.max == 127),
      "some dimension never reaches the int8 extreme — scales are off")
  }

  test("e09: search over the int8 lake keeps recall@10 vs the float baseline") {
    // the claim behind the 4x storage cut: the quantized table carries
    // the SAME search. Asymmetric (float query, dequantized corpus)
    // top-10 per query vs e01's exact float top-10.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).isDirectory)
    def topk(op: String): Map[Long, Set[Long]] =
      SparkEntry.queries(op)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = topk("e01_knn_brute")
    val quant = topk("e09_knn_int8")
    assert(exact.keySet == quant.keySet)
    val recalls = exact.map { case (q, ids) =>
      (quant(q) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(recalls.forall(_ >= 0.8), s"per-query recall@10: $recalls")
    assert(mean >= 0.9, s"mean recall@10 $mean")
  }
}
