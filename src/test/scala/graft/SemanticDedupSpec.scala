package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for e04_semantic_dedup: anchor assignment
  * (nearest of the density-laddered active anchor prefix by
  * epsilon-rounded cosine, ties to the lower cell) and the
  * keep-lowest-id-per-near-dup rule, recomputed with a plain double
  * fold in VecMath's index order. Plus the ladder algebra itself:
  * density stays bounded by TargetCell until the MaxSemCells cap.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkFixture {

  private val Tau = 0.35

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

  test("e04 cell ladder keeps mean density <= TargetCell until the cap") {
    import graft.operators.Similarity.{semCells, MinSemCells, MaxSemCells, TargetCell}
    assert(semCells(1) == MinSemCells)
    assert(semCells(MinSemCells * TargetCell) == MinSemCells)
    assert(semCells(MinSemCells * TargetCell + 1) == MinSemCells * 2)
    var n = 1L
    while (n <= MaxSemCells * TargetCell) {
      val c = semCells(n)
      assert(n.toDouble / c <= TargetCell, s"density ${n.toDouble / c} at n=$n")
      // never over-split: half the cells would already hold the density
      assert(c == MinSemCells || n > (c / 2) * TargetCell, s"over-split to $c at n=$n")
      n = n * 3 / 2 + 1
    }
    assert(semCells(Long.MaxValue) == MaxSemCells, "cap must hold")
  }

  test("e06 clusters equal union-find over d09's verified pairs") {
    val pairs = SparkEntry.queries("d09_embed_dup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no near-dup pair at this sf; cluster spec is vacuous")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val bySize = members.groupBy(find).view.mapValues(_.length.toLong).toMap
    val expected = members.map(m => m -> ((find(m), bySize(find(m))))).toMap

    val got = SparkEntry.queries("e06_embed_clusters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected,
      s"clusters diverge: extra=${(got.keySet -- expected.keySet).take(3)} " +
        s"missing=${(expected.keySet -- got.keySet).take(3)}")
  }

  test("e04 survivors = corpus minus lower-id in-cell near-dups") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val anchors = graft.expressions.LshKernels
      .planes(graft.operators.Similarity.semCells(vecs.length.toLong))
      .map(_.map(_.toFloat))
    val cell = vecs.map { case (id, v) =>
      id -> anchors.zipWithIndex
        .map { case (a, c) => (r6(cos(v, a)), c) }
        .minBy { case (s, c) => (-s, c) }._2
    }.toMap
    val byId = vecs.toMap
    val removed = (for {
      (b, vb) <- vecs
      (a, va) <- vecs
      if a < b && cell(a) == cell(b) && r6(cos(va, vb)) >= Tau
    } yield b).toSet
    assert(removed.nonEmpty, "no in-cell near-dup at tau; spec is vacuous")

    val got = SparkEntry.queries("e04_semantic_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got.keySet == byId.keySet -- removed,
      s"survivor set diverges: extra=${(got.keySet -- (byId.keySet -- removed)).take(3)} " +
        s"missing=${((byId.keySet -- removed) -- got.keySet).take(3)}")
    got.foreach { case (id, c) =>
      assert(c == cell(id), s"vec $id assigned to cell $c, expected ${cell(id)}")
    }
  }
}
