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

  test("e04_large level-2 ladder: 1 below the cap, density bounded above") {
    import graft.operators.Similarity.{semCells2, MaxSemCells, TargetCell, SemLevel2At}
    assert(semCells2(1) == 1)
    assert(semCells2(SemLevel2At) == 1, "level 2 must stay out below the cap")
    assert(semCells2(SemLevel2At + 1) == 2)
    var n = SemLevel2At + 1
    while (n <= SemLevel2At * MaxSemCells) {
      val c2 = semCells2(n)
      val compositeDensity = n.toDouble / (MaxSemCells.toLong * c2)
      assert(compositeDensity <= TargetCell,
        s"composite density $compositeDensity at n=$n")
      assert(c2 == 1 || n > SemLevel2At * (c2 / 2), s"over-split to $c2 at n=$n")
      n = n * 3 / 2 + 1
    }
    assert(semCells2(Long.MaxValue) == MaxSemCells, "level-2 cap must hold")
  }

  test("cap warning fires exactly past the ladder's density capacity") {
    import graft.operators.Similarity.{capWarning, SemLevel2At, MaxSemCells}
    assert(capWarning("e04_semantic_dedup", SemLevel2At, SemLevel2At, "x").isEmpty)
    val msg = capWarning("e04_semantic_dedup", SemLevel2At + 1, SemLevel2At, "use Y")
    assert(msg.exists(m => m.contains("e04_semantic_dedup") &&
      m.contains((SemLevel2At + 1).toString) && m.contains("use Y")))
    val cap2 = SemLevel2At * MaxSemCells
    assert(capWarning("e04_semantic_dedup_large", cap2, cap2, "x").isEmpty)
    assert(capWarning("e04_semantic_dedup_large", cap2 + 1, cap2, "x").isDefined)
  }

  test("e04_large equals e04 below the cap (cell2 pinned to 0)") {
    val small = SparkEntry.queries("e04_semantic_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val large = SparkEntry.queries("e04_semantic_dedup_large")(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    assert(large.keySet == small.keySet,
      s"survivor sets diverge: extra=${(large.keySet -- small.keySet).take(3)} " +
        s"missing=${(small.keySet -- large.keySet).take(3)}")
    large.foreach { case (id, (c1, c2)) =>
      assert(c2 == 0, s"vec $id in level-2 cell $c2 below the cap")
      assert(c1 == small(id), s"vec $id level-1 cell $c1 != e04's ${small(id)}")
    }
  }

  test("e04_large composite path (forced) = all-pairs within composite cells") {
    import graft.operators.Similarity
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val n = vecs.length.toLong
    // force level 2 on the gate corpus: a base small enough that the
    // ladder picks >1 second-level cells
    val base = n / 4
    val nc2 = Similarity.semCells2(n, base)
    assert(nc2 > 1, s"forcing failed: nc2=$nc2 at base=$base, n=$n")

    val a1 = graft.expressions.LshKernels
      .planes(Similarity.semCells(n)).map(_.map(_.toFloat))
    val a2 = Similarity.planes2.take(nc2).map(_.map(_.toFloat))
    def assign(v: Array[Float], anchors: Array[Array[Float]]): Int =
      anchors.zipWithIndex
        .map { case (a, c) => (r6(cos(v, a)), c) }
        .minBy { case (s, c) => (-s, c) }._2
    val cellOf = vecs.map { case (id, v) =>
      id -> ((assign(v, a1), assign(v, a2)))
    }.toMap
    val removed = (for {
      (b, vb) <- vecs
      (a, va) <- vecs
      if a < b && cellOf(a) == cellOf(b) && r6(cos(va, vb)) >= Tau
    } yield b).toSet

    val got = Similarity.e04LargeBody(spark, sfDir, level2Base = base)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    assert(got.keySet == vecs.map(_._1).toSet -- removed,
      s"survivor set diverges: extra=${(got.keySet -- (vecs.map(_._1).toSet -- removed)).take(3)} " +
        s"missing=${((vecs.map(_._1).toSet -- removed) -- got.keySet).take(3)}")
    got.foreach { case (id, cc) =>
      assert(cc == cellOf(id), s"vec $id assigned $cc, expected ${cellOf(id)}")
    }
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
