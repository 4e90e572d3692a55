package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** p01_corpus_build — planted-behavior proofs the composed gate hash
  * can't localize: each stage's rule demonstrated on a hand corpus fed
  * through the identical chain (low-quality dropped, exact dup keeps
  * min id, near dup keeps canonical, contaminated train doc dropped,
  * test doc untouched), the pack bookkeeping recomputed independently,
  * and the landed lake's partition pruning (a trainer's split-filtered
  * read prunes directories before IO). Planted families use DISJOINT
  * vocabularies so no family interacts with another through shingles —
  * each stage's verdict is attributable to exactly one rule.
  */
class CorpusBuildSpec extends AnyFunSuite with SparkFixture {

  /** The d11 split bucket (md5 60-bit prefix % 100), driver-side. */
  private def bucket(id: Long): Int =
    (java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % 100L).toInt

  private def split(id: Long): String = {
    val b = bucket(id)
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  private var run = 0

  private def build(rows: Seq[(Long, String, String)]) = {
    run += 1
    val sp = spark
    import sp.implicits._
    val docs = rows.toDF("doc_id", "source", "text")
    Pipeline.p01Build(spark, docs, s"p01spec$run", s"spec-stamp-$run")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("each stage's rule holds on a planted corpus") {
    // one source for everything => the mixture rate is exactly 1 (the
    // most-constrained source is kept whole) and stage 6 is a no-op,
    // so survival assertions are deterministic stage-1..5 logic
    val uniqText = "the red apple orchard grows beside a quiet stream " +
      "where children gather ripe fruit every autumn morning"
    val twinText = "the tall mountain peaks shimmer under fresh winter " +
      "snow while eagles circle high above frozen alpine lakes"
    val nearText = "the ancient mariner sailed across turbulent oceans " +
      "seeking legendary islands filled with exotic spices rare gems " +
      "golden artifacts and mysterious creatures never described in " +
      "any navigation charts kept by cautious merchants"
    // contamination plant: the train doc COPIES a 12-word segment of
    // the test doc — containment overlap >= 0.2 (decontam fires) while
    // Jaccard stays < 0.3 (near-dup verify must NOT merge them)
    val segment = "the secret formula requires seven measures of " +
      "powdered moonstone dissolved slowly"
    val trainText = "the village alchemist recorded that " + segment +
      " into boiling silver water under a waning moon last winter"
    val testText = segment + " then strained through woven linen before " +
      "sunrise according to tradition"

    val trainId = (1L to 500L).find(split(_) == "train").get
    val testId = (1L to 500L).find(split(_) == "test").get
    val otherIds = (1L to 500L).iterator
      .filter(i => i != trainId && i != testId).take(5).toSeq
    val Seq(uniq, dupA, dupB, nearA, nearB) = otherIds.sorted

    val out = build(Seq(
      (uniq, "src0", uniqText),
      (dupA, "src0", twinText),
      (dupB, "src0", twinText), // exact dup of dupA
      (nearA, "src0", nearText),
      (nearB, "src0", nearText.replace("spices", "peppers")), // near dup
      (999999L, "src0", "too few words"), // fails the quality gate
      (trainId, "src0", trainText),
      (testId, "src0", testText)))

    assert(!out.contains(999999L), "low-quality doc must be dropped")
    assert(out.contains(math.min(dupA, dupB)) &&
           !out.contains(math.max(dupA, dupB)),
      s"exact-dup group must keep exactly its min id " +
        s"(kept ${out.keySet.toSeq.sorted})")
    assert(out.contains(math.min(nearA, nearB)) &&
           !out.contains(math.max(nearA, nearB)),
      s"near-dup cluster must keep exactly its canonical " +
        s"(kept ${out.keySet.toSeq.sorted})")
    assert(!out.contains(trainId),
      "train doc containing the test doc's segment must be decontaminated")
    assert(out.contains(testId), "the test doc itself must survive")
    assert(out.contains(uniq))
    out.values.foreach(r =>
      assert(r.getString(2) == split(r.getLong(0)), "split rule drifted"))
  }

  test("pack bookkeeping is a per-shard cumulative layout") {
    // quality-passing filler with per-doc DISJOINT vocabulary (a shared
    // template would make every doc a near-dup/decontam hit of every
    // other and collapse the corpus before packing)
    val rows = (1L to 40L).map(i => (i, "src0",
      "the " + ('a' to 'l').map(c => s"w$i$c$c").mkString(" ")))
    val out = build(rows).values.toSeq
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    out.groupBy(_._3).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, nTok, _, binId, binOff) =>
        assert(binId == cum / 256 && binOff == cum % 256,
          s"doc $id placed at ($binId,$binOff), expected offset $cum")
        cum += nTok
      }
    }
  }

  test("the landed corpus lake prunes a trainer's split-filtered read") {
    assume(new java.io.File(sfDir).isDirectory)
    // the real gate entry lands graft_p01_corpus for sfDir
    val gate = SparkEntry.queries("p01_corpus_build")(spark, sfDir)
    assert(gate.count() > 0, "gate entry produced an empty corpus")
    val read = spark.table("graft_p01_corpus")
      .filter(col("split") === "train")
      .select("doc_id", "n_tokens", "shard")
    read.write.format("noop").mode("overwrite").save()
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("split"),
      s"split filter did not reach the directory layer:\n$plan")
    // (the doc_id bucket layout's zero-exchange JOIN property for this
    // writer is proven in CorpusLakeSpec; a bare scan rightly disables
    // the bucketed read when no exchange would be saved)
  }
}
