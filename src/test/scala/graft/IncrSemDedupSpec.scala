package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.{AnnIndexLake, Tables}

/** e10_incremental_semdedup's quantitative gate (rows-only by design —
  * the trained quantizer has no SQL twin):
  *
  *  - every arriving vector gets exactly one verdict row;
  *  - a PLANTED exact copy of an index vector can never escape:
  *    identical embeddings share the composite cell whatever training
  *    did (same argument as e08's planted-dup proof), cosine is 1.0,
  *    so the verdict must be near_dup at sim 1.0;
  *  - lake parity: verdicts are IDENTICAL when the model and index
  *    assignment are read back from AnnIndexLake instead of held
  *    in memory — the train-once/probe-many contract for the
  *    incremental mode.
  */
class IncrSemDedupSpec extends AnyFunSuite with SparkFixture {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getString(1),
     if (r.isNullAt(2)) -1L else r.getLong(2),
     if (r.isNullAt(3)) -1.0 else r.getDouble(3))

  test("every arriving vector verdicts exactly once; both verdicts occur") {
    val out = SparkEntry.queries("e10_incremental_semdedup")(spark, sfDir)
      .collect().map(key)
    val emb = Tables.embeddings(spark, sfDir)
    val nArriving = emb.filter(Dedup.splitOf(
        Dedup.splitBucket(col("vec_id"))) === "test").count()
    assert(out.length == nArriving, "verdict cardinality diverged")
    assert(out.map(_._1).distinct.length == out.length, "duplicate verdicts")
    val verdicts = out.map(_._2).toSet
    assert(verdicts.contains("new"), "no new verdicts — degenerate corpus?")
    // near_dup presence is corpus-dependent at tiny SF; the planted-dup
    // test below proves the path deterministically
  }

  test("a planted exact copy of an index vector is always caught at sim 1.0") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val split = Dedup.splitOf(Dedup.splitBucket(col("vec_id")))
    val index = emb.filter(split =!= "test")
    // clone the lowest index vector under a fresh arriving id
    val src = index.orderBy("vec_id").limit(1).collect()(0)
    val srcId = src.getLong(0)
    val planted = index.filter(col("vec_id") === srcId)
      .select(lit(9000000L).as("vec_id"), col("embedding"))
    val arriving = emb.filter(split === "test").union(planted)
    val m = Similarity.e08TrainModel(spark, index)
    val idx = graft.Caching.persistTracked("e10_spec_idx",
      Similarity.e10IndexAssigned(spark, m, index))
    val verdicts = Similarity.e10VerdictsWith(spark, m, idx, arriving)
      .collect().map(key).toSeq
    val plantedRow = Similarity.e10VerdictsWith(spark, m, idx, planted)
      .collect().map(key).head
    assert(plantedRow._2 == "near_dup",
      s"planted dup escaped: $plantedRow")
    assert(plantedRow._4 == 1.0, s"planted dup sim not 1.0: $plantedRow")
    assert(verdicts.nonEmpty)
  }

  test("verdicts from the persisted lake index equal in-memory verdicts") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val split = Dedup.splitOf(Dedup.splitBucket(col("vec_id")))
    val index = emb.filter(split =!= "test")
    val arriving = emb.filter(split === "test")
    val dir = java.nio.file.Files.createTempDirectory("graft_e10").toString
    val written = AnnIndexLake.writeE08Index(spark, index, dir)
    val inMem = Similarity.e10VerdictsWith(spark, written,
        Similarity.e10IndexAssigned(spark, written, index), arriving)
      .collect().map(key).toSeq
    // lake path: model AND index assignment read back from parquet —
    // the posting table joined to its embeddings, zero training
    val m = AnnIndexLake.readE08Model(spark, dir)
    val idxFromLake = AnnIndexLake.readE08Assignments(spark, dir)
      .join(index, "vec_id")
      .select(col("cell"), col("cell2"),
              col("vec_id").as("i_id"), col("embedding").as("i_vec"))
    val fromLake = Similarity.e10VerdictsWith(spark, m, idxFromLake, arriving)
      .collect().map(key).toSeq
    assert(fromLake == inMem, "lake verdicts diverged from in-memory verdicts")
    assert(fromLake.nonEmpty)
  }
}
