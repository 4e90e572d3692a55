package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** l06_cdc_apply — the MERGE invariants, plus the cross-operator
  * identity with l04: diffing (v1, apply(v1, changelog)) must yield
  * exactly the changelog's churn. Deletes vanish, updates change
  * fingerprints in place, inserts appear under new ids, untouched rows
  * survive byte-identically — and the merge kernel's plan broadcasts
  * the changelog keys so the snapshot side never shuffles.
  */
class CdcApplySpec extends AnyFunSuite with SparkFixture {

  private def bucket(id: Long): Int =
    (java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % 100L).toInt

  test("apply(v1, log) contains exactly the churn l04 predicts") {
    val v2 = SparkEntry.queries("l06_cdc_apply")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val v1 = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
              md5(col("text").cast("binary")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val removed = v1.keySet.filter(bucket(_) < 8)
    val changed = v1.keySet.filter(i => { val b = bucket(i); b >= 8 && b < 16 })
    val added = v1.keySet.filter(i => { val b = bucket(i); b >= 16 && b < 24 })
      .map(_ + 1000000000L)
    val untouched = v1.keySet.filter(bucket(_) >= 16)

    assert(v2.keySet == (v1.keySet -- removed -- changed) ++ changed ++ added,
      "v2's id set must be v1 minus deletes, updates kept, inserts added")
    assert(removed.forall(!v2.contains(_)), "deleted ids must vanish")
    assert(changed.forall(i => v2(i) != v1(i)),
      "updated rows must change fingerprint in place")
    assert(untouched.forall(i => v2(i) == v1(i)),
      "rows the changelog never names must survive byte-identically")
    assert(added.forall(v2.contains), "inserted ids must appear")
  }

  test("the merge kernel broadcasts changelog keys; snapshot never shuffles") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val log = docs.limit(10)
      .select(lit("U").as("op"), col("doc_id"), col("source"), col("text"))
    val p = graft.operators.Lake.cdcMerge(docs, log)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"the supersede step must be a broadcast anti join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Exchange hashpartitioning"),
      s"the snapshot side of a CDC merge must not shuffle:\n$p")
  }
}
