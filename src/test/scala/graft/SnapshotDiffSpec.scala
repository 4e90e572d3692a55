package graft

import org.scalatest.funsuite.AnyFunSuite

/** l04_snapshot_diff — the build-2 derivation and the diff re-derived
  * independently in Scala from the d11 bucket rule: exact added/removed/
  * changed sets, no unchanged rows leaking, and churn ids only ever
  * appear once.
  */
class SnapshotDiffSpec extends AnyFunSuite with SparkFixture {

  /** The d11 md5 bucket (Dedup.splitBucket's arithmetic, re-derived). */
  private def bucket(id: Long): Int =
    (java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % 100L).toInt

  test("diff statuses equal the bucket rule exactly") {
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val removed = ids.filter(bucket(_) < 8).toSet
    val changed = ids.filter(i => { val b = bucket(i); b >= 8 && b < 16 }).toSet
    val added = ids.filter(i => { val b = bucket(i); b >= 16 && b < 24 })
      .map(_ + 1000000000L).toSet

    val got = SparkEntry.queries("l04_snapshot_diff")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2))
    assert(got.map(_._1).distinct.length == got.length,
      "a churn id must appear exactly once in the diff")
    val byStatus = got.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }
    assert(byStatus.getOrElse("removed", Set()) == removed)
    assert(byStatus.getOrElse("changed", Set()) == changed)
    assert(byStatus.getOrElse("added", Set()) == added)
    assert(byStatus.keySet == Set("added", "removed", "changed"),
      s"unexpected statuses: ${byStatus.keySet}")
  }

  test("the diff is one id-keyed join - no cartesian, aggregates combine") {
    val p = SparkEntry.queries("l04_snapshot_diff")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "the diff must be an equality join on doc_id")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no pairwise/cartesian stage belongs in a snapshot diff")
  }
}
