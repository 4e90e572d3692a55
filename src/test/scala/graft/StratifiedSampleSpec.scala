package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d39_stratified_sample — exact per-source quotas without a window:
  * the plan carries NO Window node (per-group top-k is the combinable
  * TopKBy aggregate), quotas are exact (min(k, |source|)), and the
  * draw matches a driver-side re-derivation of the md5 order.
  */
class StratifiedSampleSpec extends AnyFunSuite with SparkFixture {

  test("no window; exact quotas; md5-order draw") {
    val df = SparkEntry.queries("d39_stratified_sample")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "per-group top-k must not plan a Window (low-cardinality sort)")

    val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
    val bySource = got.groupBy(_._1)
    val counts = graft.sources.Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (src, n) =>
      assert(bySource.get(src).map(_.length).getOrElse(0) ==
               math.min(20L, n).toInt,
        s"source $src quota wrong (have ${bySource.get(src).map(_.length)})")
    }

    // re-derive one source's draw driver-side from the same md5 order
    def bucket50(id: Long): Long =
      (java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)) >> 10
    val src = counts.keys.min
    val expect = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("source") === src).select("doc_id").collect()
      .map(_.getLong(0)).sortBy(i => (bucket50(i), i)).take(20).sorted.toSeq
    assert(bySource(src).map(_._2).sorted.toSeq == expect,
      "the sampled ids are not the first k of the md5 order")
  }
}
