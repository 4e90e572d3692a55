package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** The boiler-span model's lake form (judge r8 #4): the scrub output
  * must be BIT-IDENTICAL whether the span list is
  *  - collected to the driver and probed by the codegen'd binary search
  *    (the model-sized form s13 ships on the stream), or
  *  - persisted as a sorted lake table and probed by a broadcast join, or
  *  - probed by a genuine shuffle join (auto-broadcast disabled — the
  *    10^8-span form where no driver-resident copy exists).
  */
class BoilerLakeSpec extends AnyFunSuite with SparkFixture {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))

  test("scrub via the lake table equals the binary-search scrub, all paths") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    Dedup.writeBoilerLake(spark, docs, dir)
    val lake = spark.read.parquet(dir)

    val viaArray = Dedup.scrubAgainst(spark, docs,
        Dedup.boilerSpanHashesFrom(spark, docs))
      .collect().map(key).sortBy(_._1).toSeq
    assert(viaArray.nonEmpty)
    assert(viaArray.exists(_._3 > 0), "corpus has no boilerplate to scrub")

    val viaBroadcast = Dedup.scrubViaLake(spark, docs, lake,
        broadcastBoiler = true)
      .collect().map(key).sortBy(_._1).toSeq
    assert(viaBroadcast == viaArray, "broadcast-join scrub diverged")

    // the shuffle-join leg must actually shuffle: kill auto-broadcast so
    // AQE can't quietly turn it back into the broadcast plan
    val Thresh = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.get(Thresh)
    spark.conf.set(Thresh, "-1")
    try {
      val viaShuffle = Dedup.scrubViaLake(spark, docs, lake,
          broadcastBoiler = false)
        .collect().map(key).sortBy(_._1).toSeq
      assert(viaShuffle == viaArray, "shuffle-join scrub diverged")
    } finally spark.conf.set(Thresh, before)
  }

  test("the lake table holds exactly the model the driver collect sees") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler2").toString
    Dedup.writeBoilerLake(spark, docs, dir)
    val fromLake = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    val fromDriver = Dedup.boilerSpanHashesFrom(spark, docs).sorted
    assert(fromLake.toSeq == fromDriver.toSeq)
  }
}
