package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.KafkaShape

/** The dead-letter path for the Kafka intake: the main decode query and a
  * second dead-letter query run over the SAME wire feed (each streaming
  * query keeps its own offsets), the dead letters land in parquet with
  * their original bytes, and the counts reconcile exactly with the
  * kafka_decode observed metric — message-level accounting, not just a
  * drop rate.
  */
class KafkaDeadLetterSpec extends AnyFunSuite with SparkFixture {

  test("dead-letter sink captures exactly the dropped wire rows, bytes intact") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    def ev(id: Long) =
      (s"""{"event_id":$id,"ts":170000000000000000$id,"user_id":$id,""" +
        """"event_type":"click","value":1.0,"props":null}""").getBytes("UTF-8")
    val feed = Seq(
      (Array[Byte](1), ev(1)),
      (Array[Byte](2), null.asInstanceOf[Array[Byte]]),    // tombstone
      (Array[Byte](3), "not json".getBytes("UTF-8")),      // malformed
      (Array[Byte](4), "{\"other\":1}".getBytes("UTF-8")), // schema drift
      (Array[Byte](5), ev(5)))
    val dlqDir = java.nio.file.Files.createTempDirectory("graft_dlq").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Array[Byte], Array[Byte])]
    val wire = input.toDF().toDF("key", "value")
    val main = KafkaShape.fromKafkaShape(wire)
      .writeStream.format("memory").queryName("dlq_main")
      .outputMode("append").start()
    val dlq = KafkaShape.deadLetters(wire)
      .writeStream.format("parquet")
      .option("path", s"$dlqDir/data")
      .option("checkpointLocation", s"$dlqDir/ckpt")
      .outputMode("append").start()
    try {
      input.addData(feed: _*)
      main.processAllAvailable()
      dlq.processAllAvailable()

      val dropped = main.lastProgress
        .observedMetrics.get(KafkaShape.DecodeMetric).getAs[Long]("rows_dropped")
      val letters = spark.read.parquet(s"$dlqDir/data")
        .collect().map(r => (r.getAs[Array[Byte]]("key").toSeq,
                             Option(r.getAs[Array[Byte]]("value")).map(_.toSeq),
                             r.getAs[String]("reason")))
      // count reconciliation: every drop the metric counted is a row in
      // the sink, and nothing else is
      assert(dropped == 3L, s"metric counted $dropped drops")
      assert(letters.length == dropped,
        s"sink holds ${letters.length} letters for $dropped metric drops")
      // reasons: the null payload is a tombstone, the rest undecodable
      assert(letters.collect { case (k, None, r) => (k, r) }.toSeq ==
        Seq((Seq[Byte](2), "tombstone")))
      assert(letters.filter(_._3 == "undecodable").map(_._1).toSet ==
        Set(Seq[Byte](3), Seq[Byte](4)))
      // bytes intact: the malformed payloads are replayable verbatim
      assert(letters.flatMap(_._2).toSet ==
        Set("not json".getBytes("UTF-8").toSeq,
            "{\"other\":1}".getBytes("UTF-8").toSeq))
      // and the main leg kept exactly the decodable events
      assert(spark.table("dlq_main").collect()
        .map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 5L))
    } finally {
      main.stop(); dlq.stop()
      spark.catalog.dropTempView("dlq_main")
    }
  }
}
