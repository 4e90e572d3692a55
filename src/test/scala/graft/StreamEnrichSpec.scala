package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import java.time.Instant

/** s07's structural claim: the stream-static enrichment join is
  * STATELESS — the only state operator in the query is the windowed
  * aggregate's, so state never grows with the dimension or the join's
  * history (a stream-stream formulation would buffer both sides). Plus
  * the drop semantics: a stream row with no dim match vanishes without
  * disturbing the aggregate.
  */
class StreamEnrichSpec extends AnyFunSuite with SparkFixture {

  private def ts(min: Long): Timestamp =
    Timestamp.from(Instant.parse("2024-03-01T00:00:00Z").plusSeconds(min * 60))

  test("s07 enrichment adds no join state; unmatched users are dropped") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    val in = MemoryStream[(Timestamp, Long, Double)]
    val q = graft.streaming.StreamOps
      .enrichWindows(in.toDF().toDF("ts", "user_id", "value"), dim)
      .writeStream.format("memory").queryName("s07_probe")
      .outputMode("complete").start()
    try {
      in.addData((ts(0), 1L, 1.0), (ts(10), 2L, 2.0), (ts(5), 7L, 100.0),
                 (ts(70), 1L, 4.0))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators
      assert(state.length == 1,
        s"expected only the windowed aggregate's state operator, got " +
          s"${state.map(_.operatorName).mkString(", ")}")
      val rows = spark.table("s07_probe")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val base = ts(0).toInstant.getEpochSecond
      assert(rows == Set((base, "A", 1L, 1.0), (base, "B", 1L, 2.0),
                         (base + 3600, "A", 1L, 4.0)),
        s"enriched windows wrong (user 7 must be dropped): $rows")
    } finally {
      q.stop()
      spark.catalog.dropTempView("s07_probe")
    }
  }
}
