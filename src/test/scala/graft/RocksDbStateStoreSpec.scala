package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The RocksDB state-store option (GraftSession.RocksDbProvider): the
  * production backend for 100-TB stream state. Two claims:
  *  - the provider is genuinely ACTIVE when selected (rocksdb-specific
  *    custom metrics appear in the query progress — a misspelled provider
  *    class would throw, but a silently-ignored conf would not);
  *  - the sessionization gate entries (s02 gap-close, s04 event-time
  *    timeout — the two heaviest state users) still reproduce the batch
  *    q25 sessions exactly under RocksDB.
  */
class RocksDbStateStoreSpec extends AnyFunSuite with SparkFixture {

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[A](body: => A): A = {
    val before = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf, GraftSession.RocksDbProvider)
    try body
    finally before match {
      case Some(v) => spark.conf.set(ProviderConf, v)
      case None => spark.conf.unset(ProviderConf)
    }
  }

  test("RocksDB provider is active: rocksdb metrics appear in query progress") {
    withRocksDb {
      val sp = spark
      import sp.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[Long]
      in.addData(1L, 2L, 2L, 3L)
      val q = in.toDF().toDF("id").dropDuplicates("id")
        .writeStream.format("memory").queryName("rocksdb_probe")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val state = q.lastProgress.stateOperators
        assert(state.nonEmpty, "no stateful operator in the probe query")
        val metricKeys = state.flatMap(_.customMetrics.keySet.asScala)
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
          s"no rocksdb custom metrics — provider not active; saw: ${metricKeys.take(10).mkString(", ")}")
        assert(spark.table("rocksdb_probe").count() == 3)
      } finally {
        q.stop()
        spark.catalog.dropTempView("rocksdb_probe")
      }
    }
  }

  test("s02/s04 sessionization gate entries reproduce batch q25 under RocksDB") {
    withRocksDb {
      val batch = SparkEntry.queries("q25_sessionize")(spark, sfDir)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      for (op <- Seq("s02_stream_sessions", "s04_stream_sessions_timeout")) {
        val streamed = SparkEntry.queries(op)(spark, sfDir)
          .collect().map(_.toSeq).toSet
        assert(streamed == batch,
          s"$op under RocksDB diverged from batch q25: " +
            s"${(streamed -- batch).take(3)} extra, ${(batch -- streamed).take(3)} missing")
      }
    }
  }
}
