package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The RocksDB state-store option (GraftSession.RocksDbProvider): the
  * production backend for 100-TB stream state. Two claims:
  *  - the provider is genuinely ACTIVE when selected (rocksdb-specific
  *    custom metrics appear in the query progress — a misspelled provider
  *    class would throw, but a silently-ignored conf would not);
  *  - the sessionization gate entries (s02 gap-close, s04 event-time
  *    timeout — the two heaviest state users) still reproduce the batch
  *    q25 sessions exactly under RocksDB;
  *  - the remaining stateful legs — s03's dropDuplicates state and
  *    s10's complete-mode verdict aggregation — also run on the
  *    production store (rocksdb metrics observed in flight via a
  *    listener, since their drain helpers stop the query before
  *    returning) and match their batch truths exactly.
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

  /** Runs `body` with a listener capturing every stateful operator's
    * custom-metric keys across all queries started inside — drain()-style
    * helpers stop their query before returning, so progress must be
    * observed in flight.
    */
  private def collectStateMetrics[A](body: => A): (A, Set[String]) = {
    val keys = scala.collection.concurrent.TrieMap.empty[String, Unit]
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach(_.customMetrics.keySet.asScala
          .foreach(k => keys.put(k, ())))
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val out =
      try body
      finally spark.streams.removeListener(listener)
    (out, keys.keySet.toSet)
  }

  test("s03 doubled-feed dedup state runs (and matches) under RocksDB") {
    withRocksDb {
      val (streamed, metricKeys) = collectStateMetrics {
        SparkEntry.queries("s03_stream_dedup")(spark, sfDir)
          .collect().map(_.toSeq).toSet
      }
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"s03's dedup state did not run on rocksdb; saw: ${metricKeys.take(10).mkString(", ")}")
      // batch truth = the events table itself (dedup of a doubled feed)
      // Tables.events exposes ts as raw nanos (BIGINT) plus the derived
      // ts_us — the same micros the stream leg emits
      val batch = graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
                col("ts_us"), col("value"))
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"s03 under RocksDB diverged: ${(streamed -- batch).take(3)} extra, " +
          s"${(batch -- streamed).take(3)} missing")
    }
  }

  test("s10 complete-mode verdict aggregation runs (and matches d24) under RocksDB") {
    withRocksDb {
      val (streamed, metricKeys) = collectStateMetrics {
        SparkEntry.queries("s10_stream_incr_dedup")(spark, sfDir)
          .collect().map(_.toSeq).toSet
      }
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"s10's aggregation state did not run on rocksdb; saw: ${metricKeys.take(10).mkString(", ")}")
      val batch = SparkEntry.queries("d24_incremental_dedup")(spark, sfDir)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"s10 under RocksDB diverged from batch d24: " +
          s"${(streamed -- batch).take(3)} extra, ${(batch -- streamed).take(3)} missing")
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
