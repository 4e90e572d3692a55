package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator: a Spark plan builder plus (when SQL-expressible)
  * a DuckDB oracle query over the same parquet tables. The driver's
  * correctness gate hash-compares the two at sf0.01.
  */
final case class OpDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpDef {
  def sql(build: (SparkSession, String) => DataFrame, oracle: String): OpDef =
    OpDef(build, Some(oracle))
  def rowsOnly(build: (SparkSession, String) => DataFrame): OpDef =
    OpDef(build, None)
}

/** Persist with per-name tracking: rebuilding the same operator in a
  * long-lived session (bench warmup + timed passes, repeated driver runs)
  * unpersists the previous incarnation instead of accumulating cached
  * partitions until LRU eviction.
  */
object Caching {
  private val tracked = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  def persistTracked(name: String, df: DataFrame): DataFrame = {
    val old = tracked.put(name, df)
    if (old != null) old.unpersist(blocking = false)
    df.persist()
  }

  /** The WARM variant for artifacts whose content is a pure function of
    * their key (e.g. the e13/e14 cascade sketch per corpus dir): a
    * repeat call returns the ALREADY-TRACKED frame instead of replacing
    * it, so a long-lived session (a search service answering query
    * batches, the tier probe's reps) pays the build once. A
    * `clearCache()` between calls only drops the cached blocks — the
    * returned frame recomputes lazily on next use, it never goes stale.
    * Use [[persistTracked]] when the frame's content can CHANGE for the
    * same key (per-run staging); use this when it cannot.
    */
  def persistTrackedReuse(name: String, df: => DataFrame): DataFrame = {
    val existing = tracked.get(name)
    if (existing != null) existing
    else persistTracked(name, df)
  }

  /** [[persistTrackedReuse]] for STAMP-KEYED artifacts (`prefix` +
    * content stamp): caching under a NEW stamp first unpersists and
    * drops every tracked entry with the same prefix but a different
    * stamp — a long-lived service cycling corpus versions holds exactly
    * one live incarnation per artifact instead of leaking one persisted
    * corpus-sized aggregate per superseded stamp.
    */
  def persistTrackedReuseKeyed(prefix: String, stamp: String,
      df: => DataFrame): DataFrame = {
    val name = prefix + stamp
    val existing = tracked.get(name)
    if (existing != null) existing
    else {
      import scala.jdk.CollectionConverters._
      tracked.keySet.asScala.filter(k => k.startsWith(prefix) && k != name)
        .toSeq.foreach { k =>
          Option(tracked.remove(k)).foreach(_.unpersist(blocking = false))
        }
      persistTracked(name, df)
    }
  }
}
