package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.OpDef
import graft.sources.Tables

/** Lake maintenance — the table-layout operations a 100-TB parquet lake
  * lives or dies by. Ingest writes what arrives (one file per micro-batch
  * per task: thousands of small files, every one of them a scan task and a
  * namenode entry); maintenance rewrites what queries read (partition-
  * aligned, few large files, clustered on the predicate columns so
  * min/max pruning works). The reference's storage layer rewrites
  * per-realm snapshots on every ingest tick for the same reason — readers
  * see the compacted form, never the arrival debris.
  */
object Lake {

  /** Deterministic scratch root per (operator, input dir) — re-runs
    * overwrite instead of accumulating; nothing is ever written outside
    * the JVM temp dir.
    */
  private[graft] def scratch(tag: String, d: String): String = {
    val h = java.lang.Integer.toHexString(d.hashCode)
    val base = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_${tag}_$h")
    base.toString
  }

  /** The ingest-debris form: 64 arrival-order files, every file spanning
    * every month — the layout that makes EVERY month-filtered query scan
    * EVERY file.
    */
  private[graft] def writeRawDebris(s: SparkSession, d: String): String = {
    val base = scratch("l01", d)
    Tables.orders(s, d)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .repartition(64, col("o_orderkey"))
      .write.mode(SaveMode.Overwrite).parquet(s"$base/raw")
    base
  }

  /** Compaction: one shuffle keyed on the partition column, so each month
    * lands in exactly one task → exactly one file per month directory.
    * After this, a month-filtered read prunes to ONE file by directory
    * alone (no footer reads), and full scans read ~#months files instead
    * of #months x #arrival-batches.
    */
  private[graft] def compact(s: SparkSession, base: String): Unit =
    s.read.parquet(s"$base/raw")
      .repartition(col("month"))
      .sortWithinPartitions("o_orderdate", "o_orderkey")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("month")
      .parquet(s"$base/compacted")

  def defs: Map[String, OpDef] = Map(
    // Small-files compaction + partition-pruned layout, end to end: write
    // the arrival debris, compact it to a month-partitioned lake (one
    // file per partition, rows clustered by order date within each), and
    // read the compacted lake back in full. The oracle is the source
    // table itself — compaction must be a pure LAYOUT change, bit-exact
    // on content, and the read-back proves it through the gate hash.
    //
    // At 100 TB the same job runs per partition with dynamic partition
    // overwrite (only the months a batch touched rewrite — asserted in
    // LakeCompactionSpec), and the repartition key gains a salt when one
    // partition outgrows a task (AQE's skew split covers the read side).
    "l01_compact_lake" -> OpDef.sql(
      (s, d) => {
        val base = writeRawDebris(s, d)
        compact(s, base)
        s.read.parquet(s"$base/compacted")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
                  col("o_totalprice"), col("o_orderdate"), col("month"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, strftime(o_orderdate, '%Y-%m') AS month
        |FROM orders ORDER BY o_orderkey""".stripMargin)
  )
}
