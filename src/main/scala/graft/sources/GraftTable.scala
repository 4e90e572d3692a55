package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Lake

/** A versioned keyed table in the lake — the unified facade over the
  * engine's lake-metadata parts, which until r14 shipped as separate
  * operators over ad-hoc `v{N}` directory conventions: CDC merge
  * dispatch (l06 broadcast / l07 exchange-free bucketed SMJ, auto-picked
  * by delta size — [[Lake.cdcMergeAuto]]), version chains + retention
  * (l10's [[Lake.vacuumVersions]] semantics), and a marker-file commit
  * protocol (s21's discipline: data first, marker last, uncommitted
  * directories invisible to every reader).
  *
  * Layout: `dir/v{N}/` parquet per version, plus `dir/v{N}/_GRAFT_COMMITTED`
  * written AFTER the data — readers only believe marked versions, so a
  * writer crash mid-version leaves an invisible (and overwritable)
  * directory, never a torn read. One merge = one new version; old
  * versions are immutable bytes (time travel reads them verbatim) until
  * [[vacuum]] retires them oldest-first.
  *
  * Scale: a version transition stores the FULL snapshot (the l10 cost
  * model — at 100 TB you bound the chain with `vacuum(keep)`, and the
  * partition-scoped l08 path is the in-place alternative when ticks are
  * trickles). The merge itself never shuffles the snapshot on the
  * broadcast path and never exchanges on the bucketed path; reads are
  * plain parquet scans with full pushdown.
  *
  * Every version also carries its MANIFEST (l09's discipline folded
  * into the facade): the data lands range-partitioned + sorted on the
  * key — tight per-file key spans — and `v{N}/_manifest/` holds one
  * (path, key_lo, key_hi, n_rows) row per data file, derived in one
  * distributed scan and written BEFORE the commit marker, so the
  * marker's atomicity covers data AND manifest. [[readRangeAsOf]] plans
  * a key-range read from the manifest alone: one interval-overlap
  * filter, only the admitted paths reach the driver, the scan opens
  * exactly those files — at 10M files the per-footer planning IO is
  * the cost a 100-TB reader actually pays, and the manifest replaces
  * it with one metadata scan. The underscore prefix keeps the manifest
  * (like the marker) invisible to plain `readAsOf` data scans.
  */
final class GraftTable private (s: SparkSession, val dir: String,
    key: String) {

  import GraftTable._

  /** Committed versions, ascending (uncommitted dirs are invisible). */
  def versions: Seq[Int] =
    Option(new java.io.File(dir).listFiles()).map(_.toSeq)
      .getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toInt)
      .filter(v => committed(dir, v))
      .sorted

  def currentVersion: Int = versions.lastOption.getOrElse(
    throw new IllegalStateException(s"graft table $dir has no committed versions"))

  /** Read the current snapshot. */
  def read(): DataFrame = readAsOf(currentVersion)

  /** Time travel: read the snapshot exactly as committed at version `v`.
    * Loud failure modes, never a silent empty frame: a vacuumed-away
    * version names the retention event, an uncommitted/never-written one
    * names the committed range.
    */
  def readAsOf(v: Int): DataFrame = {
    val vs = versions
    if (!vs.contains(v)) {
      val msg =
        if (vs.nonEmpty && v >= 0 && v < vs.min)
          s"version $v of graft table $dir was removed by retention " +
            s"(vacuum); oldest retained is v${vs.min}"
        else
          s"version $v of graft table $dir does not exist " +
            s"(committed versions: ${vs.mkString("[", ", ", "]")})"
      throw new java.util.NoSuchElementException(msg)
    }
    s.read.parquet(s"$dir/v$v")
  }

  /** Manifest-planned key-range read `[lo, hi)` at version `v`: one
    * interval-overlap filter on the version's manifest admits the files
    * (∝ selectivity — only survivor paths reach the driver), the data
    * scan opens exactly those, and the residual predicate still applies
    * in-scan (stats admit whole files; rows inside can miss the range).
    * An empty admission returns an empty frame WITH the table's schema.
    */
  def readRangeAsOf(v: Int, lo: Long, hi: Long): DataFrame = {
    readAsOf(v) // loud version validation
    val admitted = s.read.parquet(s"$dir/v$v/_manifest")
      .filter(col("key_hi") >= lo && col("key_lo") < hi)
      .select("path").collect().map(_.getString(0)).toSeq
    val src =
      if (admitted.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          readAsOf(v).schema)
      else s.read.parquet(admitted: _*)
    src.filter(col(key) >= lo && col(key) < hi)
  }

  def readRange(lo: Long, hi: Long): DataFrame =
    readRangeAsOf(currentVersion, lo, hi)

  /** Apply a changelog (`op` = 'D' | 'U' + the table's columns) as one
    * new committed version; returns the new version number. Delta-size
    * dispatch picks the broadcast or bucketed-SMJ merge form.
    */
  def merge(log: DataFrame): Int = {
    val n = currentVersion
    val next = n + 1
    landVersion(s, dir, next, key,
      Lake.cdcMergeAuto(readAsOf(n), log, key = key))
    commit(dir, next)
    next
  }

  /** The EXACTLY-ONCE merge form for streaming writers (s19's versioned
    * idempotence lifted into the facade): batch b lands as version
    * `v = b + 1`, always computed from v-1. A checkpoint replay of the
    * same batch hits the same `v` and OVERWRITES it from the same input
    * — convergent, never duplicated — and a crash between data and
    * marker leaves an uncommitted directory the replay finishes.
    * Skipping ahead (v beyond current+1) is a stream-offset bug and
    * fails loudly; so does a replay whose base v-1 was vacuumed away.
    */
  def mergeAs(log: DataFrame, v: Int): Int = {
    val cur = currentVersion
    require(v >= 1 && v <= cur + 1,
      s"mergeAs v$v on graft table $dir: committed max is v$cur " +
        s"(replays allowed, skips are a stream-offset bug)")
    landVersion(s, dir, v, key,
      Lake.cdcMergeAuto(readAsOf(v - 1), log, key = key))
    commit(dir, v)
    v
  }

  /** Changelog BETWEEN two committed versions — time travel's other
    * half: not "what did the table look like at v" but "what happened
    * between vA and vB". One full-outer join on the key (both sides are
    * plain parquet scans of immutable version directories; the join
    * shuffles each side once on the key — linear, no driver state),
    * presence sentinels decide I/D, and a null-safe column compare
    * decides U; unchanged keys never leave the join. Rows carry both
    * sides' payloads as `a_*` / `b_*` so a consumer can re-apply or
    * audit without re-reading either version.
    */
  def diff(vA: Int, vB: Int): DataFrame = {
    val cols = readAsOf(vA).columns.filterNot(_ == key).toSeq
    def side(v: Int, tag: String) =
      readAsOf(v).select(
        (col(key) +: lit(true).as(s"_$tag") +:
          cols.map(c => col(c).as(s"${tag}_$c"))): _*)
    val changed = cols.map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduce(_ || _)
    side(vA, "a").join(side(vB, "b"), Seq(key), "full_outer")
      .withColumn("op",
        when(col("_b").isNull, "D")
          .when(col("_a").isNull, "I")
          .otherwise("U"))
      .filter(col("_a").isNull || col("_b").isNull || changed)
      .drop("_a", "_b")
  }

  /** Retire all but the newest `keep` committed versions (floored at 1 —
    * the current version always survives; uncommitted debris dirs are
    * not versions and are left for their writer). Marker first, bytes
    * second: a crash mid-vacuum leaves an unreadable (uncommitted)
    * stub that the next vacuum finishes deleting — idempotent, and no
    * reader ever sees a half-deleted version as live. Returns the
    * retired version numbers.
    */
  def vacuum(keep: Int): Seq[Int] = {
    val doomed = versions.dropRight(math.max(1, keep))
    doomed.foreach { v =>
      java.nio.file.Files.deleteIfExists(markerPath(dir, v))
      Lake.deleteTree(java.nio.file.Paths.get(dir, s"v$v"))
    }
    doomed
  }
}

object GraftTable {

  /** Floor on the per-version range-partition fan (keeps the manifest
    * non-degenerate — with one file there is nothing to prune), and the
    * per-file byte target the fan scales by above it.
    */
  private[graft] val VersionFilesFloor = 8
  private[graft] val TargetFileBytes = 128L << 20

  /** Data files for one version: Catalyst's size estimate over the
    * snapshot plan (driver-side, no job — exact for parquet-backed
    * frames, propagated estimates through joins/unions), divided by the
    * 128 MB file target, floored at [[VersionFilesFloor]]. A fixed fan
    * would be 12.5 TB/file at 100 TB; a size-derived fan keeps files
    * scan-sized at every table size. Capped only by Int.MaxValue —
    * the range exchange itself bounds task counts via AQE.
    */
  private[graft] def versionFan(df: DataFrame): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes = (bytes / TargetFileBytes).min(BigInt(Int.MaxValue)).toInt
    math.max(VersionFilesFloor, byBytes)
  }

  private def markerPath(dir: String, v: Int) =
    java.nio.file.Paths.get(dir, s"v$v", "_GRAFT_COMMITTED")

  private def committed(dir: String, v: Int): Boolean =
    java.nio.file.Files.exists(markerPath(dir, v))

  private def commit(dir: String, v: Int): Unit =
    java.nio.file.Files.write(markerPath(dir, v),
      java.time.Instant.now().toString.getBytes("UTF-8"))

  /** Land one version: data range-partitioned + sorted on the key (each
    * file spans a tight contiguous key range — what makes the manifest
    * selective), then the per-file stats derived FROM the landed files
    * in one `input_file_name()`-grouped scan and written under
    * `_manifest/` — both before the caller's commit marker, so a crash
    * anywhere leaves an uncommitted (invisible) version, never a
    * committed version missing its manifest. The range exchange is the
    * cost of tight stats; at trickle-tick rates the l08 partition-scoped
    * path is the cheaper alternative.
    */
  private def landVersion(s: SparkSession, dir: String, v: Int,
      key: String, df: DataFrame): Unit = {
    df.repartitionByRange(versionFan(df), col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/v$v")
    s.read.parquet(s"$dir/v$v")
      .groupBy(input_file_name().as("path"))
      .agg(min(key).as("key_lo"), max(key).as("key_hi"),
           count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/v$v/_manifest")
  }

  /** Create a table at `dir` with `df` as committed version 0. */
  def create(s: SparkSession, dir: String, df: DataFrame,
      key: String = "doc_id"): GraftTable = {
    landVersion(s, dir, 0, key, df)
    commit(dir, 0)
    new GraftTable(s, dir, key)
  }

  /** Open an existing table (at least one committed version required). */
  def open(s: SparkSession, dir: String,
      key: String = "doc_id"): GraftTable = {
    val t = new GraftTable(s, dir, key)
    t.currentVersion // loud if nothing committed
    t
  }
}
