package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  /** Apply a changelog (`op` = 'D' | 'U' + the table's columns) as one
    * new committed version; returns the new version number. Delta-size
    * dispatch picks the broadcast or bucketed-SMJ merge form.
    */
  def merge(log: DataFrame): Int = {
    val n = currentVersion
    val next = n + 1
    Lake.cdcMergeAuto(readAsOf(n), log, key = key)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/v$next")
    commit(dir, next)
    next
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

  private def markerPath(dir: String, v: Int) =
    java.nio.file.Paths.get(dir, s"v$v", "_GRAFT_COMMITTED")

  private def committed(dir: String, v: Int): Boolean =
    java.nio.file.Files.exists(markerPath(dir, v))

  private def commit(dir: String, v: Int): Unit =
    java.nio.file.Files.write(markerPath(dir, v),
      java.time.Instant.now().toString.getBytes("UTF-8"))

  /** Create a table at `dir` with `df` as committed version 0. */
  def create(s: SparkSession, dir: String, df: DataFrame,
      key: String = "doc_id"): GraftTable = {
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/v0")
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
