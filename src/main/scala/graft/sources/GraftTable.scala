package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import graft.operators.Lake

/** A versioned keyed table in the lake — the unified facade over the
  * engine's lake-metadata parts, which until r14 shipped as separate
  * operators over ad-hoc `v{N}` directory conventions: CDC merge
  * dispatch (l06 broadcast / l07 exchange-free bucketed SMJ, auto-picked
  * by delta size — [[Lake.cdcMergeAuto]]), version chains + retention
  * (l10's [[Lake.vacuumVersions]] semantics), a marker-file commit
  * protocol (s21's discipline: data first, marker last, uncommitted
  * directories invisible to every reader), and — r15 — l08's
  * touched-slice rewrite as the trickle-tick merge path and l03's
  * schema evolution as a merge-time capability.
  *
  * Layout: `dir/v{N}/` holds the version's NEW parquet files, its
  * `_manifest/` (one (path, key_lo, key_hi, n_rows) row per live data
  * file — paths may point into OLDER version directories after a scoped
  * merge), its `_graft_schema.json` (the version's schema — what makes
  * a mixed-vintage file set read with null backfill, and time travel
  * return the OLD schema verbatim after an evolution), and
  * `_GRAFT_COMMITTED`, written AFTER everything else — readers only
  * believe marked versions, so a writer crash mid-version leaves an
  * invisible (and overwritable) directory, never a torn read. Every
  * read plans from the manifest: the file list IS the version.
  *
  * Two merge cost models, one table:
  *  - [[merge]] (full): the new version stores the full snapshot,
  *    range-partitioned + key-sorted (l10's model — self-contained
  *    versions, replay-overwritable, vacuum drops whole directories).
  *  - [[mergeScoped]] (trickle): only the files whose key ranges the
  *    changelog touches are rewritten; untouched files carry forward in
  *    the new manifest as the SAME bytes (l08's partition-scoped rewrite
  *    re-expressed over the manifest — at 100 TB a 0.1%-of-keys tick
  *    pays ~0.1% of the write, not a full-snapshot rewrite). Vacuum is
  *    reference-aware: a retired version's files survive exactly as
  *    long as a retained manifest still points at them.
  *
  * SCHEMA EVOLUTION (both merge forms): a changelog carrying columns
  * the snapshot lacks ADDS them — old rows read as null (the parquet
  * reader backfills from the version's stored schema), `readAsOf(k)`
  * keeps returning version k's schema verbatim, and [[diff]] compares
  * over the union schema. A changelog MISSING current columns fails
  * loudly: additions evolve, silent drops don't.
  *
  * READER-vs-VACUUM RACE (single-writer assumed): a DataFrame planned
  * before a vacuum holds resolved file paths; if the vacuum retires its
  * version, acting on that frame fails LOUDLY mid-scan (the scan hits
  * deleted paths) — never silent partial data. The marker is deleted
  * FIRST, so any read planned after the marker drop fails by name
  * ("removed by retention") instead. GraftTableSpec pins both.
  *
  * Scale: reads are plain parquet scans with full pushdown; planning is
  * one manifest scan (metadata-sized — the l09 argument: at 10M files
  * the per-footer planning IO is what a 100-TB reader pays, and the
  * manifest replaces it). The full-merge path never shuffles the
  * snapshot on the broadcast side; the scoped path's cost is
  * touched-files + changelog, not snapshot.
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

  /** Loud version validation: a vacuumed-away version names the
    * retention event, an uncommitted/never-written one names the
    * committed range.
    */
  private def validate(v: Int): Unit = {
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
  }

  /** Version v's schema, verbatim as committed (survives later
    * evolutions — time travel's schema half).
    */
  def schemaAsOf(v: Int): StructType = {
    validate(v)
    DataType.fromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, s"v$v", SchemaFile)))
      .asInstanceOf[StructType]
  }

  /** Version v's live-file manifest (path, key_lo, key_hi, n_rows). */
  def manifest(v: Int): DataFrame = {
    validate(v)
    s.read.parquet(s"$dir/v$v/_manifest")
  }

  /** Time travel: read the snapshot exactly as committed at version `v`
    * — the manifest's file list under the version's stored schema, so a
    * scoped version composes untouched old files with its own rewrites,
    * and a pre-evolution version returns its OLD schema verbatim (files
    * lacking a later column never enter its manifest).
    */
  def readAsOf(v: Int): DataFrame = {
    val schema = schemaAsOf(v)
    val paths = manifest(v).select("path").collect().map(_.getString(0))
    if (paths.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema).parquet(paths.toIndexedSeq: _*)
  }

  /** Manifest-planned key-range read `[lo, hi)` at version `v`: one
    * interval-overlap filter on the version's manifest admits the files
    * (∝ selectivity — only survivor paths reach the driver), the data
    * scan opens exactly those, and the residual predicate still applies
    * in-scan (stats admit whole files; rows inside can miss the range).
    * An empty admission returns an empty frame WITH the table's schema.
    */
  def readRangeAsOf(v: Int, lo: Long, hi: Long): DataFrame = {
    val schema = schemaAsOf(v) // loud version validation
    val admitted = manifest(v)
      .filter(col("key_hi") >= lo && col("key_lo") < hi)
      .select("path").collect().map(_.getString(0)).toSeq
    val src =
      if (admitted.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
      else s.read.schema(schema).parquet(admitted: _*)
    src.filter(col(key) >= lo && col(key) < hi)
  }

  def readRange(lo: Long, hi: Long): DataFrame =
    readRangeAsOf(currentVersion, lo, hi)

  /** Schema-align a merge: columns the changelog ADDS extend the base
    * with typed null backfill (the l03 mergeSchema semantics owned by
    * the facade); columns the changelog MISSES fail loudly — an upsert
    * that silently nulled a column would be data loss, not evolution.
    */
  private def alignForMerge(base: DataFrame, log: DataFrame): DataFrame = {
    val logCols = log.columns.filterNot(_ == "op")
    val missing = base.columns.filterNot(logCols.contains)
    require(missing.isEmpty,
      s"changelog for graft table $dir is missing columns " +
        s"${missing.mkString("[", ", ", "]")}: upserts must carry every " +
        "current column (schema ADDITIONS evolve; silent drops don't)")
    val added = logCols.filterNot(base.columns.contains)
    added.foldLeft(base)((df, c) =>
      df.withColumn(c, lit(null).cast(log.schema(c).dataType)))
  }

  /** Apply a changelog (`op` = 'D' | 'U' + the table's columns, plus any
    * NEW columns — see schema evolution above) as one new committed
    * FULL version; returns the new version number. Delta-size dispatch
    * picks the broadcast or bucketed-SMJ merge form.
    */
  def merge(log: DataFrame): Int = {
    val n = currentVersion
    val next = n + 1
    landVersion(s, dir, next, key,
      Lake.cdcMergeAuto(alignForMerge(readAsOf(n), log), log, key = key))
    commit(dir, next)
    next
  }

  /** The files of version `n` whose key ranges the changelog touches —
    * the scoped merge's admission, and [[mergeAuto]]'s dispatch signal.
    * One interval-overlap join of the manifest against the (broadcast,
    * trickle-sized) distinct log keys; only touched paths reach the
    * driver.
    */
  private def touchedPaths(n: Int, log: DataFrame): Seq[String] =
    manifest(n)
      .join(broadcast(log.select(col(key)).distinct()),
        col(key) >= col("key_lo") && col(key) <= col("key_hi"), "left_semi")
      .select("path").collect().map(_.getString(0)).toSeq

  /** Dispatch between the two merge cost models by measured touch
    * fraction (the cdcMergeAuto discipline one level up): a changelog
    * touching under half the base's files merges SCOPED (rewrite cost ∝
    * touched), anything wider merges FULL (a mostly-rewritten version
    * may as well be self-contained — replay-overwritable, whole-dir
    * vacuum, and one range exchange lays the whole snapshot back out
    * with tight per-file spans). The admission scan that decides is the
    * same one the scoped path would run anyway.
    */
  def mergeAuto(log: DataFrame): Int = {
    val n = currentVersion
    val touched = touchedPaths(n, log)
    val total = manifest(n).count()
    if (touched.size * 2 >= total) merge(log)
    else mergeScopedOn(n, touched, log)
  }

  /** The trickle-tick merge: rewrite ONLY the files whose key ranges the
    * changelog touches (l08's partition-scoped rewrite, re-expressed
    * over the manifest so it composes with versioning):
    *
    *  1. admission — the base manifest interval-joined against the
    *     changelog's (broadcast, trickle-sized) distinct keys; only
    *     touched paths reach the driver;
    *  2. the merge reads ONLY the touched files (plus the changelog) —
    *     untouched keys live in files no admitted range covers, so they
    *     cannot be superseded and need not be read;
    *  3. rewritten rows + inserts land as v{n+1}'s own files; untouched
    *     manifest rows carry forward VERBATIM — same paths, same bytes
    *     (GraftTableSpec asserts byte-identity);
    *  4. manifest, schema, then marker — the commit covers all three.
    *
    * Cost ∝ touched-files + changelog, never snapshot. The trade: new
    * versions share files with old ones, so [[vacuum]] turns
    * reference-aware, and a [[mergeAs]] REPLAY of a version that scoped
    * successors reference is refused (see there). Schema evolution
    * composes: an added column lands in the rewritten files only; the
    * version schema is the union and untouched files read null-backfilled.
    */
  def mergeScoped(log: DataFrame): Int = {
    val n = currentVersion
    mergeScopedOn(n, touchedPaths(n, log), log)
  }

  private def mergeScopedOn(n: Int, touched: Seq[String],
      log: DataFrame): Int = {
    val next = n + 1
    val base = manifest(n)
    val baseSchema = schemaAsOf(n)
    val touchedRows =
      if (touched.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], baseSchema)
      else s.read.schema(baseSchema).parquet(touched: _*)
    val merged =
      Lake.cdcMergeAuto(alignForMerge(touchedRows, log), log, key = key)
    val vdir = s"$dir/v$next"
    writeFiles(s, vdir, key, merged)
    val sp = s
    import sp.implicits._
    val carried = base.join(
      touched.toDF("path"), Seq("path"), "left_anti")
    carried.unionByName(fileStats(s, vdir, key, merged.schema))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$vdir/_manifest")
    writeSchema(dir, next, merged.schema)
    commit(dir, next)
    next
  }

  /** Rewrite the CURRENT snapshot as one fresh SELF-CONTAINED version —
    * l01's lake compaction (Delta OPTIMIZE) owned by the facade. After a
    * chain of scoped trickle ticks the live manifest is a patchwork:
    * small per-tick rewrite files interleaved with old-version
    * survivors, file count growing with tick count and range spans
    * overlapping (each tick's files overlay the ranges they rewrote).
    * compact() reads the manifest's file list ONCE and lands it as
    * version n+1 at the size-derived fan, range-partitioned + key-sorted
    * — content no-op (hash-identical to readAsOf(n)), layout reset:
    * scan-sized files, disjoint tight key spans (manifest pruning
    * selective again), zero references into older versions (vacuum can
    * drop the whole history; mergeAs replays are legal again). Cost is
    * one full read + write — the operation you SCHEDULE (off-peak,
    * every N ticks), which is exactly why the per-tick path doesn't pay
    * it. Returns the new version number.
    */
  def compact(): Int = {
    val n = currentVersion
    val next = n + 1
    landVersion(s, dir, next, key, readAsOf(n))
    commit(dir, next)
    next
  }

  /** The EXACTLY-ONCE merge form for streaming writers (s19's versioned
    * idempotence lifted into the facade): batch b lands as version
    * `v = b + 1`, always computed from v-1, always FULL (self-contained
    * — what makes the overwrite replayable). A checkpoint replay of the
    * same batch hits the same `v` and OVERWRITES it from the same input
    * — convergent, never duplicated — and a crash between data and
    * marker leaves an uncommitted directory the replay finishes.
    * Skipping ahead (v beyond current+1) is a stream-offset bug and
    * fails loudly; so does a replay whose base v-1 was vacuumed away —
    * and so does a replay of a version whose files a LATER scoped
    * version still references (the overwrite would tear that successor;
    * single-writer streams land full versions and never hit this).
    */
  def mergeAs(log: DataFrame, v: Int): Int = {
    requireReplayable("mergeAs", v)
    landVersion(s, dir, v, key,
      Lake.cdcMergeAuto(alignForMerge(readAsOf(v - 1), log), log, key = key))
    commit(dir, v)
    v
  }

  /** The exactly-once SCOPED merge for streaming writers — [[mergeAs]]'s
    * replay discipline on [[mergeScoped]]'s cost model, so a trickle
    * tick at the wire pays touched-files + changelog instead of a full
    * snapshot rewrite. Convergence does not need a self-contained
    * version: a replay of batch b recomputes the SAME touched set from
    * v-1's immutable manifest (the interval join is deterministic), the
    * same merged rows, and the same carried-forward references, then
    * overwrites v{b+1} wholesale — so crash-anywhere + replay lands the
    * identical version (GraftTableSpec pins content identity AND
    * carried-reference identity). The same two loud refusals as
    * [[mergeAs]] apply: version skips (a stream-offset bug) and replays
    * that would tear a LATER scoped version still referencing v's files.
    */
  def mergeScopedAs(log: DataFrame, v: Int): Int = {
    requireReplayable("mergeScopedAs", v)
    mergeScopedOn(v - 1, touchedPaths(v - 1, log), log)
  }

  /** [[mergeAuto]]'s dispatch under [[mergeAs]]'s exactly-once replay
    * discipline — the streaming writer that takes trickle ticks AND the
    * occasional wide backfill through one call. Replay-convergent in
    * both arms: the touch fraction is measured against the immutable
    * v-1 manifest, so a replay of batch b re-takes the SAME arm and
    * recomputes the same version (full: self-contained overwrite;
    * scoped: same touched set, same carried references).
    */
  def mergeAutoAs(log: DataFrame, v: Int): Int = {
    requireReplayable("mergeAutoAs", v)
    val touched = touchedPaths(v - 1, log)
    val total = manifest(v - 1).count()
    if (touched.size * 2 >= total) {
      landVersion(s, dir, v, key,
        Lake.cdcMergeAuto(alignForMerge(readAsOf(v - 1), log), log,
          key = key))
      commit(dir, v)
      v
    } else mergeScopedOn(v - 1, touched, log)
  }

  /** The exactly-once preconditions shared by [[mergeAs]] and
    * [[mergeScopedAs]]: target version is current+1 (the normal tick) or
    * a replay of a committed one that NO later scoped version still
    * references (overwriting it would tear that successor's carried
    * file references; single-writer streams never hit this).
    */
  private def requireReplayable(what: String, v: Int): Unit = {
    val cur = currentVersion
    require(v >= 1 && v <= cur + 1,
      s"$what v$v on graft table $dir: committed max is v$cur " +
        s"(replays allowed, skips are a stream-offset bug)")
    if (v <= cur) {
      val marker = s"/v$v/"
      val holders = versions.filter(_ > v).filter(w =>
        manifest(w).filter(col("path").contains(marker)).limit(1)
          .count() > 0)
      if (holders.nonEmpty)
        throw new IllegalStateException(
          s"$what replay of v$v on graft table $dir would tear scoped " +
            s"version(s) ${holders.mkString("v", ", v", "")} that still " +
            "reference its files")
    }
  }

  /** The table's audit surface (Delta's DESCRIBE HISTORY): one row per
    * committed version — commit time (the marker's payload), file/row/
    * byte totals from the manifest, how many files are carried
    * references into EARLIER versions (0 = self-contained; >0 = a
    * scoped tick's patchwork), and the column count of the stored
    * schema (watch additive evolution land). Reads only metadata: the
    * markers and the per-version manifests (each a one-file parquet),
    * never data files; version count is retention-bounded, so the
    * per-version loop is model-sized by construction.
    */
  def history(): DataFrame = {
    val sp = s
    import sp.implicits._
    versions.map { v =>
      val committedAt = new String(java.nio.file.Files.readAllBytes(
        markerPath(dir, v)), "UTF-8").trim
      val m = manifest(v).agg(
        count(lit(1)).as("files"), sum("n_rows").as("rows")).head()
      val rows = if (m.isNullAt(1)) 0L else m.getLong(1) // empty version
      val carried = manifest(v)
        .filter(!col("path").contains(s"/v$v/")).count()
      val bytes = manifest(v).select("path").collect().map { r =>
        java.nio.file.Files.size(toLocalPath(r.getString(0)))
      }.sum
      (v, committedAt, m.getLong(0), rows, bytes, carried,
        schemaAsOf(v).fields.length)
    }.toDF("version", "committed_at", "n_files", "n_rows", "bytes",
      "carried_files", "n_columns")
  }

  /** Changelog BETWEEN two committed versions — time travel's other
    * half: not "what did the table look like at v" but "what happened
    * between vA and vB". One full-outer join on the key (both sides are
    * plain parquet scans of immutable version file sets; the join
    * shuffles each side once on the key — linear, no driver state),
    * presence sentinels decide I/D, and a null-safe column compare
    * decides U; unchanged keys never leave the join. Rows carry both
    * sides' payloads as `a_*` / `b_*` so a consumer can re-apply or
    * audit without re-reading either version. Schema asymmetry (an
    * evolution between vA and vB) compares over the UNION column set:
    * the absent side reads as a typed null, so a row whose only change
    * is a value in the new column is a U, and a row null there on both
    * sides is unchanged.
    */
  def diff(vA: Int, vB: Int): DataFrame = {
    val aCols = schemaAsOf(vA).fields.map(f => f.name -> f.dataType)
    val bCols = schemaAsOf(vB).fields.map(f => f.name -> f.dataType)
    val types = (aCols ++ bCols).toMap
    val cols = (aCols.map(_._1) ++ bCols.map(_._1))
      .distinct.filterNot(_ == key).toSeq
    // presence sentinels live in a reserved namespace — a payload column
    // literally named `_a`/`_b` must not collide with them
    def side(v: Int, names: Array[(String, DataType)], tag: String) = {
      val present = names.map(_._1).toSet
      readAsOf(v).select(
        (col(key) +: lit(true).as(s"_graft_in_$tag") +:
          cols.map(c =>
            (if (present(c)) col(c)
             else lit(null).cast(types(c))).as(s"${tag}_$c"))): _*)
    }
    val changed = cols.map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    side(vA, aCols, "a").join(side(vB, bCols, "b"), Seq(key), "full_outer")
      .withColumn("op",
        when(col("_graft_in_b").isNull, "D")
          .when(col("_graft_in_a").isNull, "I")
          .otherwise("U"))
      .filter(col("_graft_in_a").isNull || col("_graft_in_b").isNull ||
        changed)
      .drop("_graft_in_a", "_graft_in_b")
  }

  /** Retire all but the newest `keep` committed versions (floored at 1 —
    * the current version always survives; uncommitted debris dirs are
    * not versions and are left for their writer). Marker first, bytes
    * second: a crash mid-vacuum leaves an unreadable (uncommitted)
    * stub that the next vacuum finishes deleting — idempotent, and no
    * reader who PLANS after the marker drop ever sees a half-deleted
    * version as live (a frame planned BEFORE it fails loudly mid-scan —
    * see the class comment's race contract). REFERENCE-AWARE: a retired
    * version's data files survive exactly as long as a retained
    * manifest (a scoped successor) still points at them; everything
    * else — marker, manifest, schema, unreferenced files — goes.
    * Returns the retired version numbers.
    */
  def vacuum(keep: Int): Seq[Int] = {
    val vs = versions
    val doomed = vs.dropRight(math.max(1, keep))
    if (doomed.isEmpty) return doomed
    val retained = vs.drop(doomed.length)
    val referenced: Set[java.nio.file.Path] = retained
      .flatMap(v => manifest(v).select("path").collect().map(_.getString(0)))
      .map(toLocalPath).toSet
    doomed.foreach { v =>
      java.nio.file.Files.deleteIfExists(markerPath(dir, v))
      val vdir = java.nio.file.Paths.get(dir, s"v$v")
      Lake.deleteTree(vdir.resolve("_manifest"))
      java.nio.file.Files.deleteIfExists(vdir.resolve(SchemaFile))
      import scala.jdk.CollectionConverters._
      val leftovers = java.nio.file.Files.walk(vdir).iterator().asScala
        .toSeq.reverse
      leftovers.foreach { p =>
        if (java.nio.file.Files.isRegularFile(p) && !referenced(p))
          java.nio.file.Files.deleteIfExists(p)
        else if (java.nio.file.Files.isDirectory(p)) {
          val children = java.nio.file.Files.list(p)
          val empty = try !children.iterator().hasNext finally children.close()
          if (empty) java.nio.file.Files.deleteIfExists(p)
        }
      }
    }
    doomed
  }
}

object GraftTable {

  private val SchemaFile = "_graft_schema.json"

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
    * scan-sized at every table size — and under [[GraftTable.mergeScoped]]
    * it sizes by the REWRITTEN SLICE, so a trickle tick lands a few
    * small files, not a snapshot-wide fan. Capped only by Int.MaxValue —
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

  /** A manifest `path` (the `file:` URI input_file_name emits) as a
    * local filesystem path, for vacuum's reference checks.
    */
  private def toLocalPath(p: String): java.nio.file.Path =
    if (p.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(p))
    else java.nio.file.Paths.get(p)

  /** All fields read-nullable — what a parquet scan yields anyway, and
    * what lets an explicit-schema read backfill evolved columns.
    */
  private def nullable(schema: StructType): StructType =
    StructType(schema.fields.map(_.copy(nullable = true)))

  /** Write one version's data files: range-partitioned + sorted on the
    * key, so each file spans a tight contiguous key range — what makes
    * the manifest selective.
    */
  private def writeFiles(s: SparkSession, vdir: String, key: String,
      df: DataFrame): Unit =
    df.repartitionByRange(versionFan(df), col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).parquet(vdir)

  /** Per-file (path, key_lo, key_hi, n_rows) stats for the files under
    * `vdir`, derived in one `input_file_name()`-grouped scan. The
    * explicit schema keeps an EMPTY version (a tick that deleted every
    * touched row and inserted none) readable — zero files, zero rows.
    */
  private def fileStats(s: SparkSession, vdir: String, key: String,
      schema: StructType): DataFrame =
    s.read.schema(nullable(schema)).parquet(vdir)
      .groupBy(input_file_name().as("path"))
      .agg(min(key).as("key_lo"), max(key).as("key_hi"),
           count(lit(1)).as("n_rows"))

  private def writeSchema(dir: String, v: Int, schema: StructType): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, s"v$v", SchemaFile),
      nullable(schema).json)

  /** Land one FULL version: data files, manifest, schema — all before
    * the caller's commit marker, so a crash anywhere leaves an
    * uncommitted (invisible) version, never a committed version missing
    * its metadata. The range exchange is the cost of tight stats; at
    * trickle-tick rates [[GraftTable.mergeScoped]] is the path that
    * skips it.
    */
  private def landVersion(s: SparkSession, dir: String, v: Int,
      key: String, df: DataFrame): Unit = {
    val vdir = s"$dir/v$v"
    writeFiles(s, vdir, key, df)
    fileStats(s, vdir, key, df.schema)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$vdir/_manifest")
    writeSchema(dir, v, df.schema)
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
