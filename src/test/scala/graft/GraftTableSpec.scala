package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake
import graft.sources.{GraftTable, Tables}

/** GraftTable (l11) — the contract pieces the gate hash can't carry:
  * loud failures for vacuumed/nonexistent versions, byte-stable
  * retained versions through vacuum, torn (uncommitted) version
  * directories invisible to readers and recovered by the next merge,
  * and idempotent vacuum.
  */
class GraftTableSpec extends AnyFunSuite with SparkFixture {

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.toString).toSeq

  private def fileState(dir: String): Map[String, (Long, String)] = {
    val base = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map[String, (Long, String)]()
    java.nio.file.Files.walk(base).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        val md = java.security.MessageDigest.getInstance("MD5")
        out(base.relativize(p).toString) =
          (bytes.length.toLong,
           md.digest(bytes).map("%02x".format(_)).mkString)
      }
    }
    out.toMap
  }

  test("version chain, time travel, loud retention, torn-dir recovery") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbl").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")

    val t = GraftTable.create(spark, dir, docs)
    assert(t.versions == Seq(0) && t.currentVersion == 0)

    val log = Lake.cdcChangelog(t.read())
    val even = log.filter(pmod(col("doc_id"), lit(2)) === 0)
    val odd = log.filter(pmod(col("doc_id"), lit(2)) === 1)
    assert(t.merge(even) == 1)
    assert(t.merge(odd) == 2)
    assert(t.versions == Seq(0, 1, 2))

    // time travel reproduces every committed state
    assert(collectSorted(t.readAsOf(0)) == collectSorted(docs))
    assert(collectSorted(t.readAsOf(1)) ==
      collectSorted(Lake.cdcMerge(docs, even)))
    assert(collectSorted(t.readAsOf(2)) == collectSorted(t.read()))
    assert(collectSorted(t.read()) ==
      collectSorted(Lake.cdcMerge(Lake.cdcMerge(docs, even), odd)))

    // retained versions are byte-identical through vacuum
    val before = Seq(1, 2).map(v => fileState(s"$dir/v$v"))
    assert(t.vacuum(keep = 2) == Seq(0))
    assert(Seq(1, 2).map(v => fileState(s"$dir/v$v")) == before,
      "vacuum touched retained version bytes")
    assert(t.versions == Seq(1, 2))

    // vacuumed read fails loudly and names retention
    val gone = intercept[java.util.NoSuchElementException](t.readAsOf(0))
    assert(gone.getMessage.contains("vacuum") &&
           gone.getMessage.contains("v1"),
      s"retention failure message unhelpful: ${gone.getMessage}")
    // never-committed read names the committed range
    val missing = intercept[java.util.NoSuchElementException](t.readAsOf(7))
    assert(missing.getMessage.contains("[1, 2]"),
      s"missing-version message unhelpful: ${missing.getMessage}")

    // vacuum is idempotent
    assert(t.vacuum(keep = 2).isEmpty)

    // a torn (crashed, uncommitted) version directory is invisible...
    docs.limit(3).write.parquet(s"$dir/v3")
    assert(t.versions == Seq(1, 2) && t.currentVersion == 2)
    intercept[java.util.NoSuchElementException](t.readAsOf(3))
    // ...and the next merge overwrites it with a real committed v3
    assert(t.merge(odd.limit(0).select(log.columns.map(col): _*)) == 3)
    assert(t.versions == Seq(1, 2, 3))
    assert(collectSorted(t.readAsOf(3)) == collectSorted(t.readAsOf(2)))

    // open() on the populated dir sees the same chain; on an empty dir
    // it refuses loudly
    assert(GraftTable.open(spark, dir).currentVersion == 3)
    val empty = java.nio.file.Files.createTempDirectory("graft_tbl_e").toString
    intercept[IllegalStateException](GraftTable.open(spark, empty))

    Lake.deleteTree(java.nio.file.Paths.get(dir))
    Lake.deleteTree(java.nio.file.Paths.get(empty))
  }

  test("manifest-planned range reads prune to admitted files, per version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbl_m").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    val t = GraftTable.create(spark, dir, docs)
    t.merge(Lake.cdcChangelog(t.read()))

    for (v <- Seq(0, 1)) {
      // answer identity: the planned read equals the full read filtered
      val ranged = t.readRangeAsOf(v, 100L, 350L)
      assert(ranged.count() > 0, s"v$v: empty range read; spec is vacuous")
      assert(collectSorted(ranged) ==
        collectSorted(t.readAsOf(v)
          .filter(col("doc_id") >= 100 && col("doc_id") < 350)),
        s"v$v: manifest-planned range read changed the answer")

      // plan identity: the executed scan opened ONLY manifest-admitted
      // files, and the admission actually pruned (selective manifest)
      val all = t.readAsOf(v).inputFiles.toSet
      val admitted = spark.read.parquet(s"$dir/v$v/_manifest")
        .filter(col("key_hi") >= 100 && col("key_lo") < 350)
        .select("path").collect().map(_.getString(0)).toSet
      val opened = ranged.inputFiles.toSet
      assert(opened.subsetOf(admitted),
        s"v$v: scan opened ${opened -- admitted} beyond the manifest admission")
      assert(admitted.size < all.size,
        s"v$v: manifest admitted all ${all.size} files; pruning is vacuous")

      // the manifest is data-read-invisible (underscore prefix) and
      // covers every data file exactly once
      val manifest = spark.read.parquet(s"$dir/v$v/_manifest")
      assert(manifest.select("path").collect().map(_.getString(0)).toSet
        == all, s"v$v: manifest paths != data files")
      assert(all.forall(!_.contains("_manifest")),
        s"v$v: data read saw manifest files")
    }

    // empty admission: empty frame, table schema intact
    val none = t.readRange(100000000L, 100000001L)
    assert(none.columns.toSeq == t.read().columns.toSeq)
    assert(none.count() == 0)

    Lake.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("the version fan scales with snapshot size above the floor") {
    // gate-scale snapshots land at the 8-file floor (a degenerate
    // 1-file version would make the manifest unprunable); a snapshot
    // whose Catalyst size estimate exceeds floor x 128 MB fans wider —
    // the 100-TB property, checked on stats alone (no job runs)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    assert(GraftTable.versionFan(docs) == GraftTable.VersionFilesFloor)
    // a snapshot whose stats say ~2.4 GB (range: 8 bytes/row, exact
    // Catalyst estimate) must fan to ~19 files of ~128 MB
    val big = spark.range(300L << 20).toDF("doc_id")
    val fan = GraftTable.versionFan(big)
    assert(fan > GraftTable.VersionFilesFloor,
      s"a 2.4 GB snapshot still fanned to $fan files")
    val expect = (big.queryExecution.optimizedPlan.stats.sizeInBytes /
      GraftTable.TargetFileBytes).toInt
    assert(fan == math.max(GraftTable.VersionFilesFloor, expect))
  }

  test("mergeAs: replay-convergent versioned merges for streaming writers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbl_s").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    val t = GraftTable.create(spark, dir, docs)
    val log = Lake.cdcChangelog(t.read())
    val even = log.filter(pmod(col("doc_id"), lit(2)) === 0)
    val odd = log.filter(pmod(col("doc_id"), lit(2)) === 1)

    // batch 0 -> v1, batch 1 -> v2 (the streaming foreachBatch shape)
    assert(t.mergeAs(even, 1) == 1)
    assert(t.mergeAs(odd, 2) == 2)
    val v2 = collectSorted(t.readAsOf(2))

    // checkpoint REPLAY of batch 0: same version, same base, same input
    // — overwrites v1 convergently and leaves v2 untouched
    assert(t.mergeAs(even, 1) == 1)
    assert(t.versions == Seq(0, 1, 2))
    assert(collectSorted(t.readAsOf(1)) ==
      collectSorted(Lake.cdcMerge(docs, even)))
    assert(collectSorted(t.readAsOf(2)) == v2)

    // torn replay: v1's marker gone (crash between data and marker) —
    // the version disappears from every reader until a replay finishes it
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, "v1", "_GRAFT_COMMITTED"))
    assert(t.versions == Seq(0, 2))
    intercept[java.util.NoSuchElementException](t.readAsOf(1))
    assert(t.mergeAs(even, 1) == 1)
    assert(t.versions == Seq(0, 1, 2))

    // a skipped offset is a stream bug, not a silent gap
    intercept[IllegalArgumentException](t.mergeAs(odd, 9))

    Lake.deleteTree(java.nio.file.Paths.get(dir))
  }
}
