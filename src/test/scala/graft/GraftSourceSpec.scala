package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake
import graft.sources.{GraftSource, GraftTable, Tables}

/** The `format("graft")` connector (l19/l20) and metadata-only restore
  * (l21) — the contract pieces the gate hashes can't carry: the pushed
  * key filter must actually NARROW the admitted file list (not just
  * return correct rows), time travel options must resolve like the
  * facade, write modes must map to the documented lake semantics, and a
  * restore must move ZERO data bytes while surviving vacuum through the
  * reference-aware sweep.
  */
class GraftSourceSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  private def collectSorted(df: DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.toString).toSeq

  private def docs: DataFrame =
    Tables.documents(spark, sfDir).select("doc_id", "source", "text")

  test("read parity, pushed-filter file pruning, projection, time travel") {
    val dir = tmp("src_read")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    t.merge(Lake.cdcChangelog(t.read()))

    def load(opts: (String, String)*): DataFrame = {
      val r = spark.read.format("graft")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(s"$dir/tbl")
    }

    // current version == facade read, verbatim
    assert(collectSorted(load()) == collectSorted(t.read()))
    // versionAsOf == facade time travel (pre-merge snapshot)
    assert(collectSorted(load("versionAsOf" -> "0")) ==
      collectSorted(t.readAsOf(0)))
    // timestampAsOf resolves via the commit markers: v0's own commit
    // instant must read v0 (merge committed strictly later — creation
    // and merge each land multi-second Spark jobs between markers)
    val t0 = t.history().filter(col("version") === 0)
      .select("committed_at").head().getString(0)
    assert(collectSorted(load("timestampAsOf" -> t0)) ==
      collectSorted(t.readAsOf(0)))
    intercept[java.util.NoSuchElementException] {
      t.versionAt(java.time.Instant.parse(t0).minusSeconds(3600))
    }
    intercept[IllegalArgumentException] {
      load("versionAsOf" -> "0", "timestampAsOf" -> t0).collect()
    }

    // a selective key range must prune files at the manifest, and the
    // answer must equal the unpruned filter
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    var pruned = (-1, -1)
    GraftSource.onPrune = (_, a, n) => pruned = (a, n)
    try {
      val narrow = load().filter(col("doc_id") >= 0 &&
        col("doc_id") < mx / 8).select("doc_id", "source")
      val expected = t.read().filter(col("doc_id") >= 0 &&
        col("doc_id") < mx / 8).select("doc_id", "source")
      assert(collectSorted(narrow) == collectSorted(expected))
      val (admitted, total) = pruned
      assert(total >= GraftTable.VersionFilesFloor,
        s"version fan unexpectedly small: $total")
      assert(admitted > 0 && admitted < total,
        s"pushed key range did not prune: $admitted of $total files")

      // an impossible range admits nothing and returns empty with schema
      pruned = (-1, -1)
      val none = load().filter(col("doc_id") > mx + 2000000000L)
      assert(none.count() == 0 && pruned._1 == 0)
      assert(none.schema.fieldNames.toSeq == Seq("doc_id", "source", "text"))
    } finally GraftSource.onPrune = GraftSource.NoopPrune

    // filters the manifest can't serve (non-span column) stay correct
    val bySource = load().filter(col("source") === "web")
    assert(collectSorted(bySource) ==
      collectSorted(t.read().filter(col("source") === "web")))
  }

  test("write modes: create, append=upsert, overwrite=replace, guards") {
    val dir = tmp("src_write")
    val path = s"$dir/tbl"

    // first write (any mode) creates version 0
    docs.write.format("graft").mode(SaveMode.Overwrite).save(path)
    val t = GraftTable.open(spark, path)
    assert(t.versions == Seq(0))
    assert(collectSorted(t.read()) == collectSorted(docs))

    // append is a keyed upsert: revised + fresh rows, deletes untouched
    val ups = Lake.cdcChangelog(docs).filter(col("op") === "U").drop("op")
    ups.write.format("graft").mode(SaveMode.Append).save(path)
    assert(t.versions == Seq(0, 1))
    assert(collectSorted(t.read()) ==
      collectSorted(Lake.cdcMerge(docs, ups.withColumn("op", lit("U")))))

    // overwrite on an existing table lands a fresh full version; old
    // versions stay time-travelable
    val fresh = docs.filter(col("doc_id") % 3 === 0)
    fresh.write.format("graft").mode(SaveMode.Overwrite).save(path)
    assert(t.versions == Seq(0, 1, 2))
    assert(collectSorted(t.read()) == collectSorted(fresh))
    assert(collectSorted(t.readAsOf(0)) == collectSorted(docs))

    // ErrorIfExists is loud; Ignore is a no-op
    intercept[IllegalStateException] {
      docs.write.format("graft").mode(SaveMode.ErrorIfExists).save(path)
    }
    docs.write.format("graft").mode(SaveMode.Ignore).save(path)
    assert(t.versions == Seq(0, 1, 2))

    // an upsert missing a current column fails loudly (the facade's
    // no-silent-drops contract surfaces through the connector)
    intercept[IllegalArgumentException] {
      ups.drop("source").write.format("graft")
        .mode(SaveMode.Append).save(path)
    }
  }

  test("SQL surface: CREATE TABLE USING graft, query via spark.sql") {
    val dir = tmp("src_sql")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    t.merge(Lake.cdcChangelog(t.read()))
    spark.sql(s"CREATE TABLE graft_sql_tbl USING graft " +
      s"OPTIONS (path '$dir/tbl', key 'doc_id')")
    try {
      val viaSql = spark.sql(
        "SELECT doc_id, source FROM graft_sql_tbl WHERE doc_id < 100")
      assert(collectSorted(viaSql) == collectSorted(
        t.read().filter(col("doc_id") < 100).select("doc_id", "source")))
    } finally spark.sql("DROP TABLE graft_sql_tbl")
  }

  test("DML: delete/update semantics, old-row swap, scoped cost, guards") {
    val dir = tmp("src_dml")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)

    t.delete(col("doc_id") % 7 === 2)
    assert(collectSorted(t.read()) ==
      collectSorted(docs.filter(!(col("doc_id") % 7 === 2))))

    // update evaluates every SET expression against the OLD row: a
    // swap must actually swap, not chain
    val dir2 = tmp("src_dml_swap")
    val two = spark.range(2).select(col("id").as("doc_id"),
      lit("a").as("x"), lit("b").as("y"))
    val ts = GraftTable.open(spark,
      { two.write.format("graft").save(s"$dir2/tbl"); s"$dir2/tbl" })
    ts.update(lit(true), Map("x" -> col("y"), "y" -> col("x")))
    val r = ts.read().orderBy("doc_id").collect()
    assert(r.forall(row => row.getString(1) == "b" && row.getString(2) == "a"))

    // a selective update is SCOPED: untouched files carry forward
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val v = t.update(col("doc_id") < mx / 8,
      Map("text" -> concat(col("text"), lit("!"))))
    val h = t.history().filter(col("version") === v).head()
    assert(h.getLong(h.fieldIndex("carried_files")) > 0,
      "selective update rewrote every file — not scoped")
    assert(collectSorted(t.read()) == collectSorted(
      docs.filter(!(col("doc_id") % 7 === 2))
        .withColumn("text", when(col("doc_id") < mx / 8,
          concat(col("text"), lit("!"))).otherwise(col("text")))))

    // loud guards: key rewrite and unknown column
    intercept[IllegalArgumentException] {
      t.update(lit(true), Map("doc_id" -> (col("doc_id") + 1)))
    }
    intercept[IllegalArgumentException] {
      t.update(lit(true), Map("nope" -> lit(1)))
    }
  }

  test("CDF options, SQL INSERT INTO/OVERWRITE, CTAS, time-travel guard") {
    val dir = tmp("src_sqldml")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    t.merge(Lake.cdcChangelog(t.read()))

    // readChangeFeed == the facade's changes(), row for row
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(s"$dir/tbl")
    assert(feed.collect().map(_.toString).sorted.toSeq ==
      t.changes(0, 1).collect().map(_.toString).sorted.toSeq)
    intercept[IllegalArgumentException] { // startingVersion is required
      spark.read.format("graft").option("readChangeFeed", "true")
        .load(s"$dir/tbl")
    }

    spark.sql(s"CREATE TABLE g_dml USING graft " +
      s"OPTIONS (path '$dir/tbl', key 'doc_id')")
    try {
      // INSERT INTO = keyed upsert (fresh keys grow the table)
      val before = t.read().count()
      val adds = spark.sql(
        "SELECT count(*) FROM g_dml WHERE doc_id < 50").head().getLong(0)
      assert(adds > 0)
      spark.sql("INSERT INTO g_dml SELECT doc_id + 5000000 AS doc_id, " +
        "source, text FROM g_dml WHERE doc_id < 50")
      assert(t.read().count() == before + adds)

      // INSERT OVERWRITE = whole-table replace, history preserved
      // (refresh first: the catalog caches the pre-insert relation, and
      // the SELECT source should read the current version)
      spark.catalog.refreshTable("g_dml")
      spark.sql("INSERT OVERWRITE g_dml SELECT * FROM g_dml " +
        "WHERE doc_id < 100")
      assert(t.read().count() ==
        t.readAsOf(t.currentVersion - 1)
          .filter(col("doc_id") < 100).count())

      // CTAS lands a new graft table
      spark.catalog.refreshTable("g_dml")
      spark.sql(s"CREATE TABLE g_ctas USING graft " +
        s"OPTIONS (path '$dir/ctas', key 'doc_id') " +
        "AS SELECT doc_id, source FROM g_dml")
      try {
        val made = GraftTable.open(spark, s"$dir/ctas")
        assert(collectSorted(made.read()) ==
          collectSorted(t.read().select("doc_id", "source")))
      } finally spark.sql("DROP TABLE g_ctas")

      // writes through a time-travel relation refuse loudly
      spark.sql(s"CREATE TABLE g_past USING graft OPTIONS " +
        s"(path '$dir/tbl', key 'doc_id', versionAsOf '0')")
      try {
        val e = intercept[Exception] {
          spark.sql("INSERT INTO g_past SELECT * FROM g_dml LIMIT 1")
        }
        assert(e.getMessage.contains("time-travel"))
      } finally spark.sql("DROP TABLE g_past")
    } finally spark.sql("DROP TABLE g_dml")
  }

  test("mergeConcurrent: deterministic race, rebase, token metadata, vacuum") {
    val dir = tmp("src_occ")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    val log = Lake.cdcChangelog(t.read())
    val evens = log.filter(col("doc_id") % 2 === 0)
    val odds = log.filter(col("doc_id") % 2 === 1)

    // writer B completes INSIDE writer A's commit window (the seam
    // fires right before A's create-exclusive): A must lose v1, rebase
    // onto B's result, and land v2 — both changelogs applied
    var fired = false
    GraftTable.onBeforeCommit = (_, v) =>
      if (v == 1 && !fired) { fired = true; t.mergeConcurrent(odds) }
    try assert(t.mergeConcurrent(evens) == 2)
    finally GraftTable.onBeforeCommit = (_, _) => ()
    assert(t.versions == Seq(0, 1, 2))
    assert(collectSorted(t.read()) ==
      collectSorted(Lake.cdcMerge(Lake.cdcMerge(docs, odds), evens)))

    // token'd metadata resolves through the marker for every reader:
    // time travel, diff, changes, history
    assert(collectSorted(t.readAsOf(1)) ==
      collectSorted(Lake.cdcMerge(docs, odds)))
    assert(t.diff(1, 2).count() > 0)
    assert(t.changes(0, 2).count() > 0)
    val h = t.history().orderBy("version").collect()
    assert(h.length == 3 && h.forall(_.getLong(2) > 0)) // n_files
    // the loser's staged debris was cleaned up: v1 and v2 hold exactly
    // one token'd data dir + manifest + schema each
    Seq(1, 2).foreach { v =>
      val names = new java.io.File(s"$dir/tbl/v$v").listFiles()
        .map(_.getName).filterNot(_.startsWith("."))
      assert(names.count(_.startsWith("d_t")) == 1, names.mkString(","))
      assert(names.count(_.startsWith("_manifest_t")) == 1)
    }

    // DML and single-writer merges compose on top of OCC versions
    t.delete(col("doc_id") % 5 === 0)
    assert(t.currentVersion == 3)

    // vacuum retires OCC versions cleanly (token'd manifests/schemas
    // swept with them; the retained patchwork still reads)
    val expected = collectSorted(t.read())
    t.compact()
    t.vacuum(keep = 1)
    assert(collectSorted(t.read()) == expected)

    // a torn commit payload (marker exists, terminator never landed —
    // a committer that died mid-write) is loud after the bounded spin,
    // never mis-parsed as a token-less commit
    val tornDir = tmp("src_torn")
    val torn = GraftTable.create(spark, s"$tornDir/tbl", docs.limit(10))
    // tear through the Hadoop FS (not nio) so the local-FS checksum
    // sidecar stays consistent — the failure under test is the missing
    // terminator, not a corrupt-file ChecksumException
    val tornFs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"file:$tornDir"), spark.sparkContext.hadoopConfiguration)
    val tornOut = tornFs.create(new org.apache.hadoop.fs.Path(
      s"$tornDir/tbl/v0/_GRAFT_COMMITTED"), true)
    tornOut.write("2026-08-16T00:00:00Z\n".getBytes("UTF-8"))
    tornOut.close()
    val tornE = intercept[IllegalStateException] { torn.read() }
    assert(tornE.getMessage.contains("never completed"))

    // retry exhaustion is loud, with the race loss as cause
    var inSeam = false
    GraftTable.onBeforeCommit = (_, _) =>
      if (!inSeam) { // a rival steals EVERY version this writer tries
        inSeam = true
        try t.merge(Lake.cdcChangelog(t.read())) finally inSeam = false
      }
    try {
      val e = intercept[IllegalStateException] {
        // fresh plan: `evens` was planned over v0's files, which the
        // vacuum above retired (reading it now fails loudly by design)
        t.mergeConcurrent(Lake.cdcChangelog(t.read()), maxAttempts = 2)
      }
      assert(e.getMessage.contains("gave up after 2"))
    } finally GraftTable.onBeforeCommit = (_, _) => ()
  }

  test("shallow clone: zero-copy, two-way isolation, hazard + immunization") {
    val dir = tmp("src_clone")
    val src = GraftTable.create(spark, s"$dir/src", docs)
    src.merge(Lake.cdcChangelog(src.read()))
    val atClone = collectSorted(src.read())

    val a = src.cloneTo(s"$dir/cloneA")
    val b = src.cloneTo(s"$dir/cloneB")
    intercept[IllegalArgumentException] { src.cloneTo(s"$dir/cloneA") }

    // zero-copy: the clone directory holds only metadata
    val v0files = new java.io.File(s"$dir/cloneA/v0").listFiles()
      .map(_.getName).filterNot(_.startsWith("."))
    assert(v0files.toSet == Set("_manifest", "_graft_schema.json",
      "_GRAFT_COMMITTED"), v0files.mkString(","))
    assert(collectSorted(a.read()) == atClone)

    // two-way isolation: clone DML invisible to source and vice versa
    // (key-LOCAL delete: the scoped tick rewrites only the low-key
    // files, so the clone keeps carrying references into the source —
    // the hazard leg below needs them to still exist)
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    a.delete(col("doc_id") < mx / 8)
    assert(collectSorted(src.read()) == atClone)
    src.merge(Lake.cdcChangelog(src.read()))
    assert(collectSorted(a.read()) ==
      collectSorted(a.readAsOf(1))) // clone chain unmoved by src merge

    // B compacts (materializes — zero cross-table references)...
    b.compact()
    b.vacuum(keep = 1)
    val bContent = collectSorted(b.read())
    // ...then the source compacts and vacuums its whole history away
    src.compact()
    src.vacuum(keep = 1)
    // the un-materialized clone now fails LOUDLY (its files are gone),
    val aFail = intercept[Exception] { a.read().collect() }
    assert(aFail.getMessage.contains("does not exist") ||
      aFail.getMessage.contains("FILE_NOT_EXIST"),
      s"expected a loud missing-file failure, got: ${aFail.getMessage}")
    // ...while the materialized clone is immune
    assert(collectSorted(b.read()) == bContent)
  }

  test("restore is metadata-only, auditable, and vacuum-safe") {
    val dir = tmp("src_restore")
    val t = GraftTable.create(spark, s"$dir/tbl", docs)
    t.merge(Lake.cdcChangelog(t.read()))

    val v2 = t.restore(0)
    assert(v2 == 2)
    // content: the rollback IS version 0
    assert(collectSorted(t.read()) == collectSorted(t.readAsOf(0)))
    // metadata-only: the restore version directory holds no data files
    val v2files = new java.io.File(s"$dir/tbl/v2").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")) // hadoop .crc sidecars
    assert(v2files.toSet == Set("_manifest", "_graft_schema.json",
      "_GRAFT_COMMITTED"), s"restore wrote data: ${v2files.mkString(",")}")
    // every manifest row is a carried reference (history agrees)
    val h = t.history().filter(col("version") === 2).head()
    assert(h.getLong(h.fieldIndex("n_files")) ==
      h.getLong(h.fieldIndex("carried_files")))
    // the rolled-back state stays auditable: the v1->v2 feed undoes v0->v1
    val fwd = t.changes(0, 1).filter(col("_change_type") === "insert").count()
    val undo = t.changes(1, 2).filter(col("_change_type") === "delete").count()
    assert(fwd == undo && fwd > 0)

    // vacuum(keep=2) retires v0, but v2 still references its files:
    // the reference-aware sweep must keep them and the table must read
    assert(t.vacuum(keep = 2) == Seq(0))
    assert(collectSorted(t.read()) == collectSorted(docs))
    intercept[java.util.NoSuchElementException] { t.restore(0) }

    // restore composes with later merges and compaction
    t.merge(Lake.cdcChangelog(t.read()))
    t.compact()
    t.vacuum(keep = 1)
    assert(collectSorted(t.read()) ==
      collectSorted(Lake.cdcMerge(docs, Lake.cdcChangelog(docs))))
  }
}
