package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake
import graft.sources.{GraftTable, Tables}

/** MERGE INTO (l26) — the contract pieces the gate hash can't carry:
  * first-match-wins clause ordering, the loud guards (multi-row source,
  * key rewrite, insertAll with missing columns, unknown SET column),
  * scoped-ness of a selective merge, and clause-condition semantics
  * (a NULL condition is not-applied, SQL CHECK-style).
  */
class MergeIntoSpec extends AnyFunSuite with SparkFixture {

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.toString).toSeq

  private def freshDocs() =
    Tables.documents(spark, sfDir).select("doc_id", "source", "text")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_mi").toString

  test("three-clause merge equals the logical replay") {
    val docs = freshDocs()
    val t = GraftTable.create(spark, tmp(), docs)
    val b = graft.operators.Dedup.splitBucket(col("doc_id"))
    val src = docs.filter(b < 8)
      .select(col("doc_id"), col("source"), col("text"),
        lit("del").as("action"))
      .unionByName(docs.filter(b >= 8 && b < 16)
        .select(col("doc_id"), col("source"), col("text"),
          lit("upd").as("action")))
      .unionByName(docs.filter(b >= 16 && b < 24)
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
          col("source"), concat(col("text"), lit(" (new)")).as("text"),
          lit("ins").as("action")))
    val v = t.mergeInto(src)
      .whenMatchedDelete("s.action = 'del'")
      .whenMatchedUpdate(Map("text" -> "concat(t.text, ' (rev 2)')"),
        "s.action = 'upd'")
      .whenNotMatchedInsertAll()
      .execute()
    assert(v == 1)

    // the logical replay: the op-tagged changelog the clauses encode
    val expected = Lake.cdcMerge(docs, Lake.cdcChangelog(docs))
    assert(collectSorted(t.read().select("doc_id", "source", "text")) ==
      collectSorted(expected))
    // evolution: the source-only column landed; pre-existing rows null,
    // inserted rows carry the source value
    val acts = t.read().groupBy("action").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(acts.keySet == Set(None, Some("ins")))
    assert(acts(Some("ins")) ==
      docs.filter(b >= 16 && b < 24).count())
  }

  test("first-match-wins: clause order decides a doubly-matching row") {
    val docs = freshDocs()
    val src = docs.limit(50).select(col("doc_id"), col("source"),
      col("text"), lit(true).as("both"))

    // delete first: the rows go
    val t1 = GraftTable.create(spark, tmp(), docs)
    t1.mergeInto(src).whenMatchedDelete("s.both")
      .whenMatchedUpdate(Map("text" -> "'clobbered'"), "s.both")
      .execute()
    assert(t1.read().count() == docs.count() - 50)

    // update first on the same input: the rows stay, rewritten
    val t2 = GraftTable.create(spark, tmp(), docs)
    t2.mergeInto(src)
      .whenMatchedUpdate(Map("text" -> "'clobbered'"), "s.both")
      .whenMatchedDelete("s.both")
      .execute()
    assert(t2.read().count() == docs.count())
    assert(t2.read().filter(col("text") === "clobbered").count() == 50)
  }

  test("update SET sees the OLD row and the source row") {
    val docs = freshDocs()
    val t = GraftTable.create(spark, tmp(), docs)
    val src = docs.limit(20)
      .select(col("doc_id"), lit(" +s").as("suffix"))
    t.mergeInto(src)
      .whenMatchedUpdate(Map("text" -> "concat(t.text, s.suffix)"))
      .execute()
    val joined = t.read().alias("r")
      .join(docs.alias("d"), "doc_id")
      .join(src.select("doc_id"), Seq("doc_id"), "left_semi")
    assert(joined.filter(col("r.text") =!=
      concat(col("d.text"), lit(" +s"))).count() == 0)
  }

  test("a selective merge is SCOPED and a NULL condition does not apply") {
    val docs = freshDocs()
    val t = GraftTable.create(spark, tmp(), docs)
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    // nullWhen is NULL for every row: SQL CHECK-style, the clause
    // must NOT fire — rows survive to the second clause
    val src = docs.filter(col("doc_id") < mx / 8)
      .select(col("doc_id"), col("source"), col("text"),
        lit(null).cast("boolean").as("nullWhen"))
    val v = t.mergeInto(src)
      .whenMatchedDelete("s.nullWhen")
      .whenMatchedUpdate(Map("text" -> "concat(t.text, '!')"))
      .execute()
    val h = t.history().filter(col("version") === v).head()
    assert(h.getLong(h.fieldIndex("carried_files")) > 0,
      "selective mergeInto rewrote every file — not scoped")
    assert(t.read().count() == docs.count(), "the NULL clause deleted")
    assert(t.read().filter(col("text").endsWith("!")).count() ==
      src.count())
  }

  test("insert-only and update-only merges work without other clauses") {
    val docs = freshDocs()
    val t = GraftTable.create(spark, tmp(), docs)
    val fresh = docs.limit(10)
      .select((col("doc_id") + lit(2000000000L)).as("doc_id"),
        col("source"), col("text"))
    t.mergeInto(fresh).whenNotMatchedInsertAll().execute()
    assert(t.read().count() == docs.count() + 10)
    // update-only: unmatched source rows are ignored (a key shift into
    // a disjoint range matches nothing)
    t.mergeInto(fresh.withColumn("doc_id", col("doc_id") + 1000000000L))
      .whenMatchedUpdate(Map("text" -> "'x'")).execute()
    assert(t.read().filter(col("text") === "x").count() == 0)
  }

  test("loud guards") {
    val docs = freshDocs()
    val t = GraftTable.create(spark, tmp(), docs)
    val src = docs.limit(5).select("doc_id", "source", "text")
    // multiple source rows per key
    val e1 = intercept[IllegalArgumentException] {
      t.mergeInto(src.unionByName(src))
        .whenMatchedUpdate(Map("text" -> "t.text")).execute()
    }
    assert(e1.getMessage.contains("multiple rows"))
    // SET rewrites the key
    intercept[IllegalArgumentException] {
      t.mergeInto(src).whenMatchedUpdate(Map("doc_id" -> "0"))
    }
    // insertAll with a source missing a table column
    val e3 = intercept[IllegalArgumentException] {
      t.mergeInto(src.drop("text")).whenNotMatchedInsertAll().execute()
    }
    assert(e3.getMessage.contains("missing table column"))
    // SET names a column nobody carries
    intercept[IllegalArgumentException] {
      t.mergeInto(src).whenMatchedUpdate(Map("nope" -> "1")).execute()
    }
    // no clauses at all
    intercept[IllegalArgumentException] { t.mergeInto(src).execute() }
    // CHECK constraints gate the derived changelog like any merge
    t.addConstraint("text_nonempty", "length(text) > 0")
    val e6 = intercept[IllegalArgumentException] {
      t.mergeInto(src).whenMatchedUpdate(Map("text" -> "''")).execute()
    }
    assert(e6.getMessage.contains("text_nonempty"))
  }
}
