package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake

/** c02_jsonl_quarantine — the side the gate hash can't see: the
  * quarantine holds EXACTLY the damaged lines (both damage classes,
  * keyed and verbatim, plus every free-floating non-JSON line) and
  * nothing clean leaks in. Plus the hand-built parse branches where
  * JSON differs from CSV: a type mismatch in a NESTED field corrupts
  * the whole record, a missing field is legal schema-on-read (null,
  * not corrupt), extra unknown fields are ignored.
  */
class JsonQuarantineSpec extends AnyFunSuite with SparkFixture {

  test("quarantine reconciles against the gate derivation") {
    val clean = SparkEntry.queries("c02_jsonl_quarantine")(spark, sfDir)
    val cleanKeys = clean.collect().map(_.getLong(0)).toSet
    val base = Lake.scratch("c02", sfDir)
    val (_, quarantine) = Lake.jsonQuarantineRead(spark, s"$base/jsonl")
    val qLines = quarantine.collect().map(_.getString(0)).toSeq

    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        graft.operators.Dedup.splitBucket(col("o_orderkey")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(cleanKeys == orders.filter(_._2 >= 4).map(_._1).toSet,
      "clean side must be exactly the undamaged orders")
    val truncated = orders.filter(_._2 < 2).map(_._1).toSet
    val qTruncated = qLines.filter(_.startsWith("{\"order\":{\"key\":"))
      .filterNot(_.contains("DMG"))
      .map(_.stripPrefix("{\"order\":{\"key\":").toLong).toSet
    assert(qTruncated == truncated,
      "every truncated object must quarantine verbatim")
    val typeGarbage = orders.filter(b => b._2 >= 2 && b._2 < 4).map(_._1).toSet
    assert(qLines.count(_.contains("\"key\":\"DMG\"")) == typeGarbage.size,
      "every nested-type-garbage record must quarantine")
    assert(qLines.count(_.startsWith("### not json")) == 7,
      "all free-floating non-JSON lines must quarantine")
    assert(qLines.size == truncated.size + typeGarbage.size + 7,
      "nothing else may land in quarantine")
  }

  test("parse-branch semantics: record-corrupt vs legal-null vs ignored-extra") {
    val dir = java.nio.file.Files.createTempDirectory("c02spec")
    java.nio.file.Files.writeString(dir.resolve("part.jsonl"),
      Seq(
        """{"order":{"key":1,"cust":10},"status":"O"}""",        // clean
        """{"order":{"key":"bad","cust":11},"status":"O"}""",    // nested type mismatch -> whole record quarantines
        """{"order":{"key":2},"status":"F"}""",                  // missing field -> legal null, NOT corrupt
        """{"order":{"key":3,"cust":13},"status":"P","x":9}""",  // unknown extra field -> ignored, clean
        """{"order":{"key":4,"cust":14"""                        // truncated -> quarantine
      ).mkString("\n"))
    val (clean, quarantine) = Lake.jsonQuarantineRead(spark, dir.toString)
    val c = clean.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
                 r.getString(2)))
      .sortBy(_._1).toSeq
    assert(c == Seq((1L, 10L, "O"), (2L, -1L, "F"), (3L, 13L, "P")),
      s"clean side wrong: $c")
    val q = quarantine.collect().map(_.getString(0)).sorted.toSeq
    assert(q == Seq("""{"order":{"key":"bad","cust":11},"status":"O"}""",
                    """{"order":{"key":4,"cust":14"""),
      s"quarantine side wrong: $q")
  }
}
