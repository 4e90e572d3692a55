package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake

/** c01_csv_quarantine — the side the gate hash can't see: the
  * quarantine table holds EXACTLY the damaged lines (every mangled
  * order, every free-floating garbage line), verbatim, and nothing
  * clean leaks into it. Plus the hand-built parse-branch cases:
  * type garbage quarantines, an under-length row null-fills (Spark's
  * documented CSV semantics — it is NOT malformed), an over-length
  * row quarantines.
  */
class CsvQuarantineSpec extends AnyFunSuite with SparkFixture {

  test("quarantine reconciles against the gate derivation") {
    // run the gate entry first so the staged file exists
    val clean = SparkEntry.queries("c01_csv_quarantine")(spark, sfDir)
    val cleanKeys = clean.collect().map(_.getLong(0)).toSet
    val base = Lake.scratch("c01", sfDir)
    val (_, quarantine) = Lake.csvQuarantineRead(spark, s"$base/csv")
    val qLines = quarantine.collect().map(_.getString(0)).toSeq

    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        graft.operators.Dedup.splitBucket(col("o_orderkey")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val damagedKeys = orders.filter(_._2 < 3).map(_._1).toSet
    assert(cleanKeys == orders.filter(_._2 >= 3).map(_._1).toSet,
      "clean side must be exactly the un-mangled orders")
    val qDamaged = qLines.filter(_.startsWith("DAMAGED,"))
      .map(_.split(',')(2).toLong).toSet
    assert(qDamaged == damagedKeys,
      "quarantine must hold every mangled order, keyed and verbatim")
    assert(qLines.count(_.startsWith("### trailing garbage")) == 7,
      "all free-floating garbage lines must quarantine")
    assert(qLines.size == damagedKeys.size + 7,
      "nothing else may land in quarantine")
  }

  test("parse-branch semantics: type garbage and arity all quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("c01spec")
    java.nio.file.Files.writeString(dir.resolve("part.csv"),
      Seq(
        "1,10,O",            // clean
        "notalong,11,O",     // type garbage -> quarantine
        "2,12",              // under-length -> quarantine (Spark 4 CSV
                             // marks token-count mismatch malformed)
        "3,13,F,extra,cols"  // over-length -> quarantine
      ).mkString("\n"))
    val (clean, quarantine) = Lake.csvQuarantineRead(spark, dir.toString)
    val c = clean.collect().map(r =>
      (r.getLong(0), r.getString(2))).toSeq
    assert(c == Seq((1L, "O")), s"clean side wrong: $c")
    val q = quarantine.collect().map(_.getString(0)).sorted.toSeq
    assert(q == Seq("2,12", "3,13,F,extra,cols", "notalong,11,O"),
      s"quarantine side wrong: $q")
  }
}
