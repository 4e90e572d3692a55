package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Lake

/** l02_zorder_lake — the pruning claim, measured: after the Morton
  * rewrite, a point predicate on EITHER key passes the per-file min/max
  * stats check in a small fraction of files, where the single-column
  * (date-sorted) layout admits it almost everywhere. Also pins the
  * interleave arithmetic itself on hand values.
  */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  private def files(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq

  /** #files whose [min,max] of `key` admits `v` — the stats-skip proxy:
    * exactly the files a reader with file-level stats must open.
    */
  private def admitting(dir: String, key: String, v: Long): Int =
    files(dir).count { f =>
      val r = spark.read.parquet(f).agg(min(key), max(key)).head()
      r.getLong(0) <= v && v <= r.getLong(1)
    }

  private lazy val base: String = {
    val b = Lake.scratch("l02_spec", sfDir)
    val li = Lake.l02Cols(spark, sfDir)
    Lake.writeZOrdered(li, 16, s"$b/zorder")
    li.repartitionByRange(16, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(s"$b/bydate")
    b
  }

  test("zValue interleaves bits (hand-checked Morton codes)") {
    val got = spark.range(1).select(
      Lake.zValue(lit(0L), lit(0L), 8).as("z00"),
      Lake.zValue(lit(1L), lit(0L), 8).as("z10"),
      Lake.zValue(lit(0L), lit(1L), 8).as("z01"),
      Lake.zValue(lit(255L), lit(255L), 8).as("zff"),
      Lake.zValue(lit(0xAAL), lit(0x55L), 8).as("zmix")).head()
    assert(got.getLong(0) == 0L)
    assert(got.getLong(1) == 1L)       // a-bit 0 -> z-bit 0
    assert(got.getLong(2) == 2L)       // b-bit 0 -> z-bit 1
    assert(got.getLong(3) == 0xFFFFL)  // all 16 low z-bits set
    // a=10101010: bits 1,3,5,7 -> z bits 2,6,10,14; b=01010101: bits
    // 0,2,4,6 -> z bits 1,5,9,13 -> nibble pattern 0110 throughout
    assert(got.getLong(4) == 0x6666L)
  }

  test("both layouts hold identical content (16 files each)") {
    assert(files(s"$base/zorder").size == 16)
    assert(files(s"$base/bydate").size == 16)
    val a = spark.read.parquet(s"$base/zorder").count()
    val b = spark.read.parquet(s"$base/bydate").count()
    assert(a == b && a == Lake.l02Cols(spark, sfDir).count())
  }

  test("z-order prunes BOTH key dimensions; date sort prunes neither") {
    val mid = Lake.l02Cols(spark, sfDir)
      .agg(expr("percentile(l_partkey, 0.5)").cast("long").as("p"),
           expr("percentile(l_suppkey, 0.5)").cast("long").as("s")).head()
    val (pMid, sMid) = (mid.getLong(0), mid.getLong(1))
    val zPart = admitting(s"$base/zorder", "l_partkey", pMid)
    val zSupp = admitting(s"$base/zorder", "l_suppkey", sMid)
    val dPart = admitting(s"$base/bydate", "l_partkey", pMid)
    val dSupp = admitting(s"$base/bydate", "l_suppkey", sMid)
    // 16 files split on the top 4 z bits = a 4x4 grid of the key space:
    // a point predicate on one dim admits ~one grid row/column plus
    // boundary files — and the boundaries come from repartitionByRange's
    // SAMPLED partitioner, so the exact count wobbles a file or two
    // between runs (observed 8 and 9 for partkey). The bound is sized
    // for the geometry plus that jitter; the load-bearing claims are
    // the strict improvement assertions below. The date layout leaves
    // both keys shuffled, so stats admit the median value nearly
    // everywhere.
    assert(zPart <= 11, s"z-layout admits partkey probe in $zPart/16 files")
    assert(zSupp <= 11, s"z-layout admits suppkey probe in $zSupp/16 files")
    assert(dPart >= 12, s"date layout should not prune partkey ($dPart/16)")
    assert(dSupp >= 12, s"date layout should not prune suppkey ($dSupp/16)")
    assert(zPart + zSupp < dPart + dSupp)
  }
}
