package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake

/** c03_orc_roundtrip — the performance half of format interop the gate
  * hash can't see: ORC scans must take predicate pushdown and
  * directory partition pruning exactly like parquet, and the schema
  * must survive the boundary (timestamp stays a timestamp, int stays
  * 32-bit). Value fidelity is the gate's oracle hash.
  */
class OrcInteropSpec extends AnyFunSuite with SparkFixture {

  private lazy val base: String = {
    // run the gate entry once so the ORC lake exists
    SparkEntry.queries("c03_orc_roundtrip")(spark, sfDir).collect()
    Lake.scratch("c03", sfDir)
  }

  test("schema round-trips through ORC, timestamp included") {
    val back = spark.read.orc(s"$base/lake")
    val dt = back.dtypes.toMap
    assert(dt("l_orderkey") == "LongType")
    assert(dt("l_linenumber") == "IntegerType",
      "int32 must not widen through ORC")
    assert(dt("l_quantity") == "DoubleType")
    assert(dt("l_shipdate").startsWith("Timestamp"),
      s"timestamp family must survive ORC, got ${dt("l_shipdate")}")
    assert(dt("l_returnflag") == "StringType",
      "the partition column must read back as the written string type")
  }

  test("predicates push into the ORC scan") {
    val df = spark.read.orc(s"$base/lake").filter(col("l_quantity") > 30.0)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThan(l_quantity,30.0)"),
      s"quantity predicate not pushed to ORC: $pushed")
  }

  test("a partition filter prunes the ORC scan to one directory") {
    val df = spark.read.orc(s"$base/lake").filter(col("l_returnflag") === "N")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")
    val flags = df.select("l_returnflag").distinct().collect().map(_.getString(0))
    assert(flags.toSeq == Seq("N"), s"pruned scan returned flags ${flags.toSeq}")
  }

  test("timestamps round-trip value-exact (no session-timezone shift)") {
    val src = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-03-01").cast("timestamp") &&
              col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
      .agg(sum(unix_micros(col("l_shipdate").cast("timestamp"))), count(lit(1)))
      .collect()(0)
    val back = spark.read.orc(s"$base/lake")
      .agg(sum(unix_micros(col("l_shipdate").cast("timestamp"))), count(lit(1)))
      .collect()(0)
    assert(back == src, s"timestamp micros drifted: orc=$back parquet=$src")
  }
}
