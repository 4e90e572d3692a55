package graft.tools

/** Prints d03's formatted physical plan (for shuffle/reuse inspection).
  * Read-only diagnostics; not part of the driver contract.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val s = graft.GraftSession.getOrCreate()
    val df = graft.operators.Dedup.d03Body(s, dir, 0L)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    s.stop()
  }
}
