package graft.tools

/** Writes the `explain("formatted")` output of named gate queries to
  * files (the optimization-round plan evidence under plans/rNN/).
  * Read-only diagnostics; not part of the driver contract.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <query> [query...]
  *   e.g. runMain graft.tools.PlanDump /root/testdata/sf0.01 plans/r16 before p02_incr_corpus
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val s = graft.GraftSession.getOrCreate()
    new java.io.File(outDir).mkdirs()
    args.drop(3).foreach { name =>
      val plan = graft.SparkEntry.queries(name)(s, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(plan) finally w.close()
      println(s"[plandump] wrote ${f.getPath} (${plan.length} chars)")
    }
    s.stop()
  }
}
