package graft.tools

/** Prints the physical plan of named gate queries (shuffle/broadcast/
  * pushdown inspection while iterating). Read-only diagnostics; not part
  * of the driver contract.
  *
  * Usage: runMain graft.tools.QueryPlan <sfDir> <query> [query...]
  */
object QueryPlan {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = graft.GraftSession.getOrCreate()
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      println(graft.SparkEntry.queries(name)(s, dir)
        .queryExecution.executedPlan.toString.take(6000))
    }
    s.stop()
  }
}
