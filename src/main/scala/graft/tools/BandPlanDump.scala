package graft.tools

/** Writes the `explain("formatted")` output of the s10/d24 streaming
  * verdict probe (Dedup.incrDedupStreamVerdicts on its batch parity
  * twin) — the plan the gate's streamed form runs per micro-batch,
  * where the per-row band-key computation lives. Plan evidence for the
  * optimization rounds; read-only diagnostics, not part of the driver
  * contract.
  *
  * Usage: runMain graft.tools.BandPlanDump <sfDir> <outDir> <suffix>
  */
object BandPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val s = graft.GraftSession.getOrCreate()
    graft.expressions.GraftFunctions.register(s)
    val (_, _, fpIdx, bandIdx, shIdx) =
      graft.operators.Dedup.d24Artifacts(s, dir, "bandplan")
    val arriving = graft.sources.Tables.documents(s, dir)
      .select("doc_id", "text")
    val plan = graft.operators.Dedup
      .incrDedupStreamVerdicts(arriving, fpIdx, bandIdx, shIdx)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    new java.io.File(outDir).mkdirs()
    val f = new java.io.File(outDir, s"s10_stream_incr_dedup_$suffix.txt")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.println(plan) finally w.close()
    println(s"[bandplandump] wrote ${f.getPath} (${plan.length} chars)")
    s.stop()
  }
}
