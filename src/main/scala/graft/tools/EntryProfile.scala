package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job wall profile of a gate entry: runs the entry through the
  * bench's noop sink and prints every Spark job's start offset, wall
  * and callsite. The optimization rounds' first tool — a composed
  * entry's seconds are job-count x per-job latency at gate scale, so
  * trimming starts with knowing which ACTIONS the wall goes to.
  * Read-only diagnostics; not part of the driver contract.
  *
  * Usage: runMain graft.tools.EntryProfile <sfDir> <entry> [reps=1]
  */
object EntryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val s = graft.GraftSession.getOrCreate()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, (e.time,
          Option(e.properties.getProperty("callSite.short"))
            .orElse(e.stageInfos.lastOption.map(_.name)).getOrElse("?"),
          e.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.remove(e.jobId)).foreach { case (t0, cs, nt) =>
          log.add((t0, f"  job ${e.jobId}%4d  ${(e.time - t0) / 1e3}%6.2fs  ${nt}%4dt  $cs"))
        }
    })
    // executor task-time per stage callsite: walls overlap (broadcast
    // futures run concurrently), so CPU attribution needs task time
    val stageTime = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // the job callsite is opaque for broadcast/subquery futures
        // (withThreadLocalCaptured) — dig the first graft frame out of
        // the stage's full callsite stack instead
        val graftFrame = e.stageInfo.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("EntryProfile"))
          .map(_.trim.replaceFirst("^at ", ""))
        val cs = graftFrame.getOrElse(e.stageInfo.name)
        val rt = e.stageInfo.taskMetrics.executorRunTime
        stageTime.merge(cs, (rt, 1L),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // warmup on sf0.001 compiles codegen classes like the bench does
    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory)
      try fn(s, warm).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable => System.err.println(s"[profile] warmup failed: $t") }
    (1 to reps).foreach { rep =>
      s.catalog.clearCache()
      System.gc()
      var l = log.poll(); while (l != null) l = log.poll() // drain warmup noise
      stageTime.clear()
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep $rep wall ${wall}%.2f s, jobs:")
      val ls = new scala.collection.mutable.ArrayBuffer[(Long, String)]()
      l = log.poll(); while (l != null) { ls += l; l = log.poll() }
      val base = if (ls.isEmpty) 0L else ls.map(_._1).min
      ls.sortBy(_._1).foreach { case (ts, line) =>
        println(f"  @+${(ts - base) / 1e3}%6.2fs" + line)
      }
      println(f"[profile] ${ls.size} jobs in ${wall}%.2f s")
      println("[profile] executor task-time by stage callsite (top 25):")
      import scala.jdk.CollectionConverters._
      stageTime.asScala.toSeq.sortBy(-_._2._1).take(25).foreach {
        case (cs, (rt, n)) =>
          println(f"  ${rt / 1e3}%8.2f s  ${n}%4d stages  $cs")
      }
      stageTime.clear()
    }
    s.stop()
  }
}
