package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.{GraftTable, Tables}

/** Measures the streaming source's backlog-drain trade (s32 +
  * maxStepsPerTrigger): a consumer that resumes far behind a versioned
  * table must choose between ONE slice covering the whole backlog
  * (fewest scheduling rounds, but batch size grows with the lag — the
  * thing that OOMs a stateful sink at 100 TB) and rate-limited batches
  * (bounded per-batch rows, more rounds). The probe builds one table,
  * lands `ticks` disjoint update steps, then drains the SAME change
  * feed through `readStream.format("graft")` three ways — unlimited,
  * maxStepsPerTrigger=4, maxStepsPerTrigger=1 — reporting for each:
  * total drain wall, number of micro-batches, and the LARGEST batch's
  * row count. Expected shape (what makes the option worth shipping):
  * total rows identical across modes, max-batch rows ∝ steps-per-
  * trigger, wall roughly flat or mildly increasing with batch count —
  * i.e. the rate limit buys bounded memory at small scheduling cost,
  * it does not change what is read.
  *
  * Prints one JSON line and writes `bench/BENCH_stream_drain_<tag>.json`.
  *
  * Usage: runMain graft.tools.StreamDrainProbe <sfDir> <tag> [ticks]
  */
object StreamDrainProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "last"
    val ticks = if (args.length > 2) args(2).toInt else 8
    val s = GraftSession.getOrCreate()

    val work = java.nio.file.Files.createTempDirectory("graft_drainprobe")
      .toString
    val docs = Tables.documents(s, sfDir).select("doc_id", "source", "text")
    val t = GraftTable.create(s, s"$work/tbl", docs)
    // `ticks` disjoint update slices — each step's feed is churn-sized
    (0 until ticks).foreach { i =>
      t.merge(docs.filter(pmod(col("doc_id"), lit(ticks)) === i)
        .select(lit("U").as("op"), col("doc_id"), col("source"),
          concat(col("text"), lit(s" (tick $i)")).as("text")))
    }

    def drain(mode: String, steps: Option[Int]): (Double, Long, Long, Long) = {
      val out = s"$work/out_$mode"
      val batchRows = new java.util.concurrent.atomic.AtomicLong(0)
      val batchMax = new java.util.concurrent.atomic.AtomicLong(0)
      val batches = new java.util.concurrent.atomic.AtomicLong(0)
      val r = s.readStream.format("graft")
        .option("readChangeFeed", "true")
      steps.foreach(m => r.option("maxStepsPerTrigger", m.toString))
      val t0 = System.nanoTime()
      val q = r.load(s"$work/tbl")
        .writeStream
        .option("checkpointLocation", s"$out/ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val n = b.count()
          batches.incrementAndGet()
          batchRows.addAndGet(n)
          batchMax.getAndAccumulate(n, math.max(_, _))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, batches.get(), batchMax.get(), batchRows.get())
    }

    val modes = Seq(
      ("unlimited", None),
      ("steps4", Some(4)),
      ("steps1", Some(1)))
    val results = modes.map { case (m, steps) =>
      val (wall, nb, mx, total) = drain(m, steps)
      m -> (wall, nb, mx, total)
    }

    val json = results.map { case (m, (wall, nb, mx, total)) =>
      f""""$m": {"wall_sec": $wall%.2f, "batches": $nb, """ +
        s""""max_batch_rows": $mx, "total_rows": $total}"""
    }.mkString(
      s"""{"metric":"stream_drain","sf_dir":"$sfDir","ticks":$ticks,""",
      ",", "}")
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench/BENCH_stream_drain_$tag.json"), json)
    graft.operators.Lake.deleteTree(java.nio.file.Paths.get(work))
  }
}
