package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus replicator for scale probes: builds an sf-N× copy of a driver
  * testdata dir by unioning `factor` key-shifted copies of each table.
  *
  *   runMain graft.tools.ScaleData <srcDir> <dstDir> <factor>
  *
  * Replication rules keep the workload SHAPE linear in the factor, so a
  * bench on the output measures scaling, not an artifact of duplication:
  *
  *  - every id domain (custkey, orderkey, partkey, suppkey, event_id,
  *    user_id, doc_id, vec_id) is shifted by copy_index × (max_id + 1),
  *    so foreign keys stay consistent within a copy and never collide
  *    across copies — joins, groups, sessions, and splits all scale
  *    linearly;
  *  - region/nation are fixed dimensions (copied once — duplicating them
  *    would break FK semantics and the 25-nation cardinality the plans
  *    are designed around);
  *  - document text gets a per-copy suffix on EVERY word (copy 0 is
  *    verbatim), which leaves within-copy shingle/charset relations
  *    intact but makes cross-copy shingle sets disjoint — near-dup pair
  *    output grows ~linearly instead of quadratically in the factor
  *    (10 verbatim copies of each doc would explode every pair op);
  *  - n_chars is recomputed from the suffixed text so derived columns
  *    stay consistent.
  *
  * Outputs are single-file parquet (`<dst>/<table>.parquet` as a FILE),
  * matching the driver's layout — the streaming entries stage
  * events.parquet by copying it as a file.
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleData <srcDir> <dstDir> <factor> [tables,csv]")
    val (src, dst, factorS) = (args(0), args(1), args(2))
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    // optional table filter: a documents-only probe corpus at factor 100
    // shouldn't pay for 600M lineitem rows it never reads
    val only: Option[Set[String]] =
      if (args.length == 4) Some(args(3).split(",").map(_.trim).toSet)
      else None
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val spark = graft.GraftSession.getOrCreate()

    def table(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    def stride(name: String, idCol: String): Long =
      table(name).agg(max(idCol)).head.getLong(0) + 1

    lazy val sCust = stride("customer", "c_custkey")
    lazy val sOrd = stride("orders", "o_orderkey")
    lazy val sPart = stride("part", "p_partkey")
    lazy val sSupp = stride("supplier", "s_suppkey")
    lazy val sEv = stride("events", "event_id")
    lazy val sUser = stride("events", "user_id")
    lazy val sDoc = stride("documents", "doc_id")
    lazy val sVec = stride("embeddings", "vec_id")

    def shift(c: String, s: Long, i: Int): (String, Column) =
      c -> (col(c) + lit(i * s))

    // single-file output matching the driver layout (see scaladoc) — but
    // with SMALL row groups: Spark parallelizes a parquet scan at
    // row-group granularity, and the driver's own files carry ONE row
    // group, which pins every scan-side stage to a single core (measured:
    // the per-row text ops came back 12-18x for 10x data at sf10 purely
    // from this starvation). 16 MB row groups keep the one-file layout
    // the stream staging needs while letting a 32-core box actually scan
    // in parallel.
    def writeOne(name: String, df: DataFrame): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val dstDir = Paths.get(dst)
      Files.createDirectories(dstDir)
      val tmp = Files.createTempDirectory(dstDir, s".build_$name")
      // parquet.block.size only takes effect through the hadoop conf
      // (writer options don't reach ParquetOutputFormat's block size).
      // 2 MB: small for a production lake, right for a scale PROBE —
      // text compresses ~10x and the per-row work (regex, shingling) is
      // CPU-bound, so byte-sized row groups must be small for a 32-core
      // box to engage on a single-file table (docs at sf1 are 6 MB).
      df.sparkSession.sparkContext.hadoopConfiguration
        .setLong("parquet.block.size", 2L * 1024 * 1024)
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      Files.move(part, dstDir.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val walk = Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

    def replicate(name: String, bumps: Int => Seq[(String, Column)]): Unit = {
      if (!wanted(name)) return
      val base = table(name)
      val copies = (0 until factor).map { i =>
        bumps(i).foldLeft(base) { case (df, (c, e)) => df.withColumn(c, e) }
      }
      writeOne(name, copies.reduce(_ union _))
      println(s"[scale] $name x$factor written")
    }

    replicate("customer", i => Seq(shift("c_custkey", sCust, i)))
    replicate("orders", i => Seq(
      shift("o_orderkey", sOrd, i), shift("o_custkey", sCust, i)))
    replicate("lineitem", i => Seq(
      shift("l_orderkey", sOrd, i), shift("l_partkey", sPart, i),
      shift("l_suppkey", sSupp, i)))
    replicate("part", i => Seq(shift("p_partkey", sPart, i)))
    replicate("supplier", i => Seq(shift("s_suppkey", sSupp, i)))
    replicate("events", i => Seq(
      shift("event_id", sEv, i), shift("user_id", sUser, i)))
    replicate("documents", i => {
      val text =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1c$i")
      // n_chars BEFORE text: both expressions reference col("text"), and
      // withColumn re-resolves against the frame built so far — replacing
      // text first would make length(text) measure a double-suffixed copy
      Seq("n_chars" -> length(text).cast("long"),
          "text" -> text,
          shift("doc_id", sDoc, i))
    })
    // Copies get a per-copy ORTHOGONAL transform (circular coordinate
    // shift + deterministic sign flips): cosine similarities within a
    // copy are exactly preserved, while cross-copy similarities become
    // near-random — verbatim copies would make every vector identical to
    // its factor-1 twins and blow the pair ops up quadratically in the
    // factor (measured: d09 went 40x at factor 10 before this).
    lazy val dim = table("embeddings")
      .select(size(col("embedding"))).head.getInt(0)
    replicate("embeddings", i => {
      val emb =
        if (i == 0) col("embedding")
        else {
          val rotated = (0 until dim).map { j =>
            val sign =
              if (((graft.expressions.LshKernels.mix(i.toLong * 131 + j) >>> 20) & 1L) == 1L)
                -1.0f else 1.0f
            (col("embedding").getItem((j + i) % dim) * lit(sign)).cast("float")
          }
          array(rotated: _*)
        }
      Seq(shift("vec_id", sVec, i), "embedding" -> emb)
    })
    if (wanted("nation")) writeOne("nation", table("nation"))
    if (wanted("region")) writeOne("region", table("region"))

    spark.stop()
  }
}
