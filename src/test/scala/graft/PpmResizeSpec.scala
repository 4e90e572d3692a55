package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, PpmDecoder}

/** m08_ppm_resize's kernel: nearest-neighbor pixel selection on
  * hand-built images where every output byte is known, plus the edge
  * geometries (1-pixel axes, odd dims) and the decode-failure policy.
  */
class PpmResizeSpec extends AnyFunSuite with SparkFixture {

  private def ppm(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px

  test("4x2 image: resample picks exactly the even-grid pixels") {
    // pixels laid out as 3-byte runs 'aaa'..'hhh', row-major 4x2
    val px = "aaabbbcccdddeeefffggghhh".getBytes("US-ASCII")
    val Some((w, h, _, got)) = PpmDecoder.decode(ppm(4, 2, px))
    val (w2, h2, out) = Multimodal.resizeHalf(w, h, got)
    assert((w2, h2) == (2, 1))
    assert(new String(out, "US-ASCII") == "aaaccc")
  }

  test("odd dims: ceil-half keeps the last row/column reachable") {
    // 3x3: out 2x2 = in(0,0), in(2,0), in(0,2), in(2,2)
    val runs = (0 until 9).map(i => ('a' + i).toChar.toString * 3).mkString
    val Some((w, h, _, got)) = PpmDecoder.decode(ppm(3, 3, runs.getBytes))
    val (w2, h2, out) = Multimodal.resizeHalf(w, h, got)
    assert((w2, h2) == (2, 2))
    assert(new String(out, "US-ASCII") == "aaaccc" + "gggiii")
  }

  test("1x1 image survives as itself") {
    val Some((w, h, _, got)) = PpmDecoder.decode(ppm(1, 1, "xyz".getBytes))
    val (w2, h2, out) = Multimodal.resizeHalf(w, h, got)
    assert((w2, h2) == (1, 1) && new String(out) == "xyz")
  }

  test("gate entry: every doc appears once, corrupt docs null out") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("m08_ppm_resize")(spark, sfDir).cache()
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.count() == total)
    assert(out.filter(col("doc_id") % 17 === 0)
      .filter(col("resized_md5").isNotNull).isEmpty)
    assert(out.filter(col("doc_id") % 17 =!= 0)
      .filter(col("resized_md5").isNull).isEmpty)
    out.unpersist()
  }
}
