package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lake

/** l10_version_vacuum — the retention contract: only versions below the
  * keep horizon delete, retained versions keep byte-identical files,
  * the maximum version survives any `keep`, and vacuum is idempotent.
  */
class VacuumSpec extends AnyFunSuite with SparkFixture {

  private def mkChain(n: Int): String = {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("l10spec").toString
    (0 until n).foreach { v =>
      Seq((v.toLong, s"payload v$v")).toDF("id", "s")
        .write.parquet(s"$base/v$v")
    }
    base
  }

  private def listing(base: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(base)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => root.relativize(p).toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("deletes below the horizon, keeps retained files byte-identical") {
    val base = mkChain(5)
    val before = listing(base)
    val doomed = Lake.vacuumVersions(base, keep = 2)
    assert(doomed == Seq(0, 1, 2))
    val names = new java.io.File(base).listFiles().map(_.getName).sorted
    assert(names.toSeq == Seq("v3", "v4"))
    val after = listing(base)
    assert(after == before.filter { case (p, _) =>
      p.startsWith("v3/") || p.startsWith("v4/") },
      "retained versions must keep identical files and mtimes")
    assert(spark.read.parquet(s"$base/v4").count() == 1)
  }

  test("the max version survives keep=0 and re-runs are no-ops") {
    val base = mkChain(3)
    assert(Lake.vacuumVersions(base, keep = 0) == Seq(0, 1))
    assert(Lake.vacuumVersions(base, keep = 0).isEmpty, "not idempotent")
    assert(new java.io.File(base).listFiles().map(_.getName).toSeq ==
      Seq("v2"))
  }

  test("foreign directory names are untouched") {
    val base = mkChain(2)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(base, "manifest"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(base, "vNOTANUMBER"))
    Lake.vacuumVersions(base, keep = 1)
    val names = new java.io.File(base).listFiles().map(_.getName).sorted
    assert(names.toSeq == Seq("manifest", "v1", "vNOTANUMBER"))
  }
}
