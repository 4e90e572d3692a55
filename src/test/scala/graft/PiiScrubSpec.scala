package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** d19_pii_scrub behavior on REAL PII shapes (the driver corpus has none):
  * a synthetic events table with emails, IPs, phone-ish digit runs, and a
  * null payload, checked against hand-written expected redactions (the
  * clean hash recomputed with MessageDigest, not Spark's md5).
  */
class PiiScrubSpec extends AnyFunSuite with SparkFixture {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("d19 redacts emails, IPs, then digit runs, with disjoint counts") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      // (event_id, props, n_emails, n_ips, n_nums, clean)
      (1L, "reach john.doe+spam@ex-ample.org or ops@a.io now",
        2, 0, 0, "reach <EMAIL> or <EMAIL> now"),
      (2L, "server 192.168.0.1 port 8080",
        0, 1, 1, "server <IP> port <NUM>"),
      (3L, "call 555-867-5309 ext 42",
        0, 0, 4, "call <NUM>-<NUM>-<NUM> ext <NUM>"),
      (4L, "no pii here, just 7 words",
        0, 0, 0, "no pii here, just 7 words"),
      (5L, null.asInstanceOf[String], -1, -1, -1, null))
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    cases.map { case (id, props, _, _, _, _) =>
      (id, new java.sql.Timestamp(1700000000000L + id), id, "click", 1.0, props)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("d19_pii_scrub")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == cases.size)
    cases.foreach { case (id, _, ne, ni, nn, clean) =>
      val r = got(id)
      if (clean == null)
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) &&
               r.isNullAt(4) && r.isNullAt(5), s"row $id: null payload must stay null")
      else {
        assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((ne, ni, nn)),
          s"row $id: counts (${r.getInt(1)},${r.getInt(2)},${r.getInt(3)}) " +
            s"!= expected ($ne,$ni,$nn)")
        assert(r.getInt(4) == clean.length, s"row $id: clean_len off")
        assert(r.getString(5) == md5hex(clean),
          s"row $id: redacted text does not hash to the expected '$clean'")
      }
    }
  }
}
