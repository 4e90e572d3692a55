package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d38_temperature_mix — the α=0.5 rebalance re-derived independently:
  * an exact Scala replay of rate table + md5 accept, the
  * smallest-source-kept-entirely guarantee, the flattening property
  * (post-sampling imbalance strictly shrinks while order is
  * preserved), and the broadcast-rates/no-window plan shape.
  */
class TemperatureMixSpec extends AnyFunSuite with SparkFixture {

  private val RateScale = 10000

  private def bucket(salt: String, id: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % RateScale

  private lazy val docs = graft.sources.Tables.documents(spark, sfDir)
    .select("doc_id", "source").collect()
    .map(r => r.getLong(0) -> r.getString(1))

  private lazy val counts = docs.groupBy(_._2).map { case (s, xs) =>
    s -> xs.length.toLong }

  private lazy val rateQ: Map[String, Long] = {
    val nmin = counts.values.min
    counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(nmin.toDouble / n) * RateScale + 1e-9).toLong }
  }

  private lazy val got =
    SparkEntry.queries("d38_temperature_mix")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("kept set equals the exact rate-table + md5-accept replay") {
    val expect = docs.collect {
      case (id, s) if bucket("temp", id) < rateQ(s) => (id, s, rateQ(s))
    }.toSet
    assert(got.toSet == expect, "temperature-sampled keep set diverged")
    assert(got.nonEmpty)
  }

  test("a balanced corpus is a NO-OP: every rate exactly 1, nothing dropped") {
    // The driver's gate corpus is source-balanced — the corner where
    // temperature sampling must do nothing (rate = sqrt(n/n) = 1).
    assert(counts.values.toSet.size == 1, "gate corpus expected balanced")
    assert(got.map(_._3).forall(_ == RateScale))
    assert(got.length == docs.length, "a balanced corpus must survive whole")
  }

  /** A planted imbalanced corpus: 160/40/10 docs across three sources. */
  private lazy val planted = {
    val sp = spark
    import sp.implicits._
    ((1L to 160L).map(i => (i, "web")) ++
     (201L to 240L).map(i => (i, "books")) ++
     (301L to 310L).map(i => (i, "code")))
      .toDF("doc_id", "source")
  }

  test("imbalanced corpus: smallest kept whole, damped toward sqrt, order kept") {
    val kept = graft.operators.Corpus.temperatureSample(planted).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = kept.groupBy(_._2).map { case (s, xs) => s -> xs.length }
    // replay the rates: nmin = 10
    val expectQ = Map(
      "web" -> math.floor(math.sqrt(10.0 / 160) * RateScale + 1e-9).toLong,
      "books" -> math.floor(math.sqrt(10.0 / 40) * RateScale + 1e-9).toLong,
      "code" -> RateScale.toLong)
    assert(kept.groupBy(_._2).forall { case (s, xs) =>
      xs.forall(_._3 == expectQ(s)) }, "rate table diverged from sqrt replay")
    assert(bySource("code") == 10, "smallest source must survive whole")
    // exact replay of the kept counts (pure function of ids + rates)
    val expectKept = planted.collect().map(r => (r.getLong(0), r.getString(1)))
      .count { case (id, s) => bucket("temp", id) < expectQ(s) }
    assert(kept.length == expectKept)
    // flattening: 16:1 imbalance must shrink; sqrt theory says 4:1
    val ratio = bySource("web").toDouble / bySource("code")
    info(f"web:code ratio 16.0 before, $ratio%.1f after (theory 4.0)")
    assert(ratio < 8.0 && ratio > 1.5, "damping should land near sqrt scale")
    assert(bySource("web") >= bySource("books") &&
           bySource("books") >= bySource("code"),
      "α=0.5 damps but must not reorder source sizes")
  }

  test("rates broadcast; one corpus scan; no window, no sort but the gate's") {
    val p = SparkEntry.queries("d38_temperature_mix")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the rate table must broadcast into the corpus scan")
    assert(!p.contains("Window"), "no window belongs in a mixture pass")
  }
}
