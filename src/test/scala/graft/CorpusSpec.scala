package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent Scala ground truth for the corpus-construction operators
  * (d17 mixture resampling, d18 sequence packing): the md5 buckets, rate
  * arithmetic, and per-shard packing fold are all recomputed here with
  * java.security.MessageDigest + plain collections — no Spark expressions
  * shared with the implementation under test.
  */
class CorpusSpec extends AnyFunSuite with SparkFixture {

  private def md5Bucket(salt: String, id: Long, mod: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$id".getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % mod
  }

  test("d17 keeps exactly the mixture-rate-accepted docs, most-constrained source in full") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val w = n.keys.map(src => src -> (src.drop(3).toInt % 4 + 1).toLong).toMap
    val sw = w.values.sum
    val mm = n.keys.map(src => n(src).toDouble * sw / w(src)).min
    val rateQ = n.keys.map { src =>
      src -> math.floor(
        math.min(1.0, w(src).toDouble * mm / sw / n(src)) * 10000 + 1e-9).toLong
    }.toMap
    val expected = docs.collect {
      case (id, src) if md5Bucket("mix", id, 10000) < rateQ(src) => id -> src
    }.toMap
    assert(expected.nonEmpty && expected.size < docs.length,
      "mixture kept everything or nothing; spec is vacuous")
    assert(rateQ.values.exists(_ == 10000L),
      "no source kept in full — the rate normalization is off")

    val got = SparkEntry.queries("d17_source_mixture")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSet == expected.keySet,
      s"kept set diverges: extra=${(got.map(_._1).toSet -- expected.keySet).take(3)} " +
        s"missing=${(expected.keySet -- got.map(_._1).toSet).take(3)}")
    got.foreach { case (id, src, rq) =>
      assert(src == expected(id) && rq == rateQ(src), s"doc $id row ($src,$rq) mismatched")
    }
  }

  test("d18 shard ladder: count-derived, capped, monotone") {
    import graft.operators.Corpus.{packShards, TokPerShardRef, MaxPackShards}
    assert(packShards(0) == 1 && packShards(TokPerShardRef) == 1)
    assert(packShards(TokPerShardRef + 1) == 2)
    var n = 1L
    while (n < TokPerShardRef * MaxPackShards.toLong * 2) {
      val sh = packShards(n)
      // shards hold the target unless capped, and never over-split 2x
      assert(sh == MaxPackShards || n <= TokPerShardRef * sh,
        s"target broken at n=$n: $sh shards")
      assert(sh == 1 || n > TokPerShardRef * (sh / 2), s"over-split at n=$n: $sh")
      n = n * 3 + 1
    }
    assert(packShards(Long.MaxValue) == MaxPackShards)
  }

  test("d18 bin/offset equal a per-shard packing fold; offsets stay inside the budget") {
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), "\\S+".r.findAllIn(r.getString(1)).length.toLong))
    // the ladder-active shard count for THIS corpus — the implementation
    // derives it in-plan; the ground truth derives it here from the raw
    // token totals (and the spec fails if the two ever disagree)
    val nShards = graft.operators.Corpus.packShards(toks.map(_._2).sum)
    val expected = toks
      .map { case (id, t) => (id, md5Bucket("pack", id, nShards), t) }
      .groupBy(_._2).values.flatMap { shardDocs =>
        var cum = 0L
        shardDocs.sortBy(_._1).map { case (id, shard, t) =>
          val start = cum; cum += t
          id -> ((shard, t, start / 256, start % 256))
        }
      }.toMap

    val got = SparkEntry.queries("d18_seq_pack")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { case (id, shard, t, bin, off) =>
      assert(off >= 0 && off < 256, s"doc $id offset $off outside the 256-token budget")
      assert((shard.toLong, t.toLong, bin, off) == expected(id),
        s"doc $id packed as (shard=$shard,tok=$t,bin=$bin,off=$off) != ${expected(id)}")
    }
  }
}
