package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.OpDef
import graft.sources.{Ingest, Tables}

/** p01 — the end-to-end corpus build: the composed product every
  * curation stage in this repo exists for. Raw documents →
  *
  *   1. quality gate (d21's verdict as a filter),
  *   2. exact-dup keepers (d01's min-id rule),
  *   3. near-dup canonicalization (d02 LSH pairs + d13 labels over the
  *      survivors, memoized per corpus stamp),
  *   4. split assignment (d11's md5 bucket rule),
  *   5. decontamination (d16's ≥20% 3-shingle overlap vs the test
  *      split, train docs only),
  *   6. mixture (d17's weighted rates over the post-decontam TRAIN
  *      counts; val/test ride through whole — you downsample training
  *      data, never eval sets),
  *   7. sequence packing (d18's count-laddered shards + per-shard
  *      windowed cumsum),
  *
  * landing one split/source-partitioned, doc_id-bucketed corpus lake
  * (Ingest.writeCorpusLake). Every stage is an already-hash-proven
  * gate operator; composing them surfaces the cross-stage drift the
  * per-entry gates can't see, and the composed DuckDB oracle replays
  * the whole chain stage for stage.
  *
  * Scale shape: stages 1/4/5/6/7 are single scans with broadcast-side
  * joins (rate tables, bench shingle set — kilobytes to megabytes);
  * stage 2 is one map-side-combinable groupBy; stage 3 is the one
  * iterative piece (the d13 fixpoint — memoized per corpus, label
  * table persisted). The only corpus shuffles are the dedup groupBy,
  * the label join, and the pack's by-shard repartition — each keyed,
  * each unavoidable by the semantics. Intermediate survivors persist
  * between stages here (in production each stage lands in the lake,
  * which is what the final write demonstrates).
  */
object Pipeline {

  /** The whole build over an arbitrary docs frame — the spec drives
    * planted corpora through the identical chain. `family` keys the
    * persisted/memoized intermediates, `stamp` invalidates them.
    * Output: one row per doc in the final corpus with its placement
    * (split, token count, pack shard/bin/offset).
    */
  private[graft] def p01Build(s: SparkSession, docsIn: DataFrame,
      family: String, stamp: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    // 1 — quality gate: one codegen'd scan, keep-filtered, persisted
    // (every later stage reads the survivors)
    val q = graft.Caching.persistTracked(s"${family}_q",
      TextAnalysis.withQualityKeep(docsIn)
        .filter(col("keep"))
        .select("doc_id", "source", "text"))
    // 2 — exact keepers within the survivors
    val keepers = q.groupBy(Dedup.textFp.as("fp"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    // 3 — near-dup labels over the survivors (exact groups share every
    // shingle, so each sits inside one cluster and the cluster minimum
    // is always an exact keeper — the two rules compose conflict-free,
    // d14's argument)
    val lab = Dedup.dupLabelsFrom(s, q, family, stamp)
    val s1 = q.join(keepers, "doc_id")
      .join(lab, Seq("doc_id"), "left")
      .filter(col("canonical_id").isNull ||
              col("canonical_id") === col("doc_id"))
      .select("doc_id", "source", "text")
    // 4 — split; shingles computed once here feed stage 5's both sides
    val wsP = graft.Caching.persistTracked(s"${family}_s1",
      s1.withColumn("split", Dedup.splitOf(Dedup.splitBucket(col("doc_id"))))
        .withColumn("mh", expr("md5_shingle3_hashes(text)")))
    // 5 — decontamination: the test split IS the held-out benchmark;
    // train docs sharing >= 20% of their shingles with it are dropped
    val bench = wsP.filter(col("split") === "test")
      .select(explode(col("mh")).as("h")).distinct()
    val flagged = wsP.filter(col("split") === "train" && size(col("mh")) > 0)
      .select(col("doc_id"), size(col("mh")).cast("bigint").as("n_sh"),
              explode(col("mh")).as("h"))
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("h"), "left")
      .groupBy("doc_id", "n_sh")
      .agg(count(col("hit")).as("n_shared"))
      .filter(col("n_shared").cast("double") / col("n_sh") >= 0.2)
      .select("doc_id")
    val s2 = wsP.join(flagged, Seq("doc_id"), "left_anti")
      .select("doc_id", "source", "split", "text")
    // 6 — mixture on the train split (rates from the POST-decontam
    // train counts — rates over dropped docs would under-fill targets)
    val rates = Corpus.mixtureRates(s2.filter(col("split") === "train"))
    val s3 = s2.join(broadcast(rates), Seq("source"), "left")
      .filter(col("split") =!= "train" ||
              Corpus.mixtureAccept(col("doc_id"), col("rate_q")))
    // 7 — pack: token counts, count-laddered shard, per-shard cumsum
    val toks = s3.select(col("doc_id"), col("source"), col("split"),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
        .cast("int").as("n_tokens"))
    val tot = toks.agg(sum(col("n_tokens").cast("long")).as("tok_total"))
    val sharded = toks.crossJoin(broadcast(tot))
      .withColumn("n_shards", expr(Corpus.packShardsCase("tok_total")))
      .withColumn("shard",
        Corpus.saltedBucketVar("pack", col("doc_id"), col("n_shards"))
          .cast("int"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded.withColumn("cum", sum(col("n_tokens").cast("long")).over(w))
      .select(col("doc_id"), col("source"), col("split"), col("n_tokens"),
              col("shard"),
              expr("(cum - n_tokens) div 256").as("bin_id"),
              expr("(cum - n_tokens) % 256").as("bin_offset"))
  }

  /** The composed oracle: DuckDB replays all seven stages — the quality
    * predicate inlined, the d02/d13 label chain over the survivors CTE,
    * the d16 overlap rule, the d17 rate table, the d18 ladder+cumsum —
    * each block the per-entry oracle's text pointed at a prior CTE.
    */
  private[graft] def duckP01Sql: String =
    s"""WITH RECURSIVE qm AS (
       |  SELECT doc_id, source, text,
       |         len(regexp_extract_all(text, '\\S+')) AS n_words,
       |         len(list_distinct(regexp_extract_all(text, '\\S+'))) AS n_distinct,
       |         length(regexp_replace(text, '\\s', '', 'g')) AS n_nonws,
       |         len(regexp_extract_all(text, '${TextAnalysis.EnPat}')) +
       |         len(regexp_extract_all(text, '${TextAnalysis.EsPat}')) +
       |         len(regexp_extract_all(text, '${TextAnalysis.DePat}')) +
       |         len(regexp_extract_all(text, '${TextAnalysis.FrPat}')) AS stop_hits
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, source, text FROM qm
       |  WHERE n_words BETWEEN 10 AND 5000 AND n_distinct * 5 >= n_words
       |    AND stop_hits >= 1
       |    AND n_nonws BETWEEN n_words * 2 AND n_words * 12),
       |${Dedup.duckLabelCtesFrom("q")},
       |keepers AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
       |s1 AS (
       |  SELECT d.doc_id, d.source, d.text,
       |         ${Dedup.duckSplitCase("d.doc_id")} AS split
       |  FROM q d
       |  JOIN keepers k ON d.doc_id = k.doc_id
       |  LEFT JOIN lab l ON d.doc_id = l.doc_id
       |  WHERE l.doc_id IS NULL OR l.canonical_id = d.doc_id),
       |shg AS (
       |  SELECT doc_id, source, split, text, list_distinct(list_transform(
       |    generate_series(1, len(ws) - 2),
       |    i -> ('0x' || substr(md5(concat_ws(' ', ws[i], ws[i+1], ws[i+2])), 1, 15))::BIGINT)) AS hs
       |  FROM (SELECT *, string_split_regex(text, '\\s+') AS ws FROM s1)),
       |bench AS (SELECT DISTINCT unnest(hs) AS h FROM shg WHERE split = 'test'),
       |flagged AS (
       |  SELECT t.doc_id
       |  FROM (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_sh, unnest(hs) AS h
       |        FROM shg WHERE split = 'train' AND len(hs) > 0) t
       |  LEFT JOIN bench b ON t.h = b.h
       |  GROUP BY t.doc_id, t.n_sh
       |  HAVING CAST(count(b.h) AS DOUBLE) / n_sh >= 0.2),
       |s2 AS (
       |  SELECT doc_id, source, split, text FROM shg
       |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
       |c AS (
       |  SELECT source, count(*) AS n,
       |         CAST(${Corpus.sourcePrioSql("source")} + 1 AS BIGINT) AS w
       |  FROM s2 WHERE split = 'train' GROUP BY source),
       |sw1 AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM c),
       |mm AS (SELECT min(CAST(n AS DOUBLE) * sw / w) AS mm FROM c, sw1),
       |r AS (
       |  SELECT source,
       |         CAST(floor(least(1.0, CAST(w AS DOUBLE) * mm / sw / n)
       |                    * ${Corpus.RateScale} + 1e-9) AS BIGINT) AS rate_q
       |  FROM c, sw1, mm),
       |s3 AS (
       |  SELECT s2.doc_id, s2.source, s2.split,
       |         CAST(len(regexp_extract_all(s2.text, '\\S+')) AS INT) AS n_tokens
       |  FROM s2 LEFT JOIN r ON s2.source = r.source
       |  WHERE s2.split <> 'train'
       |     OR ${Corpus.duckSaltedBucket("mix", "s2.doc_id", Corpus.RateScale)} < r.rate_q),
       |p AS (
       |  SELECT ${Corpus.packShardsCase("tok_total")} AS n_shards
       |  FROM (SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_total FROM s3)),
       |shd AS (
       |  SELECT doc_id, source, split, n_tokens,
       |         CAST(${Corpus.duckSaltedBucketVar("pack", "doc_id",
                    "(SELECT n_shards FROM p)")} AS INT) AS shard
       |  FROM s3),
       |cumt AS (
       |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM shd)
       |SELECT doc_id, source, split, n_tokens, shard,
       |       (cum - n_tokens) // 256 AS bin_id,
       |       (cum - n_tokens) % 256 AS bin_offset
       |FROM cumt ORDER BY doc_id""".stripMargin

  val defs: Map[String, OpDef] = Map(
    "p01_corpus_build" -> OpDef.sql(
      (s, d) => {
        val built = p01Build(s, Tables.documents(s, d), "p01",
          Tables.stamp(d, "documents"))
        // land the corpus lake (split/source partitions prune a
        // trainer's read; doc_id buckets pre-shuffle the bytes-fetch
        // join) and hash the READ-BACK — the gate covers the write path
        Ingest.writeCorpusLake(built, "graft_p01_corpus")
        s.table("graft_p01_corpus")
          .select("doc_id", "source", "split", "n_tokens", "shard",
                  "bin_id", "bin_offset")
          .orderBy("doc_id")
      },
      duckP01Sql)
  )
}
