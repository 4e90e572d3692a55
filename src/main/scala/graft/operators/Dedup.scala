package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.OpDef
import graft.sources.Tables

/** Deduplication family over `documents`:
  *  - exact (hash group-by),
  *  - MinHash + LSH banding (near-dup candidate pairs + exact-Jaccard verify),
  *  - SimHash (64-bit, chunk-banded Hamming pairs),
  *  - blocked character-set Jaccard (the one SQL-expressible pair metric),
  *  - rolling-hash document fingerprinting.
  *
  * Scale design: no O(n^2) anywhere — candidate pairs only ever come from
  * equality joins on bucket keys (minhash band signatures / simhash
  * 16-bit chunks / (source, lang, length-band) blocks), so the self-join
  * shuffles on the bucket key and each bucket is bounded by construction.
  * Signatures come from native codegen'd kernels (ShingleHashes) or
  * explode + scalar aggregates — nothing interpreted, nothing UDF-boxed
  * on the corpus-sized path.
  */
object Dedup {

  // --- MinHash parameters -------------------------------------------------
  private val NumHashes = 32
  private val NumBands = 8 // 8 bands x 4 rows
  private val RowsPerBand = NumHashes / NumBands
  // Carter-Wegman affine family mod p = 2^31 - 1: minhash_k over shingle
  // hashes reduced to [0, p). Multipliers/offsets come from a fixed
  // SplitMix64-style scramble, bounded so a*h + b stays well inside Long
  // range (ANSI mode: no silent wraparound allowed).
  private val P31 = 2147483647L // 2^31 - 1
  private def mix(z: Long): Long = graft.expressions.LshKernels.mix(z)
  private val As: Array[Long] = Array.tabulate(NumHashes)(i => (mix(2L * i) >>> 33) | 1L)
  private val Bs: Array[Long] = Array.tabulate(NumHashes)(i => mix(2L * i + 1) >>> 33)

  /** documents + `shingles`: distinct xxhash64 of 3-word shingles (the
    * shingle set is the unit for both minhash and Jaccard), via the native
    * [[graft.expressions.ShingleHashes]] kernel — one codegen'd call per
    * row; the equivalent transform/concat_ws higher-order-function chain
    * runs interpreted and was ~20x slower on the documents scan.
    */
  private def withShingles(s: SparkSession, d: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .withColumn("shingles", expr("shingle3_hashes(text)"))
      .filter(size(col("shingles")) > 0)
  }

  /** Minhash signatures from a (doc_id, shingles) frame, Spark-native:
    * explode the shingle hashes, reduce each doc with NumHashes codegen'd
    * scalar `min` aggregates of the affine transforms, reassemble the
    * signature array. Map-side combinable — at 100 TB this shuffles only
    * NumHashes-long partials per doc, and the whole reduction stays in
    * whole-stage codegen (the per-row higher-order-function alternative
    * runs interpreted and is an order of magnitude slower).
    */
  private def minhashSigs(shing: DataFrame): DataFrame = {
    val mins = Array.tabulate(NumHashes)(k =>
      min(pmod(lit(As(k)) * pmod(col("h"), lit(P31)) + lit(Bs(k)), lit(P31)))
        .as(s"m$k"))
    shing
      .select(col("doc_id"), explode(col("shingles")).as("h"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
              array((0 until NumHashes).map(k => col(s"m$k")): _*).as("sig"))
  }

  /** Exact Jaccard between two shingle-hash-set columns (both already
    * distinct), as a double ratio of int counts — exact in both engines.
    */
  private def jaccard(a: String, b: String) =
    size(array_intersect(col(a), col(b))).cast("double") /
      size(array_union(col(a), col(b)))

  /** Persist with per-name tracking: rebuilding the same operator in a
    * long-lived session (bench warmup + timed pass, repeated driver runs)
    * unpersists the previous incarnation instead of accumulating cached
    * partitions until LRU eviction.
    */
  private val tracked = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def persistTracked(name: String, df: DataFrame): DataFrame = {
    val old = tracked.put(name, df)
    if (old != null) old.unpersist(blocking = false)
    df.persist()
  }

  val defs: Map[String, OpDef] = Map(

    // Exact dedup: group identical texts, keep the lowest doc_id.
    "d01_exact_dedup" -> OpDef.sql(
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies", "fp")
        .orderBy("keep_id"),
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS fp
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin),

    // MinHash + LSH near-dup pairs. Candidates come only from band-bucket
    // equality joins; each candidate is verified with exact shingle Jaccard.
    "d02_minhash_lsh" -> OpDef.rowsOnly(
      (s, d) => {
        // Materialized once: the shingle table feeds the signature path and
        // both sides of the verify join (at 100 TB this is the signature
        // table you'd persist to the lake between pipeline stages).
        val shing = persistTracked("d02_shingles",
          withShingles(s, d).select("doc_id", "shingles"))
        val sigs = minhashSigs(shing)
        val bands = sigs.select(
            col("doc_id"),
            explode(expr(
              s"""transform(sequence(0, ${NumBands - 1}),
                 |  b -> struct(b AS band_id,
                 |              xxhash64(concat_ws(',',
                 |                slice(sig, b * $RowsPerBand + 1, $RowsPerBand))) AS band_sig))
                 |""".stripMargin)).as("band"))
          .select(col("doc_id"), col("band.band_id"), col("band.band_sig"))
        val a = bands.toDF("a_id", "band_id", "band_sig")
        val b = bands.toDF("b_id", "band_id", "band_sig")
        val candidates = a.join(b, Seq("band_id", "band_sig"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        val sh = shing
        candidates
          .join(sh.toDF("a_id", "a_sh"), "a_id")
          .join(sh.toDF("b_id", "b_sh"), "b_id")
          .withColumn("sim_raw", jaccard("a_sh", "b_sh"))
          .filter(col("sim_raw") >= 0.3) // threshold on the RAW value,
          // like d04/d10 — rounding first would admit boundary pairs
          .select(col("a_id"), col("b_id"),
                  round(col("sim_raw"), 4).as("sim"))
          .orderBy("a_id", "b_id")
      }),

    // SimHash: 64-bit per-row signature, then near-dup pairs sharing any
    // 16-bit chunk with Hamming distance <= 12.
    //
    // The signature is computed Spark-native: explode words -> one
    // hash-aggregate with 64 codegen'd scalar sums (bit i set => +1 else
    // -1), then OR the signs into a 64-bit code. Higher-order-function
    // variants (aggregate+zip_with per word) run interpreted and allocate
    // a 64-long array per word — ~20x slower. The explode is map-side
    // combinable, so at 100 TB this is one shuffle of 64-long partials.
    "d03_simhash" -> OpDef.rowsOnly(
      (s, d) => {
        val bitSums = Array.tabulate(64)(i =>
          sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
            .as(s"b$i"))
        val simhashCol = (0 until 64).map(i =>
            when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          // bitwise OR, not +: bit 63 is Long.MinValue and ANSI addition
          // would overflow; OR of disjoint bits is exact.
          .reduce((a, b) => a.bitwiseOR(b))
        val sigs = persistTracked("d03_sigs", Tables.documents(s, d)
          .select(col("doc_id"),
                  explode(split(col("text"), "\\s+")).as("w"))
          .select(col("doc_id"), xxhash64(col("w")).as("h"))
          .groupBy("doc_id")
          .agg(bitSums.head, bitSums.tail: _*)
          .select(col("doc_id"), simhashCol.as("simhash")))
        val chunks = sigs.select(
            col("doc_id"), col("simhash"),
            explode(expr(
              """transform(sequence(0, 3),
                |  c -> struct(c AS chunk_id,
                |              shiftright(simhash, c * 16) & 65535 AS chunk))
                |""".stripMargin)).as("ch"))
          .select(col("doc_id"), col("simhash"), col("ch.chunk_id"), col("ch.chunk"))
        val a = chunks.toDF("a_id", "a_hash", "chunk_id", "chunk")
        val b = chunks.toDF("b_id", "b_hash", "chunk_id", "chunk")
        a.join(b, Seq("chunk_id", "chunk"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
                  bit_count(expr("a_hash ^ b_hash")).as("hamming"))
          // filter BEFORE distinct: drops the (majority) non-matching
          // pairs map-side instead of shuffling them through the dedup
          .filter(col("hamming") <= 12)
          .distinct()
          .orderBy("a_id", "b_id")
      }),

    // Blocked character-set Jaccard pairs (SQL-expressible near-dup metric).
    // Blocking on (source, lang) bounds the per-block pair count by design.
    // Char-set Jaccard pairs, blocked on (source, lang, length DIV 50).
    // The length band keeps block sizes bounded as the corpus grows (a
    // 10x corpus probe put unbanded block pairs at 16M); near-identical
    // docs land in the same band by construction, and the oracle mirrors
    // the banding exactly. Per-doc codepoint sets are precomputed ONCE
    // (sorted array<long>), the per-pair metric is a zero-alloc merge
    // scan, and a size-ratio prefilter (implied by sim >= 0.8, so it
    // changes no results) drops most pairs before the scan.
    "d04_char_jaccard" -> OpDef.sql(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val docs = Tables.documents(s, d)
          .withColumn("len_band", (length(col("text")) / 50).cast("int"))
          .withColumn("chars", expr("codepoint_set(text)"))
          .select("doc_id", "source", "lang", "len_band", "chars")
        val a = docs.toDF("a_id", "source", "lang", "len_band", "a_chars")
        val b = docs.toDF("b_id", "source", "lang", "len_band", "b_chars")
        a.join(b, Seq("source", "lang", "len_band"))
          .filter(col("a_id") < col("b_id"))
          .filter(size(col("a_chars")) * 10 >= size(col("b_chars")) * 8 &&
                  size(col("b_chars")) * 10 >= size(col("a_chars")) * 8)
          .withColumn("sim_raw", expr("sorted_jaccard(a_chars, b_chars)"))
          .filter(col("sim_raw") >= 0.8)
          .select(col("a_id"), col("b_id"),
                  round(col("sim_raw") + lit(1e-8), 4).as("sim"))
          .orderBy("a_id", "b_id")
      },
      """WITH c AS (
        |  SELECT doc_id, source, lang, length(text) // 50 AS len_band,
        |         list_distinct(string_split_regex(text, '')) AS chars
        |  FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       round(CAST(len(list_intersect(a.chars, b.chars)) AS DOUBLE)
        |             / len(list_distinct(list_concat(a.chars, b.chars))) + 1e-8, 4) AS sim
        |FROM c a JOIN c b
        |  ON a.source = b.source AND a.lang = b.lang
        | AND a.len_band = b.len_band AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.chars, b.chars)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.chars, b.chars))) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin),

    // Word 3-gram Jaccard near-dup pairs, blocked on (source, lang). The
    // Spark side measures Jaccard over the hashed shingle sets (native
    // kernel, reused from minhash); the oracle over the raw shingle
    // strings — identical values since xxhash64 is injective on these
    // sets in practice, and the blocking bounds the pair count by design.
    "d10_ngram_jaccard" -> OpDef.sql(
      (s, d) => {
        val docs = withShingles(s, d)
          .withColumn("len_band", (length(col("text")) / 100).cast("int"))
          .withColumn("sh_sorted", array_sort(col("shingles")))
          .select("doc_id", "source", "lang", "len_band", "sh_sorted")
        val a = docs.toDF("a_id", "source", "lang", "len_band", "a_sh")
        val b = docs.toDF("b_id", "source", "lang", "len_band", "b_sh")
        a.join(b, Seq("source", "lang", "len_band"))
          .filter(col("a_id") < col("b_id"))
          // implied by sim >= 0.2 (sizes within 5x); drops pairs pre-scan
          .filter(size(col("a_sh")) * 5 >= size(col("b_sh")) &&
                  size(col("b_sh")) * 5 >= size(col("a_sh")))
          .withColumn("sim_raw", expr("sorted_jaccard(a_sh, b_sh)"))
          .filter(col("sim_raw") >= 0.2)
          .select(col("a_id"), col("b_id"),
                  round(col("sim_raw") + lit(1e-8), 4).as("sim"))
          .orderBy("a_id", "b_id")
      },
      """WITH sh AS (
        |  SELECT doc_id, source, lang, length(text) // 100 AS len_band,
        |         list_distinct(list_transform(
        |           generate_series(1, len(string_split_regex(text, '\s+')) - 2),
        |           i -> concat_ws(' ',
        |                  string_split_regex(text, '\s+')[i],
        |                  string_split_regex(text, '\s+')[i+1],
        |                  string_split_regex(text, '\s+')[i+2]))) AS shingles
        |  FROM documents),
        |nz AS (SELECT * FROM sh WHERE len(shingles) > 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |             / len(list_distinct(list_concat(a.shingles, b.shingles))) + 1e-8, 4) AS sim
        |FROM nz a JOIN nz b
        |  ON a.source = b.source AND a.lang = b.lang
        | AND a.len_band = b.len_band AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2
        |ORDER BY a_id, b_id""".stripMargin),

    // Rolling-hash fingerprinting: min/max/count over shingle hashes — a
    // compact per-document sketch for containment-style matching.
    "d08_fingerprint" -> OpDef.rowsOnly(
      (s, d) => withShingles(s, d)
        .select(
          col("doc_id"),
          size(col("shingles")).as("n_shingles"),
          expr("array_min(shingles)").as("min_hash"),
          expr("array_max(shingles)").as("max_hash"),
          // Rolling polynomial hash mod 1e15+37 via the native PolyHash
          // kernel (same fold as the SQL aggregate form, codegen'd).
          expr("poly_hash(shingles)").as("fingerprint"))
        .orderBy("doc_id"))
  )
}
