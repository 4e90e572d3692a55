package graft.operators

import org.apache.spark.sql.functions._
import graft.OpDef
import graft.sources.Tables

/** One decoded payload's features (m03 output row). */
final case class DecodedFeatures(doc_id: Long, n_bytes: Int, sig32: Long,
                                 fake_width: Int, n_frames: Int)

/** Multimodal column plumbing: treat payloads as opaque `binary` columns
  * with typed metadata. The container has no image/audio codecs, so the
  * decode step is a clearly-marked deterministic STUB (metadata derived
  * from byte length); the Spark-side plumbing — binary column, per-row
  * metadata extraction, schema — is real and oracle-checked.
  */
object Multimodal {

  val defs: Map[String, OpDef] = Map(

    "m01_multimodal" -> OpDef.sql(
      (s, d) => Tables.documents(s, d)
        // In production `payload` would be the raw image/audio bytes read
        // from the lake; here text bytes stand in for them.
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("byte_len", octet_length(col("payload")))
        .withColumn("content_hash", md5(col("payload")))
        // STUB decode: real codecs would emit width/height/duration; the
        // deterministic fake derives them from byte length so the pipeline
        // shape (schema, partitioning, per-row batch decode) is testable.
        .withColumn("fake_width", (col("byte_len") % 64).cast("int"))
        .withColumn("fake_height", (col("byte_len") % 48).cast("int"))
        .select("doc_id", "byte_len", "content_hash", "fake_width", "fake_height")
        .orderBy("doc_id"),
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |       md5(text) AS content_hash,
        |       CAST(octet_length(encode(text)) % 64 AS INT) AS fake_width,
        |       CAST(octet_length(encode(text)) % 48 AS INT) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Frame sampling: chunk each payload into fixed-size "frames", keep
    // every 2nd frame, emit per-frame metadata. This is the video
    // frame-extraction batch shape — a per-row explode whose fan-out is
    // bounded by payload size, shuffle-free, so it streams at scan speed;
    // a real decoder would replace the substr with a codec call inside the
    // same per-partition loop.
    "m02_frame_sample" -> OpDef.sql(
      (s, d) => Tables.documents(s, d)
        // empty payload -> no frames (Spark DIV truncates toward zero
        // while DuckDB // floors, so (0-1)/100 disagrees; excluding
        // empties keeps the engines identical and is the right semantics)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, CAST((length(text) - 1) DIV 100 AS INT)), i -> substr(text, i * 100 + 1, 100))")))
        .withColumnRenamed("pos", "frame_idx")
        .filter(col("frame_idx") % 2 === 0)
        .select(col("doc_id"), col("frame_idx"),
                length(col("col")).as("frame_len"),
                md5(col("col").cast("binary")).as("frame_hash"))
        .orderBy("doc_id", "frame_idx"),
      """WITH f AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0, (length(text) - 1) // 100)) AS i
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |       CAST(length(substr(text, CAST(i AS INT) * 100 + 1, 100)) AS INT) AS frame_len,
        |       md5(substr(text, CAST(i AS INT) * 100 + 1, 100)) AS frame_hash
        |FROM f WHERE i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin),

    // Batched decode via mapPartitions: the pattern a real media decoder
    // needs — one expensive decoder instance per PARTITION (here a reused
    // MessageDigest standing in for a codec context), streaming rows
    // through it. No shuffle, no driver collect, arbitrary per-row fan-in
    // logic. The decode itself is a deterministic STUB (md5-derived
    // features) so the oracle can reproduce it in SQL.
    "m03_decode_batch" -> OpDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            // per-partition decoder setup (the expensive part a codec
            // would pay once per task, not once per row)
            val md = java.security.MessageDigest.getInstance("MD5")
            rows.map { case (id, bytes) =>
              md.reset()
              val hex = md.digest(bytes).take(4)
                .map(b => f"${b & 0xff}%02x").mkString
              val sig32 = java.lang.Long.parseLong(hex, 16)
              DecodedFeatures(id, bytes.length, sig32,
                (sig32 % 640).toInt, bytes.length / 100 + 1)
            }
          }
          .toDF()
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       ('0x' || substr(md5(text), 1, 8))::BIGINT AS sig32,
        |       CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 640 AS INT) AS fake_width,
        |       CAST(octet_length(encode(text)) // 100 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)
  )
}
