package graft.operators

import org.apache.spark.sql.functions._
import graft.OpDef
import graft.sources.Tables

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
        |FROM documents ORDER BY doc_id""".stripMargin)
  )
}
