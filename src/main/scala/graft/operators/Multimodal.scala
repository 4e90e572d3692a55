package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.OpDef
import graft.sources.Tables

/** One decoded payload's features (m03 output row). */
final case class DecodedFeatures(doc_id: Long, n_bytes: Int, sig32: Long,
                                 fake_width: Int, n_frames: Int)

/** m04 output row: REAL P6 parse results (nulls = parse failure). */
final case class PpmFeatures(doc_id: Long, width: Option[Int],
                             height: Option[Int], maxval: Option[Int],
                             pixel_md5: Option[String])

/** m06 output row: one row per payload of a MIXED-format feed — the
  * sniffed format plus that format's features (nulls where the format
  * has no such feature, or on decode failure).
  */
final case class RoutedFeatures(doc_id: Long, fmt: String,
                                width: Option[Int], height: Option[Int],
                                n_channels: Option[Int],
                                sample_rate: Option[Int],
                                content_md5: Option[String])

/** A real decoder for a real public format: binary PPM (P6, the netpbm
  * spec) — magic, whitespace- and comment-tolerant ASCII header ints
  * (width, height, maxval), ONE whitespace byte, then exactly
  * width*height*3 pixel bytes. Pure JVM, no codec deps, and it parses
  * the actual bytes — nothing here knows how the payload was built.
  * Any malformation (bad magic, missing ints, truncated pixel data)
  * returns None rather than throwing: one corrupt blob must not fail an
  * intake batch.
  */
object PpmDecoder {

  /** Like [[parse]] but returns the raw pixel bytes (m08's resize input)
    * instead of their digest.
    */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    parseWith(bytes) { (w, h, mx, px) => (w, h, mx, px) }

  def parse(bytes: Array[Byte]): Option[(Int, Int, Int, String)] =
    parseWith(bytes) { (w, h, mx, px) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      (w, h, mx, md.digest(px).map(b => f"${b & 0xff}%02x").mkString)
    }

  private def parseWith[A](bytes: Array[Byte])(
      f: (Int, Int, Int, Array[Byte]) => A): Option[A] = {
    var p = 0
    def peek: Int = if (p < bytes.length) bytes(p) & 0xff else -1
    def skipWsAndComments(): Unit = {
      var go = true
      while (go) {
        while (p < bytes.length && Character.isWhitespace(peek)) p += 1
        if (peek == '#') while (p < bytes.length && peek != '\n') p += 1
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipWsAndComments()
      val st = p
      while (p < bytes.length && peek >= '0' && peek <= '9') p += 1
      if (p == st || p - st > 9) None
      else Some(new String(bytes, st, p - st, "US-ASCII").toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    p = 2
    for {
      w <- readInt()
      h <- readInt()
      mx <- readInt()
      // exactly one whitespace byte separates maxval from pixel data
      _ <- if (p < bytes.length && Character.isWhitespace(peek)) Some(())
           else None
      // header dims are untrusted 9-digit ints: w*h*3 overflows Int
      // (a negative n would pass the fit check and make copyOfRange
      // throw), so the byte count stays in Long until the fit check
      // bounds it by the actual payload length
      n = w.toLong * h * 3
      _ <- { p += 1; if (bytes.length - p >= n) Some(()) else None }
    } yield f(w, h, mx,
      java.util.Arrays.copyOfRange(bytes, p, p + n.toInt))
  }
}

/** m08 output row: real decode -> resample -> digest (nulls = decode
  * failure, mirroring m04's visible policy).
  */
final case class ResizedFeatures(doc_id: Long, out_w: Option[Int],
                                 out_h: Option[Int],
                                 resized_md5: Option[String])

/** m05 output row: REAL RIFF/WAVE parse results (nulls = parse failure). */
final case class WavFeatures(doc_id: Long, n_channels: Option[Int],
                             sample_rate: Option[Int], bits: Option[Int],
                             n_samples: Option[Long],
                             data_md5: Option[String])

/** A real decoder for a second real public format: RIFF/WAVE PCM (the
  * Microsoft multimedia container spec) — "RIFF" magic + LE u32 size +
  * "WAVE", then a WALK over (id, LE u32 size) sub-chunks honoring the
  * word-alignment pad on odd sizes, tolerant of unknown chunks (LIST
  * etc. — real encoders insert them), requiring one PCM "fmt " chunk
  * (audioFormat == 1) and one "data" chunk whose declared size fits the
  * actual bytes. Pure JVM, no codec deps; any malformation (bad magic,
  * non-PCM, truncated data) returns None rather than throwing — one
  * corrupt blob must not fail an intake batch. The declared RIFF size
  * is deliberately NOT validated (real files get it wrong constantly);
  * iteration is bounded by the actual byte length instead.
  */
object WavDecoder {

  /** The chunk walk shared by [[parse]] and [[channel0]]: returns
    * (channels, rate, bits, dataOff, dataLen) for a well-formed PCM
    * file, None on any malformation.
    */
  private def header(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    def tag(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var p = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var dataOff = -1
    var dataLen = -1L
    while (p + 8 <= bytes.length && (fmt.isEmpty || dataOff < 0)) {
      val id = tag(p)
      val sz = u32(p + 4)
      if (id == "fmt " && sz >= 16 && p + 24 <= bytes.length) {
        if (u16(p + 8) != 1) return None // PCM only
        fmt = Some((u16(p + 10), u32(p + 12).toInt, u16(p + 22)))
      } else if (id == "data") {
        dataOff = p + 8; dataLen = sz
      }
      // advance in LONG: sz is an untrusted u32, and a crafted size near
      // 2^31 would overflow an Int step to a negative p (tag() throwing)
      // or to zero (an infinite loop). Clamping to bytes.length ends the
      // walk on the loop condition; a declared size past the real bytes
      // then fails the dataLen fit check below -> None, never a throw.
      val next = p.toLong + 8L + sz + (sz % 2) // odd chunks carry a pad byte
      p = if (next > bytes.length) bytes.length else next.toInt
    }
    for {
      (c, r, b) <- fmt
      blockAlign = c * b / 8
      _ <- if (blockAlign > 0 && dataOff >= 0 &&
               dataOff + dataLen <= bytes.length) Some(()) else None
    } yield (c, r, b, dataOff, dataLen)
  }

  def parse(bytes: Array[Byte]): Option[(Int, Int, Int, Long, String)] =
    header(bytes).map { case (c, r, b, dataOff, dataLen) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(java.util.Arrays.copyOfRange(
          bytes, dataOff, dataOff + dataLen.toInt))
        .map(x => f"${x & 0xff}%02x").mkString
      (c, r, b, dataLen / (c * b / 8), hex)
    }

  /** Channel-0 PCM samples, at most `maxSamples`: 16-bit little-endian
    * signed, or 8-bit unsigned recentred to [-128, 127] (both per the
    * WAVE PCM spec). Other bit depths return None — a visible policy, a
    * decoder must never guess a sample format.
    */
  def channel0(bytes: Array[Byte], maxSamples: Int): Option[Array[Int]] =
    header(bytes).flatMap { case (c, _, b, dataOff, dataLen) =>
      if (b != 8 && b != 16) None
      else {
        val ba = c * b / 8
        val n = math.min(dataLen / ba, maxSamples.toLong).toInt
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val p = dataOff + i * ba
          out(i) =
            if (b == 16) ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort.toInt
            else (bytes(p) & 0xff) - 128
          i += 1
        }
        Some(out)
      }
    }
}

/** Multimodal column plumbing: treat payloads as opaque `binary` columns
  * with typed metadata. The container has no image/audio codecs, so the
  * decode step is a clearly-marked deterministic STUB (metadata derived
  * from byte length); the Spark-side plumbing — binary column, per-row
  * metadata extraction, schema — is real and oracle-checked.
  */
object Multimodal {

  /** Hex of `x`'s low `nBytes` bytes in LITTLE-endian order (the RIFF
    * wire encoding), built from codegen'd format_string — the in-plan
    * synthesis path for m05's binary headers.
    */
  /** m06's per-payload dispatch: sniff the magic, run THAT format's
    * real decoder, emit the unified row. A recognized magic with a
    * failed decode keeps its `fmt` and nulls the features — routing
    * knowledge is never thrown away just because the body is damaged
    * (the downstream quarantine wants "broken wav", not "unknown").
    */
  private[graft] def route(id: Long, bytes: Array[Byte]): RoutedFeatures = {
    def is(s: String) =
      bytes.length >= s.length &&
        s.indices.forall(i => bytes(i) == s.charAt(i).toByte)
    if (is("P6"))
      PpmDecoder.parse(bytes) match {
        case Some((w, h, _, md5)) =>
          RoutedFeatures(id, "ppm", Some(w), Some(h), None, None, Some(md5))
        case None => RoutedFeatures(id, "ppm", None, None, None, None, None)
      }
    else if (is("RIFF") || is("RIFX"))
      WavDecoder.parse(bytes) match {
        case Some((c, r, _, _, md5)) =>
          RoutedFeatures(id, "wav", None, None, Some(c), Some(r), Some(md5))
        case None => RoutedFeatures(id, "wav", None, None, None, None, None)
      }
    else RoutedFeatures(id, "unknown", None, None, None, None, None)
  }

  private def leHex(x: org.apache.spark.sql.Column, nBytes: Int) =
    concat((0 until nBytes).map(i =>
      format_string("%02x", shiftright(x, 8 * i).bitwiseAND(lit(255)))): _*)

  /** m05/m07's shared synthetic WAV feed: one RIFF payload per document,
    * every header/data byte derived from (doc_id, md5(text)) — the same
    * bytes the oracles reconstruct analytically in SQL. Damage classes:
    * %13 truncated data, %19 RIFX magic, %7 LIST chunk, %11 data-first
    * chunk order (+pad). Returns (doc_id, payload binary).
    */
  /** m04/m08's shared PPM feed: one P6 payload per document (w, h from
    * doc_id mods, pixel bytes from md5(text) repeated; %17 docs carry a
    * truncated "P6" magic, %5 docs an inline comment the header parser
    * must skip).
    */
  private[graft] def ppmPayload(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("CAST(doc_id % 8 AS INT) + 1").as("w"),
        expr("CAST((doc_id DIV 8) % 8 AS INT) + 1").as("h"),
        col("text"))
      .withColumn("n", expr("w * h * 3"))
      .withColumn("pixels", expr(
        "substr(repeat(md5(text), CAST((n - 1) DIV 32 AS INT) + 1), 1, n)"))
      .withColumn("payload",
        when(col("doc_id") % 17 === 0, lit("P6"))
          .otherwise(concat(
            lit("P6\n"),
            when(col("doc_id") % 5 === 0, lit("# synthetic\n")).otherwise(lit("")),
            col("w").cast("string"), lit(" "), col("h").cast("string"),
            lit("\n255\n"), col("pixels")))
          .cast("binary"))
      .select(col("doc_id"), col("payload"))

  /** m07's kernel: 16-point Walsh-Hadamard coefficients (bins 0-7) of
    * every full non-overlapping frame of `samples` — integer-exact,
    * twiddle (-1)^popcount(k AND n). Returns (frame, k, coef) rows.
    */
  private[graft] def whtFrames(samples: Array[Int]): Seq[(Int, Int, Long)] = {
    val nf = samples.length / 16
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int, Long)](nf * 8)
    var f = 0
    while (f < nf) {
      var k = 0
      while (k < 8) {
        var acc = 0L
        var n = 0
        while (n < 16) {
          acc += samples(f * 16 + n).toLong *
            (1 - 2 * (java.lang.Integer.bitCount(k & n) & 1))
          n += 1
        }
        out += ((f, k, acc))
        k += 1
      }
      f += 1
    }
    out.toSeq
  }

  /** m08's kernel: nearest-neighbor half-size resample of an RGB pixel
    * buffer — out(x2, y2) = in(2*x2, 2*y2), ceil-half output dims so a
    * 1-pixel axis survives. Real byte shuffling on the decoded image,
    * not metadata arithmetic.
    */
  private[graft] def resizeHalf(w: Int, h: Int,
      px: Array[Byte]): (Int, Int, Array[Byte]) = {
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val out = new Array[Byte](w2 * h2 * 3)
    var y2 = 0
    while (y2 < h2) {
      var x2 = 0
      while (x2 < w2) {
        val src = ((2 * y2) * w + 2 * x2) * 3
        val dst = (y2 * w2 + x2) * 3
        out(dst) = px(src); out(dst + 1) = px(src + 1)
        out(dst + 2) = px(src + 2)
        x2 += 1
      }
      y2 += 1
    }
    (w2, h2, out)
  }

  /** m06/s25's shared oracle: the routing ladder + each format's
    * analytic decode, replayed in SQL.
    */
  private[graft] val duckM06Sql: String =
    """WITH p AS (
      |  SELECT doc_id, text,
      |         CAST(doc_id % 8 + 1 AS INT) AS pw,
      |         CAST((doc_id // 8) % 8 + 1 AS INT) AS ph,
      |         CAST(doc_id % 2 + 1 AS INT) AS c,
      |         CAST(8000 * (1 + (doc_id // 3) % 3) AS INT) AS r,
      |         CAST(10 + (doc_id // 3) % 90 AS INT) AS ns
      |  FROM documents),
      |q AS (SELECT *,
      |        CASE WHEN doc_id % 3 = 0 THEN pw * ph * 3 ELSE ns * c END AS n
      |      FROM p)
      |SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav'
      |       ELSE 'unknown' END AS fmt,
      |  CASE WHEN doc_id % 3 = 0 THEN pw END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN ph END AS height,
      |  CASE WHEN doc_id % 3 = 1 THEN c END AS n_channels,
      |  CASE WHEN doc_id % 3 = 1 THEN r END AS sample_rate,
      |  CASE WHEN doc_id % 3 <= 1
      |       THEN md5(substr(repeat(md5(text), (n - 1) // 32 + 1), 1, n))
      |       END AS content_md5
      |FROM q ORDER BY doc_id""".stripMargin

  /** m06/s25's shared MIXED-format feed: one payload per document,
    * format chosen by doc_id ladder — PPM (%3==0, m04's valid form),
    * canonical 8-bit WAV (%3==1), junk md5 bytes whose head can never
    * collide with either magic (%3==2). Every byte derives from
    * (doc_id, md5(text)) so the oracles reconstruct it analytically.
    */
  private[graft] def mixedPayload(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .withColumn("pw", expr("CAST(doc_id % 8 AS INT) + 1"))
      .withColumn("ph", expr("CAST((doc_id DIV 8) % 8 AS INT) + 1"))
      .withColumn("pn", expr("pw * ph * 3"))
      .withColumn("c", expr("CAST(doc_id % 2 AS INT) + 1"))
      .withColumn("r", expr("CAST(8000 * (1 + (doc_id DIV 3) % 3) AS INT)"))
      .withColumn("ns", expr("CAST(10 + (doc_id DIV 3) % 90 AS INT)"))
      .withColumn("wn", expr("ns * c")) // 8-bit: blockAlign == c
      .withColumn("n", when(col("doc_id") % 3 === 0, col("pn"))
        .otherwise(col("wn")))
      .withColumn("body", expr(
        "substr(repeat(md5(text), CAST((n - 1) DIV 32 AS INT) + 1), 1, n)"))
      .withColumn("payload",
        when(col("doc_id") % 3 === 0,
          concat(lit("P6\n"), col("pw").cast("string"), lit(" "),
            col("ph").cast("string"), lit("\n255\n"), col("body"))
            .cast("binary"))
        .when(col("doc_id") % 3 === 1,
          concat(
            unhex(concat(
              lit("52494646"), leHex(lit(4 + 24 + 8) + col("wn"), 4),
              lit("57415645"),
              lit("666d7420"), leHex(lit(16), 4),
              leHex(lit(1), 2), leHex(col("c"), 2), leHex(col("r"), 4),
              leHex(col("r") * col("c"), 4), leHex(col("c"), 2),
              leHex(lit(8), 2),
              lit("64617461"), leHex(col("wn"), 4))),
            col("body").cast("binary")))
        .otherwise(md5(col("text")).cast("binary")))
      .select(col("doc_id"), col("payload"))

  /** m06's routing pass over any (doc_id, payload) frame — per-row
    * stateless map work, so s25 runs it UNCHANGED on a binary stream.
    */
  private[graft] def routeAll(s: SparkSession, payloads: DataFrame): DataFrame = {
    import s.implicits._
    payloads.as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) => route(id, bytes) })
      .toDF()
  }

  private[graft] def wavPayload(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
          .select(col("doc_id"),
            expr("CAST(doc_id % 2 AS INT) + 1").as("c"),
            expr("CAST(8 * (1 + (doc_id DIV 2) % 2) AS INT)").as("bits"),
            expr("CAST(8000 * (1 + doc_id % 3) AS INT)").as("r"),
            expr("CAST(10 + doc_id % 90 AS INT)").as("ns"),
            col("text"))
          .withColumn("ba", expr("c * bits DIV 8")) // frame = ba bytes
          .withColumn("n", expr("ns * ba"))
          .withColumn("dataStr", expr(
            "substr(repeat(md5(text), CAST((n - 1) DIV 32 AS INT) + 1), 1, n)"))
          .withColumn("listHex", // "LIST" <4> "INFO", word-aligned
            when(col("doc_id") % 7 === 0,
                 lit("4c495354" + "04000000" + "494e464f"))
              .otherwise(lit("")))
          .withColumn("dataFirst", col("doc_id") % 11 === 0)
          .withColumn("riffSize",
            lit(4 + 24) + when(col("doc_id") % 7 === 0, 12).otherwise(0)
              + lit(8) + col("n")
              + when(col("dataFirst") && col("n") % 2 === 1, 1).otherwise(0))
          .withColumn("magicHex",
            when(col("doc_id") % 19 === 0, lit("52494658")) // "RIFX"
              .otherwise(lit("52494646")))                  // "RIFF"
          .withColumn("fmtHex", concat(
            lit("666d7420"), leHex(lit(16), 4),    // fmt , size 16
            leHex(lit(1), 2),                      // PCM
            leHex(col("c"), 2),                    // channels
            leHex(col("r"), 4),                    // sample rate
            leHex(col("r") * col("ba"), 4),        // byte rate
            leHex(col("ba"), 2),                   // block align
            leHex(col("bits"), 2)))                // bits per sample
          .withColumn("dataHdrHex",
            concat(lit("64617461"), leHex(col("n"), 4))) // data, size n
          // chunk order: canonical fmt->data, or data->pad?->fmt on the
          // data-first docs (the pad byte keeps fmt word-aligned when
          // the data payload has odd length)
          .withColumn("preHex", concat(
            col("magicHex"), leHex(col("riffSize"), 4),
            lit("57415645"),                       // WAVE
            col("listHex"),
            when(col("dataFirst"), col("dataHdrHex"))
              .otherwise(concat(col("fmtHex"), col("dataHdrHex")))))
          .withColumn("postHex",
            when(col("dataFirst"),
                 concat(when(col("n") % 2 === 1, lit("00")).otherwise(lit("")),
                        col("fmtHex")))
              .otherwise(lit("")))
          .withColumn("payload", concat(
            unhex(col("preHex")),
            // every 13th doc: write only half the declared data bytes
            when(col("doc_id") % 13 === 0,
                 expr("CAST(substr(dataStr, 1, CAST(n DIV 2 AS INT)) AS BINARY)"))
              .otherwise(col("dataStr").cast("binary")),
            unhex(col("postHex"))))
          .select(col("doc_id"), col("payload"))

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
        |FROM documents ORDER BY doc_id""".stripMargin),

    // A REAL format decode end-to-end (no codec stub): each doc gets a
    // deterministic binary P6 PPM payload synthesized in-plan — header
    // dims from doc_id, a comment line on every 5th doc, a deliberately
    // TRUNCATED payload on every 17th, pixel bytes from the doc's md5
    // hex repeated (pure ASCII, so chars == bytes in both engines) —
    // and PpmDecoder parses the BYTES back in the m03 mapPartitions
    // shape (one MessageDigest per partition, no shuffle, scan speed).
    // The oracle predicts the parse results purely from the
    // construction parameters, so a parser that misreads the header,
    // mishandles comments, or md5s the wrong byte range hash-mismatches
    // loudly; the truncated payloads prove the failure path yields
    // nulls, not exceptions.
    "m04_decode_ppm" -> OpDef.sql(
      (s, d) => {
        import s.implicits._
        ppmPayload(s, d)
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, bytes) =>
              PpmDecoder.parse(bytes) match {
                case Some((w, h, mx, md5)) =>
                  PpmFeatures(id, Some(w), Some(h), Some(mx), Some(md5))
                case None => PpmFeatures(id, None, None, None, None)
              }
            }
          }
          .toDF()
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  CASE WHEN doc_id % 17 = 0 THEN NULL
        |       ELSE CAST(doc_id % 8 + 1 AS INT) END AS width,
        |  CASE WHEN doc_id % 17 = 0 THEN NULL
        |       ELSE CAST((doc_id // 8) % 8 + 1 AS INT) END AS height,
        |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 255 END AS maxval,
        |  CASE WHEN doc_id % 17 = 0 THEN NULL
        |       ELSE md5(substr(repeat(md5(text),
        |              CAST(((doc_id % 8 + 1) * ((doc_id // 8) % 8 + 1) * 3 - 1) // 32 AS INT) + 1),
        |            1, CAST((doc_id % 8 + 1) * ((doc_id // 8) % 8 + 1) * 3 AS INT))) END AS pixel_md5
        |FROM documents ORDER BY doc_id""".stripMargin),

    // A SECOND real format decode: RIFF/WAVE PCM, m04's discipline on
    // an audio container. Each doc gets a byte-exact WAV synthesized
    // IN-PLAN (header ints written little-endian through unhex'd
    // format_string hex — the construction is Catalyst expressions the
    // oracle can reason about, not JVM code the parser might share bugs
    // with): channels (mono/stereo), bit depth (8/16 — blockAlign 1, 2
    // or 4, so multi-byte sample frames are exercised, not just the
    // byte-per-frame case) and sample count derived from doc_id; sample
    // bytes from the doc's md5 hex repeated (pure ASCII — byte counts
    // equal char counts in both engines); a spurious LIST chunk on
    // every 7th doc and the data chunk written BEFORE the fmt chunk on
    // every 11th (together they prove the parser WALKS chunks in any
    // order instead of assuming the canonical 44-byte layout — and the
    // odd-length data-first docs put the word-alignment pad byte
    // mid-walk, where skipping it misaligns every later tag); a
    // truncated data payload on every 13th and a corrupted magic on
    // every 19th (both must yield nulls, never throws). WavDecoder
    // parses the BYTES back in the m03 mapPartitions shape; the oracle
    // predicts every parsed field purely from the construction
    // parameters.
    "m05_decode_wav" -> OpDef.sql(
      (s, d) => {
        import s.implicits._
        wavPayload(s, d)
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, bytes) =>
              WavDecoder.parse(bytes) match {
                case Some((c, r, b, ns, md5)) =>
                  WavFeatures(id, Some(c), Some(r), Some(b), Some(ns),
                    Some(md5))
                case None => WavFeatures(id, None, None, None, None, None)
              }
            }
          }
          .toDF()
          .orderBy("doc_id")
      },
      """WITH p AS (
        |  SELECT doc_id, text,
        |         CAST(doc_id % 2 + 1 AS INT) AS c,
        |         CAST(8 * (1 + (doc_id // 2) % 2) AS INT) AS bits,
        |         CAST(8000 * (1 + doc_id % 3) AS INT) AS r,
        |         CAST(10 + doc_id % 90 AS INT) AS ns,
        |         doc_id % 13 = 0 OR doc_id % 19 = 0 AS corrupt
        |  FROM documents),
        |q AS (SELECT *, ns * (c * bits // 8) AS n FROM p)
        |SELECT doc_id,
        |  CASE WHEN corrupt THEN NULL ELSE c END AS n_channels,
        |  CASE WHEN corrupt THEN NULL ELSE r END AS sample_rate,
        |  CASE WHEN corrupt THEN NULL ELSE bits END AS bits,
        |  CASE WHEN corrupt THEN NULL
        |       ELSE CAST(ns AS BIGINT) END AS n_samples,
        |  CASE WHEN corrupt THEN NULL
        |       ELSE md5(substr(repeat(md5(text), (n - 1) // 32 + 1),
        |                       1, n)) END AS data_md5
        |FROM q ORDER BY doc_id""".stripMargin),

    // m07: framed WALSH-HADAMARD spectrum over the decoded PCM — the
    // feature-extraction stage after m05's decode (the perceptual-hash
    // front end: per-frame spectral coefficients are what an audio
    // fingerprinter actually consumes). The decode (real bytes, real
    // chunk walk) extracts channel-0 samples; framing and the 16-point
    // WHT run in the SAME flatMap — integer arithmetic with twiddles
    // (-1)^popcount(k AND n), so the transform is EXACT in both engines
    // (no libm, no rounding discipline needed: the one DSP transform
    // with zero cross-engine float risk). The first in-plan form
    // computed the WHT through transform/aggregate higher-order
    // functions — interpreted per (frame, bin, sample): 968 CPU-seconds
    // at sf10 for what is 256M integer multiply-adds; fused into the
    // decoder pass it is plain JVM arithmetic at scan speed.
    // Undecodable payloads (m05's corrupt classes) and clips shorter
    // than one frame contribute no rows by construction — the same
    // visible policy the oracle replays. Output is bounded at
    // frames*bins = 32 rows/doc.
    "m07_wht_spectrum" -> OpDef.sql(
      (s, d) => {
        import s.implicits._
        wavPayload(s, d)
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.flatMap { case (id, bytes) =>
              WavDecoder.channel0(bytes, maxSamples = 64)
                .toSeq.flatMap(ss => whtFrames(ss).map {
                  case (f, k, c) => (id, f, k, c) })
            }
          }
          .toDF("doc_id", "frame", "k", "coef")
          .orderBy("doc_id", "frame", "k")
      },
      """WITH p AS (
        |  SELECT doc_id, text,
        |         CAST(doc_id % 2 + 1 AS INT) AS c,
        |         CAST(8 * (1 + (doc_id // 2) % 2) AS INT) AS bits,
        |         CAST(10 + doc_id % 90 AS INT) AS ns
        |  FROM documents
        |  WHERE doc_id % 13 <> 0 AND doc_id % 19 <> 0),
        |q AS (SELECT doc_id, text, c, bits, ns,
        |             c * bits // 8 AS ba,
        |             ns * (c * bits // 8) AS n
        |      FROM p),
        |ds AS (SELECT doc_id, c, bits, ns, ba,
        |              substr(repeat(md5(text), (n - 1) // 32 + 1), 1, n) AS dataStr
        |       FROM q),
        |s AS (
        |  -- 16-bit samples decode SIGNED, matching WavDecoder.channel0's
        |  -- short semantics: hi >= 128 wraps negative. The synthetic
        |  -- feed's data bytes are md5 hex ASCII (< 0x80) so the branch
        |  -- never fires there, but a feed with real high bytes must not
        |  -- silently diverge from the kernel.
        |  SELECT doc_id, CAST(i AS INT) AS i,
        |         CASE WHEN bits = 16
        |              THEN ascii(substr(dataStr, CAST(i * ba + 1 AS INT), 1))
        |                   + 256 * ascii(substr(dataStr, CAST(i * ba + 2 AS INT), 1))
        |                   - CASE WHEN ascii(substr(dataStr, CAST(i * ba + 2 AS INT), 1)) >= 128
        |                          THEN 65536 ELSE 0 END
        |              ELSE ascii(substr(dataStr, CAST(i * ba + 1 AS INT), 1)) - 128
        |         END AS v
        |  FROM ds, unnest(range(0, least((ns // 16) * 16, 64))) t(i)),
        |co AS (
        |  SELECT doc_id, CAST(i // 16 AS INT) AS frame, CAST(k AS INT) AS k,
        |         CAST(sum(v * (1 - 2 * (bit_count(k & (i % 16)) % 2)))
        |              AS BIGINT) AS coef
        |  FROM s, unnest(range(0, 8)) u(k)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, frame, k, coef FROM co
        |ORDER BY doc_id, frame, k""".stripMargin),


    // m06: FORMAT ROUTING over a mixed binary feed — the dispatch a
    // multimodal lake needs BEFORE any decoder runs: payloads arrive
    // as one opaque binary column with no format column, and the
    // router sniffs magic bytes ("P6" → image tier, "RIFF"/"RIFX" →
    // audio tier, anything else → unknown/quarantine) then runs the
    // RIGHT real decoder (m04's PPM, m05's WAV) in the SAME
    // mapPartitions pass — one scan, one task, no per-format re-read
    // of the lake, and the unified nullable schema is what a routing
    // stage must emit so downstream tiers can filter on `fmt` with
    // partition pruning after the split lands. Feed: one payload per
    // doc, format by doc_id ladder (PPM / canonical 8-bit WAV / junk
    // bytes whose md5-hex head can never collide with either magic).
    // The oracle replays the routing rule and each format's expected
    // decode analytically — m04/m05's oracle idiom composed.
    "m06_format_route" -> OpDef.sql(
      (s, d) => routeAll(s, mixedPayload(s, d)).orderBy("doc_id"),
      duckM06Sql),

    // m08: REAL IMAGE RESIZE — the transform stage the multimodal brief
    // names (decode / feature-extract / RESIZE / frame-sample), on the
    // real decoder's output instead of a stub: decode P6 (PpmDecoder,
    // actual bytes), nearest-neighbor half-size resample (a genuine
    // pixel shuffle — out(x,y) = in(2x, 2y), ceil-half dims so 1-pixel
    // axes survive), digest the resampled buffer. Per-row map work at
    // scan speed; output is one row per payload, nulls on decode
    // failure (m04's visible policy). HASH-PROVEN: the oracle
    // reconstructs the pixel string analytically and replays the
    // resample as substring arithmetic over the (y2, x2) grid — the
    // JVM byte shuffle and the SQL index math must agree on every
    // pixel of every image.
    "m08_ppm_resize" -> OpDef.sql(
      (s, d) => {
        import s.implicits._
        ppmPayload(s, d)
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, bytes) =>
              PpmDecoder.decode(bytes) match {
                case Some((w, h, _, px)) =>
                  val (w2, h2, out) = resizeHalf(w, h, px)
                  val md = java.security.MessageDigest.getInstance("MD5")
                  ResizedFeatures(id, Some(w2), Some(h2),
                    Some(md.digest(out).map(b => f"${b & 0xff}%02x").mkString))
                case None => ResizedFeatures(id, None, None, None)
              }
            }
          }
          .toDF()
          .orderBy("doc_id")
      },
      """WITH p AS (
        |  SELECT doc_id, text,
        |         CAST(doc_id % 8 + 1 AS INT) AS w,
        |         CAST((doc_id // 8) % 8 + 1 AS INT) AS h
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, w, h, (w + 1) // 2 AS w2, (h + 1) // 2 AS h2,
        |         substr(repeat(md5(text), (w * h * 3 - 1) // 32 + 1),
        |                1, w * h * 3) AS pixels
        |  FROM p WHERE doc_id % 17 <> 0),
        |px AS (
        |  SELECT doc_id, y2, x2,
        |         substr(pixels, CAST(((2 * y2) * w + 2 * x2) * 3 + 1 AS INT),
        |                3) AS pc
        |  FROM q, unnest(range(0, h2)) ty(y2), unnest(range(0, w2)) tx(x2)),
        |r AS (
        |  SELECT doc_id, md5(string_agg(pc, '' ORDER BY y2, x2)) AS rmd5
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CASE WHEN d.doc_id % 17 = 0 THEN NULL
        |            ELSE CAST((d.doc_id % 8 + 1 + 1) // 2 AS INT) END AS out_w,
        |       CASE WHEN d.doc_id % 17 = 0 THEN NULL
        |            ELSE CAST(((d.doc_id // 8) % 8 + 1 + 1) // 2 AS INT) END AS out_h,
        |       r.rmd5 AS resized_md5
        |FROM documents d LEFT JOIN r USING (doc_id)
        |ORDER BY doc_id""".stripMargin)
  )
}
