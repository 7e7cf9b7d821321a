package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decode/feature-extract/frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB (byte-length/digest-derived
  * metadata); everything around it — binary column handling, schema,
  * partition-parallel decode via mapPartitions, batch shape — is real
  * Spark plumbing a codec-backed implementation would drop into.
  */
object Multimodal {

  /** One decoded media asset (the typed metadata a real decoder yields). */
  case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
      width: Long, height: Long, n_frames: Long, checksum: String)

  private def md5hex(media: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(media).map("%02x".format(_)).mkString

  /** REAL header decode (round 12 — replaces the stub for the two
    * formats whose dimensions live in fixed container structure,
    * public format knowledge only):
    *
    *  - PNG (RFC 2083): the 8-byte signature, then the mandatory
    *    first IHDR chunk — big-endian width at offset 16, height at
    *    20.
    *  - JPEG (ISO/IEC 10918-1): SOI, then marker segments scanned by
    *    their 2-byte lengths until the first frame header SOFn
    *    (0xC0–0xCF minus the non-frame C4/C8/CC) — big-endian height
    *    then width in its payload.
    *
    * Header-only: no sample data is decoded, no codec library. None
    * for anything else (truncated, other formats) — the caller falls
    * back to the stub seam.
    */
  def decodeHeader(media: Array[Byte]): Option[(String, Long, Long)] = {
    def u8(i: Int): Int = media(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
        (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val pngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (media.length >= 24 &&
        pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        new String(media.slice(12, 16), "US-ASCII") == "IHDR")
      Some(("png", be32(16), be32(20)))
    else if (media.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < media.length) {
        if (u8(i) != 0xff) return None // malformed marker stream
        val m = u8(i + 1)
        // EOI/SOS terminate the pre-frame segment walk: past SOS lies
        // entropy-coded data (not length-prefixed segments), and an
        // EOI before any SOFn means a truncated/corrupt stream —
        // reading on would interpret arbitrary bytes as segment
        // lengths and could match a spurious 0xff 0xCx pair in
        // garbage (ADVICE r12). Fall back to the stub instead.
        if (m == 0xd9 || m == 0xda) return None
        else if (m == 0xff) i += 1 // fill byte padding before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone
        else {
          val segLen = be16(i + 2)
          if (segLen < 2) return None
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof)
            return if (i + 8 < media.length)
              Some(("jpeg", be16(i + 7).toLong, be16(i + 5).toLong))
            else None
          i += 2 + segLen
        }
      }
      None
    } else None
  }

  /** STUB decoder for formats [[decodeHeader]] does not parse:
    * deterministic metadata derived from the bytes — the seam where a
    * codec library would plug in.
    */
  def decodeStub(docId: Long, media: Array[Byte]): MediaMeta = {
    val n = media.length.toLong
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(docId, n, fmt, 64 + n % 512, 64 + (n / 7) % 512,
      1 + n % 30, md5hex(media))
  }

  /** Decode one asset: real container-header dimensions for PNG/JPEG
    * bytes, the deterministic stub for everything else.
    */
  def decode(docId: Long, media: Array[Byte]): MediaMeta =
    decodeHeader(media) match {
      case Some((fmt, w, h)) =>
        MediaMeta(docId, media.length.toLong, fmt, w, h,
          n_frames = 1L, checksum = md5hex(media))
      case None => decodeStub(docId, media)
    }

  /** Partition-parallel decode path (the shape a real codec would use):
    * binary column in, typed Dataset out, one decoder instance per
    * partition — no per-row setup cost, no driver involvement.
    */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decode(id, bytes) } }
  }

  /** Oracle-checked face of the same pipeline, expressed as pure
    * expressions (text bytes play the media payload): binary metadata
    * extraction + frame-sampling arithmetic.
    */
  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val media = d.select(col("doc_id"), col("text").cast("binary").as("media"))
    val n = length(col("media")).cast("long")
    val out = media.select(
      col("doc_id"),
      n.as("n_bytes"),
      when(n % 3 === 0, "png").when(n % 3 === 1, "jpeg").otherwise("webp")
        .as("format"),
      (lit(64L) + n % 512).as("width"),
      (lit(64L) + (n.cast("long") / lit(7L)).cast("long") % 512).as("height"),
      (lit(1L) + n % 30).as("n_frames"),
      md5(col("media")).as("checksum"),
      // frame-sample plan: every 10th frame, ceil division
      (((lit(1L) + n % 30) + 9L) / lit(10L)).cast("long").as("n_sampled_frames"))
    canon(out)
  }

  val multimodalFeaturesSql: String =
    s"""SELECT doc_id,
       |  octet_length(text::BLOB) AS n_bytes,
       |  CASE WHEN octet_length(text::BLOB) % 3 = 0 THEN 'png'
       |       WHEN octet_length(text::BLOB) % 3 = 1 THEN 'jpeg'
       |       ELSE 'webp' END AS format,
       |  64 + octet_length(text::BLOB) % 512 AS width,
       |  64 + (octet_length(text::BLOB) // 7) % 512 AS height,
       |  1 + octet_length(text::BLOB) % 30 AS n_frames,
       |  md5(text) AS checksum,
       |  ((1 + octet_length(text::BLOB) % 30) + 9) // 10 AS n_sampled_frames
       |FROM documents
       |${canonOrderSql(Seq("doc_id", "n_bytes", "format", "width", "height",
         "n_frames", "checksum", "n_sampled_frames"))}""".stripMargin

  /** Frame sampling + resize planning: every 10th frame exploded to a
    * row (generator/UDTF shape — the decode stage downstream consumes
    * one frame per row), with aspect-preserving resize targets to fit
    * 224px. All arithmetic is int-derived doubles — identical across
    * engines.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val n = length(col("text").cast("binary")).cast("long")
    val media = d.select(
      col("doc_id"),
      (lit(1L) + n % 30).as("n_frames"),
      (lit(64L) + n % 512).as("width"),
      (lit(64L) + (n.cast("long") / lit(7L)).cast("long") % 512).as("height"))
    val scale = lit(224.0) / greatest(col("width"), col("height")).cast("double")
    val out = media
      .withColumn("frame_idx",
        explode(expr("sequence(0, n_frames - 1, 10)")))
      .select(
        col("doc_id"), col("frame_idx"),
        (col("frame_idx").cast("double") / 24.0).as("frame_ts"),
        floor(col("width").cast("double") * scale).cast("long").as("resized_w"),
        floor(col("height").cast("double") * scale).cast("long").as("resized_h"))
    canon(out)
  }

  val frameSampleSql: String =
    s"""WITH media AS (
       |  SELECT doc_id,
       |    1 + octet_length(text::BLOB) % 30 AS n_frames,
       |    64 + octet_length(text::BLOB) % 512 AS width,
       |    64 + (octet_length(text::BLOB) // 7) % 512 AS height
       |  FROM documents
       |)
       |SELECT doc_id, unnest(range(0, n_frames, 10)) AS frame_idx,
       |  CAST(unnest(range(0, n_frames, 10)) AS DOUBLE) / 24.0 AS frame_ts,
       |  CAST(floor(CAST(width AS DOUBLE) * (224.0 / CAST(greatest(width, height) AS DOUBLE))) AS BIGINT) AS resized_w,
       |  CAST(floor(CAST(height AS DOUBLE) * (224.0 / CAST(greatest(width, height) AS DOUBLE))) AS BIGINT) AS resized_h
       |FROM media
       |${canonOrderSql(Seq("doc_id", "frame_idx", "frame_ts", "resized_w", "resized_h"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> multimodalFeatures,
    "frame_sample" -> frameSample)

  val oracles: Map[String, String] = Map(
    "multimodal_features" -> multimodalFeaturesSql,
    "frame_sample" -> frameSampleSql)
}
