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

  /** Deterministic container-byte synthesis for the DECODE GATE
    * (round 13): each doc_id yields real PNG/JPEG header bytes whose
    * dimensions are pure doc_id arithmetic — so [[decodeHeader]] can
    * sit on the DuckDB oracle gate with the oracle computing the
    * expected dimensions arithmetically while the engine round-trips
    * them through genuine container structure. Four shapes:
    * kind = doc_id % 4 — 0: PNG (IHDR); 1: baseline JPEG (SOF0
    * behind a skipped APP0); 2: progressive JPEG (SOF2 behind APP0 +
    * a DHT segment); 3: a CORRUPT stream (EOI before any SOFn,
    * followed by FF C0 bait bytes an unterminated scan would misread
    * — the ADVICE r12 case) that must fall back to the stub seam.
    * Byte lengths are fixed per kind (33 / 39 / 45 / 4 + doc_id % 7),
    * spec-pinned, so the oracle's n_bytes arithmetic cannot drift
    * from the builder.
    */
  private[graft] def synthMedia(docId: Long): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    val w = (16 + docId % 1000).toInt
    val h = (16 + (docId * 7) % 1000).toInt
    def jpeg(sof: Int, dht: Boolean): Array[Byte] = {
      val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      val dhtSeg =
        if (dht) Array(0xff, 0xc4).map(_.toByte) ++ be16(4) ++
          Array[Byte](0, 0)
        else Array.empty[Byte]
      val sofSeg = Array(0xff.toByte, sof.toByte) ++ be16(17) ++
        Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ dhtSeg ++ sofSeg
    }
    (docId % 4).toInt match {
      case 0 =>
        Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
          .map(_.toByte) ++
          be32(13) ++ "IHDR".getBytes("US-ASCII") ++
          be32(w.toLong) ++ be32(h.toLong) ++
          Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
      case 1 => jpeg(0xc0, dht = false)
      case 2 => jpeg(0xc2, dht = true)
      case _ =>
        val pad = (docId % 7).toInt
        val bait =
          if (pad >= 2) Array(0xff.toByte, 0xc0.toByte) ++
            Array.fill(pad - 2)(0.toByte)
          else Array.fill(pad)(0.toByte)
        Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte) ++ bait
    }
  }

  /** multimodal_decode — the REAL header decode on the hard gate
    * (round 13): synthesized container bytes distributed over the
    * corpus, decoded partition-parallel by [[decodeMedia]], checked
    * against an oracle that derives the dimensions arithmetically.
    * The corrupt kind pins the stub-fallback seam (and the EOI
    * terminator) on the same row.
    */
  def multimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions(_.map(id => (id, synthMedia(id))))
      .toDF("doc_id", "media")
    canon(decodeMedia(spark, media).toDF()
      .select(col("doc_id"), col("n_bytes"), col("format"),
        col("width"), col("height"), col("n_frames")))
  }

  val multimodalDecodeSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, doc_id % 4 AS kind,
       |    16 + doc_id % 1000 AS w,
       |    16 + (doc_id * 7) % 1000 AS h,
       |    4 + doc_id % 7 AS cn
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CASE WHEN kind = 0 THEN 33 WHEN kind = 1 THEN 39
       |       WHEN kind = 2 THEN 45 ELSE cn END AS n_bytes,
       |  CASE WHEN kind = 0 THEN 'png'
       |       WHEN kind IN (1, 2) THEN 'jpeg'
       |       WHEN cn % 3 = 0 THEN 'png'
       |       WHEN cn % 3 = 1 THEN 'jpeg'
       |       ELSE 'webp' END AS format,
       |  CASE WHEN kind <= 2 THEN w ELSE 64 + cn % 512 END AS width,
       |  CASE WHEN kind <= 2 THEN h ELSE 64 + (cn // 7) % 512 END AS height,
       |  CASE WHEN kind <= 2 THEN 1 ELSE 1 + cn % 30 END AS n_frames
       |FROM m
       |${canonOrderSql(Seq("doc_id", "n_bytes", "format", "width",
         "height", "n_frames"))}""".stripMargin

  /** REAL image fixtures (round 14): five genuine small files shipped
    * as classpath resources under `graft/media/` — container padding
    * the synthesized [[synthMedia]] bytes can't exercise:
    *
    *  - real1.png / real2.png: W3C doc icons (Debian libxslt doc
    *    tree) whose IHDR is followed by ANCILLARY chunks (bKGD,
    *    pHYs, tIME) before IDAT,
    *  - real3.jpg: the CPython test-suite JFIF baseline thumbnail,
    *  - real4.jpg: an Apache Spark `data/mllib` sample photo whose
    *    pre-frame stream is APP0 + APP1(EXIF) + APP13(Photoshop) +
    *    APP2(ICC) + APP1 + 2×DQT before SOF0 — the EXIF-skip case,
    *  - real5.jpg: a Debian nodejs doc PROGRESSIVE photo (SOF2).
    *
    * All five are redistributable public content committed verbatim;
    * the loader fails loudly if a resource is missing rather than
    * silently shrinking the gate row.
    */
  private[graft] val realMediaFixtures: Seq[(Long, String)] = Seq(
    1L -> "real1.png", 2L -> "real2.png", 3L -> "real3.jpg",
    4L -> "real4.jpg", 5L -> "real5.jpg")

  private[graft] def realMediaBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/media/$name")
    require(in != null, s"missing media fixture resource $name")
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  /** EXIF ORIENTATION (round 14) — real APP1 metadata, public format
    * knowledge only (JEITA CP-3451 / TIFF 6.0): walk the JPEG marker
    * segments to the first APP1 whose payload starts "Exif\0\0", read
    * the TIFF header (II little-endian or MM big-endian, magic 42,
    * IFD0 offset), scan IFD0's 12-byte entries for tag 0x0112
    * (Orientation, type SHORT) and return its 1–8 value. None for
    * non-JPEG bytes, JPEGs without EXIF, a malformed TIFF header, or
    * a truncated IFD — extraction degrades, never throws. Bounds are
    * checked against the APP1 segment, not the whole stream (a value
    * offset past the segment is malformed metadata).
    */
  def exifOrientation(media: Array[Byte]): Option[Int] = {
    def u8(i: Int): Int = media(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (media.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 3 < media.length) {
      if (u8(i) != 0xff) return None
      val m = u8(i + 1)
      if (m == 0xd9 || m == 0xda) return None
      else if (m == 0xff) i += 1
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2
      else {
        val segLen = be16(i + 2)
        if (segLen < 2) return None
        val segEnd = i + 2 + segLen // exclusive
        if (m == 0xe1 && i + 10 <= segEnd && segEnd <= media.length &&
            u8(i + 4) == 'E'.toInt && u8(i + 5) == 'x'.toInt &&
            u8(i + 6) == 'i'.toInt && u8(i + 7) == 'f'.toInt &&
            u8(i + 8) == 0 && u8(i + 9) == 0) {
          val t = i + 10 // TIFF header base
          if (t + 8 > segEnd) return None
          val little = u8(t) == 'I'.toInt && u8(t + 1) == 'I'.toInt
          val big = u8(t) == 'M'.toInt && u8(t + 1) == 'M'.toInt
          if (!little && !big) return None
          def r16(p: Int): Int =
            if (little) u8(p) | (u8(p + 1) << 8) else be16(p)
          def r32(p: Int): Long =
            if (little)
              (u8(p).toLong | (u8(p + 1).toLong << 8) |
                (u8(p + 2).toLong << 16) | (u8(p + 3).toLong << 24))
            else
              ((u8(p).toLong << 24) | (u8(p + 1).toLong << 16) |
                (u8(p + 2).toLong << 8) | u8(p + 3).toLong)
          if (r16(t + 2) != 42) return None
          val ifd0 = r32(t + 4)
          val e0 = t + ifd0
          if (ifd0 < 8 || e0 + 2 > segEnd) return None
          val n = r16(e0.toInt)
          var k = 0
          while (k < n) {
            val e = e0.toInt + 2 + 12 * k
            if (e + 12 > segEnd) return None
            if (r16(e) == 0x0112 && r16(e + 2) == 3 &&
                r32(e + 4) == 1L) {
              val v = r16(e + 8)
              return if (v >= 1 && v <= 8) Some(v) else None
            }
            k += 1
          }
          return None
        }
        i = segEnd
      }
    }
    None
  }

  /** multimodal_real_decode — the segment walker against REAL
    * container bytes at CHECKSUM grain: the five fixture files decode
    * partition-parallel through the same [[decodeMedia]] path as the
    * synthesized gate row (plus the [[exifOrientation]] walk — only
    * the EXIF photo carries one), and the oracle is a VALUES table of
    * constants derived INDEPENDENTLY of this engine (python struct
    * parsing + md5 over the committed files) — so the walker, the
    * byte round-trip, the md5, and the TIFF IFD scan are all pinned
    * against an external derivation, not against ourselves.
    */
  def multimodalRealDecode(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = realMediaFixtures.map { case (id, name) =>
      (id, realMediaBytes(name))
    }
    val media = spark.createDataset(rows).toDF("doc_id", "media")
      .repartition(2)
    val metas = media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = decode(id, bytes)
        (m.doc_id, m.n_bytes, m.format, m.width, m.height, m.checksum,
          exifOrientation(bytes).map(_.toLong))
      })
      .toDF("doc_id", "n_bytes", "format", "width", "height",
        "checksum", "orientation")
    canon(metas)
  }

  val multimodalRealDecodeSql: String =
    s"""SELECT * FROM (VALUES
       |  (CAST(1 AS BIGINT), CAST(406 AS BIGINT), 'png',
       |   CAST(24 AS BIGINT), CAST(24 AS BIGINT),
       |   'd82f66f1d11f71f15158ea29bb7d9f7f', CAST(NULL AS BIGINT)),
       |  (CAST(2 AS BIGINT), CAST(654 AS BIGINT), 'png',
       |   CAST(24 AS BIGINT), CAST(24 AS BIGINT),
       |   '4621fb9c610de751638a8c468a4919ef', CAST(NULL AS BIGINT)),
       |  (CAST(3 AS BIGINT), CAST(543 AS BIGINT), 'jpeg',
       |   CAST(16 AS BIGINT), CAST(16 AS BIGINT),
       |   '50e9104383c3f36fa9e9be6148e6fdf3', CAST(NULL AS BIGINT)),
       |  (CAST(4 AS BIGINT), CAST(27295 AS BIGINT), 'jpeg',
       |   CAST(300 AS BIGINT), CAST(200 AS BIGINT),
       |   '540c32ec7d791e33b6cd53293f20b4b0', CAST(1 AS BIGINT)),
       |  (CAST(5 AS BIGINT), CAST(6525 AS BIGINT), 'jpeg',
       |   CAST(493 AS BIGINT), CAST(58 AS BIGINT),
       |   '5fc7b859742e99bac613aaf2e1723b71', CAST(NULL AS BIGINT)))
       |  AS t(doc_id, n_bytes, format, width, height, checksum,
       |    orientation)
       |${canonOrderSql(Seq("doc_id", "n_bytes", "format", "width",
         "height", "checksum", "orientation"))}""".stripMargin

  /** One decoded audio asset (typed container-header metadata). */
  case class AudioMeta(doc_id: Long, n_bytes: Long, format: String,
      channels: Long, sample_rate: Long, bits: Long, n_frames: Long,
      duration_ms: Long, checksum: String)

  /** REAL audio container-header decode (round 14) — public format
    * knowledge only:
    *
    *  - RIFF/WAVE (Microsoft/IBM RIFF spec): little-endian chunk walk
    *    with the WORD-ALIGNMENT rule (odd-sized chunks pad one byte);
    *    `fmt ` yields (formatTag, channels, sampleRate, bits) — PCM
    *    (1) and WAVE_FORMAT_EXTENSIBLE (0xFFFE, whose real tag hides
    *    in the extension GUID but whose frame geometry stays PCM) are
    *    decoded; compressed tags fall back to the stub (frame count
    *    would need codec knowledge). Ancillary chunks (LIST, fact, …)
    *    are skipped by size. Frames = |data| / (channels · bits/8).
    *  - AIFF / AIFC (Apple IFF): big-endian FORM walk; COMM yields
    *    channels, frame count, bits, and the sample rate as an 80-bit
    *    IEEE 754 extended float — decoded by exact integer shift
    *    arithmetic (sign·mantissa·2^(exp−16383−63)); rates that are
    *    not exactly integral fall back (no float rounding enters the
    *    oracle-compared output).
    *
    * duration_ms = frames · 1000 / rate, floored integer division in
    * both engines. None for anything else — the caller falls back to
    * the stub seam, mirroring [[decodeHeader]].
    */
  def decodeAudioHeader(media: Array[Byte]):
      Option[(String, Long, Long, Long, Long)] = {
    def u8(i: Int): Int = media(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24))
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = ((u8(i).toLong << 24) |
      (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3))
    def tag(i: Int): String =
      if (i + 4 <= media.length)
        new String(media.slice(i, i + 4), "US-ASCII")
      else ""
    if (media.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE") {
      var i = 12
      var fmtTag = -1; var ch = 0L; var rate = 0L; var bits = 0L
      var dataBytes = -1L
      while (i + 8 <= media.length) {
        val cid = tag(i); val sz = le32(i + 4)
        if (i + 8 + sz > media.length) return None // truncated chunk
        if (cid == "fmt " && sz >= 16) {
          fmtTag = le16(i + 8); ch = le16(i + 10).toLong
          rate = le32(i + 12); bits = le16(i + 22).toLong
        } else if (cid == "data") dataBytes = sz
        i += 8 + sz.toInt + (sz.toInt & 1) // RIFF word alignment
      }
      if ((fmtTag != 1 && fmtTag != 0xfffe) || ch <= 0 || rate <= 0 ||
        bits <= 0 || bits % 8 != 0 || dataBytes < 0) return None
      val frames = dataBytes / (ch * (bits / 8))
      Some(("wav", ch, rate, bits, frames))
    } else if (media.length >= 12 && tag(0) == "FORM" &&
        (tag(8) == "AIFF" || tag(8) == "AIFC")) {
      val kind = tag(8).toLowerCase
      var i = 12
      while (i + 8 <= media.length) {
        val cid = tag(i); val sz = be32(i + 4)
        if (i + 8 + sz > media.length) return None
        if (cid == "COMM" && sz >= 18) {
          val ch = be16(i + 8).toLong
          val frames = be32(i + 10)
          val bits = be16(i + 14).toLong
          // 80-bit extended float, exact integer arithmetic only
          val e = be16(i + 16) & 0x7fff
          val m = (be32(i + 18) << 32) | be32(i + 22)
          if (e == 0 && m == 0L) return None
          val sh = e - 16383 - 63
          val rate =
            if (sh >= 0 && sh < 8) m << sh
            else if (sh < 0 && sh > -64 && (m & ((1L << -sh) - 1)) == 0L)
              m >>> -sh
            else return None
          if (ch <= 0 || rate <= 0) return None
          return Some((kind, ch, rate, bits, frames))
        }
        i += 8 + sz.toInt + (sz.toInt & 1)
      }
      None
    } else None
  }

  /** Decode one audio asset to typed metadata; the stub covers what
    * the header decode cannot (compressed formats, other containers).
    */
  def decodeAudio(docId: Long, media: Array[Byte]): AudioMeta =
    decodeAudioHeader(media) match {
      case Some((fmt, ch, rate, bits, frames)) =>
        AudioMeta(docId, media.length.toLong, fmt, ch, rate, bits,
          frames, frames * 1000L / rate, md5hex(media))
      case None =>
        val n = media.length.toLong
        AudioMeta(docId, n, "opaque", 1 + n % 2, 8000 + (n % 5) * 8000,
          8 + (n % 3) * 8, n, n * 1000L / (8000 + (n % 5) * 8000),
          md5hex(media))
    }

  /** The committed genuine audio fixtures (CPython test-suite audio
    * data — redistributable public content): a PCM WAV with an
    * ancillary LIST metadata chunk, a WAVE_FORMAT_EXTENSIBLE 24-bit
    * WAV with a fact chunk, a minimal PCM WAV, and AIFF/AIFC twins
    * whose COMM carries the 80-bit extended sample rate.
    */
  private[graft] val realAudioFixtures: Seq[(Long, String)] = Seq(
    1L -> "wav1.wav", 2L -> "wav2.wav", 3L -> "wav3.wav",
    4L -> "aif1.aiff", 5L -> "aif2.aifc")

  private[graft] def realAudioBytes(name: String): Array[Byte] =
    resourceBytes(s"/graft/audio/$name")

  private def resourceBytes(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing fixture resource $path")
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  /** multimodal_audio_decode — REAL audio container headers on the
    * hard gate at checksum grain: the five committed fixtures decode
    * partition-parallel, and the oracle is a VALUES table of
    * constants derived by EXTERNAL struct parsing (chunk walk + the
    * 80-bit-float arithmetic done independently in python) + md5 of
    * the committed bytes.
    */
  def multimodalAudioDecode(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = realAudioFixtures.map { case (id, name) =>
      (id, realAudioBytes(name))
    }
    val media = spark.createDataset(rows).toDF("doc_id", "media")
      .repartition(2)
    canon(media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAudio(id, bytes) })
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("format"),
        col("channels"), col("sample_rate"), col("bits"),
        col("n_frames"), col("duration_ms"), col("checksum")))
  }

  val multimodalAudioDecodeSql: String =
    s"""SELECT * FROM (VALUES
       |  (CAST(1 AS BIGINT), CAST(13370 AS BIGINT), 'wav',
       |   CAST(2 AS BIGINT), CAST(11025 AS BIGINT), CAST(16 AS BIGINT),
       |   CAST(3307 AS BIGINT), CAST(299 AS BIGINT),
       |   '263f463cc93d29413dd1955d560cf70b'),
       |  (CAST(2 AS BIGINT), CAST(19922 AS BIGINT), 'wav',
       |   CAST(2 AS BIGINT), CAST(11025 AS BIGINT), CAST(24 AS BIGINT),
       |   CAST(3307 AS BIGINT), CAST(299 AS BIGINT),
       |   'e32038c983b300c24dd4a0970be3b8c2'),
       |  (CAST(3 AS BIGINT), CAST(64 AS BIGINT), 'wav',
       |   CAST(2 AS BIGINT), CAST(44100 AS BIGINT), CAST(16 AS BIGINT),
       |   CAST(5 AS BIGINT), CAST(0 AS BIGINT),
       |   'eb0b6503152295540c09094b1d64a6a3'),
       |  (CAST(4 AS BIGINT), CAST(108 AS BIGINT), 'aiff',
       |   CAST(2 AS BIGINT), CAST(44100 AS BIGINT), CAST(16 AS BIGINT),
       |   CAST(5 AS BIGINT), CAST(0 AS BIGINT),
       |   '3d4d023133dc4e66488dd5fd8d972124'),
       |  (CAST(5 AS BIGINT), CAST(106 AS BIGINT), 'aifc',
       |   CAST(2 AS BIGINT), CAST(44100 AS BIGINT), CAST(16 AS BIGINT),
       |   CAST(5 AS BIGINT), CAST(0 AS BIGINT),
       |   'a8a96fc714afadc15f870716186876f4'))
       |  AS t(doc_id, n_bytes, format, channels, sample_rate, bits,
       |    n_frames, duration_ms, checksum)
       |${canonOrderSql(Seq("doc_id", "n_bytes", "format", "channels",
         "sample_rate", "bits", "n_frames", "duration_ms",
         "checksum"))}""".stripMargin

  /** REAL MP4 box-structure decode (round 14) — ISO/IEC 14496-12
    * public structure: size-prefixed boxes walked at the top level to
    * `moov`, then inside it to `mvhd`, whose version-0 payload carries
    * (timescale, duration) as big-endian 32-bit fields (version 1:
    * 64-bit duration). duration_ms = duration · 1000 / timescale,
    * floored integer division. None for non-MP4 bytes (no `ftyp`
    * leading box), a missing moov/mvhd, a zero timescale, or any box
    * extending past the buffer — the stub seam catches those.
    */
  def decodeVideoHeader(media: Array[Byte]): Option[(Long, Long)] = {
    def u8(i: Int): Int = media(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) |
      (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3))
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String =
      if (i + 4 <= media.length)
        new String(media.slice(i, i + 4), "US-ASCII")
      else ""
    if (media.length < 16 || tag(4) != "ftyp") return None
    var i = 0
    while (i + 8 <= media.length) {
      val sz = be32(i)
      if (sz < 8 || i + sz > media.length) return None
      if (tag(i + 4) == "moov") {
        var j = i + 8
        val end = i + sz.toInt
        while (j + 8 <= end) {
          val bsz = be32(j)
          if (bsz < 8 || j + bsz > end) return None
          if (tag(j + 4) == "mvhd" && j + 12 <= end) {
            val version = u8(j + 8)
            return version match {
              case 0 if j + 28 <= end =>
                val ts = be32(j + 20); val dur = be32(j + 24)
                if (ts <= 0) None else Some((ts, dur))
              case 1 if j + 40 <= end =>
                val ts = be32(j + 28); val dur = be64(j + 32)
                if (ts <= 0) None else Some((ts, dur))
              case _ => None
            }
          }
          j += bsz.toInt
        }
        return None
      }
      i += sz.toInt
    }
    None
  }

  /** Deterministic MP4 synthesis for the video gate row — genuine box
    * structure (ftyp, a skipped `free` box, moov > mvhd v0 or v1)
    * whose timescale/duration are pure doc_id arithmetic, so the
    * oracle derives duration_ms independently. kind = doc_id % 3 —
    * 0: mvhd version 0; 1: version 1 (64-bit duration) behind a
    * `free` box the walker must skip; 2: a CORRUPT stream (moov whose
    * inner box size overruns) that must fall back. Byte lengths fixed
    * per kind (52 / 76 / 32 — the values the oracle pins).
    */
  private[graft] def synthVideo(docId: Long): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array((v >> 24).toByte,
      (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ name.getBytes("US-ASCII") ++ payload
    val ts = 1000L + docId % 9000
    val dur = docId % 100000L
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512L))
    (docId % 3).toInt match {
      case 0 =>
        ftyp ++ box("moov",
          box("mvhd", be32(0L) ++ be32(0L) ++ be32(0L) ++
            be32(ts) ++ be32(dur)))
      case 1 =>
        ftyp ++ box("free", Array.fill(4)(0.toByte)) ++ box("moov",
          box("mvhd", Array[Byte](1, 0, 0, 0) ++
            be32(0L) ++ be32(0L) ++ be32(0L) ++ be32(0L) ++ be32(ts) ++
            be32(0L) ++ be32(dur)))
      case _ =>
        // moov declares an inner box larger than itself: malformed
        ftyp ++ box("moov", be32(9999L) ++ "mvhd".getBytes)
    }
  }

  /** multimodal_video_decode — MP4 box-structure decode on the hard
    * gate: synthesized genuine box streams (including a version-1
    * 64-bit mvhd behind a free box and a corrupt overrunning inner
    * box) walked partition-parallel, duration arithmetic checked
    * against an independently-derived DuckDB oracle; the corrupt kind
    * pins the stub fallback on the same row.
    */
  def multimodalVideoDecode(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
    canon(ids.mapPartitions(_.map { id =>
      val bytes = synthVideo(id)
      decodeVideoHeader(bytes) match {
        case Some((ts, dur)) =>
          (id, bytes.length.toLong, "mp4", ts, dur, dur * 1000L / ts)
        case None =>
          (id, bytes.length.toLong, "opaque", -1L, -1L, -1L)
      }
    }).toDF("doc_id", "n_bytes", "format", "timescale", "duration",
      "duration_ms"))
  }

  val multimodalVideoDecodeSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, doc_id % 3 AS kind,
       |    1000 + doc_id % 9000 AS ts,
       |    doc_id % 100000 AS dur
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CASE WHEN kind = 0 THEN 52 WHEN kind = 1 THEN 76
       |       ELSE 32 END AS n_bytes,
       |  CASE WHEN kind = 2 THEN 'opaque' ELSE 'mp4' END AS format,
       |  CASE WHEN kind = 2 THEN -1 ELSE ts END AS timescale,
       |  CASE WHEN kind = 2 THEN -1 ELSE dur END AS duration,
       |  CASE WHEN kind = 2 THEN -1 ELSE dur * 1000 // ts END
       |    AS duration_ms
       |FROM m
       |${canonOrderSql(Seq("doc_id", "n_bytes", "format", "timescale",
         "duration", "duration_ms"))}""".stripMargin

  /** TRACK-LEVEL MP4 decode (round 15): extends the [[decodeVideoHeader]]
    * mvhd walk into each `trak` of a REAL container — tkhd's
    * 16.16-fixed width/height (the LAST 8 payload bytes, per
    * ISO/IEC 14496-12 §8.3.2), and the codec fourcc of the first
    * `stsd` sample entry down the trak > mdia > minf > stbl chain.
    * Returns (timescale, duration, codec fourccs in track order,
    * width, height) — dimensions from the first track with a nonzero
    * tkhd width (audio tkhds carry 0×0). None on ANY structural
    * violation (no ftyp, a box size under 8 or past its parent,
    * trailing bytes inside a parent, missing moov/mvhd/stsd, zero
    * timescale) — the stub seam catches those rows.
    */
  def decodeVideoTracks(media: Array[Byte])
      : Option[(Long, Long, Seq[String], Long, Long)] = {
    final class Bad extends RuntimeException
    def u8(i: Int): Int = media(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) |
      (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3))
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String =
      if (i + 4 <= media.length)
        new String(media.slice(i, i + 4), "US-ASCII")
      else ""
    // the (name, payloadStart, payloadEnd) children of a byte range —
    // any malformed size aborts the whole decode (a container that
    // lies about one box cannot be trusted about the rest)
    def kids(start: Int, end: Int): Seq[(String, Int, Int)] = {
      val b = Seq.newBuilder[(String, Int, Int)]
      var i = start
      while (i + 8 <= end) {
        val sz = be32(i)
        if (sz < 8 || i + sz > end) throw new Bad
        b += ((tag(i + 4), i + 8, i + sz.toInt))
        i += sz.toInt
      }
      if (i != end) throw new Bad
      b.result()
    }
    try {
      if (media.length < 16 || tag(4) != "ftyp") return None
      val top = kids(0, media.length)
      val moovR = top.find(_._1 == "moov").getOrElse(return None)
      val moov = kids(moovR._2, moovR._3)
      val hd = moov.find(_._1 == "mvhd").getOrElse(return None)
      val (hs, he) = (hd._2, hd._3)
      val (ts, dur) = u8(hs) match {
        case 0 if he - hs >= 20 => (be32(hs + 12), be32(hs + 16))
        case 1 if he - hs >= 28 => (be32(hs + 20), be64(hs + 24))
        case _ => throw new Bad
      }
      if (ts <= 0) return None
      var w = 0L
      var h = 0L
      val codecs = moov.filter(_._1 == "trak").map { case (_, s, e) =>
        val tk = kids(s, e)
        tk.find(_._1 == "tkhd").foreach { case (_, _, ke) =>
          val tw = be32(ke - 8) >> 16
          val th = be32(ke - 4) >> 16
          if (tw > 0 && w == 0L) { w = tw; h = th }
        }
        val fourcc = for {
          m <- tk.find(_._1 == "mdia")
          n <- kids(m._2, m._3).find(_._1 == "minf")
          t <- kids(n._2, n._3).find(_._1 == "stbl")
          d <- kids(t._2, t._3).find(_._1 == "stsd")
          if d._3 - d._2 >= 16
        } yield tag(d._2 + 12)
        fourcc.getOrElse(throw new Bad)
      }
      Some((ts, dur, codecs, w, h))
    } catch { case _: Bad => None }
  }

  /** The committed genuine MP4 fixtures (generated by
    * `scripts/gen_mp4_fixtures.py` from the public ISO/IEC 14496-12
    * box grammar — every mandatory child present, every size exact):
    * a single-avc1 file, a video+audio pair behind a `free` box the
    * walker must skip, an mvhd-v1 hev1 file, a three-track file, and
    * a CORRUPT file whose moov declares an overrunning inner box.
    */
  private[graft] val realVideoFixtures: Seq[(Long, String)] =
    (1L to 5L).map(i => i -> s"vid$i.mp4")

  private[graft] def realVideoBytes(name: String): Array[Byte] =
    resourceBytes(s"/graft/video/$name")

  /** multimodal_video_real — REAL MP4 container bytes on the hard
    * gate at checksum grain: the five committed fixtures decode
    * partition-parallel down to track structure (count, codec
    * fourccs, tkhd dimensions), and the oracle is a VALUES table of
    * constants derived by an INDEPENDENT struct-offset reparse in
    * python (`scripts/gen_mp4_fixtures.py`) + md5 of the committed
    * bytes; the corrupt fixture pins the stub fallback on the same
    * row.
    */
  def multimodalVideoReal(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = realVideoFixtures.map { case (id, name) =>
      (id, realVideoBytes(name))
    }
    val media = spark.createDataset(rows).toDF("doc_id", "media")
      .repartition(2)
    canon(media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeVideoTracks(bytes) match {
          case Some((ts, dur, codecs, w, h)) =>
            (id, bytes.length.toLong, "mp4", ts, dur,
              dur * 1000L / ts, codecs.length.toLong,
              codecs.mkString(","), w, h, md5hex(bytes))
          case None =>
            (id, bytes.length.toLong, "opaque", -1L, -1L, -1L, -1L,
              "", -1L, -1L, md5hex(bytes))
        }
      })
      .toDF("doc_id", "n_bytes", "format", "timescale", "duration",
        "duration_ms", "n_tracks", "codecs", "width", "height",
        "checksum"))
  }

  val multimodalVideoRealSql: String =
    s"""SELECT * FROM (VALUES
       |  (CAST(1 AS BIGINT), CAST(595 AS BIGINT), 'mp4',
       |   CAST(1000 AS BIGINT), CAST(5000 AS BIGINT),
       |   CAST(5000 AS BIGINT), CAST(1 AS BIGINT), 'avc1',
       |   CAST(320 AS BIGINT), CAST(240 AS BIGINT),
       |   '96d05b5928dce143997cb6ae57b4d74f'),
       |  (CAST(2 AS BIGINT), CAST(988 AS BIGINT), 'mp4',
       |   CAST(600 AS BIGINT), CAST(1200 AS BIGINT),
       |   CAST(2000 AS BIGINT), CAST(2 AS BIGINT), 'avc1,mp4a',
       |   CAST(640 AS BIGINT), CAST(360 AS BIGINT),
       |   'effbf05eeca7331ac1d82cfe2b45562b'),
       |  (CAST(3 AS BIGINT), CAST(583 AS BIGINT), 'mp4',
       |   CAST(90000 AS BIGINT), CAST(123456 AS BIGINT),
       |   CAST(1371 AS BIGINT), CAST(1 AS BIGINT), 'hev1',
       |   CAST(1920 AS BIGINT), CAST(1080 AS BIGINT),
       |   'd9871fc558b6fc246b310f04e902a4d1'),
       |  (CAST(4 AS BIGINT), CAST(1371 AS BIGINT), 'mp4',
       |   CAST(30 AS BIGINT), CAST(900 AS BIGINT),
       |   CAST(30000 AS BIGINT), CAST(3 AS BIGINT), 'avc1,av01,mp4a',
       |   CAST(128 AS BIGINT), CAST(96 AS BIGINT),
       |   '3ca9a7bd030aeef44f54b56779d3db56'),
       |  (CAST(5 AS BIGINT), CAST(44 AS BIGINT), 'opaque',
       |   CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       |   CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), '',
       |   CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       |   '117c977114e0372eb9df860269e4f988'))
       |  AS t(doc_id, n_bytes, format, timescale, duration,
       |    duration_ms, n_tracks, codecs, width, height, checksum)
       |${canonOrderSql(Seq("doc_id", "n_bytes", "format", "timescale",
         "duration", "duration_ms", "n_tracks", "codecs", "width",
         "height", "checksum"))}""".stripMargin

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
    "multimodal_decode" -> multimodalDecode,
    "multimodal_real_decode" -> multimodalRealDecode,
    "multimodal_audio_decode" -> multimodalAudioDecode,
    "multimodal_video_decode" -> multimodalVideoDecode,
    "multimodal_video_real" -> multimodalVideoReal,
    "frame_sample" -> frameSample)

  val oracles: Map[String, String] = Map(
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_decode" -> multimodalDecodeSql,
    "multimodal_real_decode" -> multimodalRealDecodeSql,
    "multimodal_audio_decode" -> multimodalAudioDecodeSql,
    "multimodal_video_decode" -> multimodalVideoDecodeSql,
    "multimodal_video_real" -> multimodalVideoRealSql,
    "frame_sample" -> frameSampleSql)
}
