package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.Multimodal

/** The real multimodal header decode (round 12 — replaces the blind
  * stub for PNG/JPEG): dimensions parsed from hand-crafted container
  * bytes with known golden values — PNG's IHDR chunk, JPEG's SOFn
  * frame header behind a skipped APP0 segment, the progressive SOF2
  * variant, and truncated/foreign bytes falling back to the stub seam.
  * The Dataset face (`decodeMedia`) is driven end-to-end over a mixed
  * batch.
  */
class MultimodalDecodeSpec extends SparkSpecBase {

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def be16(v: Int): Array[Byte] =
    Array((v >> 8).toByte, v.toByte)

  private def png(w: Long, h: Long): Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0) // bit depth..interlace + CRC

  /** SOI, a JFIF APP0 segment the scanner must SKIP by length, then a
    * SOFn frame header carrying the dimensions.
    */
  private def jpeg(w: Int, h: Int, sof: Int = 0xc0): Array[Byte] = {
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sofSeg = Array(0xff.toByte, sof.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ sofSeg
  }

  test("PNG IHDR and JPEG SOFn dimensions parse exactly; non-matching bytes fall back to the stub") {
    assert(Multimodal.decodeHeader(png(640L, 480L))
      .contains(("png", 640L, 480L)))
    assert(Multimodal.decodeHeader(png(1L, 1L)).contains(("png", 1L, 1L)))
    // > 2^15 dims exercise the unsigned big-endian read
    assert(Multimodal.decodeHeader(png(40000L, 33000L))
      .contains(("png", 40000L, 33000L)))
    assert(Multimodal.decodeHeader(jpeg(123, 45))
      .contains(("jpeg", 123L, 45L)))
    // progressive JPEG: SOF2 is a frame header too
    assert(Multimodal.decodeHeader(jpeg(8000, 6000, sof = 0xc2))
      .contains(("jpeg", 8000L, 6000L)))
    // a DHT (C4) segment before the SOF must be skipped, not parsed
    val dhtFirst = Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff, 0xc4).map(_.toByte) ++ be16(4) ++ Array[Byte](0, 0) ++
      (jpeg(77, 66).drop(2)) // APP0 + SOF0 after the DHT
    assert(Multimodal.decodeHeader(dhtFirst).contains(("jpeg", 77L, 66L)))
    // truncated PNG (cut inside IHDR) and foreign bytes: None
    assert(Multimodal.decodeHeader(png(640L, 480L).take(20)).isEmpty)
    assert(Multimodal.decodeHeader("plain text bytes".getBytes).isEmpty)
    assert(Multimodal.decodeHeader(
      Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte)).isEmpty)
    // EOI before any SOFn (truncated/corrupt stream): the scan must
    // STOP, not read the following garbage as a segment length — the
    // trailing bytes here would otherwise be walked straight into a
    // spurious FF C0 pair and yield fabricated dimensions (ADVICE r12)
    val eoiThenGarbage = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte) ++
      Array(0x00, 0x02).map(_.toByte) ++ // bytes an unterminated walk
      Array(0xff, 0xc0).map(_.toByte) ++ // would reach as a "SOF"
      be16(17) ++ Array[Byte](8) ++ be16(999) ++ be16(888)
    assert(Multimodal.decodeHeader(eoiThenGarbage).isEmpty)
    // SOS before any SOFn: entropy-coded data follows, stop there too
    val sosFirst = Array(0xff, 0xd8, 0xff, 0xda).map(_.toByte) ++
      be16(4) ++ Array[Byte](0, 0) ++
      Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(999) ++ be16(888)
    assert(Multimodal.decodeHeader(sosFirst).isEmpty)

    // the decode seam: header formats get REAL dimensions, everything
    // else keeps the deterministic stub
    val real = Multimodal.decode(7L, png(320L, 200L))
    assert(real.format == "png" && real.width == 320L &&
      real.height == 200L && real.n_frames == 1L)
    val other = "not an image".getBytes
    assert(Multimodal.decode(8L, other) == Multimodal.decodeStub(8L, other))
  }

  test("synthMedia: byte lengths and round-trip dimensions match the decode-gate oracle arithmetic") {
    // the oracle's n_bytes CASE hardcodes these — pin them to the
    // builder so neither can drift alone
    assert(Multimodal.synthMedia(0L).length == 33, "png length")
    assert(Multimodal.synthMedia(1L).length == 39, "baseline length")
    assert(Multimodal.synthMedia(2L).length == 45, "progressive length")
    assert(Multimodal.synthMedia(3L).length == 4 + 3 % 7, "corrupt length")
    // per-kind round trip: synthesized dims survive the real decode
    val m0 = Multimodal.decode(8L, Multimodal.synthMedia(8L))
    assert(m0.format == "png" && m0.width == 24L && m0.height == 72L, s"$m0")
    val m1 = Multimodal.decode(9L, Multimodal.synthMedia(9L))
    assert(m1.format == "jpeg" && m1.width == 25L && m1.height == 79L, s"$m1")
    val m2 = Multimodal.decode(10L, Multimodal.synthMedia(10L))
    assert(m2.format == "jpeg" && m2.width == 26L && m2.height == 86L, s"$m2")
    // the corrupt kind must take the STUB seam (EOI terminator), even
    // past the FF C0 bait bytes
    val plain = Multimodal.synthMedia(7L) // pad 0: bare SOI + EOI
    assert(Multimodal.decode(7L, plain) == Multimodal.decodeStub(7L, plain))
    val baited = Multimodal.synthMedia(11L) // pad 4: FF C0 bait follows
    assert(Multimodal.decode(11L, baited) ==
      Multimodal.decodeStub(11L, baited))
  }

  test("decodeMedia drives a mixed batch through the partition-parallel path") {
    val rows = Seq(
      Row(1L, png(640L, 480L)),
      Row(2L, jpeg(123, 45)),
      Row(3L, "opaque payload".getBytes))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("media", BinaryType, nullable = false))))
    val got = Multimodal.decodeMedia(spark, df).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got(1L).format == "png" && got(1L).width == 640L &&
      got(1L).height == 480L)
    assert(got(2L).format == "jpeg" && got(2L).width == 123L &&
      got(2L).height == 45L)
    assert(got(3L) == Multimodal.decodeStub(3L, "opaque payload".getBytes))
    assert(got.values.forall(_.checksum.length == 32),
      "md5 checksum must ride every row")
  }

  test("real fixture files: ancillary PNG chunks and EXIF/ICC JPEG segments are walked, not stubbed") {
    // the committed genuine files (see realMediaFixtures scaladoc);
    // expected values derive from external struct parsing of the
    // container bytes, never from this engine
    val want = Map(
      "real1.png" -> ("png", 24L, 24L),
      "real2.png" -> ("png", 24L, 24L),
      "real3.jpg" -> ("jpeg", 16L, 16L),
      "real4.jpg" -> ("jpeg", 300L, 200L), // APP1 EXIF + APP13 + APP2
      "real5.jpg" -> ("jpeg", 493L, 58L))  // progressive SOF2
    Multimodal.realMediaFixtures.foreach { case (_, name) =>
      val bytes = Multimodal.realMediaBytes(name)
      val got = Multimodal.decodeHeader(bytes)
      assert(got.contains(want(name)),
        s"$name: real header decode must not fall to the stub: $got")
    }
    // checksum-grain: the byte round-trip through the partition-
    // parallel path preserves every byte of the real files
    import spark.implicits._
    val media = spark.createDataset(
      Multimodal.realMediaFixtures.map { case (id, n) =>
        (id, Multimodal.realMediaBytes(n)) }).toDF("doc_id", "media")
    val sums = Multimodal.decodeMedia(spark, media).collect()
      .map(m => m.doc_id -> m.checksum).toMap
    assert(sums(4L) == "540c32ec7d791e33b6cd53293f20b4b0" &&
      sums(5L) == "5fc7b859742e99bac613aaf2e1723b71",
      s"externally-derived md5 constants must match: $sums")
  }

  test("exifOrientation: real EXIF, both byte orders, and the degrade table") {
    // the real photo: MM (big-endian) TIFF, IFD0 holds exactly tag
    // 0x0112 = 1 (externally derived)
    assert(Multimodal.exifOrientation(
      Multimodal.realMediaBytes("real4.jpg")).contains(1))
    // JPEGs without an Exif APP1, and non-JPEG bytes: None
    assert(Multimodal.exifOrientation(
      Multimodal.realMediaBytes("real3.jpg")).isEmpty)
    assert(Multimodal.exifOrientation(
      Multimodal.realMediaBytes("real5.jpg")).isEmpty)
    assert(Multimodal.exifOrientation(
      Multimodal.realMediaBytes("real1.png")).isEmpty)

    // synthetic little-endian APP1: II 42, IFD0 at 8, one entry
    // (0x0112, SHORT, count 1, value 6)
    def le16(v: Int) = Array((v & 0xff).toByte, (v >> 8).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def app1(entries: Array[Byte]): Array[Byte] = {
      val tiff = "II".getBytes ++ le16(42) ++ le32(8) ++ entries
      val payload = "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff
      val len = payload.length + 2
      Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte) ++
        Array((len >> 8).toByte, len.toByte) ++ payload
    }
    val orient6 = app1(le16(1) ++
      le16(0x0112) ++ le16(3) ++ le32(1) ++ le16(6) ++ le16(0))
    assert(Multimodal.exifOrientation(orient6).contains(6),
      "little-endian orientation 6 must parse")
    // IFD without the orientation tag: None
    val noTag = app1(le16(1) ++
      le16(0x011a) ++ le16(3) ++ le32(1) ++ le16(2) ++ le16(0))
    assert(Multimodal.exifOrientation(noTag).isEmpty)
    // entry count pointing past the segment (truncated IFD): None
    val truncated = app1(le16(9))
    assert(Multimodal.exifOrientation(truncated).isEmpty)
    // out-of-range orientation value: None
    val orient9 = app1(le16(1) ++
      le16(0x0112) ++ le16(3) ++ le32(1) ++ le16(9) ++ le16(0))
    assert(Multimodal.exifOrientation(orient9).isEmpty)
  }

  test("audio container headers: real WAV/AIFF/AIFC fixtures and the degrade table") {
    // externally-derived expectations (struct parse + 80-bit-float
    // arithmetic in python, never this engine)
    val want = Map(
      "wav1.wav" -> ("wav", 2L, 11025L, 16L, 3307L), // LIST chunk skipped
      "wav2.wav" -> ("wav", 2L, 11025L, 24L, 3307L), // EXTENSIBLE + fact
      "wav3.wav" -> ("wav", 2L, 44100L, 16L, 5L),
      "aif1.aiff" -> ("aiff", 2L, 44100L, 16L, 5L),  // 80-bit rate
      "aif2.aifc" -> ("aifc", 2L, 44100L, 16L, 5L))
    Multimodal.realAudioFixtures.foreach { case (_, name) =>
      val got = Multimodal.decodeAudioHeader(
        Multimodal.realAudioBytes(name))
      assert(got.contains(want(name)),
        s"$name: audio header decode mismatch: $got")
    }
    // degrade table: compressed formatTag (MP3 in RIFF) -> stub seam;
    // truncated chunk -> None; garbage -> None
    def le16(v: Int) = Array((v & 0xff).toByte, (v >> 8).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def wav(fmtTag: Int, dataLen: Int): Array[Byte] = {
      val fmt = "fmt ".getBytes ++ le32(16) ++ le16(fmtTag) ++ le16(2) ++
        le32(11025) ++ le32(44100) ++ le16(4) ++ le16(16)
      val data = "data".getBytes ++ le32(dataLen) ++
        Array.fill(dataLen)(0.toByte)
      val body = "WAVE".getBytes ++ fmt ++ data
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    assert(Multimodal.decodeAudioHeader(wav(1, 40))
      .contains(("wav", 2L, 11025L, 16L, 10L)),
      "synthetic PCM WAV must parse")
    assert(Multimodal.decodeAudioHeader(wav(0x55, 40)).isEmpty,
      "compressed formatTag must fall to the stub seam")
    val truncated = wav(1, 40).dropRight(10)
    assert(Multimodal.decodeAudioHeader(truncated).isEmpty,
      "a chunk extending past the buffer is malformed")
    assert(Multimodal.decodeAudioHeader("not audio".getBytes).isEmpty)
    // the decode path stamps duration from exact integer division
    val m = Multimodal.decodeAudio(7L, Multimodal.realAudioBytes("wav1.wav"))
    assert(m.duration_ms == 299L && m.checksum.length == 32,
      s"duration/checksum mismatch: $m")
  }

  test("MP4 box walk: mvhd v0/v1 timescale+duration; corrupt inner box falls back") {
    // synthVideo's three kinds round-trip the walker
    val v0 = Multimodal.synthVideo(3L) // kind 0: version-0 mvhd
    assert(Multimodal.decodeVideoHeader(v0)
      .contains((1003L, 3L)), s"v0: ${Multimodal.decodeVideoHeader(v0)}")
    val v1 = Multimodal.synthVideo(7L) // kind 1: v1 mvhd behind free
    assert(Multimodal.decodeVideoHeader(v1)
      .contains((1007L, 7L)), s"v1: ${Multimodal.decodeVideoHeader(v1)}")
    val bad = Multimodal.synthVideo(2L) // kind 2: overrunning inner box
    assert(Multimodal.decodeVideoHeader(bad).isEmpty,
      "corrupt moov must fall back")
    // degrade: no ftyp, truncated top-level box
    assert(Multimodal.decodeVideoHeader("junk junk junk junk".getBytes)
      .isEmpty)
    assert(Multimodal.decodeVideoHeader(v0.dropRight(6)).isEmpty,
      "a box extending past the buffer is malformed")
    // byte lengths pinned to the oracle's n_bytes CASE
    assert(v0.length == 52 && v1.length == 76 && bad.length == 32,
      s"synth lengths drifted: ${v0.length}/${v1.length}/${bad.length}")
  }
}
