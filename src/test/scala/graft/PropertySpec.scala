package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}
import graft.operators.Multimodal

/** ScalaCheck properties for the pure (driver-side) function layer. */
object MultimodalStubProps extends Properties("decodeStub") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))

  property("deterministic") = forAll(bytesGen) { b =>
    Multimodal.decodeStub(1L, b) == Multimodal.decodeStub(1L, b)
  }

  property("format is one of the three containers") = forAll(bytesGen) { b =>
    Set("png", "jpeg", "webp").contains(Multimodal.decodeStub(0L, b).format)
  }

  property("dimensions bounded: 64 <= w,h < 576") = forAll(bytesGen) { b =>
    val m = Multimodal.decodeStub(0L, b)
    m.width >= 64 && m.width < 576 && m.height >= 64 && m.height < 576
  }

  property("frame count in [1, 30]") = forAll(bytesGen) { b =>
    val m = Multimodal.decodeStub(0L, b)
    m.n_frames >= 1 && m.n_frames <= 30
  }

  property("checksum is 32 lowercase hex chars") = forAll(bytesGen) { b =>
    Multimodal.decodeStub(0L, b).checksum.matches("^[0-9a-f]{32}$")
  }
}

/** JSON escaping must round-trip through a real parser for ANY string —
  * the audit log / staged-write / oracle-dump formats are line-oriented,
  * so one unescaped control char corrupts a record.
  */
object JsonUtilProps extends Properties("jsonUtil") {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  property("quote() parses back to the original string") =
    forAll { (s: String) =>
      mapper.readValue(JsonUtil.quote(s), classOf[String]) == s
    }

  property("escaped output never contains raw control chars") =
    forAll { (s: String) =>
      JsonUtil.escape(s).forall(c => c >= ' ')
    }
}

/** Native signature expressions: pure-core invariants on arbitrary input. */
object TextExprProps extends Properties("textExprs") {
  import org.apache.spark.unsafe.types.UTF8String
  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(6)), Gen.const(""), Gen.const(" ")))
    .map(_.mkString(" "))

  property("simhash deterministic and 32-bit") = forAll(textGen) { t =>
    val u = UTF8String.fromString(t)
    val a = graft.plans.SimHash32.compute(u)
    a == graft.plans.SimHash32.compute(u) && a >= 0L && a <= 0xFFFFFFFFL
  }

  property("minhash: 8 hex slots, n_sh = independent distinct 3-gram count") =
    forAll(textGen) { t =>
      val row = graft.plans.MinHash8.compute(UTF8String.fromString(t))
      val toks = t.split(" ", -1)
      val expected =
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet.size
        else 1
      (0 until 8).forall(k =>
        row.getUTF8String(k).toString.matches("^[0-9a-f]{8}$")) &&
        row.getLong(8) == expected.toLong
    }

  private def shingleSet(t: String): Set[String] = {
    val toks = t.split(" ", -1)
    if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
    else Set(t)
  }

  property("shingle overlap = |A ∩ B| of the independent shingle sets") =
    forAll(textGen, textGen) { (a, b) =>
      val got = graft.plans.ShingleOverlap.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      got == (shingleSet(a) intersect shingleSet(b)).size.toLong
    }

  property("shingle overlap is symmetric and bounded by n_sh") =
    forAll(textGen, textGen) { (a, b) =>
      val ua = UTF8String.fromString(a); val ub = UTF8String.fromString(b)
      val ab = graft.plans.ShingleOverlap.compute(ua, ub)
      ab == graft.plans.ShingleOverlap.compute(ub, ua) &&
        ab <= math.min(shingleSet(a).size, shingleSet(b).size)
    }

  private def nfc(s: String): String =
    graft.plans.NfcNormalize.compute(UTF8String.fromString(s)).toString

  property("nfc agrees with java.text.Normalizer on arbitrary strings") =
    forAll { (s: String) =>
      nfc(s) == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  property("nfc is idempotent") =
    forAll { (s: String) => nfc(nfc(s)) == nfc(s) }

  property("nfc composes the canonical pairs and singletons") = {
    nfc("cafe\u0301") == "caf\u00e9" &&
      nfc("A\u030a") == "\u00c5" &&
      nfc("\u212b") == "\u00c5" &&
      nfc("ascii stays put") == "ascii stays put"
  }
}

/** Session-split invariants for the streaming sessionizer's pure core. */
object SessionProps extends Properties("sessionize") {
  import graft.streaming.SessionizeStream.{gapMs, OpenSession}

  private val tsGen = Gen.chooseNum(0L, 100L * 24 * 3600 * 1000)

  property("events within gap merge into one open session") =
    forAll(tsGen, Gen.chooseNum(0L, gapMs)) { (t0, delta) =>
      // folding two events separated by <= gap yields one session of 2
      val s1 = OpenSession(t0, t0, 1, 1.0)
      val t1 = t0 + delta
      val merged =
        if (t1 - s1.end > gapMs) OpenSession(t1, t1, 1, 1.0)
        else OpenSession(s1.start, math.max(s1.end, t1), s1.n + 1, s1.total + 1.0)
      merged.n == 2 && merged.start == t0 && merged.end == t1
    }
}
