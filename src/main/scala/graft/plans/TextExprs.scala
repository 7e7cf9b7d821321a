package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash: 32-bit signature of a whitespace-tokenized string in
  * ONE pass over the row — replaces the explode(tokens) → 32 conditional
  * sums → groupBy(doc_id) pipeline (which paid a shuffle plus heavy
  * codegen for 32 aggregate expressions) with a narrow, shuffle-free map.
  *
  * Semantics are bit-identical to the SQL formulation the DuckDB oracle
  * runs (Dedup.simhashCte): tokens = split(input, ' ') keeping empties,
  * per-token h32 = first 8 hex chars of md5 as an unsigned 32-bit value,
  * each occurrence votes ±1 per bit, bit set iff its vote sum is > 0.
  * Callers pass the already-lowercased text: graft_simhash(lower(text)).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val md = md5.get()
    val votes = new Array[Int](32)
    // split(" ", -1): literal-space regex with no-limit, matching Spark's
    // split(text, ' ') + explode (consecutive separators yield empty
    // tokens, and empty tokens DO vote — same as the aggregate pipeline)
    val toks = s.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val d = md.digest(toks(t).getBytes(StandardCharsets.UTF_8))
      // first 4 digest bytes big-endian == conv(substr(md5Hex,1,8),16,10)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** Native 60-bit SimHash — the PRODUCTION band geometry's signature
  * (SCALING.md: w-bit bands give 2^w buckets, so candidates shrink
  * ~N²/2^w per band; 15-bit bands need a ≥60-bit signature). 60 bits
  * (not 64) so the value is positive in both engines: the oracle's
  * `('0x' || substr(md5(tok),1,15))::BIGINT` parses 15 hex chars, and a
  * 16th could overflow DuckDB's signed BIGINT. Same bit-vote semantics
  * as [[SimHash32]], per-token h60 = first 15 md5 hex chars.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val md = md5.get()
    val votes = new Array[Int](60)
    val toks = s.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val d = md.digest(toks(t).getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars big-endian == conv(substr(md5Hex,1,15),16,10):
      // bytes 0..6 in full (14 nibbles) then the HIGH nibble of byte 7
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      var j = 0
      while (j < 60) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** Native MinHash: the 8-slot signature plus the distinct-3-gram-shingle
  * count of a whitespace-tokenized string, in ONE pass over the row —
  * replaces the shingle explode → two md5 columns → 8-min groupBy(doc_id)
  * pipeline's shuffle with a narrow map. Output is a struct
  * (s0..s7: string, n_sh: long).
  *
  * Bit-identical to the SQL formulation the DuckDB oracle runs
  * (Dedup.minhashLshSql): shingles = distinct 3-gram windows of
  * split(input, ' ') (the whole input when < 3 tokens); slot k < 4 is
  * min(substr(md5Hex(shingle), 8k, 8)), slots 4-7 the same over
  * md5('x:' || shingle); minima compare lexicographically on fixed-width
  * lowercase hex, exactly like string MIN in both engines. Callers pass
  * the already-lowercased text: graft_minhash(lower(text)).
  */
case class MinHash8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MinHash8.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHash8.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHash8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash8 =
    copy(child = newChild)
}

object MinHash8 {

  val schema: StructType = StructType(
    (0 until 8).map(k => StructField(s"s$k", StringType, nullable = false)) :+
      StructField("n_sh", LongType, nullable = false))

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val text = s.toString
    val toks = text.split(" ", -1)
    // distinct 3-gram shingles; whole text when under 3 tokens — same as
    // the CASE size(t) >= 3 … ELSE array(lower(text)) SQL shape
    val shingles = new java.util.LinkedHashSet[String]()
    if (toks.length >= 3) {
      var i = 0
      while (i + 2 < toks.length) {
        shingles.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
    } else shingles.add(text)
    val md = md5.get()
    val mins = new Array[String](8)
    val it = shingles.iterator()
    while (it.hasNext) {
      val sh = it.next()
      val h0 = hex(md.digest(sh.getBytes(StandardCharsets.UTF_8)))
      val h1 = hex(md.digest(("x:" + sh).getBytes(StandardCharsets.UTF_8)))
      var k = 0
      while (k < 8) {
        val src = if (k < 4) h0 else h1
        val sub = src.substring((k % 4) * 8, (k % 4) * 8 + 8)
        if (mins(k) == null || sub.compareTo(mins(k)) < 0) mins(k) = sub
        k += 1
      }
    }
    val values = new Array[Any](9)
    var k = 0
    while (k < 8) { values(k) = UTF8String.fromString(mins(k)); k += 1 }
    values(8) = shingles.size.toLong
    new GenericInternalRow(values)
  }
}

/** Native shingle-set intersection: |shingles(a) ∩ shingles(b)| for two
  * whitespace-tokenized strings in one pass over the candidate pair —
  * the LSH verify step without materializing either shingle set as rows.
  * Replaces minhash_lsh's explode(shingles) → two joins on the shingle
  * key → groupBy(pair) count (a cached exploded relation plus two
  * shuffles) with a scalar computed where the pair row already lives.
  *
  * Shingle semantics are the family's single formulation
  * (Dedup.shingleArrayExpr, mirrored in MinHash8): distinct 3-gram
  * windows of split(input, ' ') keeping empties, the whole input when
  * under 3 tokens. Callers pass already-lowercased text.
  */
case class ShingleOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOverlap.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ShingleOverlap.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleOverlap =
    copy(left = newLeft, right = newRight)
}

object ShingleOverlap {

  private def shingleSet(text: String): java.util.HashSet[String] = {
    val toks = text.split(" ", -1)
    val set = new java.util.HashSet[String]()
    if (toks.length >= 3) {
      var i = 0
      while (i + 2 < toks.length) {
        set.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
    } else set.add(text)
    set
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Long = {
    val sa = shingleSet(a.toString)
    val sb = shingleSet(b.toString)
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var n = 0L
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) n += 1
    n
  }
}

/** Native Unicode NFC normalization — the canonicalization step every
  * multilingual ingest runs before hashing/dedup (decomposed "é" and
  * composed "é" must collide, or near-dup families silently miss
  * cross-source duplicates). Spark has no built-in normalizer;
  * `java.text.Normalizer` behind the standard static-helper codegen
  * keeps the row inside WholeStageCodegen. The DuckDB oracle face is
  * `nfc_normalize` — both implement Unicode NFC, so outputs are
  * byte-identical.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry point shared by interpreted eval and generated code.
    * Invalid UTF-8 is substituted (U+FFFD) FIRST so malformed input is
    * canonicalized consistently — without this, the already-NFC fast
    * path would return raw invalid bytes while the normalize path
    * substituted them, and identical logical content could hash
    * differently depending on unrelated surrounding text. For valid
    * input, the already-NFC case (the overwhelmingly common one in a
    * real corpus) skips the allocating normalize — `isNormalized` is a
    * cheap scan.
    */
  def compute(s: UTF8String): UTF8String = {
    val valid = if (s.isValid) s else s.makeValid()
    val str = valid.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) valid
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object TextExprs {
  /** Register `graft_simhash(str)`, `graft_minhash(str)`,
    * `graft_shingle_overlap(a, b)` (and the rest of the engine's SQL
    * functions) in the session registry. Idempotent and quiet —
    * delegates to the canonical [[GraftExtensions]] description list.
    */
  def register(spark: SparkSession): Unit =
    GraftExtensions.registerInSession(spark)
}
