package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
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

object TextExprs {
  /** Register `graft_simhash(str)` in the session registry. Idempotent
    * and quiet (no replace-warning spam on repeated calls).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_simhash"))) {
      reg.createOrReplaceTempFunction(
        "graft_simhash", exprs => SimHash32(exprs.head), "built-in")
    }
  }
}
