package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression for vector dot products.
  *
  * The higher-order-function formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`
  * materializes an intermediate array per row and evaluates lambdas
  * interpreted (no whole-stage codegen). This expression generates a
  * tight primitive loop instead — same strict left-to-right summation
  * order, so results are bit-identical to the HOF version and to the
  * DuckDB oracle's list_dot_product.
  */
/** Callers must pass array<double> children (cast explicitly at the
  * DataFrame layer) — no implicit coercion is wired up.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** µ-quantized squared distance between a vector's quantized array
  * (array<bigint>, xq = floor(x·10⁶)) and a centroid array
  * (array<double>): Σ_i floor((xq_i/10⁶ − c_i)² · 10¹²) as BIGINT.
  *
  * Term-for-term the arithmetic of the exploded IVF kernel (round 16):
  * per dimension the identical IEEE doubles, the µ²-floored square is
  * an exact integer, and the long sum is order-free — so this codegen
  * loop, the HOF formulation it replaced, and the DuckDB oracle's SQL
  * aggregation are all bit-identical. Native because HOF lambdas run
  * interpreted and allocate an intermediate array per row — this is
  * the hot inner loop of every nearest-centroid assignment.
  */
case class QuantDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_qdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), c.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val dx = x.getLong(i).toDouble / 1000000.0 - c.getDouble(i)
      acc += math.floor(dx * dx * 1.0e12).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dx = ctx.freshName("dx")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dx = (double) $a.getLong($i) / 1000000.0
         |    - $b.getDouble($i);
         |  $acc += (long) java.lang.Math.floor($dx * $dx * 1.0e12);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantDist =
    copy(left = newLeft, right = newRight)
}

/** Residual-sign subcell bits: bit p (p < bits) set iff
  * xq_p/10⁶ − c_p ≥ 0 — the exploded subcell kernel's exact per-bit
  * comparison on the identical doubles, summed as a long.
  */
case class QuantSub(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_qsub"

  override def nullSafeEval(a: Any, b: Any, bitsAny: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(bitsAny.asInstanceOf[Int],
      math.min(x.numElements(), c.numElements()))
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.getLong(i).toDouble / 1000000.0 - c.getDouble(i) >= 0.0)
        acc += 1L << i
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, bits) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($bits,
         |  java.lang.Math.min($a.numElements(), $b.numElements()));
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ((double) $a.getLong($i) / 1000000.0
         |      - $b.getDouble($i) >= 0.0) {
         |    $acc += 1L << $i;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): QuantSub =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** µ-quantized squared distance against a SPARSE centroid slice — the
  * PQ/ADC form: entries is array<struct<pos: int, c: double>> (one
  * codebook entry's positions), and the sum ranges over exactly those
  * positions of the quantized vector: Σ_e floor((xq[e.pos]/10⁶ −
  * e.c)² · 10¹²). Same exactness argument as [[QuantDist]].
  */
case class QuantDistAt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_qdist_at"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val es = b.asInstanceOf[ArrayData]
    val n = es.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val e = es.getStruct(i, 2)
      val dx = x.getLong(e.getInt(0)).toDouble / 1000000.0 - e.getDouble(1)
      acc += math.floor(dx * dx * 1.0e12).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val e = ctx.freshName("e")
      val dx = ctx.freshName("dx")
      s"""
         |int $n = $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $e =
         |    $b.getStruct($i, 2);
         |  double $dx = (double) $a.getLong($e.getInt(0)) / 1000000.0
         |    - $e.getDouble(1);
         |  $acc += (long) java.lang.Math.floor($dx * $dx * 1.0e12);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantDistAt =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Register the engine's SQL functions (incl. `graft_dot(arr, arr)`)
    * in the session's function registry so they are usable from
    * expr()/SQL. Idempotent — delegates to the canonical
    * [[GraftExtensions]] description list (one definition, two routes:
    * extension injection at session build, or this in-session call).
    */
  def register(spark: SparkSession): Unit =
    GraftExtensions.registerInSession(spark)
}
