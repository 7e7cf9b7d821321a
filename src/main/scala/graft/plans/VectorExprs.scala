package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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
