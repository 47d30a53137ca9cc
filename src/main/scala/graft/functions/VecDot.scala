package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product of two `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is semantically identical
  * but interpreted per element (LambdaFunction closures don't participate
  * in whole-stage codegen), which made it the bottleneck of the all-pairs
  * similarity queries. This expression emits a tight Java loop instead —
  * same left-to-right double accumulation, so results are bit-identical
  * to the HOF version and to the DuckDB `list_reduce` oracle.
  *
  * Exposed through the public FunctionRegistry (`vec_dot`) rather than a
  * private[sql] Column constructor; [[VecDot.apply]] registers lazily per
  * session. Nulls: null array → null (BinaryExpression default);
  * mismatched lengths → dot over the common prefix (callers pass
  * equal-length embeddings).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  val FnName = "vec_dot"

  /** Idempotent per-session registration in the (public) temp function
    * registry — skipped when present, so repeated installs (each query
    * constructor calls this) don't spam replace warnings. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(
        FnName, exprs => VecDot(exprs(0), exprs(1)), "built-in")
  }

  /** Column form; casts inputs (e.g. `array<float>`) to `array<double>`
    * so element widening happens once, codegen'd. Requires [[register]]
    * on the active session (graft.Tables loaders do this). */
  def apply(a: Column, b: Column): Column =
    call_function(FnName, a.cast("array<double>"), b.cast("array<double>"))
}
