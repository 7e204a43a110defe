package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The `functions.zip_with + aggregate` formulation runs its lambda
  * interpreted per element (higher-order functions don't participate in
  * whole-stage codegen), which made it the hot path of every similarity
  * operator. This expression generates a tight primitive loop inside the
  * WSCG stage instead — same IEEE left-to-right summation order as the
  * HOF form (s = 0.0; s += x[i]*y[i]), so results are bit-identical and
  * the DuckDB oracle hashes are unchanged.
  *
  * Null semantics: null input array → null (BinaryExpression default);
  * array ELEMENTS are assumed non-null (embedding vectors). Lengths may
  * differ; the shorter bounds the loop (zip_with semantics would pad with
  * null and poison the sum — don't feed ragged pairs to either form).
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName per instance: with two non-nullable children the code is
      // emitted unbraced at method scope, so fixed local names collide when
      // two DotProducts share one codegen stage (Janino error → interpreted
      // fallback, silently losing WSCG)
      val n = ctx.freshName("dpN")
      val s = ctx.freshName("dpS")
      val i = ctx.freshName("dpI")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry: `dotNative(a, b)`. */
  def dotNative(x: Column, y: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(x), Bridge.expression(y)))
}
