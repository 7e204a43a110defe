package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fraction of an `array<string>`'s elements accounted for by its most
  * frequent element — max multiplicity / length; null for an empty
  * array. The in-row form of `groupBy(id, elem).count` → `max(c)/sum(c)`
  * per id: one hash-tally walk over the array replaces TWO aggregation
  * shuffles when the per-row array is already at hand (e.g. the
  * top-bigram repetition gate over a doc's shingles). Division is the
  * same IEEE double-of-longs the aggregate form produces — results are
  * bit-identical. */
final case class MaxDupFrac(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_max_dup_frac"

  override protected def nullSafeEval(input: Any): Any =
    MaxDupFrac.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      |java.lang.Double r = graft.functions.MaxDupFrac.compute($x);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MaxDupFrac =
    copy(child = newChild)
}

object MaxDupFrac {

  /** Boxed so codegen and eval share one null convention. */
  def compute(arr: ArrayData): java.lang.Double = {
    val len = arr.numElements()
    if (len == 0) return null
    val counts = new java.util.HashMap[UTF8String, Int](len * 2)
    var max = 0
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i)
      val c = counts.merge(s, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    java.lang.Double.valueOf(max.toDouble / len.toDouble)
  }

  /** Column-API entry. */
  def maxDupFrac(arr: Column): Column =
    Bridge.column(MaxDupFrac(Bridge.expression(arr)))
}
