package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native contiguous n-token shingling: `array<string>` tokens →
  * `array<string>` of space-joined n-grams (empty when the doc has fewer
  * than n tokens).
  *
  * Why not `transform(sequence(...), i -> concat_ws(element_at(toks, …)))`:
  * higher-order lambdas run interpreted, and CollapseProject inlines the
  * tokenizer expression into the lambda body, so every `element_at` access
  * re-tokenizes the whole document — O(doc_len) per shingle ELEMENT,
  * measured ~7 s for 260k shingles at sf0.1. Why not posexplode + window
  * `lead`: that form stays in codegen but costs a full shuffle+sort of
  * every token occurrence just to build adjacency that is already present
  * in the row. This expression walks the token array once per row (the
  * work is a static helper the generated code calls — one invocation per
  * row, no per-element interpretation) and feeds `explode` directly, so
  * shingling is shuffle-free at any scale. */
final case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.Shingles.compute($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  private val Sep = UTF8String.fromString(" ")

  /** One pass over the token array; UTF8String concat, no copies of the
    * source tokens beyond the joined output strings. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) new GenericArrayData(new Array[Any](0))
    else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i + n <= len) {
        if (n == 1) out(i) = arr.getUTF8String(i)
        else {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
          out(i) = UTF8String.concatWs(Sep, parts: _*)
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column-API entry: `shinglesNative(toks, n)`. */
  def shinglesNative(toks: Column, n: Int): Column =
    Bridge.column(Shingles(Bridge.expression(toks), n))
}
