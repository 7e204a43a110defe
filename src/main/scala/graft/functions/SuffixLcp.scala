package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest common prefix (in CHARACTERS) of two in-document suffixes:
  * `suffix_lcp(ta, pa, tb, pb)` = LCP of `ta[pa..]` and `tb[pb..]`
  * (1-based char positions), stopping at the end of either document.
  *
  * This is the hot kernel of [[graft.ext.SuffixArray.longestRepeatsOn]]:
  * evaluated once per rank-adjacent suffix pair. The higher-order-function
  * formulation (`sequence` → `transform` → `filter` → `array_min`)
  * allocates three O(L) arrays per pair; this expression is a single
  * byte-walk with zero allocation beyond the two byte handles, and the
  * codegen emits a static call so it stays inside the surrounding
  * whole-stage span (the [[JaroWinklerSim]] pattern).
  *
  * Character counting is codepoint-exact over UTF-8 (first differing
  * codepoint starts at the first differing byte; only COMPLETE matched
  * codepoints count), so the result equals the `substring`-per-position
  * SQL form the DuckDB oracle uses. Out-of-range positions yield 0; a
  * malformed truncated tail compares as mismatch (conservative). */
final case class SuffixLcp(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val want = Seq(StringType, IntegerType, StringType, IntegerType)
    val got = children.map(_.dataType)
    if (got == want) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int, string, int), got " +
        got.map(_.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_suffix_lcp"

  override protected def nullSafeEval(ta: Any, pa: Any, tb: Any, pb: Any): Any =
    SuffixLcp.lcp(ta.asInstanceOf[UTF8String], pa.asInstanceOf[Int],
      tb.asInstanceOf[UTF8String], pb.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ta, pa, tb, pb) =>
      s"${ev.value} = graft.functions.SuffixLcp.lcp($ta, $pa, $tb, $pb);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SuffixLcp =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object SuffixLcp {
  /** Column-API entry: `suffixLcp(text_a, pos_a, text_b, pos_b)`. */
  def suffixLcp(ta: Column, pa: Column, tb: Column, pb: Column): Column =
    Bridge.column(SuffixLcp(Bridge.expression(ta), Bridge.expression(pa),
      Bridge.expression(tb), Bridge.expression(pb)))

  /** Advance `k` codepoints from byte 0; returns bytes.length if the
    * string is shorter than k chars. */
  private def skipChars(b: Array[Byte], k: Int): Int = {
    var i = 0
    var c = 0
    while (c < k && i < b.length) {
      i += UTF8String.numBytesForFirstByte(b(i))
      c += 1
    }
    math.min(i, b.length)
  }

  /** Static kernel, called from generated code. O(matched bytes). */
  def lcp(ua: UTF8String, pa: Int, ub: UTF8String, pb: Int): Long = {
    if (pa < 1 || pb < 1) return 0L
    val a = ua.getBytes
    val b = ub.getBytes
    var ia = skipChars(a, pa - 1)
    var ib = skipChars(b, pb - 1)
    var n = 0L
    while (ia < a.length && ib < b.length) {
      val la = UTF8String.numBytesForFirstByte(a(ia))
      if (la != UTF8String.numBytesForFirstByte(b(ib))) return n
      if (ia + la > a.length || ib + la > b.length) return n // truncated tail
      var k = 0
      while (k < la) {
        if (a(ia + k) != b(ib + k)) return n
        k += 1
      }
      ia += la; ib += la; n += 1
    }
    n
  }
}
