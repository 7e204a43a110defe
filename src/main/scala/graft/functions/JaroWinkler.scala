package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity over two string columns — the
  * record-linkage standard (person/entity name matching) Spark's
  * built-ins lack (only `levenshtein` ships). Classic definition:
  * Jaro from (matches within ⌊max(l1,l2)/2⌋−1, half-transpositions),
  * Winkler prefix bonus `j + pl·0.1·(1−j)` for the common prefix
  * (≤ 4) applied only when jaro > 0.7 (the boost threshold).
  *
  * Byte-level, matching DuckDB's `jaro_winkler_similarity` (UTF-8
  * byte sequences) — JaroWinklerSpec pins equality against DuckDB's
  * published values to the last ulp, which is what lets queries built
  * on it carry hash oracles. Codegen emits a static call into
  * [[JaroWinkler.jw]], so the expression stays inside the surrounding
  * whole-stage-codegen span (same pattern as Spark's own string
  * functions). Null in → null out (BinaryExpression default); empty
  * string → 0.0 (DuckDB convention, NOT the "both empty = 1" variant).
  */
final case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaroWinkler.jw($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-API entry: `jaroWinkler(a, b)`. */
  def jaroWinkler(x: Column, y: Column): Column =
    Bridge.column(JaroWinklerSim(Bridge.expression(x), Bridge.expression(y)))

  /** Static kernel, called from generated code. O(l1·window) time,
    * O(l1+l2) scratch. */
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: mismatches between the two matched sequences
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var pl = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (pl < maxP && a(pl) == b(pl)) pl += 1
    jaro + pl * 0.1 * (1.0 - jaro)
  }
}
