package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking: `array<string>` tokens →
  * `array<string>` of chunk texts (space-joined token runs).
  *
  * Boundary rule (identical to the SQL formulation it replaces): a new
  * chunk starts at token `pos` (pos ≥ window) when the md5 of the
  * `window`-token shingle ending at pos−1 lands in bucket 0 of
  * `avgChunk` — bucket = first two digest bytes as a big-endian int,
  * mod avgChunk (= `conv(substring(md5(sh), 1, 4), 16, 10) % avgChunk`).
  *
  * Why native: the relational form needed a per-token `posexplode`
  * (copying the parent row per token), a window prefix-sum over
  * (doc_id, pos) — a full shuffle+sort of every token occurrence — and
  * a `collect_list`+`sort_array` reassembly (ObjectHashAggregate, no
  * codegen) just to rebuild adjacency the row already had. This walks
  * the token array once per row, so chunking is SHUFFLE-FREE at any
  * scale; the only exchange left in the dup report is the final
  * hash-groupBy of chunk hashes. */
final case class CdcChunks(child: Expression, window: Int, avgChunk: Int)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")
  require(avgChunk >= 1, s"avgChunk must be >= 1, got $avgChunk")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[ArrayData], window, avgChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.CdcChunks.compute($x, $window, $avgChunk);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  private val Sep = UTF8String.fromString(" ")

  /** One pass: at each candidate position hash the trailing shingle
    * (md5 of its UTF-8 bytes — byte-identical to SQL `md5` of the
    * space-joined shingle string) and cut when bucket 0 hits. */
  def compute(arr: ArrayData, window: Int, avgChunk: Int): ArrayData = {
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var pos = 1
    while (pos < len) {
      if (pos >= window) {
        // shingle covering tokens [pos-window, pos)
        val parts = new Array[UTF8String](window)
        var j = 0
        while (j < window) { parts(j) = toks(pos - window + j); j += 1 }
        md.reset()
        val d = md.digest(UTF8String.concatWs(Sep, parts: _*).getBytes)
        val bucket = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % avgChunk
        if (bucket == 0) {
          chunks += UTF8String.concatWs(Sep, java.util.Arrays.copyOfRange(toks, start, pos): _*)
          start = pos
        }
      }
      pos += 1
    }
    chunks += UTF8String.concatWs(Sep, java.util.Arrays.copyOfRange(toks, start, len): _*)
    new GenericArrayData(chunks.toArray)
  }

  /** Column-API entry: `cdcChunksNative(toks, window, avgChunk)`. */
  def cdcChunksNative(toks: Column, window: Int, avgChunk: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(toks), window, avgChunk))
}
