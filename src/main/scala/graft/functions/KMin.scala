package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** k-minimum-values bounded-state aggregate: keep the k lexicographically
  * smallest distinct strings per group — the state kernel of a KMV
  * distinct-value/Jaccard sketch (Bar-Yossef et al. 2002; Beyer et al.
  * 2007) over md5-hex values, whose lexicographic order IS the hash
  * order.
  *
  * Why this exists instead of `row_number() OVER (ORDER BY h)`: the rank
  * window sorts EVERY distinct value per group to keep k of them — a
  * full per-group sort whose cost grows with the value universe. This
  * aggregate carries O(k) state per group through a normal partial+final
  * aggregation: each task reduces its rows into one ≤k-entry buffer
  * before the exchange, so the shuffle and the final merge see O(k·tasks)
  * values, never the universe. Same output, plan goes
  * sort-the-world → ObjectHashAggregate (PlanSpec pins it).
  *
  * Buffer = a binary MAX-heap in an ArrayBuffer (kryo-friendly; no
  * comparator object to serialize): admit v iff the heap is under
  * capacity or v < heap-max; eviction pops the max. Duplicate values are
  * rejected by an O(k) membership scan that runs ONLY on the admit path
  * (a duplicate still present is < max so it reaches the scan; a
  * duplicate already evicted is ≥ max and exits O(1)), so steady-state
  * cost per row is one string compare. */
object KMin {

  type Buf = mutable.ArrayBuffer[String]

  private def swap(h: Buf, i: Int, j: Int): Unit = {
    val t = h(i); h(i) = h(j); h(j) = t
  }

  private def siftUp(h: Buf, i0: Int): Unit = {
    var i = i0
    while (i > 0 && h((i - 1) / 2) < h(i)) {
      swap(h, i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(h: Buf): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < h.length && h(l) > h(m)) m = l
      if (r < h.length && h(r) > h(m)) m = r
      if (m == i) done = true else { swap(h, i, m); i = m }
    }
  }

  def add(h: Buf, v: String, k: Int): Buf = {
    if (v != null) {
      if (h.length < k) {
        if (!h.contains(v)) { h += v; siftUp(h, h.length - 1) }
      } else if (v < h(0)) {
        if (!h.contains(v)) { h(0) = v; siftDown(h) }
      }
    }
    h
  }

  def merge(a: Buf, b: Buf, k: Int): Buf = {
    b.foreach(add(a, _, k))
    a
  }

  /** Ascending-sorted signature — the `sort_array(collect_list(...))` of
    * the k survivors. */
  def result(h: Buf): Seq[String] = h.toSeq.sorted
}

/** Typed-Aggregator form of [[KMin]] (the [[MgAggregator]] /
  * [[QsAggregator]] registration split): usable inline via
  * `functions.udaf(new KMinAgg(k))` and registered as the SQL aggregate
  * `graft_kmin(col)` at k = 256. Output: array<string> of the k smallest
  * distinct values, ascending. */
final class KMinAgg(k: Int)
    extends Aggregator[String, KMin.Buf, Seq[String]] {
  require(k >= 1, "k must be >= 1")
  override def zero: KMin.Buf = new KMin.Buf
  override def reduce(h: KMin.Buf, v: String): KMin.Buf = KMin.add(h, v, k)
  override def merge(a: KMin.Buf, b: KMin.Buf): KMin.Buf = KMin.merge(a, b, k)
  override def finish(h: KMin.Buf): Seq[String] = KMin.result(h)
  override def bufferEncoder: Encoder[KMin.Buf] = Encoders.kryo[KMin.Buf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
