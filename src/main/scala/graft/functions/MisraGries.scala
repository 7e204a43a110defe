package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra–Gries heavy-hitters summary: the mergeable bounded-memory
  * frequency sketch (Agarwal et al., "Mergeable Summaries"). The pure
  * add/merge kernel lives here so the two execution surfaces share one
  * implementation:
  *   - [[graft.ext.Sketches.heavyHitters]] — RDD `treeAggregate` (the
  *     high-throughput path: plain JVM maps, no row encoding);
  *   - [[MgAggregator]] — a typed `Aggregator` registered as the SQL
  *     aggregate `graft_heavy_hitters(col)` (the SQL-surface path:
  *     usable in `spark.sql`, grouped aggregates, and streaming).
  *
  * Contract at capacity c over N items: every item with true count
  * > N/(c+1) survives; each reported count undercounts by ≤ N/(c+1);
  * when c ≥ distinct-item count no decrement fires and counts are EXACT.
  */
object MisraGries {

  type MG = mutable.HashMap[String, Long]

  def shrink(m: MG, by: Long): Unit = if (by > 0) {
    val ks = m.keys.toArray
    var i = 0
    while (i < ks.length) {
      val nv = m(ks(i)) - by
      if (nv <= 0) m.remove(ks(i)) else m(ks(i)) = nv
      i += 1
    }
  }

  def add(m: MG, t: String, capacity: Int): MG = {
    if (m.contains(t)) m(t) += 1
    else if (m.size < capacity) m(t) = 1L
    else shrink(m, 1) // classic decrement-all step
    m
  }

  def merge(a: MG, b: MG, capacity: Int): MG = {
    b.foreach { case (t, v) => a(t) = a.getOrElse(t, 0L) + v }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val vs = a.values.toArray.sorted(Ordering[Long].reverse)
      shrink(a, vs(capacity))
    }
    a
  }
}

/** Typed-Aggregator form of [[MisraGries]], for SQL registration
  * (`spark.udf.register("graft_heavy_hitters", udaf(new MgAggregator(64)))`).
  * Buffer rides Kryo (an opaque binary aggregation buffer — the
  * ObjectHashAggregate path, like Spark's own collect_list/percentile);
  * output is a plain map<string,bigint> of the surviving entries, ready
  * for `explode` + ORDER BY in SQL. Partial aggregation still applies:
  * each task reduces its rows into ONE ≤capacity-entry buffer before the
  * exchange, so the shuffle carries O(capacity) per task, never the rows. */
final class MgAggregator(capacity: Int)
    extends Aggregator[String, MisraGries.MG, Map[String, Long]] {
  require(capacity >= 1, "capacity must be >= 1")
  override def zero: MisraGries.MG = new MisraGries.MG
  override def reduce(m: MisraGries.MG, t: String): MisraGries.MG =
    MisraGries.add(m, t, capacity)
  override def merge(a: MisraGries.MG, b: MisraGries.MG): MisraGries.MG =
    MisraGries.merge(a, b, capacity)
  override def finish(m: MisraGries.MG): Map[String, Long] = m.toMap
  override def bufferEncoder: Encoder[MisraGries.MG] = Encoders.kryo[MisraGries.MG]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
