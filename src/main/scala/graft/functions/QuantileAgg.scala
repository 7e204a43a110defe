package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.ext.Sketches.QuantileSketch
import graft.ext.Sketches.QuantileSketch.QS

/** Typed-Aggregator form of [[graft.ext.Sketches.QuantileSketch]], for SQL
  * registration (`graft_quantiles(col)`) — same one-kernel-two-surfaces
  * split as [[MgAggregator]]/[[MisraGries]]: the RDD `treeAggregate` path
  * is [[graft.ext.Sketches.quantilesOf]]; this is the SQL/grouped path.
  *
  * Buffer rides Kryo (opaque binary — the ObjectHashAggregate path);
  * partial aggregation still applies, so the exchange carries one
  * O(capacity·log) summary per task, never the rows. Input is BOXED
  * Double so SQL NULLs decode and are skipped (aggregate convention);
  * NaN/±Inf are skipped too, matching `quantilesOf`. Output: the
  * estimates at the construction-time `probes`, as array<double> in probe
  * order (ROUND ·,4). Exact whenever the aggregated group has ≤ capacity
  * finite rows (no compaction fires — see the QuantileSketch scaladoc). */
final class QsAggregator(capacity: Int, probes: Seq[Double],
    requireExact: Boolean = false)
    extends Aggregator[java.lang.Double, QS, Seq[Double]] {
  require(capacity >= 1 && probes.nonEmpty)
  override def zero: QS = new QS()
  override def reduce(s: QS, x: java.lang.Double): QS =
    if (x != null && java.lang.Double.isFinite(x))
      QuantileSketch.add(s, x.doubleValue(), capacity)
    else s
  override def merge(a: QS, b: QS): QS = QuantileSketch.merge(a, b, capacity)
  override def finish(s: QS): Seq[Double] = {
    // requireExact: the "exact while the group ≤ capacity rows" contract
    // becomes a runtime check — a group that compacted fails loudly
    // instead of silently handing an approximation to an exact-rank oracle
    if (requireExact && s.levels.length > 1) throw new IllegalStateException(
      s"graft_quantiles_exact: group compacted (n=${s.n} > capacity=$capacity)")
    if (s.n == 0) Seq.empty
    else probes.map(q => BigDecimal(QuantileSketch.quantile(s, q))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
  override def bufferEncoder: Encoder[QS] = Encoders.kryo[QS]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
