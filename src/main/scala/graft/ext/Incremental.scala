package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (materialized-view-style) aggregation — the pattern that
  * keeps 100 TB rollups affordable: aggregate each ingest batch/partition
  * once into small ALGEBRAIC partials (count, sum — anything with an
  * associative merge), persist the partials, and answer queries by
  * merging partials instead of rescanning raw events. A day's reprocess
  * touches one partial; the full-history query reads |days|·|groups|
  * rows, not the event log.
  *
  * The merge step is provably equivalent to the direct aggregate:
  * COUNT = Σ partial counts, SUM = Σ partial sums (exercised by the
  * ext_partial_agg_merge oracle, which checks the two-level form against
  * DuckDB's single-level GROUP BY). AVG and friends derive from
  * (count, sum) at merge time; non-algebraic aggregates (exact
  * percentiles) need the sketch path ([[Sketches]]) instead. */
object Incremental {

  /** One partial row per (event_type, day): the persisted rollup unit.
    * Map-side partial aggregation (partial+final HashAggregate) means the
    * shuffle already carries group-level rows, not events. */
  def dailyPartials(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))

  /** Merge partials to per-type totals — the query-time step. Reads only
    * the partial table; never the raw events. */
  def mergePartials(partials: DataFrame): DataFrame =
    partials.groupBy("event_type")
      .agg(sum(col("cnt")).as("n"), round(sum(col("sv")), 4).as("s"))
}
