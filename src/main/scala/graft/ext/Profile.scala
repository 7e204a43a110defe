package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, TimestampNTZType, TimestampType}

/** Dataset profiling — the per-column statistics pass (row/null/distinct
  * counts, numeric ranges) that fronts every large-scale ingest: schema
  * sanity, null-rate regressions, key-uniqueness checks, and partition-
  * sizing inputs all read from this one report.
  *
  * Shape: the frame is melted in-row to (column, value) via one
  * `explode(array(struct...))` — a C× row replication (C = profiled
  * columns) that stays pipelined inside codegen, followed by ONE
  * aggregation keyed by column name. No per-column jobs, no driver loop
  * over columns: profiling 50 columns of a 100 TB table is one shuffle
  * whose reduce side is C rows.
  *
  * Exact distinct counts are the oracle-checkable default; at petabyte
  * scale swap `exact = false` for `approx_count_distinct` (same single
  * shuffle, HLL-sketch state instead of value sets — the standard
  * trade). Numeric min/max are reported ROUND(·,4) as doubles;
  * timestamps profile their range as epoch microseconds (exact integers
  * < 2^53, so the double carries them losslessly); non-numeric columns
  * report NULL ranges (string collation ordering is engine-specific, so
  * cross-engine contracts stay on the numeric columns). */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def numOrNull(c: String): Column = df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case TimestampType | TimestampNTZType => unix_micros(col(c).cast(TimestampType)).cast("double")
      case _ => lit(null).cast("double")
    }
    val melted = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"),
          numOrNull(c).as("vn"))): _*)).as("x"))
      .select(col("x.col_name"), col("x.v"), col("x.vn"))
    val nDistinct =
      if (exact) countDistinct(col("v")).as("n_distinct")
      else approx_count_distinct(col("v")).as("n_distinct")
    melted.groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        nDistinct,
        round(min(col("vn")), 4).as("min_num"),
        round(max(col("vn")), 4).as("max_num"))
  }
}
