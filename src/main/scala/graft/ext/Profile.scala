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

  /** Benford first-digit audit of a numeric column — the classic
    * fabricated-/synthetic-data screen: organically-grown magnitudes
    * follow P(d) = log₁₀(1 + 1/d); generator artifacts (uniform draws,
    * capped fields, copy-pasted constants) show up as a digit histogram
    * that rejects it. Output: one row per leading digit 1–9 with its
    * observed count, Benford-expected count, χ² contribution, and the
    * total χ² riding along.
    *
    * Determinism contract: the leading digit is taken from the DECIMAL
    * STRING of the value scaled to an exact 4-decimal integer
    * (`round(x·10⁴)` → BIGINT → first char), never from
    * `floor(log10(x))` — libm log differences can flip the floor at
    * power-of-ten boundaries, integer string rendering cannot. Expected
    * shares use ln of exact integers only (log₁₀(1+1/d) =
    * (ln(d+1)−ln d)/ln 10), and the χ² total folds its nine
    * contributions in digit order, so the double association is
    * engine-identical. Shape: one pure map + one 9-group aggregate —
    * scan-speed, 9-row reduce state at any scale. */
  def benford(df: DataFrame, valueCol: String = "value"): DataFrame = {
    val iv = round(col(valueCol) * lit(10000)).cast("long")
    val digits = df.where(col(valueCol).isNotNull && iv > 0)
      .select(substring(iv.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val n = digits.agg(sum("n_obs").as("n"))
    val expected = (log((col("digit") + 1).cast("double")) - log(col("digit").cast("double"))) /
      log(lit(10.0)) * col("n").cast("double")
    val k = digits.crossJoin(broadcast(n))
      .withColumn("n_exp", expected)
      .withColumn("contrib",
        (col("n_obs").cast("double") - col("n_exp")) *
          (col("n_obs").cast("double") - col("n_exp")) / col("n_exp"))
    val chi2 = k.agg(aggregate(sort_array(collect_list(struct(col("digit"), col("contrib")))),
      lit(0.0), (a, x) => a + x.getField("contrib")).as("chi2"))
    k.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n_obs"), round(col("n_exp"), 4).as("n_exp"),
        round(col("contrib"), 4).as("contrib"), round(col("chi2"), 4).as("chi2"))
      .orderBy("digit")
  }
}
