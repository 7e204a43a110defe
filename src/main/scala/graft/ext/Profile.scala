package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Hill tail-index estimate of a positive numeric column — "how heavy
    * is this tail really" (α ≈ 1–2 ⇒ power-law-heavy: means unstable,
    * salting/capping needed downstream; α large ⇒ light tail): α =
    * k / Σ_{i≤k} ln(xᵢ/x_ref) over the top-k order statistics with
    * x_ref the (k+1)-th. The top-(k+1) cut is a TakeOrdered (never a
    * global sort); ranks are ROW_NUMBER over (value desc, id) so ties
    * can't float; the k lns see engine-identical doubles and fold in
    * rank order under StableRound. Output: one row (k, x_ref, alpha). */
  def tailIndex(df: DataFrame, valueCol: String, idCol: String,
      k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = df.where(col(valueCol) > 0)
      .select(col(valueCol).as("v"), col(idCol).as("id"))
      .orderBy(col("v").desc, col("id")).limit(k + 1)
    // window over <= k+1 rows by construction
    val ranked = top.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc, col("id"))))
    val ref = ranked.where(col("rn") === k + 1).select(col("v").as("x_ref"))
    ranked.where(col("rn") <= k)
      .crossJoin(broadcast(ref))
      .agg(count(lit(1)).as("k"),
        round(first(col("x_ref")), 4).as("x_ref"),
        aggregate(sort_array(collect_list(struct(col("rn"),
            log(col("v") / col("x_ref")).as("t")))),
          lit(0.0), (a, x) => a + x.getField("t")).as("sln"))
      .select(col("k"), col("x_ref"),
        when(col("sln") > 0.0,
          graft.functions.StableRound.col4(col("k").cast("double") / col("sln")))
          .as("alpha"))
  }

  /** k-anonymity census over a quasi-identifier tuple — the privacy
    * pre-flight before releasing or joining a dataset: every record's
    * equivalence class is its QI group, and records in classes smaller
    * than k are re-identifiable. Reports, per class-size bucket, how
    * many classes and records sit there, plus the share of records
    * below the 2/5/10 thresholds — all exact integer counts off ONE
    * QI-keyed aggregate (the class-size histogram is O(√N) rows at
    * worst, tiny in practice). */
  def kAnonymity(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val classes = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("k"))
    val hist = classes.groupBy("k")
      .agg(count(lit(1)).as("n_classes"), sum("k").as("n_records"))
    val tot = hist.agg(sum("n_records").as("n"),
      sum(when(col("k") < 2, col("n_records")).otherwise(0L)).as("lt2"),
      sum(when(col("k") < 5, col("n_records")).otherwise(0L)).as("lt5"),
      sum(when(col("k") < 10, col("n_records")).otherwise(0L)).as("lt10"))
    hist.crossJoin(broadcast(tot))
      .select(col("k").as("class_size"), col("n_classes"), col("n_records"),
        round(col("lt2").cast("double") / col("n").cast("double"), 4).as("frac_lt2"),
        round(col("lt5").cast("double") / col("n").cast("double"), 4).as("frac_lt5"),
        round(col("lt10").cast("double") / col("n").cast("double"), 4).as("frac_lt10"))
      .orderBy("class_size")
  }

  /** l-diversity census — [[kAnonymity]]'s sensitive-attribute
    * companion (Machanavajjhala et al. 2007): a QI class can be large
    * (k-anonymous) yet still leak if every member shares the same
    * sensitive value, so the metric that matters is l = #distinct
    * sensitive values per class. Reports the class histogram by l plus
    * the share of records in classes below l=2 / l=3 — all exact
    * integer counts off one QI-keyed distinct aggregate. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(col(sensitiveCol)).as("l"))
    val hist = classes.groupBy("l")
      .agg(count(lit(1)).as("n_classes"), sum("n").as("n_records"))
    val tot = hist.agg(sum("n_records").as("n"),
      sum(when(col("l") < 2, col("n_records")).otherwise(0L)).as("lt2"),
      sum(when(col("l") < 3, col("n_records")).otherwise(0L)).as("lt3"))
    hist.crossJoin(broadcast(tot))
      .select(col("l"), col("n_classes"), col("n_records"),
        round(col("lt2").cast("double") / col("n").cast("double"), 4).as("frac_lt2"),
        round(col("lt3").cast("double") / col("n").cast("double"), 4).as("frac_lt3"))
      .orderBy("l")
  }

  /** Pairwise Pearson correlation matrix over numeric columns — the
    * profiling pass that catches redundant features and broken derived
    * columns (price ≈ qty·unit) before a model sees them. Values are
    * 2-decimal-scaled longs; every raw moment (Σx, Σx², Σxy) is an
    * exact DECIMAL(38,0) sum off ONE aggregate over one scan, and
    * r = (nΣxy − ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) assembles the
    * C² pairs from that single row. NULL r on zero variance. Rows with
    * a NULL in any profiled column are excluded (complete-case, the
    * standard corr-matrix convention).
    * Shape: one scan + one C²-column aggregate; C²-bounded assembly. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.toSet.size == cols.size,
      "need >= 2 distinct columns")
    val D = "decimal(38,0)"
    val base = df
      .where(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        round(col(c) * 100).cast("long").cast(D).as(s"v_$c")): _*)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = count(lit(1)).cast(D).as("n") +:
      (cols.flatMap(c => Seq(
        sum(col(s"v_$c")).as(s"s_$c"),
        sum(col(s"v_$c") * col(s"v_$c")).as(s"q_$c"))) ++
        pairs.map { case (a, b) =>
          sum(col(s"v_$a") * col(s"v_$b")).as(s"p_${a}_$b")
        })
    val t = base.agg(aggs.head, aggs.tail: _*)
    def dvar(c: String) =
      (col("n") * col(s"q_$c") - col(s"s_$c") * col(s"s_$c")).cast("double")
    pairs.map { case (a, b) =>
      t.select(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n").cast("long").as("n"),
        when(dvar(a) > 0.0 && dvar(b) > 0.0,
          round((col("n") * col(s"p_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
            .cast("double") / (sqrt(dvar(a)) * sqrt(dvar(b))), 4)).as("r"))
    }.reduce(_ unionAll _).orderBy("col_a", "col_b")
  }

  /** t-closeness census (Li, Li & Venkatasubramanian 2007) over
    * quasi-identifier classes against an ORDINAL sensitive attribute:
    * per class, the ordered earth-mover's distance between the class's
    * sensitive distribution and the global one,
    * t = Σ_j |Σ_{i≤j}(p_i − q_i)| / (m−1). Everything decision-bearing
    * is integer-exact: the cumulative is over c_i·N − g_i·n longs (the
    * common-denominator form), and the threshold fractions compare
    * 5·Σ|cum| vs (m−1)·n·N / 2·Σ|cum| vs (m−1)·n·N — never a float.
    * Output is the census (class count, records, max t, record share
    * in classes with t > 0.2 / > 0.5) — per-class t stays inside.
    *
    * Scale shape: one QI rollup + an m-bounded grid expansion + one
    * QI-keyed window cumsum — the [[lDiversity]] plan plus one ordered
    * pass; the global distribution is m rows, broadcast. */
  def tCloseness(df: DataFrame, qiCols: Seq[String],
      sensCol: String): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val qi = qiCols.map(col)
    val cells = df.groupBy(qi :+ col(sensCol).as("sv"): _*)
      .agg(count(lit(1)).as("c"))
    val classes = cells.groupBy(qi: _*).agg(sum("c").as("n"))
    val globalD = cells.groupBy("sv").agg(sum("c").as("g"))
    val tot = globalD.agg(sum("g").as("nn"), count(lit(1)).as("m"))
    // full class × sensitive-domain grid so zero cells enter the EMD
    val grid = classes.crossJoin(broadcast(globalD))
      .join(cells, qiCols :+ "sv", "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("d", col("c") * col("nn") - col("g") * col("n"))
    val w = Window.partitionBy(qi: _*).orderBy("sv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perClass = grid.withColumn("cum", sum("d").over(w))
      .groupBy(qi :+ col("n") :+ col("nn") :+ col("m"): _*)
      .agg(sum(abs(col("cum"))).as("acum"))
      // t = acum / ((m−1)·n·nn); threshold tests cross-multiplied exact
      .withColumn("den", (col("m") - 1) * col("n") * col("nn"))
    perClass.agg(count(lit(1)).as("n_classes"), sum("n").as("n_records"),
        max(col("acum").cast("double") / col("den").cast("double")).as("tmax"),
        sum(when(col("acum") * 5 > col("den"), col("n")).otherwise(0L))
          .as("gt02"),
        sum(when(col("acum") * 2 > col("den"), col("n")).otherwise(0L))
          .as("gt05"))
      .select(col("n_classes"), col("n_records"),
        round(col("tmax"), 4).as("max_t"),
        round(col("gt02").cast("double") / col("n_records").cast("double"), 4)
          .as("frac_t_gt_02"),
        round(col("gt05").cast("double") / col("n_records").cast("double"), 4)
          .as("frac_t_gt_05"))
  }

  /** ε-differentially-private release of per-category counts via the
    * Laplace mechanism (sensitivity 1 for a count query ⇒ scale
    * b = 1/ε). The noise draw is the engine's standard DETERMINISTIC
    * substitute for RNG: a uniform from the category's md5 (the
    * [[TextAnalysis.prioritySample]] idiom), inverse-CDF'd to
    * Laplace — noise = −b·sign(v)·ln(1 − 2|v|), v = u − ½ ∈ (−½,½)\{0}
    * (u = (h + 0.5)/2³² can never hit ½ exactly). Same hash → same
    * release, replayable in SQL; swap the salt to redraw. One
    * aggregation; output (cat, noisy_n, b) — the true count never
    * leaves the operator. */
  def dpCounts(df: DataFrame, catCol: String, epsilon: Double = 1.0,
      salt: String = "dp1"): DataFrame = {
    require(epsilon > 0.0, "epsilon must be positive")
    val b = 1.0 / epsilon
    val u = (conv(substring(md5(concat(lit(salt + ":"), col("cat").cast("string"))),
      1, 8), 16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    val v = u - lit(0.5)
    df.groupBy(col(catCol).as("cat"))
      .agg(count(lit(1)).as("n"))
      .select(col("cat"),
        round(col("n").cast("double") +
          lit(-b) * signum(v) * log(lit(1.0) - lit(2.0) * abs(v)), 4)
          .as("noisy_n"),
        lit(b).as("b"))
      .orderBy("cat")
  }

  /** Herfindahl–Hirschman concentration of the event-type mix per
    * hour-of-day — "is 3am traffic one bot type or a healthy mix".
    * HHI = Σ share² = Σc²/N² and the effective type count 1/HHI = N²/Σc²
    * are RATIOS OF EXACT INTEGERS (no per-type double fold at all), off
    * one (hr, type) rollup. Output: (hr, n, n_types, hhi, n_eff). */
  def hourlyHhi(events: DataFrame): DataFrame = {
    val c = events.select(hour(col("ts")).as("hr"), col("event_type"))
      .groupBy("hr", "event_type").agg(count(lit(1)).as("c"))
    c.groupBy("hr").agg(sum("c").as("n"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("ss"))
      .select(col("hr"), col("n"), col("n_types"),
        round(col("ss").cast("double") / (col("n") * col("n")).cast("double"), 4)
          .as("hhi"),
        round((col("n") * col("n")).cast("double") / col("ss").cast("double"), 4)
          .as("n_eff"))
      .orderBy("hr")
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
