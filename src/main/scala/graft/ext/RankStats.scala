package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based (non-parametric) statistics: Spearman correlation,
  * Mann–Whitney U, Kruskal–Wallis H, and a binned Kendall tau-b — the
  * distribution-free complements to the moment tests in [[Drift]]
  * (Welch t, ANOVA F). A data-quality pipeline reaches for these when
  * the metric is heavy-tailed (doc lengths, event values), where mean
  * tests lose power and a single outlier page can swing the verdict.
  *
  * Determinism contract (the cross-engine rule this whole file obeys):
  * every ranking decision is INTEGER-exact. Average ranks with ties are
  * held doubled (2·avgrank = 2·N_less + c + 1 — always an integer), all
  * moments accumulate in DECIMAL(38,0) (exact, order-independent), and
  * doubles appear only in the final statistic, assembled by the same
  * expression in Spark and the DuckDB oracle.
  *
  * Scale shapes:
  *  - per-group rankings ([[spearman]]) window over the DISTINCT-value
  *    table (bounded by the value domain, not the row count) and join
  *    back — never a per-row window;
  *  - GLOBAL rankings ([[mannWhitney]], [[kruskalWallis]]) use
  *    [[Temporal.runningSum]]'s two-pass range-partitioned prefix sum
  *    over distinct values — no single-partition window anywhere;
  *  - [[kendallTauBinned]] works on a domain-bounded contingency grid,
  *    so the pair "join" is over cells (≤ |X|·|Y| rows), not rows.
  */
object RankStats {

  private val Dec = "decimal(38,0)"

  /** 2·average-rank of each distinct value within its group: an exact
    * integer (2·avgrank = 2·N_less + c + 1). Input: df with (grp, v);
    * output (grp, v, c, r2). The window runs over the per-group
    * DISTINCT-value table — cardinality bounded by the value domain. */
  private def groupedRanks2(df: DataFrame): DataFrame = {
    val counts = df.groupBy("grp", "v").agg(count(lit(1)).as("c"))
    counts.withColumn("r2",
      lit(2L) * (sum("c").over(Window.partitionBy("grp").orderBy("v")) - col("c"))
        + col("c") + lit(1L))
  }

  /** Per-group Spearman rank correlation between two row metrics.
    * Ranks come from [[groupedRanks2]] (doubled average ranks, exact
    * integers); the correlation is Pearson on those integers via raw
    * moments in DECIMAL(38,0):
    *   rho = (nΣuv − ΣuΣv) / sqrt((nΣu² − (Σu)²)(nΣv² − (Σv)²))
    * Two shuffle joins (rows→x-ranks, rows→y-ranks) plus one
    * aggregation; NULL when a metric is constant within the group.
    * Output: (grp, n, rho ROUND·,4). */
  def spearman(df: DataFrame, groupCol: String, xCol: Column, yCol: Column): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"), xCol.as("x"), yCol.as("y"))
    val rx = groupedRanks2(rows.select(col("grp"), col("x").as("v")))
      .select(col("grp"), col("v").as("x"), col("r2").as("u"))
    val ry = groupedRanks2(rows.select(col("grp"), col("y").as("v")))
      .select(col("grp"), col("v").as("y"), col("r2").as("v2"))
    val ranked = rows.join(rx, Seq("grp", "x")).join(ry, Seq("grp", "y"))
      .select(col("grp"), col("u").cast(Dec).as("u"), col("v2").cast(Dec).as("v"))
    val m = ranked.groupBy("grp").agg(
      count(lit(1)).cast(Dec).as("n"),
      sum("u").as("su"), sum("v").as("sv"),
      sum(col("u") * col("u")).as("suu"),
      sum(col("v") * col("v")).as("svv"),
      sum(col("u") * col("v")).as("suv"))
    m.select(col("grp"), col("n").cast("long").as("n"),
        (col("n") * col("suv") - col("su") * col("sv")).cast("double").as("num"),
        (col("n") * col("suu") - col("su") * col("su")).cast("double").as("dx"),
        (col("n") * col("svv") - col("sv") * col("sv")).cast("double").as("dy"))
      .select(col("grp"), col("n"),
        (round(when(col("dx") > 0.0 && col("dy") > 0.0,
          col("num") / sqrt(col("dx") * col("dy"))), 4) + lit(0.0)).as("rho"))
      .orderBy("grp")
  }

  /** Doubled GLOBAL average rank per distinct value, without a global
    * window: per-value counts, then [[Temporal.runningSum]]'s two-pass
    * range-partitioned prefix sum. Output: (v, c, r2) with
    * r2 = 2·N_less + c + 1 (exact integer). */
  private def globalRanks2(values: DataFrame): DataFrame = {
    val counts = values.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val run = Temporal.runningSum(counts, "v", "c")
      .withColumnRenamed("running_sum", "cum")
    counts.join(run, "v")
      .select(col("v"), col("c"),
        (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L)).as("r2"))
  }

  /** Mann–Whitney U test (two-sided z with tie correction) comparing
    * `valueCol` between two categories of `typeCol`. U is the
    * win-count statistic for A (#{a&gt;b} + ½ties = R_A − n_A(n_A+1)/2),
    * assembled from per-distinct-value counts:
    *   2U_a = Σ_v cA_v · (2·N_b,less(v) + cB_v)   (exact integer)
    * with N_b,less from the distributed running sum — no per-row
    * ranking, no global window. z uses the tied-rank variance
    *   Var U = n1·n2/12 · (N+1 − T/(N(N−1))),  T = Σ(t³−t).
    * Output: one row (n_a, n_b, u2_a BIGINT = 2·U_a, u_a, z). */
  def mannWhitney(df: DataFrame, typeCol: String, valueCol: String,
      catA: String, catB: String): DataFrame = {
    val vc = df.where(col(typeCol).isin(catA, catB) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(typeCol) === catA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(typeCol) === catB, 1L).otherwise(0L)).as("cb"))
    val runB = Temporal.runningSum(vc.select(col("v"), col("cb")), "v", "cb")
      .withColumnRenamed("running_sum", "cumb")
    val j = vc.join(runB, "v")
    val agg = j.agg(
      sum("ca").as("n_a"), sum("cb").as("n_b"),
      sum((col("ca").cast(Dec)) * (lit(2L) * (col("cumb") - col("cb")) + col("cb")).cast(Dec))
        .as("u2"),
      sum(((col("ca") + col("cb")).cast(Dec) * (col("ca") + col("cb")).cast(Dec)
        * (col("ca") + col("cb")).cast(Dec)) - (col("ca") + col("cb")).cast(Dec))
        .as("ties"))
    agg.select(col("n_a"), col("n_b"), col("u2").cast("long").as("u2_a"),
        col("u2").cast("double").as("u2d"), col("ties").cast("double").as("t"),
        (col("n_a") + col("n_b")).cast("double").as("nn"))
      .select(col("n_a"), col("n_b"), col("u2_a"),
        round(col("u2d") / 2.0, 1).as("u_a"),
        (round(
          (col("u2d") - col("n_a").cast("double") * col("n_b").cast("double")) /
            (lit(2.0) * sqrt(
              col("n_a").cast("double") * col("n_b").cast("double") / 12.0 *
                ((col("nn") + 1.0) - col("t") / (col("nn") * (col("nn") - 1.0))))),
          4) + lit(0.0)).as("z"))
  }

  /** Kruskal–Wallis H test of `valueCol` across ALL categories of
    * `typeCol`. Global tied ranks via [[globalRanks2]] (distributed,
    * integer-exact); per-group doubled rank sums 2R_j in DECIMAL;
    *   H = 12/(N(N+1)) · Σ_j R_j²/n_j − 3(N+1)
    * folded over groups in category order (the engine-identical double
    * association), tie-corrected Hc = H / (1 − T/(N³−N)).
    * Output: one row per category (grp, n, mean_rank) with (h, h_c)
    * riders — the [[Drift.anovaF]] presentation. */
  def kruskalWallis(df: DataFrame, typeCol: String, valueCol: String): DataFrame = {
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(typeCol).as("grp"), col(valueCol).as("v"))
    val r2 = globalRanks2(rows.select("v"))
    // per-(group, value) counts joined to the global rank of the value
    val gv = rows.groupBy("grp", "v").agg(count(lit(1)).as("cg"))
      .join(r2, "v")
    val g = gv.groupBy("grp").agg(
      sum("cg").as("n"),
      sum(col("cg").cast(Dec) * col("r2").cast(Dec)).as("r2sum"))
    val ties = r2.agg(
      sum(col("c").cast(Dec) * col("c").cast(Dec) * col("c").cast(Dec)
        - col("c").cast(Dec)).as("t"),
      sum("c").as("nn"))
    val terms = g.crossJoin(broadcast(ties))
      .withColumn("term",
        (col("r2sum").cast("double") * col("r2sum").cast("double")) /
          (lit(4.0) * col("n").cast("double")))
    val h = terms.agg(
      aggregate(sort_array(collect_list(struct(col("grp"), col("term")))),
        lit(0.0), (a, x) => a + x.getField("term")).as("s"))
    terms.crossJoin(broadcast(h))
      .select(col("grp"), col("n"),
        round(col("r2sum").cast("double") / (lit(2.0) * col("n").cast("double")), 4)
          .as("mean_rank"),
        (lit(12.0) / (col("nn").cast("double") * (col("nn").cast("double") + 1.0))
          * col("s") - lit(3.0) * (col("nn").cast("double") + 1.0)).as("h0"),
        (lit(1.0) - col("t").cast("double") /
          (col("nn").cast("double") * col("nn").cast("double") * col("nn").cast("double")
            - col("nn").cast("double"))).as("corr"))
      .select(col("grp"), col("n"), col("mean_rank"),
        (round(col("h0"), 4) + lit(0.0)).as("h"),
        (round(col("h0") / col("corr"), 4) + lit(0.0)).as("h_c"))
      .orderBy("grp")
  }

  /** Kendall tau-b between two BINNED row features, computed on the
    * contingency grid — the scale-safe form: with |X|·|Y| cells the
    * concordant/discordant "pair scan" is a cell×cell join bounded by
    * the bin domains, never an O(n²) row join. All pair counts are
    * DECIMAL-exact;
    *   tau_b = (nc − nd) / sqrt((n0 − n1)(n0 − n2)),
    * n0 = N(N−1)/2, n1/n2 the row/column tie-pair counts.
    * Output: one row (n, nc, nd, tau_b). nc/nd emitted as BIGINT
    * (pair counts ≤ N²/2 — fine to ~3e9 rows; internal math is exact
    * far beyond). */
  def kendallTauBinned(df: DataFrame, xBin: Column, yBin: Column): DataFrame = {
    val cells = df.select(xBin.as("i"), yBin.as("j"))
      .groupBy("i", "j").agg(count(lit(1)).cast(Dec).as("c"))
    val a = cells.select(col("i").as("ia"), col("j").as("ja"), col("c").as("cc"))
    val pairs = a.join(cells, col("i") > col("ia") && col("j") =!= col("ja"))
    val cd = pairs.agg(
      sum(when(col("j") > col("ja"), col("cc") * col("c")).otherwise(lit(0).cast(Dec)))
        .as("nc"),
      sum(when(col("j") < col("ja"), col("cc") * col("c")).otherwise(lit(0).cast(Dec)))
        .as("nd"))
    val rows = cells.groupBy("i").agg(sum("c").as("r"))
      .agg(sum(col("r") * (col("r") - 1)).as("t1x2"))
    val colsT = cells.groupBy("j").agg(sum("c").as("r"))
      .agg(sum(col("r") * (col("r") - 1)).as("t2x2"))
    val nn = cells.agg(sum("c").as("n"))
    cd.crossJoin(broadcast(rows)).crossJoin(broadcast(colsT)).crossJoin(broadcast(nn))
      .select(col("n").cast("long").as("n"),
        col("nc").cast("long").as("nc"), col("nd").cast("long").as("nd"),
        (round((col("nc") - col("nd")).cast("double") /
          sqrt(((col("n") * (col("n") - 1) - col("t1x2")).cast("double") / 2.0) *
            ((col("n") * (col("n") - 1) - col("t2x2")).cast("double") / 2.0)), 4)
          + lit(0.0)).as("tau_b"))
  }
}
