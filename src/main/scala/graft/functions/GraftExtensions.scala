package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native functions
  * into the SQL function registry, so `spark.sql("... graft_dot(a, b)")`
  * plans the codegen'd expression directly.
  *
  * Activate per session with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or programmatically via [[GraftExtensions.register]].
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Evaluate a foldable SQL argument to an Int (for the expressions
    * whose parameters are construction-time constants). */
  private def intArg(e: Expression, fn: String, name: String): Int = {
    require(e.foldable, s"$fn: $name must be a literal")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be an integer literal, got $other")
    }
  }

  val dotFunction: FunctionDescription = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot(x, y) takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  val shinglesFunction: FunctionDescription = (
    FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_shingles(toks, n) takes exactly 2 arguments")
      Shingles(children.head, intArg(children(1), "graft_shingles", "n"))
    })

  val cdcChunksFunction: FunctionDescription = (
    FunctionIdentifier("graft_cdc_chunks"),
    new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "graft_cdc_chunks(toks, window, avgChunk) takes exactly 3 arguments")
      CdcChunks(children.head,
        intArg(children(1), "graft_cdc_chunks", "window"),
        intArg(children(2), "graft_cdc_chunks", "avgChunk"))
    })

  val maxDupFracFunction: FunctionDescription = (
    FunctionIdentifier("graft_max_dup_frac"),
    new ExpressionInfo(classOf[MaxDupFrac].getName, "graft_max_dup_frac"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_max_dup_frac(arr) takes exactly 1 argument")
      MaxDupFrac(children.head)
    })

  val jaroWinklerFunction: FunctionDescription = (
    FunctionIdentifier("graft_jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_jaro_winkler(a, b) takes exactly 2 arguments")
      JaroWinklerSim(children.head, children(1))
    })

  val all: Seq[FunctionDescription] =
    Seq(dotFunction, shinglesFunction, cdcChunksFunction, maxDupFracFunction,
      jaroWinklerFunction)

  /** Register into an already-built session (tests, REPL). Also registers
    * the UDAF surface (`spark.udf` path — SparkSessionExtensions only
    * carries Expression builders): `graft_heavy_hitters(col)`, the
    * Misra–Gries top-items sketch at capacity 64 returning
    * map<string,bigint> of surviving (item, count) entries. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
    spark.udf.register("graft_heavy_hitters",
      org.apache.spark.sql.functions.udaf(new MgAggregator(64)))
    // quartile probes at capacity 8192: exact for groups ≤ 8192 rows,
    // bounded-error sketch beyond (QuantileSketch contract)
    spark.udf.register("graft_quantiles",
      org.apache.spark.sql.functions.udaf(
        new QsAggregator(8192, Seq(0.25, 0.5, 0.75, 0.9, 0.99))))
    // same probes, but FAILS if any group exceeds capacity (compaction
    // fired) — for consumers whose downstream compares against an
    // exact-rank oracle and must never silently go approximate
    spark.udf.register("graft_quantiles_exact",
      org.apache.spark.sql.functions.udaf(
        new QsAggregator(8192, Seq(0.25, 0.5, 0.75, 0.9, 0.99),
          requireExact = true)))
    // k-minimum-values signature at k = 256 (the sourceOverlapKMV
    // default): array<string> of the k smallest distinct values
    spark.udf.register("graft_kmin",
      org.apache.spark.sql.functions.udaf(new KMinAgg(256)))
  }
}
