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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {

  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val dotFunction: FunctionDescription = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot(x, y) takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  /** Register into an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = dotFunction
    spark.sessionState.functionRegistry
      .registerFunction(ident, info, builder)
  }
}
