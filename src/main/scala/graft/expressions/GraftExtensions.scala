package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions, so `spark.sql("... graft_dot(a, b)")`
  * works next to the Column API. Install via
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * or call `GraftExtensions.register(spark)` on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.expressions.VectorExpressions", name),
        builder))
    }
}

object GraftExtensions {
  private val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => DotProduct(args(0), args(1))),
    "graft_l2sq" -> (args => L2DistanceSq(args(0), args(1))),
    "graft_l1" -> (args => L1Distance(args(0), args(1))),
    "graft_cosine" -> (args => {
      import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
      Divide(
        DotProduct(args(0), args(1)),
        Multiply(
          Sqrt(DotProduct(args(0), args(0))),
          Sqrt(DotProduct(args(1), args(1))))) : Expression
    }))

  /** Register on an already-built session (tests / REPL). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.expressions.VectorExpressions", name),
        builder)
    }

  // ---- Column API over the native expressions ----
  private def c(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)

  def dot(a: Column, b: Column): Column =
    c(DotProduct(expression(a), expression(b)))
  def l2Sq(a: Column, b: Column): Column =
    c(L2DistanceSq(expression(a), expression(b)))
  def l1(a: Column, b: Column): Column =
    c(L1Distance(expression(a), expression(b)))
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def expression(col: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(col)
}
