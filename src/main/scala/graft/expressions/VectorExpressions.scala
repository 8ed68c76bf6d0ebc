package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §7.3:
  * "custom Expression for the hot ones").
  *
  * The `aggregate(zip_with(...))` formulation in VectorFunctions is
  * correct but evaluates interpreted (higher-order functions don't
  * participate in whole-stage codegen); these expressions generate a
  * tight primitive loop instead — no lambda dispatch, no boxing, no
  * intermediate zipped array. Both eval and doGenCode accumulate in
  * double over the element type, in array order, so results are
  * bit-identical to the HOF formulation and the DuckDB oracle.
  */
abstract class VectorFoldExpression extends BinaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Combine one element pair into the accumulator (interpreted path). */
  protected def combine(acc: Double, x: Double, y: Double): Double
  /** Java source for the loop body; acc/x/y are double variables. */
  protected def combineCode(acc: String, x: String, y: String): String

  // NULL semantics match the HOF formulation aggregate(zip_with(...))
  // and the DuckDB oracle exactly: mismatched lengths or any null
  // element pair make the whole result NULL (zip_with pads with null,
  // and null poisons the fold) — no silent partial sums.

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (xs.numElements() != ys.numElements()) return null
    val n = xs.numElements()
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = lt match {
        case FloatType => xs.getFloat(i).toDouble
        case _ => xs.getDouble(i)
      }
      val y = rt match {
        case FloatType => ys.getFloat(i).toDouble
        case _ => ys.getDouble(i)
      }
      acc = combine(acc, x, y)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lGet, rGet) = (
      if (elemType(left) == FloatType) "getFloat" else "getDouble",
      if (elemType(right) == FloatType) "getFloat" else "getDouble")
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($xs.numElements() != $ys.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $xs.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xs.isNullAt($i) || $ys.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    double $x = (double) $xs.$lGet($i);
         |    double $y = (double) $ys.$rGet($i);
         |    ${combineCode(acc, x, y)}
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })
  }
}

/** Σ xᵢ·yᵢ — the kernel of cosine/dot similarity search. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "graft_dot"
  protected def combine(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc = $acc + $x * $y;"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (xᵢ-yᵢ)² — squared Euclidean distance. */
case class L2DistanceSq(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "graft_l2sq"
  protected def combine(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  protected def combineCode(acc: String, x: String, y: String): String =
    s"double d = $x - $y; $acc = $acc + d * d;"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSq =
    copy(left = newLeft, right = newRight)
}

/** Σ |xᵢ-yᵢ| — Manhattan distance (reference Metric "Manhattan"). */
case class L1Distance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "graft_l1"
  protected def combine(acc: Double, x: Double, y: Double): Double =
    acc + math.abs(x - y)
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc = $acc + java.lang.Math.abs($x - $y);"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1Distance =
    copy(left = newLeft, right = newRight)
}
