package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[Md5Bucket]], shaped for codegen: a Scala object
  * with no companion class compiles with static forwarders, so
  * generated Java calls `graft.expressions.Md5BucketUtil.bucket(s)`
  * directly. One thread-local digest instance — `MessageDigest
  * .getInstance` per row would dominate the hash itself. */
object Md5BucketUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Last byte of md5(utf8(s)) as 0..255 — numerically identical to
    * the SQL idiom `instr(hex, substr(md5(s),31,1))·16 + instr(hex,
    * substr(md5(s),32,1))` every sampler oracle uses, without the
    * 32-char hex string, two substrings, and two linear scans. */
  def bucket(s: UTF8String): Int = {
    val d = md.get()
    d.reset()
    d.update(s.getBytes)
    d.digest()(15) & 0xff
  }
}

/** The engine-neutral sampling coin as ONE codegen'd expression:
  * md5-bucket 0..255 of a string key. Every deterministic sampler in
  * the engine (split/mixture/epoch/budget draws) flips this coin; the
  * SQL formulation builds the full 32-char hex string and scans it
  * with `instr` twice per row, all inside five nested string
  * expressions — this expression reads the one digest byte the
  * samplers actually use. Bit-identical to the SQL form (spec-asserted
  * on adversarial inputs) so every DuckDB oracle gate still holds. */
case class Md5Bucket(child: Expression) extends UnaryExpression
    with Serializable {
  override def prettyName: String = "graft_md5_bucket"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5BucketUtil.bucket(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Md5BucketUtil.bucket($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Bucket =
    copy(child = newChild)
}
