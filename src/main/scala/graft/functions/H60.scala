package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused form of the engine-portable 60-bit hash
  * (`conv(substring(md5(x), 1, 15), 16, 10)` — [[PortableHash]]): the
  * first 15 hex chars of an md5 are exactly the top 60 bits of its
  * first 8 digest bytes, so the value is `(bigEndianLong(d[0..7]) >>> 4)`
  * computed straight off the digest — no hex-string materialization,
  * no substring copy, no base-16 reparse. One expression node instead
  * of three keeps the whole thing inside whole-stage codegen with a
  * single static call per row. Bit-identical to the composed form
  * (pinned by ExpressionSpec), so every oracle keeps matching.
  */
case class H60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"h60 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "h60"

  override protected def nullSafeEval(input: Any): Any =
    H60.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.H60.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)
}

object H60 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** top 60 bits of md5(bytes) as a non-negative long. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
