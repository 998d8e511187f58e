package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two ARRAY<BIGINT> columns — the
  * vector-similarity hot path as a codegen'd Catalyst expression
  * (SURVEY §7.3's "optional `Expression` for cosine"): a tight
  * primitive loop over `ArrayData` with no lambda dispatch, versus the
  * interpreted per-element path of `aggregate(zip_with(...))`.
  *
  * Exactness: inputs are quantized embeddings (|x| ≤ ~5·1024, dim 64),
  * so products and the running sum stay far inside int64 — the same
  * order-independent integer arithmetic contract as the rest of the
  * engine.
  */
case class IntDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** A null element anywhere makes the whole product null (SQL
    * arithmetic null semantics — same as the oracle's list_reduce).
    * lazy val: fixed after resolution, must not re-evaluate per row in
    * the interpreted path. */
  private lazy val anyElementNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullable: Boolean = super.nullable || anyElementNullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var s = 0L
    var i = 0
    if (anyElementNullable) {
      while (i < n) {
        if (xs.isNullAt(i) || ys.isNullAt(i)) return null
        s += xs.getLong(i) * ys.getLong(i)
        i += 1
      }
    } else {
      while (i < n) {
        s += xs.getLong(i) * ys.getLong(i)
        i += 1
      }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      // only pay the per-element null check when the schema allows nulls
      val nullCheck =
        if (anyElementNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}
