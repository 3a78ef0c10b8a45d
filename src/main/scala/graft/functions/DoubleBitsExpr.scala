package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `double_bits(double) -> long` / `bits_double(long) -> double` — the
  * IEEE-754 bijection as codegen'd Catalyst expressions, so a DOUBLE
  * sketch register can ride a long-cell store ([[graft.operators
  * .SketchStore]]) and come back BIT-exactly (no decimal round-trip, no
  * string formatting). `doubleToLongBits` canonicalizes NaN — fine for
  * persisted registers (a NaN register is already a data defect the
  * vector/health gates refuse upstream); ±0.0 and every finite value
  * round-trip identically. Codegen'd: stays inside whole-stage codegen
  * like the rest of the functions/ family. */
case class DoubleBitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "double_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_bits requires DOUBLE input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToLongBits($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleBitsExpr =
    copy(child = newChild)
}

case class BitsDoubleExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bits_double"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bits_double requires BIGINT input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    java.lang.Double.longBitsToDouble(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.longBitsToDouble($c)")

  override protected def withNewChildInternal(newChild: Expression): BitsDoubleExpr =
    copy(child = newChild)
}

object DoubleBits {
  def doubleBits(c: Column): Column =
    Bridge.column(DoubleBitsExpr(Bridge.expression(c)))
  def bitsDouble(c: Column): Column =
    Bridge.column(BitsDoubleExpr(Bridge.expression(c)))
}
