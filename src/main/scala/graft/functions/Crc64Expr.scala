package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `crc64(bytes) -> long` — codegen'd Catalyst expression (stays inside
  * whole-stage codegen; no UDF serialization on the hot path).
  *
  * Mirrors the storage-side digest of reference `checksum/checksum.go:83`
  * (TiKV computes crc64 over each pair inside the store).
  */
case class Crc64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "crc64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"crc64 requires BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    Crc64.crc64(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Crc64.crc64($c)")

  override protected def withNewChildInternal(newChild: Expression): Crc64Expr =
    copy(child = newChild)
}

/** `crc64_pair(key, value) -> long` — digest of `key ‖ value` without
  * materializing the concatenation (one pass over each buffer). */
case class Crc64PairExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "crc64_pair"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"crc64_pair requires (BINARY, BINARY), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(k: Any, v: Any): Any =
    Crc64.crc64(k.asInstanceOf[Array[Byte]], v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (k, v) => s"graft.functions.Crc64.crc64($k, $v)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Crc64PairExpr =
    copy(left = l, right = r)
}

object Crc64Expr {
  /** Column API: crc64 of a binary column. */
  def crc64(c: Column): Column = Bridge.column(Crc64Expr(Bridge.expression(c)))

  /** Column API: crc64 of `key ‖ value`. */
  def crc64Pair(key: Column, value: Column): Column =
    Bridge.column(Crc64PairExpr(Bridge.expression(key), Bridge.expression(value)))
}
