package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Single-pass Σ|aᵢ−bᵢ| kernel behind [[AbsDiffSumExpr]] — the
  * counting-filter distance bound of [[graft.operators.Dedup
  * .editNearDup]] (one edit changes at most two probe counts by one
  * each, so the sum lower-bounds 2·dist).
  *
  * Semantics are EXACTLY the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0, (s, v) -> s + v)`
  * over int arrays, including null behavior (zip_with pads a length
  * mismatch with nulls and one null element nulls the fold). The HOF
  * tree is interpreted (CodegenFallback) and allocates a zipped
  * intermediate per pair; this filter runs once per CANDIDATE PAIR in
  * the edit-distance join, the same per-pair hot path that motivated
  * [[Dot]] — the expression form stays inside whole-stage codegen and
  * walks both arrays once with no allocation. */
object AbsDiffSum {

  /** Null exactly when the HOF twin would: length mismatch or any null
    * element. */
  def fold(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += math.abs(a.getInt(i) - b.getInt(i))
      i += 1
    }
    java.lang.Integer.valueOf(s)
  }

  /** Column form over two `array<int>` columns. */
  def absDiffSum(a: Column, b: Column): Column =
    Bridge.column(AbsDiffSumExpr(Bridge.expression(a), Bridge.expression(b)))
}

/** `abs_diff_sum(a, b)` over int arrays — codegen'd. */
case class AbsDiffSumExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "abs_diff_sum"

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"abs_diff_sum requires ARRAY<INT> operands, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    AbsDiffSum.fold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("ads")
      s"""
         |java.lang.Integer $tmp = graft.functions.AbsDiffSum.fold($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AbsDiffSumExpr =
    copy(left = l, right = r)
}
