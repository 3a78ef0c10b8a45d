package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Single-pass dot-product kernel behind [[DotProductExpr]].
  *
  * Semantics are EXACTLY the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0d, (acc, v) => acc + v)` — a left-to-right sequential fold in
  * double, so the result is bit-identical to the HOF tree (and to the
  * DuckDB oracle's list_dot_product over double-cast lists). That
  * includes the null semantics: `zip_with` zips to the LONGER length and
  * pads the shorter side with nulls, and one null product nulls the
  * whole fold — so a length mismatch or any null element yields null.
  *
  * The HOF tree is interpreted (higher-order functions are
  * CodegenFallback) and allocates a zipped intermediate array per pair;
  * inside the similarity joins that kernel runs once per CANDIDATE PAIR,
  * which made it the dominant cost of every similarity query. This
  * expression compiles into whole-stage codegen and walks both arrays
  * once with no allocation. */
object Dot {

  // element-read dispatch codes (passed as codegen literals so the JIT
  // sees per-call-site constants; every numeric element type converts
  // to double exactly as the HOF's cast would)
  final val KindDouble = 0
  final val KindFloat = 1
  final val KindInt = 2
  final val KindLong = 3

  /** Sequential-fold double dot product of two numeric ArrayData;
    * `aKind`/`bKind` are the Kind* element-read codes. Returns null
    * exactly when the HOF twin would: length mismatch or any null
    * element. */
  def fold(a: ArrayData, b: ArrayData, aKind: Int, bKind: Int): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la != lb) return null
    var acc = 0.0d
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += read(a, i, aKind) * read(b, i, bKind)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  private def read(a: ArrayData, i: Int, kind: Int): Double = kind match {
    case KindDouble => a.getDouble(i)
    case KindFloat  => a.getFloat(i).toDouble
    case KindInt    => a.getInt(i).toDouble
    case KindLong   => a.getLong(i).toDouble
  }

  /** Column form: sequential-fold double dot product of two float- or
    * double-array columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))
}

/** `dot_product(a, b)` over arrays of any numeric element type (each
  * element converts to double exactly, like the HOF's cast) — codegen'd. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  private def elemKind(e: Expression): Option[Int] = e.dataType match {
    case ArrayType(DoubleType, _)  => Some(Dot.KindDouble)
    case ArrayType(FloatType, _)   => Some(Dot.KindFloat)
    case ArrayType(IntegerType, _) => Some(Dot.KindInt)
    case ArrayType(LongType, _)    => Some(Dot.KindLong)
    case _                         => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemKind(left).isDefined && elemKind(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<DOUBLE|FLOAT|INT|BIGINT> operands, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    Dot.fold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemKind(left).get, elemKind(right).get)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.Dot.fold(
         |  $a, $b, ${elemKind(left).get}, ${elemKind(right).get});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}
