package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle kernel behind [[WordShinglesExpr]].
  *
  * Semantics are EXACTLY the higher-order-function formulation
  * `array_distinct(transform(sequence(1, greatest(len-n+1, 1)),
  * i => concat_ws(" ", slice(split(text, " "), i, n))))` — including
  * empty tokens from repeated/trailing separators, the all-tokens
  * single shingle for short documents, and first-occurrence distinct
  * order — but evaluated in one pass. The HOF tree is interpreted
  * (higher-order functions are CodegenFallback) and dominated the dedup
  * index build; this expression compiles into whole-stage codegen and
  * cuts the shingle pass severalfold. The DuckDB oracle's list-based
  * twin is unchanged — the gate proves the semantics match. */
object Shingles {

  def shingleArray(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val count = math.max(words.length - n + 1, 1)
    val out = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, words.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** Column form: distinct word n-gram shingles of a string column. */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), n))
}

/** `word_shingles(text)` with a static n — codegen'd. */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    Shingles.shingleArray(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.shingleArray($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr = copy(child = c)
}
