package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextAnalysis

/** Single-pass codegen'd language-ID kernels behind the two heuristics
  * in [[graft.operators.TextAnalysis]]. Each replaces a per-profile
  * column pipeline — five interpreted `filter(split(...))` trees for
  * the stopword variant, five full `regexp_count` scans for the
  * char-bigram variant — with one compiled pass that scores all
  * profiles and takes the argmax (strictly-greater comparison over
  * alphabetically-ordered profiles = first-code tie-break, identical to
  * the column fold; spec-compared in TextEventsSpec). */
object LangIdKernels {

  private val tokenProfiles: Array[(String, java.util.HashSet[String])] =
    TextAnalysis.langProfiles.map { case (code, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      (code, s)
    }.toArray

  private val ngramProfiles: Array[(String, Array[String])] =
    TextAnalysis.charNgramProfiles.map { case (code, ngs) => (code, ngs.toArray) }.toArray

  /** Stopword-profile argmax: per profile, count token occurrences (with
    * multiplicity) that hit the profile; strictly-greater keeps the
    * alphabetically first code on ties. */
  def tokenLangId(text: UTF8String): UTF8String = {
    val toks = text.toString.split(" ", -1)
    var bestCode: String = null
    var bestScore = -1
    var p = 0
    while (p < tokenProfiles.length) {
      val (code, set) = tokenProfiles(p)
      var c = 0
      var i = 0
      while (i < toks.length) { if (set.contains(toks(i))) c += 1; i += 1 }
      if (c > bestScore) { bestScore = c; bestCode = code }
      p += 1
    }
    UTF8String.fromString(bestCode)
  }

  /** Non-overlapping alternation count — exactly `regexp_count(s,
    * "p1|p2|…")` for LITERAL alternatives: leftmost match wins, at a
    * given position the first alternative in pattern order wins (not
    * the longest), and the scan resumes after the matched text. */
  private def countAlternation(s: String, pats: Array[String]): Int = {
    val n = s.length
    var i = 0
    var c = 0
    while (i < n) {
      var matched = 0
      var pi = 0
      while (matched == 0 && pi < pats.length) {
        if (s.startsWith(pats(pi), i)) matched = pats(pi).length
        pi += 1
      }
      if (matched > 0) { c += 1; i += matched } else i += 1
    }
    c
  }

  /** Char-bigram-profile argmax (see [[countAlternation]] for the exact
    * per-profile counting semantics). */
  def ngramLangId(text: UTF8String): UTF8String = {
    val s = text.toString
    var bestCode: String = null
    var bestScore = -1
    var p = 0
    while (p < ngramProfiles.length) {
      val (code, pats) = ngramProfiles(p)
      val c = countAlternation(s, pats)
      if (c > bestScore) { bestScore = c; bestCode = code }
      p += 1
    }
    UTF8String.fromString(bestCode)
  }

  def tokenLangIdCol(text: Column): Column =
    Bridge.column(TokenLangIdExpr(Bridge.expression(text)))
  def ngramLangIdCol(text: Column): Column =
    Bridge.column(NgramLangIdExpr(Bridge.expression(text)))
}

abstract class LangIdExprBase extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")
}

case class TokenLangIdExpr(child: Expression) extends LangIdExprBase {
  override def prettyName: String = "lang_id_tokens"
  override def nullSafeEval(v: Any): Any =
    LangIdKernels.tokenLangId(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdKernels.tokenLangId($c)")
  override protected def withNewChildInternal(c: Expression): TokenLangIdExpr = copy(child = c)
}

case class NgramLangIdExpr(child: Expression) extends LangIdExprBase {
  override def prettyName: String = "lang_id_ngrams"
  override def nullSafeEval(v: Any): Any =
    LangIdKernels.ngramLangId(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdKernels.ngramLangId($c)")
  override protected def withNewChildInternal(c: Expression): NgramLangIdExpr = copy(child = c)
}
