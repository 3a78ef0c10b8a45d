package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Capped Levenshtein distance — semantically EXACTLY Spark's
  * `levenshtein(l, r, threshold)` (the distance when ≤ threshold, else
  * −1, unit costs, code-point semantics), but computed with the
  * standard Ukkonen diagonal band plus common prefix/suffix stripping
  * on the ASCII fast path.
  *
  * Why: the edit-near-dup verify stage is the suite's largest single
  * task-time block at 10× scale (1,398 task-seconds at sf1), and a
  * driver micro-probe (`Test/runMain graft.LevProbe`) measured the
  * builtin threshold variant at ~12 ms per near pair on ~1,800-char
  * documents — the full O(n·m) matrix (~3.1 M cells), not a band. With
  * threshold k the band visits n·(2k+1) cells (13.7× fewer at k=64),
  * and near-duplicate documents share long common prefixes/suffixes
  * that stripping removes before any cell is computed.
  *
  * Non-ASCII inputs (where byte positions ≠ code points) delegate to
  * the builtin, so the two forms cannot diverge there by construction.
  * ASCII-path equivalence (including the exhaustive small-alphabet
  * cross-check and the cap boundary) is pinned by LevCappedSpec. */
object LevCapped {

  def distance(a: UTF8String, b: UTF8String, cap: Int): Int = {
    // byte == code point only when both sides are pure ASCII
    if (a.numBytes() != a.numChars() || b.numBytes() != b.numChars())
      return a.levenshteinDistance(b, cap)
    ascii(a.getBytes, b.getBytes, cap)
  }

  /** Banded Levenshtein over ASCII bytes; returns −1 when > cap. */
  private[functions] def ascii(s0: Array[Byte], t0: Array[Byte], cap: Int): Int = {
    if (cap < 0) return -1
    var sLo = 0
    var sHi = s0.length
    var tLo = 0
    var tHi = t0.length
    // strip common prefix, then common suffix (distance-preserving for
    // unit-cost Levenshtein)
    while (sLo < sHi && tLo < tHi && s0(sLo) == t0(tLo)) { sLo += 1; tLo += 1 }
    while (sHi > sLo && tHi > tLo && s0(sHi - 1) == t0(tHi - 1)) { sHi -= 1; tHi -= 1 }
    val m = sHi - sLo
    val n = tHi - tLo
    if (m == 0) return if (n <= cap) n else -1
    if (n == 0) return if (m <= cap) m else -1
    if (math.abs(m - n) > cap) return -1
    // two-row DP restricted to the |i - j| <= cap diagonal band;
    // cap+1 acts as the +infinity sentinel (any cell beyond the band)
    val INF = cap + 1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= math.min(n, cap)) { prev(j) = j; j += 1 }
    while (j <= n) { prev(j) = INF; j += 1 }
    var i = 1
    while (i <= m) {
      val jFrom = math.max(1, i - cap)
      val jTo = math.min(n, i + cap)
      cur(jFrom - 1) = if (i - cap <= 0) i else INF
      var rowMin = cur(jFrom - 1)
      val sc = s0(sLo + i - 1)
      j = jFrom
      while (j <= jTo) {
        val subst = if (sc == t0(tLo + j - 1)) prev(j - 1)
          else prev(j - 1) + 1
        val del = if (prev(j) < INF) prev(j) + 1 else INF
        val ins = if (cur(j - 1) < INF) cur(j - 1) + 1 else INF
        var v = if (subst < del) subst else del
        if (ins < v) v = ins
        if (v > INF) v = INF
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      // sentinel just past the band: row i+1 reads prev(i+1+cap)
      if (jTo < n) cur(jTo + 1) = INF
      if (rowMin > cap) return -1
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(n) <= cap) prev(n) else -1
  }

  /** Column form: `levenshtein(l, r, cap)` with the banded kernel. */
  def levCapped(l: Column, r: Column, cap: Int): Column =
    Bridge.column(LevCappedExpr(Bridge.expression(l), Bridge.expression(r), cap))
}

/** `lev_capped(l, r)` with a static cap — codegen'd. */
case class LevCappedExpr(left: Expression, right: Expression, cap: Int)
    extends BinaryExpression {
  require(cap >= 0, "cap must be non-negative")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lev_capped"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lev_capped requires (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(l: Any, r: Any): Any =
    LevCapped.distance(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.LevCapped.distance($l, $r, $cap)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LevCappedExpr =
    copy(left = l, right = r)
}
