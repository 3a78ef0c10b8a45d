package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 60-bit md5 token hash behind [[Md5Hash60Expr]].
  *
  * Semantics are EXACTLY the expression-chain formulation
  * `conv(substring(md5(concat(prefix, t)), 1, 15), 16, 10) :: long` —
  * the first 15 hex digits of the md5 of the UTF-8 bytes of
  * `prefix ‖ t`, read base-16 (= the digest's first 60 bits,
  * big-endian) — but computed without the intermediate 32-char hex
  * string, the base-16 string parse, or the per-row
  * `MessageDigest.getInstance` that Spark's `md5` pays via
  * commons-codec. The digest instance is thread-local (reset per call)
  * and the salt prefix is pre-encoded bytes fed to the digest directly,
  * so the salted form also skips the per-row `concat` allocation.
  * The DuckDB oracle's `conv(substring(md5(..)))` twin is unchanged —
  * the gate proves the semantics match bit-for-bit.
  *
  * Hot because MinHash signatures evaluate it k (=32) times per
  * shingle: the signature build is the dedup gate family's dominant
  * cold-arm cost (OPTIMIZATION_r16.md). */
object Md5Hash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(prefix: Array[Byte], t: UTF8String): Long =
    hashRaw(prefix, t.getBytes) >>> 4

  def hash(prefix: Array[Byte], t: Array[Byte]): Long =
    hashRaw(prefix, t) >>> 4

  def hashRaw(prefix: Array[Byte], t: UTF8String): Long =
    hashRaw(prefix, t.getBytes)

  /** First 8 digest bytes, big-endian: `>>> (64 − 4·digits)` of this is
    * the first-`digits`-hex-chars base-16 value for any digits ≤ 15. */
  def hashRaw(prefix: Array[Byte], t: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    if (prefix.length != 0) md.update(prefix)
    md.update(t)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Column form: 60-bit md5 hash of `saltPrefix ‖ t`. */
  def md5Hash60(t: Column, saltPrefix: String = ""): Column =
    Bridge.column(Md5Hash60Expr(Bridge.expression(t),
      saltPrefix.getBytes("UTF-8")))

  /** Column form of the general hex-prefix hash:
    * `conv(substring(md5(t), 1, digits), 16, 10) :: long`, digits ≤ 15
    * (the winnowing 8-digit / dsir 6-digit / slice 2-digit twins). */
  def md5HashHex(t: Column, digits: Int): Column =
    Bridge.column(Md5Hash60Expr(Bridge.expression(t), Array.empty, digits))
}

/** `md5_hash60(t)` with a static byte-prefix salt and hex-prefix width
  * (default 15 digits = 60 bits) — codegen'd. */
case class Md5Hash60Expr(child: Expression, prefix: Array[Byte],
                         digits: Int = 15)
    extends UnaryExpression {
  require(digits >= 1 && digits <= 15, "digits must be in [1, 15]")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 requires STRING or BINARY input, " +
        s"got ${child.dataType.catalogString}")

  private def shift: Int = 64 - 4 * digits

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Md5Hash60.hashRaw(prefix, s) >>> shift
    case b: Array[Byte] => Md5Hash60.hashRaw(prefix, b) >>> shift
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5prefix", prefix, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"(graft.functions.Md5Hash60.hashRaw($ref, $c) >>> $shift)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Expr =
    copy(child = newChild)

  // prefix is an Array whose default equals/hashCode are identity-based;
  // compare by content so canonicalized plans (memo keys, plan-shape
  // tests) treat equal salts as equal expressions
  override def equals(other: Any): Boolean = other match {
    case Md5Hash60Expr(c, p, d) =>
      c == child && java.util.Arrays.equals(p, prefix) && d == digits
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(prefix)) + digits
}
