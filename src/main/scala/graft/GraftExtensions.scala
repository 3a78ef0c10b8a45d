package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session-extension entry point: registers the engine's expression
  * library at session build time —
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`). The same registry as
  * `CodecExpr.registerAll`, but wired the idiomatic way for deployment:
  * every session on the cluster gets `crc64`, the TiKV codec family, and
  * nothing leaks into sessions that don't opt in. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => builder(es)))
    }
}

object GraftExtensions {
  /** Wraps a builder with an arity gate: without it `es.head`/`es(1)`
    * silently ignores extra arguments (a wrong-answer hazard for SQL
    * callers) and fails a missing one with a bare
    * IndexOutOfBoundsException instead of a readable analysis error. */
  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = { es =>
    require(es.length == n,
      s"$name expects exactly $n argument(s), got ${es.length}")
    b(es)
  }

  /** name → expression builder, the engine's SQL-function surface. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "crc64" -> arity("crc64", 1)(es => Crc64Expr(es.head)),
    "crc64_pair" -> arity("crc64_pair", 2)(es => Crc64PairExpr(es.head, es(1))),
    "memcomparable_encode" -> arity("memcomparable_encode", 1)(es => MemcomparableEncodeExpr(es.head)),
    "memcomparable_decode" -> arity("memcomparable_decode", 1)(es => MemcomparableDecodeExpr(es.head)),
    "apiv2_encode_key" -> arity("apiv2_encode_key", 1)(es => ApiV2EncodeKeyExpr(es.head)),
    "apiv2_decode_key" -> arity("apiv2_decode_key", 1)(es => ApiV2DecodeKeyExpr(es.head)),
    "decode_ts" -> arity("decode_ts", 1)(es => DecodeTsExpr(es.head)),
    "unescape_go" -> arity("unescape_go", 1)(es => GoUnescapeExpr(es.head)),
    "escape_go" -> arity("escape_go", 1)(es => GoEscapeExpr(es.head)),
    "dot_product" -> arity("dot_product", 2)(es => DotProductExpr(es.head, es(1))),
    "abs_diff_sum" -> arity("abs_diff_sum", 2)(es => AbsDiffSumExpr(es.head, es(1))))
}
