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
  /** name → expression builder, the engine's SQL-function surface. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "crc64" -> (es => Crc64Expr(es.head)),
    "crc64_pair" -> (es => Crc64PairExpr(es.head, es(1))),
    "memcomparable_encode" -> (es => MemcomparableEncodeExpr(es.head)),
    "memcomparable_decode" -> (es => MemcomparableDecodeExpr(es.head)),
    "apiv2_encode_key" -> (es => ApiV2EncodeKeyExpr(es.head)),
    "apiv2_decode_key" -> (es => ApiV2DecodeKeyExpr(es.head)),
    "decode_ts" -> (es => DecodeTsExpr(es.head)),
    "unescape_go" -> (es => GoUnescapeExpr(es.head)),
    "escape_go" -> (es => GoEscapeExpr(es.head)),
    "dot_product" -> (es => DotProductExpr(es.head, es(1))))
}
