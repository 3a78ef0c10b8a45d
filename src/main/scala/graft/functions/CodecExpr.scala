package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst wrappers for [[TiKVCodec]] — the reference's codec
  * subcommand surface (`codec/codec.go:14-54`, `checksum/checksum.go:31-43`,
  * `config/config.go:59-64`) as engine scalar functions. Same pattern as
  * [[Crc64Expr]]: `doGenCode` delegates to the static Scala impl, so the
  * calls stay inside whole-stage codegen. Decode expressions return null
  * on malformed input (null-based error channel; the reference panics).
  */
abstract class CodecUnaryExpr extends UnaryExpression {
  def inType: DataType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == inType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${inType.catalogString}, got ${child.dataType.catalogString}")
}

/** `memcomparable_encode(bytes) -> bytes` (order-preserving). */
case class MemcomparableEncodeExpr(child: Expression) extends CodecUnaryExpr {
  override def inType: DataType = BinaryType
  override def dataType: DataType = BinaryType
  override def prettyName: String = "memcomparable_encode"
  override def nullSafeEval(v: Any): Any =
    TiKVCodec.memcomparableEncode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TiKVCodec.memcomparableEncode($c)")
  override protected def withNewChildInternal(c: Expression): MemcomparableEncodeExpr = copy(c)
}

/** `memcomparable_decode(bytes) -> bytes` (null on malformed). */
case class MemcomparableDecodeExpr(child: Expression) extends CodecUnaryExpr {
  override def inType: DataType = BinaryType
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "memcomparable_decode"
  override def nullSafeEval(v: Any): Any =
    TiKVCodec.memcomparableDecode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TiKVCodec.memcomparableDecode($c)")
  override protected def withNewChildInternal(c: Expression): MemcomparableDecodeExpr = copy(c)
}

/** `apiv2_encode_key(bytes) -> bytes`: `['r',0,0,0] ‖ key`, memcomparable. */
case class ApiV2EncodeKeyExpr(child: Expression) extends CodecUnaryExpr {
  override def inType: DataType = BinaryType
  override def dataType: DataType = BinaryType
  override def prettyName: String = "apiv2_encode_key"
  override def nullSafeEval(v: Any): Any =
    TiKVCodec.encodeApiV2Key(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TiKVCodec.encodeApiV2Key($c)")
  override protected def withNewChildInternal(c: Expression): ApiV2EncodeKeyExpr = copy(c)
}

/** `apiv2_decode_key(bytes) -> bytes` (null on malformed/short). */
case class ApiV2DecodeKeyExpr(child: Expression) extends CodecUnaryExpr {
  override def inType: DataType = BinaryType
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "apiv2_decode_key"
  override def nullSafeEval(v: Any): Any =
    TiKVCodec.decodeApiV2Key(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TiKVCodec.decodeApiV2Key($c)")
  override protected def withNewChildInternal(c: Expression): ApiV2DecodeKeyExpr = copy(c)
}

/** `decode_ts(bytes) -> long`: complemented big-endian uint64 of the
  * first 8 bytes, as a signed long (null if < 8 bytes). */
case class DecodeTsExpr(child: Expression) extends CodecUnaryExpr {
  override def inType: DataType = BinaryType
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_ts"
  override def nullSafeEval(v: Any): Any =
    TiKVCodec.decodeTs(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TiKVCodec.decodeTs($c)")
  override protected def withNewChildInternal(c: Expression): DecodeTsExpr = copy(c)
}

/** `unescape_go(string) -> bytes`: Go-style escaped key parsing. */
case class GoUnescapeExpr(child: Expression) extends CodecUnaryExpr {
  override def inType: DataType = StringType
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "unescape_go"
  override def nullSafeEval(v: Any): Any =
    TiKVCodec.unescapeGo(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TiKVCodec.unescapeGo($c.toString())")
  override protected def withNewChildInternal(c: Expression): GoUnescapeExpr = copy(c)
}

/** `escape_go(bytes) -> string`: display form of a binary key. */
case class GoEscapeExpr(child: Expression) extends CodecUnaryExpr {
  override def inType: DataType = BinaryType
  override def dataType: DataType = StringType
  override def prettyName: String = "escape_go"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TiKVCodec.escapeGo(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.TiKVCodec.escapeGo($c))")
  override protected def withNewChildInternal(c: Expression): GoEscapeExpr = copy(c)
}

/** Column API + SQL registration for the codec expression family. */
object CodecExpr {
  def memcomparableEncode(c: Column): Column =
    Bridge.column(MemcomparableEncodeExpr(Bridge.expression(c)))
  def memcomparableDecode(c: Column): Column =
    Bridge.column(MemcomparableDecodeExpr(Bridge.expression(c)))
  def apiV2EncodeKey(c: Column): Column =
    Bridge.column(ApiV2EncodeKeyExpr(Bridge.expression(c)))
  def apiV2DecodeKey(c: Column): Column =
    Bridge.column(ApiV2DecodeKeyExpr(Bridge.expression(c)))
  def decodeTs(c: Column): Column =
    Bridge.column(DecodeTsExpr(Bridge.expression(c)))
  def unescapeGo(c: Column): Column =
    Bridge.column(GoUnescapeExpr(Bridge.expression(c)))
  def escapeGo(c: Column): Column =
    Bridge.column(GoEscapeExpr(Bridge.expression(c)))

  /** Register the engine's SQL-function surface on a LIVE session (the
    * session-build-time path is [[graft.GraftExtensions]]; both share
    * one function table). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}
