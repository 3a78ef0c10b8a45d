package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Arbitrary, Gen}

import graft.functions.{CodecExpr, TiKVCodec}

/** TiKV codec: known-answer vectors, roundtrip + order-preservation
  * properties, and expression/SQL-surface checks. */
class CodecSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Arbitrary.arbitrary[Byte]).map(_.toArray))

  test("memcomparable known answers") {
    assert(TiKVCodec.memcomparableEncode(Array.emptyByteArray).toSeq ===
      (Seq.fill(8)(0.toByte) :+ 0xF7.toByte))
    assert(TiKVCodec.memcomparableEncode(Array[Byte](1, 2, 3)).toSeq ===
      (Seq[Byte](1, 2, 3, 0, 0, 0, 0, 0) :+ 0xFA.toByte))
    val eight = (1 to 8).map(_.toByte).toArray
    assert(TiKVCodec.memcomparableEncode(eight).toSeq ===
      ((eight.toSeq :+ 0xFF.toByte) ++ Seq.fill(8)(0.toByte)) :+ 0xF7.toByte)
  }

  test("memcomparable roundtrip property") {
    check(forAll(bytesGen) { b =>
      TiKVCodec.memcomparableDecode(TiKVCodec.memcomparableEncode(b)).toSeq == b.toSeq
    })
  }

  test("memcomparable encoding preserves unsigned-lexicographic order") {
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xFF) - (b(i) & 0xFF)
        if (c != 0) return Integer.signum(c)
        i += 1
      }
      Integer.signum(a.length - b.length)
    }
    check(forAll(bytesGen, bytesGen) { (a, b) =>
      cmp(a, b) == cmp(TiKVCodec.memcomparableEncode(a), TiKVCodec.memcomparableEncode(b))
    })
  }

  test("memcomparable decode rejects malformed input") {
    assert(TiKVCodec.memcomparableDecode(Array[Byte](1, 2, 3)) === null)     // len % 9 != 0
    val badMarker = TiKVCodec.memcomparableEncode(Array[Byte](1))
    badMarker(8) = 0x42
    assert(TiKVCodec.memcomparableDecode(badMarker) === null)
    val badPad = TiKVCodec.memcomparableEncode(Array[Byte](1))
    badPad(5) = 1                                                            // non-zero pad
    assert(TiKVCodec.memcomparableDecode(badPad) === null)
  }

  test("apiv2 key roundtrip + prefix semantics") {
    check(forAll(bytesGen) { b =>
      TiKVCodec.decodeApiV2Key(TiKVCodec.encodeApiV2Key(b)).toSeq == b.toSeq
    })
    val enc = TiKVCodec.encodeApiV2Key(Array[Byte](9))
    assert(enc.take(4).toSeq === Seq('r'.toByte, 0.toByte, 0.toByte, 0.toByte))
    // a decoded non-empty key shorter than the mode prefix is malformed
    assert(TiKVCodec.decodeApiV2Key(TiKVCodec.memcomparableEncode(Array[Byte](1, 2))) === null)
  }

  test("decodeTs complements the big-endian first 8 bytes") {
    check(forAll { (ts: Long) =>
      TiKVCodec.decodeTs(ByteBuffer.allocate(8).putLong(~ts).array()) == ts
    })
    assert(TiKVCodec.decodeTs(Array[Byte](1, 2, 3)) === null)
  }

  test("escape/unescape Go roundtrip property + known escapes") {
    assert(TiKVCodec.unescapeGo("a\\x41\\n\\101").toSeq ===
      "aA\nA".getBytes("UTF-8").toSeq)
    assert(TiKVCodec.unescapeGo("\\q") === null)
    assert(TiKVCodec.unescapeGo("\\x4") === null)
    check(forAll(bytesGen) { b =>
      TiKVCodec.unescapeGo(TiKVCodec.escapeGo(b)).toSeq == b.toSeq
    })
    // astral-plane characters pass through as whole code points
    assert(TiKVCodec.unescapeGo("a😀b").toSeq ===
      "a😀b".getBytes("UTF-8").toSeq)
  }

  test("codec expressions evaluate in DataFrames and via spark.sql") {
    CodecExpr.registerAll(spark)
    val df = Seq("hello", "li_0001", "").toDF("s")
      .select(col("s"), col("s").cast("binary").as("b"))
    val rt = df.select(
      (CodecExpr.apiV2DecodeKey(CodecExpr.apiV2EncodeKey(col("b"))) === col("b")).as("ok"))
      .as[Boolean].collect()
    assert(rt.forall(identity))
    val sqlRt = spark.sql(
      "SELECT apiv2_decode_key(apiv2_encode_key(CAST('abc' AS BINARY))) = CAST('abc' AS BINARY)")
      .collect().head.getBoolean(0)
    assert(sqlRt)
    val ts = spark.sql("SELECT decode_ts(unhex('FFFFFFFFFFFFFFFE'))").collect().head.getLong(0)
    assert(ts === 1L)
    val pair = spark.sql(
      "SELECT crc64_pair(CAST('12345' AS BINARY), CAST('6789' AS BINARY)) = crc64(CAST('123456789' AS BINARY))")
      .collect().head.getBoolean(0)
    assert(pair)
    // dot_product over a COLUMN (non-foldable), so constant folding can't
    // bypass the codegen path; int arrays exercise the numeric widening
    Seq((Seq(1, 2), Seq(3, 4)), (Seq(0, 0), Seq(5, 5)))
      .toDF("a", "b").createOrReplaceTempView("dp_in")
    val dps = spark.sql("SELECT dot_product(a, b) FROM dp_in ORDER BY 1")
      .collect().map(_.getDouble(0)).toSeq
    assert(dps === Seq(0.0, 11.0))
    // arity is validated with a readable error, not an index crash
    val e = intercept[Exception](spark.sql("SELECT dot_product(array(1))").collect())
    assert(e.getMessage.contains("dot_product expects exactly 2"))
    // abs_diff_sum: SQL surface of the counting-filter kernel
    val ads = spark.sql("SELECT abs_diff_sum(a, b) FROM dp_in ORDER BY 1")
      .collect().map(_.getInt(0)).toSeq
    assert(ads === Seq(4, 10)) // |1-3|+|2-4| = 4; |0-5|+|0-5| = 10
  }

  test("GraftExtensions injects the full function surface without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw
    // sorted Seq, not Set: a duplicate name would silently shadow at
    // runtime (createOrReplaceTempFunction: last registration wins)
    assert(graft.GraftExtensions.functions.map(_._1).sorted === Seq(
      "abs_diff_sum", "apiv2_decode_key", "apiv2_encode_key", "crc64",
      "crc64_pair", "decode_ts", "dot_product", "escape_go",
      "memcomparable_decode", "memcomparable_encode", "unescape_go"))
  }
}
