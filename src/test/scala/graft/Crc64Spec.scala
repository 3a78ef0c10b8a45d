package graft

import graft.functions.{Crc64, RawChecksum}
import org.scalacheck.Prop.forAll
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

class Crc64Spec extends AnyFunSuite {

  private def check(p: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("CRC64-ECMA known-answer vector: '123456789'") {
    // The canonical check value for CRC-64/XZ (reflected ECMA-182),
    // the variant implemented by Go's hash/crc64 ECMA table.
    val crc = Crc64.crc64("123456789".getBytes("ASCII"))
    assert(crc === 0x995DC9BBDF1939FAL)
  }

  test("empty input digests to 0") {
    assert(Crc64.crc64(Array.emptyByteArray) === 0L)
  }

  test("chained update equals digest of concatenation") {
    check(forAll { (a: Array[Byte], b: Array[Byte]) =>
      Crc64.update(Crc64.crc64(a), b) == Crc64.crc64(a ++ b)
    })
  }

  test("pair digest equals concat digest") {
    check(forAll { (k: Array[Byte], v: Array[Byte]) =>
      Crc64.crc64(k, v) == Crc64.crc64(k ++ v)
    })
  }

  private val genChecksum: Gen[RawChecksum] = for {
    x <- Arbitrary.arbitrary[Long]
    k <- Gen.chooseNum(0L, 1L << 40)
    b <- Gen.chooseNum(0L, 1L << 50)
  } yield RawChecksum(x, k, b)

  test("checksum merge is a commutative monoid (reference UpdateChecksum contract)") {
    implicit val arb: Arbitrary[RawChecksum] = Arbitrary(genChecksum)
    check(forAll { (a: RawChecksum, b: RawChecksum) => a.merge(b) == b.merge(a) })
    check(forAll { (a: RawChecksum, b: RawChecksum, c: RawChecksum) =>
      a.merge(b).merge(c) == a.merge(b.merge(c))
    })
    check(forAll { (a: RawChecksum) =>
      a.merge(RawChecksum.zero) == a && RawChecksum.zero.merge(a) == a
    })
  }

  test("partition invariance: checksum(A ++ B) == merge(checksum(A), checksum(B))") {
    val genPairs = Gen.listOf(for {
      k <- Arbitrary.arbitrary[Array[Byte]]
      v <- Arbitrary.arbitrary[Array[Byte]]
    } yield (k, v))
    def fold(ps: List[(Array[Byte], Array[Byte])]): RawChecksum =
      ps.foldLeft(RawChecksum.zero)((acc, p) => acc.merge(RawChecksum.of(p._1, p._2)))
    check(forAll(genPairs, genPairs) { (a, b) =>
      fold(a ++ b) == fold(a).merge(fold(b))
    })
  }
}
