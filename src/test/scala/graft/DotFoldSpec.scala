package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dot

/** Property coverage for the dot-product kernel now exposed as the SQL
  * function `dot_product` — the fixture-level bit-identity spec lives in
  * SimilaritySpec; this pins the JVM kernel against a straight Scala
  * fold on arbitrary inputs including extremes. */
class DotFoldSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // extremes included: ±Infinity, denormals, max/min magnitudes — every
  // IEEE case except NaN (covered separately; NaN != NaN breaks ==)
  private val floatGen: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-1e6f, 1e6f),
    Gen.oneOf(Float.PositiveInfinity, Float.NegativeInfinity,
      Float.MaxValue, Float.MinPositiveValue, -0.0f, 0.0f))

  test("fold equals the sequential Scala fold on arbitrary float arrays") {
    val arrays = Gen.listOf(floatGen).map(_.toArray)
    check(Prop.forAll(arrays) { xs =>
      val a = new GenericArrayData(xs.map(x => x: Any))
      val expected = xs.foldLeft(0.0d)((acc, x) => acc + x.toDouble * x.toDouble)
      val got = Dot.fold(a, a, Dot.KindFloat, Dot.KindFloat)
      got != null &&
        java.lang.Double.doubleToLongBits(got.doubleValue()) ==
          java.lang.Double.doubleToLongBits(expected)
    })
  }

  test("length mismatch yields null, like the zip_with twin") {
    val a = new GenericArrayData(Array[Any](1.0f, 2.0f))
    val b = new GenericArrayData(Array[Any](1.0f))
    assert(Dot.fold(a, b, Dot.KindFloat, Dot.KindFloat) == null)
  }

  test("NaN propagates (bitwise NaN result, not a crash)") {
    val a = new GenericArrayData(Array[Any](Float.NaN, 1.0f))
    val r = Dot.fold(a, a, Dot.KindFloat, Dot.KindFloat)
    assert(r != null && r.isNaN)
  }

  test("mixed int/long kinds convert exactly") {
    val i = new GenericArrayData(Array[Any](3, -7))
    val l = new GenericArrayData(Array[Any](4L, 5L))
    assert(Dot.fold(i, l, Dot.KindInt, Dot.KindLong).doubleValue() === 3.0 * 4 - 7.0 * 5)
  }

  test("abs_diff_sum kernel equals the Scala fold; mismatch and null element yield null") {
    import graft.functions.AbsDiffSum
    val pairs = for {
      xs <- Gen.listOf(Gen.chooseNum(-1000, 1000))
      ys <- Gen.listOfN(xs.size, Gen.chooseNum(-1000, 1000))
    } yield (xs.toArray, ys.toArray)
    check(Prop.forAll(pairs) { case (xs, ys) =>
      val a = new GenericArrayData(xs.map(x => x: Any))
      val b = new GenericArrayData(ys.map(y => y: Any))
      val got = AbsDiffSum.fold(a, b)
      got != null &&
        got.intValue() == xs.zip(ys).map { case (x, y) => math.abs(x - y) }.sum
    })
    assert(AbsDiffSum.fold(
      new GenericArrayData(Array[Any](1, 2)),
      new GenericArrayData(Array[Any](1))) == null)
    assert(AbsDiffSum.fold(
      new GenericArrayData(Array[Any](1, null)),
      new GenericArrayData(Array[Any](1, 2))) == null)
  }
}
