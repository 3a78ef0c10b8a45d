package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins `LevCappedExpr` (banded, prefix/suffix-stripped capped
  * Levenshtein — the r16 verify-kernel swap) bit-identical to Spark's
  * builtin `levenshtein(l, r, threshold)`: exhaustive small-alphabet
  * cross-check, random boundary-heavy long pairs, the non-ASCII
  * delegation path, nulls through codegen. */
class LevCappedSpec extends SparkTestBase {
  import spark.implicits._

  private def ref(a: String, b: String, cap: Int): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b), cap)

  private def neu(a: String, b: String, cap: Int): Int =
    graft.functions.LevCapped.distance(
      UTF8String.fromString(a), UTF8String.fromString(b), cap)

  test("exhaustive: all pairs over {a,b,c} up to length 5, caps 0..5") {
    val alpha = Seq("a", "b", "c")
    def strs(n: Int): Seq[String] =
      if (n == 0) Seq("") else strs(n - 1).flatMap(s => alpha.map(s + _)) ++ strs(n - 1)
    val all = strs(5).distinct
    for (cap <- 0 to 5; a <- all; b <- all) {
      val (r, n) = (ref(a, b, cap), neu(a, b, cap))
      assert(r === n, s"a='$a' b='$b' cap=$cap: builtin=$r kernel=$n")
    }
  }

  test("random long ASCII pairs around the cap boundary") {
    val rnd = new scala.util.Random(5)
    def doc(n: Int): String =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def mutate(s: String, edits: Int): String = {
      val sb = new StringBuilder(s)
      (1 to edits).foreach { _ =>
        val i = rnd.nextInt(math.max(sb.length, 1))
        rnd.nextInt(3) match {
          case 0 if sb.nonEmpty => sb.setCharAt(math.min(i, sb.length - 1),
            ('a' + rnd.nextInt(26)).toChar)
          case 1 => sb.insert(math.min(i, sb.length), ('a' + rnd.nextInt(26)).toChar)
          case _ if sb.nonEmpty => sb.deleteCharAt(math.min(i, sb.length - 1))
          case _ => ()
        }
      }
      sb.toString
    }
    (1 to 300).foreach { k =>
      val cap = Seq(0, 1, 8, 64)(k % 4)
      val a = doc(20 + rnd.nextInt(800))
      val b = if (k % 3 == 0) doc(20 + rnd.nextInt(800))
        else mutate(a, rnd.nextInt(2 * cap + 4))
      assert(ref(a, b, cap) === neu(a, b, cap), s"cap=$cap a=$a b=$b")
    }
  }

  test("non-ASCII delegates: unicode pairs agree with the builtin") {
    val pairs = Seq(
      ("héllo wörld", "hello world"), ("日本語テキスト", "日本語テスト"),
      ("emoji 😀 doc", "emoji 😀 dic"), ("", "ünïcödé"), ("mixed ascii é", "mixed ascii e"))
    for ((a, b) <- pairs; cap <- Seq(0, 2, 64))
      assert(ref(a, b, cap) === neu(a, b, cap), s"'$a' vs '$b' cap=$cap")
  }

  test("codegen path + nulls match the builtin column-for-column") {
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Option[String], Option[String])] =
      (1 to 200).map { _ =>
        def s() = if (rnd.nextInt(10) == 0) None
          else Some((1 to rnd.nextInt(60)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        (s(), s())
      } :+ ((None, Some("x"))) :+ ((Some("x"), None)) :+ ((None, None))
    val df = rows.toDF("a", "b")
    val diff = df.select(
        graft.functions.LevCapped.levCapped(col("a"), col("b"), 4).as("neu"),
        levenshtein(col("a"), col("b"), 4).as("alt"))
      .filter(!(col("neu") <=> col("alt")))
    assert(diff.count() === 0)
  }
}
