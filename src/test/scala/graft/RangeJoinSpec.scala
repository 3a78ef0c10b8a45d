package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bin-bucketed range join: equivalence with the naive inequality join,
  * including bin-edge and multi-bin-spanning intervals. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("range join equals the naive inequality join, incl. bin edges") {
    val points = Seq((1L, 0L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 55L),
        (2L, 10L), (1L, 100L))
      .toDF("user_id", "p")
    val intervals = Seq(
        (1L, 0L, 10L),    // closed ends: contains 0,10
        (1L, 10L, 35L),   // spans bins (binSize 10): contains 10,19,20
        (1L, 90L, 120L),  // contains 100
        (2L, 0L, 9L))     // wrong user for p=10
      .toDF("user_id", "lo", "hi")
    val got = RangeJoin(points, "p", intervals, "lo", "hi", Seq("user_id"), 10L)
      .select("user_id", "p", "lo", "hi")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val naive = points.as("p").join(intervals.as("i"),
        col("p.user_id") === col("i.user_id") &&
          col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("p.user_id"), col("p"), col("lo"), col("hi"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got === naive)
    assert(got.nonEmpty)
    // spot checks: closed-interval ends included; cross-user excluded
    assert(got.contains((1L, 10L, 0L, 10L)))
    assert(got.contains((1L, 10L, 10L, 35L)))
    assert(!got.exists { case (u, p, _, _) => u == 2L && p == 10L })
  }
}
