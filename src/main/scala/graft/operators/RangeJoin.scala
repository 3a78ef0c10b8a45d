package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Range (interval-containment) join: attach to each point row every
  * interval row whose closed interval [lo, hi] contains the point.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin —
  * quadratic work and a broadcast of one whole side. This operator
  * turns it into an EQUI-join by binning the domain: each interval
  * explodes to the fixed-size bins it overlaps, each point maps to its
  * one bin, the join runs on (keys..., bin), and a residual containment
  * filter removes the bin-edge false positives. Work is
  * O(points + intervals · avg_bins_per_interval + true matches) and it
  * shuffle-partitions like any hash join — the standard trick for
  * time-interval joins at scale. Pick `binSize` near the typical
  * interval length: too small explodes intervals, too large piles
  * unrelated rows into one bin.
  */
object RangeJoin {

  /** `points` carries `pointCol` (long); `intervals` carries `loCol`,
    * `hiCol` (long, closed interval). `keys` are extra equi-join
    * columns present on both sides (e.g. user_id). */
  def apply(points: DataFrame, pointCol: String,
            intervals: DataFrame, loCol: String, hiCol: String,
            keys: Seq[String], binSize: Long): DataFrame = {
    require(binSize > 0)
    val p = points.withColumn("__bin", floorDiv(col(pointCol), binSize))
    val i = intervals.withColumn("__bin",
      explode_outer(sequence(floorDiv(col(loCol), binSize), floorDiv(col(hiCol), binSize))))
    p.join(i, keys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  // exact for |c| < 2^53 (epoch micros ≈ 1.7e15 qualify); the modulo
  // subtraction keeps the double division on an exact multiple
  private def floorDiv(c: Column, n: Long): Column =
    ((c - pmod(c, lit(n))) / lit(n)).cast("long")
}
