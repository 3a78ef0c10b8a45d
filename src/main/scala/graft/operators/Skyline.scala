package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) — the maximal points under
  * coordinate-wise dominance (`q` dominates `p` iff q ≥ p in every
  * dimension and > in at least one). The classic two-phase distributed
  * shape: each partition computes its LOCAL skyline (a local skyline
  * point is the only kind that can be global — dominance is
  * transitive), then the union of local skylines (small: frontier
  * size, not data size) merges in one task. This is the same
  * shrink-then-merge pattern as the checksum monoid and KMV sketch:
  * per-partition state bounded by the answer, one cheap final fold.
  *
  * No arithmetic at all — only comparisons — so cross-engine equality
  * is structural; the DuckDB oracle uses the O(n log n) sort/running-
  * max formulation, which SkylineSpec proves equivalent to this
  * operator's generic dominance loop. */
object Skyline {

  private def dominates(q: (Double, Long), p: (Double, Long)): Boolean =
    q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2)

  private def localSkyline(it: Iterator[(Double, Long)]): Iterator[(Double, Long)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    it.foreach { p =>
      if (!buf.exists(q => dominates(q, p))) {
        val surviving = buf.filterNot(q => dominates(p, q))
        buf.clear(); buf ++= surviving; buf += p
      }
    }
    buf.iterator
  }

  /** 2-D maximize/maximize skyline over (aCol: numeric, bCol: integral).
    * Output: the frontier as (a, b), one row per non-dominated distinct
    * point. */
  def skyline2(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NaN is excluded up front: IEEE NaN compares false against
    // everything, so a NaN point would be "never dominated" and pollute
    // the frontier instead of erroring
    val pts = df.select(col(aCol).cast("double").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && !isnan(col("a")))
      .distinct().as[(Double, Long)]
    pts.mapPartitions(localSkyline)     // phase 1: bounded per-partition
      .repartition(1)
      .mapPartitions(localSkyline)      // phase 2: merge the frontiers
      .toDF("a", "b")
  }
}
