package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime enforcement of a BY-CONSTRUCTION row bound on a tiny frame
  * that an unpartitioned cumulative window is about to run over.
  *
  * A handful of operators deliberately use `Window.orderBy` with no
  * partition — a cumulative sum over a frame whose size is independent
  * of corpus size (≤256 hash slices, a cent-binned value range, the
  * corpus span in days). Those windows are safe exactly as long as the
  * bound argument holds; a refactor that widens the upstream frame
  * would silently turn them into the single-task scale hazard the rest
  * of the codebase avoids. This guard makes the invariant executable:
  * the bound is checked IN the plan (a broadcast one-row count joined
  * against every row, `assert_true` on the comparison), so exceeding
  * it fails the query loudly with the operator named instead of
  * quietly funneling a corpus through one task. Cost: one extra
  * scalar aggregate + broadcast against a frame of at most `bound`
  * rows — noise next to the window it protects. */
object BoundedFrame {
  def enforce(df: DataFrame, bound: Long, what: String): DataFrame = {
    val n = df.groupBy().agg(count(lit(1)).as("__bound_n"))
    df.crossJoin(broadcast(n))
      .filter(assert_true(col("__bound_n") <= lit(bound),
        concat(lit(s"$what: "), col("__bound_n"),
          lit(s" rows exceeded the by-construction bound $bound — its " +
            "unpartitioned cumulative window is no longer " +
            "corpus-size-independent; re-derive the bound or partition " +
            "the window"))).isNull)
      .drop("__bound_n")
  }

  /** The unpartitioned running-total window the guarded frames use. */
  def cumWindow(order: Column*): org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
}
