package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Data profiling — the ANALYZE-TABLE face of the engine: per-column
  * statistics a cost-based optimizer (or a pipeline health check) would
  * collect before planning 100 TB of work. One pass per column, each a
  * partial+final aggregate; `ndv` here is the exact distinct count so
  * the DuckDB oracle can replay it — at cluster scale you swap in
  * [[Sketches.kmvDistinct]] (same contract, bounded shuffle), which is
  * why the two live side by side.
  *
  * Values are rendered as strings to give the stats table one uniform
  * schema; only integral and string columns are accepted (float
  * rendering is engine-specific and would break the oracle gate). */
object Profile {

  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableStats needs at least one column")
    // ONE scan for all columns: a single wide aggregate (Catalyst
    // rewrites the multi-column countDistincts via Expand — the input
    // is still read once), then stack() unpivots the 1-row result into
    // the per-column stats table. The naive per-column union of
    // aggregates would scan the table |cols| times — the difference
    // between one pass and five at 100 TB.
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"ndv_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c"))) :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', n_rows, `nn_$c`, `ndv_$c`, `min_$c`, `max_$c`").mkString(", ")
    row.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (column, n_rows, n_nonnull, ndv, min_val, max_val)"))
  }
}
