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
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("ndv"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nonnull"),
          col("ndv"), col("min_val"), col("max_val"))
    }.reduce(_ unionAll _)
  }
}
