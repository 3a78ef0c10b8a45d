package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's `diff` subcommand re-expressed as a key join
  * (`diff/diff.go:18-63`).
  *
  * The reference compares the two clusters POSITIONALLY in lock-step
  * batches and resumes both sides from src's last key (`diff/diff.go:59`)
  * — which misaligns permanently after a single inserted/deleted key.
  * The join formulation implements the *intended* semantics
  * (`README.md:7` "output the diff of key/value") and is the
  * scale-correct plan: a full-outer sort-merge join on the key, no
  * driver-side pagination, no collects.
  *
  * At 100 TB both sides shuffle-partition on `key`; with pre-bucketed
  * snapshots the shuffle disappears entirely. AQE handles skew.
  */
object Diff {

  /** Full diff classification. Input frames must have columns
    * (key, value) of matching types (binary or string).
    * Output: key, src_value, dst_value, diff_class ∈
    * {src_only, dst_only, mismatch} — equal pairs are dropped
    * (the reference prints only differing pairs, `diff/diff.go:47-55`). */
  def diff(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.select(col("key"), col("value").as("src_value"))
    val d = dst.select(col("key"), col("value").as("dst_value"))
    s.join(d, Seq("key"), "full_outer")
      .withColumn("diff_class",
        when(col("src_value").isNull, "dst_only")
          .when(col("dst_value").isNull, "src_only")
          .when(col("src_value") =!= col("dst_value"), "mismatch")
          .otherwise("equal"))
      .filter(col("diff_class") =!= "equal")
      .select(col("key"), col("src_value"), col("dst_value"), col("diff_class"))
  }

  /** Keys present in src but not dst — left_anti join, no value compare
    * (cheaper than the full diff when only presence matters). */
  def srcOnly(src: DataFrame, dst: DataFrame): DataFrame =
    src.join(dst.select("key"), Seq("key"), "left_anti")

  /** Symmetric difference on whole (key, value) pairs via set ops —
    * the alternative diff formulation (SURVEY.md §2b set-ops row). */
  def symmetricDiff(src: DataFrame, dst: DataFrame): DataFrame =
    src.exceptAll(dst).withColumn("side", lit("src"))
      .unionAll(dst.exceptAll(src).withColumn("side", lit("dst")))

  /** Per-class counts — the reference's running mismatch counter
    * (`diff/diff.go:48`) as an aggregate. */
  def diffCounts(src: DataFrame, dst: DataFrame): DataFrame =
    diff(src, dst).groupBy(col("diff_class")).agg(count(lit(1)).as("n"))
}
