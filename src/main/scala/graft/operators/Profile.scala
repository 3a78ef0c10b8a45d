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

  /** Two execution strategies with identical output (ProfileSpec pins
    * the equality):
    *
    *  - `singlePass = false` (default): one cheap wide aggregate for
    *    count/nonnull/min/max (a single scan — these are plain
    *    partial+final aggs), plus one distinct-count aggregate per
    *    column. More scans, but each is a vectorized columnar read of
    *    ONE column, and there is no row multiplication. Measured ~8×
    *    faster at local sf0.1, where scans are page-cache-cheap and
    *    CPU dominates.
    *  - `singlePass = true`: everything in one aggregate — Catalyst
    *    rewrites the multi-column countDistincts via Expand (row count
    *    × |cols| before the shuffle). One scan total: the right trade
    *    when the scan itself is the cost (remote object storage).
    *
    * Exact ndv is inherently the expensive part in either shape — the
    * production alternative is one pass with ESTIMATED ndv
    * ([[Sketches.kmvDistinct]] / `approx_count_distinct`), which is
    * what Spark's own ANALYZE does (HLL++). */
  def tableStats(df: DataFrame, cols: Seq[String],
                 singlePass: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "tableStats needs at least one column")
    if (singlePass) {
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
    } else {
      val basicAggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))) :+ count(lit(1)).as("n_rows")
      val basics = df.agg(basicAggs.head, basicAggs.tail: _*)
      val ndvs = cols.map(c =>
          df.agg(countDistinct(col(c)).as("ndv")).select(lit(c).as("column"), col("ndv")))
        .reduce(_ unionAll _)
      val stackArgs = cols.map(c =>
        s"'$c', n_rows, `nn_$c`, `min_$c`, `max_$c`").mkString(", ")
      val wide = basics.select(expr(
        s"stack(${cols.size}, $stackArgs) AS (column, n_rows, n_nonnull, min_val, max_val)"))
      wide.join(ndvs, Seq("column"))
        .select(col("column"), col("n_rows"), col("n_nonnull"), col("ndv"),
          col("min_val"), col("max_val"))
    }
  }

  /** Data-contract validation — "great-expectations" style rule
    * checking as ONE aggregate pass: every rule is a boolean Column
    * evaluated per row, a row violates a rule when the predicate is
    * not TRUE (NULL counts as a violation — an unknown is not a
    * pass), and all rules fold in the same partial+final aggregate so
    * the table streams through once no matter how many rules the
    * contract carries. Output: (rule, n_rows, n_violations), one row
    * per rule. The rule set is plan-time metadata (a few columns in
    * one agg), never data — nothing here shuffles more than one row
    * of counters per partition. */
  def expectations(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    // rule names are spliced into the stack() SQL string below — gate
    // them to identifier-ish characters so a quote can't break (or
    // inject into) the generated expression
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_.\\- ]+"),
        s"rule name '$name' must be [A-Za-z0-9_.- ] only") }
    val sums = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"__v$i") }
    val aggs = count(lit(1)).as("__n") +: sums
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) => s"'$name', __v$i" }.mkString(", ")
    wide.select(col("__n").as("n_rows"),
        expr(s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)"))
      .select(col("rule"), col("n_rows"), col("n_violations"))
  }

  /** Row-level k-anonymity suppression — the PII-risk gate a
    * training-data release runs before publishing: drop every row
    * whose quasi-identifier combination occurs fewer than `k` times,
    * so no released row describes a group smaller than k. One grouped
    * count builds the cell census, one keyed equi-join applies it —
    * the census is |cells| rows (bounded by the quasi-identifier
    * domain, not the data), so AQE broadcasts it when small and the
    * join stays a shuffle-colocated equi-join when it isn't. Returns
    * the schema-preserved surviving rows.
    *
    * Rows with a NULL quasi-identifier are ALWAYS suppressed: the
    * left-semi equi-join never matches a null key (same as SQL JOIN
    * USING), and that is the conservative privacy reading — a record
    * whose group is unknown cannot be shown to sit in a group of ≥ k. */
  def kAnonFilter(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    val cells = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__cell_n"))
      .filter(col("__cell_n") >= k)
      .select(quasi.map(col): _*)
    df.join(cells, quasi, "left_semi")
  }

  /** In-flight pipeline counters via Spark's `Observation` API — the
    * production monitoring shape the `expectations` batch audit can't
    * give you: metrics collected ON THE SAME JOB that does the real
    * work (here a filter + `noop`-sink pass standing in for the
    * pipeline's write), zero extra scans, delivered to the driver by
    * the listener when the action completes. This is how a 100 TB
    * curation stage reports "rows in / rows dropped / value total"
    * without anyone re-reading the input. The observed values are
    * re-exposed as a 1-row DataFrame so the oracle can gate them
    * exactly like any query — proving the listener path delivers the
    * same numbers a direct aggregate computes. All aggregates are
    * integer/DECIMAL so the gate is exact. */
  def observedCounters(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    events
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("value") < 100.0d, 1L).otherwise(0L)).as("n_below"),
        sum(col("value").cast("decimal(20,6)")).as("sum_value"))
      .filter(col("value") >= 100.0d)
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    // sums observe as NULL over zero rows — surface them as the same
    // NULLs the oracle's direct aggregate produces, never an NPE
    Seq((m("n_rows").asInstanceOf[Long],
      Option(m("n_below")).map(_.asInstanceOf[Long]),
      Option(m("sum_value")).map(_.asInstanceOf[java.math.BigDecimal].toString)))
      .toDF("n_rows", "n_below", "sum_dec")
      .select(col("n_rows"), col("n_below"),
        col("sum_dec").cast("decimal(20,6)").cast("double").as("sum_value"))
  }

  /** Exact tie-aware ROC-AUC per group — the discrimination metric a
    * quality-filter / classifier rollout gates on (the threshold-free
    * companion of [[graft.operators.TextAnalysis]]'s calibration
    * table). Mann-Whitney identity: AUC · n_pos · n_neg = Σ over
    * distinct scores s of [ p_s · N_<(s) + p_s · n_s / 2 ] where p_s /
    * n_s are positive/negative counts AT s and N_<(s) the negatives
    * BELOW s — ties contribute the half term, i.e. average rank,
    * exactly. Doubling keeps it integral; the emitted
    * `auc_ppm = u2 · 1e6 div (2 · n_pos · n_neg)` is pure integer
    * division (DECIMAL(38,0) / HUGEINT twins — n_p·n_n overflows
    * BIGINT near 3e9 rows per group).
    *
    * Scale shape: the corpus collapses to the per-(group, score) class
    * histogram FIRST (one partial+final aggregate), so the only sort —
    * the cumulative-negatives window — runs over the distinct-score
    * spine, whose size is bounded by the score's cardinality, not the
    * corpus: house scores are quantized integers (ppm/milli), so the
    * spine is ≤ ~1e6 rows per group regardless of corpus size. For an
    * unquantized double score, quantize first (the metric at 1e-6
    * resolution is the shipped metric). Output: (group…, n_pos, n_neg,
    * auc_ppm), auc_ppm NULL when a group lacks both classes (AUC
    * undefined). */
  def binaryAuc(df: DataFrame, groupCols: Seq[String],
                score: org.apache.spark.sql.Column,
                positive: org.apache.spark.sql.Column): DataFrame = {
    val g = groupCols.map(col)
    val hist = df
      .select((g :+ score.as("__s") :+
        when(positive, 1L).otherwise(0L).as("__y")): _*)
      .groupBy((g :+ col("__s")): _*)
      .agg(sum(col("__y")).as("__p"),
        sum(lit(1L) - col("__y")).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = hist.withColumn("__nless",
      coalesce(sum(col("__n")).over(w), lit(0L)))
    cum.groupBy(g: _*)
      .agg(sum(col("__p")).as("n_pos"), sum(col("__n")).as("n_neg"),
        // the FACTOR is cast to decimal before the multiply: a heavily
        // tied score at ~3e9 rows/class makes the single term p·(2·N<+n)
        // itself exceed BIGINT, so casting only the product would wrap
        // before the decimal ever saw it
        sum(col("__p").cast("decimal(38,0)") *
          (lit(2L) * col("__nless") + col("__n"))).as("__u2"))
      .select((g :+ col("n_pos") :+ col("n_neg") :+
        // truncating integral div (matches DuckDB // on HUGEINT); a
        // decimal cast would HALF_UP-round the quotient instead
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("CAST((__u2 * 1000000) div " +
            "(CAST(n_pos AS DECIMAL(38,0)) * n_neg * 2) AS BIGINT)"))
          .as("auc_ppm")): _*)
  }
}
