package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Event-stream operators: JSON property extraction, time-window
  * aggregation, and as-of joins over the `events` fixture.
  *
  * The fixture stores `ts` as parquet TIMESTAMP(MICROS) (earlier
  * generations used TIMESTAMP(NANOS); see [[read]] — the source
  * follows the logical type). All oracle-facing bucketing uses
  * integer ns/µs arithmetic derived from `unix_micros`, which both
  * engines compute exactly.
  */
object Events {

  /** events source: ts (TimestampType, the fixture's parquet
    * TIMESTAMP(MICROS) column read natively), ts_us (long, exact
    * micros via unix_micros — no float round-trip), ts_ns (long,
    * ts_us·1000 — the ns-resolution axis every downstream integer
    * bucket derivation divides; DuckDB's `epoch_ns(ts)` computes the
    * identical value, so both engines agree bit-for-bit). Earlier
    * fixture generations annotated the column TIMESTAMP(NANOS); this
    * reader follows the parquet logical type rather than forcing an
    * int64 schema, so the unit can never silently shift under it
    * again. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    // the µs parquet column surfaces as TIMESTAMP_NTZ; the NTZ →
    // timestamp cast below is a pure type relabel ONLY under a UTC
    // session (and unix_micros demands the zoned type). Every entry
    // point in the driver contract sets UTC — a library caller with a
    // non-UTC session would get silently shifted ts_us/ts_ns and every
    // downstream bucket would move, so fail loudly instead
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"Events.read requires spark.sql.session.timeZone=UTC (got '$tz') — " +
      s"the TIMESTAMP_NTZ → timestamp relabel shifts under any other zone")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("ts_ns", col("ts_us") * lit(1000L))
  }

  /** Typed JSON extraction of the `props` column (`from_json` with an
    * explicit schema — codegen'd Jackson parse, no UDF). */
  def withProps(events: DataFrame): DataFrame =
    events.withColumn("k",
      from_json(col("props"), StructType(Seq(StructField("k", LongType))))
        .getField("k"))

  /** Per-event-type stats over the JSON `k` property. Decimal-exact sums
    * cast to double at the end (cross-engine bit stability). */
  def jsonStats(events: DataFrame): DataFrame =
    withProps(events)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count_distinct(col("user_id")).as("n_users"))

  /** Tumbling-window aggregate per (UTC day, event_type). The day bucket
    * is exact integer arithmetic on nanos; `value` sums in
    * decimal(20,6). Output day as a date string. */
  def dailyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("day_us", expr("ts_ns DIV 86400000000000") * lit(86400000000L))
      .groupBy(
        date_format(timestamp_micros(col("day_us")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))

  /** Ordered conversion funnel over per-user FIRST occurrences: a user
    * reaches stage k iff every stage 1..k has an occurrence and their
    * first-occurrence times strictly increase along the stage order.
    * ONE shuffle (the per-user conditional-min aggregate, map-side
    * partial); the depth fold and the per-stage explode are pure
    * projections. Timestamps compare as exact int64 nanos (`ts_ns`) —
    * ties between stages break the strict order and stop the funnel,
    * deterministically in both engines. Output: (stage_idx, stage,
    * n_users) with n_users = users reaching depth >= stage_idx. */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts_ns"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val firsts = stages.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s, col(tsCol))).as(s"__t$i") }
    val byUser = events.groupBy(col(userCol))
      .agg(firsts.head, firsts.tail: _*)
    val depth = stages.indices.drop(1).foldLeft(
      when(col("__t0").isNotNull, lit(1)).otherwise(lit(0))) { (d, i) =>
      when(d === i && col(s"__t$i").isNotNull &&
        col(s"__t$i") > col(s"__t${i - 1}"), lit(i + 1)).otherwise(d)
    }
    val entries = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(s).as("stage"),
        (col("__depth") >= i + 1).cast("long").as("hit")) }
    byUser.withColumn("__depth", depth)
      .select(explode(array(entries: _*)).as("e"))
      .groupBy(col("e.stage_idx").as("stage_idx"), col("e.stage").as("stage"))
      .agg(sum(col("e.hit")).as("n_users"))
  }

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapUs`. Classic lag → break flag → running sum →
    * grouped agg; one shuffle on user_id, SQL-expressible (oracle twin
    * runs the same windows). The streaming-native equivalent is
    * `groupBy(session_window($"ts", gap))` — EventsSpec cross-checks the
    * two formulations. */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val prevTs = lag(col("ts_us"), 1).over(byUser)
    events
      .withColumn("__brk",
        when(prevTs.isNull || (col("ts_us") - prevTs) > gapUs, 1).otherwise(0))
      .withColumn("session_no", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts_us")).as("ts_start_us"),
        max(col("ts_us")).as("ts_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
  }

  /** Top navigation paths: sessions cut by the same gap rule as
    * [[sessionize]], each session reduced to its ordered event-type
    * path string (ties on ts break by event_id, so the path is
    * deterministic), then the corpus-wide top-`topN` paths by session
    * count — the "what do users actually do" primitive behind funnel
    * design and behavioral-sequence curation.
    *
    * Scale: one per-user window (small-and-many partitions — the
    * sessionize contract), one grouped path fold bounded by session
    * length, one partial-agg count, and a TakeOrdered — never a global
    * sort. */
  def sessionPaths(events: DataFrame, gapUs: Long, topN: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val prevTs = lag(col("ts_us"), 1).over(byUser)
    events
      .withColumn("__brk",
        when(prevTs.isNull || (col("ts_us") - prevTs) > gapUs, 1).otherwise(0))
      .withColumn("session_no", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(topN)
  }

  /** As-of join: for each event of type `rightType`, attach the most
    * recent STRICTLY EARLIER event of type `leftType` by the same user
    * (classic trade/quote as-of). Expressed as a union + last-value
    * window — one shuffle on (user_id), no range join explosion; ties on
    * ts_ns resolved by event_id order. */
  def asofJoin(events: DataFrame, leftType: String, rightType: String,
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof direction must be backward|forward, got $direction")
    val tagged = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))
    val base = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    // backward: most recent strictly-earlier left event; forward: next
    // strictly-later left event (the fill-forward vs fill-backward pair
    // of time-series enrichment) — same merge-sorted single-shuffle
    // window plan, only the frame direction flips
    val (w, pick) =
      if (direction == "backward")
        (base.rowsBetween(Window.unboundedPreceding, -1),
          (c: Column) => last(c, ignoreNulls = true))
      else
        (base.rowsBetween(1, Window.unboundedFollowing),
          (c: Column) => first(c, ignoreNulls = true))
    tagged
      .withColumn("asof_event_id",
        pick(when(col("event_type") === leftType, col("event_id"))).over(w))
      .withColumn("asof_ts_us",
        pick(when(col("event_type") === leftType, col("ts_us"))).over(w))
      .filter(col("event_type") === rightType)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_event_id"), col("asof_ts_us"))
  }

  /** Last-touch attribution report — the marketing-analytics staple
    * built from the as-of join: every conversion's revenue is credited
    * to the campaign of the user's most recent `touchType` event (here
    * campaign = the touch's JSON k mod 10 — the fixture's stand-in for
    * a campaign tag); conversions with NO prior touch report under
    * 'unattributed' instead of silently dropping, so the report's
    * revenue total always equals the conversion table's. Shapes: the
    * as-of is the family's one-shuffle window; the campaign fetch is a
    * touch-keyed equi-join; the report is a partial+final aggregate
    * over the (tiny) campaign key. Revenue sums in DECIMAL and casts
    * to double once (the house float recipe). */
  def attribution(events: DataFrame, touchType: String,
                  convType: String): DataFrame = {
    val conv = asofJoin(events, touchType, convType)
    val touches = withProps(events)
      .filter(col("event_type") === touchType)
      .select(col("event_id").as("asof_event_id"),
        pmod(col("k"), lit(10L)).as("campaign"))
    val convVal = events.filter(col("event_type") === convType)
      .select(col("event_id"), col("value"))
    conv.join(convVal, Seq("event_id"))
      .join(touches, Seq("asof_event_id"), "left_outer")
      .groupBy(coalesce(col("campaign").cast("string"), lit("unattributed"))
        .as("campaign"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("value").cast("decimal(20,6)")).as("__rev"))
      .select(col("campaign"), col("n_conversions"),
        col("__rev").cast("double").as("revenue"))
  }

  /** Markov transition matrix over per-user event streams: for each
    * ordered pair of consecutive events by the same user, count the
    * (prev_type → event_type) transition and its conditional
    * probability. One shuffle on user_id for the lag window, one
    * map-side-combined aggregate on the (tiny) type-pair key; the
    * per-prev normalizer is a window over that aggregate's handful of
    * rows, not over the events. `p` divides two exact longs — IEEE
    * division of exact integers is bit-identical across engines.
    * Ordering ties resolve on (ts_us, event_id); event_id is unique so
    * the sequence is total. */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n") / sum(col("n")).over(Window.partitionBy(col("prev_type"))))
  }

  /** SCD Type-2 interval history — the warehouse staple that turns a
    * change log into a queryable dimension: per key, collapse
    * consecutive runs of the SAME value (null-safe — a NULL value is a
    * run like any other) and emit one row per run with its
    * [valid_from, valid_to) µs interval; the current run's valid_to is
    * NULL (open). Two windows over the SAME (key, ts, id) ordering —
    * Catalyst reuses one sort — and both partition by the natural key,
    * so parallelism is the key cardinality and no task ever sees more
    * than one key's history. Equal-timestamp changes per key collapse
    * to the last (max id) — the state at t is the FINAL value at t, so
    * no zero-width [t, t) interval ever exists and the as-of lookup is
    * total over the observed timeline. Output: (key, value, valid_from_us,
    * valid_to_us). The as-of lookup this table serves is `valid_from
    * <= t AND (valid_to IS NULL OR t < valid_to)` — a range-join
    * ([[graft.operators.RangeJoin]]) or a partition-pruned scan, never
    * a per-query window. */
  def scd2(df: DataFrame, keyCol: String, valCol: String,
           tsUsCol: String, idCol: String): DataFrame = {
    // equal-timestamp changes collapse to the LAST (max id) per
    // (key, ts) FIRST — the state at t is the final value at t. Without
    // this, two changes at one µs emit a zero-width [t, t) interval the
    // documented as-of lookup can never return.
    val perTs = Window.partitionBy(col(keyCol), col(tsUsCol))
      .orderBy(col(idCol).desc)
    val compacted = df
      .select(col(keyCol), col(valCol), col(tsUsCol), col(idCol))
      .withColumn("__r", row_number().over(perTs))
      .filter(col("__r") === 1).drop("__r")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsUsCol), col(idCol))
    val changes = compacted
      .withColumn("__prev", lag(col(valCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col(valCol) <=> col("__prev")))
    changes
      .withColumn("valid_to_us", lead(col(tsUsCol), 1).over(w))
      // the change-event id rides along: lineage back to the source
      // row AND a total ordering for equal-timestamp changes
      .select(col(keyCol), col(valCol).as("value"),
        col(tsUsCol).as("valid_from_us"), col("valid_to_us"),
        col(idCol).as("change_id"))
  }

  /** Gap-filled hourly series per event type: project events onto an
    * exact integer hour index (ts_ns DIV 3.6e12 — no calendar math, no
    * timezone), build the full [min,max] hour spine per type, left-join
    * the observed aggregate, and forward-fill the last observed sum into
    * the holes. The spine is `sequence(...)` exploded from ONE tiny
    * bounds row broadcast against the distinct types — never a
    * driver-side range — and the fill is a per-type running `last(_,
    * ignoreNulls)` window, one shuffle on the (small) type key. Spine
    * size is (hours × types), a function of the TIME RANGE, not the row
    * count — at 100 TB of events the spine is the same few thousand
    * rows. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .withColumn("hr", expr("ts_ns DIV 3600000000000"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).as("sum_value"))
    val bounds = hourly.agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
    val spine = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("hr"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_sum",
        coalesce(last(col("sum_value"), ignoreNulls = true).over(w),
          lit(0).cast("decimal(20,6)")).cast("double"))
      .select(col("event_type"), col("hr"), col("n_events"), col("filled_sum"))
  }

  /** Weekly cohort retention: a user's cohort is their first active
    * week; `n_users` counts distinct users of cohort `cohort_week` still
    * (or again) active `week_offset` weeks later. Two shuffles — the
    * per-user first-week aggregate, then the distinct-count per
    * (cohort, offset) — both map-side combined; week indexes are exact
    * integer ns arithmetic. */
  def retention(events: DataFrame): DataFrame = {
    val weekly = events
      .select(col("user_id"), expr("ts_ns DIV 604800000000000").as("wk"))
      .distinct()
    val cohort = weekly.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    weekly.join(cohort, "user_id")
      .groupBy(col("cohort_wk").as("cohort_week"),
        (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Per-user ordered event-type sequence — the "assemble a training
    * sequence per entity" primitive (user session → token stream). One
    * shuffle on user_id; the per-user list is sorted with `array_sort`
    * on (ts_us, event_id, type) structs (lexicographic, deterministic —
    * event_id uniqueness makes the type component unreachable) and
    * flattened to a `|`-joined string so the result hashes as a scalar.
    * State per group is O(events of that user) — bounded by the same
    * per-entity skew cap any sequence-building pipeline must assume;
    * skewed entities should be length-capped upstream (cf.
    * [[Pack.assignBins]] for the fixed-window variant). */
  def sequences(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        concat_ws("|",
          transform(
            array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type"))).as("seq"))

  /** Autoregressive next-event training pairs: per user, each event
    * becomes one (context, label) example where the context is the
    * `k` most recent preceding event types oldest-first — the
    * sequence-model training-pair explode a recommender / behavioral-LM
    * pipeline runs over its event log. Events with NO predecessor drop
    * out (no empty contexts); shorter-than-k prefixes keep their
    * partial context, mirroring how packing handles short documents.
    * Order ties break on event_id so the pair set is deterministic.
    *
    * Scale: one window over (user, time) — per-user partitions are
    * small-and-many (the sessionize contract), so the window
    * parallelizes by user; no join, no global sort. */
  def trainingPairs(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val lags = (k to 1 by -1).map(i => lag(col("event_type"), i).over(w))
    events
      .withColumn("context", concat_ws(" ", lags: _*))
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") > 1)
      .select(col("user_id"), col("pos"), col("context"),
        col("event_type").as("label"))
  }

  /** Robust per-group outlier detection via median absolute deviation
    * (Hampel's ±k·MAD rule) — the anomaly gate a metrics pipeline
    * prefers over mean±k·σ because one extreme value cannot drag the
    * threshold. DISCRETE medians: the value at rank ⌈n/2⌉ in the
    * (value, id) order — an actual data point, never an interpolated
    * float average — so both engines pick the identical element and
    * the k·MAD comparison is IEEE-exact cross-engine (subtraction and
    * one multiply, no accumulation order anywhere).
    *
    * Scale: both medians are DISTRIBUTED rank lookups ([[Rank]]'s
    * two-phase cell-rank — deterministic equi-width buckets, local
    * rank per (group, bucket) cell, broadcast cumulative offsets), so
    * the hottest group's sort spreads over `buckets` tasks instead of
    * funneling through one; with ~5 fixed event types and 100 TB of
    * rows that spread IS the plan — the old per-group row_number
    * window was the last one-task-sort hazard in the family. Raise
    * `buckets` until cells fit a task. Output: (group, n_events, med,
    * mad, n_outliers). */
  def madOutliers(events: DataFrame, keyCol: String, valCol: String,
                  idCol: String, k: Int = 3, buckets: Int = 256): DataFrame = {
    val base = events.select(col(keyCol).as("g"), col(valCol).as("v"),
      col(idCol).as("id"))
    val n = base.groupBy(col("g")).agg(count(lit(1)).as("n_events"))
    def medianOf(df: DataFrame): DataFrame =
      Rank.cellRank(Rank.valueBuckets(df, "g", "v", "id", buckets),
          Seq("g"), "__b", Seq(col("v"), col("id")), "r")
        .join(n, Seq("g"))
        .filter(col("r") === expr("(n_events + 1) div 2"))
        .select(col("g"), col("v"))
    val med = medianOf(base).withColumnRenamed("v", "med")
    val dev = base.join(med, Seq("g"))
      .withColumn("d", abs(col("v") - col("med")))
    val mad = medianOf(dev.select(col("g"), col("d").as("v"), col("id")))
      .withColumnRenamed("v", "mad")
    dev.join(mad, Seq("g")).join(n, Seq("g"))
      .groupBy(col("g"), col("n_events"), col("med"), col("mad"))
      .agg(sum(when(col("d") > lit(k) * col("mad"), 1L).otherwise(0L))
        .as("n_outliers"))
  }

  /** Time-decayed "trending" score per group: each event contributes
    * 2^(20 − min(age_days, 20)) where age is whole UTC days behind the
    * corpus max — a one-day half-life, saturating at 20 days so the
    * weight stays a positive BIGINT power of two. Float-free by
    * construction (exponential decay is usually exp(−λ·age); with a
    * power-of-two base and integer day ages the same ranking is exact
    * integer arithmetic both engines replay bit-for-bit — the
    * q_mix_temperature / PMI discipline applied to recency weighting).
    *
    * Scale: one pass — day index from integer ns division, the corpus
    * max day as a broadcast 1-row aggregate, then a partial-agg
    * groupBy. No window, no join wider than 1 row. Output: (group,
    * n_events, last_day, score) where score = Σ weights. */
  def decayedCounts(events: DataFrame, keyCol: String): DataFrame = {
    val withDay = events.withColumn("__day", expr("ts_ns DIV 86400000000000"))
    val mx = withDay.agg(max(col("__day")).as("__mxday"))
    withDay.crossJoin(broadcast(mx))
      .withColumn("__w",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - least(__mxday - __day, CAST(20 AS BIGINT)) AS INT))"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("__day")).as("last_day"),
        sum(col("__w")).as("score"))
  }

  /** Seasonal anomaly cells: per (group, UTC day, hour-of-day), flag
    * the cells whose event count exceeds twice the group's average for
    * that HOUR across the days it was observed — the hour-of-day
    * baseline an ops pipeline uses so a nightly batch spike isn't
    * "anomalous" every night. The threshold is the exact integer
    * cross-multiply `n · days_seen > 2 · total` (no float mean), so no
    * boundary cell can flip between engines.
    *
    * Scale: cell counts are one partial-agg groupBy over the raw
    * events; the baseline re-aggregates the CELL table (|groups|·24·
    * |days| rows, corpus-independent per day) and joins back broadcast
    * — the raw events are never joined or windowed. Output: anomalous
    * (group, day, hr, n, days_seen, total) rows. */
  def seasonalAnomaly(events: DataFrame, keyCol: String): DataFrame = {
    val cells = events
      .withColumn("__day", expr("ts_ns DIV 86400000000000"))
      .withColumn("hr", expr("(ts_ns DIV 3600000000000) % 24").cast("int"))
      .groupBy(col(keyCol).as("g"), col("__day"), col("hr"))
      .agg(count(lit(1)).as("n"))
    val base = cells.groupBy(col("g").as("bg"), col("hr").as("bhr"))
      .agg(count(lit(1)).as("days_seen"), sum(col("n")).as("total"))
    cells.join(broadcast(base),
        col("g") === col("bg") && col("hr") === col("bhr"))
      .filter(col("n") * col("days_seen") > lit(2L) * col("total"))
      .select(col("g").as(keyCol),
        date_format(timestamp_micros(col("__day") * 86400000000L), "yyyy-MM-dd").as("day"),
        col("hr"), col("n"), col("days_seen"), col("total"))
  }

  /** Per-group winsorization at discrete percentile bounds — the
    * heavy-tail clamp a metrics/feature pipeline applies before
    * aggregation so a single spike cannot own the mean. Bounds are the
    * values at ranks ⌈loPct·n/100⌉ and ⌈hiPct·n/100⌉ in (value, id)
    * order — actual data points, the [[madOutliers]] discipline — so
    * clamping and clip counts replay exactly cross-engine; the
    * winsorized sum goes through the family-standard DECIMAL(20,6)
    * fold. Both percentile bounds come off ONE distributed rank pass
    * ([[Rank.cellRank]] over deterministic equi-width value buckets) —
    * no single-task per-group sort at any group size; raise `buckets`
    * until cells fit a task. Output: (group, n_events, p_lo, p_hi,
    * n_clip_low, n_clip_high, winsor_sum). */
  def winsorize(events: DataFrame, keyCol: String, valCol: String,
                idCol: String, loPct: Int = 5, hiPct: Int = 95,
                buckets: Int = 256): DataFrame = {
    require(0 < loPct && loPct < hiPct && hiPct < 100)
    val base = events.select(col(keyCol).as("g"), col(valCol).as("v"),
      col(idCol).as("id"))
    val n = base.groupBy(col("g")).agg(count(lit(1)).as("n_events"))
    val ranked = Rank.cellRank(Rank.valueBuckets(base, "g", "v", "id", buckets),
        Seq("g"), "__b", Seq(col("v"), col("id")), "r")
      .join(n, Seq("g"))
    val lo = ranked.filter(col("r") === expr(s"($loPct * n_events + 99) div 100"))
      .select(col("g"), col("v").as("p_lo"))
    val hi = ranked.filter(col("r") === expr(s"($hiPct * n_events + 99) div 100"))
      .select(col("g"), col("v").as("p_hi"))
    base.join(lo, Seq("g")).join(hi, Seq("g")).join(n, Seq("g"))
      .groupBy(col("g"), col("n_events"), col("p_lo"), col("p_hi"))
      .agg(
        sum(when(col("v") < col("p_lo"), 1L).otherwise(0L)).as("n_clip_low"),
        sum(when(col("v") > col("p_hi"), 1L).otherwise(0L)).as("n_clip_high"),
        sum(greatest(least(col("v"), col("p_hi")), col("p_lo"))
          .cast("decimal(20,6)")).cast("double").as("winsor_sum"))
  }

  /** Per-group ordinary-least-squares trend of `valCol` against event
    * time — the metric-drift regression an ops pipeline fits per
    * series. Emits the EXACT rational coefficients as (numerator,
    * denominator) digit strings instead of a divided float: slope =
    * slope_num/slope_den, intercept-at-epoch0 = icept_num/slope_den.
    * Inputs are integerized first (x = whole seconds since `epoch0Sec`,
    * y quantized to micro-units via floor(v·1e6 + 0.5) — the binary-
    * exact cross-engine rounding), then the five OLS sums fold in
    * DECIMAL(38,0), so no accumulation order or division rounding can
    * differ between engines; consumers divide at whatever precision
    * they need. Pick `epoch0Sec` near the data's start: the closed-form
    * numerators carry Σy·Σx² ≈ n²·ȳ·x̄² which must stay under 38
    * digits — a corpus-distant epoch inflates x̄ for no information.
    *
    * Scale: one partial-agg groupBy pass over the events, nothing
    * else — the cheapest possible shape. Output: (group, n_events,
    * slope_num, slope_den, icept_num). */
  def linearTrend(events: DataFrame, keyCol: String, valCol: String,
                  epoch0Sec: Long): DataFrame =
    trendFromPoints(trendPoints(events, keyCol, valCol, epoch0Sec), keyCol)

  /** Binary-exact micro-unit quantization — floor(v·1e6 + 0.5) as
    * BIGINT, the one rounding both engines compute bit-identically.
    * EVERY value-quantizing operator in this family must route through
    * this single definition (trend, outliers, Benford): the
    * cross-engine oracles rely on all call sites quantizing
    * identically. */
  private def microQuant(valCol: String): Column =
    expr(s"CAST(floor($valCol * 1000000 + 0.5D) AS BIGINT)")

  /** Whole seconds since `epoch0Sec` — the trend family's shared x. */
  private def epochX(epoch0Sec: Long): Column =
    expr("ts_us div 1000000") - lit(epoch0Sec)

  /** [[linearTrend]] stage 1: the integerized (g, x, yq) points —
    * split out so the streaming twin can feed the IDENTICAL points
    * through the same sum/projection stage. */
  def trendPoints(events: DataFrame, keyCol: String, valCol: String,
                  epoch0Sec: Long): DataFrame =
    events.select(col(keyCol).as("g"), epochX(epoch0Sec).as("x"),
      microQuant(valCol).as("yq"))

  /** [[linearTrend]] stage 2: five DECIMAL(38,0) sums (one partial-agg
    * pass; in streaming complete mode the same sums fold in the state
    * store) + the closed-form num/den projection. */
  def trendFromPoints(pts: DataFrame, outKey: String): DataFrame = {
    val dec = "decimal(38,0)"
    trendCoeffs(pts).select(
      col("g").as(outKey), col("n").cast("long").as("n_events"),
      col("num").cast(dec).cast("string").as("slope_num"),
      col("den").cast(dec).cast("string").as("slope_den"),
      col("icept").cast(dec).cast("string").as("icept_num"))
  }

  /** The OLS closed-form coefficients as DECIMAL columns
    * (g, n, num, den, icept) — slope = num/den, intercept-at-epoch0 =
    * icept/den. Shared by [[trendFromPoints]] (digit-string emission)
    * and [[trendOutliers]] (residual arithmetic). */
  def trendCoeffs(pts: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    pts.groupBy(col("g")).agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).cast(dec).as("sx"),
        sum(col("yq").cast(dec)).cast(dec).as("sy"),
        sum(col("x").cast(dec) * col("yq")).cast(dec).as("sxy"),
        sum(col("x").cast(dec) * col("x")).cast(dec).as("sxx"))
      .select(col("g"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast(dec).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast(dec).as("den"),
        (col("sy") * col("sxx") - col("sx") * col("sxy")).cast(dec).as("icept"))
  }

  /** Top-k trend-residual outliers per series: the events farthest from
    * their series' own OLS fit — the "which points broke the trend"
    * follow-up to [[linearTrend]]. The fitted value is quantized to
    * micro-units by an EXACT floor division — `(fn − pmod(fn, den)) div
    * den`, which both engines compute identically for either sign of
    * `fn` (pmod is non-negative, the remaining division is exact) —
    * so residual = yq − fitted is a plain BIGINT and the top-k cut can
    * never straddle an engine rounding difference. Degenerate series
    * (den = 0: fewer than 2 distinct x) carry no trend and are
    * excluded.
    *
    * Scale: coefficients are one partial-agg pass folded to a
    * groups-row frame (broadcast back); the per-series top-k is
    * [[Rank.groupedTopK]]'s bounded-heap two-phase — no
    * one-task-per-series sort at any series size. Output: (group, rk,
    * id, x, yq, resid). */
  def trendOutliers(events: DataFrame, keyCol: String, valCol: String,
                    idCol: String, epoch0Sec: Long, k: Int = 5): DataFrame = {
    val pts = events.select(col(keyCol).as("g"), col(idCol).as("id"),
      epochX(epoch0Sec).as("x"), microQuant(valCol).as("yq"))
    val cf = trendCoeffs(pts.drop("id")).filter(col("den") =!= 0)
      .select(col("g").as("__cg"), col("num"), col("den"), col("icept"))
    val resid = pts.join(broadcast(cf), col("g") === col("__cg"))
      .withColumn("__fn", col("num") * col("x") + col("icept"))
      .withColumn("fitted_q",
        expr("CAST((__fn - pmod(__fn, den)) div den AS BIGINT)"))
      .select(col("g"), col("id"), (col("yq") - col("fitted_q")).as("resid"))
    // the signed residual rides the heap as payload (ranked by |resid|),
    // so the join-back only recovers (x, yq) against the SCAN-side pts
    // projection — the coefficient aggregation pass runs exactly once
    Rank.groupedTopK(resid, col("g"), col("id"), abs(col("resid")), k,
        payload = col("resid"))
      .select(col("g"), col("id").as("__ti"), col("pl").as("resid"),
        col("rk"))
      .join(pts.withColumnRenamed("id", "__ti"), Seq("g", "__ti"))
      .select(col("g"), col("rk"), col("__ti").as("id"), col("x"),
        col("yq"), col("resid"))
  }

  /** Benford first-significant-digit audit per group — the classic
    * fabricated-data / unit-mix alarm for positive, scale-spanning
    * measures. Digits come from the INTEGER micro-unit quantization
    * (first char of the BIGINT's decimal string — no float log10
    * anywhere), observed shares are exact integer ppm
    * (`n_d·1e6 div n`), and the Benford expectations ride as literal
    * ppm constants (round(log10(1+1/d)·1e6) — shared between engines
    * by VALUE). Non-positive values carry no leading digit and are
    * excluded. One partial-agg pass + a 9-row-per-group reshape.
    * Output: (group, digit, n_obs, obs_ppm, exp_ppm, dev_ppm). */
  def benford(events: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val expPpm = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
      9 -> 45757L)
    val digits = events
      .select(col(keyCol).as("g"), microQuant(valCol).as("yq"))
      .filter(col("yq") > 0)
      .withColumn("digit",
        substring(col("yq").cast("string"), 1, 1).cast("int"))
    val perDigit = digits.groupBy(col("g"), col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val totals = digits.groupBy(col("g").as("__tg"))
      .agg(count(lit(1)).as("__n"))
    val expCol = expPpm.foldLeft(lit(null).cast("long")) {
      case (acc, (d, p)) => when(col("digit") === d, p).otherwise(acc) }
    perDigit.join(broadcast(totals), col("g") === col("__tg"))
      .select(col("g"), col("digit"), col("n_obs"),
        expr("n_obs * 1000000 div __n").as("obs_ppm"),
        expCol.as("exp_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the value
    * distributions of two groups, over a CENTI-UNIT binned spine:
    * D = max over bins of |F_a − F_b| computed as the exact integer
    * cross-multiply `|cumA·nB − cumB·nA|` (the q_binary_auc
    * discipline — no per-bin float division anywhere), reported in ppm
    * with one final DECIMAL floor division. Binning to cents makes the
    * statistic exactly the KS of the binned distributions — the
    * spine is value-range-bounded (≤ range·100 rows), so the
    * unpartitioned cum window is corpus-size-independent BY
    * CONSTRUCTION, not an accident of test scale. The bin itself is
    * `floor(v·100)` — one IEEE multiply + floor, bit-identical in both
    * engines. Output: one row (n_a, n_b, ks_ppm, at_bin) where at_bin
    * is the smallest bin attaining the max. */
  def ksDrift(events: DataFrame, keyCol: String, valCol: String,
              groupA: String, groupB: String): DataFrame = {
    val dec = "decimal(38,0)"
    val binned = events
      .filter(col(keyCol) === groupA || col(keyCol) === groupB)
      .select(col(keyCol).as("g"),
        expr(s"CAST(floor($valCol * 100D) AS BIGINT)").as("b"))
    // the cum window's frame is |distinct cent bins| — value-range-
    // bounded by construction; the guard enforces the contract (2^22
    // bins ≈ a 42k-unit value span) so a wild valCol fails loudly
    // instead of single-tasking a corpus-sized frame
    val cells = BoundedFrame.enforce(binned.groupBy(col("b")).agg(
      sum(when(col("g") === groupA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("g") === groupB, 1L).otherwise(0L)).as("cb")),
      1L << 22, "ksDrift cent bins")
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val totals = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(totals))
      // an absent sample has no CDF — emit nothing rather than divide
      // by zero
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("diff", abs(col("cuma").cast(dec) * col("nb") -
        col("cumb").cast(dec) * col("na")).cast(dec))
      .orderBy(col("diff").desc, col("b"))
      .limit(1)
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        expr(s"CAST((CAST(diff AS $dec) * 1000000) div (CAST(na AS $dec) * nb) AS BIGINT)")
          .as("ks_ppm"),
        col("b").as("at_bin"))
  }

  /** Kaplan–Meier survival curve for time-to-first qualifying event:
    * per user, duration (whole days) from their first event to their
    * first event satisfying `eventPred`, right-censored at their last
    * event when none qualifies. The curve is emitted in LOG domain —
    * log S(t) = Σ_{tᵢ≤t} ln(1 − dᵢ/nᵢ) with each per-day term
    * ln((nᵢ−dᵢ)/nᵢ) rounded to 6 dp before a DECIMAL(20,6) cumulative
    * sum (the q_unigram_logprob discipline: one transcendental per
    * term, quantized pre-sum, so both engines' doubles agree
    * bit-for-bit). Once the risk set is exhausted by events
    * (S(t) = 0), log-survival is NULL from that day on.
    *
    * Scale: the per-user reduction is one partial-agg groupBy over the
    * raw events; everything after runs on the DAY-GRANULAR points
    * table (|distinct durations| rows — bounded by the corpus span in
    * days, corpus-size-independent), so the unpartitioned windows over
    * it are deliberate, not a hazard. Output: (day, n_event, n_cens,
    * at_risk, log_survival). */
  def kmSurvival(events: DataFrame, eventPred: Column): DataFrame =
    kmFromSpans(userSpans(events, eventPred))

  /** [[kmSurvival]] stage 1: the per-user observation span — first
    * event, last event, first QUALIFYING event (null if none). One
    * partial-agg pass; in streaming complete mode the same three
    * reductions (min/max/conditional-min) fold per user in the state
    * store, so the live twin drains this exact frame. */
  def userSpans(events: DataFrame, eventPred: Column): DataFrame =
    events.groupBy(col("user_id")).agg(
      min(col("ts_us")).as("t0"),
      max(col("ts_us")).as("t1"),
      min(when(eventPred, col("ts_us"))).as("te"))

  /** [[kmSurvival]] stage 2: durations, day-granular risk sets, and
    * the 6-dp-quantized log-survival cumsum, over the spans frame. */
  def kmFromSpans(u: DataFrame): DataFrame = {
    val d = u.select(
      expr("(coalesce(te, t1) - t0) div 86400000000").as("dur"),
      when(col("te").isNotNull, 1L).otherwise(0L).as("ev"))
    // the two cum windows run over |distinct whole-day durations| —
    // bounded by the corpus SPAN in days, not its size; the guard
    // (1e6 days ≈ 2.7 millennia) enforces that day-granularity
    // contract against a refactor to finer buckets
    val pts = BoundedFrame.enforce(d.groupBy(col("dur")).agg(
      sum(col("ev")).as("n_event"),
      (count(lit(1)) - sum(col("ev"))).as("n_cens")),
      1000000L, "kmSurvival day points")
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rs = pts.withColumn("at_risk",
      sum(col("n_event") + col("n_cens")).over(wDesc))
    val lg = rs
      .withColumn("l6",
        when(col("n_event") === 0 || col("at_risk") === col("n_event"),
          lit(0).cast("decimal(20,6)"))
          .otherwise(round(log((col("at_risk") - col("n_event"))
            .cast("double") / col("at_risk").cast("double")), 6)
            .cast("decimal(20,6)")))
      .withColumn("hit0",
        when(col("at_risk") === col("n_event"), 1L).otherwise(0L))
    lg.withColumn("ls", sum(col("l6")).over(wAsc).cast("decimal(20,6)"))
      .withColumn("z", sum(col("hit0")).over(wAsc))
      .select(col("dur").as("day"), col("n_event"), col("n_cens"),
        col("at_risk"),
        when(col("z") > 0, lit(null).cast("double"))
          .otherwise(col("ls").cast("double")).as("log_survival"))
  }
}
