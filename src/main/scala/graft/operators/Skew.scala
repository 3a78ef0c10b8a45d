package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utility for hot keys at 100 TB. AQE's skew-join
  * splitting covers sort-merge joins automatically; explicit salting is
  * the deterministic fallback when a handful of keys dominate (e.g. a
  * diff over a key space with one giant tombstone region, or an
  * inverted-index join on a hot shingle).
  *
  * `saltedJoin` is TWO-PATH: it first finds the left side's hot keys
  * (count ≥ `hotThreshold`, optionally from a seeded sample), then
  *  - salts ONLY the hot slice: hot left rows get `salt_id = hash(row)
  *    % salt`, hot right rows are exploded to all salt_ids, and the
  *    equi-join key becomes (key, salt_id) — a hot key's rows spread
  *    over `salt` reducers instead of one;
  *  - plain-joins everything else — the overwhelming bulk of a skewed
  *    dataset — with zero replication;
  * and unions the two. The round-3 form salted unconditionally, which
  * replicated the ENTIRE right side `salt`× for every key — at scale,
  * blanket 8× duplication of a large build side is itself the hazard
  * the operator exists to avoid. With no hot keys the plan degrades to
  * the plain join plus two broadcast anti-joins (near-free); the result
  * is the plain join's exactly, whichever path each key takes.
  *
  * The hot-key set is bounded by |left| / hotThreshold rows, so it
  * broadcasts by construction; it is materialized once (localCheckpoint)
  * because four routing joins consume it. */
object Skew {

  /** Left-side keys whose row count reaches `hotThreshold`, as a 1-column
    * frame. `sampleFraction` < 1 counts a seeded deterministic sample
    * instead of the full side (the 100 TB path — frequency estimation
    * needs no exact counts; the threshold scales with the fraction).
    * Which keys land here affects ROUTING only, never the join result. */
  def hotKeys(left: DataFrame, key: String, hotThreshold: Long,
              sampleFraction: Double = 1.0): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      "sampleFraction must be in (0, 1]")
    val (base, scaledThreshold) =
      if (sampleFraction >= 1.0) (left, hotThreshold)
      else (left.sample(withReplacement = false, sampleFraction, seed = 8675309L),
        math.max(1L, (hotThreshold * sampleFraction).toLong))
    base.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= scaledThreshold)
      .select(col(key))
  }

  /** Skew-aware equi-join on `key`; result equals `left.join(right,
    * Seq(key))` row-for-row. `hotThreshold` is the left-side row count at
    * which a key is salted (size it to a few reducer-tasks' worth of
    * rows); `sampleFraction` < 1 estimates frequencies from a sample. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 hotThreshold: Long = 1000000L,
                 sampleFraction: Double = 1.0): DataFrame =
    saltedJoin(left, right, key, salt,
      hotKeys(left, key, hotThreshold, sampleFraction))

  /** [[saltedJoin]] with a caller-supplied hot-key list (one column named
    * like `key`) — the "you already know the hot keys" form: at scale the
    * hot set is often known a priori (tombstone regions, header shingles)
    * and re-counting the fact side to discover it is wasted work. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 hotKeys: DataFrame): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val hot = broadcast(hotKeys.select(col(key)).localCheckpoint())
    val lHot = left.join(hot, Seq(key), "left_semi")
      .withColumn("__salt",
        pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt.toLong)))
    val rHot = right.join(hot, Seq(key), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0L), lit((salt - 1).toLong))))
    val salted = lHot.join(rHot, Seq(key, "__salt")).drop("__salt")
    // the anti side of RIGHT too: hot right rows can never match a
    // non-hot left row, so keeping them out of the plain join's shuffle
    // is free volume saved
    val plain = left.join(hot, Seq(key), "left_anti")
      .join(right.join(hot, Seq(key), "left_anti"), Seq(key))
    salted.unionAll(plain)
  }

  /** Pre-flight join-volume estimate — [[skewProfile]]'s sibling for
    * the BINARY question: before shuffling two 100 TB sides, how many
    * rows will `left ⋈ right` on `key` emit, and which keys dominate
    * the output? Exact per-key counts (two grouped aggregations, an
    * ndv-sized count join — never the data join itself) give
    * out_rows(k) = cnt_a·cnt_b and each key's share of the total
    * output in ppm; a single key owning a large share is the salted /
    * skew-split signal, a total far above both inputs is the
    * many-to-many red flag. NULL keys never match an equi-join and are
    * excluded (the profiler view of the null pile-up is
    * [[skewProfile]]'s job). All volume arithmetic — per-key products,
    * the total, ordering, shares — runs in DECIMAL(38,0): counts
    * overflow a long product exactly when the join is the disaster
    * this exists to catch; the reported `out_rows` long saturates at
    * Long.MaxValue (share_ppm and the ranking stay exact — a saturated
    * row still tops the list). Output: top-`topK` (key string, cnt_a,
    * cnt_b, out_rows, share_ppm) by output volume. */
  def joinHotspots(left: DataFrame, right: DataFrame, key: String,
                   topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be positive")
    def counts(df: DataFrame, as: String): DataFrame =
      df.filter(col(key).isNotNull)
        .groupBy(col(key).cast("string").as("key"))
        .agg(count(lit(1)).as(as))
    val m = counts(left, "cnt_a").join(counts(right, "cnt_b"), Seq("key"))
      .select(col("key"), col("cnt_a"), col("cnt_b"),
        (col("cnt_a").cast("decimal(38,0)") * col("cnt_b")).as("out_dec"))
    val tot = m.agg(sum(col("out_dec")).as("total"))
    m.crossJoin(broadcast(tot))
      .orderBy(col("out_dec").desc, col("key"))
      .limit(topK)
      .select(col("key"), col("cnt_a"), col("cnt_b"),
        least(col("out_dec"), lit(Long.MaxValue).cast("decimal(38,0)"))
          .cast("long").as("out_rows"),
        expr("CAST((out_dec * 1000000) div total AS BIGINT)").as("share_ppm"))
  }

  /** Join-key skew profile — the diagnostic that SIZES [[saltedJoin]]'s
    * knobs before a 100 TB run instead of discovering the straggler
    * task at hour three: the `topK` heaviest keys with their exact
    * count, corpus share (integer ppm), and `salt_rec` =
    * ceil(cnt · partitions / total) — the salt factor that spreads THIS
    * key's rows across reducers no fuller than the average one (1 means
    * "not worth salting": the key already fits a single reducer's fair
    * share). One grouped count + a 1-row broadcast total + a top-k —
    * the profile costs a single shuffle of (key, count) pairs at any
    * corpus size. NULL keys profile under the `nullLabel` sentinel (an
    * equi-join drops them, but a profiler must SHOW the null pile-up —
    * it is the most common real-world skew); pick a sentinel outside
    * the key domain if the default literal can legitimately occur as a
    * value, or the two piles merge. Output: (key string, cnt,
    * share_ppm, salt_rec), count-desc, key tie-break. */
  def skewProfile(df: DataFrame, key: String, topK: Int = 10,
                  partitions: Int = 32,
                  nullLabel: String = "<null>"): DataFrame = {
    require(topK >= 1 && partitions >= 1, "topK/partitions must be positive")
    val cnt = df
      .groupBy(coalesce(col(key).cast("string"), lit(nullLabel)).as("key"))
      .agg(count(lit(1)).as("cnt"))
    profileFromCounts(cnt, topK, partitions)
  }

  /** The scoring tail of [[skewProfile]] over an explicit (key, cnt)
    * frame — shared by the batch profiler and the streaming hot-key
    * monitor (whose counts live in the state store), so both score
    * through the identical stage. */
  def profileFromCounts(cnt: DataFrame, topK: Int,
                        partitions: Int): DataFrame = {
    require(topK >= 1 && partitions >= 1, "topK/partitions must be positive")
    val tot = cnt.agg(sum(col("cnt")).as("total"))
    cnt.crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"),
        expr("CAST(cnt * 1000000 div total AS BIGINT)").as("share_ppm"),
        expr(s"CAST((cnt * $partitions + total - 1) div total AS BIGINT)")
          .as("salt_rec"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
  }
}
