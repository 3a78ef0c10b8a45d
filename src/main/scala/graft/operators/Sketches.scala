package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sketch / approximate-aggregate operators — the bounded-memory
  * summaries a 100 TB pipeline leans on when the exact answer would
  * shuffle the full key universe. The reference's nearest concept is
  * the CRC64 checksum (`checksum/checksum.go:25-29`): a tiny
  * order-invariant digest standing in for the full dataset. Each
  * operator here generalizes that idea — a fixed-size commutative
  * summary, mergeable across partitions — and each is built from
  * md5-derived integer hashing so the DuckDB oracle replays the result
  * bit-for-bit (no engine-private RNG, no float summation order).
  *
  * Scale design (100 TB):
  *  - KMV: only `partitions × k` longs ever cross the wire — the
  *    per-partition pass keeps a bounded k-smallest set, so the
  *    estimate costs a scan plus a trivial shuffle regardless of NDV;
  *  - count-min: the sketch is `d × w` counters built by map-side
  *    partial aggregation; point queries touch d cells. The exact
  *    top-k twin in the query exists to *verify* the sketch, not to
  *    replace it;
  *  - Bloom-filtered join: the classic runtime row filter — the fact
  *    side is pruned by a broadcast m-bit filter BEFORE the join
  *    shuffle, with zero false negatives by construction;
  *  - priority sampling: a weight-proportional fixed-size sample via
  *    a per-row priority — a distributed top-k (TakeOrdered), no
  *    global sort, no rejection loop.
  */
object Sketches {

  /** 60-bit uniform hash with a salt prefix, shared with the oracle
    * (`substr(md5(salt || key), 1, 15)` parsed base-16). */
  private def saltedHash60(salt: String, key: Column): Column =
    Dedup.md5Hash60(concat(lit(salt), key.cast("string")))

  // ---------------------------------------------------------------- KMV

  /** K-minimum-values distinct-count estimate (Bar-Yossef et al.):
    * hash every key to a 60-bit uniform, keep the k smallest DISTINCT
    * hash values; if fewer than k exist the count is exact, else
    * NDV ≈ (k-1) * 2^60 / kth_smallest.
    *
    * The first pass is a bounded per-partition sketch (a size-k
    * TreeSet per partition — `mapPartitions`, constant memory), so the
    * shuffle that merges partials moves at most `partitions × k`
    * longs. The estimate arithmetic runs in IEEE double from exactly
    * the same integer inputs in both engines, so `floor` of it is
    * deterministic. Output: one row (k_used, kth_hash, est_ndv). */
  def kmvDistinct(df: DataFrame, key: Column, k: Int): DataFrame = {
    val km = kmins(df, key, k)
    km.agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(kmvEstimate(k, col("kth_hash")))
          .as("est_ndv"))
  }

  /** The k smallest DISTINCT salted hashes of `key` — the KMV sketch
    * itself, as a ≤k-row frame. Bounded per-partition TreeSets first,
    * so the shuffle moves at most `partitions × k` longs. */
  private def kmins(df: DataFrame, key: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df.select(saltedHash60("kmv_", key).as("h")).as[Long]
    val partial = hashes.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { h =>
        if (set.size < k) set.add(h)
        else if (h < set.last()) { set.add(h); if (set.size > k) set.pollLast() }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator())
        .asScala.map(_.longValue())
    }
    partial.toDF("h").distinct().orderBy(col("h")).limit(k)
  }

  private def kmvEstimate(k: Int, kthHash: Column): Column = {
    val two60 = math.pow(2.0, 60) // 2^60 is exact in double
    // (k-1)·2^60 is an exact double (tiny mantissa), so both engines
    // compute the identical literal before the one IEEE division
    floor(lit((k - 1).toDouble) * lit(two60) / kthHash.cast("double"))
      .cast("long")
  }

  /** KMV sketch SET OPERATIONS — estimate |A ∪ B| and |A ∩ B| from two
    * bounded sketches WITHOUT ever joining the corpora (Beyer et al.,
    * "On synopses for distinct-value estimation under multiset
    * operations", SIGMOD'07): the k smallest hashes of A ∪ B are the k
    * smallest of kmins(A) ∪ kmins(B), so the union sketch merges two
    * ≤k-row frames; within it, the fraction ρ of hashes present in
    * BOTH sides' sketches estimates Jaccard, and |A∩B| ≈ ρ·|A∪B|. The
    * cross-corpus overlap probe ("how contaminated is corpus B with
    * corpus A", "how far apart are the two clusters' key sets") at
    * O(partitions × k) shuffle cost — the estimation twin of the exact
    * [[graft.operators.Diff]]. When the true union is smaller than k
    * both estimates collapse to exact counts. Output: one row
    * (k_used, n_both, est_union, est_intersect). */
  def kmvSetOps(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
                k: Int): DataFrame = {
    val ka = kmins(a, aKey, k).localCheckpoint()
    val kb = kmins(b, bKey, k).localCheckpoint()
    val ku = ka.unionAll(kb).distinct().orderBy(col("h")).limit(k)
    val flagged = ku
      .join(ka.withColumn("ia", lit(1)), Seq("h"), "left")
      .join(kb.withColumn("ib", lit(1)), Seq("h"), "left")
    flagged
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"),
        sum(when(col("ia") === 1 && col("ib") === 1, 1L).otherwise(0L)).as("n_both"))
      .select(col("k_used"), col("n_both"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(kmvEstimate(k, col("kth_hash"))).as("est_union"))
      .select(col("k_used"), col("n_both"), col("est_union"),
        when(col("k_used") < k, col("n_both"))
          .otherwise(floor(col("n_both").cast("double") / col("k_used").cast("double")
            * col("est_union").cast("double")).cast("long"))
          .as("est_intersect"))
  }

  /** Per-group KMV distinct-count estimates: per-language /
    * per-source NDV dashboards at corpus scale. The per-partition pass
    * keeps the k smallest distinct hashes PER GROUP (a bounded TreeSet
    * per group key), so what shuffles is `partitions × groups × k`
    * longs — never the raw distinct-hash stream; the window then
    * re-ranks that reduced set globally per group. Same estimator
    * arithmetic as [[kmvDistinct]]. The group column must be a string.
    * Output: one row per group (g, k_used, kth_hash, est_ndv). */
  def kmvDistinctBy(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val partial = df.select(group.cast("string").as("g"),
        saltedHash60("kmv_", key).as("h"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val perGroup = scala.collection.mutable.Map
          .empty[String, java.util.TreeSet[java.lang.Long]]
        it.foreach { case (g, h) =>
          val set = perGroup.getOrElseUpdate(g, new java.util.TreeSet[java.lang.Long]())
          if (set.size < k) set.add(h)
          else if (h < set.last()) { set.add(h); if (set.size > k) set.pollLast() }
        }
        perGroup.iterator.flatMap { case (g, set) =>
          scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator())
            .asScala.map(h => (g, h.longValue()))
        }
      }
    val h = partial.toDF("g", "h").distinct()
    val ranked = h.withColumn("rn",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("h"))))
    val two60 = math.pow(2.0, 60)
    ranked.filter(col("rn") <= k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(col("g"), col("k_used"), col("kth_hash"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(two60) /
            col("kth_hash").cast("double")).cast("long"))
          .as("est_ndv"))
  }

  // ---------------------------------------------------- count-min sketch

  /** The count-min sketch of a token stream: `d` hash rows × `w`
    * buckets of occurrence counts. One explode + one grouped count —
    * fully map-side partial-aggregated; the result is `d*w` rows
    * (constant in corpus size). */
  def cmsSketch(items: DataFrame, item: Column, d: Int, w: Int): DataFrame = {
    val rows = (0 until d).map(j =>
      struct(lit(j).as("j"),
        pmod(saltedHash60(s"cms${j}_", item), lit(w.toLong)).as("bucket")))
    items.select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.j").as("j"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[cmsSketch]] over a PRE-AGGREGATED (item, weight) stream: each
    * input row contributes `weight` occurrences. Identical grid to
    * feeding the raw occurrences — sum of weights ≡ count of rows — so
    * an upstream per-item combine (the map-side-combine idiom: ship
    * counts, not occurrences) composes with the sketch for free. */
  def cmsSketchWeighted(items: DataFrame, item: Column, weight: Column,
                        d: Int, w: Int): DataFrame = {
    val rows = (0 until d).map(j =>
      struct(lit(j).as("j"),
        pmod(saltedHash60(s"cms${j}_", item), lit(w.toLong)).as("bucket")))
    items.select(explode(array(rows: _*)).as("rb"), weight.as("wt"))
      .groupBy(col("rb.j").as("j"), col("rb.bucket").as("bucket"))
      .agg(sum(col("wt")).as("cnt"))
  }

  /** Heavy hitters with a count-min upper-bound estimate: the exact
    * top-k items (the verification twin) joined against the sketch —
    * `cms_est = min over the d cells an item maps to`, which is ≥ the
    * true count (collisions only inflate). At scale the exact twin is
    * what you drop: the sketch is the survivable summary. Output:
    * (item, exact_cnt, cms_est) by falling exact count. */
  def cmsHeavyHitters(items: DataFrame, itemCol: Column, d: Int, w: Int,
                      topK: Int): DataFrame = {
    val it = items.select(itemCol.as("item"))
    cmsHeavyHittersFromSketch(cmsSketch(it, col("item"), d, w), it, d, w, topK)
  }

  /** The estimate stage of [[cmsHeavyHitters]] over an explicit counter
    * grid (j, bucket, cnt) — separated so MERGED sketches (per-wave
    * counters sum-folded elsewhere: counts are additive over any
    * partition of the rows, so Σ wave grids ≡ the one-shot grid) price
    * heavy hitters through the identical arithmetic. `items` feeds
    * only the exact-top-k twin column. */
  def cmsHeavyHittersFromSketch(cms: DataFrame, items: DataFrame,
                                d: Int, w: Int, topK: Int): DataFrame = {
    val it = items.select(col("item"))
    val exact = it.groupBy(col("item")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item")).limit(topK)
    exact
      .withColumn("j", explode(array((0 until d).map(lit): _*)))
      .withColumn("bucket",
        pmod(Dedup.md5Hash60(concat(lit("cms"), col("j").cast("string"),
          lit("_"), col("item").cast("string"))), lit(w.toLong)))
      .join(broadcast(cms), Seq("j", "bucket"))
      .groupBy(col("item"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("exact_cnt").desc, col("item"))
  }

  // ------------------------------------------------- Bloom-filtered join

  /** Typed OR-fold of Bloom bit positions into the m/64-word bitmap —
    * a Catalyst partial+final aggregate, so each task folds its
    * positions into ONE local buffer and the shuffle carries one
    * m/64-long array per partition (for m = 8192: 128 longs), never a
    * row per position. This is the build shape that survives a
    * billion-key dim side; the driver receives exactly one row. */
  private final class BloomWordsAgg(m: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](m / 64)
    def reduce(b: Array[Long], p: Long): Array[Long] = {
      b((p >>> 6).toInt) |= 1L << (p & 63); b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The one-row (words: array<bigint>) bitmap frame — exposed so the
    * plan shape (partial+final ObjectHashAggregate, no per-position
    * shuffle, no distinct) can be pinned by PlanShapeSpec. */
  def bloomWordsDf(dim: DataFrame, key: Column, m: Int, numHashes: Int): DataFrame = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val spark = dim.sparkSession
    import spark.implicits._
    dim.select(explode(array((0 until numHashes).map(j =>
        pmod(saltedHash60(s"bloom${j}_", key), lit(m.toLong))): _*)).as("p"))
      .as[Long]
      .select(new BloomWordsAgg(m).toColumn.name("words")).toDF()
  }

  /** Builds the m-bit Bloom bitmap of a key set: `numHashes` md5-salted
    * bit positions per key, OR-folded distributed by [[BloomWordsAgg]]
    * (partial+final; the only driver transfer is the single finished
    * m/64-word row — no position collect, no distinct shuffle).
    *
    * FPP-vs-bits contract: expected false-positive rate is
    * (1 − e^(−k·n/m))^k for n distinct keys — size with [[bloomParams]]
    * (m ≈ −n·ln(fpp)/ln²2, k ≈ (m/n)·ln 2). FPP only costs join work
    * (positives die in the join); correctness never depends on it. */
  def bloomBits(dim: DataFrame, key: Column, m: Int, numHashes: Int): Array[Long] =
    bloomWordsDf(dim, key, m, numHashes).head().getSeq[Long](0).toArray

  /** Expected false-positive probability of an (m, k) Bloom filter
    * holding n distinct keys. */
  def bloomFpp(n: Long, m: Int, k: Int): Double =
    math.pow(1 - math.exp(-k.toDouble * n / m), k)

  /** Smallest 64-aligned (m, k) meeting a target FPP for n keys —
    * m = ⌈−n·ln(fpp)/ln²2⌉ rounded up to a word, k = round((m/n)·ln 2),
    * the standard optimum. */
  def bloomParams(n: Long, fpp: Double): (Int, Int) = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n>0, 0<fpp<1; got n=$n fpp=$fpp")
    val ln2 = math.log(2)
    val mRaw = math.ceil(-n.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val mAligned = ((mRaw + 63) / 64) * 64
    // a wrapped Int here would SILENTLY deliver a far worse FPP (or a
    // negative array size) — refuse loudly and name the remedy
    require(mAligned <= Int.MaxValue - 63,
      s"bloomParams(n=$n, fpp=$fpp) needs m=$mAligned bits > Int.MaxValue — " +
        "partition the key space and build one filter per partition, or " +
        "accept a higher fpp")
    val m = mAligned.toInt
    (m, math.max(1, math.round(m.toDouble / n * ln2).toInt))
  }

  /** Membership predicate against a literal bitmap: all `numHashes`
    * bits set. Pure built-ins (element_at on two literal arrays +
    * bitwiseAND), so it stays inside whole-stage codegen — this is the
    * filter that runs on every fact row, it must be cheap. */
  def bloomMightContain(bits: Array[Long], key: Column, m: Int,
                        numHashes: Int): Column = {
    val words = lit(bits)
    val masks = lit((0 until 64).map(1L << _).toArray)
    (0 until numHashes).map { j =>
      val p = pmod(saltedHash60(s"bloom${j}_", key), lit(m.toLong))
      element_at(words, (p / 64).cast("int") + 1)
        .bitwiseAND(element_at(masks, pmod(p, lit(64L)).cast("int") + 1)) =!= 0L
    }.reduce(_ && _)
  }

  /** Join with a Bloom runtime filter: the fact side is pre-filtered
    * by the dim side's bitmap before the join. False positives are
    * eliminated by the join itself; false negatives cannot occur, so
    * the result is EXACTLY the plain join's — which is what the
    * oracle checks. At 100 TB this is the difference between
    * shuffling every fact row and shuffling the ~selectivity× slice
    * that can possibly match. */
  def bloomFilteredJoin(fact: DataFrame, factKey: String,
                        dim: DataFrame, dimKey: String,
                        m: Int = 8192, numHashes: Int = 3): DataFrame = {
    val bits = bloomBits(dim, col(dimKey), m, numHashes)
    fact.filter(bloomMightContain(bits, col(factKey), m, numHashes))
      .join(broadcast(dim), col(factKey) === col(dimKey))
  }

  // ------------------------------------------------- priority sampling

  /** Weight-proportional fixed-size sample via priority sampling
    * (Duffield-Lund-Thorup): each row gets priority = weight / u for
    * a per-row uniform u, and the k highest-priority rows form the
    * sample. The uniform is the row's salted md5 hash quantized to 20
    * bits and the division is integer (`shift` keeps weight*2^20 in
    * range), so both engines order rows identically; ties (same
    * quantized priority) break on the key. A distributed top-k — no
    * global sort, no per-row state.
    *
    * `weightInt` must be a non-negative integral column (e.g. cents);
    * rows with weight 0 can never enter the sample. */
  def prioritySample(df: DataFrame, keyCol: String, weightInt: Column,
                     k: Int): DataFrame =
    df.select(col(keyCol), weightInt.as("w"))
      .withColumn("h", saltedHash60("ps_", col(keyCol)))
      .withColumn("priority",
        expr("(w * 1048576) div ((h div 1099511627776) + 1)"))
      .select(col(keyCol), col("w"), col("priority"))
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)

  /** PER-GROUP priority sampling — `n` weight-proportional rows per
    * group ([[prioritySample]] stratified), built scale-safe: priorities
    * are NOT uniform, so the hash-threshold prune that bounds
    * [[graft.operators.TextAnalysis.stratifiedSample]] doesn't apply;
    * instead phase 1 is a per-partition BOUNDED HEAP per group
    * (mapPartitions, ≤ n survivors per (partition, group) — constant
    * task memory), and phase 2 ranks the ≤ partitions·n·groups
    * survivors with the exact window. A giant group never one-task
    * sorts, and any per-group "top-n by arbitrary value" reduction
    * takes this same two-phase shape. Output:
    * (group, key, w, priority, rk ≤ n), deterministic — the same
    * (priority desc, key) order as the global sample. */
  def groupedPrioritySample(df: DataFrame, groupCol: Column, keyCol: String,
                            weightInt: Column, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the key rides the typed phase-1 kernel as a LONG (and the hash as
    // "ps_<key>"): a fractional or string key would silently alias or
    // null out under the cast, so the integral contract is enforced
    {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.schema(keyCol).dataType
      require(Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"groupedPrioritySample requires an integral key column, got $dt for $keyCol")
    }
    val base = df
      .select(groupCol.cast("string").as("g"),
        col(keyCol).cast("long").as("id"), weightInt.as("w"))
      .withColumn("h", saltedHash60("ps_", col("id")))
      .withColumn("p", expr("(w * 1048576) div ((h div 1099511627776) + 1)"))
      .select(col("g"), col("id"), col("w"), col("p"))
    // the bounded-heap two-phase reduction is [[Rank.groupedTopK]]
    // (multiset semantics, guarded insert, worst-at-head eviction) —
    // priorities rank, the weight rides as payload
    Rank.groupedTopK(base, col("g"), col("id"), col("p"), n,
        payload = col("w"))
      .select(col("g"), col("id"), col("pl").as("w"), col("v").as("p"),
        col("rk"))
  }

  // --------------------------------------------------------- HyperLogLog

  /** Integer bit length of a non-negative long column over at most
    * `maxBits` bits (bitLen(0) = 0), as ONE flat CASE of descending
    * power-of-two comparisons — no float log2 anywhere (floor(log2(w))
    * flips at ulp boundaries and is not portable). The oracle generates
    * the identical CASE. */
  private def bitLen(c: Column, maxBits: Int): Column = {
    // branches are evaluated in order — descending thresholds, so the
    // FIRST match is the highest set bit
    val first = when(c >= (1L << (maxBits - 1)), maxBits)
    (maxBits - 1 to 1 by -1).foldLeft(first) { (acc, b) =>
      acc.when(c >= (1L << (b - 1)), b)
    }.otherwise(0)
  }

  /** HyperLogLog registers (Flajolet et al. 2007) of `key` per group:
    * the 60-bit md5 hash splits into a p-bit bucket and a (60-p)-bit
    * suffix whose leading-zero rank (capped at `rhoCap` so the 2^-rho
    * register terms stay exactly representable in DECIMAL(38,30))
    * max-folds per bucket. Registers are the whole sketch: m integers
    * per group, mergeable by max — the canonical 100 TB NDV summary.
    * Output: (groupCols*, bucket, mj). */
  def hllRegisters(df: DataFrame, key: Column, group: Column,
                   p: Int = 10, rhoCap: Int = 30): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4,16]")
    require(rhoCap >= 1 && rhoCap <= 30, "rhoCap must fit DECIMAL(38,30)")
    val m = 1 << p
    val wBits = 60 - p
    val h = saltedHash60("hll:", key)
    val w = shiftright(h, p)
    val rho = least(lit(rhoCap), lit(wBits + 1) - bitLen(w, wBits))
    df.select(group.as("g"),
        h.bitwiseAND(lit((m - 1).toLong)).as("bucket"), rho.as("rho"))
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rho")).as("mj"))
  }

  /** Grouped HyperLogLog NDV estimate: the register sum Σ2^-Mj runs in
    * DECIMAL(38,30) — every term a power of two with ≤30 fractional
    * digits, so the sum is EXACT and summation-order-free; empty
    * buckets contribute 1 each (2^0) as a closed-form count. The final
    * float steps (α·m²/S, the small-range linear-counting correction
    * m·ln(m/V) when E ≤ 2.5m and V > 0) follow the family's ln recipe:
    * one arithmetic shape, 6-dp round, mirrored in the oracle. Output:
    * (group, n_buckets_used, sum_rho, est_ndv) — the integer register
    * state is gated exactly, not just the estimate. */
  def hllNdvBy(df: DataFrame, group: Column, key: Column,
               p: Int = 10, rhoCap: Int = 30): DataFrame =
    hllEstimate(hllRegisters(df, key, group, p, rhoCap), p)

  /** The estimate stage of [[hllNdvBy]] over an explicit register table
    * (g, bucket, mj) — separated so MERGED registers (per-shard
    * sketches max-folded elsewhere, e.g. across streaming micro-batches
    * or cluster snapshots) estimate through the identical arithmetic. */
  def hllEstimate(regs: DataFrame, p: Int = 10): DataFrame = {
    val m = 1 << p
    // embedded as one double literal on both sides — never re-derived
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    regs.groupBy(col("g"))
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(col("mj")).as("sum_rho"),
        sum(pow(lit(0.5), col("mj")).cast("decimal(38,30)")).as("s_used"))
      .select(col("g"), col("n_buckets_used"), col("sum_rho"),
        (col("s_used") + (lit(m) - col("n_buckets_used"))
          .cast("decimal(38,30)")).cast("double").as("s"),
        (lit(m) - col("n_buckets_used")).as("v"))
      .select(col("g"), col("n_buckets_used"), col("sum_rho"),
        round(
          when(lit(alphaM2) / col("s") <= lit(2.5 * m) && col("v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
            .otherwise(lit(alphaM2) / col("s")), 6).as("est_ndv"))
  }

  /** Pairwise set-OVERLAP estimates from HLL sketches — the
    * cross-source contamination/coverage scan at sketch cost: register
    * max-merge gives each pair's UNION sketch without touching the
    * data again (the same merge that folds shards/micro-batches), and
    * inclusion–exclusion |A∩B| ≈ E(A) + E(B) − E(A∪B) prices every
    * pair from |G|·m register rows instead of a per-pair key join.
    * The exact twin rides along (one distinct-pair token join — drop
    * it when the key space is the thing you can't afford), so the
    * estimate's error is visible in the gated output. est_overlap is
    * the raw IEEE difference of the three 6-dp-rounded estimates — no
    * re-rounding, so both engines emit the identical double. Output:
    * (ga < gb, est_a, est_b, est_union, est_overlap, exact_overlap). */
  def hllOverlap(df: DataFrame, group: Column, key: Column,
                 p: Int = 10, rhoCap: Int = 30): DataFrame = {
    val keyed = df.select(group.as("g"), key.as("t"))
    hllOverlapFromRegisters(
      hllRegisters(keyed, col("t"), col("g"), p, rhoCap), keyed, p)
  }

  /** The pair/estimate stage of [[hllOverlap]] over an explicit
    * register table (g, bucket, mj) — separated so MERGED registers
    * (state-store-folded micro-batch sketches, per-shard snapshots)
    * price overlaps through the identical arithmetic. `keyed` (g, t)
    * feeds only the exact twin column. */
  def hllOverlapFromRegisters(regs: DataFrame, keyed: DataFrame,
                              p: Int = 10): DataFrame = {
    val gl = regs.select(col("g")).distinct()
    val gp = gl.select(col("g").as("ga"))
      .crossJoin(broadcast(gl.select(col("g").as("gb"))))
      .filter(col("ga") < col("gb"))
    val exact = keyed.distinct()
    val ex = exact.join(broadcast(gp), col("g") === col("ga"))
      .select(col("ga"), col("gb"), col("t"))
      .join(exact.select(col("g").as("g2"), col("t").as("t2")),
        col("g2") === col("gb") && col("t") === col("t2"))
      .groupBy(col("ga"), col("gb"))
      .agg(count_distinct(col("t")).as("exact_overlap"))
    hllOverlapEstimates(regs, p)
      .join(ex, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
        col("est_union"), col("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
  }

  /** Register-ONLY pairwise overlap pricing — the stage that makes the
    * sketch worth carrying at 100 TB: everything here reads the |G|·m
    * register table alone, so once the registers are built (one corpus
    * scan, or a max-merge of persisted shards — see
    * [[hllOverlapFromRegisters]]'s callers) every pair is priced
    * WITHOUT re-touching the token table. Checkpoint the register
    * frame before calling (the gated entry does) and the resulting
    * plan contains no corpus scan at all — PlanShapeSpec pins it.
    * Output: (ga < gb, est_a, est_b, est_union, est_overlap); the
    * exact-twin column rides only on [[hllOverlapFromRegisters]],
    * whose gate keeps the estimate error visible. */
  def hllOverlapEstimates(regs: DataFrame, p: Int = 10): DataFrame = {
    val per = hllEstimate(regs, p).select(col("g"), col("est_ndv"))
    // broadcast BOTH the group-list cross (|G| rows — an un-hinted
    // non-equi join over a corpus-descended aggregate can fall back to
    // CartesianProduct once size estimates grow) and the pair frame
    val gl = regs.select(col("g")).distinct()
    val gp = gl.select(col("g").as("ga"))
      .crossJoin(broadcast(gl.select(col("g").as("gb"))))
      .filter(col("ga") < col("gb"))
    // every register row feeds each pair its group participates in —
    // |G|−1 replicas per row, broadcast pair list, then the max-merge
    val u = regs.join(broadcast(gp),
        col("g") === col("ga") || col("g") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("bucket")).agg(max(col("mj")).as("mj"))
    // the union estimate keys by the (ga, gb) STRUCT — a delimiter
    // concat would collide for group names containing the delimiter
    // and silently merge two pairs' registers
    val estU = hllEstimate(
        u.select(struct(col("ga"), col("gb")).as("g"),
          col("bucket"), col("mj")), p)
      .select(col("g.ga").as("ga"), col("g.gb").as("gb"),
        col("est_ndv").as("est_union"))
    gp.join(estU, Seq("ga", "gb"))
      .join(per.select(col("g").as("g_a"), col("est_ndv").as("est_a")),
        col("ga") === col("g_a"))
      .join(per.select(col("g").as("g_b"), col("est_ndv").as("est_b")),
        col("gb") === col("g_b"))
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_overlap"))
  }

  // ------------------------------------------------------ exact bitmaps

  /** Block-sparse bitmap WORDS (g, blk, w): each 64-bit word records
    * which of ids [64·blk, 64·blk+63] were seen, OR-merged. The exact
    * twin of the HLL registers: words merge by `bit_or` across shards /
    * micro-batches / snapshots, and the partial aggregate combines
    * map-side — so the shuffle carries one word per POPULATED BLOCK per
    * task instead of one row per distinct (g, id) the way
    * `count_distinct`'s expand does: up to 64× less for dense id
    * domains (Druid/ClickHouse ship the same structure as roaring
    * bitmaps). Block index is floor-division (truncating `div` would
    * disagree with `pmod` on negatives and alias id −1 onto id 63). */
  def bitmapWords(df: DataFrame, gCol: Column, idCol: Column): DataFrame =
    df.select(gCol.as("g"), idCol.cast("long").as("id"))
      .groupBy(col("g"),
        expr("(id - pmod(id, 64)) div 64").as("blk"))
      .agg(bit_or(expr("shiftleft(1L, CAST(pmod(id, 64) AS INT))")).as("w"))

  /** Popcount reduction of a word table to exact (g, ndv) — the same
    * estimate stage whether the words came from one batch pass or a
    * streaming state store (the oracle is the plain count(distinct),
    * making the gate the bitmap-equals-naive proof). */
  def bitmapEstimate(words: DataFrame): DataFrame =
    words.groupBy(col("g"))
      .agg(sum(bit_count(col("w"))).cast("long").as("ndv"))

  /** Exact grouped distinct count through the bitmap: one shuffle of
    * block words, one popcount fold. */
  def bitmapDistinct(df: DataFrame, gCol: Column, idCol: Column): DataFrame =
    bitmapEstimate(bitmapWords(df, gCol, idCol))

  /** Mergeable QUANTILE sketch — the equi-width histogram form: per
    * group, `buckets` fixed-width counters over the [min, max] value
    * range. The counter table IS the sketch: counters MERGE by plain
    * addition (shards, micro-batches, snapshots), memory is
    * groups×buckets regardless of row count, and the rank guarantee is
    * deterministic — the reported bucket's TRUE rank error is zero (the
    * quantile is bracketed by the bucket edges, value error ≤
    * range/buckets) rather than probabilistic like GK/KLL, at the price
    * of needing the (min, max) prepass those sketches avoid. Per
    * requested permille point: the first bucket where the running count
    * reaches ⌈q·n/1000⌉, with its [lo, hi) value bracket at 9 dp.
    * Everything ranks in exact integers; the only floats are the final
    * edge displays — the same IEEE multiply/divide in both engines.
    * Scale: one stats pass (broadcast back), one partial-agg counter
    * pass, then windows over the groups×buckets counter table ONLY.
    * Output: (g, q_permille, n, bucket, est_lo, est_hi). */
  def histQuantiles(df: DataFrame, gCol: Column, vCol: Column,
                    buckets: Int, qPermille: Seq[Int]): DataFrame = {
    val base = df.select(gCol.as("g"), vCol.cast("double").as("v"))
    val stats = histStats(base)
    histQuantilesFromCells(histCells(base, stats, buckets), stats,
      buckets, qPermille)
  }

  /** Per-group (min, max) value range for the histogram sketch. */
  def histStats(base: DataFrame): DataFrame =
    base.groupBy(col("g").as("__sg"))
      .agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))

  /** The COUNTER table (g, bucket, cnt) — the sketch itself. Counters
    * from shards / micro-batches / snapshots built against the SAME
    * stats merge by plain addition. NULL handling matches both engines'
    * quantile semantics: NULL values are NOT observations (dropped here,
    * so ranks never count them and bucket ordering can't diverge on the
    * engines' NULLS FIRST/LAST split), while a NULL GROUP is a real
    * group — the `<=>` join keeps its sketch (the [[Rank.cellRank]]
    * null-key discipline). */
  def histCells(base: DataFrame, stats: DataFrame, buckets: Int): DataFrame =
    base.filter(col("v").isNotNull)
      .join(broadcast(stats), col("g") <=> col("__sg"))
      .withColumn("bucket",
        when(col("__hi") > col("__lo"),
          least(lit(buckets - 1L),
            floor((col("v") - col("__lo")) / (col("__hi") - col("__lo")) * buckets)))
        .otherwise(lit(0L)))
      .groupBy(col("g"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Population Stability Index drift monitor — the production
    * data/feature-drift alarm (the credit-scoring PSI, standard
    * monitoring for a pipeline feeding models): per group, the LIVE
    * value distribution scored against a REFERENCE distribution over
    * the reference's own bucket geometry,
    * PSI = Σ_b (p_b − q_b) · ln(p_b / q_b), with Laplace-smoothed
    * shares p_b = (ref_b + 1)/(n_ref + buckets) (an empty bucket on
    * either side must not produce ln 0). Rule-of-thumb thresholds:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 act.
    *
    * The geometry is pinned by the REFERENCE alone — live values
    * outside the reference range clamp into the edge buckets (the
    * two-sided clamp [[histCells]] doesn't need, because there stats
    * come from the same data). Live-side groups with no reference get
    * no score: drift is relative to a baseline by definition.
    *
    * Cross-engine determinism: counts are exact integers; each
    * bucket's term does ONE double chain (two IEEE divisions, ln,
    * multiply — bit-identical on both engines), rounds to 6 dp, and
    * the per-group sum runs in DECIMAL — the
    * [[graft.operators.TextAnalysis.unigramLogProb]] log-sum recipe,
    * so summation order can't bite.
    *
    * Same split as the quantile sketches: [[psiCells]] is one grouped
    * count (map-side partial; the counter table is groups×buckets and
    * merges by addition — micro-batches sum in the state store, which
    * is what the streaming twin does), [[psiFromCells]] scores over
    * counter tables only. Output: (g, n_ref, n_live, psi). */
  def psiDrift(ref: DataFrame, live: DataFrame, gCol: Column, vCol: Column,
               buckets: Int): DataFrame = {
    val rBase = ref.select(gCol.as("g"), vCol.cast("double").as("v"))
    val lBase = live.select(gCol.as("g"), vCol.cast("double").as("v"))
    val stats = histStats(rBase.filter(col("v").isNotNull))
    psiFromCells(psiCells(rBase, stats, buckets),
      psiCells(lBase, stats, buckets), buckets)
  }

  /** The drift counter table (g, bucket, cnt) over a PINNED reference
    * geometry — [[histCells]] with the two-sided clamp live data needs
    * (values outside the reference range land in the edge buckets). */
  def psiCells(base: DataFrame, stats: DataFrame, buckets: Int): DataFrame =
    base.filter(col("v").isNotNull)
      .join(broadcast(stats), col("g") <=> col("__sg"))
      .withColumn("bucket",
        when(col("__hi") > col("__lo"),
          greatest(lit(0L), least(lit(buckets - 1L),
            floor((col("v") - col("__lo")) / (col("__hi") - col("__lo")) * buckets))))
        .otherwise(lit(0L)))
      .groupBy(col("g"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The scoring stage over explicit ref/live counter tables — merged
    * (e.g. state-store-summed) live counters score through the
    * identical arithmetic, so the streaming twin shares this stage. */
  def psiFromCells(refCells: DataFrame, liveCells: DataFrame,
                   buckets: Int): DataFrame = {
    require(buckets >= 2, "need buckets >= 2")
    val rc = refCells.select(col("g"), col("bucket"), col("cnt").as("rc"))
    val lc = liveCells.select(col("g"), col("bucket"), col("cnt").as("lc"))
    val rn = rc.groupBy(col("g").as("__rg")).agg(sum(col("rc")).as("n_ref"))
    val ln_ = lc.groupBy(col("g").as("__lg")).agg(sum(col("lc")).as("n_live"))
    rc.join(lc, Seq("g", "bucket"), "full_outer")
      .select(col("g"), col("bucket"),
        coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("lc"), lit(0L)).as("lc"))
      .join(broadcast(rn), col("g") <=> col("__rg"), "inner")
      .join(broadcast(ln_), col("g") <=> col("__lg"), "left")
      .select(col("g"), col("n_ref"),
        coalesce(col("n_live"), lit(0L)).as("n_live"),
        round(
          ((col("rc") + 1).cast("double") / (col("n_ref") + buckets).cast("double")
            - (col("lc") + 1).cast("double") / (coalesce(col("n_live"), lit(0L)) + buckets).cast("double"))
          * log(((col("rc") + 1).cast("double") / (col("n_ref") + buckets).cast("double"))
            / ((col("lc") + 1).cast("double") / (coalesce(col("n_live"), lit(0L)) + buckets).cast("double"))),
          6).as("term"))
      .groupBy(col("g"), col("n_ref"), col("n_live"))
      .agg(round(sum(col("term").cast("decimal(20,6)")).cast("double"), 6)
        .as("psi"))
  }

  /** RANK-error quantile sketch — the [[histQuantiles]] twin for
    * heavy-tailed values, where the equi-width histogram's value-error
    * bound (range/buckets) degrades: a per-slot-minimum coordinated
    * sample. Each row hashes (by a row id, so duplicate values stay
    * independent observations) into one of `k` slots; the sketch keeps
    * per (group, slot) the row with the MINIMUM hash — the KMV/HLL
    * register discipline applied to quantiles (bottom-1-of-k stochastic
    * averaging): k registers per group regardless of n, and registers
    * MERGE by plain min, so shards / micro-batches / snapshots fold
    * with no order sensitivity. The occupied slots form a near-uniform
    * row sample; the reported quantile is the sample's own order
    * statistic, with rank error O(√(q(1−q)/k)) — independent of the
    * VALUE distribution, which is exactly what the histogram form
    * cannot offer. (~1.6% standard rank error at k=1024.)
    *
    * Why not a literal KLL or t-digest: their compactions are
    * randomized (KLL) or merge-order-sensitive (t-digest centroids),
    * which breaks both the cross-engine bit-exact oracle contract and
    * the shard-merge-invariance gate this library holds every sketch
    * to. The slot-minimum sample buys canonical state — the sketch is
    * a pure function of the row SET — at the cost of KLL's tighter
    * constants per byte.
    *
    * Same two-stage split as the histogram ([[hllEstimate]] pattern):
    * [[slotSampleCells]] is ONE grouped min aggregation (map-side
    * partial, shuffle carries groups×k rows); the estimate stage
    * windows over the cell table only. NULL values are not
    * observations; a NULL group keeps its sketch ([[histCells]]'
    * discipline). Output: (g, q_permille, m_slots, est_v). */
  def slotSampleQuantiles(df: DataFrame, gCol: Column, vCol: Column,
                          idCol: Column, k: Int,
                          qPermille: Seq[Int]): DataFrame = {
    val base = df.select(gCol.as("g"), vCol.cast("double").as("v"),
      idCol.cast("string").as("id"))
    slotSampleQuantilesFromCells(slotSampleCells(base, k), qPermille)
  }

  /** The REGISTER table (g, slot, hv, v) — the sketch itself. Cells
    * from shards / micro-batches built with the same k merge by
    * re-running the identical min fold ([[slotSampleQuantiles]] doc). */
  def slotSampleCells(base: DataFrame, k: Int): DataFrame = {
    require(k >= 16, "need k >= 16 slots")
    base.filter(col("v").isNotNull)
      .select(col("g"),
        graft.operators.Dedup.md5Hash60(col("id")).as("h"), col("v"))
      .groupBy(col("g"), pmod(col("h"), lit(k.toLong)).as("slot"))
      .agg(min(struct(col("h").as("hv"), col("v"))).as("mn"))
      .select(col("g"), col("slot"), col("mn.hv").as("hv"), col("mn.v").as("v"))
  }

  /** Persist one wave of slot-sample quantile REGISTERS through
    * [[SketchStore]] — the fourth persisted family. A register's value
    * is a PAIR (hv, v) ordered lexicographically, which no scalar
    * per-cell monoid can merge, so each register writes TWO cell
    * planes — slot·2 carries hv, slot·2+1 the IEEE-754 bits of v (the
    * codegen'd [[graft.functions.DoubleBits]] bijection — bit-exact,
    * no decimal roundtrip) — and the cross-wave merge reassembles
    * pairs per wave and re-runs the sketch's OWN min-by-(hv, v) fold
    * ([[slotSampleCellsFromStore]]), exactly how shard merges already
    * work. Wave ids, double-count refusal, atomic generations and
    * [[SketchStore.compactWaves]]-style lifetimes all ride the store
    * unchanged. */
  def slotSampleCellsPersist(cells: DataFrame, table: String, wave: String,
                             mode: String): Unit = {
    // the sketch PRESERVES a NULL group ([[histCells]]' discipline) but
    // the store's key grammar cannot carry one — encode: "n" = the null
    // group, "s"+g = a real group (injective, so a real group literally
    // named "n" never collides); [[slotSampleCellsFromStore]] decodes.
    // The encoding is part of this persisted family's FORMAT from its
    // introduction (round 12) — no table of unencoded slot-sample waves
    // exists on any deployment, so the decode needs no version stamp
    val gEnc = when(col("g").isNull, lit("n"))
      .otherwise(concat(lit("s"), col("g").cast("string")))
    SketchStore.writeWave(
      cells.select(gEnc.as("g"), (col("slot") * 2).as("slot"),
          col("hv").as("v"))
        .unionByName(cells.select(gEnc.as("g"),
          (col("slot") * 2 + 1).as("slot"),
          graft.functions.DoubleBits.doubleBits(col("v")).as("v"))),
      table, wave, mode)
  }

  /** Re-read EVERY persisted wave of quantile registers and fold them
    * with the sketch's own law: per (wave, g, slot) the two planes
    * reassemble to (hv, v), then min(struct(hv, v)) across waves — the
    * identical shard-merge fold, so the merged register table is
    * EXACTLY the one-shot [[slotSampleCells]] over the waves' union
    * (the persistence identity the gated entry proves). Output feeds
    * [[slotSampleQuantilesFromCells]] unchanged. */
  def slotSampleCellsFromStore(s: org.apache.spark.sql.SparkSession,
                               table: String): DataFrame =
    SketchStore.readCells(s, table)
      .select(col("wave"), col("g"), expr("slot DIV 2").as("slot"),
        (col("slot") % 2).as("plane"), col("v"))
      .groupBy(col("wave"), col("g"), col("slot"))
      .agg(max(when(col("plane") === 0, col("v"))).as("hv"),
        max(when(col("plane") === 1, col("v"))).as("vbits"))
      .select(
        // decode the persist encoding: "n" = NULL group, "s"+g = g
        when(col("g") === "n", lit(null).cast("string"))
          .otherwise(expr("substring(g, 2)")).as("g"),
        col("slot"), col("hv"),
        graft.functions.DoubleBits.bitsDouble(col("vbits")).as("v"))
      .groupBy(col("g"), col("slot"))
      .agg(min(struct(col("hv"), col("v"))).as("mn"))
      .select(col("g"), col("slot"), col("mn.hv").as("hv"), col("mn.v").as("v"))

  /** The estimate stage over an explicit register table (g, slot, hv,
    * v): per group the occupied-slot count m and, per requested
    * permille point (one broadcast q-table pass, the
    * [[histQuantilesFromCells]] shape), the sample row at rank
    * ⌈q·m/1000⌉ in (v, hv, slot) order. Windows run over groups×k rows
    * ONLY — never the data. */
  def slotSampleQuantilesFromCells(cells: DataFrame,
                                   qPermille: Seq[Int]): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q > 0 && q <= 1000),
      "need permille points in (0, 1000]")
    val spark = cells.sparkSession
    import spark.implicits._
    val m = cells.groupBy(col("g").as("__mg")).agg(count(lit(1)).as("m_slots"))
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v"), col("hv"), col("slot"))
    val qdf = qPermille.toDF("q_permille")
    cells.withColumn("rn", row_number().over(w))
      .join(broadcast(m), col("g") <=> col("__mg"))
      .crossJoin(broadcast(qdf))
      .filter(col("rn") ===
        expr("CAST(((q_permille * m_slots) + 999) div 1000 AS BIGINT)"))
      .select(col("g"), col("q_permille"), col("m_slots"), col("v").as("est_v"))
  }

  /** The estimate stage over an explicit counter table (g, bucket, cnt)
    * — separated (the [[hllEstimate]] pattern) so MERGED counters, e.g.
    * summed across streaming micro-batches, rank through the identical
    * arithmetic. `n` per group is Σ cnt — derived from the sketch, so a
    * merged sketch needs no side channel. */
  def histQuantilesFromCells(cells: DataFrame, stats: DataFrame,
                             buckets: Int, qPermille: Seq[Int]): DataFrame = {
    require(buckets >= 2 && qPermille.nonEmpty &&
      qPermille.forall(q => q > 0 && q <= 1000),
      "need buckets >= 2 and permille points in (0, 1000]")
    // running counts over the groups×buckets table only — never the data
    val w = Window.partitionBy(col("g")).orderBy(col("bucket"))
    val run = cells
      .withColumn("hi_rank", sum(col("cnt")).over(w))
      .withColumn("lo_rank", col("hi_rank") - col("cnt"))
    val n = cells.groupBy(col("g").as("__ng")).agg(sum(col("cnt")).as("n"))
    // ALL requested points ride ONE pass: a broadcast q-row table
    // cross-joined into the counter walk (a per-point union would
    // re-aggregate the counters once per point — one full input scan
    // each for the batch caller). Ceil on POSITIVE operands only —
    // Spark's `div` truncates while DuckDB's `//` floors, and they
    // agree exactly on non-negatives.
    val spark = cells.sparkSession
    import spark.implicits._
    val qdf = qPermille.toDF("q_permille")
    val target = expr("CAST(((q_permille * n) + 999) div 1000 AS BIGINT)")
    run.join(broadcast(n), col("g") <=> col("__ng"))
      .join(broadcast(stats), col("g") <=> col("__sg"))
      .crossJoin(broadcast(qdf))
      .filter(col("lo_rank") < target && target <= col("hi_rank"))
      .select(col("g"), col("q_permille"), col("n"), col("bucket"),
        round(col("__lo") + col("bucket") *
          ((col("__hi") - col("__lo")) / buckets), 9).as("est_lo"),
        round(col("__lo") + (col("bucket") + 1) *
          ((col("__hi") - col("__lo")) / buckets), 9).as("est_hi"))
  }
}
