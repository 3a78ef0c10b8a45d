package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Two-phase DISTRIBUTED per-group rank statistics — the remedy for the
  * one-task-per-group sort that `row_number().over(Window.partitionBy(g)
  * .orderBy(...))` plans: with few, large groups (event types, language
  * strata, training domains — exactly the curation regime), a plain
  * per-group window funnels every row of the hottest group through ONE
  * task, and at 100 TB that task is the job.
  *
  * The discipline here is the [[Pack]] prefix-sum one, applied to ranks:
  *
  *  1. every row gets a deterministic BUCKET `__b` — a pure function of
  *     the row's own sort key that coarsens the group's sort order
  *     (all rows of bucket b sort before all rows of bucket b+1 within
  *     their group, ties never straddle buckets);
  *  2. rows rank LOCALLY per (group, bucket) cell — the sort window
  *     partitions by the pair, so a group's rows spread over `buckets`
  *     tasks and no task ever sorts more than one cell;
  *  3. cell sizes aggregate to a (group, bucket, count) table of at most
  *     groups×buckets rows; per-group cumulative offsets come from a
  *     window over THAT table (tiny by construction) and broadcast back;
  *  4. global rank = offset + local rank.
  *
  * Because the bucket is computed from DATA (never from
  * `spark_partition_id()` or a sampled range partitioner), the rank is
  * reproducible under task retries, DAG recomputation, and AQE re-reads
  * — both DAG branches (the local ranks and the cell counts) recompute
  * to identical values, which is what lets the oracle replay the exact
  * same ranks with a plain SQL window.
  *
  * Sizing: a cell holds ~n_g/buckets rows (uniform buckets) and the
  * offset table holds ≤ groups×buckets rows; at 100 TB a caller raises
  * `buckets` until cells fit a task — the offset table stays broadcast-
  * small far beyond that point (1e4 groups × 4096 buckets = 4e7 longs). */
object Rank {

  /** Global per-group rank from per-cell local ranks + cumulative cell
    * offsets. `df` must already carry the bucket column `bCol`
    * (LongType, NON-NULL, order-aligned with `order` inside each group:
    * b(x) < b(y) ⇒ x sorts before y, rows tying on the full `order` key
    * never split across buckets — a NULL bucket would break the
    * order-alignment contract, and the bucket builders below never
    * produce one for a rankable row). GROUP keys may be NULL: the
    * offset join is null-safe, so a NULL group ranks as its own group
    * exactly like `Window.partitionBy` treats it. Appends `rankCol`;
    * drops the bucket. */
  def cellRank(df: DataFrame, gCols: Seq[String], bCol: String,
               order: Seq[Column], rankCol: String): DataFrame = {
    val cellKeys = (gCols :+ bCol).map(col)
    // phase 2: one sort per (group, bucket) CELL — a group spreads over
    // `buckets` tasks instead of funneling through one
    val local = df.withColumn("__lr",
      row_number().over(Window.partitionBy(cellKeys: _*).orderBy(order: _*)))
    // phase 3: cell census (map-side partial agg → groups×buckets rows)
    // + per-group running offsets over the tiny table only
    val cnts = df.groupBy(cellKeys: _*).agg(count(lit(1)).as("__cnt"))
    val wOff = Window.partitionBy(gCols.map(col): _*).orderBy(col(bCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = cnts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .drop("__cnt")
      .withColumnsRenamed((gCols :+ bCol).map(c => c -> s"__r_$c").toMap)
    // phase 4: offset + local = global; <=> keeps NULL group keys
    // (groupBy emitted them as a group — a plain equi-join would
    // silently drop their rows)
    val cond = (gCols :+ bCol)
      .map(c => local(c) <=> off(s"__r_$c")).reduce(_ && _)
    local.join(broadcast(off), cond)
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop((gCols :+ bCol).map(c => s"__r_$c") ++ Seq("__lr", "__off", bCol): _*)
  }

  /** Deterministic equi-width value buckets per group for NUMERIC sort
    * keys ordered (v, id): bucket = ⌊(v − min_g) / (max_g − min_g) ·
    * buckets⌋ clamped to [0, buckets−1] — monotone in v, equal values
    * share a bucket, and the per-group (min, max) stats are one grouped
    * aggregation broadcast back. A group whose values are ALL EQUAL
    * (width 0) would collapse into one cell, so it falls back to
    * equi-width buckets on the id — within such a group the (v, id)
    * order IS the id order, so the fallback stays order-aligned.
    *
    * Equi-width is distribution-sensitive where a range partitioner
    * samples: a pathological value pile-up (most rows sharing one
    * value) concentrates cells. That is the documented trade for
    * determinism — raise `buckets` for spread, or pre-transform the
    * value (rank statistics are invariant under any strictly monotone
    * map). Appends `__b`. */
  def valueBuckets(df: DataFrame, g: String, v: String, id: String,
                   buckets: Int): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val stats = df.groupBy(col(g).as("__sg")).agg(
      min(col(v)).as("__vmin"), max(col(v)).as("__vmax"),
      min(col(id).cast("double")).as("__imin"),
      max(col(id).cast("double")).as("__imax"))
    def width(x: Column, lo: Column, hi: Column): Column =
      least(lit(buckets - 1L), floor((x - lo) / (hi - lo) * buckets))
    // <=> keeps a NULL group (it has stats rows like any other group;
    // a plain equi-join would silently drop its rows before ranking)
    df.join(broadcast(stats), col(g) <=> col("__sg"))
      .drop("__sg")
      .withColumn("__b",
        // NULL values sort first under Spark's ascending (v, id) order,
        // so they take a bucket below every real one — without this a
        // NULL v would compute a NULL bucket and fall out of the rank
        when(col(v).isNull, lit(-1L))
        .when(col("__vmax") > col("__vmin"),
          width(col(v), col("__vmin"), col("__vmax")))
        .when(col("__imax") > col("__imin"),
          width(col(id).cast("double"), col("__imin"), col("__imax")))
        .otherwise(lit(0L)))
      .drop("__vmin", "__vmax", "__imin", "__imax")
  }

  /** Bucket for md5-hex sort keys: the first two hex chars as a number
    * — 256 uniform buckets BY CONSTRUCTION (md5 is uniform), and
    * lexicographic order of hex strings equals numeric order of the
    * prefix (0-9 < a-f in ASCII), so the bucket is order-aligned with
    * any (md5_hex, tiebreak...) sort. The uniform case of
    * [[valueBuckets]] — no stats pass needed. */
  def md5Bucket(h: Column): Column =
    conv(substring(h, 1, 2), 16, 10).cast("long")

  /** Exact per-group top-n by (value desc, id asc) WITHOUT a
    * one-task-per-group sort — the generic reduction
    * [[Sketches.groupedPrioritySample]] routes its priorities through:
    * phase 1 keeps a bounded n-element heap per group per partition
    * (mapPartitions — constant task memory, multiset semantics, guarded
    * insert), phase 2 ranks the ≤ partitions·groups·n survivors with
    * the exact window. The hottest group's rows spread over every
    * partition in phase 1; phase 2's window runs on a survivor table
    * whose size is independent of corpus size. `payload` rides the
    * heap untouched (a caller's side value — e.g. a signed residual
    * ranked by its absolute value — survives without a join-back over
    * the input lineage). id and v must already be integral: a cast
    * from string/fractional would silently alias or null ids, so the
    * contract is enforced, not papered over. Output:
    * (g, id, v, pl, rk ≤ n), deterministic. */
  def groupedTopK(df: DataFrame, gCol: Column, idCol: Column,
                  vCol: Column, n: Int,
                  payload: Column = lit(0L)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(gCol.cast("string").as("g"),
      idCol.as("id"), vCol.as("v"), payload.as("pl"))
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val integral = Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType)
      for (c <- Seq("id", "v", "pl")) {
        val dt = projected.schema(c).dataType
        require(integral.contains(dt),
          s"groupedTopK requires integral $c, got $dt — a long cast from " +
          "string/fractional would silently alias or null values")
      }
    }
    val base = projected.select(col("g"), col("id").cast("long"),
        col("v").cast("long"), col("pl").cast("long"))
      .as[(String, Long, Long, Long)]
    // rank key: smaller (−v, id) = better; the queue's head is the
    // WORST survivor so eviction is O(log n) and a loser costs one
    // comparison. (−v, id) not (…)-with-payload: payload is cargo,
    // never a tie-break
    val pqOrd = Ordering.by[(Long, Long, Long), (Long, Long)] {
      case (id, v, _) => (-v, id) }
    val survivors = base.mapPartitions { it =>
      val heaps = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long, Long)]]
      it.foreach { case (g, id, v, pl) =>
        val q = heaps.getOrElseUpdate(g,
          scala.collection.mutable.PriorityQueue.empty[(Long, Long, Long)](pqOrd))
        val t = (id, v, pl)
        if (q.size < n) q.enqueue(t)
        else if (pqOrd.lt(t, q.head)) { q.dequeue(); q.enqueue(t) }
      }
      heaps.iterator.flatMap { case (g, q) =>
        q.iterator.map { case (id, v, pl) => (g, id, v, pl) }
      }
    }.toDF("g", "id", "v", "pl")
    val win = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    survivors.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= n)
  }
}
