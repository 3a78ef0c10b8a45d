package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** Token-budget packing — the context-window assembly step of a
  * training-data pipeline: documents are laid out in a deterministic
  * global order (doc id) and chunked into fixed token-budget bins, the
  * standard concat-then-chunk scheme (a document belongs to the bin its
  * first token falls into).
  *
  * The core is a GLOBAL WEIGHTED PREFIX SUM of token counts. The naive
  * `sum().over(Window.orderBy(id))` funnels the whole dataset through
  * one task; this implementation is the classic two-phase scan instead:
  * range-partition + sort by id, reduce each partition to its token
  * subtotal (one lightweight job over counts only), prefix-scan the
  * per-partition subtotals on the driver (P longs), then assign each
  * row `start = partition offset + running subtotal` in one fully
  * parallel pass — the weighted generalization of
  * [[Scan.hexDumpWithCnt]]'s zipWithIndex counter. Bin assignment
  * depends only on the global id order, not on partition boundaries.
  */
object Pack {

  /** Per-document bin assignment: (doc_id, n_tok, bin, start) where
    * `start` is the number of tokens preceding the document in id order
    * and `bin = start / budget`. */
  def assignBins(docs: DataFrame, textCol: String, idCol: String,
                 budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      // a row without an id or text has no position in the layout —
      // exclude it up front instead of letting the phase-1 unboxing NPE
      // inside a task (the row-level getLong calls below assume non-null)
      .filter(col("doc_id").isNotNull && col("n_tok").isNotNull)
      .repartitionByRange(col("doc_id"))
      // secondary sort key n_tok: duplicate doc_ids would otherwise tie
      // nondeterministically, and a partition recomputed after block
      // eviction could reorder them between phase 1 and phase 2 —
      // (doc_id, n_tok) pins the order up to rows that are fully
      // identical, which are interchangeable for start assignment
      .sortWithinPartitions(col("doc_id"), col("n_tok"))
    val rdd = base.rdd
    // MEMORY_AND_DISK, not cache(): under memory pressure an evicted
    // MEMORY_ONLY partition recomputes through the range shuffle between
    // the phase-1 subtotal collect and the phase-2 assignment pass;
    // spilling to disk keeps the two phases reading identical contents
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // phase 1: one subtotal per partition (P longs to the driver)
      val subtotals = rdd
        .mapPartitionsWithIndex { case (pid, it) =>
          Iterator.single(pid -> it.map(_.getLong(1)).sum)
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = subtotals.scanLeft(0L)(_ + _)
      // phase 2: within-partition running sum + broadcast offset
      val bOffsets = spark.sparkContext.broadcast(offsets)
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_tok", LongType, nullable = false),
        StructField("bin", LongType, nullable = false),
        StructField("start", LongType, nullable = false)))
      val assigned = rdd.mapPartitionsWithIndex { case (pid, it) =>
        var running = bOffsets.value(pid)
        it.map { r =>
          val start = running
          running += r.getLong(1)
          Row(r.getLong(0), r.getLong(1), start / budget, start)
        }
      }
      spark.createDataFrame(assigned, outSchema).localCheckpoint()
    } finally rdd.unpersist(blocking = false)
  }

  /** Per-bin packing stats: bin, n_docs, sum_tokens, first/last doc. */
  def packBins(docs: DataFrame, textCol: String, idCol: String,
               budget: Long): DataFrame =
    assignBins(docs, textCol, idCol, budget)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))

  /** The materialized packed sequences: one row per bin with the bin's
    * documents concatenated in id order, newline-separated — the actual
    * context windows a trainer consumes. Assembly is order-sensitive, so
    * the texts are gathered as (doc_id, text) structs and array_sort'ed
    * before joining (collect_list order is not deterministic across
    * partitionings; the sort is). Emitting the md5 of each packed blob
    * keeps the driver-checkable surface small while still pinning every
    * byte of every window. */
  def packedSequences(docs: DataFrame, textCol: String, idCol: String,
                      budget: Long): DataFrame =
    assignBins(docs, textCol, idCol, budget)
      .join(docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text")),
        Seq("doc_id"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        md5(array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("__text")))),
            s => s.getField("__text")), "\n").cast("binary")).as("packed_md5"))

  /** Deterministic domain-interleaved training order: every document
    * gets an intra-domain rank in md5(id) order (the reproducible
    * shuffle every data pipeline uses), and the global training order
    * is round-robin over domains — round r emits one doc from each
    * domain that still has ≥ r docs, domains in lexicographic order.
    * This is the curriculum/ordering-assembly primitive that keeps any
    * training window domain-balanced instead of streaming one domain
    * at a time.
    *
    * The global position is computed ARITHMETICALLY, not with a global
    * one-task window: with per-domain counts c_d broadcast (domains
    * are few; counts are one grouped count), the doc at (rank r,
    * domain d) sits at position
    * `Σ_d' min(r−1, c_d') + |{d' < d : c_d' ≥ r}| + 1` — every term a
    * broadcast-side aggregate. The per-domain rank itself is the
    * DISTRIBUTED two-phase rank ([[Rank.cellRank]] over md5-prefix
    * buckets): domains are few and large by construction, so a plain
    * `Window.partitionBy(domain)` would funnel each domain through one
    * task — the same hazard the global-position arithmetic avoids,
    * applied one level down. The oracle runs the naive global window
    * instead, making the gate itself the proof that bucket arithmetic
    * equals the sort. */
  def interleave(docs: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val base = docs.select(col(groupCol).as("domain"),
      col(idCol).cast("long").as("doc_id"))
    val rk = Rank.cellRank(
      base.withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("__b", Rank.md5Bucket(col("h"))),
      Seq("domain"), "__b", Seq(col("h"), col("doc_id")), "rk")
      .drop("h")
    val counts = base.groupBy(col("domain")).agg(count(lit(1)).as("c"))
      .select(col("domain").as("d2"), col("c"))
    rk.crossJoin(broadcast(counts))
      .groupBy(col("domain"), col("doc_id"), col("rk"))
      .agg((sum(least(col("rk") - 1, col("c"))) +
        sum(when(col("d2") < col("domain") && col("c") >= col("rk"), 1L)
          .otherwise(0L)) + 1).as("position"))
      .select(col("position"), col("domain"), col("doc_id"), col("rk"))
  }

  /** Deterministic content-addressed GLOBAL shuffle — "shuffle the
    * corpus before training" as a reproducible operator. A doc's
    * position is the rank of `(md5(salt‖id), id)` over the whole
    * corpus, computed with the two-phase distributed rank
    * ([[Rank.cellRank]]): md5-prefix buckets are uniform BY
    * CONSTRUCTION (256 cells of ~n/256 docs each), rows sort locally
    * per cell, and the 256-row census supplies cumulative offsets — no
    * single-task global sort at any corpus size, unlike
    * `row_number().over(Window.orderBy(...))` which plans Exchange
    * SinglePartition. Content addressing (never `rand()` or a sampled
    * range partitioner) makes the order stable under retries, AQE
    * re-reads, and engines — the oracle replays it with a plain
    * window; a new epoch's reshuffle is just a new salt. Output:
    * (pos, doc_id), 1-based. */
  def globalShuffle(docs: DataFrame, idCol: String,
                    salt: String = "gs_"): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"))
      .withColumn("h", md5(concat(lit(salt), col("doc_id").cast("string"))))
      .withColumn("__b", Rank.md5Bucket(col("h")))
      .withColumn("__g", lit(0))
    Rank.cellRank(base, Seq("__g"), "__b", Seq(col("h"), col("doc_id")), "pos")
      .select(col("pos"), col("doc_id"))
  }
}
