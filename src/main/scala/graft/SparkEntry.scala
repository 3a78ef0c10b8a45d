package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{Checksum, CodecExpr}
import graft.operators.{Bpe, Dedup, Diff, Events, Gate, Graph, Layout, Multimodal, Pack, Pca, Profile, RangeJoin, Rank, Retrieval, Scan, Similarity, Skew, Sketches, SketchStore, Skyline, TextAnalysis}
import graft.sources.KVSnapshot
import graft.streaming.{StreamEntries, WindowedChecksum}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query ends in a fully deterministic ORDER BY and
  * aliases every computed column identically in Spark and DuckDB (the
  * driver sorts columns by name, then hashes values). Double-typed
  * aggregates go through exact DECIMAL arithmetic and only cast the
  * final result to DOUBLE, so Spark's and DuckDB's summation order
  * can't produce differing bits.
  *
  * NEVER emit a raw DECIMAL output column: the driver's hash
  * canonicalizes parquet DECIMAL differently from DuckDB decimal, so a
  * value-identical DECIMAL column still hash-mismatches (round-9
  * q_pca_project). DECIMAL is for intermediate exactness only — cast
  * the final column to BIGINT (when it provably fits int64) or DOUBLE
  * or STRING on BOTH sides. OracleConventionSpec pins this repo-wide. */
object SparkEntry {

  private val cte = KVSnapshot.duckdbCte

  /** The diff-classification SELECT shared by q_diff and q_diff_pruned
    * (the pruned form changes only the execution strategy). */
  private val diffSelectSql =
    """SELECT COALESCE(s.k, d.k) AS key, s.v AS src_value, d.v AS dst_value,
      |  CASE WHEN s.k IS NULL THEN 'dst_only'
      |       WHEN d.k IS NULL THEN 'src_only'
      |       ELSE 'mismatch' END AS diff_class
      |FROM src s FULL OUTER JOIN dst d ON s.k = d.k
      |WHERE s.k IS NULL OR d.k IS NULL OR s.v <> d.v
      |ORDER BY key, diff_class""".stripMargin

  /** Flagship query (reference's `checksum` subcommand end-to-end,
    * SURVEY.md §3.1) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Checksum.verdict(KVSnapshot.src(spark, dir), KVSnapshot.dst(spark, dir))
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  /** THE verified near-dup pair set (exact df-capped Jaccard ≥ 0.5) the
    * cluster / split / fold entries all consume — one definition so the
    * assignment families can never disagree on cluster membership. */
  private def jaccardPairs05(d: DataFrame): DataFrame =
    Dedup.jaccardJoin(d, "text", "doc_id", 0.0, 3, maxDf = jaccardMaxDf)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("j"))
      .filter(col("j") >= 0.5)
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
  /** BPE-ish pre-tokenizer pattern, shared by Spark + oracle SQL. */
  private val bpePat = TextAnalysis.bpeTokenPattern

  /** Blocklist fixture phrases (q_blocklist / q_blocklist_phrases and
    * the streaming monitor), mirrored verbatim in the oracle's VALUES
    * list — multi-word so the anchor-and-verify split is actually
    * exercised. */
  private[graft] val blocklistPhrases = Seq("table scan", "slow filter",
    "batch window spark", "key agg row", "the line sort")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = parityQueries ++
    dedupQueries ++ similarityQueries ++ textQueries ++ multimodalQueries ++
    eventQueries ++ relationalQueries ++ sketchQueries ++ streamingStateQueries

  // §2b streaming: the three STATEFUL Structured Streaming operators
  // (stream-stream diff, mapGroupsWithState keyed checksum,
  // flatMapGroupsWithState sessions with event-time timeouts), driven
  // end-to-end through real micro-batches/watermarks/state stores by
  // deterministic MemoryStream feeds — see graft.streaming.StreamEntries.
  private def streamingStateQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_diff" -> ((s, dir) => StreamEntries.streamDiff(s, dir)),
    "q_stream_sessions" -> ((s, dir) => StreamEntries.streamSessions(s, dir)),
    "q_stream_keyed_checksum" -> ((s, dir) => StreamEntries.streamKeyedChecksum(s, dir)),
    "q_stream_dedup" -> ((s, dir) => StreamEntries.streamDedup(s, dir)),
    // streaming count-min sketch: constant-size counter-grid state
    // folded across micro-batches; final emission = the batch sketch
    "q_stream_cms" -> ((s, dir) => StreamEntries.streamCms(s, dir)),
    // continuously-maintained top-k leaderboard (complete-mode sort +
    // limit over stateful counts); every count split across batches so
    // the result provably sums across the boundary; oracle = batch
    // Zipf head
    "q_stream_topk" -> ((s, dir) => StreamEntries.streamTopK(s, dir)),
    // continuously-maintained decayed trending scores: pre-combined
    // (type, day, cnt) cells, power-of-two weights at feed time, one
    // complete-mode agg; every count split across the batch boundary
    "q_stream_decay" -> ((s, dir) => StreamEntries.streamDecay(s, dir)),
    // continuously-maintained OLS trend: the five decimal sums live in
    // the state store; exact num/den coefficients at every micro-batch
    "q_stream_trend" -> ((s, dir) => StreamEntries.streamTrend(s, dir)),
    // live Kaplan–Meier: per-user spans (3 longs each) in the state
    // store, curve through the identical batch stage after the drain
    "q_stream_survival" -> ((s, dir) => StreamEntries.streamSurvival(s, dir)),
    // incrementally-maintained PCA: the 49 Gram sums fold in the state
    // store (complete mode), identical driver eigen-solve as batch
    "q_stream_pca" -> ((s, dir) => StreamEntries.streamPca(s, dir)),
    // streaming HLL NDV: per-shard register sketches max-merged in the
    // state store, estimate over the SINK registers — oracle is the
    // batch q_hll_ndv SQL verbatim
    "q_stream_hll" -> ((s, dir) => StreamEntries.streamHll(s, dir)),
    "q_stream_bitmap_distinct" -> ((s, dir) =>
      StreamEntries.streamBitmapDistinct(s, dir)),
    // live cross-source overlap: the SAME state-folded HLL registers,
    // pair-priced through the identical union-merge estimate as batch
    "q_stream_hll_overlap" -> ((s, dir) =>
      StreamEntries.streamHllOverlap(s, dir)),
    // live blocklist monitor: per-phrase counters fold across batches
    // from pre-combined (phrase, doc, hits) cells — state is
    // |phrases|-keyed, silent phrases stay visible at zero
    "q_stream_blocklist" -> ((s, dir) =>
      StreamEntries.streamBlocklist(s, dir)),
    // streaming upsert view (mapGroupsWithState latest-value state):
    // base + split changelog must rebuild dst — q_merge_upsert's twin
    "q_stream_upsert" -> ((s, dir) => StreamEntries.streamUpsert(s, dir)),
    // stateless stream-static enrichment: per-batch broadcast join of
    // the event stream against the customer dim
    "q_stream_static" -> ((s, dir) => StreamEntries.streamStaticJoin(s, dir)),
    // stream-stream event-time INTERVAL join (ad-attribution shape):
    // click joins same-user view ≤ 6 h earlier; watermarks on both
    // sides + the time-range predicate bound the join state, and the
    // event-time half-split feed proves the cross-batch state join
    "q_stream_ijoin" -> ((s, dir) => StreamEntries.streamIntervalJoin(s, dir)),
    // LEFT OUTER interval join: views that never clicked emit with
    // nulls — only after the watermark passes their 6 h match horizon
    // (early emission would contradict a late click; append mode can't
    // retract). The feed's final tick batch is where they flush.
    "q_stream_left_ijoin" -> ((s, dir) => StreamEntries.streamIntervalJoinLeft(s, dir)),
    // FULL OUTER interval join: unmatched views AND unmatched clicks
    // (organic traffic) flush with nulls post-horizon, symmetrically
    "q_stream_full_ijoin" -> ((s, dir) => StreamEntries.streamIntervalJoinFull(s, dir)),
    // watermark eviction gated end-to-end: late-arriving first-half
    // data cannot resurrect closed windows — sink = on-time slice only
    "q_stream_late_drop" -> ((s, dir) => StreamEntries.streamLateDrop(s, dir)),
    // stateful as-of enrichment: per-user latest-click state joins each
    // purchase across the batch boundary — sink = the batch as-of join
    "q_stream_asof" -> ((s, dir) => StreamEntries.streamAsof(s, dir)),
    // flatMapGroupsWithState k-anonymity release gate: rows held until
    // their (type, day) cell reaches k=4, then flushed; the drained
    // sink equals the batch kAnonFilter of the whole slice
    "q_stream_k_anon" -> ((s, dir) => StreamEntries.streamKAnon(s, dir)),
    // durable parquet file sink under a _spark_metadata manifest:
    // read-back sees only committed files, and the aggregate equals
    // the batch aggregate of the whole fed slice
    "q_stream_file_sink" -> ((s, dir) => StreamEntries.streamFileSink(s, dir)),
    // foreachBatch MERGE sink: per micro-batch full-outer merge into a
    // parquet table generation; final table = dst (the merge identity)
    "q_stream_foreach_merge" -> ((s, dir) => StreamEntries.streamForeachMerge(s, dir)),
    // foreachBatch merge into a KVBIN generation: per batch, full-outer
    // merge with the DSv2 read-back, DSv2 overwrite write (sorted
    // regions, _index swap = commit); dead batches leave only orphan
    // files _index never references
    "q_stream_kvbin_sink" -> ((s, dir) => StreamEntries.streamKvbinSink(s, dir)),
    "q_stream_kvbin_scan" -> ((s, dir) => StreamEntries.streamKvbinScan(s, dir)),
    // gen-offset tail of a SHARDED two-store fleet under SKEWED waves
    // (wave 3 routes only to one store): live because fleet appends
    // keep generations in lockstep and the fleet watermark is the MIN
    // across stores — the r15 advisory's silently-skipped-commit
    // scenario as a gated entry
    "q_stream_kvbin_fleet_scan" -> ((s, dir) => StreamEntries.streamKvbinFleetScan(s, dir)),
    // continuous compare over the connector end-to-end: the kvbin tail
    // folds per-bucket crc64/kvs/bytes in the state store (|buckets|
    // triples, not rows), the mid-drain append arrives as its own
    // micro-batch, and the final state verdicts against the static dst
    // kvbin table's batch digests
    "q_stream_kvbin_verdict" -> ((s, dir) => StreamEntries.streamKvbinVerdict(s, dir)),
    // the scoped tail: start/end_key_hex reader options bound the
    // stream AT THE SOURCE (Spark never pushes filters into
    // micro-batch relations) — drained rows = exactly the scoped half
    "q_stream_kvbin_scoped" -> ((s, dir) => StreamEntries.streamKvbinScoped(s, dir)),
    // live kvbin-to-kvbin replication: the tail's micro-batches append
    // as generations of a second table; the replica's batch read must
    // equal the source slice row for row
    "q_stream_kvbin_replicate" -> ((s, dir) => StreamEntries.streamKvbinReplicate(s, dir)),
    "q_stream_kvbin_fleet_replicate" -> ((s, dir) => StreamEntries.streamKvbinFleetReplicate(s, dir)),
    // streaming histogram-quantile sketch: counters sum across batches
    // in the state store; sink counters rank through the identical
    // batch estimate stage
    "q_stream_hist_quantile" -> ((s, dir) => StreamEntries.streamHistQuantile(s, dir)),
    // streaming rank-error quantile sketch: per-(group, slot) minimum
    // registers min-merged in the state store (no stats prepass — slot
    // geometry is a pure hash function); estimate through the same
    // slotSampleQuantilesFromCells stage as batch
    "q_stream_kll_quantile" -> ((s, dir) => StreamEntries.streamSlotQuantile(s, dir)),
    // streaming PSI drift: live counters summed in the state store over
    // the batch-pinned reference geometry; scored through the same
    // psiFromCells stage as batch
    "q_stream_psi_drift" -> ((s, dir) => StreamEntries.streamPsiDrift(s, dir)),
    "q_stream_nb_classify" -> ((s, dir) => StreamEntries.streamNbClassify(s, dir)),
    "q_stream_decontam_gate" -> ((s, dir) => StreamEntries.streamDecontamGate(s, dir)),
    "q_stream_observed" -> ((s, dir) => StreamEntries.streamObserved(s, dir)),
    "q_stream_skew_profile" -> ((s, dir) => StreamEntries.streamSkewProfile(s, dir)),
    // streaming LSH near-dup filter: one-long-per-bucket state, rep =
    // bucket min id; drained result == the batch banding rule
    "q_stream_lsh_filter" -> ((s, dir) => StreamEntries.streamLshFilter(s, dir)),
    // streaming curation-funnel monitor: stateless gate flags + a
    // one-boolean-per-fingerprint dedup state, scored through the
    // identical funnelFromFlags stage as batch
    "q_stream_funnel" -> ((s, dir) => StreamEntries.streamFunnel(s, dir)),
    // streaming SCD2: one open run per key in state, closed intervals
    // emitted as changes arrive — equals batch scd2's closed set
    "q_stream_scd2" -> ((s, dir) => StreamEntries.streamScd2(s, dir)))

  // §2b LLM-pipeline: deduplication family over `documents`.
  private def dedupQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup, grouped on a 128-bit content hash (not the body)
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), "text", "doc_id").orderBy(col("fp"))),
    // token-set (bag-of-words) dedup: equal up to order+multiplicity
    "q_dedup_bag" -> ((s, dir) =>
      Dedup.bagGroups(docs(s, dir), "text", "doc_id").orderBy(col("fp"))),
    // exact 3-gram-shingle Jaccard similarity join (inverted index) with
    // df pruning ON (maxDf=100): shingles shared by >100 docs are cut
    // from the candidate self-join — the knob that bounds the join at
    // 100× corpus scale (Σdf² candidates otherwise). The oracle mirrors
    // the same df filter, so the gate checks the pruned semantics.
    "q_jaccard_join" -> ((s, dir) =>
      Dedup.jaccardJoin(docs(s, dir), "text", "doc_id", 0.0, 3, maxDf = jaccardMaxDf)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("doc_a"), col("doc_b"))),
    // incremental dedup: every 10th doc arrives as the "new batch",
    // matched against the standing corpus index only — no corpus
    // self-join (the q_checksum_delta idea applied to near-dup). The
    // threshold sits at 0.3: the fixture's near-dup pairs are planted
    // at adjacent ids, so cross-split pairs are rarer/weaker than the
    // self-join's — a higher gate would leave a trivial 1-row answer.
    "q_dedup_delta" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.deltaJaccardJoin(
          d.filter(col("doc_id") % 10 === 0), d.filter(col("doc_id") % 10 =!= 0),
          "text", "doc_id", 0.0, 3, maxDf = jaccardMaxDf)
        .select(col("doc_new"), col("doc_old"), round(col("jaccard"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy(col("doc_new"), col("doc_old"))
    }),
    // MinHash-LSH near-dup, exactly verified: candidates from banded
    // signature equi-joins, each emitted pair checked by true Jaccard.
    // Band/row choice (k=64, bands=32 → r=2): candidate recall at the
    // emitted threshold j=0.5 is 1-(1-0.5²)³² ≈ 0.9999, so equality with
    // the exact-join oracle doesn't hinge on the fixture's pairs sitting
    // far above threshold (r=4 recalls only ~64% at j=0.5).
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashNearDup(docs(s, dir), "text", "doc_id", 0.4, 3, 64, 32)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("doc_a"), col("doc_b"))),
    // the OCCUPANCY-ADAPTIVE near-dup (lshParamsFor: band depth chosen
    // from BOTH τ and the corpus count, the srpBandsFor discipline for
    // MinHash — fixed-width banding measured 4.0× runtime at 10× rows
    // because sub-threshold collisions fill buckets superlinearly).
    // md5 signatures so the oracle replays the CANDIDATE stage too:
    // chooser, signatures, band keys, bucket join — equality holds at
    // any corpus size by construction, not because fixture pairs sit
    // far above threshold. Output = rounded exact Jaccard ≥ τ over the
    // chosen banding's candidates
    "q_dedup_minhash_auto" -> ((s, dir) =>
      Dedup.minhashNearDupMd5Auto(docs(s, dir), "text", "doc_id", mhTau,
          3, mhK, targetOccupancy = mhOcc)
        .orderBy(col("doc_a"), col("doc_b"))),
    // the MULTI-PROBE arm of the adaptive near-dup (r14): the chooser
    // deepens bands as corpora grow, which RAISES the miss rate for
    // borderline-τ pairs — probe arms re-band the same signature
    // along coprime-stride permutations (probeStep), buying recall
    // back at ×(probes+1) candidate volume and unchanged per-bucket
    // occupancy. The oracle replays the probe arms end-to-end (stride
    // inverses, permuted band keys, bucket join), so a boundary pair
    // an arm recovers — or misses — does so identically in both engines
    "q_dedup_minhash_probe" -> ((s, dir) =>
      Dedup.minhashNearDupMd5Auto(docs(s, dir), "text", "doc_id", mhTau,
          3, mhK, targetOccupancy = mhOcc, probes = mhProbes)
        .orderBy(col("doc_a"), col("doc_b"))),
    // the MinHash ESTIMATOR itself, hash-gated: for every exact pair
    // j >= 0.5, the k=32 md5-signature agreement fraction — the
    // accuracy contract behind every LSH recall claim, checked
    // bit-for-bit (not just the candidates it generates)
    "q_minhash_est" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.jaccardJoin(d, "text", "doc_id", 0.0, 3, maxDf = jaccardMaxDf)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      // signatures from the FULL-corpus memoized frame, sliced to pair
      // PARTICIPANTS by a semi-join: a doc's signature is independent
      // of the rest of the corpus, so the frame the banded-candidate
      // gates already built (r13 memo) serves this gate's subset too —
      // one signature build per (corpus, k) across the whole family.
      // The oracle computes all signatures and uses the same subset,
      // so results agree either way
      val members = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val sig = Dedup.minhashSignatureMd5(d, "text", "doc_id", 3, 32)
        .join(broadcast(members), Seq("doc_id"), "left_semi")
      val sa = sig.select(col("doc_id").as("doc_a") +:
        (0 until 32).map(i => col(s"m$i").as(s"a$i")): _*)
      val sb = sig.select(col("doc_id").as("doc_b") +:
        (0 until 32).map(i => col(s"m$i").as(s"b$i")): _*)
      val matches = (0 until 32)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          round(matches.cast("double") / 32.0, 6).as("est_jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    // asymmetric containment join: the subsumption pairs symmetric
    // Jaccard misses (short doc inside long doc) — df-capped inverted
    // index, normalized by the contained side's set size
    "q_containment_join" -> ((s, dir) =>
      Dedup.containmentJoin(docs(s, dir), "text", "doc_id", 0.8, 3,
          maxDf = jaccardMaxDf)
        .orderBy(col("container_id"), col("contained_id"))),
    // cross-source overlap matrix: per source pair, Jaccard (ppm) of
    // the sources' distinct shingle sets — the governance check that a
    // mixing run isn't double-weighting one text arriving under two
    // source names. Join cost bounded by C(sources, 2) per shingle
    "q_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(docs(s, dir), "text", "source")),
    // LSH banding rollout gate, routed through the OCCUPANCY-ADAPTIVE
    // chooser (lshParamsFor: admissibility b·n·(τ/2)^r ≤ 16, inflection
    // nearest τ among admissible divisor pairs of k=32): recall and
    // precision (integer ppm) of the chooser's banding against the
    // exact df-capped Jaccard truth at j >= 0.5 — the recorded number
    // now tracks what the ADAPTIVE banding ships at this corpus size.
    // The oracle replays the chooser (rch CTE), so the recorded trade
    // is hash-gated at every SF, not just the SFs someone measured
    // r14: the gate records BOTH arms off the one memoized signature
    // frame — the single-probe candidates (what probes=0 production
    // ships) AND the rotated-band multi-probe expansion, so the
    // candidate-volume cost of the probes sits next to the recall they
    // buy back (the bitextSrpRecall discipline for MinHash)
    "q_lsh_recall" -> ((s, dir) =>
      Dedup.lshRecallAuto(docs(s, dir), "text", "doc_id", mhTau, 3, mhK,
        maxDf = jaccardMaxDf, targetOccupancy = mhOcc, probes = mhProbes)),
    // near-dup clusters: connected components over the verified pair
    // graph; cluster_id = min reachable doc_id (the canonical survivor)
    "q_dedup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(jaccardPairs05(docs(s, dir))).orderBy(col("doc_id"))),
    // curation keeper rule: per near-dup cluster keep the
    // HIGHEST-quality member (qualityPpm argmax, min-id tiebreak via
    // the (score, −id) struct max), singletons their own cluster —
    // the retention census (keeper, best score, cluster size)
    "q_dedup_best" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = jaccardPairs05(d)
      val members = d
        .select(col("doc_id"), TextAnalysis.qualityPpm(col("text")).as("score"))
        .join(Dedup.nearDupClusters(pairs), Seq("doc_id"), "left_outer")
        .select(coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          col("doc_id"), col("score"))
      Dedup.bestOfCluster(members).orderBy(col("cluster_id"))
    }),
    // the one-call kept corpus: dropNearDuplicates composes pairs →
    // clusters → best-of-cluster → left-semi, schema-preserving; the
    // entry summarizes the survivors per language
    "q_dedup_keep" -> ((s, dir) =>
      Dedup.dropNearDuplicates(docs(s, dir), "text", "doc_id", 0.5,
          maxDf = jaccardMaxDf)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(length(col("text"))).as("sum_chars"))
        .orderBy(col("lang"))),
    // leakage-free split assignment: hash the near-dup CLUSTER
    // representative, not the doc id, so a whole duplicate cluster
    // lands in one split and eval can never see a paraphrase of a
    // training document. Reuses q_dedup_clusters' pair set (cached).
    "q_split_leakfree" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.leakFreeSplit(d, jaccardPairs05(d), "doc_id")
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("rep") =!= col("doc_id"), 1)).as("n_dup_members"))
        .orderBy(col("lang"), col("split"))
    }),
    // leakage-safe K-fold (GroupKFold over near-dup clusters): fold =
    // md5(rep) mod 5, every cluster member shares its fold — the
    // cross-validation counterpart of q_split_leakfree; per-doc rows
    // so membership itself is hash-gated
    "q_group_kfold" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.groupKFold(d, jaccardPairs05(d), "doc_id", 5)
        .select(col("doc_id"), col("rep"), col("fold"))
        .orderBy(col("doc_id"))
    }),
    // decontamination: training docs whose shingles cover an eval doc
    // (containment, not Jaccard) — the synthetic eval set is every 10th
    // document, so the planted near-dup pairs that straddle the split
    // surface as leakage
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(
          d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
          "text", "doc_id", 0.5)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    // SPAN-level decontamination (the cut, not the flag): every train
    // 8-gram that appears anywhere in the eval corpus is cut as a
    // merged island — neither wasting the document (whole-doc drop)
    // nor shipping the leak. Eval gram set broadcasts into a semi-join
    // against the train gram stream; train never shuffles for the match
    "q_decontam_removal" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminationRemoval(
        d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", l = 8)
    }),
    // corpus-level contamination rate over the deterministic hash
    // split (train = md5 bucket < 90): per held-out doc, the permille
    // of its shingles present anywhere in train — the overlap metric
    // an eval release reports
    "q_contamination_rate" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("__b",
        pmod(Dedup.md5Hash60(col("doc_id").cast("string")), lit(100L)))
      Dedup.contaminationRate(d.filter(col("__b") < 90),
          d.filter(col("__b") >= 90), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),
    // passage-level duplication: content-defined chunks shared across
    // distinct documents — catches PARTIAL copies that whole-document
    // fingerprints miss (the chunk boundaries are content-defined, so a
    // prefix edit doesn't shift every downstream chunk)
    "q_cdc_dup_chunks" -> ((s, dir) =>
      Dedup.cdcChunks(docs(s, dir), "text", "doc_id")
        .groupBy(col("fp"))
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("chunk_len")).as("chunk_len"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_occ").desc, col("fp"))
        .limit(50)),
    // end-to-end corpus curation — the actual training-data use-case the
    // operators compose into: quality-gate (score + length band) →
    // exact-dedup survivors (min doc_id per content) → per-language
    // corpus stats. Every stage is individually oracle-checked; this
    // entry checks the COMPOSITION.
    "q_curation" -> ((s, dir) => {
      val d = docs(s, dir)
      val qual = TextAnalysis.quality(d, "text", "doc_id")
        .filter(col("quality_score") >= 0.5 && col("n_tokens").between(10, 1000))
        .select(col("doc_id"), col("n_tokens"))
      Dedup.dropExactDuplicates(d, "text", "doc_id")
        .join(qual, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .orderBy(col("lang"))
    }),
    // curation-funnel attrition report: the per-stage survival table a
    // corpus release publishes — token band → quality → repetition →
    // exact dedup, counted as running conjunctions in ONE pass
    "q_curation_funnel" -> ((s, dir) =>
      TextAnalysis.curationFunnel(docs(s, dir), "text", "doc_id")
        .orderBy(col("stage"))),
    // 60-bit SimHash signatures over the md5-derived token hash — fully
    // oracle-checked (the xxhash64 default stays the in-engine fast
    // path; it has no DuckDB twin and is covered by DedupSpec instead)
    "q_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir), "text", "doc_id", 60, Dedup.md5Hash60)
        .orderBy(col("doc_id"))),
    // SimHash near-dup pairs: 4×15-bit chunk pigeonhole join, Hamming ≤ 3.
    // The chunk-df cap (mirrored in the oracle) bounds bucket occupancy
    // at 100× corpus scale; at this scale max df is ~27, so it is
    // exercised but drops nothing
    "q_simhash_neardup" -> ((s, dir) =>
      Dedup.simhashNearDup(docs(s, dir), "text", "doc_id", 3, 60, Dedup.md5Hash60,
          maxChunkDf = 100)
        .orderBy(col("doc_a"), col("doc_b"))),
    // winnowing (MOSS) near-dup: positional 3-gram hashes, window-4
    // rightmost-min fingerprint selection, df-capped fingerprint join —
    // position-robust LOCAL fingerprinting (any shared 6-word run
    // guarantees a shared fingerprint) that whole-document signatures
    // can't provide. The oracle replays selection, cap, and scoring.
    "q_winnow_neardup" -> ((s, dir) =>
      Dedup.winnowNearDup(docs(s, dir), "text", "doc_id",
        n = 3, winW = 4, maxDf = 100, minShared = 2, minPermille = 300)),
    // corpus-level exact-substring duplication (Lee et al. 2022): any
    // 8-word gram occurring >1× in the corpus marks a duplicated span;
    // per-doc spans merge gaps-and-islands style. Detection is a gram
    // GROUP BY — no document-pair join anywhere.
    "q_substring_dedup" -> ((s, dir) =>
      Dedup.substringDedupStats(docs(s, dir), "text", "doc_id", l = 8)),
    // the REMOVAL half (what the curation pipeline ships): non-canonical
    // occurrences of corpus-duplicated 8-grams — canonical = first in
    // (md5(id), id, position) order — cut as merged islands; survivors'
    // words re-join. One gram GROUP BY + one doc_id shuffle; the
    // reconstruction is a per-doc HOF filter, never a word-level join.
    "q_substring_removal" -> ((s, dir) =>
      Dedup.substringRemoval(docs(s, dir), "text", "doc_id", l = 8)),
    // stratified largest-remainder split: per-language class counts are
    // the exact 800/100/100-permille apportionment (floor + largest
    // remainders), assignment by content-free md5(id) order — the
    // exact-counts complement of the hash-threshold q_split_assign
    "q_split_stratified" -> ((s, dir) =>
      Dedup.stratifiedSplit(docs(s, dir), "lang", "doc_id")
        .withColumnRenamed("stratum", "lang")))

  // §2b LLM-pipeline: similarity search over `embeddings`.
  private def similarityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact brute-force cosine top-k (query side broadcast)
    "q_cosine_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e.filter(col("id") < 10), e, 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    // hard-negative mining for contrastive training: per query, the
    // top-3 most-similar vectors with a DIFFERENT label
    "q_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.hardNegatives(e.filter(col("id") < 10), e, 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    // IVF-style ANN: probe the 2 nearest of the per-label centroid
    // clusters. Centroids sum in DECIMAL → the full pipeline (codebook,
    // assignment, probing, rescoring) is deterministic and
    // oracle-replayed in DuckDB; recall vs brute force is ALSO
    // scalatest-checked
    "q_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e, e.filter(col("id") < 10), 3, 2)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the PERSISTED-index run — build-once / search-many across runs:
    // run 1 materializes the coarse codebook and writes it through
    // kvbin as bit-exact cells (g = cluster, slot = dimension, v =
    // IEEE-754 long bits; k·D cells — model parameters, the sanctioned
    // bounded collect); run 2 re-reads the index and searches with it.
    // The roundtrip is bit-identical, so results — and the oracle —
    // are exactly q_ann_ivf's. At 100 TB this is the index lifecycle:
    // the corpus-sized build happens once, every later run pays only
    // the k·D cell read
    "q_ann_ivf_persist" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val tbl = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-annp-")
      val cb = Similarity.labelCodebook(e).as[(Long, Seq[Double])].collect()
      SketchStore.writeWave(
        cb.toSeq.flatMap { case (cid, cv) => cv.zipWithIndex.map { case (c, j) =>
          (cid.toString, j.toLong, java.lang.Double.doubleToLongBits(c)) } }
          .toDF("g", "slot", "v"),
        tbl, "build", "overwrite")
      val cells = SketchStore.readMerged(s, tbl, max)
        .as[(String, Long, Long)].collect()
      val restored = cells.groupBy(_._1).toSeq.map { case (g, cs) =>
        (g.toLong, cs.sortBy(_._2).map(c =>
          java.lang.Double.longBitsToDouble(c._3)).toSeq) }
      Similarity.ivfTopKWithCodebook(e, e.filter(col("id") < 10), 3, 2,
          restored.toDF("cluster_id", "cvec"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // topic-balanced sampling: k-means topics (the oracle-replayed
    // deterministic codebook), then <=20 vectors kept per cluster in
    // content-addressed md5 order — the per-cluster rank is the
    // distributed cell rank, never a one-task-per-topic window
    "q_topic_balance" -> ((s, dir) =>
      Similarity.topicBalance(emb(s, dir), 5, 2, 20)
        .orderBy(col("cluster_id"), col("rn"))),
    // ANN rollout gate, nprobe CHOSEN from the recall target (nprobeFor:
    // smallest depth whose measured recall on the capped slice meets
    // 90% — the last manual IVF knob, now derived the way srpBandsFor /
    // lshParamsFor derive theirs, except empirically because IVF recall
    // has no corpus-free analytic form): recall@3 of the chosen probe
    // against the exact brute-force top-3, per query, exact integer
    // ppm. The oracle replays the CURVE and the chooser, so the chosen
    // depth cannot drift between engines
    "q_ann_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("id") < 10)
      val np = Similarity.nprobeFor(e, q, 3, annTargetPpm)
      Similarity.recallAtK(
          Similarity.bruteForceTopK(q, e, 3),
          Similarity.ivfTopK(e, q, 3, np), 3)
        .orderBy(col("query_id"))
    }),
    // the recall/nprobe CURVE itself, recorded and hash-gated: one row
    // per probe depth 1..C with exact-integer hit counts and ppm recall
    // against brute-force truth on the capped slice — the measurement
    // nprobeFor chooses from, and the artifact a 100 TB rollout reads
    // before picking its probe budget
    "q_ann_nprobe_curve" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.nprobeRecallCurve(e, e.filter(col("id") < 10), 3)
        .orderBy(col("nprobe"))
    }),
    // the same IVF probe over the UNSUPERVISED deterministic k-means
    // codebook (md5-seeded init, 2 fixed iterations, decimal-exact
    // means) — the no-label-column path. The DuckDB oracle replays the
    // whole construction: seeds, both assignment+update rounds, then the
    // probe — so the codebook itself is hash-gated, not just the top-k
    "q_ann_kmeans" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopKWithCodebook(e, e.filter(col("id") < 10), 3, 2,
        Similarity.kmeansCodebook(e, 5, 2))
        .orderBy(col("query_id"), col("rank"))
    }),
    // the no-model text→vector bridge: feature-hashed (±1 signed count)
    // doc vectors fed straight into the exact cosine top-k — planted
    // near-dups surface at ≈0.99 without any embedding model
    "q_hashed_vectors_topk" -> ((s, dir) => {
      val v = TextAnalysis.hashedDocVectors(docs(s, dir), "text", "doc_id")
        .filter(Similarity.norm(col("vec")) > 0.0d)
        .select(col("doc_id").as("id"), col("vec"))
      Similarity.bruteForceTopK(v.filter(col("id") < 5), v, 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    // reciprocal kNN pairs: kept only if each ranks in the OTHER's
    // top-3 (hub suppression); the mutual filter is an |n·k| self-join
    // over whatever ranking feeds it — brute force here, IVF at scale
    "q_mutual_knn" -> ((s, dir) => {
      val e = emb(s, dir).filter(col("id") < 200)
      Similarity.mutualTopK(Similarity.bruteForceTopK(e, e, 3))
        .orderBy(col("vec_a"), col("vec_b"))
    }),
    // margin-based bitext candidate mining (Artetxe-Schwenk ratio
    // margin, the LASER/CCMatrix construction rule): cross-side pairs
    // (even vs odd ids) scored with the 1e-9-unit integer cosine, both
    // directions ranked, margin_q = c·2k·1e6 DIV (Σₖa + Σₖb) in exact
    // integer arithmetic; top-50 candidates. The pair stage is
    // pluggable — brute baseline on a CORPUS-CAPPED slice here (the
    // guard refuses the unguarded quadratic; ANN candidates are the
    // scale path), the margin stage itself linear in whatever feeds it
    "q_bitext_margin" -> ((s, dir) =>
      Similarity.marginMining(
          Similarity.bitextPairs(emb(s, dir).filter(col("id") < 5000)), 4)
        .orderBy(col("margin_q").desc, col("qa"), col("qb")).limit(50)),
    // the ANN-fed margin path — the 100 TB bitext story the brute
    // stage's guard names: SRP band signatures on both sides, DISTINCT
    // cross-side band-collision pairs (≈3.5% of A×B on the fixtures,
    // corpus-linear at fixed collision rate), the identical integer
    // cosine on survivors, the identical margin stage. UNCAPPED corpus
    // (no id < 5000 slice): the candidate stage is the thing that makes
    // the cap unnecessary. Band width is CHOSEN from the corpus count
    // (srpBandsFor: smallest divisor-of-64 width with 2^r ≥ n/16, the
    // occupancy-held banding that keeps candidate volume near-linear as
    // corpora grow). Oracle replays chooser → planes → bits → bands →
    // candidates → cosine → margin end-to-end
    "q_bitext_margin_ann" -> ((s, dir) =>
      Similarity.marginMining(
          Similarity.bitextPairsSrpAuto(emb(s, dir), srpK), 4)
        .orderBy(col("margin_q").desc, col("qa"), col("qb")).limit(50)),
    // the SRP candidate stage's ROLLOUT GATE (the lshRecall analog):
    // on the corpus-capped slice where the brute stage is affordable,
    // how many of the brute margin top-50 survive as band-collision
    // candidates under the auto-chosen banding — the documented
    // recall-<1-vs-brute trade as a recorded, oracle-gated number —
    // AND what the multi-probe expansion buys back (all r Hamming-1
    // bucket flips on side A): near-random synthetic embeddings put
    // single-probe recall in the 16–34% range at these SFs; the probe
    // columns record the raised recall and its candidate-volume cost
    "q_bitext_srp_recall" -> ((s, dir) =>
      Similarity.bitextSrpRecall(emb(s, dir).filter(col("id") < 5000),
        kBits = srpK)),
    // embedding health gate: per-dim counts of non-finite / zero-norm
    // vectors + the norm envelope in integer micros — the pre-index
    // data contract of the ANN family, one aggregate pass
    "q_vector_health" -> ((s, dir) =>
      Similarity.vectorHealth(emb(s, dir)).orderBy(col("dim"))),
    // clustering-quality gate: centroid-based (simplified) silhouette
    // over the same deterministic k-means codebook — per-cluster count
    // + integer-nano silhouette sum (mean = consumer's division). The
    // oracle replays the codebook AND the per-vector score arithmetic.
    "q_silhouette" -> ((s, dir) =>
      Similarity.silhouette(emb(s, dir), 5, 2)
        .orderBy(col("cluster_id"))),
    // product-quantization ADC top-k: 4 subspaces × 16 dims, each with
    // its own deterministic k-means codebook; query-time scoring is m
    // broadcast LUT joins over per-vector codes — the searched
    // representation is 4 codes/vector, never the raw embeddings. The
    // oracle replays all 4 subspace codebooks, the code assignment, the
    // LUTs, and the fixed-order ADC sum.
    "q_ann_pq" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.pqTopK(e, e.filter(col("id") < 10), 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    // IVF+PQ+refine — the FAISS-IVFPQ-shaped three-stage search: coarse
    // k-means probe prunes to nprobe=2 clusters, PQ-ADC scores only the
    // pruned candidates, the top k·overfetch shortlist re-scores in
    // full precision. The oracle replays coarse codebook, 4 subspace
    // codebooks, probe, ADC and refine bit-for-bit.
    "q_ann_ivf_pq" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfPqTopK(e, e.filter(col("id") < 10), 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    // int8-quantized two-stage top-k (coarse codes -> exact re-score);
    // the DuckDB oracle replays quantization, dequantized coarse ranking
    // and the full-precision rescore — recall is ALSO property-tested
    "q_quantized_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.quantizedTopK(e.filter(col("id") < 10), e, 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    // SemDeDup-shaped semantic dedup: k-means clusters (the same
    // oracle-replayed deterministic codebook as q_ann_kmeans), then the
    // keep-first rule within clusters — dropped iff a smaller-id
    // cluster-mate sits at 9-dp cosine >= 0.4. Census output proves
    // keeps AND drops
    "q_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(emb(s, dir), 5, 2, 0.4)
        .orderBy(col("vec_id"))),
    // per-label mean-pooled embedding prototypes (long form): the
    // DECIMAL-exact class-centroid build every prototype/bi-encoder
    // pipeline runs — one posexplode + one partial-aggregated shuffle
    "q_mean_pool" -> ((s, dir) =>
      Similarity.meanPool(emb(s, dir), "label")
        .orderBy(col("g"), col("pos"))),
    // PCA in the 100 TB shape: ONE partial-agg pass builds the 7×7
    // homogeneous Gram (shuffle = 49 rows/task), the driver solves the
    // bounded 6×6 scatter with integer-exact power iteration (6 fixed
    // rounds, BigInt truncating division == the oracle's HUGEINT //),
    // and projection is a map-only zip_with dot against the broadcast
    // component — pc1 = n·(q·v) − Σsᵢvᵢ, the exact image of n(q−μ)·v.
    // The quality-feature scatter is ~2000:1 dominant, so 6 rounds hit
    // the true eigenvector (PcaSpec pins the fixed point and Σpc1 = 0)
    // projection now emits BOTH components: pc1 the size factor, pc2
    // the deflated quality residual a curation filter thresholds —
    // still one map-only pass, two broadcast-literal dot products
    "q_pca_project" -> ((s, dir) =>
      Pca.project(Pca.docFeatures(docs(s, dir))).orderBy(col("id"))),
    // the solved components, k=2 via rank-1 deflation: PC1 is the size
    // factor, PC2 the quality residual — 12 loadings at 1e6 scale +
    // explained-variance ppm vs the ORIGINAL scatter, all from the
    // SAME bounded (D+1)² Gram (zero extra data passes; the deflated
    // iteration runs 80 fixed rounds, past the measured fixed point)
    "q_pca_components" -> ((s, dir) =>
      Pca.components(Pca.docFeatures(docs(s, dir)))
        .orderBy(col("comp"), col("i"))),
    // uniform negative sampling for contrastive batches: seeded-hash
    // draws (md5_60 mod n — no RNG state), one broadcast equi-join
    // fetch, over-draw-and-filter to true negatives
    "q_neg_sample" -> ((s, dir) =>
      Similarity.uniformNegatives(
          s.read.parquet(s"$dir/embeddings.parquet"), 10, 8)
        .orderBy(col("query_id"), col("i"))),
    // the SUBQUADRATIC codebook path (round 8): two-level k1×k2
    // clustering — coarse broadcast codebook, then k-means trained per
    // coarse GROUP in parallel with no driver collect — so assignment
    // costs O(n·√k) instead of flat-k-means' O(n·k) = O(n²/occ) when k
    // tracks the corpus; same keep-first census, the whole two-level
    // construction replayed by the oracle. semanticDedupAuto routes
    // here with k1 ≈ k2 ≈ √(n/occ); measured 1.9× for 10× rows at sf1
    // where the fixed-k flat form drifts 6.5×
    "q_semantic_dedup_hier" -> ((s, dir) =>
      Similarity.semanticDedupHier(emb(s, dir), 3, 4, 2, 0.4)
        .orderBy(col("vec_id"))),
    // the RECOMMENDED production route, now itself hash-gated: k derived
    // from one count (k = ceil(n/64), split k1 = ceil(sqrt(k)), k2 =
    // max(2, ceil(k/k1))) so cluster occupancy — and the pair stage —
    // stays constant as the corpus grows; the oracle derives the same
    // (k1, k2) from count(*) inside the SQL
    "q_semantic_dedup_auto" -> ((s, dir) =>
      Similarity.semanticDedupAuto(emb(s, dir), 2, 0.4)
        .orderBy(col("vec_id"))),
    // embedding-cosine near-dup pairs, blocked by cluster (no cross join)
    "q_cosine_neardup" -> ((s, dir) =>
      Similarity.cosineNearDup(emb(s, dir), 0.4)
        .orderBy(col("id_a"), col("id_b"))),
    // the recursive-blocking scale path: label clusters above 64 members
    // are split (exercised at every SF — fixture labels are larger), far
    // sub-block pairs pruned by the triangle-inequality bound, and the
    // result is EXACTLY cosineNearDup's — hence the identical oracle
    "q_cosine_neardup_blocked" -> ((s, dir) =>
      Similarity.cosineNearDupBlocked(emb(s, dir), 0.4, maxBlock = 64)
        .orderBy(col("id_a"), col("id_b"))),
    // dedup threshold sweep: survivors per tau from ONE verified pair
    // pass — the release artifact that prices the dedup threshold
    "q_dedup_sweep" -> ((s, dir) =>
      Similarity.dedupThresholdSweep(emb(s, dir), Seq(0.4, 0.45, 0.5),
        maxBlock = 64)),
    // approximate near-dup via sign-random-projection LSH: deterministic
    // ±1 hyperplanes → k sign bits → banded equi-join candidates → exact
    // verify. Band width r=8 is the HIGH-similarity dedup operating point
    // (recall ≈ 0.93 at cos 0.9, ~3% candidate rate on orthogonal noise);
    // on this fixture's weak-similarity pairs (max cos ≈ 0.5) recall is
    // accordingly partial — the oracle REPLAYS the algorithm, so the
    // gate is exact regardless; recall is property-tested on planted
    // high-cosine pairs in SimilaritySpec
    "q_srp_neardup" -> ((s, dir) =>
      Similarity.srpNearDup(emb(s, dir), 0.4)
        .orderBy(col("id_a"), col("id_b"))),
    // sparse idf-weighted shingle cosine JOIN over raw text — the
    // no-embedding similarity path: inverted-index candidates (pairs
    // sharing >=1 shingle), integer weights (milli-unit idf). The df
    // cap is DERIVED from a candidate budget (32 pairs/doc) so the
    // pair volume scales linearly with the corpus; the oracle replays
    // the derivation from the df histogram
    "q_sparse_cosine" -> ((s, dir) =>
      Similarity.tfidfCosineJoinBudgeted(docs(s, dir), "text", "doc_id",
          minCos = 0.5, pairsPerDoc = 32, shingleN = 3)
        .orderBy(col("doc_a"), col("doc_b"))),
    // hybrid retrieval: query-by-document BM25 (integer milli-unit
    // scores, multi-query shared corpus pass) fused with dense cosine
    // top-20 by reciprocal-rank fusion — pure integer ppb contributions
    // `1e9 div (60 + rank)`, so the fused ranking is float-free and the
    // oracle replays both lists and the fusion end-to-end
    "q_hybrid_rrf" -> ((s, dir) => {
      val d = docs(s, dir)
      val e = emb(s, dir)
      val qt = Retrieval.queryTermsFromDocs(
        d.filter(col("doc_id") < 5), "text", "doc_id", 4)
      val lex = Retrieval.bm25Ranks(d, "text", "doc_id", qt, 20,
          excludeSelf = true)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val dense = Similarity.bruteForceTopK(e.filter(col("id") < 5), e, 20)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(lex, dense), rrfK = 60, topN = 10)
        .orderBy(col("query_id"), col("rank"))
    }),
    // retrieval rollout gate: MRR + binary-relevance nDCG@10 of the
    // BM25 ranking against metadata truth (same-lang docs — the weak
    // label lexical retrieval CAN recover, since same-lang docs share
    // vocabulary; same-source scores 0 here, which the metric correctly
    // reports). All metric arithmetic is integer (position gains are
    // inlined round(1e6/log2(i+1)) constants), so the gate is
    // hash-exact; eval cost is |queries|·k past the ranking it grades
    "q_retrieval_quality" -> ((s, dir) => {
      val d = docs(s, dir)
      val qd = d.filter(col("doc_id") < 5)
      val qt = Retrieval.queryTermsFromDocs(qd, "text", "doc_id", 4)
      val ranked = Retrieval.bm25Ranks(d, "text", "doc_id", qt, 10,
        excludeSelf = true)
      val truth = d.select(col("doc_id"), col("lang"))
        .join(broadcast(qd.select(col("doc_id").as("query_id"), col("lang"))),
          Seq("lang"))
        .filter(col("query_id") =!= col("doc_id"))
        .select(col("query_id"), col("doc_id"))
      Retrieval.retrievalQuality(ranked, truth, 10)
        .orderBy(col("query_id"))
    }))

  // §2b LLM-pipeline: text analysis over `documents`.
  private def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // χ² feature selection: terms associated with a language at the 5%
    // critical value, exact integer ppm — the vocabulary a
    // lang-specific quality filter or classifier should look at first
    "q_chi2_terms" -> ((s, dir) =>
      TextAnalysis.chi2Terms(docs(s, dir), "text", "lang", "doc_id")
        .orderBy(col("label"), col("chi2_ppm").desc, col("term"))),
    // corpus stats per (lang, source): docs, chars, ws + BPE-ish tokens
    "q_text_stats" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("sum_chars"),
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"),
          sum(TextAnalysis.bpeTokenCount(col("text"))).as("sum_bpe_tokens"))
        .orderBy(col("lang"), col("source"))),
    // per-doc quality metrics + composite score
    "q_quality" -> ((s, dir) =>
      TextAnalysis.quality(docs(s, dir), "text", "doc_id").orderBy(col("doc_id"))),
    // PII redaction scrub: deterministic synthetic PII (emails on ids
    // %3, phones %4, IPv4s %5) planted into the fixture text by BOTH
    // engines, then redacted; the md5 fingerprint of the redacted text
    // makes every replaced byte oracle-checked, the counts audit recall
    "q_redact" -> ((s, dir) => {
      val planted = docs(s, dir).withColumn("ptext",
        concat(col("text"),
          when(col("doc_id") % 3 === 0, concat(lit(" reach user"),
            col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 4 === 0, concat(lit(" call +1 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, concat(lit(" from 10.0."),
            (col("doc_id") % 256).cast("string"), lit("."),
            (col("doc_id") % 250).cast("string"))).otherwise(lit(""))))
      val (ne, np, ni) = TextAnalysis.piiCounts(col("ptext"))
      planted.select(col("doc_id"),
          ne.cast("long").as("n_email"), np.cast("long").as("n_phone"),
          ni.cast("long").as("n_ip"),
          md5(TextAnalysis.redactPii(col("ptext"))).as("fp"))
        .orderBy(col("doc_id"))
    }),
    // self-trained unigram LM per-doc average log-prob — the cheap
    // perplexity-family quality filter; per-token 6-dp rounding before a
    // DECIMAL sum keeps both engines' doubles identical
    "q_unigram_logprob" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(docs(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))),
    // Kneser-Ney smoothed bigram LM (d=0.75, continuation-count
    // backoff) — the top of the perplexity ladder and the smoothing a
    // KenLM-style quality filter actually runs: defined for every
    // corpus bigram (no -inf docs), distinguishes plausible-but-unseen
    // word order from alien order via continuation counts
    "q_kn_logprob" -> ((s, dir) =>
      TextAnalysis.knBigramLogProb(docs(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))),
    // multinomial Naive-Bayes language classifier on a deterministic
    // id-mod 80/20 split — the fastText-class curation filter whose
    // training is pure counting (and therefore exactly SQL-replayable);
    // held-out accuracy is the filter's rollout gate
    "q_nb_classify" -> ((s, dir) =>
      TextAnalysis.nbClassify(docs(s, dir), "text", "lang", "doc_id")
        .orderBy(col("doc_id"))),
    // calibration of the same classifier: margin-decile buckets with
    // accuracy ppm — the threshold-setting artifact a filter ships with
    "q_nb_calibration" -> ((s, dir) =>
      TextAnalysis.nbCalibration(docs(s, dir), "text", "lang", "doc_id")
        .orderBy(col("bucket"))),
    // bigram conditional LM — one step up the perplexity ladder (word
    // ORDER, not just word choice); counts shuffle-join (scale-honest)
    "q_bigram_logprob" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(docs(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))),
    // PMI collocations: top adjacent word pairs by the exact integer
    // PMI ratio in ppm (a monotone transform of ln-PMI — no float log
    // anywhere) — the phrase-merge candidate list a vocab pipeline
    // extracts before tokenizer training
    "q_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(docs(s, dir), "text",
        minCount = 5, topK = 20)),
    // SymSpell deletion-neighborhood spelling correction over a
    // planted 1/16 typo stream (md5-derived, both engines replay the
    // derivation): candidates come from a pure equi-join against the
    // vocab deletion index — never an edit-distance cross product —
    // best = (distance, −count, word); on the fixture corpus every
    // planted typo recovers its source word
    "q_spell_correct" -> ((s, dir) =>
      TextAnalysis.spellCorrect(docs(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"), col("pos"))),
    // char-level Shannon entropy per doc: gibberish/boilerplate signal
    "q_char_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(docs(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))),
    // word-trigram repetition ratio per (lang, source) — the corpus-level
    // repetitiveness audit; per-doc ratios aggregate through exact
    // DECIMAL so the mean is bit-stable cross-engine
    "q_repetition" -> ((s, dir) =>
      docs(s, dir).select(col("lang"), col("source"),
          TextAnalysis.repetitionRatio(col("text")).as("rr"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("rr").cast("decimal(16,6)")).cast("double") /
            count(lit(1))).as("mean_repetition"),
          max(col("rr")).as("max_repetition"))
        .orderBy(col("lang"), col("source"))),
    // temperature-flattened (α=1/2) source mixing weights in exact ppm
    // — IEEE sqrt is correctly rounded in both engines, and the
    // normalization is integer-sum integer-division, so the whole
    // model is hash-gated
    "q_mix_temperature" -> ((s, dir) =>
      TextAnalysis.mixTemperatureWeights(docs(s, dir), "source", "text")
        .orderBy(col("source"))),
    // the epoch/repeat plan executing the temperature mix: per source,
    // full passes + an exact-to-the-document md5-order partial pass
    // covering the token remainder — upsampling small sources,
    // truncating large ones, all 64-bit integer
    "q_mix_epochs" -> ((s, dir) =>
      TextAnalysis.mixEpochPlan(docs(s, dir), "source", "text", "doc_id")
        .orderBy(col("source"))),
    // top word-2-gram coverage per doc (Gopher's other repetition
    // signal): most frequent 2-gram, ties lexicographic, coverage in
    // exact integer permille with overlaps counted
    "q_top_ngram" -> ((s, dir) =>
      TextAnalysis.topNgramCoverage(docs(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))),
    // multi-phrase blocklist scan (the toxicity/boilerplate list gate):
    // anchor-and-verify — tokens join the broadcast first-word map,
    // only anchored positions verify the full window against the doc's
    // token array; overlapping matches count, hit docs only
    "q_blocklist" -> ((s, dir) =>
      TextAnalysis.blocklistHits(docs(s, dir), "text", "doc_id",
        blocklistPhrases).orderBy(col("doc_id"))),
    // the per-PHRASE half of the same verified match stream: which
    // list entries fire and how broadly, silent entries at zero — the
    // dead-weight report a list curator reads
    "q_blocklist_phrases" -> ((s, dir) =>
      TextAnalysis.blocklistPhraseStats(docs(s, dir), "text", "doc_id",
        blocklistPhrases).orderBy(col("p"))),
    // the million-phrase ESCAPE as its own gated entry: the phrase list
    // arrives as a TABLE and the anchor join carries NO broadcast hint
    // (plan-pinned) — Catalyst sizes it from stats, so a list too big
    // for the driver shuffles instead of being forced through it. Same
    // verified-match chain, same oracle as q_blocklist
    "q_blocklist_table" -> ((s, dir) =>
      TextAnalysis.blocklistHitsTable(docs(s, dir), "text", "doc_id",
        s.createDataset(blocklistPhrases)(org.apache.spark.sql.Encoders.STRING)
          .toDF("p")).orderBy(col("doc_id"))),
    // dedicated math-function gate (the §2b row previously only "rode"
    // other queries): exact integer ops summed as BIGINT, and the one
    // genuinely floating function (ln) 9-dp-rounded per row then
    // DECIMAL-summed — the family's standard float recipe
    "q_math_fns" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag").as("rf"),
          abs(col("l_partkey") - col("l_suppkey")).as("i_abs"),
          when(col("l_partkey") > col("l_suppkey"), 1)
            .when(col("l_partkey") < col("l_suppkey"), -1).otherwise(0).as("i_sign"),
          (col("l_orderkey") % 7).as("i_mod"),
          expr("l_orderkey DIV 7").as("i_div"),
          greatest(col("l_partkey"), col("l_suppkey")).as("i_max"),
          least(col("l_partkey"), col("l_suppkey")).as("i_min"),
          expr("shiftleft(CAST(1 AS BIGINT), l_linenumber)").as("i_pow2"),
          floor(sqrt(col("l_orderkey").cast("double"))).cast("long").as("i_isqrt"),
          round(log(col("l_extendedprice").cast("double")), 9).as("d_ln"))
        .groupBy(col("rf"))
        .agg(count(lit(1)).as("n"),
          sum(col("i_abs")).as("s_abs"), sum(col("i_sign")).as("s_sign"),
          sum(col("i_mod")).as("s_mod"), sum(col("i_div")).as("s_div"),
          sum(col("i_max")).as("s_max"), sum(col("i_min")).as("s_min"),
          sum(col("i_pow2")).as("s_pow2"), sum(col("i_isqrt")).as("s_isqrt"),
          sum(col("d_ln").cast("decimal(20,9)")).cast("double").as("s_ln"))
        .orderBy(col("rf"))),
    // stopword-profile language ID vs the labeled lang (confusion counts)
    "q_lang_id" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted_lang"))
        .groupBy(col("lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted_lang"))),
    // tokenizer fertility by language: BPE-ish tokens per whitespace
    // word as integer ppm — the multilingual tokenizer-fairness metric
    "q_tokenizer_fertility" -> ((s, dir) =>
      TextAnalysis.tokenizerFertility(docs(s, dir), "text", "lang")
        .orderBy(col("g"))),
    // per-source KL from the corpus unigram mix — the reweighting
    // signal; exact DECIMAL term sums, consumers divide by n_tokens
    "q_source_kl" -> ((s, dir) =>
      TextAnalysis.sourceKl(docs(s, dir), "text", "source")),
    // classifier-governance confusion matrix: where do the cheap
    // (stopword) and char-ngram language IDs disagree — the artifact
    // that decides which docs route to the expensive model
    "q_langid_confusion" -> ((s, dir) =>
      docs(s, dir)
        .select(TextAnalysis.langId(col("text")).as("m_stop"),
          TextAnalysis.langIdNgram(col("text")).as("m_ngram"))
        .groupBy(col("m_stop"), col("m_ngram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("m_stop"), col("m_ngram"))),
    // polynomial rolling-hash content fingerprint per doc
    "q_rollhash" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rhash"))
        .orderBy(col("doc_id"))),
    // char-bigram language ID (n-gram heuristic) confusion counts
    "q_lang_id_ngram" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"), TextAnalysis.langIdNgram(col("text")).as("predicted_lang"))
        .groupBy(col("lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted_lang"))),
    // sparse TF-IDF weights as sorted (doc_id, term, weight) rows —
    // fully hash-checkable against the DuckDB oracle (the map-column
    // form, TextAnalysis.tfidfVectors, assembles these same rows)
    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTerms(docs(s, dir), "text", "doc_id")
        .select(col("doc_id"), col("term"), round(col("weight"), 6).as("weight"))
        .orderBy(col("doc_id"), col("term"))),
    // deterministic train/validation/test split assignment (90/5/5) via
    // a keyed content-stable hash: a document keeps its split across
    // corpus versions and cluster layouts — never assign splits by
    // row_number or rand(), both of which reshuffle when data moves
    "q_split_assign" -> ((s, dir) => {
      val bucket = pmod(Dedup.md5Hash60(col("doc_id").cast("string")), lit(100L))
      docs(s, dir)
        .withColumn("split",
          when(bucket < 90, "train").when(bucket < 95, "validation").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))
        .orderBy(col("lang"), col("split"))
    }),
    // corpus mixing: deterministic stratified sampling to per-language
    // quotas (cap the dominant language, keep low-resource ones whole) —
    // emits the SAMPLED DOC IDS so the gate checks the exact selection,
    // not just the counts
    "q_mix_quota" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(docs(s, dir), "lang", "doc_id",
          Map("en" -> 120L, "de" -> 60L, "es" -> 60L, "fr" -> 60L, "zh" -> 60L))
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))),
    // context-window packing: concat-then-chunk documents into 4096-token
    // bins via a distributed two-phase prefix sum (no single-task global
    // window)
    "q_pack_bins" -> ((s, dir) =>
      Pack.packBins(docs(s, dir), "text", "doc_id", 4096L)
        .orderBy(col("bin"))),
    // the materialized context windows: per bin, md5 of the id-ordered
    // newline-joined document texts — pins every byte of every window
    "q_pack_text" -> ((s, dir) =>
      Pack.packedSequences(docs(s, dir), "text", "doc_id", 4096L)
        .orderBy(col("bin"))),
    // domain-interleaved training order: round-robin over sources in
    // md5(id) shuffle order; the engine computes each doc's global
    // position ARITHMETICALLY from broadcast domain counts (no
    // one-task global window) while the oracle runs the naive global
    // sort — the gate is the equality proof
    "q_interleave" -> ((s, dir) =>
      Pack.interleave(docs(s, dir), "source", "doc_id")
        .orderBy(col("position"))),
    // deterministic content-addressed global corpus shuffle: position
    // = two-phase distributed rank of (md5('gs_'‖id), id) — 256
    // md5-prefix cells, local sorts, broadcast offsets; the oracle
    // runs the naive single-window sort, making the gate the proof
    // that cell arithmetic equals the global order
    "q_global_shuffle" -> ((s, dir) =>
      Pack.globalShuffle(docs(s, dir), "doc_id")
        .orderBy(col("pos"))),
    // corpus vocabulary: top-20 tokens by frequency (Zipf head)
    "q_token_topk" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(split(col("text"), " ")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t"))
        .limit(20)),
    // adaptive quality gate: keep documents scoring at or above their
    // OWN language's mean quality (integer-ppm arithmetic end-to-end —
    // sum div count, never a float mean), the per-domain thresholding a
    // curation pipeline applies instead of one global cutoff. Two-phase:
    // per-lang aggregate (5 rows, broadcast back), then a counted gate
    "q_adaptive_quality" -> ((s, dir) => {
      val d = docs(s, dir).select(col("lang"),
        TextAnalysis.qualityPpm(col("text")).as("ppm"))
      val thr = d.groupBy(col("lang"))
        .agg(expr("sum(ppm) div count(1)").as("thr_ppm"),
          count(lit(1)).as("n_total"))
      d.join(broadcast(thr), Seq("lang"))
        .groupBy(col("lang"))
        .agg(max(col("thr_ppm")).as("thr_ppm"), max(col("n_total")).as("n_total"),
          sum(when(col("ppm") >= col("thr_ppm"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("lang"))
    }),
    // out-of-vocabulary rate: vocabulary = tokens seen >= 2 times in the
    // deterministic train split; per-lang OOV token share of the eval
    // split — the tokenizer-coverage health check run before training.
    // Exact integers end-to-end (permille via integer division)
    "q_oov_rate" -> ((s, dir) => {
      val bucket = pmod(Dedup.md5Hash60(col("doc_id").cast("string")), lit(100L))
      val tok = docs(s, dir).withColumn("is_train", bucket < 90)
        .select(col("lang"), col("is_train"),
          explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "")
      val vocab = tok.filter(col("is_train")).groupBy(col("t"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .select(col("t"), lit(1).as("in_vocab"))
      tok.filter(!col("is_train"))
        .join(vocab, Seq("t"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_permille", expr("n_oov * 1000 div n_tokens"))
        .orderBy(col("lang"))
    }),
    // BM25 keyword search: top-10 docs for a 3-term query
    "q_bm25" -> ((s, dir) =>
      TextAnalysis.bm25Search(docs(s, dir), "text", "doc_id",
        Seq("spark", "table", "query"), 10)
        .orderBy(col("score").desc, col("doc_id"))),
    // exact tie-aware ROC-AUC per source of the quality score
    // predicting lang='en' — the threshold-free filter-discrimination
    // gate; the corpus collapses to the per-(source, score) class
    // histogram before the one cumulative window over the bounded
    // distinct-score spine
    "q_binary_auc" -> ((s, dir) =>
      Profile.binaryAuc(docs(s, dir), Seq("source"),
          TextAnalysis.qualityPpm(col("text")), col("lang") === "en")
        .orderBy(col("source"))),
    // DSIR-shaped data selection (Xie et al. 2023): hashed-unigram
    // importance weights target/raw in exact integer ppm (DECIMAL(38,0)
    // product, add-1 smoothing), non-target docs scored by per-token
    // mean weight, top-quota kept via TakeOrdered — the corpus reduces
    // to 2×256 bucket counts plus one broadcast-join scoring pass
    "q_dsir_select" -> ((s, dir) =>
      TextAnalysis.dsirSelect(docs(s, dir), "text", "doc_id", "lang",
          targetLang = "en", buckets = 256, quota = 50)
        .orderBy(col("score_ppm").desc, col("doc_id"))),
    // Heaps-law vocabulary growth over 10 md5(doc_id)-sliced corpus
    // fractions: a token's first slice is min(slice), so the cumulative
    // vocabulary needs two grouped aggs and a 10-row window — no
    // corpus sort, no per-token rank
    "q_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(docs(s, dir), "text", "doc_id", 10)
        .orderBy(col("slice"))))

  // §2b multimodal: binary media blobs with typed metadata; codecs are
  // deterministic stubs, the Spark plumbing (schema, header decode,
  // sampling expressions, partition-wise batch extraction) is real.
  private def multimodalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // header decode → typed metadata aggregation (oracle recomputes the
    // expected metadata from vec_id, checking the encode→decode path)
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(Multimodal.synthesize(
          s.read.parquet(s"$dir/embeddings.parquet")))
        .groupBy(col("channels"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("payload_bytes")).as("sum_payload_bytes"),
          min(col("width")).as("min_width"), max(col("width")).as("max_width"),
          min(col("height")).as("min_height"), max(col("height")).as("max_height"))
        .orderBy(col("channels"))),
    // stubbed decode+resize / frame-sampling kernels (codegen'd
    // expressions) + mapPartitions batch feature extraction
    "q_multimodal_thumb" -> ((s, dir) => {
      val blobs = Multimodal.synthesize(s.read.parquet(s"$dir/embeddings.parquet"))
      blobs.select(
          col("media_id"),
          length(Multimodal.thumbnail(col("blob"), 7)).as("thumb_bytes"),
          (length(Multimodal.frameSample(col("blob"), 16, 2)) / 16).as("n_frames_kept"))
        .orderBy(col("media_id"))
    }),
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
          Multimodal.synthesize(s.read.parquet(s"$dir/embeddings.parquet")))
        .select(col("media_id"), col("payload_bytes"),
          round(col("byte_mean"), 6).as("byte_mean"),
          round(col("byte_var"), 6).as("byte_var"))
        .orderBy(col("media_id"))),
    // perceptual-hash image dedup on the stub kernel: 60-bit positional
    // byte-bucket pHash (exact integer mean compares), 4×15-bit chunk
    // pigeonhole candidates, bit_count verify — finds the planted
    // one-byte-perturbed twins, zero false positives on the fixture
    "q_phash_neardup" -> ((s, dir) =>
      Multimodal.phashNearDup(
          Multimodal.withPlantedTwins(
            Multimodal.synthesize(s.read.parquet(s"$dir/embeddings.parquet"))))
        .orderBy(col("media_a"), col("media_b"))),
    // local-mean pHash twin: each bucket thresholds against its
    // 15-bucket BLOCK's mean, so a one-byte perturbation can only
    // disturb its own block's 15 bits — recovers the global variant's
    // honest misses (49/50 vs 46/50 planted twins, still zero false
    // positives), same plan shape
    "q_phash_neardup_local" -> ((s, dir) =>
      Multimodal.phashNearDup(
          Multimodal.withPlantedTwins(
            Multimodal.synthesize(s.read.parquet(s"$dir/embeddings.parquet"))),
          local = true)
        .orderBy(col("media_a"), col("media_b"))),
    // media dedup clusters: verified local-pHash pairs closed into
    // connected components via the SAME pointer-jumping operator the
    // text dedup family uses — one cluster per twin group
    "q_phash_clusters" -> ((s, dir) => {
      val pairs = Multimodal.phashNearDup(
          Multimodal.withPlantedTwins(
            Multimodal.synthesize(s.read.parquet(s"$dir/embeddings.parquet"))),
          local = true)
        .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
      Dedup.nearDupClusters(pairs)
        .select(col("doc_id").as("media_id"), col("cluster_id"))
        .orderBy(col("media_id"))
    }))

  // §2b: JSON extraction, event-time windows, as-of join, streaming-shaped
  // windowed checksum over `events`.
  private def eventQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_stats" -> ((s, dir) =>
      Events.jsonStats(Events.read(s, dir)).orderBy(col("event_type"))),
    // per-series OLS metric-drift trend; coefficients emitted as exact
    // num/den digit strings (one partial-agg pass, zero float folds) —
    // epoch0 = 2024-01-01 UTC, the fixture's first day
    "q_linear_trend" -> ((s, dir) =>
      Events.linearTrend(Events.read(s, dir), "event_type", "value",
          epoch0Sec = 1704067200L)
        .orderBy(col("event_type"))),
    // Kaplan–Meier time-to-first-high-value-event survival curve (log
    // domain, 6-dp-quantized per-day terms): users as subjects,
    // right-censored at their last event — the churn/engagement curve
    // with the censoring a naive "avg days to event" silently fakes
    "q_survival" -> ((s, dir) =>
      Events.kmSurvival(Events.read(s, dir), col("value") > 150.0)
        .orderBy(col("day"))),
    // top-5 trend-residual outliers per series: exact integer-micro
    // residuals against the series' own OLS fit (floor-division
    // quantization identical in both engines), top-k via the bounded-
    // heap two-phase — the oracle runs the UNREDUCED per-series window
    // rank, so the gate proves the reduction invisible
    "q_trend_outliers" -> ((s, dir) =>
      Events.trendOutliers(Events.read(s, dir), "event_type", "value",
          "event_id", epoch0Sec = 1704067200L, k = 5)
        .withColumnRenamed("g", "event_type")
        .withColumnRenamed("id", "event_id")
        .orderBy(col("event_type"), col("rk"))),
    // Benford first-digit audit per event type: digits from the integer
    // micro-unit string, observed shares exact ppm, expectations as
    // shared literal constants — the fabricated-data / unit-mix alarm
    "q_benford" -> ((s, dir) =>
      Events.benford(Events.read(s, dir), "event_type", "value")
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"), col("digit"))),
    // two-sample KS drift between the view and purchase value
    // distributions over the centi-unit spine — exact cross-multiply
    // CDF comparison, one summary row
    "q_ks_drift" -> ((s, dir) =>
      Events.ksDrift(Events.read(s, dir), "event_type", "value",
        "view", "purchase")),
    "q_event_daily" -> ((s, dir) =>
      Events.dailyAgg(Events.read(s, dir)).orderBy(col("day"), col("event_type"))),
    // ordered view -> click -> purchase conversion funnel on per-user
    // first occurrences. Gated at µs resolution (ts_us / epoch_us) so
    // both engines compare IDENTICAL integers even if DuckDB's parquet
    // reader truncates the NANOS column — a sub-µs tie must not be able
    // to split the hash at some SF; the operator itself defaults to
    // ns-exact ts_ns for in-engine use
    "q_funnel" -> ((s, dir) =>
      Events.funnel(Events.read(s, dir), Seq("view", "click", "purchase"),
          tsCol = "ts_us")
        .orderBy(col("stage_idx"))),
    "q_asof_join" -> ((s, dir) =>
      Events.asofJoin(Events.read(s, dir), "click", "purchase").orderBy(col("event_id"))),
    // the forward twin: each purchase paired with the NEXT click — the
    // fill-backward half of the as-of enrichment pair
    "q_asof_forward" -> ((s, dir) =>
      Events.asofJoin(Events.read(s, dir), "click", "purchase",
        direction = "forward").orderBy(col("event_id"))),
    // last-touch attribution: each purchase's value credited to the
    // campaign (k mod 10) of the user's most recent click; touchless
    // purchases report under 'unattributed' so revenue is conserved
    "q_attribution" -> ((s, dir) =>
      Events.attribution(Events.read(s, dir), "click", "purchase")
        .orderBy(col("campaign"))),
    // gap-based sessionization (30-minute idle gap)
    "q_sessionize" -> ((s, dir) =>
      Events.sessionize(Events.read(s, dir), 1800000000L)
        .orderBy(col("user_id"), col("session_no"))),
    // SCD Type-2 dimension history: per-user event_type run intervals
    // [valid_from, valid_to) in exact µs, open current run — two
    // windows over one (user, ts, id) sort, null-safe run collapse
    "q_scd2" -> ((s, dir) =>
      Events.scd2(
          Events.read(s, dir).filter(col("user_id") < 50),
          "user_id", "event_type", "ts_us", "event_id")
        .orderBy(col("user_id"), col("valid_from_us"), col("change_id"))),
    // range (interval-containment) join: events joined back into their
    // containing session windows via bin-bucketed equi-join — per-session
    // counts must reproduce q_sessionize's n_events
    "q_range_join" -> ((s, dir) => {
      val ev = Events.read(s, dir)
      val sessions = Events.sessionize(ev, 1800000000L)
        .select(col("user_id"), col("session_no"), col("ts_start_us"), col("ts_end_us"))
      RangeJoin(ev.select(col("user_id"), col("ts_us")), "ts_us",
          sessions, "ts_start_us", "ts_end_us", Seq("user_id"), 3600000000L)
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_no"))
    }),
    // lag/lead/rank + running frame sum per user
    "q_window_lag" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      Events.read(s, dir).filter(col("user_id") < 20)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
        .withColumn("prev_event_id", lag(col("event_id"), 1).over(w))
        .withColumn("next_event_id", lead(col("event_id"), 1).over(w))
        .withColumn("seq", row_number().over(w))
        .withColumn("running_value",
          sum(col("value").cast("decimal(20,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"))
        .drop("value")
        .orderBy(col("user_id"), col("seq"))
    }),
    // Z-order (Morton) clustering key: bit-interleaved (value, user)
    // coordinates — the multi-dim pruning layout; the key arithmetic is
    // oracle-replayed, the bounding-box benefit is LayoutSpec's job
    "q_zorder" -> ((s, dir) => {
      val ev = Events.read(s, dir)
      val qx = Layout.quantize(col("value"), 10)
      val qy = pmod(col("user_id"), lit(1024L))
      ev.select(Layout.zorder2(qx, qy, 10).as("z"))
        .groupBy(expr("z div 4096").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("z")).as("min_z"), max(col("z")).as("max_z"))
        .orderBy(col("n").desc, col("zbucket"))
        .limit(20)
    }),
    // hive-partitioned documents layout: written once partitionBy(lang),
    // read back with the lang predicate resolved as DIRECTORY pruning
    // (PartitionFilters, pinned in PlanShapeSpec) — the oracle replays
    // the aggregate over the unpartitioned original, so the gate proves
    // the layout roundtrip loses nothing
    "q_partition_prune" -> ((s, dir) =>
      Layout.partitionedDocs(s, dir)
        .filter(col("lang").isin("en", "zh"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"), col("source"))),
    // small-files compaction: documents fragmented to 64 shards, then
    // rewritten at a byte-size target (Layout.compact) — the oracle
    // aggregates per-text md5 over the ORIGINAL table, so the gate
    // proves the maintenance rewrite is byte-identical content
    "q_compaction" -> ((s, dir) =>
      Layout.compactedDocs(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text").cast("binary"))).as("n_distinct_texts"))
        .orderBy(col("lang"))),
    // bucket-colocated src⋈dst: both snapshots bucketBy(8, k) at write
    // time, so the equi-join runs with ZERO hash-partitioning exchange
    // (pinned in PlanShapeSpec) — the shuffle was paid once in the
    // layout job, amortized over every later diff/join at 100 TB
    "q_bucket_join" -> ((s, dir) => {
      val src = Layout.bucketedSnapshot(s, dir, "src")
      val dst = Layout.bucketedSnapshot(s, dir, "dst").withColumnRenamed("v", "dv")
      src.hint("merge").join(dst, Seq("k"))
        .agg(count(lit(1)).as("n_matched"),
          sum(when(col("v") === col("dv"), 1L).otherwise(0L)).as("n_equal"),
          sum((length(col("v")) + length(col("dv"))).cast("long")).as("sum_len"))
    }),
    // distribution window functions: quartile assignment + cumulative
    // distribution + percent rank per event type (total order via the
    // unique event_id tiebreak, so both engines tile identically)
    "q_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Events.read(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("tile", ntile(4).over(w))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .orderBy(col("event_type"), col("value"), col("event_id"))
    }),
    // pivot: wide per-day event-type counts
    "q_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Events.read(s, dir)
        .withColumn("day", date_format(timestamp_micros(
          expr("ts_ns DIV 86400000000000") * lit(86400000000L)), "yyyy-MM-dd"))
        .groupBy(col("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("day"))
    }),
    // sliding event-time windows (2-day window, 1-day slide): each event
    // lands in exactly two windows — the overlap form the tumbling
    // dailyAgg can't express
    "q_event_sliding" -> ((s, dir) =>
      Events.read(s, dir)
        .select(window(col("ts"), "2 days", "1 day").as("w"),
          col("value"), col("user_id"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"),
          count_distinct(col("user_id")).as("n_users"))
        .select(date_format(col("w.start"), "yyyy-MM-dd").as("w_start"),
          col("n_events"), col("sum_value"), col("n_users"))
        .orderBy(col("w_start"))),
    // per-day checksum triple of the event stream viewed as KV change
    // records — the continuous-compare transform (same code path drives
    // the Structured Streaming variant); oracle = the SQL crc64 fold
    "q_stream_window_checksum" -> ((s, dir) => {
      val ev = Events.read(s, dir)
      val kv = ev.select(col("ts"),
        col("event_id").cast("string").cast("binary").as("key"),
        col("props").cast("binary").as("value"))
      WindowedChecksum(kv, "ts", "1 day")
        .select(date_format(col("w_start"), "yyyy-MM-dd").as("day"),
          col("crc64_xor"), col("total_kvs"), col("total_bytes"))
        .orderBy(col("day"))
    }))

  // §2b: multi-table broadcast join + remaining parity surface.
  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // revenue per nation: two broadcast dims + one shuffle join
    "q_join_revenue" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),
    // hot-key-safe salted join, provably equal to the plain equi-join.
    // Two-path: keys with >= 1000 fact rows would be salted; this fixture
    // has none (max ~7 lineitems per order), so the whole join takes the
    // unreplicated plain path — which is exactly the point: salting is
    // paid only where skew exists (SkewApproxSpec's planted-hot-key
    // fixture proves the salted path engages and stays row-identical).
    "q_salted_join" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("k"), col("l_quantity"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      Skew.saltedJoin(li, o, "k", 8, hotThreshold = 1000L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),
    // pre-flight join-volume estimate: per-key output rows and share
    // for a type-level event self-join — the many-to-many red-flag
    // artifact (cnt² products) a planner checks before shuffling
    "q_join_hotspots" -> ((s, dir) => {
      val e = Events.read(s, dir)
      Skew.joinHotspots(e, e, "event_type", topK = 10)
    }),
    // join-key skew profile: the topK heaviest keys with exact count,
    // corpus share (ppm) and the recommended salt factor — the
    // diagnostic that sizes saltedJoin's knobs BEFORE the 100 TB run
    "q_skew_profile" -> ((s, dir) =>
      Skew.skewProfile(Events.read(s, dir), "event_type", topK = 10,
        partitions = 32)),
    // DYNAMIC partition overwrite: the second write replaces ONLY the
    // partitions it carries (the 'error' slice, values zeroed) and
    // must leave every other partition intact — static overwrite
    // semantics would wipe them and fail the gate
    "q_dynamic_overwrite" -> ((s, dir) => {
      val tmp = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-dyn-")
        .toString
      val e = Events.read(s, dir)
        .select(col("event_id"), col("value"), col("event_type"))
      e.write.partitionBy("event_type").mode("overwrite").parquet(tmp)
      e.filter(col("event_type") === "error")
        .withColumn("value", lit(0.0d))
        .write.partitionBy("event_type")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),
    // in-flight Observation counters: metrics ride the SAME noop-sink
    // job as the filter pass (zero extra scans), listener-delivered,
    // re-exposed as a 1-row frame the oracle gates exactly
    "q_observed_counters" -> ((s, dir) =>
      Profile.observedCounters(Events.read(s, dir))),
    // ANALYZE-style per-column stats (rows/nonnull/ndv/min/max) — the
    // CBO-input profile; exact ndv here so the oracle replays it, with
    // Sketches.kmvDistinct as the documented 100 TB swap-in
    "q_table_stats" -> ((s, dir) =>
      Profile.tableStats(s.read.parquet(s"$dir/lineitem.parquet"),
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"))
        .orderBy(col("column"))),
    // data-contract validation: six rules over lineitem folded into ONE
    // partial+final aggregate pass (NULL counts as a violation); two
    // rules are deliberately tight so the violation counters are
    // non-trivial
    "q_expectations" -> ((s, dir) =>
      Profile.expectations(s.read.parquet(s"$dir/lineitem.parquet"), Seq(
          "discount_le_10pct" ->
            (col("l_discount").cast("decimal(4,2)") <= lit(0.10).cast("decimal(4,2)")),
          "flag_domain" -> col("l_returnflag").isin("A", "N", "R"),
          "price_positive" -> (col("l_extendedprice") > 0),
          "quantity_lt_45" -> (col("l_quantity") < 45),
          "quantity_range" -> col("l_quantity").between(1, 50),
          "ship_after_jun95" -> (col("l_shipdate") >= "1995-06-01")))
        .orderBy(col("rule"))),
    // k-anonymity suppression (k=4) over (event_type, hour) quasi-
    // identifiers: rows in cells smaller than 4 are dropped before
    // release; the entry reports per-type kept/suppressed counts so
    // the gate pins exactly which rows survived
    "q_k_anon" -> ((s, dir) => {
      val ev = Events.read(s, dir)
        .withColumn("hr", expr("ts_us DIV 3600000000"))
        .select(col("event_id"), col("event_type"), col("hr"))
      val kept = Profile.kAnonFilter(ev, Seq("event_type", "hr"), 4)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          count_distinct(col("hr")).as("n_cells_kept"))
      ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
        .join(kept, Seq("event_type"), "left_outer")
        .select(col("event_type"), col("n_total"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_suppressed"),
          coalesce(col("n_cells_kept"), lit(0L)).as("n_cells_kept"))
        .orderBy(col("event_type"))
    }),
    // deterministic-hash-sampled quantiles vs exact: the 1/8 sample is
    // content-addressed (md5 of event_id), so both engines draw the
    // SAME sample and the oracle checks sampled AND exact together
    "q_approx_quantile" -> ((s, dir) => {
      val ev = Events.read(s, dir)
      val sampled = ev.filter(
        pmod(Dedup.md5Hash60(concat(lit("aq_"), col("event_id").cast("string"))),
          lit(8L)) === 0L)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5D)"), 6).as("p50_sample"),
          round(expr("percentile(value, 0.95D)"), 6).as("p95_sample"))
      val exact = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5D)"), 6).as("p50_exact"),
          round(expr("percentile(value, 0.95D)"), 6).as("p95_exact"))
      sampled.join(exact, Seq("event_type")).orderBy(col("event_type"))
    }),
    // Pareto frontier (maximize totalprice AND recency): two-phase
    // distributed skyline — per-partition local frontier, one-task merge
    "q_skyline" -> ((s, dir) =>
      Skyline.skyline2(
          s.read.parquet(s"$dir/orders.parquet")
            .select(col("o_totalprice").as("a"),
              unix_timestamp(col("o_orderdate")).as("b")),
          "a", "b")
        .select(col("a").as("totalprice"), col("b").as("orderdate_epoch"))
        .orderBy(col("totalprice").desc)),
    // equi-width histogram with exact decimal per-bin sums
    "q_histogram" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(floor(col("l_extendedprice") / 5000.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double").as("sum_price"))
        .orderBy(col("bin"))),
    // rollup (grouping-sets family) with exact decimal sums
    "q_rollup" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),
    // cube (full grouping-sets lattice) over event type × value band
    "q_cube" -> ((s, dir) =>
      Events.read(s, dir)
        .withColumn("value_band", floor(col("value") / 100.0).cast("int"))
        .cube(col("event_type"), col("value_band"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first, col("value_band").asc_nulls_first)),
    // set ops: pairs present in BOTH snapshots (complement of symdiff)
    "q_intersect" -> ((s, dir) =>
      kvStrSrc(s, dir).intersectAll(kvStrDst(s, dir)).orderBy(col("key"))),
    // statistical aggregates: spread + correlation per event type
    "q_stats" -> ((s, dir) =>
      Events.withProps(Events.read(s, dir))
        .groupBy(col("event_type"))
        .agg(
          round(stddev_samp(col("value")), 6).as("sd_value"),
          round(corr(col("value"), col("k").cast("double")), 6).as("corr_value_k"),
          round(covar_samp(col("value"), col("k").cast("double")), 6).as("cov_value_k"))
        .orderBy(col("event_type"))),
    // exact interpolated percentiles per event type
    "q_percentiles" -> ((s, dir) =>
      Events.read(s, dir).groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5D)"), 6).as("p50"),
          round(expr("percentile(value, 0.95D)"), 6).as("p95"))
        .orderBy(col("event_type"))),
    // ordered limit (the reference's batch pagination viewed as a query)
    "q_scan_limit" -> ((s, dir) =>
      Scan.scanLimit(KVSnapshot.src(s, dir), 50)
        .select(upper(hex(col("key"))).as("key_hex"), upper(hex(col("value"))).as("value_hex"))
        .orderBy(col("key_hex"))),
    // API-version probe + equality gate (utils/utils.go:13-26 analog)
    "q_meta_gate" -> ((s, dir) =>
      Gate.check(KVSnapshot.src(s, dir), KVSnapshot.dst(s, dir))),
    // §2a rows 13-17: codec expression library. Not SQL-expressible in
    // DuckDB → rows-only here; the hard signal is CodecSpec's
    // known-answer + roundtrip + order-preservation properties.
    "q_codec_roundtrip" -> ((s, dir) => {
      val enc = KVSnapshot.src(s, dir).select(col("key"),
        CodecExpr.apiV2EncodeKey(col("key")).as("enc"),
        CodecExpr.escapeGo(col("key")).as("esc"))
      enc.agg(
        count(lit(1)).as("n_keys"),
        sum(when(CodecExpr.apiV2DecodeKey(col("enc")) === col("key"), 1L)
          .otherwise(0L)).as("n_apiv2_roundtrip_ok"),
        sum(when(CodecExpr.unescapeGo(col("esc")) === col("key"), 1L)
          .otherwise(0L)).as("n_escape_roundtrip_ok"),
        sum(length(col("enc"))).as("sum_enc_bytes"))
    }),
    // complemented-ts decode (codec/codec.go:35-36) over synthesized
    // 8-byte big-endian ~ts keys from the event stream. The roundtrip
    // count asserts full NANOSECOND fidelity in-engine; the min/max are
    // emitted at µs resolution because DuckDB's parquet reader truncates
    // TIMESTAMP(NANOS) to µs, so the oracle can't see sub-µs tails.
    "q_codec_ts" -> ((s, dir) => {
      val keyed = Events.read(s, dir).select(col("ts_ns"),
        unhex(lpad(hex(bitwise_not(col("ts_ns"))), 16, "0")).as("tskey"))
      keyed
        .withColumn("dec", CodecExpr.decodeTs(col("tskey")))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(when(col("dec") === col("ts_ns"), 1L)
            .otherwise(0L)).as("n_ts_roundtrip_ok"),
          min(expr("dec DIV 1000")).as("min_ts_us"),
          max(expr("dec DIV 1000")).as("max_ts_us"))
    }),
    // TPC-H Q5-shaped regional revenue: the 6-table chain where the
    // CUSTOMER and the SUPPLIER must share a nation — the region→
    // nation→supplier dims broadcast pre-filtered so pruning happens
    // inside the joins, and the c_nationkey = s_nationkey predicate
    // rides the customer join (never a post-join filter over the full
    // cross of nations); revenue in exact 4-dp integer units. At 100 TB
    // the only shuffle is lineitem⋈orders on orderkey.
    "q_regional_revenue" -> ((s, dir) => {
      val n = s.read.parquet(s"$dir/nation.parquet")
        .join(broadcast(s.read.parquet(s"$dir/region.parquet")
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cus = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1997-01-01")
        .select(col("o_orderkey"), col("o_custkey"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) *
            lit(10000)).cast("long").as("rev_e4"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cus),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("rev_e4")).cast("double") / 10000).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),
    // TPC-H Q6-shaped forecast-revenue delta: the pure scan-side query
    // — every predicate (ship year, discount band, quantity cap)
    // reaches the parquet scan as a pushed filter, the aggregate is one
    // map-side partial over zero joins; the discount band compares in
    // DECIMAL(4,2) so the double column can't straddle the bound
    // differently across engines
    "q_rev_forecast" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01" &&
          col("l_discount").cast("decimal(4,2)")
            .between(lit(0.03).cast("decimal(4,2)"), lit(0.07).cast("decimal(4,2)")) &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_items"),
          (sum((col("l_extendedprice").cast("decimal(14,2)") *
            col("l_discount").cast("decimal(4,2)") *
            lit(10000)).cast("long")).cast("double") / 10000).as("forecast_rev"))),
    // TPC-H Q8-shaped market share: NATION_1 suppliers' slice of the
    // AMERICA PROMO market by order year — supplier-nation name rides
    // a broadcast dim, the consuming-market gate (customer→nation→
    // region = AMERICA) rides another, and the share is a 128-bit-exact
    // integer ppm division (the q_promo_share discipline)
    "q_market_share" -> ((s, dir) => {
      val amNat = s.read.parquet(s"$dir/nation.parquet")
        .join(broadcast(s.read.parquet(s"$dir/region.parquet")
            .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cus = s.read.parquet(s"$dir/customer.parquet")
        .join(broadcast(amNat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(s.read.parquet(s"$dir/nation.parquet")
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val promo = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) *
            lit(10000)).cast("long").as("rev_e4"))
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_1", col("rev_e4"))
            .otherwise(0L)).as("nat"),
          sum(col("rev_e4")).as("tot"))
        .select(col("o_year"),
          expr("CAST((CAST(nat AS DECIMAL(38,0)) * 1000000) div tot AS BIGINT)")
            .as("share_ppm"),
          (col("nat").cast("double") / 10000).as("nation_rev"),
          (col("tot").cast("double") / 10000).as("market_rev"))
        .orderBy(col("o_year"))
    }),
    // TPC-H Q10-shaped returned-item report: per-customer revenue lost
    // to 'R' returns in one quarter — the fact side double-filters
    // (returnflag at the lineitem scan, the quarter at the orders scan)
    // before the orderkey shuffle join; customer + nation dims broadcast
    "q_returned_items" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val n = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_name"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= "1997-01-01" &&
          col("o_orderdate") < "1997-04-01")
        .select(col("o_orderkey"), col("o_custkey"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) *
            lit(10000)).cast("long").as("rev_e4"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg((sum(col("rev_e4")).cast("double") / 10000).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_custkey"))
    }),
    // TPC-H Q9-shaped product profit: per (supplier nation, order year)
    // over 'bolt' parts — profit = revenue − retail cost proxy, every
    // term exact 4-dp integer units; the p_name LIKE filter prunes the
    // broadcast part dim BEFORE the fact join
    "q_profit" -> ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_name").contains("bolt"))
        .select(col("p_partkey"),
          (col("p_retailprice").cast("decimal(12,2)") * 10000)
            .cast("long").as("cost_e4"))
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(s.read.parquet(s"$dir/nation.parquet")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"),
          (col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) *
            lit(10000)).cast("long").as("rev_e4"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg((sum(col("rev_e4") - col("cost_e4") * col("qty"))
          .cast("double") / 10000).as("profit"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"), col("o_year"))
    }),
    // TPC-H Q12-shaped shipping-priority classes: per line status, the
    // count of late-shipped lines from high-priority vs other orders
    // (the two-way CASE split after the orderkey join; the 30-day
    // lateness predicate in exact timestamp arithmetic)
    "q_priority_class" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),
    // TPC-H Q20-shaped dominant suppliers: suppliers who shipped more
    // than HALF of some PROMO part's 1996 volume — the per-group
    // scalar-agg subquery (part totals) re-aggregated from the pair
    // table itself (one shuffle builds both sides), the >1/2 gate an
    // exact integer cross-multiply, then a semi-ish broadcast join back
    // to the supplier dim. Quantities are whole numbers, folded as
    // BIGINT.
    "q_excess_parts" -> ((s, dir) => {
      val promo = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val pair = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01")
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
      val tot = pair.groupBy(col("l_partkey").as("tp"))
        .agg(sum(col("sq")).as("tq"), count(lit(1)).as("n_supp"))
      val dom = pair.join(tot, col("l_partkey") === col("tp"))
        .filter(col("n_supp") > 1 && col("sq") * 2 > col("tq"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_dominated"), sum(col("sq")).as("qty_dominated"))
      s.read.parquet(s"$dir/supplier.parquet")
        .join(dom, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(s.read.parquet(s"$dir/nation.parquet")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          col("n_dominated"), col("qty_dominated"))
        .orderBy(col("s_suppkey"))
    }))

  // §2b sketch / approximate aggregates + iterative graph compute —
  // bounded-memory summaries (KMV, count-min, Bloom, priority sampling)
  // and integer-exact PageRank, all md5-derived so the DuckDB oracle
  // replays every bit (operators/Sketches.scala, operators/Graph.scala).
  private def sketchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // KMV (k-minimum-values) distinct-count estimate over part keys,
    // with the exact-NDV twin for verification. k=256 < NDV(sf0.01)=2000
    // so the gate exercises the estimation path, not the exact fallback.
    "q_approx_distinct" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      Sketches.kmvDistinct(li, col("l_partkey"), 256)
        .crossJoin(li.agg(countDistinct(col("l_partkey")).as("exact_ndv")))
    }),
    // KMV sketch set operations: |src ∪ dst| and |src ∩ dst| key-set
    // estimates from two 256-long sketches — the cross-cluster overlap
    // probe at O(k) memory, never joining the snapshots; exact twins
    // attached so the gate scores the estimator and its honesty at once
    "q_kmv_setops" -> ((s, dir) => {
      val src = kvStrSrc(s, dir)
      val dst = kvStrDst(s, dir)
      val est = Sketches.kmvSetOps(src, col("key"), dst, col("key"), 256)
      val xu = src.select(col("key")).unionAll(dst.select(col("key")))
        .agg(countDistinct(col("key")).as("exact_union"))
      val xi = src.select(col("key")).intersect(dst.select(col("key")))
        .agg(count(lit(1)).as("exact_intersect"))
      est.crossJoin(xu).crossJoin(xi)
    }),
    // grouped KMV: per-language distinct-shingle NDV estimates
    // (shuffle = groups × k longs), exact twin attached for the gate
    "q_approx_distinct_by" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("lang"),
        explode(Dedup.shingles(col("text"), 3)).as("t"))
      val est = Sketches.kmvDistinctBy(tok, col("lang"), col("t"), 64)
      val exact = tok.groupBy(col("lang").as("g2"))
        .agg(countDistinct(col("t")).as("exact_ndv"))
      est.join(exact, col("g") === col("g2"))
        .select(col("g").as("lang"), col("k_used"), col("kth_hash"),
          col("est_ndv"), col("exact_ndv"))
        .orderBy(col("lang"))
    }),
    // grouped HyperLogLog NDV over the same per-language shingle
    // stream: 1024 integer registers per group (p=10), DECIMAL-exact
    // register sum, linear-counting small-range correction — the
    // register STATE (bucket count, Σρ) is gated exactly alongside the
    // 6-dp estimate, and the exact twin shows the error live
    // mergeable histogram quantile sketch: per event type, the P500 /
    // P950 permille brackets from a 1024-counter equi-width sketch —
    // counters merge by addition, rank targets in exact integers, value
    // error bounded by range/1024 by construction
    "q_hist_quantile" -> ((s, dir) =>
      Sketches.histQuantiles(Events.read(s, dir), col("event_type"),
          col("value"), 1024, Seq(500, 950))
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"), col("q_permille"))),
    // RANK-error quantile sketch (the heavy-tail twin of the histogram
    // form): per-slot-minimum coordinated sample, k=1024 registers per
    // group merging by plain min; the reported quantile is the sample's
    // own order statistic — rank error ~1.6% independent of the value
    // distribution. Canonical state (a pure function of the row set),
    // unlike KLL/t-digest whose randomized/order-sensitive compactions
    // would break the cross-engine gate.
    "q_kll_quantile" -> ((s, dir) =>
      Sketches.slotSampleQuantiles(Events.read(s, dir), col("event_type"),
          col("value"), col("event_id"), 1024, Seq(500, 950))
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"), col("q_permille"))),
    // PSI drift monitor: per event type, the live population (users >=
    // 50) scored against the reference population (users < 50) over the
    // REFERENCE's 16-bucket geometry, Laplace-smoothed, each bucket one
    // double chain rounded to 6 dp before a DECIMAL sum (the log-sum
    // recipe). Counters merge by addition — the streaming twin sums
    // them in the state store and scores through the same stage.
    "q_psi_drift" -> ((s, dir) => {
      val e = Events.read(s, dir)
      Sketches.psiDrift(e.filter(col("user_id") < 50),
          e.filter(col("user_id") >= 50),
          col("event_type"), col("value"), 16)
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"))
    }),
    "q_hll_ndv" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("lang"),
        explode(Dedup.shingles(col("text"), 3)).as("t"))
      val est = Sketches.hllNdvBy(tok, col("lang"), col("t"))
      val exact = tok.groupBy(col("lang").as("g2"))
        .agg(countDistinct(col("t")).as("exact_ndv"))
      est.join(exact, col("g") === col("g2"))
        .select(col("g").as("lang"), col("n_buckets_used"),
          col("sum_rho"), col("est_ndv"), col("exact_ndv"))
        .orderBy(col("lang"))
    }),
    // pairwise lang-pair trigram-set OVERLAP from the SAME sketches:
    // register max-merge builds each pair's union sketch with no second
    // data pass, inclusion–exclusion prices the intersection, and the
    // exact token-join twin rides along so the estimate's error is a
    // gated, visible column — the cross-source contamination scan at
    // sketch cost
    "q_hll_overlap" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("lang"),
        explode(Dedup.shingles(col("text"), 3)).as("t"))
      Sketches.hllOverlap(tok, col("lang"), col("t"))
        .orderBy(col("ga"), col("gb"))
    }),
    // register-ONLY overlap pricing — the 100 TB contract made literal:
    // the register table is materialized once (localCheckpoint, |G|·m
    // rows) and the whole pair/estimate stage runs off it; the final
    // plan contains NO corpus scan at all (PlanShapeSpec pins zero
    // FileScans). The exact twin stays in q_hll_overlap, where the
    // estimate error is the visible gated column
    "q_hll_overlap_sketch" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("lang").as("g"),
        explode(Dedup.shingles(col("text"), 3)).as("t"))
      val regs = Sketches.hllRegisters(tok, col("t"), col("g")).localCheckpoint()
      Sketches.hllOverlapEstimates(regs).orderBy(col("ga"), col("gb"))
    }),
    // EXACT grouped NDV through block-sparse bitmaps: one shuffle of
    // 64-bit block words (bit_or partial agg combines map-side — up to
    // 64× fewer shuffled rows than count_distinct's per-(g,id) dedup
    // for dense id domains), one popcount fold. Oracle is the plain
    // count(DISTINCT) — the gate is the bitmap-equals-naive proof
    "q_bitmap_distinct" -> ((s, dir) =>
      Sketches.bitmapDistinct(
        s.read.parquet(s"$dir/events.parquet"),
        col("event_type"), col("user_id")).orderBy(col("g"))),
    // cross-RUN sketch persistence (SketchStore): two waves (even/odd
    // doc_id halves) each build registers from THEIR slice only and
    // persist them through kvbin (wave 2 appends — atomic _index swap);
    // the re-read max-merge then estimates through the identical
    // hllEstimate stage. max is a monoid over per-(g,bucket) cells, so
    // the merged state IS the one-shot build — the oracle is the plain
    // q_hll_ndv replay, making roundtrip+merge a proved identity
    "q_sketch_persist" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("lang").as("g"),
        explode(Dedup.shingles(col("text"), 3)).as("t"), col("doc_id"))
      val tbl = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-skp-")
      Seq(0 -> "overwrite", 1 -> "append").foreach { case (i, mode) =>
        SketchStore.writeWave(
          Sketches.hllRegisters(
            tok.filter(pmod(col("doc_id"), lit(2)) === i), col("t"), col("g"))
            .select(col("g"), col("bucket").as("slot"), col("mj").as("v")),
          tbl, s"wave$i", mode)
      }
      val regs = SketchStore.readMerged(s, tbl, max)
        .select(col("g"), col("slot").as("bucket"), col("v").as("mj"))
      val exact = tok.groupBy(col("g").as("g2"))
        .agg(countDistinct(col("t")).as("exact_ndv"))
      Sketches.hllEstimate(regs).join(exact, col("g") === col("g2"))
        .select(col("g").as("lang"), col("n_buckets_used"),
          col("sum_rho"), col("est_ndv"), col("exact_ndv"))
        .orderBy(col("lang"))
    }),
    // the QUANTILE-register member of the persistence family: the
    // slot-sample sketch's (hv, v) pair registers ride the long-cell
    // store as two IEEE-bit planes per slot, waves over even/odd user
    // halves, and the cross-wave merge re-runs the sketch's own
    // min-by-(hv, v) fold — so the merged registers are EXACTLY the
    // one-shot build and the oracle is the plain q_kll_quantile replay
    "q_kll_persist" -> ((s, dir) => {
      val ev = Events.read(s, dir)
      val tbl = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-kllp-")
      Seq(0 -> "overwrite", 1 -> "append").foreach { case (i, mode) =>
        Sketches.slotSampleCellsPersist(
          Sketches.slotSampleCells(
            ev.filter(pmod(col("user_id"), lit(2)) === i)
              .select(col("event_type").as("g"),
                col("value").cast("double").as("v"),
                col("event_id").cast("string").as("id")), 1024),
          tbl, s"wave$i", mode)
      }
      Sketches.slotSampleQuantilesFromCells(
          Sketches.slotSampleCellsFromStore(s, tbl), Seq(500, 950))
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"), col("q_permille"))
    }),
    // the exact-bitmap twin of q_sketch_persist: block words persist
    // per wave (even/odd user halves), OR-merge on re-read, popcount
    // through the identical bitmapEstimate stage; oracle = the plain
    // count(DISTINCT), same as q_bitmap_distinct
    "q_bitmap_persist" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tbl = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-bmp-")
      Seq(0 -> "overwrite", 1 -> "append").foreach { case (i, mode) =>
        SketchStore.writeWave(
          Sketches.bitmapWords(
            ev.filter(pmod(col("user_id"), lit(2)) === i),
            col("event_type"), col("user_id"))
            .select(col("g"), col("blk").as("slot"), col("w").as("v")),
          tbl, s"wave$i", mode)
      }
      Sketches.bitmapEstimate(
          SketchStore.readMerged(s, tbl, c => bit_or(c))
            .select(col("g"), col("v").as("w")))
        .orderBy(col("g"))
    }),
    // count-min-sketch heavy hitters over word-trigram shingles
    // (document frequency): exact top-20 vs the d=4 × w=1024 sketch's
    // upper-bound estimate — est >= exact always, = exact when the
    // item's 4 cells dodge collisions
    "q_heavy_hitters" -> ((s, dir) =>
      Sketches.cmsHeavyHitters(
        docs(s, dir).select(explode(Dedup.shingles(col("text"), 3)).as("item")),
        col("item"), d = 4, w = 1024, topK = 20)),
    // the THIRD persisted sketch family (after HLL max and bitmap OR):
    // per-wave CMS grids written through kvbin (g = hash row j,
    // slot = bucket, v = count) SUM-merge on re-read — counts are
    // additive over any doc partition, so the merged grid IS the
    // one-shot sketch and the gate replays q_heavy_hitters verbatim
    "q_cms_persist" -> ((s, dir) => {
      val it = docs(s, dir).select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("item"))
      val tbl = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-cmsp-")
      Seq(0 -> "overwrite", 1 -> "append").foreach { case (i, mode) =>
        SketchStore.writeWave(
          Sketches.cmsSketch(
            it.filter(pmod(col("doc_id"), lit(2)) === i), col("item"), 4, 1024)
            .select(col("j").cast("long").as("g"),
              col("bucket").as("slot"), col("cnt").as("v")),
          tbl, s"wave$i", mode)
      }
      val cms = SketchStore.readMerged(s, tbl, sum)
        .select(col("g").cast("int").as("j"), col("slot").as("bucket"),
          col("v").as("cnt"))
      Sketches.cmsHeavyHittersFromSketch(cms, it.select(col("item")),
        d = 4, w = 1024, topK = 20)
    }),
    // Bloom-runtime-filtered fact-dim join: lineitem pruned by the
    // nation-0 suppliers' 8192-bit filter BEFORE the join; result is
    // provably the plain join (no false negatives), which is exactly
    // what the oracle's plain-join SQL checks
    "q_bloom_join" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val supp = s.read.parquet(s"$dir/supplier.parquet")
        .filter(col("s_nationkey") === 0)
      Sketches.bloomFilteredJoin(li, "l_suppkey", supp, "s_suppkey")
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("s_suppkey"))
    }),
    // weight-proportional fixed-size sample (priority sampling): the 50
    // highest-priority orders, priority = cents * 2^20 div quantized
    // uniform — integer arithmetic end to end, a distributed top-k
    "q_priority_sample" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
        .withColumn("w", expr("CAST(floor(o_totalprice * 100 + 0.5) AS LONG)"))
      Sketches.prioritySample(o, "o_orderkey", col("w"), 50)
    }),
    // PER-GROUP priority sampling: 20 weight-proportional orders per
    // market segment, two-phase (per-partition bounded heaps, then the
    // exact window over <= partitions*n survivors) — a giant segment
    // never one-task sorts
    "q_priority_sample_by" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
        .withColumn("w", expr("CAST(floor(o_totalprice * 100 + 0.5) AS LONG)"))
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"))
      Sketches.groupedPrioritySample(
          o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
          col("c_mktsegment"), "o_orderkey", col("w"), 20)
        .select(col("g").as("segment"), col("id").as("o_orderkey"),
          col("w"), col("p").as("priority"), col("rk"))
        .orderBy(col("segment"), col("rk"))
    }),
    // integer-exact PageRank (3 fixed iterations, micro-unit ranks)
    // over the symmetrized customer—supplier trade graph; top 20 hubs.
    // Nodes are LONGS in flight (customer 2k, supplier 2k+1): every
    // iteration shuffles 8-byte ids instead of 10-char labels; the
    // display label is decoded once on the 20-row result
    "q_pagerank" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val e0 = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = e0.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
      Graph.pageRank(edges, 3)
        .select(
          when(pmod(col("node"), lit(2)) === 0,
            concat(lit("c"), expr("node div 2").cast("string")))
            .otherwise(concat(lit("s"), expr("(node - 1) div 2").cast("string")))
            .as("node"),
          col("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),
    // HITS on the DIRECTED customer→supplier purchase graph: hubs =
    // broad buyers, authorities = widely-bought-from suppliers — the
    // two rankings a bipartite influence analysis wants, integer-exact
    // (q_pagerank discipline). Top-20 per side in ONE pass over the
    // score union via the bounded-heap grouped top-k (ties by NUMERIC
    // node — the oracle ranks identically); labels decoded on 40 rows
    "q_hits" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      Rank.groupedTopK(Graph.hits(edges, 2), col("side"), col("node"),
          col("score"), 20)
        .select(col("g").as("side"),
          when(pmod(col("id"), lit(2)) === 0,
            concat(lit("c"), expr("id div 2").cast("string")))
            .otherwise(concat(lit("s"), expr("(id - 1) div 2").cast("string")))
            .as("node"),
          col("v").as("score"), col("rk"))
        .orderBy(col("side"), col("rk"))
    }),
    // personalized PageRank: teleport mass pinned to a 3-customer seed
    // cohort — rank = proximity to the cohort (the "suppliers this
    // cohort effectively buys from" recommendation view); the rank
    // vector only ever holds reached nodes
    "q_pagerank_personal" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val e0 = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = e0.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
      val seeds = edges.filter(pmod(col("src"), lit(2)) === 0)
        .select(col("src").as("node")).distinct()
        .orderBy(col("node")).limit(3)
      Graph.personalizedPageRank(edges, seeds, 3)
        .select(
          when(pmod(col("node"), lit(2)) === 0,
            concat(lit("c"), expr("node div 2").cast("string")))
            .otherwise(concat(lit("s"), expr("(node - 1) div 2").cast("string")))
            .as("node"),
          col("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),
    // general directed-graph PageRank with dangling-mass redistribution:
    // the customer → supplier purchase edges are NOT symmetrized, so
    // every supplier is a sink — each round gathers sink-held mass (one
    // anti-join + broadcast 1-row aggregate) and every node receives an
    // equal integer share, conserving total rank up to truncation
    "q_pagerank_dangling" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      Graph.pageRank(edges, 3, redistributeDangling = true)
        .select(
          when(pmod(col("node"), lit(2)) === 0,
            concat(lit("c"), expr("node div 2").cast("string")))
            .otherwise(concat(lit("s"), expr("(node - 1) div 2").cast("string")))
            .as("node"),
          col("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),
    // exact triangle enumeration (degree-ordered node-iterator++) over
    // the co-purchase graph: parts that share >=2 distinct orders. The
    // support threshold keeps the edge set sparse as the corpus grows;
    // orientation bounds wedge fan-out by O(sqrt(E)) per vertex
    "q_triangles" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      Graph.triangles(Graph.coEdges(li, "l_orderkey", "l_partkey", minGroups = 2))
        .orderBy(col("a"), col("b"), col("c"))
    }),
    // market-basket frequent triples over order baskets: per-group
    // combination explode (cubic only in basket size — avg ~4, max ~17
    // here, the basket-bound contract), one grouped support shuffle
    "q_itemsets" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      Graph.coTriples(li, "l_orderkey", "l_partkey", minGroups = 2)
        .orderBy(col("x"), col("y"), col("z"))
    }),
    // link prediction on the co-purchase graph: common-neighbor count +
    // Resource Allocation index (Σ 1e6 div deg(z), integer micro-units
    // — no Adamic-Adar ln) for non-adjacent pairs, top-20; the wedge
    // join sits behind the coTriples-style Σ C(deg,2) volume guard
    "q_link_predict" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      Graph.linkPredict(
          Graph.coEdges(li, "l_orderkey", "l_partkey", minGroups = 2), 20)
        .orderBy(col("ra_ppm").desc, col("cn").desc, col("a"), col("b"))
    }),
    // TPC-H Q15-shaped top supplier: quarterly revenue per supplier in
    // exact 4-dp integer units, the maximum as a broadcast 1-row scalar
    // (the view + scalar-subquery shape), equality survivors joined to
    // the broadcast supplier dim
    "q_top_supplier" -> ((s, dir) => {
      val rev = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) *
            lit(10000)).cast("long").as("rev_e4"))
        .groupBy(col("l_suppkey")).agg(sum(col("rev_e4")).as("total_rev_e4"))
      val mx = rev.agg(max(col("total_rev_e4")).as("mx"))
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_name"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev_e4") === col("mx"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("total_rev_e4").cast("double") / 10000).as("total_rev"))
        .orderBy(col("s_suppkey"))
    }),
    // TPC-H Q17-shaped small-quantity revenue: the correlated
    // per-part avg-quantity threshold decorrelated to one grouped
    // aggregate + equi-join back to the detail; the 20%-of-average
    // filter is the exact integer cross-multiply qty·5·n < Σqty
    // (quantities are integral), revenue summed in integer cents
    "q_small_qty" -> ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") === "Brand#13").select(col("p_partkey"))
      val lp = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("long").as("price_c"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val stats = lp.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
      lp.join(stats, col("l_partkey") === col("pk"))
        .filter(col("qty") * lit(5L) * col("n") < col("sq"))
        .agg(count(lit(1)).as("n_small"),
          (sum(col("price_c")).cast("double") / 100).as("total_price"))
    }),
    // TPC-H Q19-shaped disjunctive predicate: revenue under an OR of
    // brand/size/quantity conjunctions spanning BOTH join sides — the
    // shape that punishes engines which can't evaluate a cross-table
    // disjunction after a broadcast join without a cartesian detour
    "q_disjunctive_rev" -> ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("long").as("price_c"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
            col("qty").between(1, 11)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(1, 25) &&
            col("qty").between(10, 20)) ||
          (col("p_brand") === "Brand#33" && col("p_size").between(1, 35) &&
            col("qty").between(20, 30)))
        .agg(count(lit(1)).as("n_lines"),
          (sum(col("price_c")).cast("double") / 100).as("revenue"))
    }),
    // TPC-H Q16-shaped supplier variety: distinct suppliers per
    // (brand, size) with a "complaints" exclusion set (negative-balance
    // suppliers) removed by a broadcast left-anti join BEFORE the
    // distinct count
    "q_supplier_variety" -> ((s, dir) => {
      val bad = s.read.parquet(s"$dir/supplier.parquet")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_sk"))
      val p = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
        .filter(col("p_size").isin(1, 5, 9, 14))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(bad), col("l_suppkey") === col("bad_sk"), "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }),
    // TPC-H Q13-shaped order-count distribution: customers LEFT JOINed
    // to their (priority-filtered) orders so zero-order customers
    // survive as count 0, then the distribution of customers by order
    // count — the two-level aggregation whose first groupBy rides the
    // join's own custkey shuffle
    "q_order_count_dist" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet").select(col("c_custkey"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    // TPC-H Q11-shaped value concentration: per-part revenue in integer
    // cents, kept where it exceeds the average part's share — the
    // HAVING-over-a-global-scalar shape, with the global total and part
    // count folded into ONE broadcast 1-row aggregate and the
    // threshold as the exact cross-multiply rev_c * n_parts > total_c
    "q_value_share" -> ((s, dir) => {
      val rev = s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long")).as("rev_c"))
      val tot = rev.agg(sum(col("rev_c")).as("total_c"),
        count(lit(1)).as("n_parts"))
      rev.crossJoin(broadcast(tot))
        .filter(col("rev_c") * col("n_parts") > col("total_c"))
        .select(col("l_partkey"),
          (col("rev_c").cast("double") / 100).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),
    // TPC-H Q2-shaped correlated-min decorrelation, on the SQL surface:
    // the suppliers achieving each part's minimum unit price, written
    // as a correlated scalar subquery and left to Catalyst's
    // RewriteCorrelatedScalarSubquery — the plan is aggregate +
    // equi-join, no per-row subplan (PlanShapeSpec pins it); unit price
    // in integer cents DIV quantity so the equality is exact
    "q_min_cost_supplier" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .createOrReplaceTempView("graft_li_sql")
      s.sql("""
        SELECT l_partkey, l_suppkey, min(unit_c) AS best_unit_c
        FROM (SELECT l_partkey, l_suppkey,
                CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  DIV CAST(l_quantity AS BIGINT) AS unit_c
              FROM graft_li_sql) x
        WHERE unit_c = (SELECT min(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                                   DIV CAST(l_quantity AS BIGINT))
                        FROM graft_li_sql y WHERE y.l_partkey = x.l_partkey)
        GROUP BY l_partkey, l_suppkey
        ORDER BY l_partkey, l_suppkey""")
    }),
    // GNN feature assembly: two-layer GraphSAGE-mean neighbor
    // aggregation over the co-purchase graph with retail-price-cents
    // input features — each layer one O(E) equi-join + partial agg,
    // means in exact integer micro-units
    "q_gnn_agg" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val feats = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("v"),
          (col("p_retailprice").cast("decimal(12,2)") * 100)
            .cast("long").as("f"))
      Graph.neighborAgg(
          Graph.coEdges(li, "l_orderkey", "l_partkey", minGroups = 2), feats)
        .orderBy(col("v"))
    }),
    // TPC-H Q7-shaped bilateral trade: revenue between two nations by
    // ship year, both nation dims broadcast and pre-filtered so the
    // pair predicate prunes the fact sides inside the joins; revenue
    // in exact 4-dp integer units
    "q_nation_trade" -> ((s, dir) => {
      val n = s.read.parquet(s"$dir/nation.parquet")
        .filter(col("n_name").isin("NATION_3", "NATION_9"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cus = s.read.parquet(s"$dir/customer.parquet")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("l_year"),
          (col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) *
            lit(10000)).cast("long").as("rev_e4"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg((sum(col("rev_e4")).cast("double") / 10000).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),
    // autoregressive training pairs: per user, each event becomes a
    // (context of the k=3 preceding types, label) example — the
    // sequence-model pair explode; gated on a user slice so the compare
    // stays row-light (the window itself runs over the full log)
    "q_train_pairs" -> ((s, dir) =>
      Events.trainingPairs(Events.read(s, dir), 3)
        .filter(col("user_id") < 50)
        .orderBy(col("user_id"), col("pos"))),
    // fixed-round k-core peeling over the same co-purchase graph:
    // 5 rounds of "drop degree<2 vertices and their incident edges"
    // reach the fixed point at every fixture scale (KCoreSpec pins
    // round 6 as a no-op), so the entry IS the 2-core — the graph with
    // its pendant trees pruned away; output (vertex, core degree)
    "q_kcore" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      Graph.kCore(Graph.coEdges(li, "l_orderkey", "l_partkey", minGroups = 2),
          k = 2, rounds = 5)
        .orderBy(col("n"))
    }),
    // synchronous label-propagation communities over the REPEAT-business
    // cust↔supp graph (pairs co-occurring ≥3 times — the raw bipartite
    // graph is near-complete and collapses to one community): 3 fixed
    // rounds, most-frequent neighbor label, smallest-label ties;
    // per-vertex labels hash-gated against the unrolled oracle replay
    "q_communities" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val e0 = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 3)
        .select(col("src"), col("dst"))
      Graph.labelPropagation(e0, 3).orderBy(col("v"))
    }),
    // argmax/argmin surface: per type, the event holding the extreme
    // value — struct-max with the id as tiebreaker, so ties cannot
    // split the hash between engines
    "q_argmax" -> ((s, dir) =>
      Events.read(s, dir).groupBy(col("event_type"))
        .agg(max(struct(col("value"), col("event_id"))).as("mx"),
          min(struct(col("value"), col("event_id"))).as("mn"))
        .select(col("event_type"),
          col("mx.value").as("max_value"), col("mx.event_id").as("max_event_id"),
          col("mn.value").as("min_value"), col("mn.event_id").as("min_event_id"))
        .orderBy(col("event_type"))),
    // heavy-tail clamp: per-type winsorization at discrete P05/P95
    // bounds (actual data points, like the MAD medians), clip counts +
    // the clamped DECIMAL sum
    "q_winsorize" -> ((s, dir) =>
      Events.winsorize(Events.read(s, dir), "event_type", "value",
          "event_id")
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"))),
    // robust outlier gate: Hampel ±3·MAD per event type over DISCRETE
    // rank-⌈n/2⌉ medians — medians are actual data points (never an
    // interpolated average), so the one float multiply+compare is
    // IEEE-exact in both engines
    "q_mad_outliers" -> ((s, dir) =>
      Events.madOutliers(Events.read(s, dir), "event_type", "value",
          "event_id")
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"))),
    // top navigation paths: 30-min sessions -> ordered event-type path
    // string per session -> corpus-wide top-20 by session count
    "q_event_paths" -> ((s, dir) =>
      Events.sessionPaths(Events.read(s, dir), 1800000000L, 20)),
    // recency-weighted trending score: one-day half-life decay as exact
    // powers of two (2^(20 - min(age_days, 20)) per event — integer
    // weights, no exp/float anywhere), corpus max day as a broadcast
    // 1-row scalar, one partial-agg pass
    "q_decayed_counts" -> ((s, dir) =>
      Events.decayedCounts(Events.read(s, dir), "event_type")
        .orderBy(col("score").desc, col("event_type"))),
    // hour-of-day seasonal baseline: cells whose count exceeds 2x the
    // group's average for that hour across observed days — integer
    // cross-multiply threshold, baseline re-aggregated from the cell
    // table (raw events never joined or windowed)
    "q_seasonal_anomaly" -> ((s, dir) =>
      Events.seasonalAnomaly(Events.read(s, dir), "event_type")
        .orderBy(col("event_type"), col("day"), col("hr"))),
    // RANGE window frames (value-based, not row-based): rolling 1-hour
    // sum/count per type over exact integer microsecond bounds — ties
    // are peers, so the frame is order-insensitive and deterministic
    "q_window_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, 0)
      Events.read(s, dir).filter(col("user_id") < 20)
        .select(col("event_id"), col("event_type"), col("ts_us"), col("value"))
        .withColumn("rolling_1h",
          sum(col("value").cast("decimal(20,6)")).over(w).cast("double"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .orderBy(col("event_id"))
    }),
    // Markov transition matrix of consecutive per-user events:
    // (prev_type -> type, count, conditional probability). The p column
    // divides two exact longs — deterministic across engines
    "q_event_transitions" -> ((s, dir) =>
      Events.transitions(Events.read(s, dir))
        .orderBy(col("prev_type"), col("event_type"))),
    // per-user ordered event-type sequence ("user history -> token
    // stream"), the training-sequence assembly primitive
    "q_event_seq" -> ((s, dir) =>
      Events.sequences(Events.read(s, dir)).orderBy(col("user_id"))),
    // explicit GROUPING SETS lattice (rollup/cube's general form) with
    // the grouping_id disambiguator both engines bit-agree on
    "q_grouping_sets" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),
    // left-semi / left-anti join pair: per-nation customers with and
    // without orders. The two probe sides reuse one orders projection;
    // both are plain shuffled semi/anti hash joins on the key
    "q_semi_anti" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val o = s.read.parquet(s"$dir/orders.parquet").select(col("o_custkey"))
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_with"))
      val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_without"))
      withO.join(withoutO, Seq("c_nationkey"), "full_outer")
        .select(col("c_nationkey"),
          coalesce(col("n_with"), lit(0L)).as("n_with"),
          coalesce(col("n_without"), lit(0L)).as("n_without"))
        .orderBy(col("c_nationkey"))
    }),
    // gap-filled hourly series: full [min,max] hour spine per event
    // type, holes carry the last observed sum forward (time-series
    // resample + ffill). Spine size = hours x types, not row count
    "q_gap_fill" -> ((s, dir) =>
      Events.gapFillHourly(Events.read(s, dir))
        .orderBy(col("event_type"), col("hr"))),
    // weekly cohort retention triangle (first-active-week cohorts)
    "q_retention" -> ((s, dir) =>
      Events.retention(Events.read(s, dir))
        .orderBy(col("cohort_week"), col("week_offset"))),
    // exact dedup on the canonical text form (casefold / strip punct /
    // collapse whitespace) — the fuzzy-exact duplicate class
    "q_dedup_canonical" -> ((s, dir) =>
      Dedup.canonicalGroups(docs(s, dir), "text", "doc_id").orderBy(col("fp"))),
    // character-level near-dup: (lang, length-bucket, simhash-chunk)-
    // blocked candidates, Levenshtein verify within the 10% distance
    // budget. The md5-derived 60-bit band hash keeps the content band
    // oracle-replayable; the oracle mirrors the band, the (len, id)
    // pair orientation, and the derived bucket radius exactly
    // localCheckpoint BEFORE the oracle ordering: the orderBy's range
    // partitioner samples its child, re-running the whole DP verify a
    // second time (two identical ~5 s task-time stages at sf0.1);
    // materializing the small verified-pair frame once makes the
    // sampling read checkpoint blocks instead (OPTIMIZATION_r16.md)
    "q_edit_neardup" -> ((s, dir) =>
      Dedup.editNearDup(docs(s, dir), "text", "doc_id", "lang",
          contentBand = true, bandBits = 60, tokenHash = Dedup.md5Hash60)
        .localCheckpoint()
        .orderBy(col("doc_a"), col("doc_b"))),
    // the EXACT-recall scale path for the same contract family: ED-Join
    // q-gram prefix filtering (rarest-first positional grams, per-role
    // prefixes of qτ+1, length-bucketed join key) at the 5%-edit
    // dedup operating point — the oracle is the UNPRUNED all-pairs
    // brute force, so the gate itself proves prefix-filtered == plain.
    // NO hand-set candidate budget (r14, closing the r13 seam where
    // 5000/doc was raised to 8000 after the sf1 trip): the guard's
    // default bound is now DERIVED — volume ≤ 16 × the corpus's
    // positional-gram mass, i.e. verification may cost at most a
    // constant factor of re-reading the corpus. Measured ratios on
    // this fixture: 0.34 (sf0.01) → 2.8 (sf0.1) → 12.1 (sf1) — all
    // pass the same default, and a corpus that outgrows it has
    // genuinely quadratic structure the guard SHOULD refuse
    "q_edit_neardup_prefix" -> ((s, dir) =>
      // same orderBy-sampling double-execution fix as q_edit_neardup
      Dedup.editNearDupPrefix(docs(s, dir), "text", "doc_id", "lang",
          maxDistPermille = 50)
        .localCheckpoint()
        .orderBy(col("doc_a"), col("doc_b"))),
    // incremental view maintenance: dst's per-bucket (count, bytes)
    // summary derived from src's summary + the diff changelog — cost
    // scales with the change rate, never rescans dst
    "q_ivm_agg" -> ((s, dir) =>
      Diff.maintainAgg(kvStrSrc(s, dir),
          Diff.diff(kvStrSrc(s, dir), kvStrDst(s, dir)),
          k => substring(k, 1, 10))
        .orderBy(col("bucket"))),
    // incremental view maintenance for an equi-JOIN view (the delta
    // rule: ΔV = ΔR ⋈ S_new ⊎ R_old ⋈ ΔS — never R_new ⋈ S_new):
    // orders⋈customer maintained under deterministic deletes (orderkey
    // %97==1, custkey %89==3) and re-price updates (%97==2 as −1 old /
    // +1 doubled-cents row). The oracle computes the new join directly,
    // so the gate IS the delta-rule identity proof; the delta joins
    // broadcast the |Δ| side
    "q_ivm_join" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey").as("k"), col("o_orderkey"),
          (col("o_totalprice").cast("decimal(14,2)") * 100)
            .cast("long").as("price_c"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("k"), col("c_nationkey"))
      val dR = orders.filter(col("o_orderkey") % 97 === 1)
          .withColumn("m", lit(-1L))
        .unionByName(orders.filter(col("o_orderkey") % 97 === 2)
          .withColumn("m", lit(-1L)))
        .unionByName(orders.filter(col("o_orderkey") % 97 === 2)
          .withColumn("price_c", col("price_c") * 2)
          .withColumn("m", lit(1L)))
      val dS = cust.filter(col("k") % 89 === 3).withColumn("m", lit(-1L))
      val sNew = cust.join(dS.select("k"), Seq("k"), "left_anti")
      val vOld = orders.join(cust, "k").withColumn("n", lit(1L))
      Diff.maintainJoin(vOld, orders, dR, sNew, dS, "k")
        .orderBy(col("o_orderkey"))
    }),
    // TIME TRAVEL: reconstruct the keyspace state at a changelog
    // sequence cutoff — the lakehouse snapshot-isolation replay, as
    // diff→changelog→partial-apply composition. Changes carry a
    // deterministic pseudo-sequence (key-hash mod 10 + 1); the state at
    // cutoff 5 has ~half the src→dst changes applied, summarized per
    // key bucket. applyChangelog's per-key latest-wins window does the
    // reconstruction; cost scales with |changes|, never rescans dst
    "q_time_travel" -> ((s, dir) => {
      val src = kvStrSrc(s, dir)
      val dst = kvStrDst(s, dir)
      // seq ∈ 1..10: applyChangelog's base snapshot sits at seq 0, so
      // every change must sequence strictly after it
      val chg = Diff.diffAsChangelog(Diff.diff(src, dst))
        .withColumn("seq", pmod(Dedup.md5Hash60(col("key")), lit(10L)) + 1)
      Diff.applyChangelog(src, chg.filter(col("seq") <= 5))
        .groupBy(substring(col("key"), 1, 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("value"))).cast("long").as("bytes"))
        .orderBy(col("bucket"))
    }),
    // UNPIVOT/melt: wide per-flag aggregate rotated to (flag, metric,
    // value) rows — pivot's inverse completes the reshaping family
    "q_unpivot" -> ((s, dir) => {
      val wide = s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double").as("sum_price"),
          sum(col("l_discount").cast("decimal(4,2)")).cast("double").as("sum_disc"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    }),
    // RAG chunking: 200-char windows every 150 chars, md5-fingerprinted
    // for chunk-level dedup; shuffle-free explode, volume = len/stride
    "q_chunk_windows" -> ((s, dir) =>
      TextAnalysis.chunkWindows(docs(s, dir), "text", "doc_id", 200, 150)
        .orderBy(col("doc_id"), col("chunk_idx"))),
    // Q3-shaped shipping priority: 3-way join with date predicates on
    // both fact sides, decimal-exact revenue, distributed top-10 — the
    // canonical star-join + top-k plan (dims broadcast, one shuffle)
    "q_ship_priority" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") < "1995-03-15")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") > "1995-03-15")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .agg(sum(col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    // Q18-shaped "big orders": HAVING on a decimal aggregate, then the
    // small survivor set joins back to orders detail
    "q_big_orders" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("__sq"))
        .filter(col("__sq") > 250)
        .select(col("l_orderkey"), col("__sq").cast("double").as("sum_qty"))
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_orderkey"))
    }),
    // Q14-shaped promo revenue share per ship month: broadcast part
    // dim; revenue held in exact 4-dp integer units (2-dp price × 2-dp
    // discount), the share a 128-bit-exact integer ppm division —
    // floats appear only in the final display cast
    "q_promo_share" -> ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_type"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
          (col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) *
            lit(10000)).cast("long").as("rev_e4"),
          col("p_type"))
        .groupBy(col("ship_month"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev_e4"))
            .otherwise(0L)).as("pr"),
          sum(col("rev_e4")).as("tr"))
        .select(col("ship_month"),
          expr("CAST((CAST(pr AS DECIMAL(38,0)) * 1000000) div tr AS BIGINT)")
            .as("promo_ppm"),
          (col("pr").cast("double") / 10000).as("promo_rev"),
          (col("tr").cast("double") / 10000).as("total_rev"))
        .orderBy(col("ship_month"))
    }),
    // Q22-shaped "cold customers": balance above the positive-balance
    // mean (integer-cents threshold via a broadcast 1-row scalar
    // aggregate) AND no order in the fixture's final year — the
    // anti-join + scalar-subquery decorrelation showcase
    "q_cold_customers" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"),
          (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
            .as("bal_c"))
      val recent = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= "2000-09-01")
        .select(col("o_custkey"))
      val thr = c.filter(col("bal_c") > 0)
        .agg(expr("sum(bal_c) div count(1)").as("t"))
      c.crossJoin(broadcast(thr)).filter(col("bal_c") > col("t"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          (sum(col("bal_c")).cast("double") / 100).as("total_bal"))
        .orderBy(col("c_nationkey"))
    }),
    // Q4-shaped late-shipment counts by order priority: EXISTS
    // decorrelated to a left-semi join — equi on the order key plus
    // the non-equi lateness predicate, exact timestamp interval math
    "q_late_orders" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= "1995-01-01" &&
          col("o_orderdate") < "1995-04-01")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),
    // TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    // the fixture's columns: a supplier's returned-flag lineitem on a
    // finished multi-supplier order where NO OTHER supplier returned —
    // EXISTS + NOT EXISTS against the SAME fact table, composed as one
    // left-semi + one left-anti on the orderkey with the supplier
    // inequality riding the join condition (equi-keyed, no per-row
    // subplan); Q4/Q22 proved the single-subquery decorrelations, this
    // is the both-at-once composition with aggregation on top
    "q_blocking_suppliers" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_name"))
      l1.join(l2, col("l_orderkey") === col("ok2") &&
          col("sk2") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("l_orderkey") === col("ok3") &&
          col("sk3") =!= col("l_suppkey"), "left_anti")
        .join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),
    // distributed BPE merge learning (tokenizer training): 3 rounds of
    // corpus-wide most-frequent-adjacent-pair, greedy-left merges on
    // the word-frequency table — per-round cost is vocab-sized, not
    // corpus-sized
    "q_bpe_merges" -> ((s, dir) =>
      Bpe.learnMerges(docs(s, dir), "text", 3).orderBy(col("rank"))),
    // corpus token count after each learned merge (rank 0 = chars):
    // does the next merge still pay for itself?
    "q_bpe_compress" -> ((s, dir) =>
      Bpe.compression(docs(s, dir), "text", 3).orderBy(col("rank"))),
    // SQL surface: correlated scalar subqueries (price above 1.01x the
    // brand average — the fixture's prices sit in a tight 900-1000
    // band), decorrelated by Catalyst into aggregate+join. Exact
    // integer cross-multiply (cents*n*100 > sum_cents*101) so no float
    // threshold can flip a row between engines
    "q_above_avg" -> ((s, dir) => {
      s.read.parquet(s"$dir/part.parquet").createOrReplaceTempView("graft_part_sql")
      s.sql("""
        SELECT p_brand, p_partkey, cents
        FROM (SELECT p_brand, p_partkey,
                CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
              FROM graft_part_sql) p
        WHERE cents * (SELECT count(*) FROM graft_part_sql p2
                       WHERE p2.p_brand = p.p_brand) * 100
              > (SELECT sum(CAST(floor(p2.p_retailprice * 100 + 0.5) AS BIGINT))
                 FROM graft_part_sql p2 WHERE p2.p_brand = p.p_brand) * 101
        ORDER BY p_brand, p_partkey""")
    }))

  private def parityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2a rows 4-7: checksum aggregate (crc64-xor monoid; partial+final agg)
    "q_checksum" -> ((s, dir) => Checksum.of(KVSnapshot.src(s, dir))),
    // §2a row 6: per-range (region-style) grouped checksum
    "q_checksum_bucket" -> ((s, dir) =>
      Checksum.byBucket(KVSnapshot.src(s, dir),
          substring(col("key").cast("string"), 1, 10))
        .orderBy(col("bucket"))),
    // §2a row 9: src-vs-dst checksum equality verdict
    "q_checksum_verdict" -> ((s, dir) =>
      Checksum.verdict(KVSnapshot.src(s, dir), KVSnapshot.dst(s, dir))),
    // incremental maintenance: derive dst's checksum from src's checksum
    // plus the change delta (XOR self-inverse — no dst rescan), then
    // prove it equals the directly-computed dst checksum
    "q_checksum_delta" -> ((s, dir) => {
      val src = KVSnapshot.src(s, dir)
      val dst = KVSnapshot.dst(s, dir)
      val d = Diff.diff(src, dst)
      val dels = d.filter(col("src_value").isNotNull)
        .select(col("key"), col("src_value").as("value"))
      val inss = d.filter(col("dst_value").isNotNull)
        .select(col("key"), col("dst_value").as("value"))
      val derived = Checksum.applyDelta(Checksum.of(src), dels, inss)
        .select(col("crc64_xor").as("derived_crc64_xor"),
          col("total_kvs").as("derived_total_kvs"),
          col("total_bytes").as("derived_total_bytes"))
      val direct = Checksum.of(dst)
        .select(col("crc64_xor").as("direct_crc64_xor"),
          col("total_kvs").as("direct_total_kvs"),
          col("total_bytes").as("direct_total_bytes"))
      derived.crossJoin(direct).withColumn("matches",
        col("derived_crc64_xor") === col("direct_crc64_xor") &&
        col("derived_total_kvs") === col("direct_total_kvs") &&
        col("derived_total_bytes") === col("direct_total_bytes"))
    }),
    // §2a row 10: diff = full-outer join on key, classified
    "q_diff" -> ((s, dir) =>
      Diff.diff(kvStrSrc(s, dir), kvStrDst(s, dir))
        .orderBy(col("key"), col("diff_class"))),
    // the 100 TB diff: per-bucket checksum digests locate the (few)
    // changed buckets, then the join-diff runs over those buckets only —
    // the equal bulk never shuffles. Output contract identical to q_diff
    // (same oracle SQL).
    "q_diff_pruned" -> ((s, dir) =>
      Diff.checksumPrunedDiff(kvStrSrc(s, dir), kvStrDst(s, dir))
        .orderBy(col("key"), col("diff_class"))),
    // §2a row 12: per-class running-counter totals
    "q_diff_counts" -> ((s, dir) =>
      Diff.diffCounts(kvStrSrc(s, dir), kvStrDst(s, dir)).orderBy(col("diff_class"))),
    // left_anti variant: keys only in src
    "q_diff_src_only" -> ((s, dir) =>
      Diff.srcOnly(kvStrSrc(s, dir), kvStrDst(s, dir)).orderBy(col("key"))),
    // MERGE/upsert (CDC apply), gated by the inverse identity:
    // applying diff(src,dst) as a changelog to src must rebuild dst
    // bit-for-bit — the oracle is simply dst
    "q_merge_upsert" -> ((s, dir) => {
      val src = kvStrSrc(s, dir)
      val dst = kvStrDst(s, dir)
      Diff.applyChangelog(src, Diff.diffAsChangelog(Diff.diff(src, dst)))
        .orderBy(col("key"))
    }),
    // §2b set ops: symmetric difference on whole pairs
    "q_symdiff" -> ((s, dir) =>
      Diff.symmetricDiff(kvStrSrc(s, dir), kvStrDst(s, dir))
        .orderBy(col("key"), col("side"))),
    // §2a row 3: key-range predicate, unsigned-lexicographic
    "q_range_filter" -> ((s, dir) =>
      KVSnapshot.rangeFilter(KVSnapshot.src(s, dir),
          "li_0000000100".getBytes("UTF-8"), "li_0000000300".getBytes("UTF-8"))
        .select(upper(hex(col("key"))).as("key_hex"), upper(hex(col("value"))).as("value_hex"))
        .orderBy(col("key_hex"))),
    // §2a rows 1-3 via the DSv2 connector: range filter pushes down to
    // region-file pruning + in-reader scoping (same oracle semantics as
    // q_range_filter, different physical source)
    "q_kvbin_scan" -> ((s, dir) =>
      KVSnapshot.rangeFilter(KVSnapshot.srcBin(s, dir),
          "li_0000000100".getBytes("UTF-8"), "li_0000000300".getBytes("UTF-8"))
        .select(upper(hex(col("key"))).as("key_hex"), upper(hex(col("value"))).as("value_hex"))
        .orderBy(col("key_hex"))),
    // DSv2 AGGREGATE pushdown: COUNT/MIN(key)/MAX(key) answered from
    // the region index (one metadata row per region, no region opened)
    // — the planner-integrated sibling of the socket CHECKSUM verb.
    // KVBinSpec pins zero SCAN requests on the wire for this shape
    "q_kvbin_agg" -> ((s, dir) =>
      KVSnapshot.srcBin(s, dir)
        .agg(count(lit(1)).as("n"),
          upper(hex(min(col("key")))).as("min_key_hex"),
          upper(hex(max(col("key")))).as("max_key_hex"))),
    // the same scan THROUGH a live loopback kvbin server: region
    // metadata and bytes arrive over the SocketRegionClient dial path
    // (endpoints option) — the network connector on the oracle gate
    "q_kvbin_socket_scan" -> ((s, dir) =>
      KVSnapshot.rangeFilter(KVSnapshot.srcBinSocket(s, dir),
          "li_0000000100".getBytes("UTF-8"), "li_0000000300".getBytes("UTF-8"))
        .select(upper(hex(col("key"))).as("key_hex"), upper(hex(col("value"))).as("value_hex"))
        .orderBy(col("key_hex"))),
    // the same scan through a TWO-server fleet, each store owning half
    // the regions (comma-separated endpoints, config/config.go:30-31):
    // the MultiSocketRegionClient unions both stores' region metadata
    // and dials each region's owner
    "q_kvbin_socket_multi" -> ((s, dir) =>
      KVSnapshot.rangeFilter(KVSnapshot.srcBinSocketMulti(s, dir),
          "li_0000000100".getBytes("UTF-8"), "li_0000000300".getBytes("UTF-8"))
        .select(upper(hex(col("key"))).as("key_hex"), upper(hex(col("value"))).as("value_hex"))
        .orderBy(col("key_hex"))),
    // §2a rows 4-7 over the wire: the CRC64 fold executes INSIDE the
    // storage servers (the kvbin CHECKSUM verb ≙ rawkv.Checksum RPC,
    // checksum/checksum.go:83-91) — the wire carries one triple per
    // region, never region bytes; Spark merges triples via the monoid.
    // Same result and oracle as q_checksum.
    "q_kvbin_checksum" -> ((s, dir) => KVSnapshot.srcBinSocketChecksum(s, dir)),
    // DSv2 WRITE path: the src snapshot flows through the connector's
    // RequiresDistributionAndOrdering write (Spark plans the
    // range-partition + sort; executor tasks stream region files;
    // commit() publishes the _index) into a fresh dir each run — the
    // write IS the measured work — then reads back through the DSv2
    // reader; the checksum triple must equal the direct source checksum
    "q_kvbin_write_roundtrip" -> ((s, dir) => {
      // one shared exit hook: the bench invokes this entry 3+ times
      // (warmup + two passes), and a hook Thread per call would
      // accumulate for the JVM lifetime
      val tmp = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-kvwr-")
      // no `ranges` option: requiredNumPartitions stays 0 and the range
      // exchange sizes itself from spark.sql.shuffle.partitions — the
      // region count scales with the cluster, not a constant
      KVSnapshot.src(s, dir).write
        .format(classOf[graft.sources.kvbin.KVBinSource].getName)
        .option("path", tmp).option("api_version", "V1")
        .mode("overwrite").save()
      Checksum.of(graft.sources.kvbin.KVBin.read(s, tmp))
    }),
    // SHARDED fleet wire write (r14): the src snapshot lands on a
    // TWO-STORE fleet destination with NO filesystem path — each store
    // owns a key range (OWNS), executor tasks split their sorted runs
    // at the boundary and PUT each segment to its owner, the driver's
    // prepare-then-commit stamps ONE table identity across both
    // shards' indexes — then the fleet READ path unions the shards
    // back, checksum-identical to the source. The reference's whole
    // purpose is cluster-to-cluster parity (cmd/main.go:17-18); this
    // is the replica that actually SPREADS across a cluster, not a
    // single write proxy. `both_stores_served` pins the routing (each
    // store saw PUT frames) inside the oracle-checked result.
    "q_kvbin_fleet_write" -> ((s, dir) => {
      val conf = s.sessionState.newHadoopConf()
      val dirA = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-kvfw-a-")
      val dirB = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-kvfw-b-")
      val split = "li_0000000512".getBytes("UTF-8")
      val a = new graft.sources.kvbin.KVBinServer(dirA, conf,
        ownsRange = Some((Array.emptyByteArray, split)))
      val b = new graft.sources.kvbin.KVBinServer(dirB, conf,
        ownsRange = Some((split, Array.emptyByteArray)))
      val eps = s"${a.address},${b.address}"
      KVSnapshot.src(s, dir).write
        .format(classOf[graft.sources.kvbin.KVBinSource].getName)
        .option("endpoints", eps).option("api_version", "V1")
        .mode("overwrite").save()
      val served = a.putRequests.get() > 0 && b.putRequests.get() > 0
      Checksum.of(s.read
          .format(classOf[graft.sources.kvbin.KVBinSource].getName)
          .option("endpoints", eps).option("api_version", "V1").load())
        .withColumn("both_stores_served", lit(served))
    }),
    // region-merge compaction (TiKV region-merge analog): the 32-region
    // generation rewritten to 4 sorted ranges through the DSv2 write,
    // index-swap visibility, old regions swept — content gated by the
    // checksum triple, region count pinned in the output
    "q_kvbin_compact" -> ((s, dir) => {
      val tmp = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-kvcp-")
      KVSnapshot.src(s, dir).write
        .format(classOf[graft.sources.kvbin.KVBinSource].getName)
        .option("path", tmp).option("api_version", "V1")
        .mode("overwrite").save()
      graft.sources.kvbin.KVBinCompact.compact(s, tmp, 4)
      val nRegions = graft.sources.kvbin.KVBin
        .readIndex(tmp, s.sessionState.newHadoopConf()).size
      Checksum.of(graft.sources.kvbin.KVBin.read(s, tmp))
        .withColumn("n_regions", lit(nRegions).cast("long"))
    }),
    // Iceberg/Delta-style DATA SKIPPING over the kvbin connector: the
    // orders table Z-order-clustered on (price_k, cust) with per-region
    // min/max of both stats stamped in the _index sidecar; the
    // conjunctive range predicate prunes regions at PLANNING time
    // (KVBinSpec pins regions-opened < total) and the reader
    // row-filters the survivors from the same spec — fully consumed
    // pushdown, no Spark-side residual filter
    "q_kvbin_skip" -> ((s, dir) => {
      val path = Layout.kvbinSkipTable(s, dir)
      graft.sources.kvbin.KVBin.read(s, path)
        .filter(col("price_k").between(100L, 160L) && col("cust") < 200L)
        .select(upper(hex(col("key"))).as("key_hex"), col("price_k"), col("cust"))
        .orderBy(col("key_hex"))
    }),
    // the reference's §3.1 flagship lifecycle end-to-end over wires:
    // src (two-store fleet) and dst (own store) checksummed server-side
    // concurrently, verdict from the pushed triples. Same oracle as
    // q_checksum_verdict.
    "q_kvbin_verdict" -> ((s, dir) => KVSnapshot.binSocketVerdict(s, dir)),
    // §2a row 11: ordered hex scan dump with running cnt
    "q_scan_dump" -> ((s, dir) =>
      Scan.hexDumpWithCnt(KVSnapshot.rangeFilter(KVSnapshot.src(s, dir),
        "li_0000000001".getBytes("UTF-8"), "li_0000000100".getBytes("UTF-8")))),
    // §2b sources: CSV roundtrip through the real writer+parser with
    // PLANTED quoting hazards (delimiter, quote char and newline inside
    // a field for doc_id % 10 == 3) — the md5-distinct count catches any
    // single-character corruption the quoting path might introduce
    "q_csv_ingest" -> ((s, dir) =>
      graft.sources.FileFormats.readCsv(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text").cast("binary"))).as("n_distinct"),
          sum(length(col("text"))).cast("long").as("sum_chars"))
        .orderBy(col("lang"))),
    // §2b sources: ORC (columnar) ingest; the lang predicate must reach
    // the ORC scan as a pushed filter (PlanShapeSpec pins it)
    "q_orc_ingest" -> ((s, dir) =>
      graft.sources.FileFormats.readOrc(s, dir)
        .filter(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))),
    // §2b sources: binaryFile ingest — the multimodal corpus written as
    // one file per blob (executor-side fan-out, no driver collect), read
    // back through Spark's binaryFile source; media id re-derived from
    // the file name, content integrity gated by the XOR of 60-bit md5
    // hashes over raw bytes (the crc64_xor monoid discipline — order-
    // free, overflow-free), file-length metadata next to the header
    "q_binaryfile_ingest" -> ((s, dir) =>
      Multimodal.decodeMeta(
          graft.sources.FileFormats.readBinaryFiles(s, dir), "content")
        .groupBy(col("channels"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("length")).as("sum_len"),
          sum(col("payload_bytes").cast("long")).as("sum_payload"),
          bit_xor(Dedup.md5Hash60(col("content"))).as("xor_sig"),
          min(col("media_id")).as("min_id"),
          max(col("media_id")).as("max_id"))
        .orderBy(col("channels"))),
    // §2b sources: the multimodal corpus through the kvbin ranged
    // connector — blobs as values keyed by fixed-width id, written via
    // the DSv2 range-distributed write (sorted region files, _index
    // commit), read back through the DSv2 reader. Same md5-XOR content
    // gate and oracle derivation as q_binaryfile_ingest, so the two
    // ingest paths are provably byte-identical; this one is the
    // large-media at-rest layout (region-count opens, key-range
    // pruning), binaryFile the per-object crawler-delivery shape
    "q_multimodal_kvbin" -> ((s, dir) =>
      Multimodal.decodeMeta(
          graft.sources.FileFormats.readKvbinBlobs(s, dir), "blob")
        .groupBy(col("channels"))
        .agg(count(lit(1)).as("n_blobs"),
          sum(length(col("blob")).cast("long")).as("sum_len"),
          sum(col("payload_bytes").cast("long")).as("sum_payload"),
          bit_xor(Dedup.md5Hash60(col("blob"))).as("xor_sig"),
          min(col("media_id")).as("min_id"),
          max(col("media_id")).as("max_id"))
        .orderBy(col("channels"))),
    // §2b sources: JSONL ingest through the real permissive JSON parser
    // with corrupt-line quarantine — mangled lines (deterministically
    // truncated in the derived fixture) survive as a counted quarantine
    // group with zero data contribution, never dropped silently
    "q_jsonl_ingest" -> ((s, dir) =>
      graft.sources.Jsonl.read(s, dir)
        .select(
          when(col("_bad").isNotNull, lit("~corrupt")).otherwise(col("lang")).as("lang"),
          when(col("_bad").isNotNull, lit(0L)).otherwise(col("n_chars")).as("nc"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("sum_chars"))
        .orderBy(col("lang"))),
    // §2b aggregations: TPC-H Q1-style grouped agg (exact decimal sums)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
          ).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // §2b window functions: top-k per group with deterministic tie-break
    "q_topk_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("l_returnflag"), col("rn"))
    })
  )

  private def kvStrSrc(s: SparkSession, dir: String): DataFrame =
    KVSnapshot.srcStr(s, dir).select(col("k").as("key"), col("v").as("value"))
  private def kvStrDst(s: SparkSession, dir: String): DataFrame =
    KVSnapshot.dstStr(s, dir).select(col("k").as("key"), col("v").as("value"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (crc64 checksum family) → driver records a rows-only check; those
    * are covered by scalatest/scalacheck property suites instead. */
  def oracleSql: Map[String, String] = {
    val m = parityOracle ++ extensionOracle
    // the live funnel monitor drains per-doc flags through the
    // IDENTICAL funnelFromFlags stage over the same slice — one SQL,
    // two gates (the q_stream_hll / q_hll_ndv sharing pattern)
    m + ("q_stream_funnel" -> m("q_curation_funnel")) +
      // the streaming PCA folds the identical Gram monoid, then the
      // identical driver solve — one SQL, two gates
      ("q_stream_pca" -> m("q_pca_components")) +
      // the live overlap monitor drains the same max-folded registers
      // into the identical pair estimate — one SQL, two gates
      ("q_stream_hll_overlap" -> m("q_hll_overlap")) +
      // the live blocklist monitor folds the identical verified-match
      // cells, but its feed is bounded at doc_id < 5000·sliceScale like
      // every sibling entry — the oracle replays the scale-1 bound
      // (doc_id < 5000) rather than reusing the unbounded batch SQL, so
      // the gate stays honest at any gated SF instead of silently
      // relying on the fixtures' ids staying under the cap
      ("q_stream_blocklist" -> (blocklistMatchCteBounded("doc_id < 5000") +
        """
          |SELECT ph.p, count(DISTINCT m.doc_id) AS n_docs, count(m.p) AS n_hits
          |FROM ph LEFT JOIN m ON ph.p = m.p GROUP BY ph.p ORDER BY ph.p""".stripMargin))
  }

  /** df cap for the exact-Jaccard family: shingles present in more than
    * this many documents are dropped from the candidate self-join (set
    * sizes keep all shingles). Mirrored in the DuckDB oracle below. */
  private val jaccardMaxDf = 100

  /** ONE SRP signature budget shared by the bitext entries AND their
    * oracle CTEs: the rb divisor list below is DERIVED from this k
    * exactly the way [[graft.operators.Similarity.srpBandsFor]] admits
    * widths (divisors of k up to 62), so changing the budget cannot
    * desynchronize engine and oracle band choices. */
  private val srpK = 64
  private val srpWidths = (1 to math.min(srpK, 62)).filter(srpK % _ == 0)

  /** ONE MinHash signature budget + banding target shared by the
    * adaptive-banding entries and their oracle CTEs (the srpK
    * discipline for the MinHash family). */
  private val mhK = 32
  private val mhTau = 0.5
  private val mhOcc = 16.0
  /** ONE multi-probe arm count shared by the MinHash probe entries and
    * their oracle CTEs (the mhK discipline): each arm re-bands the
    * signature along a coprime-stride permutation (Dedup.probeStep) —
    * the oracle embeds each arm's modular-inverse constant. */
  private val mhProbes = 2

  /** ONE IVF recall target (ppm) shared by the q_ann_recall entry and
    * its oracle's replayed chooser. */
  private val annTargetPpm = 900000L
  /** The [[graft.operators.Dedup.lshParamsFor]] replay CTEs (divs,
    * rch): divisor pairs of k, admissibility b·n·(τ/2)^r ≤ occ,
    * inflection nearest τ with ties toward more bands (b DESC),
    * deepest-banding fallback — the identical IEEE predicates, so the
    * chooser cannot drift between engines. */
  private def lshRchCte: String =
    s"divs AS (SELECT d AS r, $mhK // d AS b FROM (VALUES " +
    (1 to mhK).filter(mhK % _ == 0).map(d => s"($d)").mkString(",") +
    s""") t(d)),
       |rch AS (SELECT coalesce((SELECT r FROM divs
       |  WHERE b * (SELECT count(*) FROM documents) * pow(${mhTau / 2.0}, r) <= $mhOcc
       |  ORDER BY abs(pow(1.0/b, 1.0/r) - $mhTau) ASC, b DESC LIMIT 1), $mhK) AS r)""".stripMargin

  /** The multi-probe banded-candidate replay (Dedup's coprime-stride
    * probe arms in SQL): arm p ∈ [0, mhProbes] groups component i into
    * band slot (i·inv_p) mod k (inv_p = the embedded modular inverse of
    * probeStep(p, mhK) — arm 0's step is 1, the standard banding),
    * band_id = slot // r, band key string_agg'd in slot order — exactly
    * the concat order the Scala side emits. Yields `candp`. */
  private def lshCandMpCte: String = {
    val invs = (0 to mhProbes).map(p =>
      s"($p, ${graft.operators.Dedup.probeStepInv(p, mhK)})").mkString(", ")
    s"""bandmp AS (SELECT doc_id, p,
       |    ((i * sinv) % $mhK) // (SELECT r FROM rch) AS band_id,
       |    string_agg(m, '_' ORDER BY (i * sinv) % $mhK) AS bk
       |  FROM msig CROSS JOIN (VALUES $invs) ps(p, sinv)
       |  GROUP BY doc_id, p, ((i * sinv) % $mhK) // (SELECT r FROM rch)),
       |candp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM bandmp a JOIN bandmp b ON a.p = b.p AND a.band_id = b.band_id
       |            AND a.bk = b.bk AND a.doc_id < b.doc_id)""".stripMargin
  }
  /** The srpBandsFor replay CTE: smallest admissible divisor-of-k width
    * with pow(2,r) ≥ n/16 (same IEEE predicate both engines), widest
    * width as the too-big fallback. `eName` is the corpus CTE to count. */
  private def srpRbCte(eName: String): String =
    s"rb AS (SELECT coalesce((SELECT min(d) FROM (VALUES " +
    srpWidths.map(d => s"($d)").mkString(",") +
    s") t(d)\n         WHERE pow(2, d) >= (SELECT count(*) FROM $eName) " +
    s"/ 16.0), ${srpWidths.last}) AS r)"

  // Shared DuckDB fragments for the extension oracles. `pruned` mirrors
  // Dedup.jaccardJoin's maxDf semantics: the intersection join runs over
  // df-filtered shingles, sizes over all shingles.
  private def shingleCteOf(maxDf: Option[Int]): String = {
    val tokp = maxDf match {
      case Some(cap) =>
        s"""tokp AS (SELECT tok.doc_id, tok.t FROM tok
           |         JOIN (SELECT t FROM tok GROUP BY t HAVING count(*) <= $cap) keep
           |         USING (t)),
           |""".stripMargin
      case None => "tokp AS (SELECT doc_id, t FROM tok),\n"
    }
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         generate_series(1, greatest(len(w)-2, 1)),
      |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
      |tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
      |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |""".stripMargin + tokp +
    """inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |          FROM tokp a JOIN tokp b ON a.t = b.t AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jac AS (SELECT doc_a, doc_b,
      |          round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
      |        FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
      |""".stripMargin
  }
  private val shingleCte = shingleCteOf(None)
  private val shingleCtePruned = shingleCteOf(Some(jaccardMaxDf))

  /** SimHash signature CTE: per-token 60-bit md5 hash → per-bit ±1 votes
    * with multiplicity → signature = OR of positive-vote bits. Yields
    * CTE `sig` with (doc_id, simhash). */
  private val simhashSigCte: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |h AS (SELECT doc_id, list_reduce(
      |        list_transform(string_split_regex(substr(md5(t), 1, 15), ''),
      |          ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
      |        (a, d) -> a * 16 + d) AS h
      |      FROM tok),
      |votes AS (SELECT doc_id, b,
      |            sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |          FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b)
      |          GROUP BY doc_id, b),
      |sig AS (SELECT doc_id,
      |          CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      |        FROM votes GROUP BY doc_id)
      |""".stripMargin

  /** PCA oracle chain shared by q_pca_project / q_pca_components:
    * replays Pca exactly — BIGINT doc quality features, homogeneous
    * Gram split into p/s/nn, exact scatter c = n·p − s·sᵀ in
    * DECIMAL(38,0), then 6 unrolled power-iteration rounds whose
    * renormalizing division routes through HUGEINT `//` (truncation
    * toward zero == BigInt `/`; DECIMAL `//` in DuckDB is REAL division
    * and silently rounds). MATERIALIZED hints keep DuckDB from inlining
    * the chain (inlined, the plan doubles per round). Ends with
    * v6(i, v) plus q/s/c/nn in scope. */
  private val pcaCte: String = {
    val rounds = (0 until 6).map { r =>
      s"""w$r AS MATERIALIZED (SELECT c.i, sum(c.cij * v.v) AS w FROM c JOIN v$r v ON c.j = v.i GROUP BY 1),
         |v${r + 1} AS MATERIALIZED (SELECT i, CAST(CAST(w * 1000000 AS HUGEINT) // (SELECT CAST(max(abs(w)) AS HUGEINT) FROM w$r) AS DECIMAL(38,0)) AS v FROM w$r)""".stripMargin
    }.mkString(",\n")
    """WITH f AS (SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS f0,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS f1,
      |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS f2,
      |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS f3,
      |  CAST(list_max(list_transform(string_split(text,' '), t -> length(t))) AS BIGINT) AS f4,
      |  CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS f5
      |FROM documents),
      |q AS MATERIALIZED (SELECT doc_id, unnest(generate_series(0,5)) AS i, unnest([f0,f1,f2,f3,f4,f5]) AS qx FROM f),
      |nn AS (SELECT count(*) AS n FROM f),
      |s AS (SELECT i, sum(qx)::DECIMAL(38,0) AS si FROM q GROUP BY i),
      |p AS (SELECT a.i AS i, b.i AS j, sum(a.qx*b.qx)::DECIMAL(38,0) AS pij FROM q a JOIN q b USING (doc_id) GROUP BY 1,2),
      |c AS MATERIALIZED (SELECT p.i, p.j, (SELECT n FROM nn)*pij - sa.si*sb.si AS cij
      |      FROM p JOIN s sa ON p.i = sa.i JOIN s sb ON p.j = sb.i),
      |v0 AS MATERIALIZED (SELECT i, 1000000::DECIMAL(38,0) AS v FROM range(6) t(i)),
      |""".stripMargin + rounds
  }

  /** Deflation extension of [[pcaCte]]: λ = ⌊v'Cv // v'v⌋ (HUGEINT),
    * C₂ = C − ⌊λ·vᵢ·vⱼ // v'v⌋ per cell (the per-cell truncation keeps
    * every intermediate ≲1e33 — the textbook C·(v'v)² form overflows
    * HUGEINT at sf1), then 80 unrolled power rounds over c2 (fixed
    * point measured at round 26/22/35 across the three SFs, 69 on the
    * PcaSpec fixture; fixed
    * rounds keep the chain a pure function). Ends with u80(i, v). */
  private val pcaDeflateCte: String = {
    val rounds2 = (0 until 80).map { r =>
      s"""x$r AS MATERIALIZED (SELECT c.i, sum(c.cij * v.v) AS w FROM c2 c JOIN u$r v ON c.j = v.i GROUP BY 1),
         |u${r + 1} AS MATERIALIZED (SELECT i, CAST(CAST(w * 1000000 AS HUGEINT) // (SELECT CAST(max(abs(w)) AS HUGEINT) FROM x$r) AS DECIMAL(38,0)) AS v FROM x$r)""".stripMargin
    }.mkString(",\n")
    """,
      |vv1 AS (SELECT CAST(sum(v*v) AS HUGEINT) AS vv FROM v6),
      |lam AS (SELECT CAST(CAST((SELECT sum(va.v * c.cij * vb.v)
      |           FROM c JOIN v6 va ON c.i = va.i JOIN v6 vb ON c.j = vb.i) AS HUGEINT)
      |         // (SELECT vv FROM vv1) AS DECIMAL(38,0)) AS lam),
      |c2 AS MATERIALIZED (SELECT c.i, c.j,
      |      c.cij - CAST(CAST((SELECT lam FROM lam) * va.v * vb.v AS HUGEINT)
      |        // (SELECT vv FROM vv1) AS DECIMAL(38,0)) AS cij
      |      FROM c JOIN v6 va ON c.i = va.i JOIN v6 vb ON c.j = vb.i),
      |u0 AS MATERIALIZED (SELECT i, 1000000::DECIMAL(38,0) AS v FROM range(6) t(i)),
      |""".stripMargin + rounds2
  }

  /** Deterministic k-means assignment CTE, shared by q_ann_kmeans and
    * q_semantic_dedup: replays Similarity.kmeansCodebook (seeds = 5
    * smallest (md5(id), id) vectors; two unrolled assignment/update
    * rounds with the 9-dp cosine, cluster_id tie-break, DECIMAL(27,15)
    * means, emptied clusters keeping their centroid) and ends with
    * `asg(vec_id, v, cluster_id)` — every vector's final cluster. */
  private val kmeansAsgCte: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |cent0 AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cluster_id,
      |            v AS cvec
      |          FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 5),
      |a1 AS (SELECT e.vec_id, e.v, c.cluster_id,
      |         round(list_dot_product(e.v, c.cvec)
      |           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
      |       FROM e CROSS JOIN cent0 c),
      |asg1 AS (SELECT vec_id, v, cluster_id FROM (
      |           SELECT *, row_number() OVER (PARTITION BY vec_id
      |             ORDER BY csim DESC, cluster_id) AS r FROM a1) WHERE r = 1),
      |px1 AS (SELECT cluster_id, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM asg1),
      |cm1 AS (SELECT cluster_id, pos,
      |          CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS m
      |        FROM px1 GROUP BY cluster_id, pos),
      |mean1 AS (SELECT cluster_id, list(m ORDER BY pos) AS cvec FROM cm1 GROUP BY cluster_id),
      |cent1 AS (SELECT p.cluster_id, coalesce(m.cvec, p.cvec) AS cvec
      |          FROM cent0 p LEFT JOIN mean1 m USING (cluster_id)),
      |a2 AS (SELECT e.vec_id, e.v, c.cluster_id,
      |         round(list_dot_product(e.v, c.cvec)
      |           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
      |       FROM e CROSS JOIN cent1 c),
      |asg2 AS (SELECT vec_id, v, cluster_id FROM (
      |           SELECT *, row_number() OVER (PARTITION BY vec_id
      |             ORDER BY csim DESC, cluster_id) AS r FROM a2) WHERE r = 1),
      |px2 AS (SELECT cluster_id, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM asg2),
      |cm2 AS (SELECT cluster_id, pos,
      |          CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS m
      |        FROM px2 GROUP BY cluster_id, pos),
      |mean2 AS (SELECT cluster_id, list(m ORDER BY pos) AS cvec FROM cm2 GROUP BY cluster_id),
      |cent AS (SELECT p.cluster_id, coalesce(m.cvec, p.cvec) AS cvec
      |         FROM cent1 p LEFT JOIN mean2 m USING (cluster_id)),
      |asg0 AS (SELECT e.vec_id, e.v, c.cluster_id,
      |           round(list_dot_product(e.v, c.cvec)
      |             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
      |         FROM e CROSS JOIN cent c),
      |asg AS (SELECT vec_id, v, cluster_id FROM (
      |          SELECT *, row_number() OVER (PARTITION BY vec_id
      |            ORDER BY csim DESC, cluster_id) AS r FROM asg0) WHERE r = 1)""".stripMargin

  /** Two-level codebook oracle CTEs, replaying
    * [[graft.operators.Similarity.hierAssign]] at iters=2 with the
    * codebook split (k1v, k2v) supplied by the `kp` CTE — a pair of
    * literals for the fixed entry, or the
    * [[graft.operators.Similarity.semanticDedupAuto]] derivation
    * (k = ⌈n/occ⌉, k1 = ⌈√k⌉, k2 = max(2, ⌈k/k1⌉)) computed from
    * count(*) for the auto entry, so the DEFAULT route is itself
    * hash-gated. The coarse half is the [[kmeansAsgCte]] construction
    * (md5-ordered seeds, two DECIMAL-mean rounds, final argmax
    * assignment `casg`); the fine half trains k-means per coarse GROUP
    * — seeds are each group's k2v smallest (60-bit md5(id), id)
    * members, each round an equi-join on coarse + per-vector argmax
    * (csim DESC, j) + component means grouped (coarse, j, pos), empty
    * cells keeping their previous centroid. Ends with
    * `hasg(vec_id, v, cluster_id = coarse·k2v + j)`. */
  private def hierAsgCteWith(kp: String): String = {
    val cos = (a: String, b: String) =>
      s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 9)"
    def fineRound(prev: String, r: Int): String =
      s"""fa$r AS (SELECT t.vec_id, t.v, t.coarse, c.j, ${cos("t.v", "c.cvec")} AS csim
         |       FROM casg t JOIN $prev c ON t.coarse = c.coarse),
         |fasg$r AS (SELECT vec_id, v, coarse, j FROM (
         |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS r FROM fa$r) WHERE r = 1),
         |fpx$r AS (SELECT coarse, j, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM fasg$r),
         |fcm$r AS (SELECT coarse, j, pos, CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS m
         |       FROM fpx$r GROUP BY coarse, j, pos),
         |fmean$r AS (SELECT coarse, j, list(m ORDER BY pos) AS cvec FROM fcm$r GROUP BY coarse, j),
         |fc$r AS (SELECT p.coarse, p.j, coalesce(m.cvec, p.cvec) AS cvec
         |       FROM $prev p LEFT JOIN fmean$r m USING (coarse, j))""".stripMargin
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |$kp,
       |cc0 AS (SELECT rn - 1 AS coarse, v AS cvec FROM (
       |        SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM e)
       |        CROSS JOIN kp WHERE rn <= k1v),
       |ca1 AS (SELECT e.vec_id, e.v, c.coarse, ${cos("e.v", "c.cvec")} AS csim FROM e CROSS JOIN cc0 c),
       |casg1 AS (SELECT vec_id, v, coarse FROM (
       |        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, coarse) AS r FROM ca1) WHERE r = 1),
       |cpx1 AS (SELECT coarse, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM casg1),
       |ccm1 AS (SELECT coarse, pos, CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS m FROM cpx1 GROUP BY coarse, pos),
       |cmean1 AS (SELECT coarse, list(m ORDER BY pos) AS cvec FROM ccm1 GROUP BY coarse),
       |cc1 AS (SELECT p.coarse, coalesce(m.cvec, p.cvec) AS cvec FROM cc0 p LEFT JOIN cmean1 m USING (coarse)),
       |ca2 AS (SELECT e.vec_id, e.v, c.coarse, ${cos("e.v", "c.cvec")} AS csim FROM e CROSS JOIN cc1 c),
       |casg2 AS (SELECT vec_id, v, coarse FROM (
       |        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, coarse) AS r FROM ca2) WHERE r = 1),
       |cpx2 AS (SELECT coarse, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM casg2),
       |ccm2 AS (SELECT coarse, pos, CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS m FROM cpx2 GROUP BY coarse, pos),
       |cmean2 AS (SELECT coarse, list(m ORDER BY pos) AS cvec FROM ccm2 GROUP BY coarse),
       |cc AS (SELECT p.coarse, coalesce(m.cvec, p.cvec) AS cvec FROM cc1 p LEFT JOIN cmean2 m USING (coarse)),
       |ca0 AS (SELECT e.vec_id, e.v, c.coarse, ${cos("e.v", "c.cvec")} AS csim FROM e CROSS JOIN cc c),
       |casg AS (SELECT vec_id, v, coarse FROM (
       |        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, coarse) AS r FROM ca0) WHERE r = 1),
       |fc0 AS (SELECT coarse, j, v AS cvec FROM (
       |        SELECT coarse, v, row_number() OVER (PARTITION BY coarse
       |          ORDER BY ${duckHash60("CAST(vec_id AS VARCHAR)")}, vec_id) - 1 AS j
       |        FROM casg) CROSS JOIN kp WHERE j < k2v),
       |${fineRound("fc0", 1)},
       |${fineRound("fc1", 2)},
       |faF AS (SELECT t.vec_id, t.v, t.coarse, c.j, ${cos("t.v", "c.cvec")} AS csim
       |        FROM casg t JOIN fc2 c ON t.coarse = c.coarse),
       |hasg AS (SELECT vec_id, v, coarse * k2v + j AS cluster_id FROM (
       |        SELECT f.*, kp.k2v, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS r
       |        FROM faF f CROSS JOIN kp) WHERE r = 1)""".stripMargin
  }

  /** The fixed-(3,4) instantiation (q_semantic_dedup_hier). */
  private def hierAsgCte: String = hierAsgCteWith(
    "kp AS (SELECT CAST(3 AS BIGINT) AS k1v, CAST(4 AS BIGINT) AS k2v)")

  /** The AUTO instantiation: (k1v, k2v) derived from count(*) exactly
    * as [[graft.operators.Similarity.semanticDedupAuto]] derives them
    * (targetOccupancy 64, minK 2). */
  private def hierAsgCteAuto: String = hierAsgCteWith(
    """kn AS (SELECT greatest(CAST(2 AS BIGINT), (count(*) + 63) // 64) AS kv FROM e),
      |k1c AS (SELECT CAST(ceil(sqrt(CAST(kv AS DOUBLE))) AS BIGINT) AS k1v, kv FROM kn),
      |kp AS (SELECT k1v, greatest(CAST(2 AS BIGINT), (kv + k1v - 1) // k1v) AS k2v FROM k1c)""".stripMargin)

  /** One product-quantization subspace's oracle CTEs (Scala-generated
    * SQL, like [[crc64TabCte]]): the [[kmeansAsgCte]] construction on
    * `v[lo:hi]` — md5-ordered seeds, two assignment+DECIMAL-mean
    * rounds, final assignment — plus the per-query ADC lookup table
    * (subspace dot + centroid self-dot). Suffixed `_mi` so four
    * subspaces coexist in one query. */
  private def pqSubCte(mi: Int, lo: Int, hi: Int, k: Int): String = {
    val s = s"_$mi"
    def asg(srcCent: String, name: String): String =
      s"""a$name$s AS (SELECT t.vec_id, t.v, c.cluster_id,
         |       round(list_dot_product(t.v, c.cvec)
         |         / (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
         |     FROM sub$s t CROSS JOIN $srcCent c),
         |asg$name$s AS (SELECT vec_id, v, cluster_id FROM (
         |       SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cluster_id) AS r
         |       FROM a$name$s) WHERE r = 1)""".stripMargin
    def mean(name: String): String =
      s"""px$name$s AS (SELECT cluster_id, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM asg$name$s),
         |cm$name$s AS (SELECT cluster_id, pos, CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS m
         |     FROM px$name$s GROUP BY cluster_id, pos),
         |mean$name$s AS (SELECT cluster_id, list(m ORDER BY pos) AS cvec FROM cm$name$s GROUP BY cluster_id)""".stripMargin
    s"""sub$s AS (SELECT vec_id, v[$lo:$hi] AS v FROM e),
       |cent0$s AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cluster_id, v AS cvec
       |           FROM sub$s ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k),
       |${asg("cent0" + s, "1")},
       |${mean("1")},
       |cent1$s AS (SELECT p.cluster_id, coalesce(m.cvec, p.cvec) AS cvec FROM cent0$s p LEFT JOIN mean1$s m USING (cluster_id)),
       |${asg("cent1" + s, "2")},
       |${mean("2")},
       |cent$s AS (SELECT p.cluster_id, coalesce(m.cvec, p.cvec) AS cvec FROM cent1$s p LEFT JOIN mean2$s m USING (cluster_id)),
       |${asg("cent" + s, "F")},
       |codes$s AS (SELECT vec_id, cluster_id AS code$mi FROM asgF$s),
       |lut$s AS (SELECT q.query_id, c.cluster_id AS code$mi,
       |     list_dot_product(q.v[$lo:$hi], c.cvec) AS d$mi,
       |     list_dot_product(c.cvec, c.cvec) AS e$mi
       |   FROM qv q CROSS JOIN cent$s c)""".stripMargin
  }

  /** Full PQ-ADC oracle: replays Similarity.pqTopK (m=4, subDim=16,
    * kSub=5, iters=2, queries vec_id<10, top-3). */
  private val pqOracle: String = {
    val subs = (0 until 4).map(mi => pqSubCte(mi, mi * 16 + 1, mi * 16 + 16, 5))
      .mkString(",\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |qv AS (SELECT vec_id AS query_id, v, sqrt(list_dot_product(v, v)) AS qn FROM e WHERE vec_id < 10),
       |$subs,
       |allcodes AS (SELECT c0.vec_id, code0, code1, code2, code3
       |  FROM codes_0 c0 JOIN codes_1 USING (vec_id) JOIN codes_2 USING (vec_id) JOIN codes_3 USING (vec_id)),
       |scored AS (SELECT l0.query_id, a.vec_id,
       |    round((d0+d1+d2+d3) / (q.qn * sqrt(e0+e1+e2+e3)), 9) AS sim
       |  FROM allcodes a
       |  JOIN lut_0 l0 USING (code0)
       |  JOIN lut_1 l1 ON l1.query_id = l0.query_id AND l1.code1 = a.code1
       |  JOIN lut_2 l2 ON l2.query_id = l0.query_id AND l2.code2 = a.code2
       |  JOIN lut_3 l3 ON l3.query_id = l0.query_id AND l3.code3 = a.code3
       |  JOIN qv q ON q.query_id = l0.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM scored)
       |SELECT query_id, vec_id, sim, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** IVF+PQ+refine oracle: the [[kmeansAsgCte]] coarse construction
    * (ending in `cent`/`asg`), the four [[pqSubCte]] subspace
    * codebooks+LUTs, the nprobe=2 probe, ADC over pruned candidates,
    * and the k·overfetch=9 full-precision refine. */
  private val ivfPqOracle: String = {
    val subs = (0 until 4).map(mi => pqSubCte(mi, mi * 16 + 1, mi * 16 + 16, 5))
      .mkString(",\n")
    s"""$kmeansAsgCte,
       |qv AS (SELECT vec_id AS query_id, v, sqrt(list_dot_product(v, v)) AS qn FROM e WHERE vec_id < 10),
       |$subs,
       |allcodes AS (SELECT c0.vec_id, code0, code1, code2, code3
       |  FROM codes_0 c0 JOIN codes_1 USING (vec_id) JOIN codes_2 USING (vec_id) JOIN codes_3 USING (vec_id)),
       |cp AS (SELECT q.query_id, c.cluster_id,
       |         round(list_dot_product(q.v, c.cvec) / (q.qn * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
       |       FROM qv q CROSS JOIN cent c),
       |qprobe AS (SELECT query_id, cluster_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cluster_id) AS r FROM cp) WHERE r <= 2),
       |cand AS (SELECT p.query_id, a.vec_id FROM asg a JOIN qprobe p USING (cluster_id)
       |         WHERE a.vec_id <> p.query_id),
       |adc AS (SELECT c.query_id, c.vec_id,
       |          round((d0+d1+d2+d3) / (q.qn * sqrt(e0+e1+e2+e3)), 9) AS sim
       |        FROM cand c
       |        JOIN allcodes a ON a.vec_id = c.vec_id
       |        JOIN lut_0 l0 ON l0.query_id = c.query_id AND l0.code0 = a.code0
       |        JOIN lut_1 l1 ON l1.query_id = c.query_id AND l1.code1 = a.code1
       |        JOIN lut_2 l2 ON l2.query_id = c.query_id AND l2.code2 = a.code2
       |        JOIN lut_3 l3 ON l3.query_id = c.query_id AND l3.code3 = a.code3
       |        JOIN qv q ON q.query_id = c.query_id),
       |short AS (SELECT query_id, vec_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS pr FROM adc) WHERE pr <= 9),
       |rr AS (SELECT s.query_id, s.vec_id,
       |         round(list_dot_product(qe.v, ce.v) / (qe.qn * sqrt(list_dot_product(ce.v, ce.v))), 9) AS sim
       |       FROM short s JOIN qv qe ON qe.query_id = s.query_id JOIN e ce ON ce.vec_id = s.vec_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM rr)
       |SELECT query_id, vec_id, sim, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** CRC64 in pure DuckDB SQL — the EXACT algorithm of
    * `functions/Crc64.scala` (reflected ECMA-182 polynomial, init ~0,
    * final complement): the 256-entry lookup table is generated by 8
    * unrolled polynomial-division steps over UBIGINT, and each row
    * digest is a `list_reduce` fold over the ASCII bytes of key‖value
    * (every KV fixture is pure ASCII, so `ord(char) = byte`). This puts
    * the whole checksum family — previously property-tested only —
    * under the cross-engine oracle gate. */
  private val crc64TabCte: String = {
    val poly = java.lang.Long.toUnsignedString(graft.functions.Crc64.Poly)
    val steps = (0 until 8).map { j =>
      s"c${j + 1} AS (SELECT i, CASE WHEN c & 1 = 1 THEN xor(c >> 1, CAST('$poly' AS UBIGINT)) ELSE c >> 1 END AS c FROM c$j)"
    }.mkString(",\n")
    s"""c0 AS (SELECT i, CAST(i AS UBIGINT) AS c FROM range(256) t(i)),
       |$steps,
       |crctab AS (SELECT list(c ORDER BY i) AS tab FROM c8)""".stripMargin
  }

  /** CTE pair `<name>0`/`<name>`: per-row signed-long CRC64 over the
    * ASCII bytes of `k ‖ v` from `src` (which must expose VARCHAR k, v
    * plus any `carry` columns). The unsigned fold result is re-signed
    * through HUGEINT to match Spark's two's-complement long. */
  private def crcRows(name: String, src: String, carry: Seq[String] = Nil): String = {
    val cs = carry.map(_ + ", ").mkString
    s"""${name}0 AS (SELECT $cs k, v,
       |  xor(list_reduce(list_prepend(CAST('18446744073709551615' AS UBIGINT),
       |        list_transform(string_split_regex(k || v, ''), ch -> CAST(ord(ch) AS UBIGINT))),
       |      (acc, b) -> xor(tab[CAST((xor(acc, b) & 255) AS INT) + 1], acc >> 8)),
       |    CAST('18446744073709551615' AS UBIGINT)) AS crc_u
       |  FROM $src CROSS JOIN crctab),
       |$name AS (SELECT $cs k, v,
       |  CAST(CASE WHEN crc_u >= CAST('9223372036854775808' AS UBIGINT)
       |       THEN CAST(crc_u AS HUGEINT) - CAST('18446744073709551616' AS HUGEINT)
       |       ELSE CAST(crc_u AS HUGEINT) END AS BIGINT) AS crc FROM ${name}0)""".stripMargin
  }
  private val jaccardSelect =
    "SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b"
  private val langHits = TextAnalysis.langProfiles.map { case (code, ws) =>
    s"len(list_filter(string_split(text,' '), t -> t IN (${ws.map("'" + _ + "'").mkString(",")}))) AS $code"
  }.mkString(",\n  ")
  private val ngramHits = TextAnalysis.charNgramProfiles.map { case (code, ngs) =>
    s"len(regexp_extract_all(text, '${ngs.mkString("|")}')) AS $code"
  }.mkString(",\n  ")

  private def extensionOracle: Map[String, String] = Map(
    // replays Events.linearTrend: integerized (x, yq), five DECIMAL(38,0)
    // OLS sums, closed-form num/den emitted as digit strings
    "q_linear_trend" ->
      """WITH pts AS (SELECT event_type,
        |    epoch_us(ts) // 1000000 - 1704067200 AS x,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS yq
        |  FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(CAST(yq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |    CAST(sum(CAST(x AS DECIMAL(38,0)) * yq) AS DECIMAL(38,0)) AS sxy,
        |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
        |  FROM pts GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
        |  CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den,
        |  CAST(sy * sxx - sx * sxy AS VARCHAR) AS icept_num
        |FROM s ORDER BY event_type""".stripMargin,
    // replays Events.kmSurvival: per-user first qualifying event,
    // day-granular risk sets, 6-dp-quantized ln terms, NULL once S=0
    "q_survival" ->
      """WITH u AS (SELECT user_id, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
        |             min(CASE WHEN value > 150.0 THEN epoch_us(ts) END) AS te
        |           FROM events GROUP BY user_id),
        |d AS (SELECT (coalesce(te, t1) - t0) // 86400000000 AS dur,
        |        CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS ev FROM u),
        |pts AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS n_event,
        |               CAST(count(*) - sum(ev) AS BIGINT) AS n_cens FROM d GROUP BY dur),
        |rs AS (SELECT dur, n_event, n_cens,
        |         CAST(sum(n_event + n_cens) OVER (ORDER BY dur DESC) AS BIGINT) AS at_risk FROM pts),
        |lg AS (SELECT dur, n_event, n_cens, at_risk,
        |         CASE WHEN n_event = 0 OR at_risk = n_event THEN CAST(0 AS DECIMAL(20,6))
        |              ELSE CAST(round(ln(CAST(at_risk - n_event AS DOUBLE) / CAST(at_risk AS DOUBLE)), 6) AS DECIMAL(20,6)) END AS l6,
        |         CASE WHEN at_risk = n_event THEN 1 ELSE 0 END AS hit0 FROM rs),
        |s AS (SELECT dur, n_event, n_cens, at_risk,
        |        CAST(sum(l6) OVER (ORDER BY dur) AS DECIMAL(20,6)) AS ls,
        |        CAST(sum(hit0) OVER (ORDER BY dur) AS BIGINT) AS z FROM lg)
        |SELECT dur AS day, n_event, n_cens, at_risk,
        |  CASE WHEN z > 0 THEN NULL ELSE CAST(ls AS DOUBLE) END AS log_survival
        |FROM s ORDER BY day""".stripMargin,
    // replays Events.trendOutliers with the UNREDUCED per-series window
    // rank — the gate proves the bounded-heap reduction invisible; the
    // floor-division fitted value uses the same pmod construction
    "q_trend_outliers" ->
      """WITH pts AS (SELECT event_type AS g, event_id AS id,
        |    epoch_us(ts) // 1000000 - 1704067200 AS x,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS yq
        |  FROM events),
        |s AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(yq) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * yq) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM pts GROUP BY g),
        |cf AS (SELECT g, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
        |         sy * sxx - sx * sxy AS icept
        |       FROM s WHERE n * sxx - sx * sx <> 0),
        |fn AS (SELECT p.g, p.id, p.x, p.yq, c.num * p.x + c.icept AS fn, c.den
        |       FROM pts p JOIN cf c USING (g)),
        |r AS (SELECT g, id, x, yq,
        |        yq - CAST((fn - ((fn % den) + den) % den) // den AS BIGINT) AS resid
        |      FROM fn),
        |rk AS (SELECT g, id, x, yq, resid,
        |         row_number() OVER (PARTITION BY g ORDER BY abs(resid) DESC, id) AS rk
        |       FROM r)
        |SELECT g AS event_type, rk, id AS event_id, x, yq, resid
        |FROM rk WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,
    // replays Events.benford: integer-string first digits, exact ppm
    // shares, literal Benford expectations shared by value
    "q_benford" ->
      """WITH d AS (SELECT event_type AS g,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS yq FROM events),
        |dd AS (SELECT g, CAST(substr(CAST(yq AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |       FROM d WHERE yq > 0),
        |pd AS (SELECT g, digit, count(*) AS n_obs FROM dd GROUP BY g, digit),
        |t AS (SELECT g, count(*) AS n FROM dd GROUP BY g),
        |e(digit, exp_ppm) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
        |SELECT pd.g AS event_type, pd.digit, n_obs,
        |  n_obs * 1000000 // n AS obs_ppm, CAST(exp_ppm AS BIGINT) AS exp_ppm,
        |  abs(n_obs * 1000000 // n - exp_ppm) AS dev_ppm
        |FROM pd JOIN t USING (g) JOIN e USING (digit)
        |ORDER BY event_type, digit""".stripMargin,
    // replays Events.ksDrift: centi-unit bins, integer cross-multiply
    // CDF gap, max row by (gap, bin)
    "q_ks_drift" ->
      """WITH b AS (SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS b
        |           FROM events WHERE event_type IN ('view', 'purchase')),
        |cells AS (SELECT b, sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS ca,
        |                 sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS cb
        |          FROM b GROUP BY b),
        |cum AS (SELECT b, sum(ca) OVER (ORDER BY b) AS cuma,
        |               sum(cb) OVER (ORDER BY b) AS cumb FROM cells),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM cells)
        |SELECT na AS n_a, nb AS n_b,
        |  CAST((abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) * 1000000)
        |    // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ks_ppm,
        |  b AS at_bin
        |FROM cum CROSS JOIN t
        |WHERE na > 0 AND nb > 0
        |ORDER BY abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) DESC, b
        |LIMIT 1""".stripMargin,
    // the live KM drains per-user spans from the state store through
    // the identical curve stage — oracle = the batch KM on the slice
    "q_stream_survival" ->
      """WITH u AS (SELECT user_id, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
        |             min(CASE WHEN value > 150.0 THEN epoch_us(ts) END) AS te
        |           FROM events WHERE user_id < 100 GROUP BY user_id),
        |d AS (SELECT (coalesce(te, t1) - t0) // 86400000000 AS dur,
        |        CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS ev FROM u),
        |pts AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS n_event,
        |               CAST(count(*) - sum(ev) AS BIGINT) AS n_cens FROM d GROUP BY dur),
        |rs AS (SELECT dur, n_event, n_cens,
        |         CAST(sum(n_event + n_cens) OVER (ORDER BY dur DESC) AS BIGINT) AS at_risk FROM pts),
        |lg AS (SELECT dur, n_event, n_cens, at_risk,
        |         CASE WHEN n_event = 0 OR at_risk = n_event THEN CAST(0 AS DECIMAL(20,6))
        |              ELSE CAST(round(ln(CAST(at_risk - n_event AS DOUBLE) / CAST(at_risk AS DOUBLE)), 6) AS DECIMAL(20,6)) END AS l6,
        |         CASE WHEN at_risk = n_event THEN 1 ELSE 0 END AS hit0 FROM rs),
        |s AS (SELECT dur, n_event, n_cens, at_risk,
        |        CAST(sum(l6) OVER (ORDER BY dur) AS DECIMAL(20,6)) AS ls,
        |        CAST(sum(hit0) OVER (ORDER BY dur) AS BIGINT) AS z FROM lg)
        |SELECT dur AS day, n_event, n_cens, at_risk,
        |  CASE WHEN z > 0 THEN NULL ELSE CAST(ls AS DOUBLE) END AS log_survival
        |FROM s ORDER BY day""".stripMargin,
    // replays TextAnalysis.chi2Terms: distinct (doc, term) presence,
    // one-vs-rest 2×2 counts, DECIMAL(38,0) products, floor-ppm gate
    "q_chi2_terms" ->
      """WITH td AS (SELECT DISTINCT doc_id, lang, unnest(string_split(text,' ')) AS w FROM documents),
        |n AS (SELECT count(*) AS n FROM documents),
        |nl AS (SELECT lang, count(*) AS nl FROM documents GROUP BY lang),
        |a AS (SELECT w, lang, count(*) AS a FROM td GROUP BY w, lang),
        |ta AS (SELECT w, sum(a) AS ta FROM a GROUP BY w),
        |cells AS (
        |  SELECT a.lang, a.w, a.a, ta.ta - a.a AS b, nl.nl - a.a AS c,
        |         n.n - nl.nl - (ta.ta - a.a) AS d, n.n AS n, nl.nl AS nl, ta.ta AS ta
        |  FROM a JOIN ta USING (w) JOIN nl USING (lang) CROSS JOIN n),
        |x AS (
        |  -- HUGEINT division: DuckDB's // on DECIMALs rounds the decimal
        |  -- quotient before flooring; HUGEINT // is the exact floor Spark's
        |  -- decimal `div` (divideToIntegralValue) computes
        |  SELECT lang, w, a,
        |    CAST(CAST(CAST(n AS HUGEINT) *
        |          (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c) *
        |          (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c) * 1000000 AS HUGEINT)
        |      // CAST(CAST(ta AS HUGEINT) * (n - ta) * nl * (n - nl) AS HUGEINT) AS BIGINT) AS chi2_ppm
        |  FROM cells WHERE a >= 5 AND ta < n AND nl < n)
        |SELECT lang AS label, w AS term, a AS df_in, chi2_ppm
        |FROM x WHERE chi2_ppm >= 3841459
        |ORDER BY label, chi2_ppm DESC, term""".stripMargin,
    // replays Graph.hits: 2 integer power-iteration rounds with
    // max-renormalization, unrolled (the q_pagerank oracle discipline)
    "q_hits" ->
      """WITH e AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |h0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS h FROM e),
        |a1r AS (SELECT e.dst AS node, sum(h.h) AS s FROM e JOIN h0 h ON e.src = h.node GROUP BY e.dst),
        |a1 AS (SELECT node, CAST((s * 1000000) // (SELECT max(s) FROM a1r) AS BIGINT) AS a FROM a1r),
        |h1r AS (SELECT e.src AS node, sum(a.a) AS s FROM e JOIN a1 a ON e.dst = a.node GROUP BY e.src),
        |h1 AS (SELECT node, CAST((s * 1000000) // (SELECT max(s) FROM h1r) AS BIGINT) AS h FROM h1r),
        |a2r AS (SELECT e.dst AS node, sum(h.h) AS s FROM e JOIN h1 h ON e.src = h.node GROUP BY e.dst),
        |a2 AS (SELECT node, CAST((s * 1000000) // (SELECT max(s) FROM a2r) AS BIGINT) AS a FROM a2r),
        |h2r AS (SELECT e.src AS node, sum(a.a) AS s FROM e JOIN a2 a ON e.dst = a.node GROUP BY e.src),
        |h2 AS (SELECT node, CAST((s * 1000000) // (SELECT max(s) FROM h2r) AS BIGINT) AS h FROM h2r),
        |u AS (SELECT 'authority' AS side, node, a AS score FROM a2
        |      UNION ALL
        |      SELECT 'hub' AS side, node, h AS score FROM h2),
        |rk AS (SELECT side, node, score,
        |       row_number() OVER (PARTITION BY side ORDER BY score DESC, node) AS rk FROM u)
        |SELECT side,
        |  CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
        |       ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
        |  score, rk
        |FROM rk WHERE rk <= 20 ORDER BY side, rk""".stripMargin,
    // replays Retrieval.bm25Ranks (integer milli-unit Okapi, k1=1.2
    // b=0.75, self-excluded) + the dense cosine top-20 + the integer
    // ppb reciprocal-rank fusion, end-to-end
    "q_hybrid_rrf" -> (bm25LexCte(20) +
      """,
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
        |             round(list_dot_product(q.v, c.v) /
        |               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 9) AS sim
        |           FROM (SELECT * FROM e WHERE vec_id < 5) q JOIN e c ON q.vec_id <> c.vec_id),
        |dense AS (SELECT * FROM (SELECT query_id, doc_id,
        |            row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rank
        |          FROM scored) WHERE rank <= 20),
        |contrib AS (SELECT query_id, doc_id, 1000000000 // (60 + rank) AS c FROM lex
        |            UNION ALL
        |            SELECT query_id, doc_id, 1000000000 // (60 + rank) AS c FROM dense),
        |fused AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_ppb
        |          FROM contrib GROUP BY 1, 2)
        |SELECT * FROM (SELECT query_id, doc_id, rrf_ppb,
        |  row_number() OVER (PARTITION BY query_id ORDER BY rrf_ppb DESC, doc_id) AS rank
        |FROM fused) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),
    // replays Retrieval.retrievalQuality over the shared bm25LexCte:
    // truth = same-lang pairs (self excluded); the gain / ideal-prefix
    // CASE arms are generated from the SAME Retrieval.ndcgGains
    // constants the Spark plan inlines, so neither engine evaluates a
    // log at query time; FULL JOIN keeps zero-result queries scored 0
    "q_retrieval_quality" -> {
      val gains = Retrieval.ndcgGains(10)
      val gc = gains.map { case (i, g) => s"WHEN $i THEN $g" }.mkString(" ")
      val pc = gains.map(_._2).scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }.mkString(" ")
      bm25LexCte(10) +
      s""",
         |tr AS (SELECT DISTINCT q.doc_id AS query_id, c.doc_id
         |       FROM documents q JOIN documents c ON q.lang = c.lang
         |       WHERE q.doc_id < 5 AND c.doc_id <> q.doc_id),
         |hits AS (SELECT l.query_id, l.rank,
         |           CASE WHEN tr.doc_id IS NULL THEN 0 ELSE 1 END AS rel
         |         FROM lex l LEFT JOIN tr ON l.query_id = tr.query_id AND l.doc_id = tr.doc_id),
         |perq AS (SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_rel_at_k,
         |           min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
         |           CAST(sum(CASE WHEN rel = 1 THEN (CASE rank $gc ELSE 0 END) ELSE 0 END) AS BIGINT) AS dcg
         |         FROM hits GROUP BY query_id),
         |tot AS (SELECT query_id, count(*) AS n_rel FROM tr GROUP BY query_id)
         |SELECT COALESCE(p.query_id, t.query_id) AS query_id,
         |  COALESCE(p.n_rel_at_k, 0) AS n_rel_at_k,
         |  COALESCE(1000000 // first_rel, 0) AS rr_ppm,
         |  CASE WHEN COALESCE(least(t.n_rel, 10), 0) = 0 THEN 0
         |       ELSE CAST(COALESCE(p.dcg, 0) * 1000000 // (CASE least(t.n_rel, 10) $pc ELSE 0 END) AS BIGINT)
         |  END AS ndcg_ppm
         |FROM perq p FULL JOIN tot t ON p.query_id = t.query_id
         |ORDER BY query_id""".stripMargin
    },
    // replays TextAnalysis.dsirSelect: md5-hashed 256-bucket unigram
    // counts, add-1-smoothed target/raw ratio in exact ppm (HUGEINT ↔
    // DECIMAL(38,0)), per-token mean weight over non-target docs
    "q_dsir_select" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t FROM documents),
        |b AS (SELECT doc_id, lang,
        |        list_reduce(list_transform(string_split_regex(substr(md5(t), 1, 6), ''),
        |          ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
        |          (a, x) -> a * 16 + x) % 256 AS bkt
        |      FROM tok),
        |rawc AS (SELECT bkt, count(*) AS rc FROM b GROUP BY bkt),
        |tgtc AS (SELECT bkt, count(*) AS tc FROM b WHERE lang = 'en' GROUP BY bkt),
        |tot AS (SELECT count(*) AS raw_total,
        |               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_total FROM b),
        |wts AS (SELECT rawc.bkt,
        |          CAST(((COALESCE(tc, 0) + 1) * CAST(raw_total + 256 AS HUGEINT) * 1000000)
        |            // ((rc + 1) * CAST(tgt_total + 256 AS HUGEINT)) AS BIGINT) AS w_ppm
        |        FROM rawc LEFT JOIN tgtc ON rawc.bkt = tgtc.bkt CROSS JOIN tot)
        |SELECT doc_id, lang, n_tokens, score_ppm FROM (
        |  SELECT b.doc_id, b.lang, count(*) AS n_tokens,
        |    CAST(sum(w_ppm) // count(*) AS BIGINT) AS score_ppm
        |  FROM b JOIN wts ON b.bkt = wts.bkt WHERE b.lang <> 'en'
        |  GROUP BY 1, 2)
        |ORDER BY score_ppm DESC, doc_id LIMIT 50""".stripMargin,
    // replays TextAnalysis.vocabGrowth: md5(doc_id) slice assignment,
    // per-token min-slice, 10-row cumulative window
    "q_vocab_growth" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST((list_reduce(list_transform(string_split_regex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 2), ''),
        |      ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
        |      (a, x) -> a * 16 + x) * 10) // 256 AS INT) AS slice
        |  FROM documents),
        |tok AS (SELECT slice, unnest(string_split(text, ' ')) AS t FROM d),
        |db AS (SELECT slice, count(*) AS n_docs FROM d GROUP BY slice),
        |ob AS (SELECT slice, count(*) AS n_tok FROM tok GROUP BY slice),
        |vb AS (SELECT slice, count(*) AS n_new
        |       FROM (SELECT t, min(slice) AS slice FROM tok GROUP BY t) GROUP BY slice),
        |spine AS (SELECT unnest(generate_series(0, 9)) AS slice)
        |SELECT spine.slice,
        |  CAST(sum(COALESCE(n_docs, 0)) OVER (ORDER BY spine.slice) AS BIGINT) AS docs_cum,
        |  CAST(sum(COALESCE(n_tok, 0)) OVER (ORDER BY spine.slice) AS BIGINT) AS tokens_cum,
        |  CAST(sum(COALESCE(n_new, 0)) OVER (ORDER BY spine.slice) AS BIGINT) AS vocab_cum
        |FROM spine LEFT JOIN db ON spine.slice = db.slice
        |  LEFT JOIN ob ON spine.slice = ob.slice
        |  LEFT JOIN vb ON spine.slice = vb.slice
        |ORDER BY spine.slice""".stripMargin,
    // replays Graph.linkPredict over the support-2 co-purchase graph:
    // symmetrized adjacency, integer micro-unit 1/deg, wedge join,
    // existing edges anti-joined away, top-20
    "q_link_predict" ->
      """WITH e AS MATERIALIZED (SELECT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT l1.l_orderkey) >= 2),
        |adj AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
        |deg AS (SELECT z, count(*) AS d FROM adj GROUP BY z),
        |awd AS (SELECT adj.z, adj.n, 1000000 // d AS inv FROM adj JOIN deg ON adj.z = deg.z),
        |cand AS (SELECT l.n AS a, r.n AS b, count(*) AS cn, CAST(sum(l.inv) AS BIGINT) AS ra_ppm
        |         FROM awd l JOIN awd r ON l.z = r.z AND l.n < r.n
        |         GROUP BY 1, 2)
        |SELECT c.a, c.b, c.cn, c.ra_ppm
        |FROM cand c LEFT JOIN e ON c.a = e.a AND c.b = e.b
        |WHERE e.a IS NULL
        |ORDER BY c.ra_ppm DESC, c.cn DESC, c.a, c.b LIMIT 20""".stripMargin,
    // replays q_gnn_agg: same coEdges graph, both SAGE layers as
    // adjacency joins with exact integer-micro-unit means
    "q_gnn_agg" ->
      """WITH e AS MATERIALIZED (SELECT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT l1.l_orderkey) >= 2),
        |adj AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
        |f AS (SELECT p_partkey AS v,
        |        CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS f FROM part),
        |h1 AS (SELECT z AS v, CAST(sum(f.f) * 1000000 // count(*) AS BIGINT) AS h1_ppm
        |       FROM adj JOIN f ON adj.n = f.v GROUP BY z),
        |h2 AS (SELECT z AS v, CAST(sum(h1.h1_ppm) // count(*) AS BIGINT) AS h2_ppm
        |       FROM adj JOIN h1 ON adj.n = h1.v GROUP BY z)
        |SELECT f.v, f.f, h1.h1_ppm, h2.h2_ppm
        |FROM f JOIN h1 ON f.v = h1.v JOIN h2 ON f.v = h2.v ORDER BY f.v""".stripMargin,
    // replays q_nation_trade: the Q7 join chain with the pair
    // predicate on both nation dims, 4-dp integer revenue
    "q_nation_trade" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |      (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |      10000 AS BIGINT)) AS DOUBLE) / 10000 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey AND sn.n_name IN ('NATION_3', 'NATION_9')
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey AND cn.n_name IN ('NATION_3', 'NATION_9')
        |WHERE sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // replays q_train_pairs: same per-user window, concat_ws skipping
    // the NULL lags of short prefixes in both engines
    "q_train_pairs" ->
      """WITH w AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pos,
        |    lag(event_type, 3) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS l3,
        |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS l2,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS l1
        |  FROM events)
        |SELECT user_id, pos, concat_ws(' ', l3, l2, l1) AS context, event_type AS label
        |FROM w WHERE pos > 1 AND user_id < 50
        |ORDER BY user_id, pos""".stripMargin,
    // replays q_top_supplier: quarterly 4-dp integer revenue per
    // supplier, max as a scalar, equality join to the dim
    "q_top_supplier" ->
      """WITH r AS (SELECT l_suppkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |        10000 AS BIGINT)) AS total_rev_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY 1),
        |mx AS (SELECT max(total_rev_e4) AS mx FROM r)
        |SELECT s_suppkey, s_name, CAST(total_rev_e4 AS DOUBLE) / 10000 AS total_rev
        |FROM r CROSS JOIN mx JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_e4 = mx.mx
        |ORDER BY s_suppkey""".stripMargin,
    // replays q_small_qty: per-part count+sum(qty), integer
    // cross-multiply threshold qty*5*n < Σqty, cents-exact revenue
    "q_small_qty" ->
      """WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        |li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_c
        |       FROM lineitem JOIN p ON l_partkey = p_partkey),
        |st AS (SELECT l_partkey AS pk, count(*) AS n, CAST(sum(qty) AS BIGINT) AS sq
        |       FROM li GROUP BY 1)
        |SELECT count(*) AS n_small, CAST(sum(price_c) AS DOUBLE) / 100 AS total_price
        |FROM li JOIN st ON l_partkey = pk WHERE qty * 5 * n < sq""".stripMargin,
    // replays q_order_count_dist: the priority predicate riding the ON
    // clause is the same slice as the engine's pre-join filter
    "q_order_count_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // replays q_value_share: integer-cents revenue, one global scalar,
    // exact cross-multiply threshold
    "q_value_share" ->
      """WITH r AS (SELECT l_partkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c, count(*) AS n_parts FROM r)
        |SELECT l_partkey, CAST(rev_c AS DOUBLE) / 100 AS value
        |FROM r CROSS JOIN t WHERE rev_c * n_parts > total_c
        |ORDER BY value DESC, l_partkey""".stripMargin,
    // replays q_min_cost_supplier with the subquery decorrelated by
    // hand (grouped min + equi-join back) — proving the engines agree
    // on what the correlated form means
    "q_min_cost_supplier" ->
      """WITH u AS (SELECT l_partkey, l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      // CAST(l_quantity AS BIGINT) AS unit_c
        |  FROM lineitem),
        |m AS (SELECT l_partkey AS pk, min(unit_c) AS mu FROM u GROUP BY 1)
        |SELECT u.l_partkey, u.l_suppkey, min(u.unit_c) AS best_unit_c
        |FROM u JOIN m ON u.l_partkey = m.pk AND u.unit_c = m.mu
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // replays q_event_paths: same gap rule, same (ts, event_id) order
    // inside the path fold
    "q_event_paths" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS tu, event_id, event_type FROM events),
        |b AS (SELECT *, CASE WHEN lag(tu) OVER w IS NULL OR tu - lag(tu) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS brk
        |      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tu, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS session_no FROM b),
        |p AS (SELECT user_id, session_no,
        |        string_agg(event_type, '>' ORDER BY tu, event_id) AS path
        |      FROM s GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // replays q_neg_sample: the identical seeded-hash draw and
    // over-draw-and-filter
    "q_neg_sample" ->
      s"""WITH n AS (SELECT count(*) AS n FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS q_label FROM embeddings WHERE vec_id < 10),
        |cand AS (SELECT query_id, q_label,
        |           i, ${duckHash60("query_id || '_neg_' || i")} % n.n AS neg_id
        |         FROM q CROSS JOIN n
        |         CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i))
        |SELECT c.query_id, c.i, c.neg_id, e.label AS neg_label
        |FROM cand c JOIN embeddings e ON c.neg_id = e.vec_id
        |WHERE e.label <> c.q_label AND c.neg_id <> c.query_id
        |ORDER BY query_id, i""".stripMargin,
    // replays q_disjunctive_rev: the same OR of cross-table
    // conjunctions, integer cents
    "q_disjunctive_rev" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) / 100 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
        |        AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
        |        AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35
        |        AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,
    // replays q_supplier_variety: anti-join the complaints set, then
    // grouped distinct-supplier counts
    "q_supplier_variety" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_size IN (1, 5, 9, 14)
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    // replays q_decayed_counts: power-of-two decay weights in pure
    // integer shifts, corpus max day as a scalar
    "q_decayed_counts" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |mx AS (SELECT max(day) AS mxday FROM e)
        |SELECT event_type, count(*) AS n_events, max(day) AS last_day,
        |  CAST(sum(CAST(1 AS BIGINT) << CAST(20 - least(mxday - day, 20) AS INTEGER)) AS BIGINT) AS score
        |FROM e CROSS JOIN mx
        |GROUP BY event_type
        |ORDER BY score DESC, event_type""".stripMargin,
    // replays q_seasonal_anomaly: cell counts -> per-(type,hour)
    // baseline -> integer cross-multiply 2x-mean threshold
    "q_seasonal_anomaly" ->
      """WITH cells AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS dayi,
        |    CAST((epoch_ns(ts) // 3600000000000) % 24 AS INTEGER) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |base AS (SELECT event_type AS bg, hr AS bhr, count(*) AS days_seen,
        |    CAST(sum(n) AS BIGINT) AS total
        |  FROM cells GROUP BY 1, 2)
        |SELECT c.event_type, strftime(make_timestamp(c.dayi * 86400000000), '%Y-%m-%d') AS day,
        |  c.hr, c.n, b.days_seen, b.total
        |FROM cells c JOIN base b ON c.event_type = b.bg AND c.hr = b.bhr
        |WHERE c.n * b.days_seen > 2 * b.total
        |ORDER BY c.event_type, day, hr""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS dup_count
        |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin,
    "q_dedup_bag" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS fp,
        |  min(doc_id) AS keep_doc_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q_jaccard_join" -> (shingleCtePruned + jaccardSelect),
    // the estimator gate: same salted md5 min-hash per component, the
    // agreement fraction over k=32 components per exact pair
    "q_minhash_est" -> (shingleCtePruned +
      s""", msig AS (SELECT doc_id, i,
        |            min(${duckHash60("'mh' || i || '_' || t")}) AS m
        |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i)
        |          GROUP BY doc_id, i),
        |p AS (SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5)
        |SELECT p.doc_a, p.doc_b, p.jaccard,
        |  round(CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS DOUBLE) / 32, 6) AS est_jaccard
        |FROM p JOIN msig a ON p.doc_a = a.doc_id
        |       JOIN msig b ON p.doc_b = b.doc_id AND a.i = b.i
        |GROUP BY p.doc_a, p.doc_b, p.jaccard
        |ORDER BY doc_a, doc_b""".stripMargin),
    // replays containmentJoin: pruned intersections from the shared
    // shingle CTE, both directed normalizations, 6-dp round
    "q_containment_join" -> (shingleCtePruned +
      """, withsz AS (SELECT doc_a, doc_b, i, sa.n AS na, sb.n AS nb
        |  FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id),
        |dirs AS (
        |  SELECT doc_a AS container_id, doc_b AS contained_id,
        |    round(CAST(i AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS containment FROM withsz
        |  UNION ALL
        |  SELECT doc_b AS container_id, doc_a AS contained_id,
        |    round(CAST(i AS DOUBLE) / CAST(na AS DOUBLE), 6) AS containment FROM withsz)
        |SELECT * FROM dirs WHERE containment >= 0.8
        |ORDER BY container_id, contained_id""".stripMargin),
    // replays sourceOverlap: distinct (source, shingle) pairs, pairwise
    // intersection counts, integer-ppm Jaccard (shingle-hash identity
    // on the Spark side is execution detail — counts must agree)
    "q_source_overlap" ->
      """WITH toks AS (SELECT source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT source, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |st AS (SELECT DISTINCT src, t FROM (
        |         SELECT source AS src, unnest(s) AS t FROM sh)),
        |sz AS (SELECT src, count(*) AS n FROM st GROUP BY 1),
        |inter AS (SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
        |          FROM st a JOIN st b ON a.t = b.t AND a.src < b.src GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared,
        |  CAST(n_shared * 1000000 // (sa.n + sb.n - n_shared) AS BIGINT) AS jaccard_ppm
        |FROM inter JOIN sz sa ON src_a = sa.src JOIN sz sb ON src_b = sb.src
        |ORDER BY jaccard_ppm DESC, src_a, src_b""".stripMargin,
    // replays lshRecallAuto: same salted md5 signatures, band width r
    // from the REPLAYED chooser (rch CTE — lshParamsFor's admissibility
    // and inflection predicates in the same IEEE doubles), band key =
    // the r components string-joined, banded self-join candidates vs
    // the exact pruned-Jaccard truth; integer-ppm recall/precision
    "q_lsh_recall" -> (shingleCtePruned +
      s""", msig AS (SELECT doc_id, i,
        |            min(${duckHash60("'mh' || i || '_' || t")}) AS m
        |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, ${mhK - 1})) AS i)
        |          GROUP BY doc_id, i),
        |$lshRchCte,
        |band AS (SELECT doc_id, i // (SELECT r FROM rch) AS band_id,
        |           string_agg(m, '_' ORDER BY i) AS bk
        |         FROM msig GROUP BY doc_id, i // (SELECT r FROM rch)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM band a JOIN band b ON a.band_id = b.band_id AND a.bk = b.bk
        |           AND a.doc_id < b.doc_id),
        |$lshCandMpCte,
        |tp AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
        |nt AS (SELECT count(*) AS n_true FROM tp),
        |nc AS (SELECT count(*) AS n_cand FROM cand),
        |nh AS (SELECT count(*) AS n_hit FROM cand SEMI JOIN tp USING (doc_a, doc_b)),
        |ncp AS (SELECT count(*) AS n_cand_mp FROM candp),
        |nhp AS (SELECT count(*) AS n_hit_mp FROM candp SEMI JOIN tp USING (doc_a, doc_b))
        |SELECT n_true, n_cand, n_hit,
        |  CASE WHEN n_true > 0 THEN CAST(n_hit * 1000000 // n_true AS BIGINT) END AS recall_ppm,
        |  CASE WHEN n_cand > 0 THEN CAST(n_hit * 1000000 // n_cand AS BIGINT) END AS precision_ppm,
        |  n_cand_mp, n_hit_mp,
        |  CASE WHEN n_true > 0 THEN CAST(n_hit_mp * 1000000 // n_true AS BIGINT) END AS recall_mp_ppm,
        |  CASE WHEN n_cand_mp > 0 THEN CAST(n_hit_mp * 1000000 // n_cand_mp AS BIGINT) END AS precision_mp_ppm
        |FROM nt CROSS JOIN nc CROSS JOIN nh CROSS JOIN ncp CROSS JOIN nhp""".stripMargin),
    // replays deltaJaccardJoin: same shingle construction, tok split
    // new/old on doc_id % 10, corpus-side df cap, sizes from ALL shingles
    "q_dedup_delta" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
        |newt AS (SELECT doc_id, t FROM tok WHERE doc_id % 10 = 0),
        |oldt AS (SELECT doc_id, t FROM tok WHERE doc_id % 10 <> 0),
        |szn AS (SELECT doc_id, count(*) AS n FROM newt GROUP BY doc_id),
        |szo AS (SELECT doc_id, count(*) AS n FROM oldt GROUP BY doc_id),
        |oldp AS (SELECT oldt.doc_id, oldt.t FROM oldt
        |         JOIN (SELECT t FROM oldt GROUP BY t HAVING count(*) <= $jaccardMaxDf) keep
        |         USING (t)),
        |inter AS (SELECT a.doc_id AS doc_new, b.doc_id AS doc_old, count(*) AS i
        |          FROM newt a JOIN oldp b ON a.t = b.t GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT doc_new, doc_old,
        |    round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN szn sa ON doc_new = sa.doc_id JOIN szo sb ON doc_old = sb.doc_id)
        |WHERE jaccard >= 0.3 ORDER BY doc_new, doc_old""".stripMargin,
    // replays Dedup.decontaminate: same 3-gram shingle construction,
    // tok split train/eval on doc_id % 10, containment = i / |eval|
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
        |tr AS (SELECT doc_id AS train_id, t FROM tok WHERE doc_id % 10 <> 0),
        |ev AS (SELECT doc_id AS eval_id, t FROM tok WHERE doc_id % 10 = 0),
        |esz AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1),
        |inter AS (SELECT train_id, eval_id, count(*) AS i
        |          FROM tr JOIN ev USING (t) GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT train_id, eval_id,
        |    round(CAST(i AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS containment
        |  FROM inter JOIN esz USING (eval_id))
        |WHERE containment >= 0.5 ORDER BY train_id, eval_id""".stripMargin,
    // same shingle construction; train collapses to one DISTINCT set
    "q_contamination_rate" ->
      s"""WITH b AS (SELECT doc_id, text,
        |  ${duckHash60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket FROM documents),
        |toks AS (SELECT doc_id, bucket, string_split(text,' ') AS w FROM b),
        |sh AS (SELECT doc_id, bucket, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |tok AS (SELECT doc_id, bucket, unnest(s) AS t FROM sh),
        |tr AS (SELECT DISTINCT t FROM tok WHERE bucket < 90),
        |ev AS (SELECT doc_id, t FROM tok WHERE bucket >= 90),
        |esz AS (SELECT doc_id, count(*) AS n_shingles FROM ev GROUP BY 1),
        |hits AS (SELECT doc_id, count(*) AS hits FROM ev JOIN tr USING (t) GROUP BY 1)
        |SELECT e.doc_id, e.n_shingles, coalesce(h.hits, 0) AS hits,
        |  coalesce(h.hits, 0) * 1000 // e.n_shingles AS contamination_permille
        |FROM esz e LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_dedup_clusters" -> (shingleCtePruned.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
        |SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach
        |GROUP BY a ORDER BY doc_id""".stripMargin),
    // same recursive clustering + the q_adaptive_quality ppm replay,
    // then the struct-max argmax with the (score, −id) tiebreak
    "q_dedup_best" -> (shingleCtePruned.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
        |qm AS (SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct_tokens,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |FROM documents),
        |qs AS (SELECT doc_id,
        |  4 * n_distinct_tokens + 3 * n_tokens * (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
        |    + 3 * least(3 * n_stop, n_tokens) AS num,
        |  10 * n_tokens AS den FROM qm),
        |qp AS (SELECT doc_id,
        |  CAST(floor(CAST(2000000 * num + den AS DOUBLE) / CAST(2 * den AS DOUBLE)) AS BIGINT) AS score
        |FROM qs),
        |mem AS (SELECT coalesce(c.cluster_id, q.doc_id) AS cluster_id, q.doc_id, q.score
        |        FROM qp q LEFT JOIN cl c USING (doc_id)),
        |agg AS (SELECT cluster_id,
        |          max(struct_pack(s := score, ni := -doc_id)) AS b,
        |          count(*) AS n_members
        |        FROM mem GROUP BY cluster_id)
        |SELECT cluster_id, -(b.ni) AS keep_doc_id, b.s AS best_score, n_members
        |FROM agg ORDER BY cluster_id""".stripMargin),
    // q_dedup_best's keeper set, applied: survivors summarized per lang
    "q_dedup_keep" -> (shingleCtePruned.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
        |qm AS (SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct_tokens,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |FROM documents),
        |qs AS (SELECT doc_id,
        |  4 * n_distinct_tokens + 3 * n_tokens * (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
        |    + 3 * least(3 * n_stop, n_tokens) AS num,
        |  10 * n_tokens AS den FROM qm),
        |qp AS (SELECT doc_id,
        |  CAST(floor(CAST(2000000 * num + den AS DOUBLE) / CAST(2 * den AS DOUBLE)) AS BIGINT) AS score
        |FROM qs),
        |mem AS (SELECT coalesce(c.cluster_id, q.doc_id) AS cluster_id, q.doc_id, q.score
        |        FROM qp q LEFT JOIN cl c USING (doc_id)),
        |agg AS (SELECT cluster_id,
        |          max(struct_pack(s := score, ni := -doc_id)) AS b
        |        FROM mem GROUP BY cluster_id),
        |keep AS (SELECT -(b.ni) AS doc_id FROM agg)
        |SELECT d.lang, count(*) AS n_kept,
        |  CAST(sum(length(d.text)) AS BIGINT) AS sum_chars
        |FROM documents d JOIN keep USING (doc_id)
        |GROUP BY d.lang ORDER BY lang""".stripMargin),
    // leak-free split: same recursive clustering, then the split bucket
    // hashes the cluster representative (singletons = own id)
    "q_split_leakfree" -> (shingleCtePruned.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""", pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |clu AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
        |rep AS (SELECT d.lang, d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep,
        |          ${duckHash60("CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)")} % 100 AS bucket
        |        FROM documents d LEFT JOIN clu c USING (doc_id))
        |SELECT lang,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'validation' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  count(CASE WHEN rep <> doc_id THEN 1 END) AS n_dup_members
        |FROM rep GROUP BY 1, 2 ORDER BY lang, split""".stripMargin),
    // same recursive clusters; fold = salted md5(rep) % 5 per doc
    "q_group_kfold" -> (shingleCtePruned.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""", pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |clu AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
        |SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep,
        |  ${duckHash60("'fold_' || CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)")} % 5 AS fold
        |FROM documents d LEFT JOIN clu c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),
    // the LSH path must recover every pair the exact join finds at this
    // threshold — same oracle; LSH only prunes candidates
    "q_dedup_minhash" -> (shingleCte + jaccardSelect),
    // replays minhashNearDupMd5Auto END-TO-END: the replayed chooser
    // (rch), the salted md5 signatures, band keys, the banded self-join
    // candidate set, and the exact rounded Jaccard ≥ τ restricted to
    // those candidates — a boundary pair the chosen banding misses is
    // missed identically by both engines
    "q_dedup_minhash_auto" -> (shingleCte +
      s""", msig AS (SELECT doc_id, i,
        |            min(${duckHash60("'mh' || i || '_' || t")}) AS m
        |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, ${mhK - 1})) AS i)
        |          GROUP BY doc_id, i),
        |$lshRchCte,
        |band AS (SELECT doc_id, i // (SELECT r FROM rch) AS band_id,
        |           string_agg(m, '_' ORDER BY i) AS bk
        |         FROM msig GROUP BY doc_id, i // (SELECT r FROM rch)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM band a JOIN band b ON a.band_id = b.band_id AND a.bk = b.bk
        |           AND a.doc_id < b.doc_id)
        |SELECT j.doc_a, j.doc_b, j.jaccard
        |FROM jac j JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        |WHERE j.jaccard >= $mhTau ORDER BY j.doc_a, j.doc_b""".stripMargin),
    // replays minhashNearDupMd5Auto WITH the probe arms: the same
    // chooser and signatures, the stride-permuted multi-probe band
    // keys (lshCandMpCte embeds the arms' modular inverses), the
    // banded bucket join, and the exact rounded
    // Jaccard ≥ τ restricted to the expanded candidate set
    "q_dedup_minhash_probe" -> (shingleCte +
      s""", msig AS (SELECT doc_id, i,
        |            min(${duckHash60("'mh' || i || '_' || t")}) AS m
        |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, ${mhK - 1})) AS i)
        |          GROUP BY doc_id, i),
        |$lshRchCte,
        |$lshCandMpCte
        |SELECT j.doc_a, j.doc_b, j.jaccard
        |FROM jac j JOIN candp c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        |WHERE j.jaccard >= $mhTau ORDER BY j.doc_a, j.doc_b""".stripMargin),
    // SimHash bit-vote signatures over the md5-derived 60-bit token hash
    // (substr(md5,1,15) parsed base-16 — exactly Dedup.md5Hash60)
    "q_simhash" -> (simhashSigCte +
      "SELECT doc_id, simhash FROM sig ORDER BY doc_id"),
    "q_simhash_neardup" -> (simhashSigCte +
      """, chunks AS (SELECT doc_id, simhash, c, (simhash >> (c * 15)) & 32767 AS chunk
        |            FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c)),
        |keep AS (SELECT c, chunk FROM chunks GROUP BY c, chunk HAVING count(*) <= 100),
        |ck AS (SELECT ch.* FROM chunks ch JOIN keep k ON ch.c = k.c AND ch.chunk = k.chunk),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |            a.simhash AS sa, b.simhash AS sb
        |          FROM ck a JOIN ck b
        |          ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        |FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin),
    // replays Dedup.winnowNearDup: positional 3-grams, 32-bit md5-prefix
    // hash, window-4 rightmost-min selection (min over (h, -i) — struct
    // ordering is lexicographic in both engines), df cap 100, shared-
    // count + containment-permille scoring
    "q_winnow_neardup" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |g AS (SELECT doc_id, i, w[i]||' '||w[i+1]||' '||w[i+2] AS gram
        |      FROM toks, unnest(generate_series(1, len(w)-2)) u(i)
        |      WHERE len(w) >= 3),
        |h AS (SELECT doc_id, i, list_reduce(
        |        list_transform(string_split_regex(substr(md5(gram),1,8),''),
        |          ch -> CAST(strpos('0123456789abcdef',ch)-1 AS BIGINT)),
        |        (a,d) -> a*16+d) AS h
        |      FROM g),
        |sel AS (SELECT doc_id,
        |          min(struct_pack(h := h, ni := -i)) OVER
        |            (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
        |          count(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
        |        FROM h),
        |fpd AS (SELECT DISTINCT doc_id, mn.h AS h FROM sel WHERE cnt = 4),
        |keep AS (SELECT h FROM fpd GROUP BY h HAVING count(*) <= 100),
        |fpk AS (SELECT doc_id, h FROM fpd JOIN keep USING (h)),
        |sz AS (SELECT doc_id, count(*) AS n FROM fpd GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |          FROM fpk a JOIN fpk b ON a.h = b.h AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
        |  CAST((1000*n_shared) // least(sa.n, sb.n) AS BIGINT) AS overlap_permille
        |FROM pairs JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
        |WHERE n_shared >= 2 AND (1000*n_shared) // least(sa.n, sb.n) >= 300
        |ORDER BY doc_a, doc_b""".stripMargin,
    // replays Dedup.substringDedupStats: 8-word positional grams with
    // corpus df > 1 mark spans; gaps-and-islands merge via running max
    // of span ends; integer permille against the doc's word count
    "q_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |g AS (SELECT doc_id, i,
        |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
        |        w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS gram
        |      FROM toks, unnest(generate_series(1, len(w)-7)) u(i)
        |      WHERE len(w) >= 8),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        |spans AS (SELECT doc_id, i AS s, i+7 AS e FROM g JOIN dup USING (gram)),
        |isl AS (SELECT doc_id, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM spans),
        |isl2 AS (SELECT doc_id, s, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |merged AS (SELECT doc_id, island, min(s) AS s, max(e) AS e
        |           FROM isl2 GROUP BY 1, 2),
        |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |    CAST(sum(e-s+1) AS BIGINT) AS n_dup_words FROM merged GROUP BY 1)
        |SELECT p.doc_id, n_dup_spans, n_dup_words,
        |  CAST((1000*n_dup_words) // len(t.w) AS BIGINT) AS dup_permille
        |FROM per_doc p JOIN toks t ON p.doc_id = t.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    // replays Dedup.substringRemoval: rank every occurrence of each
    // duplicated 8-gram in (md5(id), id, position) order, cut rn>1
    // spans via the same gaps-and-islands merge, keep the surviving
    // words in position order; fully-cut docs drop out
    "q_substring_removal" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |g AS (SELECT doc_id, i,
        |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
        |        w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS gram
        |      FROM toks, unnest(generate_series(1, len(w)-7)) u(i)
        |      WHERE len(w) >= 8),
        |occ AS (SELECT doc_id, i,
        |        row_number() OVER (PARTITION BY gram
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id, i) AS rn,
        |        count(*) OVER (PARTITION BY gram) AS df
        |        FROM g),
        |spans AS (SELECT doc_id, i AS s, i+7 AS e FROM occ WHERE df > 1 AND rn > 1),
        |isl AS (SELECT doc_id, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM spans),
        |isl2 AS (SELECT doc_id, s, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |merged AS (SELECT doc_id, island, min(s) AS s, max(e) AS e
        |           FROM isl2 GROUP BY 1, 2),
        |words AS (SELECT doc_id, j, w[j] AS word
        |          FROM toks, unnest(generate_series(1, len(w))) u(j)),
        |kept AS (SELECT wd.doc_id, wd.j, wd.word FROM words wd
        |         WHERE NOT EXISTS (SELECT 1 FROM merged m
        |           WHERE m.doc_id = wd.doc_id AND wd.j BETWEEN m.s AND m.e))
        |SELECT doc_id, string_agg(word, ' ' ORDER BY j) AS text
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // replays Dedup.decontaminationRemoval: train 8-grams present in
    // the eval gram set mark spans; same island merge and word cut as
    // q_substring_removal
    "q_decontam_removal" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE doc_id % 10 <> 0),
        |g AS (SELECT doc_id, i,
        |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
        |        w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS gram
        |      FROM toks, unnest(generate_series(1, len(w)-7)) u(i)
        |      WHERE len(w) >= 8),
        |etoks AS (SELECT string_split(text,' ') AS w FROM documents WHERE doc_id % 10 = 0),
        |eg AS (SELECT DISTINCT
        |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
        |        w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS gram
        |      FROM etoks, unnest(generate_series(1, len(w)-7)) u(i)
        |      WHERE len(w) >= 8),
        |spans AS (SELECT doc_id, i AS s, i+7 AS e FROM g
        |          WHERE gram IN (SELECT gram FROM eg)),
        |isl AS (SELECT doc_id, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM spans),
        |isl2 AS (SELECT doc_id, s, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |merged AS (SELECT doc_id, island, min(s) AS s, max(e) AS e
        |           FROM isl2 GROUP BY 1, 2),
        |words AS (SELECT doc_id, j, w[j] AS word
        |          FROM toks, unnest(generate_series(1, len(w))) u(j)),
        |kept AS (SELECT wd.doc_id, wd.j, wd.word FROM words wd
        |         WHERE NOT EXISTS (SELECT 1 FROM merged m
        |           WHERE m.doc_id = wd.doc_id AND wd.j BETWEEN m.s AND m.e))
        |SELECT doc_id, string_agg(word, ' ' ORDER BY j) AS text
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // replays Dedup.stratifiedSplit: md5(id)-ordered row_number per
    // stratum, exact largest-remainder apportionment of 800/100/100
    // permille (ties by class order), assignment by cumulative bounds
    "q_split_stratified" ->
      """WITH ordered AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM documents),
        |strata AS (SELECT DISTINCT lang, n FROM ordered),
        |cls AS (SELECT * FROM (VALUES ('train',800,1),('val',100,2),('test',100,3)) c(cls, w, cls_idx)),
        |quota AS (SELECT lang, cls, cls_idx, (n*w)//1000 AS base, (n*w)%1000 AS rem,
        |    n - sum((n*w)//1000) OVER (PARTITION BY lang) AS leftover
        |  FROM strata CROSS JOIN cls),
        |alloc AS (SELECT lang, cls, cls_idx,
        |    base + CASE WHEN row_number() OVER (PARTITION BY lang ORDER BY rem DESC, cls_idx) <= leftover
        |      THEN 1 ELSE 0 END AS n_cls FROM quota),
        |bounds AS (SELECT lang, cls,
        |    sum(n_cls) OVER (PARTITION BY lang ORDER BY cls_idx) AS hi,
        |    sum(n_cls) OVER (PARTITION BY lang ORDER BY cls_idx) - n_cls AS lo FROM alloc)
        |SELECT o.doc_id, o.lang, b.cls AS split FROM ordered o
        |JOIN bounds b ON o.lang = b.lang AND o.rn > b.lo AND o.rn <= b.hi
        |ORDER BY o.doc_id""".stripMargin,
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    round(list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 9) AS sim
        |  FROM (SELECT * FROM e WHERE vec_id < 10) q JOIN e c ON q.label <> c.label),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM scored)
        |SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    "q_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    round(list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 9) AS sim
        |  FROM (SELECT * FROM e WHERE vec_id < 10) q JOIN e c ON q.vec_id <> c.vec_id),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM scored)
        |SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    // replays Similarity.ivfTopK end-to-end: decimal-exact per-label
    // centroids, every corpus vector assigned to its nearest centroid
    // (9-dp cosine, cluster_id tie-break), per-query probe of the 2
    // nearest clusters, full-precision rescore within probed clusters
    "q_ann_ivf" -> annIvfOracleSql,
    // the persisted-index run is BIT-EXACT (codebook cells roundtrip
    // as IEEE-754 long bits), so its gate replays q_ann_ivf verbatim
    "q_ann_ivf_persist" -> annIvfOracleSql,
    // replays q_ann_recall THROUGH the replayed chooser: the shared
    // curve CTEs (annNprobeCurveCte — exact top-3, label codebook,
    // assignment, per-pair probe ranks, the per-depth top-3, the
    // hit-count curve), then npch picks the smallest depth meeting the
    // target exactly as Similarity.nprobeFor does, and the final
    // per-query recall reads the curve's own per-depth top-3 at that
    // depth — chooser and result can never desynchronize
    "q_ann_recall" -> (annNprobeCurveCte +
      s""",
        |npch AS (SELECT coalesce(
        |    (SELECT min(nprobe) FROM curve
        |     WHERE n_hit * 1000000 >= $annTargetPpm * n_total),
        |    (SELECT max(nprobe) FROM curve)) AS np)
        |SELECT ex.query_id,
        |  CAST(sum(CASE WHEN iv.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN iv.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // 3 AS recall_ppm
        |FROM exact_rk ex LEFT JOIN (
        |    SELECT query_id, vec_id FROM ivfk WHERE np = (SELECT np FROM npch)) iv
        |  ON ex.query_id = iv.query_id AND ex.vec_id = iv.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // replays nprobeRecallCurve: the shared curve CTEs, emitted as the
    // recorded (nprobe, n_hit, n_total, recall_ppm) artifact
    "q_ann_nprobe_curve" -> (annNprobeCurveCte +
      """
        |SELECT nprobe, n_hit, n_total, n_hit * 1000000 // n_total AS recall_ppm
        |FROM curve ORDER BY nprobe""".stripMargin),
    // replays Similarity.kmeansCodebook + the IVF probe end-to-end:
    // seeds = 5 smallest (md5(id), id) vectors; two unrolled
    // assignment/update rounds (9-dp cosine, cluster_id tie-break,
    // DECIMAL(27,15) means, emptied cluster keeps its centroid via
    // coalesce); then the identical probe/rescore as q_ann_ivf
    "q_ann_kmeans" -> (kmeansAsgCte +
      """,
        |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
        |      FROM e WHERE vec_id < 10),
        |pr0 AS (SELECT q.query_id, q.qv, q.qn, c.cluster_id,
        |          round(list_dot_product(q.qv, c.cvec)
        |            / (q.qn * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
        |        FROM q CROSS JOIN cent c),
        |pr AS (SELECT query_id, qv, qn, cluster_id FROM (
        |         SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY csim DESC, cluster_id) AS r FROM pr0) WHERE r <= 2),
        |sc AS (SELECT p.query_id, a.vec_id,
        |         round(list_dot_product(p.qv, a.v)
        |           / (p.qn * sqrt(list_dot_product(a.v, a.v))), 9) AS sim
        |       FROM pr p JOIN asg a ON p.cluster_id = a.cluster_id AND p.query_id <> a.vec_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |             ORDER BY sim DESC, vec_id) AS rank FROM sc)
        |SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin),
    // replays hashedDocVectors + the exact cosine: salted md5 dims and
    // sign hashes, signed-count components, 0..63 spine assembly,
    // zero-norm filter, the standard ranked-cosine tail
    "q_hashed_vectors_topk" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |tk AS (SELECT doc_id, t FROM tok WHERE t <> ''),
         |cm AS (SELECT doc_id,
         |         ${duckHash60("'fh_' || t")} % 64 AS pos,
         |         CASE WHEN ${duckHash60("'fs_' || t")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |       FROM tk),
         |comp AS (SELECT doc_id, pos, CAST(sum(sgn) AS BIGINT) AS w FROM cm GROUP BY 1, 2),
         |spine AS (SELECT d.doc_id, s.pos FROM (SELECT DISTINCT doc_id FROM comp) d
         |          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pos) s),
         |vecs AS (SELECT sp.doc_id,
         |           list(CAST(coalesce(c.w, 0) AS DOUBLE) ORDER BY sp.pos) AS v
         |         FROM spine sp LEFT JOIN comp c ON sp.doc_id = c.doc_id AND sp.pos = c.pos
         |         GROUP BY sp.doc_id),
         |nz AS (SELECT * FROM vecs WHERE list_dot_product(v, v) > 0),
         |scored AS (SELECT q.doc_id AS query_id, c.doc_id AS vec_id,
         |             round(list_dot_product(q.v, c.v) /
         |               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 9) AS sim
         |           FROM (SELECT * FROM nz WHERE doc_id < 5) q JOIN nz c ON q.doc_id <> c.doc_id)
         |SELECT query_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored) WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // replays mutualTopK over the exact slice ranking: two row_number
    // windows + the reversed-pair equi-join
    "q_mutual_knn" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings WHERE vec_id < 200),
        |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |             round(list_dot_product(q.v, c.v) /
        |               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 9) AS sim
        |           FROM e q JOIN e c ON q.vec_id <> c.vec_id),
        |rk AS (SELECT query_id, vec_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
        |       FROM scored),
        |top AS (SELECT * FROM rk WHERE rank <= 3)
        |SELECT a.query_id AS vec_a, a.vec_id AS vec_b,
        |  a.rank AS rank_ab, b.rank AS rank_ba, a.sim
        |FROM top a JOIN top b ON a.query_id = b.vec_id AND a.vec_id = b.query_id
        |WHERE a.query_id < a.vec_id
        |ORDER BY vec_a, vec_b""".stripMargin,
    // replays the Artetxe-Schwenk margin in exact integer arithmetic:
    // 1e-9-unit floor-quantized cosines, both-direction k=4 sums,
    // margin_q via truncating // — the pair stage replayed plain
    "q_bitext_margin" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |             vec_id % 2 = 0 AS a FROM embeddings WHERE vec_id < 5000),
        |pair AS (SELECT x.vec_id AS qa, y.vec_id AS qb,
        |           CAST(floor(list_dot_product(x.v, y.v)
        |             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |             * 1000000000 + 0.5) AS BIGINT) AS c
        |         FROM e x JOIN e y ON x.a AND NOT y.a),
        |r AS (SELECT qa, qb, c,
        |        row_number() OVER (PARTITION BY qa ORDER BY c DESC, qb) AS ra,
        |        row_number() OVER (PARTITION BY qb ORDER BY c DESC, qa) AS rb
        |      FROM pair),
        |sa AS (SELECT qa, sum(c) AS s FROM r WHERE ra <= 4 GROUP BY qa),
        |sb AS (SELECT qb, sum(c) AS s FROM r WHERE rb <= 4 GROUP BY qb)
        |SELECT r.qa, r.qb, CAST((r.c * 8 * 1000000) // (sa.s + sb.s) AS BIGINT) AS margin_q
        |FROM r JOIN sa ON r.qa = sa.qa JOIN sb ON r.qb = sb.qb
        |WHERE r.ra <= 4 AND r.c > 0 AND sa.s + sb.s > 0
        |ORDER BY margin_q DESC, r.qa, r.qb LIMIT 50""".stripMargin,
    // the ANN-fed margin replay: the q_srp_neardup plane/bit/band CTEs,
    // cross-side (even × odd) DISTINCT band-collision candidates, the
    // same 1e-9-unit floor-quantized cosine on survivors, the same
    // both-direction k=4 margin arithmetic — candidate derivation and
    // margin are BOTH hash-gated. The rb CTE replays srpBandsFor:
    // smallest divisor-of-64 band width with pow(2,r) ≥ n/16 (same IEEE
    // predicate both engines), widest width as the too-big fallback
    "q_bitext_margin_ann" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |${srpRbCte("e")},
        |planes AS (
        |  SELECT j, list(CASE WHEN substring(md5('srp_' || j || '_' || d), 1, 1) >= '8'
        |                 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END ORDER BY d) AS p
        |  FROM generate_series(0, ${srpK - 1}) t1(j) CROSS JOIN generate_series(0, 63) t2(d)
        |  GROUP BY j),
        |bits AS (
        |  SELECT e.vec_id, pl.j, CASE WHEN list_dot_product(e.v, pl.p) >= 0 THEN 1 ELSE 0 END AS b
        |  FROM e CROSS JOIN planes pl),
        |bands AS (
        |  SELECT vec_id, j // (SELECT r FROM rb) AS band_id,
        |         sum(b * (CAST(1 AS BIGINT) << (j % (SELECT r FROM rb)))) AS band_val
        |  FROM bits GROUP BY vec_id, j // (SELECT r FROM rb)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS qa, b.vec_id AS qb
        |  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
        |    AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
        |pair AS (SELECT cd.qa, cd.qb,
        |           CAST(floor(list_dot_product(x.v, y.v)
        |             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |             * 1000000000 + 0.5) AS BIGINT) AS c
        |         FROM cand cd JOIN e x ON cd.qa = x.vec_id JOIN e y ON cd.qb = y.vec_id),
        |r AS (SELECT qa, qb, c,
        |        row_number() OVER (PARTITION BY qa ORDER BY c DESC, qb) AS ra,
        |        row_number() OVER (PARTITION BY qb ORDER BY c DESC, qa) AS rb
        |      FROM pair),
        |sa AS (SELECT qa, sum(c) AS s FROM r WHERE ra <= 4 GROUP BY qa),
        |sb AS (SELECT qb, sum(c) AS s FROM r WHERE rb <= 4 GROUP BY qb)
        |SELECT r.qa, r.qb, CAST((r.c * 8 * 1000000) // (sa.s + sb.s) AS BIGINT) AS margin_q
        |FROM r JOIN sa ON r.qa = sa.qa JOIN sb ON r.qb = sb.qb
        |WHERE r.ra <= 4 AND r.c > 0 AND sa.s + sb.s > 0
        |ORDER BY margin_q DESC, r.qa, r.qb LIMIT 50""".stripMargin,
    // the SRP rollout gate's replay: brute margin top-50 on the capped
    // slice (the q_bitext_margin CTEs) intersected with the auto-banded
    // SRP candidate set (the q_bitext_margin_ann CTEs, chooser included,
    // over the SAME capped slice) — counts and integer-bp recall for
    // BOTH the single-probe set and the multi-probe expansion (each
    // side-A band value also visits its r Hamming-1 bucket flips:
    // f = 0 keeps the value, f = 1..r XORs bit f-1 — the identical
    // probe construction as Similarity.crossCandidates)
    "q_bitext_srp_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings WHERE vec_id < 5000),
        |${srpRbCte("e")},
        |bpair AS (SELECT x.vec_id AS qa, y.vec_id AS qb,
        |           CAST(floor(list_dot_product(x.v, y.v)
        |             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |             * 1000000000 + 0.5) AS BIGINT) AS c
        |         FROM e x JOIN e y ON x.vec_id % 2 = 0 AND y.vec_id % 2 = 1),
        |br AS (SELECT qa, qb, c,
        |        row_number() OVER (PARTITION BY qa ORDER BY c DESC, qb) AS ra,
        |        row_number() OVER (PARTITION BY qb ORDER BY c DESC, qa) AS rb2
        |      FROM bpair),
        |bsa AS (SELECT qa, sum(c) AS s FROM br WHERE ra <= 4 GROUP BY qa),
        |bsb AS (SELECT qb, sum(c) AS s FROM br WHERE rb2 <= 4 GROUP BY qb),
        |brute AS (SELECT br.qa, br.qb
        |  FROM br JOIN bsa ON br.qa = bsa.qa JOIN bsb ON br.qb = bsb.qb
        |  WHERE br.ra <= 4 AND br.c > 0 AND bsa.s + bsb.s > 0
        |  ORDER BY CAST((br.c * 8 * 1000000) // (bsa.s + bsb.s) AS BIGINT) DESC, br.qa, br.qb
        |  LIMIT 50),
        |planes AS (
        |  SELECT j, list(CASE WHEN substring(md5('srp_' || j || '_' || d), 1, 1) >= '8'
        |                 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END ORDER BY d) AS p
        |  FROM generate_series(0, ${srpK - 1}) t1(j) CROSS JOIN generate_series(0, 63) t2(d)
        |  GROUP BY j),
        |bits AS (
        |  SELECT e.vec_id, pl.j, CASE WHEN list_dot_product(e.v, pl.p) >= 0 THEN 1 ELSE 0 END AS b
        |  FROM e CROSS JOIN planes pl),
        |bands AS (
        |  SELECT vec_id, j // (SELECT r FROM rb) AS band_id,
        |         sum(b * (CAST(1 AS BIGINT) << (j % (SELECT r FROM rb)))) AS band_val
        |  FROM bits GROUP BY vec_id, j // (SELECT r FROM rb)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS qa, b.vec_id AS qb
        |  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
        |    AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
        |probe AS (
        |  SELECT band_id,
        |         CASE WHEN f = 0 THEN band_val
        |              ELSE xor(band_val, CAST(1 AS BIGINT) << (f - 1)) END AS band_val,
        |         vec_id
        |  FROM bands CROSS JOIN (SELECT unnest(generate_series(0, ${srpWidths.last})) AS f) t
        |  WHERE vec_id % 2 = 0 AND f <= (SELECT r FROM rb)),
        |candm AS (
        |  SELECT DISTINCT p.vec_id AS qa, b.vec_id AS qb
        |  FROM probe p JOIN bands b ON p.band_id = b.band_id AND p.band_val = b.band_val
        |    AND b.vec_id % 2 = 1)
        |SELECT (SELECT count(*) FROM brute) AS n_brute,
        |  (SELECT count(*) FROM cand) AS n_cand,
        |  (SELECT count(*) FROM brute b JOIN cand c ON b.qa = c.qa AND b.qb = c.qb) AS n_hit,
        |  CASE WHEN (SELECT count(*) FROM brute) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(((SELECT count(*) FROM brute b JOIN cand c ON b.qa = c.qa AND b.qb = c.qb) * 10000)
        |      // (SELECT count(*) FROM brute) AS BIGINT) END AS recall_bp,
        |  (SELECT count(*) FROM candm) AS n_cand_mp,
        |  (SELECT count(*) FROM brute b JOIN candm c ON b.qa = c.qa AND b.qb = c.qb) AS n_hit_mp,
        |  CASE WHEN (SELECT count(*) FROM brute) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(((SELECT count(*) FROM brute b JOIN candm c ON b.qa = c.qa AND b.qb = c.qb) * 10000)
        |      // (SELECT count(*) FROM brute) AS BIGINT) END AS recall_mp_bp""".stripMargin,
    // replays Similarity.vectorHealth: x−x ≠ 0 non-finite classification,
    // norms excluded for non-finite vectors, floor(x·1e6+0.5) micros
    "q_vector_health" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id,
        |        CASE WHEN v IS NULL THEN -1 ELSE len(v) END AS dim,
        |        CASE WHEN v IS NULL THEN 0
        |             WHEN len(list_filter(v, x -> x IS NULL OR NOT (x - x = 0.0))) > 0 THEN 1
        |             ELSE 0 END AS nf
        |      FROM e),
        |n AS (SELECT m.vec_id, m.dim, m.nf,
        |        CASE WHEN m.dim = -1 OR m.nf = 1 THEN NULL
        |             ELSE sqrt(list_dot_product(e.v, e.v)) END AS nrm
        |      FROM m JOIN e USING (vec_id))
        |SELECT dim, count(*) AS n_vecs,
        |  CAST(sum(nf) AS BIGINT) AS n_nonfinite,
        |  CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
        |  CAST(floor(min(nrm) * 1000000 + 0.5) AS BIGINT) AS min_norm_micro,
        |  CAST(floor(max(nrm) * 1000000 + 0.5) AS BIGINT) AS max_norm_micro,
        |  CAST(sum(CAST(floor(nrm * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_norm_micro
        |FROM n GROUP BY dim ORDER BY dim""".stripMargin,
    // replays Similarity.silhouette: the kmeans codebook CTEs end with
    // asg0 (every vector × centroid 9-dp csim) and asg (the argmax);
    // own/other split, the IEEE ratio, floor(x*1e9 + 0.5) nanos,
    // per-cluster BIGINT sum
    "q_silhouette" -> (kmeansAsgCte +
      """,
        |own AS (SELECT a0.vec_id, a.cluster_id, a0.csim AS own_sim
        |        FROM asg0 a0 JOIN asg a ON a0.vec_id = a.vec_id AND a0.cluster_id = a.cluster_id),
        |oth AS (SELECT a0.vec_id, max(a0.csim) AS best_other
        |        FROM asg0 a0 JOIN asg a ON a0.vec_id = a.vec_id AND a0.cluster_id <> a.cluster_id
        |        GROUP BY a0.vec_id),
        |pv AS (SELECT o.cluster_id,
        |         CASE WHEN greatest(1 - o.own_sim, 1 - t.best_other) = 0 THEN 0
        |              ELSE CAST(floor((o.own_sim - t.best_other)
        |                     / greatest(1 - o.own_sim, 1 - t.best_other) * 1e9 + 0.5) AS BIGINT)
        |         END AS sil_nano
        |       FROM own o JOIN oth t ON o.vec_id = t.vec_id)
        |SELECT cluster_id, count(*) AS n, CAST(sum(sil_nano) AS BIGINT) AS sum_sil_nano
        |FROM pv GROUP BY cluster_id ORDER BY cluster_id""".stripMargin),
    // replays Similarity.pqTopK end-to-end: 4 generated subspace
    // codebook constructions (seeds, 2 rounds, final codes), ADC LUTs,
    // fixed-order d0+d1+d2+d3 scoring — see pqSubCte/pqOracle
    "q_ann_pq" -> pqOracle,
    "q_ann_ivf_pq" -> ivfPqOracle,
    // replays meanPool: per-(label, dimension) DECIMAL(27,15) sum
    // divided once as double. The decimal is built from the VALUE'S
    // SHORTEST STRING (CAST through VARCHAR), because that is what
    // Spark's double→decimal cast rounds (BigDecimal.valueOf = the
    // Double.toString repr) — a direct binary-value CAST diverges by
    // ulps on ~1/3 of cells
    "q_mean_pool" ->
      """WITH e AS (SELECT label AS g,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |px AS (SELECT g, unnest(generate_series(1, len(v))) - 1 AS pos,
        |         unnest(v) AS x FROM e)
        |SELECT g, CAST(pos AS INT) AS pos, count(*) AS n,
        |  CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(27,15))) AS DOUBLE)
        |    / count(*) AS centroid
        |FROM px GROUP BY g, pos ORDER BY g, pos""".stripMargin,
    // the full integer PCA replay: Gram → scatter → 6 power-iteration
    // rounds → map-side projection n·(q·v) − Σsᵢvᵢ
    "q_pca_project" -> (pcaCte + pcaDeflateCte +
      """,
        |sv AS (SELECT sum(s.si * v.v) AS sv FROM s JOIN v6 v ON s.i = v.i),
        |pr AS (SELECT q.doc_id, sum(q.qx * v.v) AS praw FROM q JOIN v6 v ON q.i = v.i GROUP BY 1),
        |sv2 AS (SELECT sum(s.si * v.v) AS sv FROM s JOIN u80 v ON s.i = v.i),
        |pr2 AS (SELECT q.doc_id, sum(q.qx * v.v) AS praw FROM q JOIN u80 v ON q.i = v.i GROUP BY 1)
        |SELECT pr.doc_id AS id,
        |  CAST((SELECT n FROM nn) * pr.praw - (SELECT sv FROM sv) AS BIGINT) AS pc1,
        |  CAST((SELECT n FROM nn) * pr2.praw - (SELECT sv FROM sv2) AS BIGINT) AS pc2
        |FROM pr JOIN pr2 ON pr.doc_id = pr2.doc_id ORDER BY id""".stripMargin),
    // the solved loadings k=2 (deflation) + explained-variance ppm vs
    // the ORIGINAL scatter (v'Cv·1e6 over tr(C)·v'v, HUGEINT-truncated
    // like every division in the chain)
    "q_pca_components" -> (pcaCte + pcaDeflateCte +
      """
        |SELECT 0 AS comp, CAST(v.i AS INT) AS i, CAST(v.v AS BIGINT) AS v,
        |  CAST(CAST((SELECT sum(va.v * c.cij * vb.v)
        |             FROM c JOIN v6 va ON c.i = va.i JOIN v6 vb ON c.j = vb.i) * 1000000 AS HUGEINT)
        |    // CAST((SELECT sum(cij) FROM c WHERE i = j) * (SELECT sum(v*v) FROM v6) AS HUGEINT) AS BIGINT) AS evr_ppm
        |FROM v6 v
        |UNION ALL
        |SELECT 1 AS comp, CAST(u.i AS INT) AS i, CAST(u.v AS BIGINT) AS v,
        |  CAST(CAST((SELECT sum(va.v * c.cij * vb.v)
        |             FROM c JOIN u80 va ON c.i = va.i JOIN u80 vb ON c.j = vb.i) * 1000000 AS HUGEINT)
        |    // CAST((SELECT sum(cij) FROM c WHERE i = j) * (SELECT sum(v*v) FROM u80) AS HUGEINT) AS BIGINT) AS evr_ppm
        |FROM u80 u ORDER BY comp, i""".stripMargin),
    // the same k-means assignment, then the per-cluster md5-order quota
    "q_topic_balance" -> (kmeansAsgCte +
      """,
        |hk AS (SELECT cluster_id, vec_id,
        |         md5('tb_' || CAST(vec_id AS VARCHAR)) AS h FROM asg),
        |rk AS (SELECT cluster_id, vec_id,
        |         row_number() OVER (PARTITION BY cluster_id
        |           ORDER BY h, vec_id) AS rn FROM hk)
        |SELECT cluster_id, vec_id, rn FROM rk WHERE rn <= 20
        |ORDER BY cluster_id, rn""".stripMargin),
    // the same k-means assignment, then the keep-first drop rule: a
    // vector is dropped iff SOME smaller-id vector in its cluster sits
    // at 9-dp cosine >= 0.4 (deliberately non-transitive — ε-chains
    // prune aggressively; see Similarity.semanticDedup)
    "q_semantic_dedup" -> (kmeansAsgCte +
      """,
        |near AS (SELECT DISTINCT b.vec_id AS id
        |  FROM asg a JOIN asg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        |    AND round(list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9) >= 0.4)
        |SELECT a.vec_id, a.cluster_id,
        |  CAST(CASE WHEN n.id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
        |FROM asg a LEFT JOIN near n ON a.vec_id = n.id
        |ORDER BY vec_id""".stripMargin),
    // replays Similarity.semanticDedupHier end-to-end: the k1=3 coarse
    // codebook (the kmeansAsgCte construction), then GROUP-PARALLEL
    // fine k-means — per-coarse k2=4 seeds by (60-bit md5, id), two
    // join+argmax+DECIMAL-mean rounds keyed (coarse, j), empty cells
    // keeping their centroid — and the same keep-first census on
    // cluster_id = coarse·4 + j
    "q_semantic_dedup_hier" -> (hierAsgCte +
      """,
        |near AS (SELECT DISTINCT b.vec_id AS id
        |  FROM hasg a JOIN hasg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        |    AND round(list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9) >= 0.4)
        |SELECT a.vec_id, a.cluster_id,
        |  CAST(CASE WHEN n.id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
        |FROM hasg a LEFT JOIN near n ON a.vec_id = n.id
        |ORDER BY vec_id""".stripMargin),
    // the auto route replayed end-to-end, (k1, k2) derived from
    // count(*) in-SQL — the default path's own hash gate
    "q_semantic_dedup_auto" -> (hierAsgCteAuto +
      """,
        |near AS (SELECT DISTINCT b.vec_id AS id
        |  FROM hasg a JOIN hasg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        |    AND round(list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9) >= 0.4)
        |SELECT a.vec_id, a.cluster_id,
        |  CAST(CASE WHEN n.id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
        |FROM hasg a LEFT JOIN near n ON a.vec_id = n.id
        |ORDER BY vec_id""".stripMargin),
    // replays Similarity.quantize + quantizedTopK: per-dim (min, span)
    // over double-cast floats, codes = round((x-lo)/span·255), coarse
    // rank on the dequantized cosine, exact rescore of the top
    // k·overfetch (12) candidates — every arithmetic step mirrors the
    // Spark expression order so the doubles match bit-for-bit
    "q_quantized_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |px AS (SELECT vec_id, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM e),
        |dims AS (SELECT pos, min(x) AS lo,
        |           CASE WHEN max(x) = min(x) THEN 1.0 ELSE max(x) - min(x) END AS span
        |         FROM px GROUP BY pos),
        |dq AS (SELECT vec_id, pos,
        |         (CAST(round((x - lo) / span * 255.0, 0) AS INT) / 255.0) * span + lo AS dx
        |       FROM px JOIN dims USING (pos)),
        |deq AS (SELECT vec_id, list(dx ORDER BY pos) AS dvec FROM dq GROUP BY vec_id),
        |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
        |      FROM e WHERE vec_id < 10),
        |coarse AS (SELECT q.query_id, d.vec_id,
        |             round(list_dot_product(q.qv, d.dvec)
        |               / (q.qn * sqrt(list_dot_product(d.dvec, d.dvec))), 9) AS csim
        |           FROM q JOIN deq d ON d.vec_id <> q.query_id),
        |cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY csim DESC, vec_id) AS crank FROM coarse),
        |resc AS (SELECT c.query_id, c.vec_id,
        |           round(list_dot_product(q.qv, e.v)
        |             / (q.qn * sqrt(list_dot_product(e.v, e.v))), 9) AS sim
        |         FROM cand c JOIN q ON c.query_id = q.query_id
        |         JOIN e ON c.vec_id = e.vec_id
        |         WHERE c.crank <= 12),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |             ORDER BY sim DESC, vec_id) AS rank FROM resc)
        |SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    "q_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        round(list_dot_product(a.v, b.v) /
        |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9) AS sim
        |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    // recursive blocking is an EXECUTION strategy, not a semantics
    // change: its contract is bit-identical output to the unblocked
    // exact operator, so the oracle is the same within-label all-pairs
    // query — the triangle-inequality pruning must be invisible here
    "q_cosine_neardup_blocked" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        round(list_dot_product(a.v, b.v) /
        |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9) AS sim
        |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    // replays dedupThresholdSweep: the within-label exact pair set at
    // the loosest tau (blocked == unblocked output by exactness), the
    // per-doc max smaller-id sim, counts per literal threshold
    "q_dedup_sweep" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        round(list_dot_product(a.v, b.v) /
        |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9) AS sim
        |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
        |mp AS (SELECT id_b, max(sim) AS ms FROM p WHERE sim >= 0.4 GROUP BY id_b),
        |t AS (SELECT unnest([0.4, 0.45, 0.5]) AS tau),
        |n AS (SELECT count(*) AS n_total FROM e),
        |d AS (SELECT tau, count(*) AS n_dropped FROM mp CROSS JOIN t
        |      WHERE ms >= tau GROUP BY tau)
        |SELECT t.tau, n.n_total, coalesce(d.n_dropped, 0) AS n_dropped,
        |  n.n_total - coalesce(d.n_dropped, 0) AS n_kept,
        |  CASE WHEN n.n_total > 0 THEN
        |    CAST((n.n_total - coalesce(d.n_dropped, 0)) * 1000000 // n.n_total AS BIGINT) END AS kept_ppm
        |FROM t LEFT JOIN d USING (tau) CROSS JOIN n ORDER BY tau""".stripMargin,
    // replays Similarity.srpNearDup end-to-end: the md5-derived ±1
    // hyperplanes, the k=64 sign bits (list_dot_product is bit-exact
    // against the codegen'd sequential-fold kernel), 8-bit band values,
    // the banded candidate self-join, and the full-precision verify
    "q_srp_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |planes AS (
        |  SELECT j, list(CASE WHEN substring(md5('srp_' || j || '_' || d), 1, 1) >= '8'
        |                 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END ORDER BY d) AS p
        |  FROM generate_series(0, 63) t1(j) CROSS JOIN generate_series(0, 63) t2(d)
        |  GROUP BY j),
        |bits AS (
        |  SELECT e.vec_id, pl.j, CASE WHEN list_dot_product(e.v, pl.p) >= 0 THEN 1 ELSE 0 END AS b
        |  FROM e CROSS JOIN planes pl),
        |bands AS (
        |  SELECT vec_id, j // 8 AS band_id, sum(b * (1 << (j % 8))) AS band_val
        |  FROM bits GROUP BY vec_id, j // 8),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.vec_id < b.vec_id),
        |vn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT * FROM (
        |  SELECT c.id_a, c.id_b,
        |    round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 9) AS sim
        |  FROM cand c JOIN vn va ON c.id_a = va.vec_id JOIN vn vb ON c.id_b = vb.vec_id)
        |WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    // sparse idf-weighted shingle cosine: same shingle construction as
    // the dedup CTEs, milli-unit integer idf weights, int64 dots/norms,
    // double only in the final sqrt/divide. The df cap derivation is
    // REPLAYED from the df histogram: largest df (>= 2, <= 1e5 probe
    // ceiling) whose cumulative C(df,2) candidate cost fits the
    // 32-pairs-per-doc budget — integer arithmetic end-to-end, so both
    // engines derive the identical cap.
    "q_sparse_cosine" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
        |tf AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
        |dfc0 AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |n AS (SELECT count(*) AS n FROM documents),
        |dist AS (SELECT df, count(*) * df * (df - 1) // 2 AS cost
        |         FROM dfc0 WHERE df BETWEEN 2 AND 100000 GROUP BY df),
        |cum AS (SELECT df, sum(cost) OVER (ORDER BY df) AS c FROM dist),
        |cap AS (SELECT greatest(coalesce(max(CASE WHEN c <= 32 * n.n THEN df END), 2), 2) AS cap
        |        FROM cum CROSS JOIN n),
        |dfc AS (SELECT t, df FROM dfc0 CROSS JOIN cap WHERE df <= cap),
        |wt AS (SELECT doc_id, t,
        |         c * CAST(floor(ln(CAST(n.n AS DOUBLE) / CAST(df AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w
        |       FROM tf JOIN dfc USING (t) CROSS JOIN n),
        |norms AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS ns FROM wt GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(sum(a.w * b.w) AS BIGINT) AS dot
        |      FROM wt a JOIN wt b ON a.t = b.t AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |    round(CAST(dot AS DOUBLE) / (sqrt(CAST(na.ns AS DOUBLE)) * sqrt(CAST(nb.ns AS DOUBLE))), 6) AS cos
        |  FROM p JOIN norms na ON p.doc_a = na.doc_id JOIN norms nb ON p.doc_b = nb.doc_id)
        |WHERE cos >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "q_text_stats" ->
      s"""SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS sum_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '$bpePat'))) AS BIGINT) AS sum_bpe_tokens
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // quality_score mirrors TextAnalysis.quality's INTEGER 6-dp rounding
    // (ppm = floor((2·10⁵·num + den)/(2·den))): rounding the double
    // approximation instead hits exact k.5×10⁻⁷ boundaries (den = 10·nTok
    // can terminate at 7 decimals) where the engines' round() disagree
    "q_quality" ->
      s"""WITH m AS (SELECT doc_id, length(text) AS n_chars,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct_tokens,
        |  len(regexp_extract_all(text, '$bpePat')) AS n_bpe_tokens,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |FROM documents),
        |s AS (SELECT *,
        |  4 * n_distinct_tokens + 3 * n_tokens * (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
        |    + 3 * least(3 * n_stop, n_tokens) AS num,
        |  10 * n_tokens AS den FROM m)
        |SELECT doc_id, n_chars, n_tokens, n_distinct_tokens, n_bpe_tokens,
        |  round(CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS type_token_ratio,
        |  round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
        |  round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS mean_token_len,
        |  floor(CAST(2000000 * num + den AS DOUBLE) / CAST(2 * den AS DOUBLE)) / 1000000.0 AS quality_score
        |FROM s ORDER BY doc_id""".stripMargin,
    // replays q_redact: identical PII planting (string concat per id
    // class), identical Java/RE2-portable patterns, 'g' for the global
    // replace Spark does by default, placeholders applied in the same
    // email -> phone -> ip order
    "q_redact" -> {
      val e = TextAnalysis.emailPattern
      val p = TextAnalysis.phonePattern
      val i = TextAnalysis.ipv4Pattern
      s"""WITH pl AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        |  || CASE WHEN doc_id % 4 = 0 THEN ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
        |  AS ptext FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(ptext, '$e')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(ptext, '$p')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(ptext, '$i')) AS BIGINT) AS n_ip,
        |  md5(regexp_replace(regexp_replace(regexp_replace(ptext,
        |    '$e', '<EMAIL>', 'g'), '$p', '<PHONE>', 'g'), '$i', '<IP>', 'g')) AS fp
        |FROM pl ORDER BY doc_id""".stripMargin
    },
    // replays unigramLogProb: corpus unigram counts, ln(c/N) rounded to
    // 6 dp per token, DECIMAL per-doc sum — summation order immaterial
    "q_unigram_logprob" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |cnt AS (SELECT w, count(*) AS c FROM tk GROUP BY w),
        |n AS (SELECT count(*) AS n FROM tk),
        |lp AS (SELECT doc_id, round(ln(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)), 6) AS lp
        |       FROM tk JOIN cnt USING (w) CROSS JOIN n)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(CAST(lp AS DECIMAL(20,6))) AS DOUBLE) / count(*), 6) AS avg_logprob
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bigram twin of q_unigram_logprob: conditional from bigram /
    // left-context counts; per-bigram ln rounds to 6 dp pre-sum
    "q_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        |       FROM toks WHERE len(w) >= 2),
        |bg AS (SELECT doc_id, w[i] AS p, w[i + 1] AS c FROM ix),
        |cb AS (SELECT p, c, count(*) AS nb FROM bg GROUP BY p, c),
        |cl AS (SELECT p, count(*) AS np FROM bg GROUP BY p),
        |lp AS (SELECT doc_id,
        |         round(ln(CAST(nb AS DOUBLE) / CAST(np AS DOUBLE)), 6) AS lp
        |       FROM bg JOIN cb USING (p, c) JOIN cl USING (p))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST(lp AS DECIMAL(20,6))) AS DOUBLE) / count(*), 6) AS avg_logprob
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Kneser-Ney twin: discounted MLE + continuation backoff, every
    // count exact, one double chain per bigram rounded 7 dp pre-sum
    // (6 dp has a fixture term exactly on a x.5e-6 boundary — see the
    // operator scaladoc)
    "q_kn_logprob" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        |       FROM toks WHERE len(w) >= 2),
        |bg AS (SELECT doc_id, w[i] AS p, w[i + 1] AS c FROM ix),
        |cb AS (SELECT p, c, count(*) AS nb FROM bg GROUP BY p, c),
        |cl AS (SELECT p, count(*) AS np FROM bg GROUP BY p),
        |fan AS (SELECT p, count(*) AS n1p FROM cb GROUP BY p),
        |cont AS (SELECT c, count(*) AS n1c FROM cb GROUP BY c),
        |tot AS (SELECT count(*) AS nbt FROM cb),
        |lp AS (SELECT doc_id,
        |         round(ln(greatest(CAST(nb AS DOUBLE) - 0.75, 0.0) / CAST(np AS DOUBLE)
        |           + 0.75 * CAST(n1p AS DOUBLE) / CAST(np AS DOUBLE)
        |             * (CAST(n1c AS DOUBLE) / CAST(nbt AS DOUBLE))), 7) AS lp
        |       FROM bg JOIN cb USING (p, c) JOIN cl USING (p) JOIN fan USING (p)
        |            JOIN cont USING (c) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CAST(lp AS DECIMAL(21,7))) AS DOUBLE) AS sum_logprob
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // replays nbClassify: train counts on id%5!=0, add-1 smoothed
    // per-token ln rounded 7 dp, DECIMAL sums, argmax tie-broken by
    // class name — the score column is the exact DECIMAL total (prior
    // included) cast to double
    "q_nb_classify" -> nbOracleSql("",
      """SELECT b.doc_id, te.lang AS actual, b.pred, CAST(b.score AS DOUBLE) AS score,
        |  CAST(te.lang = b.pred AS BIGINT) AS correct
        |FROM best b JOIN te USING (doc_id) WHERE rk = 1 ORDER BY doc_id""".stripMargin),
    // score-ranked calibration of the same model: margin (winner −
    // runner-up, exact DECIMAL) ntile-bucketed, accuracy ppm per bucket
    "q_nb_calibration" -> nbOracleSql("",
      """, pair AS (SELECT doc_id,
        |    max(CASE WHEN rk = 1 THEN score END) AS s1,
        |    max(CASE WHEN rk = 2 THEN score END) AS s2,
        |    max(CASE WHEN rk = 1 THEN pred END) AS pred
        |  FROM best WHERE rk <= 2 GROUP BY doc_id),
        |j AS (SELECT p.doc_id, p.s1 - coalesce(p.s2, p.s1) AS margin,
        |        CAST(te.lang = p.pred AS BIGINT) AS correct
        |      FROM pair p JOIN te USING (doc_id)),
        |bk AS (SELECT *, ntile(5) OVER (ORDER BY margin, doc_id) AS bucket FROM j)
        |SELECT bucket, count(*) AS n, CAST(sum(correct) AS BIGINT) AS n_correct,
        |  CAST(sum(correct) * 1000000 // count(*) AS BIGINT) AS acc_ppm,
        |  CAST(min(margin) AS DOUBLE) AS min_margin,
        |  CAST(max(margin) AS DOUBLE) AS max_margin
        |FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin),
    // PMI ratio replayed in exact integer arithmetic: HUGEINT product
    // (the twin of Spark's DECIMAL(38,0)) // the marginal product —
    // both engines truncate the all-positive division identically
    "q_pmi" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
        |ix AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |       FROM toks WHERE len(w) >= 2),
        |bg AS (SELECT w[i] AS p, w[i + 1] AS c FROM ix),
        |pair AS (SELECT p, c, count(*) AS n_pair FROM bg
        |         GROUP BY p, c HAVING count(*) >= 5),
        |lm AS (SELECT p, count(*) AS n_left FROM bg GROUP BY p),
        |rm AS (SELECT c, count(*) AS n_right FROM bg GROUP BY c),
        |t AS (SELECT count(*) AS n_total FROM bg)
        |SELECT p, c, n_pair,
        |  CAST((CAST(n_total AS HUGEINT) * n_pair * 1000000) //
        |       (CAST(n_left AS HUGEINT) * n_right) AS BIGINT) AS pmi_ratio_ppm
        |FROM pair JOIN lm USING (p) JOIN rm USING (c), t
        |ORDER BY pmi_ratio_ppm DESC, p, c LIMIT 20""".stripMargin,
    // replays the planted-typo derivation (md5-chosen char deletion on
    // 1/16 of length>=3 tokens) and the deletion-index match: '0x' hex
    // parse == Spark's conv(,16,10); substr concatenation deletes the
    // same character; best candidate by (dist, cnt DESC, v)
    "q_spell_correct" ->
      """WITH raw AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
        |tk AS (SELECT doc_id, unnest(generate_series(1, len(wl))) AS i, wl FROM raw),
        |tok AS (SELECT doc_id, i - 1 AS pos, wl[i] AS w FROM tk),
        |hs AS (SELECT doc_id, pos, w,
        |         md5(CAST(doc_id AS VARCHAR) || '_' || CAST(pos AS VARCHAR) || '_' || w) AS h
        |       FROM tok),
        |noisy AS (SELECT doc_id, pos,
        |    substr(w, 1, CAST(CAST(('0x' || substr(h, 1, 6)) AS BIGINT) % len(w) AS INT)) ||
        |    substr(w, CAST(CAST(('0x' || substr(h, 1, 6)) AS BIGINT) % len(w) AS INT) + 2) AS typo
        |  FROM hs WHERE len(w) >= 3 AND substr(h, 32, 1) = '0'),
        |vocab AS (SELECT w AS v, count(*) AS cnt FROM tok GROUP BY w),
        |vd AS (SELECT v, cnt, unnest(generate_series(1, len(v))) AS i FROM vocab),
        |dels AS (SELECT DISTINCT v, cnt, substr(v, 1, i - 1) || substr(v, i + 1) AS key FROM vd),
        |cand AS (
        |  SELECT n.doc_id, n.pos, n.typo, vv.v, vv.cnt, 0 AS dist
        |  FROM noisy n JOIN vocab vv ON n.typo = vv.v
        |  UNION ALL
        |  SELECT n.doc_id, n.pos, n.typo, d.v, d.cnt, 1 AS dist
        |  FROM noisy n JOIN dels d ON n.typo = d.key),
        |best AS (SELECT doc_id, pos, v AS corrected, dist, cnt AS cand_count FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id, pos
        |      ORDER BY dist, cnt DESC, v) AS r FROM cand) WHERE r = 1)
        |SELECT n.doc_id, n.pos, n.typo, b.corrected, b.dist, b.cand_count
        |FROM noisy n LEFT JOIN best b ON n.doc_id = b.doc_id AND n.pos = b.pos
        |ORDER BY n.doc_id, n.pos""".stripMargin,
    // char entropy: p*ln(p) terms round to 9 dp, DECIMAL sum, abs
    "q_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents),
        |cc AS (SELECT doc_id, ch, count(*) AS k FROM ch GROUP BY doc_id, ch),
        |n AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n, count(*) AS distinct_chars
        |      FROM cc GROUP BY doc_id),
        |t AS (SELECT cc.doc_id, n.n, n.distinct_chars,
        |        round((CAST(k AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |          ln(CAST(k AS DOUBLE) / CAST(n.n AS DOUBLE)), 9) AS t
        |      FROM cc JOIN n ON cc.doc_id = n.doc_id)
        |SELECT doc_id, max(n) AS n_chars_total, max(distinct_chars) AS distinct_chars,
        |  round(CAST(abs(sum(CAST(t AS DECIMAL(20,9)))) AS DOUBLE), 6) AS entropy_nats
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same shingle construction as the dedup CTEs; mean through DECIMAL
    "q_repetition" ->
      """WITH m AS (SELECT lang, source,
        |  round(1.0 - CAST(len(list_distinct(list_transform(
        |        generate_series(1, greatest(len(w)-2, 1)),
        |        i -> array_to_string(w[i:i+2], ' ')))) AS DOUBLE)
        |    / CAST(greatest(len(w)-2, 1) AS DOUBLE), 6) AS rr
        |  FROM (SELECT lang, source, string_split(text,' ') AS w FROM documents))
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(CAST(rr AS DECIMAL(16,6))) AS DOUBLE) / count(*) AS mean_repetition,
        |  max(rr) AS max_repetition
        |FROM m GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // integer ops exact; ln rounded 9dp per row then DECIMAL-summed
    "q_math_fns" ->
      """WITH m AS (SELECT l_returnflag AS rf,
        |    abs(l_partkey - l_suppkey) AS i_abs,
        |    CASE WHEN l_partkey > l_suppkey THEN 1
        |         WHEN l_partkey < l_suppkey THEN -1 ELSE 0 END AS i_sign,
        |    l_orderkey % 7 AS i_mod,
        |    l_orderkey // 7 AS i_div,
        |    greatest(l_partkey, l_suppkey) AS i_max,
        |    least(l_partkey, l_suppkey) AS i_min,
        |    CAST(1 AS BIGINT) << l_linenumber AS i_pow2,
        |    CAST(floor(sqrt(CAST(l_orderkey AS DOUBLE))) AS BIGINT) AS i_isqrt,
        |    round(ln(CAST(l_extendedprice AS DOUBLE)), 9) AS d_ln
        |  FROM lineitem)
        |SELECT rf, count(*) AS n,
        |  CAST(sum(i_abs) AS BIGINT) AS s_abs, CAST(sum(i_sign) AS BIGINT) AS s_sign,
        |  CAST(sum(i_mod) AS BIGINT) AS s_mod, CAST(sum(i_div) AS BIGINT) AS s_div,
        |  CAST(sum(i_max) AS BIGINT) AS s_max, CAST(sum(i_min) AS BIGINT) AS s_min,
        |  CAST(sum(i_pow2) AS BIGINT) AS s_pow2, CAST(sum(i_isqrt) AS BIGINT) AS s_isqrt,
        |  CAST(sum(CAST(d_ln AS DECIMAL(20,9))) AS DOUBLE) AS s_ln
        |FROM m GROUP BY rf ORDER BY rf""".stripMargin,
    // mirrors the milli-unit isqrt and the integer normalization
    "q_mix_temperature" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |  FROM documents GROUP BY source),
        |sq AS (SELECT *, CAST(floor(sqrt(CAST(sum_tokens AS DOUBLE) * 1000000)) AS BIGINT) AS s
        |       FROM per),
        |tot AS (SELECT CAST(sum(s) AS BIGINT) AS sq_total FROM sq)
        |SELECT source, n_docs, sum_tokens, s * 1000000 // sq_total AS weight_ppm
        |FROM sq CROSS JOIN tot ORDER BY source""".stripMargin,
    // the weight CTE verbatim from q_mix_temperature, then the integer
    // plan arithmetic and the md5-order prefix-sum partial-pass cut
    "q_mix_epochs" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |  FROM documents GROUP BY source),
        |sq AS (SELECT *, CAST(floor(sqrt(CAST(sum_tokens AS DOUBLE) * 1000000)) AS BIGINT) AS s
        |       FROM per),
        |tot AS (SELECT CAST(sum(s) AS BIGINT) AS sq_total FROM sq),
        |w AS (SELECT source, n_docs, sum_tokens, s * 1000000 // sq_total AS weight_ppm
        |      FROM sq CROSS JOIN tot),
        |b AS (SELECT CAST(sum(sum_tokens) // 2 AS BIGINT) AS budget FROM w),
        |p2 AS (SELECT w.*, budget * weight_ppm // 1000000 AS target_tokens,
        |         (budget * weight_ppm // 1000000) // sum_tokens AS full_epochs,
        |         (budget * weight_ppm // 1000000) % sum_tokens AS rem_tokens
        |       FROM w, b),
        |d AS (SELECT source, doc_id,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS tk FROM documents),
        |c AS (SELECT source, doc_id, tk,
        |        COALESCE(SUM(tk) OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |      FROM d),
        |sel AS (SELECT c.source, CAST(count(*) AS BIGINT) AS n_partial_docs,
        |          CAST(sum(tk) AS BIGINT) AS partial_tokens
        |        FROM c JOIN p2 ON c.source = p2.source
        |        WHERE prev < rem_tokens GROUP BY c.source)
        |SELECT p2.source, n_docs, sum_tokens, weight_ppm, target_tokens, full_epochs,
        |  COALESCE(n_partial_docs, 0) AS n_partial_docs,
        |  COALESCE(partial_tokens, 0) AS partial_tokens
        |FROM p2 LEFT JOIN sel ON p2.source = sel.source ORDER BY 1""".stripMargin,
    // exact-integer coverage: occ * 2 * 1000 // tokens, overlap-counting
    "q_top_ngram" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, len(w) AS total,
        |        unnest(list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])) AS g
        |      FROM t WHERE len(w) >= 2),
        |c AS (SELECT doc_id, total, g, count(*) AS occ FROM g GROUP BY ALL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY occ DESC, g) AS r FROM c)
        |SELECT doc_id, g AS top_gram, occ, occ * 2 * 1000 // total AS coverage_permille
        |FROM r WHERE r = 1 ORDER BY doc_id""".stripMargin,
    // blocklist replayed PLAIN (every position × every phrase, the
    // unoptimized quadratic) — the anchor-and-verify split must be
    // invisible; overlapping start positions count
    "q_blocklist" -> (blocklistMatchCte +
      """
        |SELECT doc_id, count(*) AS n_hits, count(DISTINCT p) AS n_phrases
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // the per-phrase half, silent phrases included at zero via the
    // VALUES-list left join — the SAME match chain, so the two gates
    // can never disagree on what counts as a hit (mirrors the Scala
    // side's shared verifiedBlocklistMatches)
    "q_blocklist_phrases" -> (blocklistMatchCte +
      """
        |SELECT ph.p, count(DISTINCT m.doc_id) AS n_docs, count(m.p) AS n_hits
        |FROM ph LEFT JOIN m ON ph.p = m.p GROUP BY ph.p ORDER BY ph.p""".stripMargin),
    // the table-fed route must be INVISIBLE to results: identical plain
    // replay as q_blocklist — only the plan (no broadcast hint) differs
    "q_blocklist_table" -> (blocklistMatchCte +
      """
        |SELECT doc_id, count(*) AS n_hits, count(DISTINCT p) AS n_phrases
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "q_lang_id" ->
      s"""WITH h AS (SELECT lang,
        |  $langHits
        |FROM documents),
        |p AS (SELECT lang,
        |  CASE WHEN de >= greatest(en, es, fr, zh) THEN 'de'
        |       WHEN en >= greatest(es, fr, zh) THEN 'en'
        |       WHEN es >= greatest(fr, zh) THEN 'es'
        |       WHEN fr >= zh THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang FROM h)
        |SELECT lang, predicted_lang, count(*) AS n FROM p
        |GROUP BY lang, predicted_lang ORDER BY lang, predicted_lang""".stripMargin,
    "q_adaptive_quality" ->
      """WITH m AS (SELECT lang,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct_tokens,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |FROM documents),
        |s AS (SELECT lang,
        |  4 * n_distinct_tokens + 3 * n_tokens * (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
        |    + 3 * least(3 * n_stop, n_tokens) AS num,
        |  10 * n_tokens AS den FROM m),
        |p AS (SELECT lang,
        |  CAST(floor(CAST(2000000 * num + den AS DOUBLE) / CAST(2 * den AS DOUBLE)) AS BIGINT) AS ppm
        |FROM s),
        |thr AS (SELECT lang, CAST(sum(ppm) // count(*) AS BIGINT) AS thr_ppm,
        |          count(*) AS n_total FROM p GROUP BY lang)
        |SELECT p.lang, max(t.thr_ppm) AS thr_ppm, max(t.n_total) AS n_total,
        |  CAST(sum(CASE WHEN p.ppm >= t.thr_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM p JOIN thr t ON p.lang = t.lang
        |GROUP BY p.lang ORDER BY p.lang""".stripMargin,
    // replays Profile.binaryAuc over the qualityPpm replay: per-score
    // class histogram, cumulative negatives-below window, the doubled
    // Mann-Whitney numerator, truncating HUGEINT ppm division
    "q_binary_auc" ->
      """WITH m AS (SELECT source, lang = 'en' AS pos,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct_tokens,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |FROM documents),
        |s AS (SELECT source, pos,
        |  4 * n_distinct_tokens + 3 * n_tokens * (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
        |    + 3 * least(3 * n_stop, n_tokens) AS num,
        |  10 * n_tokens AS den FROM m),
        |p AS (SELECT source, pos,
        |  CAST(floor(CAST(2000000 * num + den AS DOUBLE) / CAST(2 * den AS DOUBLE)) AS BIGINT) AS ppm
        |FROM s),
        |hist AS (SELECT source, ppm AS sc,
        |           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |           CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n
        |         FROM p GROUP BY 1, 2),
        |cum AS (SELECT *, COALESCE(CAST(sum(n) OVER (PARTITION BY source ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS nless
        |        FROM hist)
        |SELECT source, CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(n) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(p) > 0 AND sum(n) > 0
        |    THEN CAST(sum(CAST(p AS HUGEINT) * (2 * nless + n)) * 1000000 // (2 * sum(p) * sum(n)) AS BIGINT)
        |  END AS auc_ppm
        |FROM cum GROUP BY source ORDER BY source""".stripMargin,
    "q_oov_rate" ->
      """WITH d AS (SELECT lang, text,
        |  list_reduce(list_transform(
        |      string_split_regex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''),
        |      ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
        |    (a, d) -> a * 16 + d) % 100 < 90 AS is_train
        |  FROM documents),
        |tok AS (SELECT lang, is_train, unnest(string_split(text, ' ')) AS t FROM d),
        |tok2 AS (SELECT * FROM tok WHERE t <> ''),
        |vocab AS (SELECT t FROM tok2 WHERE is_train GROUP BY t HAVING count(*) >= 2)
        |SELECT e.lang, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  (CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        |    // count(*) AS oov_permille
        |FROM (SELECT * FROM tok2 WHERE NOT is_train) e
        |LEFT JOIN vocab v ON e.t = v.t
        |GROUP BY e.lang ORDER BY e.lang""".stripMargin,
    "q_split_assign" ->
      """WITH b AS (SELECT lang, text,
        |  list_reduce(list_transform(
        |      string_split_regex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''),
        |      ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
        |    (a, d) -> a * 16 + d) % 100 AS bucket
        |FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'validation'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
    // replays stratifiedSample: rank by the same 60-bit md5(doc_id) hash
    // within each language, keep the quota lowest
    "q_mix_quota" ->
      """WITH h AS (SELECT lang, doc_id,
        |  list_reduce(list_transform(
        |      string_split_regex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''),
        |      ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
        |    (a, d) -> a * 16 + d) AS hk
        |FROM documents),
        |r AS (SELECT lang, doc_id,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn FROM h)
        |SELECT lang, doc_id FROM r
        |WHERE rn <= CASE lang WHEN 'en' THEN 120 WHEN 'de' THEN 60 WHEN 'es' THEN 60
        |             WHEN 'fr' THEN 60 WHEN 'zh' THEN 60 ELSE NULL END
        |ORDER BY lang, doc_id""".stripMargin,
    // replays Pack.packBins: bin = (tokens preceding the doc in id
    // order) / 4096 — the windowed sum is the oracle's (single-threaded)
    // stand-in for the engine's two-phase prefix scan
    "q_pack_bins" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |        COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |      FROM t)
        |SELECT CAST(s // 4096 AS BIGINT) AS bin, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY bin""".stripMargin,
    // replays packedSequences: same bin layout, then the id-ordered
    // newline-joined text per bin, md5'd
    "q_pack_text" ->
      """WITH t AS (SELECT doc_id, text, len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, text, n_tok,
        |        COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |      FROM t)
        |SELECT CAST(s // 4096 AS BIGINT) AS bin, count(*) AS n_docs,
        |  md5(string_agg(text, chr(10) ORDER BY doc_id)) AS packed_md5
        |FROM c GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_token_topk" ->
      """SELECT t, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |GROUP BY t ORDER BY n DESC, t LIMIT 20""".stripMargin,
    // the naive form the engine's broadcast-count arithmetic must
    // equal: one global window over (intra-domain rank, domain)
    "q_interleave" ->
      """WITH rk AS (SELECT source AS domain, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT row_number() OVER (ORDER BY rk, domain, doc_id) AS position,
        |  domain, doc_id, rk
        |FROM rk ORDER BY position""".stripMargin,
    // replays q_global_shuffle with the naive global window the engine
    // avoids — the gate proves cell-rank arithmetic equals the sort
    "q_global_shuffle" ->
      """SELECT row_number() OVER (
        |    ORDER BY md5('gs_' || CAST(doc_id AS VARCHAR)), doc_id) AS pos,
        |  doc_id
        |FROM documents ORDER BY pos""".stripMargin,
    "q_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |dl AS (SELECT doc_id, len(w) AS dl FROM d),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |                 CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
        |tok AS (SELECT d.doc_id, dl.dl, unnest(d.w) AS t FROM d JOIN dl ON d.doc_id = dl.doc_id),
        |tf AS (SELECT doc_id, dl, t, count(*) AS tf FROM tok
        |       WHERE t IN ('spark','table','query') GROUP BY doc_id, dl, t),
        |dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |sc AS (SELECT tf.doc_id, tf.t,
        |         (ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * (tf.tf * 2.2))
        |           / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)) AS sv
        |       FROM tf JOIN dft ON tf.t = dft.t CROSS JOIN stats s),
        |agg AS (SELECT doc_id,
        |          COALESCE(sum(CASE WHEN t = 'spark' THEN sv END), 0.0) AS s0,
        |          COALESCE(sum(CASE WHEN t = 'table' THEN sv END), 0.0) AS s1,
        |          COALESCE(sum(CASE WHEN t = 'query' THEN sv END), 0.0) AS s2
        |        FROM sc GROUP BY doc_id)
        |SELECT doc_id, round(s0 + s1 + s2, 4) AS score FROM agg
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q_lang_id_ngram" ->
      s"""WITH h AS (SELECT lang,
        |  $ngramHits
        |FROM documents),
        |p AS (SELECT lang,
        |  CASE WHEN de >= greatest(en, es, fr, zh) THEN 'de'
        |       WHEN en >= greatest(es, fr, zh) THEN 'en'
        |       WHEN es >= greatest(fr, zh) THEN 'es'
        |       WHEN fr >= zh THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang FROM h)
        |SELECT lang, predicted_lang, count(*) AS n FROM p
        |GROUP BY lang, predicted_lang ORDER BY lang, predicted_lang""".stripMargin,
    // replays tokenizerFertility: summed whitespace + regex token
    // counts per lang, integer-ppm ratio
    "q_tokenizer_fertility" ->
      s"""SELECT lang AS g, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        |  CAST(sum(len(regexp_extract_all(text, '$bpePat'))) AS BIGINT) AS n_bpe,
        |  CAST(sum(len(regexp_extract_all(text, '$bpePat'))) * 1000000
        |    // sum(len(string_split(text, ' '))) AS BIGINT) AS fertility_ppm
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // replays sourceKl: exact source/corpus unigram counts, the double
    // ratio in the same t1/t2 shape, 7-dp ln, integer-weighted DECIMAL
    // term sum emitted exactly
    "q_source_kl" ->
      """WITH tok AS (SELECT source AS src, unnest(string_split(text, ' ')) AS w FROM documents),
        |cs AS (SELECT src, w, count(*) AS csw FROM tok GROUP BY src, w),
        |cc AS (SELECT w, count(*) AS ccw FROM tok GROUP BY w),
        |ns AS (SELECT src, count(*) AS ns FROM tok GROUP BY src),
        |nc AS (SELECT count(*) AS nct FROM tok),
        |term AS (SELECT cs.src, ns.ns,
        |    CAST(csw AS DECIMAL(21,7)) *
        |      CAST(round(ln((CAST(csw AS DOUBLE) * CAST(nct AS DOUBLE)) /
        |        (CAST(ns AS DOUBLE) * CAST(ccw AS DOUBLE))), 7) AS DECIMAL(21,7)) AS t
        |  FROM cs JOIN cc USING (w) JOIN ns ON cs.src = ns.src CROSS JOIN nc)
        |SELECT src, ns AS n_tokens, CAST(sum(t) AS DOUBLE) AS kl_sum
        |FROM term GROUP BY src, ns ORDER BY src""".stripMargin,
    // both argmaxes per doc, joined on doc_id, counted as a confusion
    // matrix — replays the two lang-ID oracles verbatim
    "q_langid_confusion" ->
      s"""WITH a AS (SELECT doc_id,
        |  $langHits
        |FROM documents),
        |pa AS (SELECT doc_id,
        |  CASE WHEN de >= greatest(en, es, fr, zh) THEN 'de'
        |       WHEN en >= greatest(es, fr, zh) THEN 'en'
        |       WHEN es >= greatest(fr, zh) THEN 'es'
        |       WHEN fr >= zh THEN 'fr'
        |       ELSE 'zh' END AS m_stop FROM a),
        |b AS (SELECT doc_id,
        |  $ngramHits
        |FROM documents),
        |pb AS (SELECT doc_id,
        |  CASE WHEN de >= greatest(en, es, fr, zh) THEN 'de'
        |       WHEN en >= greatest(es, fr, zh) THEN 'en'
        |       WHEN es >= greatest(fr, zh) THEN 'es'
        |       WHEN fr >= zh THEN 'fr'
        |       ELSE 'zh' END AS m_ngram FROM b)
        |SELECT m_stop, m_ngram, count(*) AS n
        |FROM pa JOIN pb USING (doc_id)
        |GROUP BY m_stop, m_ngram ORDER BY m_stop, m_ngram""".stripMargin,
    "q_rollhash" ->
      """SELECT doc_id, list_reduce(
        |  list_prepend(CAST(7 AS BIGINT),
        |    list_transform(string_split_regex(text, ''), c -> CAST(ord(c) AS BIGINT))),
        |  (a, b) -> (a * 31 + b) % 1000000007) AS rhash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM d),
        |tf AS (SELECT doc_id, dl, t, count(*) AS tf FROM tok GROUP BY doc_id, dl, t),
        |dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.t AS term,
        |  round((CAST(tf.tf AS DOUBLE) / tf.dl) * ln((n.n_docs + 1.0) / (dft.df + 1.0)), 6) AS weight
        |FROM tf JOIN dft ON tf.t = dft.t CROSS JOIN n
        |ORDER BY doc_id, term""".stripMargin,
    // thumbnail / frame-sample kernel outputs are pure functions of the
    // blob length, itself a pure function of vec_id (payload =
    // repeat(md5(vec_id), 4)): thumbnail(k=7) keeps every 7th payload
    // byte; frameSample(16, 2) keeps min(16, remaining) bytes at each
    // 32-byte stride past the 13-byte header
    "q_multimodal_thumb" ->
      """WITH b AS (SELECT vec_id AS media_id,
        |  13 + 4 * length(md5(CAST(vec_id AS VARCHAR))) AS blob_len FROM embeddings)
        |SELECT media_id,
        |  CAST(floor((blob_len - 13 - 1) / 7) + 1 AS INT) AS thumb_bytes,
        |  CAST(list_sum(list_transform(
        |        generate_series(0, CAST(floor((blob_len - 13 - 1) / 32) AS INT)),
        |        k -> least(16, blob_len - 13 - 32 * k))) / 16.0 AS DOUBLE) AS n_frames_kept
        |FROM b ORDER BY media_id""".stripMargin,
    // byte-moment features recomputed from the synthesized payload
    // (ASCII md5 hex ×4): every intermediate is exactly representable in
    // double (integer byte values, mean = int/128, squared deviations
    // with ≤14 fractional bits), so both engines produce identical bits
    "q_multimodal_features" ->
      """WITH p AS (SELECT vec_id AS media_id,
        |            repeat(md5(CAST(vec_id AS VARCHAR)), 4) AS pay FROM embeddings),
        |c AS (SELECT media_id, ord(u) AS b
        |      FROM (SELECT media_id, unnest(string_split_regex(pay, '')) AS u FROM p)
        |      WHERE u <> ''),
        |m AS (SELECT media_id, count(*) AS n,
        |        CAST(sum(b) AS DOUBLE) / count(*) AS m1 FROM c GROUP BY media_id),
        |v AS (SELECT c.media_id, m.n, m.m1,
        |        sum((c.b - m.m1) * (c.b - m.m1)) / m.n AS m2
        |      FROM c JOIN m ON c.media_id = m.media_id GROUP BY c.media_id, m.n, m.m1)
        |SELECT media_id, CAST(n AS INT) AS payload_bytes,
        |  round(m1, 6) AS byte_mean, round(m2, 6) AS byte_var
        |FROM v ORDER BY media_id""".stripMargin,
    // the full pHash pipeline replayed: planted twins, 60 positional
    // buckets, integer cross-multiply bits, chunk join, bit_count
    "q_phash_neardup" ->
      """WITH p0 AS (SELECT vec_id AS media_id,
        |            repeat(md5(CAST(vec_id AS VARCHAR)), 4) AS pay FROM embeddings),
        |mxo AS (SELECT CAST('1' || repeat('0', length(CAST(max(media_id) AS VARCHAR)))
        |            AS BIGINT) AS off FROM p0),
        |tw AS (SELECT media_id + (SELECT off FROM mxo) AS media_id,
        |            'z' || substr(pay, 2) AS pay
        |       FROM p0 WHERE media_id % 10 = 0),
        |p AS (SELECT * FROM p0 UNION ALL SELECT * FROM tw),
        |ix AS (SELECT media_id, pay, unnest(generate_series(1, len(pay))) AS i FROM p),
        |c AS (SELECT media_id, (i - 1) % 60 AS bk, ord(substr(pay, i, 1)) AS b FROM ix),
        |bs AS (SELECT media_id, bk, sum(b) AS s, count(*) AS cnt FROM c GROUP BY 1, 2),
        |tot AS (SELECT media_id, sum(s) AS t, sum(cnt) AS n FROM bs GROUP BY 1),
        |ph AS (SELECT bs.media_id,
        |         CAST(sum(CASE WHEN bs.s * tot.n > tot.t * bs.cnt
        |                       THEN CAST(1 AS BIGINT) << CAST(bk AS INT) ELSE 0 END) AS BIGINT) AS phash
        |       FROM bs JOIN tot ON bs.media_id = tot.media_id GROUP BY bs.media_id),
        |chunks AS (SELECT media_id, phash, c, (phash >> (c * 15)) & 32767 AS chunk
        |           FROM ph CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c)),
        |keep AS (SELECT c, chunk FROM chunks GROUP BY c, chunk HAVING count(*) <= 100),
        |ck AS (SELECT ch.* FROM chunks ch JOIN keep k ON ch.c = k.c AND ch.chunk = k.chunk),
        |pairs AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
        |            a.phash AS pa, b.phash AS pb
        |          FROM ck a JOIN ck b
        |          ON a.c = b.c AND a.chunk = b.chunk AND a.media_id < b.media_id)
        |SELECT media_a, media_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
        |FROM pairs WHERE bit_count(xor(pa, pb)) <= 3
        |ORDER BY media_a, media_b""".stripMargin,
    "q_phash_neardup_local" -> (phashLocalPairsCte +
      """
        |SELECT media_a, media_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
        |FROM pairs WHERE bit_count(xor(pa, pb)) <= 3
        |ORDER BY media_a, media_b""".stripMargin),
    // media dedup clusters: the verified local-pHash pairs closed into
    // connected components (cluster_id = min reachable media id) — the
    // same pointer-jumping operator the text family uses
    "q_phash_clusters" -> (phashLocalPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |fp AS (SELECT media_a, media_b FROM pairs WHERE bit_count(xor(pa, pb)) <= 3),
        |edges AS (SELECT media_a AS src, media_b AS dst FROM fp
        |          UNION ALL SELECT media_b, media_a FROM fp),
        |reach(a, b) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
        |SELECT a AS media_id, least(a, min(b)) AS cluster_id FROM reach
        |GROUP BY a ORDER BY media_id""".stripMargin),
    "q_multimodal_meta" ->
      """WITH m AS (SELECT vec_id, 16 + vec_id % 48 AS width, 16 + vec_id % 32 AS height,
        |                  1 + vec_id % 3 AS channels, 128 AS payload_bytes FROM embeddings)
        |SELECT channels, count(*) AS n,
        |  CAST(sum(payload_bytes) AS BIGINT) AS sum_payload_bytes,
        |  min(width) AS min_width, max(width) AS max_width,
        |  min(height) AS min_height, max(height) AS max_height
        |FROM m GROUP BY channels ORDER BY channels""".stripMargin,
    "q_json_stats" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS min_k,
        |  max(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS max_k,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // CDC chunk boundaries replayed with the identical integer Horner
    // fold (w=16 window, mod 1e9+7, cut where hash % 64 = 0)
    "q_cdc_dup_chunks" ->
      """WITH cs AS (SELECT doc_id,
        |        list_filter(string_split_regex(text, ''), c -> len(c) > 0) AS ch
        |      FROM documents),
        |b AS (SELECT doc_id, ch, len(ch) AS n,
        |        CASE WHEN len(ch) > 16 THEN
        |          list_filter(generate_series(16, len(ch) - 1), p ->
        |            list_reduce(list_prepend(CAST(0 AS BIGINT),
        |              list_transform(list_slice(ch, p - 15, p), c -> CAST(ord(c) AS BIGINT))),
        |              (a, d) -> (a * 31 + d) % 1000000007) % 64 = 0)
        |        ELSE CAST([] AS BIGINT[]) END AS bpos
        |      FROM cs),
        |st AS (SELECT doc_id, ch, list_prepend(0, bpos) AS starts,
        |         list_append(bpos, n) AS ends FROM b),
        |ck AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(starts)),
        |         i -> array_to_string(list_slice(ch, starts[i] + 1, ends[i]), ''))) AS chunk
        |       FROM st)
        |SELECT md5(chunk) AS fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
        |  CAST(min(length(chunk)) AS INT) AS chunk_len
        |FROM ck GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY n_occ DESC, fp LIMIT 50""".stripMargin,
    // curated-corpus stats: quality gate → exact-dedup survivors →
    // per-lang aggregates (the composition of three oracle-checked stages)
    "q_curation" ->
      s"""WITH m AS (SELECT doc_id, lang, text, length(text) AS n_chars,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct_tokens,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |FROM documents),
        |sc AS (SELECT *,
        |  4 * n_distinct_tokens + 3 * n_tokens * (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
        |    + 3 * least(3 * n_stop, n_tokens) AS num,
        |  10 * n_tokens AS den FROM m),
        |qual AS (SELECT doc_id, n_tokens FROM sc
        |  WHERE floor(CAST(2000000 * num + den AS DOUBLE) / CAST(2 * den AS DOUBLE)) / 1000000.0 >= 0.5
        |    AND n_tokens BETWEEN 10 AND 1000),
        |kept AS (SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM kept JOIN qual USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // replays curationFunnel: same integer quality ppm, 6-dp repetition
    // ratio, text-partition dedup keeper, running conjunction sums
    "q_curation_funnel" ->
      """WITH m AS (SELECT doc_id, text,
        |    len(string_split(text,' ')) AS ntok,
        |    len(list_distinct(string_split(text,' '))) AS ndis,
        |    len(list_filter(string_split(text,' '),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS nstop,
        |    round(1.0 - CAST(len(list_distinct(list_transform(
        |        generate_series(1, greatest(len(string_split(text,' '))-2, 1)),
        |        i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))) AS DOUBLE)
        |      / CAST(greatest(len(string_split(text,' '))-2, 1) AS DOUBLE), 6) AS rr
        |  FROM documents),
        |q AS (SELECT *,
        |    floor(CAST(2000000 * (4 * ndis
        |        + 3 * ntok * (CASE WHEN ntok BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
        |        + 3 * least(3 * nstop, ntok)) + 10 * ntok AS DOUBLE)
        |      / CAST(2 * 10 * ntok AS DOUBLE)) AS qppm FROM m),
        |k AS (SELECT doc_id, 1 AS keep FROM (
        |    SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |f AS (SELECT
        |    CASE WHEN ntok BETWEEN 10 AND 1000 THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN qppm >= 500000 THEN 1 ELSE 0 END AS f2,
        |    CASE WHEN rr <= 0.2 THEN 1 ELSE 0 END AS f3,
        |    coalesce(keep, 0) AS keep
        |  FROM q LEFT JOIN k USING (doc_id)),
        |a AS (SELECT count(*) AS n0, coalesce(sum(f1), 0) AS n1,
        |        coalesce(sum(f1*f2), 0) AS n2, coalesce(sum(f1*f2*f3), 0) AS n3,
        |        coalesce(sum(f1*f2*f3*keep), 0) AS n4 FROM f)
        |SELECT stage, gate, CAST(n_kept AS BIGINT) AS n_kept,
        |  CAST(n_cut AS BIGINT) AS n_cut,
        |  CASE WHEN n0 > 0 THEN CAST(n_kept * 1000000 // n0 AS BIGINT) END AS kept_ppm
        |FROM (
        |  SELECT 0 AS stage, 'total' AS gate, n0 AS n_kept, 0 AS n_cut, n0 FROM a
        |  UNION ALL SELECT 1, 'token_band', n1, n0 - n1, n0 FROM a
        |  UNION ALL SELECT 2, 'quality', n2, n1 - n2, n0 FROM a
        |  UNION ALL SELECT 3, 'repetition', n3, n2 - n3, n0 FROM a
        |  UNION ALL SELECT 4, 'exact_dedup', n4, n3 - n4, n0 FROM a)
        |ORDER BY stage""".stripMargin,
    // each event contributes to the two 2-day windows whose 1-day-slide
    // starts cover it (UTC day-aligned, like Spark's window())
    "q_event_sliding" ->
      """WITH w AS (SELECT strftime(date_trunc('day', ts) - o * INTERVAL 1 DAY, '%Y-%m-%d') AS w_start,
        |                  value, user_id
        |           FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o))
        |SELECT w_start, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM w GROUP BY w_start ORDER BY w_start""".stripMargin,
    "q_event_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    // replays Events.funnel: per-user first-occurrence ns per stage,
    // strict-increase depth fold, per-stage reached counts
    "q_funnel" ->
      """WITH m AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
        |  min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t1,
        |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t2
        |FROM events GROUP BY user_id),
        |d AS (SELECT user_id,
        |  CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
        |            AND t2 IS NOT NULL AND t2 > t1 THEN 3
        |       WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0 THEN 2
        |       WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS depth FROM m)
        |SELECT stage_idx, stage,
        |  CAST(count(CASE WHEN depth >= stage_idx THEN 1 END) AS BIGINT) AS n_users
        |FROM (VALUES (1, 'view'), (2, 'click'), (3, 'purchase')) s(stage_idx, stage)
        |CROSS JOIN d
        |GROUP BY stage_idx, stage ORDER BY stage_idx""".stripMargin,
    "q_asof_join" ->
      """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events WHERE event_type IN ('click','purchase')),
        |w AS (SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER win AS asof_event_id,
        |  last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS) OVER win AS asof_ts_us
        |  FROM t WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_us, asof_event_id, asof_ts_us FROM w
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    // the as-of join + campaign fetch + DECIMAL revenue roll-up;
    // null-asof purchases land in 'unattributed'
    "q_attribution" ->
      """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value, props
        |           FROM events WHERE event_type IN ('click','purchase')),
        |w AS (SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER win AS asof_event_id
        |  FROM t WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |conv AS (SELECT event_id, asof_event_id, value FROM w WHERE event_type = 'purchase'),
        |tch AS (SELECT event_id AS asof_event_id,
        |          CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) % 10 AS campaign
        |        FROM t WHERE event_type = 'click')
        |SELECT coalesce(CAST(tch.campaign AS VARCHAR), 'unattributed') AS campaign,
        |  count(*) AS n_conversions,
        |  CAST(sum(CAST(conv.value AS DECIMAL(20,6))) AS DOUBLE) AS revenue
        |FROM conv LEFT JOIN tch USING (asof_event_id)
        |GROUP BY 1 ORDER BY campaign""".stripMargin,
    "q_asof_forward" ->
      """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events WHERE event_type IN ('click','purchase')),
        |w AS (SELECT *,
        |  first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER win AS asof_event_id,
        |  first_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS) OVER win AS asof_ts_us
        |  FROM t WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, ts_us, asof_event_id, asof_ts_us FROM w
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    // replays Events.scd2: equal-ts compaction to the max-id change,
    // then null-safe run collapse over the (user, ts, id) order,
    // lead() closes each interval, current run stays open
    "q_scd2" ->
      """WITH e0 AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |           FROM events WHERE user_id < 50),
        |e AS (SELECT user_id, event_type, ts_us, event_id FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
        |          ORDER BY event_id DESC) AS cr FROM e0) WHERE cr = 1),
        |w AS (SELECT *,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |      FROM e),
        |ch AS (SELECT * FROM w WHERE rn = 1 OR NOT (event_type IS NOT DISTINCT FROM prev))
        |SELECT user_id, event_type AS value, ts_us AS valid_from_us,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
        |  event_id AS change_id
        |FROM ch ORDER BY user_id, valid_from_us, change_id""".stripMargin,
    // the live SCD2 sink = the batch history's CLOSED intervals (the
    // open run per key lives in the state store, not the sink)
    "q_stream_scd2" ->
      """WITH e0 AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |           FROM events WHERE user_id < 50),
        |e AS (SELECT user_id, event_type, ts_us, event_id FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
        |          ORDER BY event_id DESC) AS cr FROM e0) WHERE cr = 1),
        |w AS (SELECT *,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |      FROM e),
        |ch AS (SELECT * FROM w WHERE rn = 1 OR NOT (event_type IS NOT DISTINCT FROM prev)),
        |iv AS (SELECT user_id, event_type AS value, ts_us AS valid_from_us,
        |         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
        |         event_id AS change_id
        |       FROM ch)
        |SELECT * FROM iv WHERE valid_to_us IS NOT NULL
        |ORDER BY user_id, valid_from_us, change_id""".stripMargin,
    "q_sessionize" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        |FROM events),
        |b AS (SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM o),
        |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no FROM b)
        |SELECT user_id, session_no, min(ts_us) AS ts_start_us, max(ts_us) AS ts_end_us,
        |  count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no""".stripMargin,
    "q_range_join" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        |FROM events),
        |b AS (SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM o),
        |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no FROM b),
        |sess AS (SELECT user_id, session_no, min(ts_us) AS ts_start_us, max(ts_us) AS ts_end_us
        |         FROM s GROUP BY user_id, session_no)
        |SELECT sess.user_id, sess.session_no, count(*) AS n_events
        |FROM sess JOIN events e ON e.user_id = sess.user_id
        |  AND epoch_us(e.ts) BETWEEN sess.ts_start_us AND sess.ts_end_us
        |GROUP BY sess.user_id, sess.session_no
        |ORDER BY sess.user_id, sess.session_no""".stripMargin,
    // per-day and per-group streaming checksums, recomputed end-to-end
    // by the SQL crc64 over (event_id ‖ props)
    "q_stream_window_checksum" -> ("WITH " + crc64TabCte + ",\n" +
      crcRows("sgn",
        """(SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |  CAST(event_id AS VARCHAR) AS k, props AS v FROM events)""".stripMargin,
        carry = Seq("day")) + "\n" +
      """SELECT day, bit_xor(crc) AS crc64_xor, count(*) AS total_kvs,
        |  CAST(sum(length(k) + length(v)) AS BIGINT) AS total_bytes
        |FROM sgn GROUP BY day ORDER BY day""".stripMargin),
    "q_stream_keyed_checksum" -> ("WITH " + crc64TabCte + ",\n" +
      crcRows("sgn",
        """(SELECT event_type, CAST(event_id AS VARCHAR) AS k, props AS v FROM events WHERE user_id < 100)""",
        carry = Seq("event_type")) + "\n" +
      """SELECT event_type AS "group", bit_xor(crc) AS crc64_xor,
        |  count(*) AS total_kvs,
        |  CAST(sum(length(k) + length(v)) AS BIGINT) AS total_bytes
        |FROM sgn GROUP BY 1 ORDER BY "group"""".stripMargin),
    // the stream-stream diff must equal the batch diff on the same
    // bounded key range — the watermark/window machinery only changes
    // WHEN rows emit, never what
    "q_stream_diff" -> (cte +
      """SELECT COALESCE(s.k, d.k) AS key, s.v AS src_value, d.v AS dst_value,
        |  CASE WHEN s.k IS NULL THEN 'dst_only'
        |       WHEN d.k IS NULL THEN 'src_only'
        |       ELSE 'mismatch' END AS diff_class
        |FROM (SELECT k, v FROM src WHERE k >= 'li_0000000001' AND k < 'li_0000002000') s
        |FULL OUTER JOIN
        |     (SELECT k, v FROM dst WHERE k >= 'li_0000000001' AND k < 'li_0000002000') d
        |ON s.k = d.k
        |WHERE s.k IS NULL OR d.k IS NULL OR s.v <> d.v
        |ORDER BY key, diff_class""".stripMargin),
    // streaming dedup (dropDuplicatesWithinWatermark) fed every row 4×
    // must equal batch DISTINCT on the slice — keys are unique per
    // snapshot, so the surviving (key, value) row is deterministic
    "q_stream_dedup" -> (cte +
      """SELECT k AS key, v AS value FROM src
        |WHERE k >= 'li_0000000001' AND k < 'li_0000002000'
        |ORDER BY key""".stripMargin),
    // the merge identity: src + changelog(diff) must equal dst
    "q_merge_upsert" -> (cte +
      "SELECT k AS key, v AS value FROM dst ORDER BY key"),
    // the foreachBatch merge-sink twin of the same identity
    "q_stream_foreach_merge" -> (cte + dstSliceSelect),
    // streaming twin of the same identity, on the bounded feed slice
    "q_stream_upsert" -> (cte + dstSliceSelect),
    // the kvbin-generation merge sink lands the same identity: the
    // drained DSv2 read-back must equal the dst slice byte-for-byte
    "q_stream_kvbin_sink" -> (cte + dstSliceSelect),
    // the kvbin streaming SOURCE: two generations (base write + one
    // append) tailed as micro-batches must drain to exactly the src
    // slice — the same rows the batch scan of the final table reads
    "q_stream_kvbin_scan" -> (cte +
      """SELECT k AS key, v AS value FROM src
        |WHERE k >= 'li_0000000001' AND k < 'li_0000002000'
        |ORDER BY key""".stripMargin),
    // the sharded-fleet tail drains the SAME slice: the three skewed
    // waves union back to the full range
    "q_stream_kvbin_fleet_scan" -> (cte +
      """SELECT k AS key, v AS value FROM src
        |WHERE k >= 'li_0000000001' AND k < 'li_0000002000'
        |ORDER BY key""".stripMargin),
    // the replica equals the source slice — same rows the tail emitted,
    // landed as B's generations and read back through the batch scan
    "q_stream_kvbin_replicate" -> (cte +
      """SELECT k AS key, v AS value FROM src
        |WHERE k >= 'li_0000000001' AND k < 'li_0000002000'
        |ORDER BY key""".stripMargin),
    // sharding the replica across a two-store fleet is pure topology:
    // the fleet union must carry the same source slice verbatim
    "q_stream_kvbin_fleet_replicate" -> (cte +
      """SELECT k AS key, v AS value FROM src
        |WHERE k >= 'li_0000000001' AND k < 'li_0000002000'
        |ORDER BY key""".stripMargin),
    // the scoped tail drains exactly the option-bounded half (committed
    // oracle replays the scale-1 scope, like the sliced siblings)
    "q_stream_kvbin_scoped" -> (cte +
      """SELECT k AS key, v AS value FROM src
        |WHERE k >= 'li_0000000001' AND k < 'li_0000001000'
        |ORDER BY key""".stripMargin),
    // the live verdict replays both sides' per-bucket digests from the
    // parquet slices: state-store-folded src micro-batches must equal
    // the plain batch digest, bucket by bucket, against dst
    "q_stream_kvbin_verdict" -> (cte + "," + crc64TabCte + ",\n" +
      """ss AS (SELECT k, v FROM src
        |       WHERE k >= 'li_0000000001' AND k < 'li_0000002000'),
        |ds AS (SELECT k, v FROM dst
        |       WHERE k >= 'li_0000000001' AND k < 'li_0000002000'),
        |""".stripMargin +
      crcRows("ssg", "ss") + ",\n" + crcRows("dsg", "ds") + "\n" +
      """SELECT COALESCE(s.bucket, d.bucket) AS bucket,
        |  s.c AS src_crc64_xor, s.n AS src_total_kvs, s.b AS src_total_bytes,
        |  d.c AS dst_crc64_xor, d.n AS dst_total_kvs, d.b AS dst_total_bytes,
        |  COALESCE(s.c = d.c AND s.n = d.n AND s.b = d.b, FALSE) AS matches
        |FROM (SELECT substr(k, 1, 10) AS bucket, bit_xor(crc) AS c, count(*) AS n,
        |        CAST(sum(length(k) + length(v)) AS BIGINT) AS b FROM ssg GROUP BY 1) s
        |FULL JOIN (SELECT substr(k, 1, 10) AS bucket, bit_xor(crc) AS c, count(*) AS n,
        |        CAST(sum(length(k) + length(v)) AS BIGINT) AS b FROM dsg GROUP BY 1) d
        |  ON s.bucket = d.bucket
        |ORDER BY bucket""".stripMargin),
    // the watermark-drop sink must equal the batch aggregate of the
    // ON-TIME slice alone: the late half contributes nothing
    "q_stream_late_drop" ->
      """SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
        |  event_type, count(*) AS n
        |FROM events
        |WHERE user_id < 20 AND epoch_us(ts) >= 1705363200000000
        |GROUP BY 1, 2 ORDER BY day_us, event_type""".stripMargin,
    // the streamed sketch's sink counters must rank exactly like the
    // batch sketch over the whole slice
    "q_stream_hist_quantile" ->
      """WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id < 50),
        |st AS (SELECT g, min(v) AS lo, max(v) AS hi FROM base GROUP BY 1),
        |cells AS (SELECT b.g,
        |    CASE WHEN st.hi > st.lo
        |         THEN least(1023, CAST(floor((b.v - st.lo) / (st.hi - st.lo) * 1024) AS BIGINT))
        |         ELSE 0 END AS bucket, count(*) AS cnt
        |  FROM base b JOIN st ON b.g = st.g GROUP BY 1, 2),
        |run AS (SELECT g, bucket, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS hi_rank,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bucket) - cnt AS lo_rank
        |  FROM cells),
        |nn AS (SELECT g, count(*) AS n FROM base GROUP BY 1)
        |SELECT r.g AS event_type, q.q_permille, nn.n, r.bucket,
        |  round(st.lo + r.bucket * ((st.hi - st.lo) / 1024), 9) AS est_lo,
        |  round(st.lo + (r.bucket + 1) * ((st.hi - st.lo) / 1024), 9) AS est_hi
        |FROM run r
        |JOIN nn ON r.g = nn.g JOIN st ON r.g = st.g
        |CROSS JOIN (VALUES (500), (950)) AS q(q_permille)
        |WHERE r.lo_rank < (q.q_permille * nn.n + 999) // 1000
        |  AND (q.q_permille * nn.n + 999) // 1000 <= r.hi_rank
        |ORDER BY event_type, q_permille""".stripMargin,
    // the file sink's manifest-committed read-back must equal the
    // batch aggregate of the fed slice
    "q_stream_file_sink" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE user_id < 50
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the streaming release gate's fixed point IS the batch k-anonymity
    // filter of the fed slice — cells reaching k=4 release all their
    // rows, smaller cells release none
    "q_stream_k_anon" ->
      """WITH ev AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day, event_id
        |  FROM events WHERE user_id < 20),
        |cells AS (SELECT event_type, day FROM ev
        |          GROUP BY 1, 2 HAVING count(*) >= 4)
        |SELECT ev.event_type, ev.day, ev.event_id
        |FROM ev JOIN cells USING (event_type, day)
        |ORDER BY 1, 2, 3""".stripMargin,
    // a stateless stream-static join's sink must equal the batch join
    // over the same slice, whatever the micro-batch boundaries
    "q_stream_static" ->
      """SELECT event_id, user_id, c_nationkey, c_mktsegment, value
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE user_id < 50 ORDER BY event_id""".stripMargin,
    // the streaming interval-join sink must equal the batch interval
    // join over the fed slice (clicks ≤ 6 h after a same-user view)
    "q_stream_ijoin" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events WHERE user_id < 20),
        |v AS (SELECT user_id, ts AS v_ts FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts AS c_ts FROM e WHERE event_type = 'click')
        |SELECT v.user_id, CAST(epoch_us(v_ts) AS BIGINT) AS view_ts_us,
        |       CAST(epoch_us(c_ts) AS BIGINT) AS click_ts_us
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 6 HOUR
        |ORDER BY 1, 2, 3""".stripMargin,
    // the left-outer streaming sink must equal the batch LEFT join over
    // the fed slice: unmatched views flush with NULL clicks once the
    // ticks push the watermark past every horizon. NULL click ordering
    // pinned via coalesce(-1) on both engines.
    "q_stream_left_ijoin" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events WHERE user_id < 20),
        |v AS (SELECT user_id, ts AS v_ts FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts AS c_ts FROM e WHERE event_type = 'click')
        |SELECT v.user_id, CAST(epoch_us(v_ts) AS BIGINT) AS view_ts_us,
        |       CAST(epoch_us(c_ts) AS BIGINT) AS click_ts_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 6 HOUR
        |ORDER BY 1, 2, coalesce(CAST(epoch_us(c_ts) AS BIGINT), -1)""".stripMargin,
    // the full-outer streaming sink must equal the batch FULL join over
    // the fed slice; the user key coalesces across sides and BOTH
    // timestamp columns sort null-safely
    "q_stream_full_ijoin" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events WHERE user_id < 20),
        |v AS (SELECT user_id AS v_user, ts AS v_ts FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id AS c_user, ts AS c_ts FROM e WHERE event_type = 'click')
        |SELECT coalesce(v_user, c_user) AS user_id,
        |       CAST(epoch_us(v_ts) AS BIGINT) AS view_ts_us,
        |       CAST(epoch_us(c_ts) AS BIGINT) AS click_ts_us
        |FROM v FULL JOIN c ON v_user = c_user
        |  AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 6 HOUR
        |ORDER BY 1, coalesce(CAST(epoch_us(v_ts) AS BIGINT), -1),
        |         coalesce(CAST(epoch_us(c_ts) AS BIGINT), -1)""".stripMargin,
    // the streaming as-of sink must equal the batch as-of join over the
    // fed slice: state carries the latest click across the batch split
    "q_stream_asof" ->
      """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events
        |           WHERE event_type IN ('click','purchase') AND user_id < 20),
        |w AS (SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER win AS asof_event_id,
        |  last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS) OVER win AS asof_ts_us
        |  FROM t WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_us, asof_event_id, asof_ts_us FROM w
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    // the streaming CMS's final state must equal the batch sketch over
    // the whole corpus (micro-batch boundaries can't show through a
    // commutative counter fold)
    "q_stream_topk" ->
      """SELECT t, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |GROUP BY t ORDER BY n DESC, t LIMIT 20""".stripMargin,
    "q_stream_cms" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |it AS (SELECT unnest(s) AS item FROM sh),
        |hb AS (SELECT item, j,
        |         ${duckHash60("'cms' || j || '_' || item")} % 1024 AS bucket
        |       FROM (SELECT DISTINCT item FROM it)
        |         CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j))
        |SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM it JOIN hb USING (item)
        |GROUP BY j, bucket ORDER BY j, bucket""".stripMargin,
    // streaming sessions (event-time timeouts) must equal batch
    // sessionization; the double-typed sum column is excluded because
    // the streaming fold adds doubles in arrival order
    "q_stream_sessions" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        |FROM events WHERE user_id < 20),
        |b AS (SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM o),
        |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no FROM b)
        |SELECT user_id, min(ts_us) AS ts_start_us, max(ts_us) AS ts_end_us,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_no ORDER BY user_id, ts_start_us""".stripMargin,
    "q_window_lag" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |           FROM events WHERE user_id < 20),
        |w AS (SELECT event_id, user_id, ts_us,
        |  lag(event_id) OVER win AS prev_event_id,
        |  lead(event_id) OVER win AS next_event_id,
        |  row_number() OVER win AS seq,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_value
        |FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT event_id, user_id, ts_us, prev_event_id, next_event_id, seq, running_value
        |FROM w ORDER BY user_id, seq""".stripMargin,
    // Z-key arithmetic replayed bit-for-bit: same quantizers, same
    // 10-bit interleave as Layout.zorder2
    "q_zorder" -> {
      val zTerms = (0 until 10).map(b =>
        s"(((qx >> $b) & 1) << ${2 * b}) + (((qy >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      s"""WITH q AS (SELECT CAST(least(greatest(floor(value), 0), 1023) AS BIGINT) AS qx,
        |              user_id % 1024 AS qy FROM events),
        |z AS (SELECT $zTerms AS z FROM q)
        |SELECT z // 4096 AS zbucket, count(*) AS n, min(z) AS min_z, max(z) AS max_z
        |FROM z GROUP BY 1 ORDER BY n DESC, zbucket LIMIT 20""".stripMargin
    },
    // the partition-pruned read must lose nothing vs the unpartitioned
    // original — the oracle replays the aggregate straight off documents
    "q_partition_prune" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents WHERE lang IN ('en','zh')
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // compaction must be content-identical — replay over the original
    "q_compaction" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT md5(text)) AS n_distinct_texts
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // the bucketed tables hold exactly the snapshots, so the bucketed
    // join must equal the plain CTE join
    "q_bucket_join" -> (cte +
      """SELECT count(*) AS n_matched,
        |  CAST(sum(CASE WHEN s.v = d.v THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
        |  CAST(sum(length(s.v) + length(d.v)) AS BIGINT) AS sum_len
        |FROM src s JOIN dst d USING (k)""".stripMargin),
    "q_table_stats" -> {
      val statsCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      statsCols.map(c =>
        s"""SELECT '$c' AS "column", COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
           |  COUNT(DISTINCT $c) AS ndv, CAST(MIN($c) AS VARCHAR) AS min_val,
           |  CAST(MAX($c) AS VARCHAR) AS max_val FROM lineitem""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    // replays q_expectations: one wide conditional-sum pass, NULL
    // counted as a violation, unpivoted to one row per rule
    "q_expectations" ->
      """WITH s AS (SELECT count(*) AS n_rows,
        |  sum(CASE WHEN NOT (CAST(l_discount AS DECIMAL(4,2)) <= CAST(0.10 AS DECIMAL(4,2)))
        |           OR l_discount IS NULL THEN 1 ELSE 0 END) AS v0,
        |  sum(CASE WHEN NOT (l_returnflag IN ('A','N','R'))
        |           OR l_returnflag IS NULL THEN 1 ELSE 0 END) AS v1,
        |  sum(CASE WHEN NOT (l_extendedprice > 0)
        |           OR l_extendedprice IS NULL THEN 1 ELSE 0 END) AS v2,
        |  sum(CASE WHEN NOT (l_quantity < 45)
        |           OR l_quantity IS NULL THEN 1 ELSE 0 END) AS v3,
        |  sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
        |           OR l_quantity IS NULL THEN 1 ELSE 0 END) AS v4,
        |  sum(CASE WHEN NOT (l_shipdate >= '1995-06-01')
        |           OR l_shipdate IS NULL THEN 1 ELSE 0 END) AS v5
        |FROM lineitem)
        |SELECT rule, n_rows, n_violations FROM (
        |  SELECT 'discount_le_10pct' AS rule, n_rows, CAST(v0 AS BIGINT) AS n_violations FROM s
        |  UNION ALL SELECT 'flag_domain', n_rows, CAST(v1 AS BIGINT) FROM s
        |  UNION ALL SELECT 'price_positive', n_rows, CAST(v2 AS BIGINT) FROM s
        |  UNION ALL SELECT 'quantity_lt_45', n_rows, CAST(v3 AS BIGINT) FROM s
        |  UNION ALL SELECT 'quantity_range', n_rows, CAST(v4 AS BIGINT) FROM s
        |  UNION ALL SELECT 'ship_after_jun95', n_rows, CAST(v5 AS BIGINT) FROM s)
        |ORDER BY rule""".stripMargin,
    // replays q_k_anon: the cell census, the k>=4 row filter, and the
    // per-type kept/suppressed summary
    "q_k_anon" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    epoch_us(ts) // 3600000000 AS hr FROM events),
        |cells AS (SELECT event_type, hr, count(*) AS n FROM ev GROUP BY 1, 2),
        |kept AS (SELECT ev.* FROM ev JOIN cells USING (event_type, hr)
        |         WHERE n >= 4),
        |k AS (SELECT event_type, count(*) AS n_kept,
        |        count(DISTINCT hr) AS n_cells_kept FROM kept GROUP BY 1),
        |t AS (SELECT event_type, count(*) AS n_total FROM ev GROUP BY 1)
        |SELECT t.event_type, n_total,
        |  coalesce(n_kept, 0) AS n_kept,
        |  n_total - coalesce(n_kept, 0) AS n_suppressed,
        |  coalesce(n_cells_kept, 0) AS n_cells_kept
        |FROM t LEFT JOIN k USING (event_type) ORDER BY 1""".stripMargin,
    // same content-addressed 1/8 sample (md5 of event_id) in both
    // engines; quantile_cont ≡ Spark's interpolated percentile
    "q_approx_quantile" ->
      s"""WITH s AS (SELECT event_type, value FROM events
        |           WHERE ${duckHash60("'aq_' || CAST(event_id AS VARCHAR)")} % 8 = 0),
        |sq AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50_sample,
        |         round(quantile_cont(value, 0.95), 6) AS p95_sample
        |       FROM s GROUP BY event_type),
        |eq AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50_exact,
        |         round(quantile_cont(value, 0.95), 6) AS p95_exact
        |       FROM events GROUP BY event_type)
        |SELECT event_type, p50_sample, p95_sample, p50_exact, p95_exact
        |FROM sq JOIN eq USING (event_type) ORDER BY event_type""".stripMargin,
    // O(n log n) sort/running-max skyline formulation (2-D special
    // case); the engine's generic dominance operator must equal it
    "q_skyline" ->
      """WITH pts AS (SELECT DISTINCT o_totalprice AS a,
        |               CAST(date_part('epoch', o_orderdate) AS BIGINT) AS b FROM orders),
        |s AS (SELECT a, b, max(b) OVER (ORDER BY a DESC, b DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mb FROM pts)
        |SELECT a AS totalprice, b AS orderdate_epoch FROM s
        |WHERE mb IS NULL OR b > mb ORDER BY totalprice DESC""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_ntile" ->
      """SELECT event_type, event_id, value,
        |  ntile(4) OVER win AS tile,
        |  round(cume_dist() OVER win, 6) AS cd,
        |  round(percent_rank() OVER win, 6) AS pr
        |FROM events WINDOW win AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, value, event_id""".stripMargin,
    "q_pivot" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // after the dynamic overwrite the table = all events with the
    // error partition's values zeroed; any other partition lost to
    // static-overwrite semantics would change the counts
    "q_dynamic_overwrite" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN CAST(0 AS DECIMAL(20,6))
        |           ELSE CAST(value AS DECIMAL(20,6)) END) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the live hot-key monitor's state-store counts score through the
    // batch profiler stage: the batch profile over the fed slice
    "q_stream_skew_profile" ->
      """WITH c AS (SELECT coalesce(CAST(event_type AS VARCHAR), '<null>') AS key,
        |             count(*) AS cnt
        |           FROM events WHERE user_id < 50 GROUP BY 1),
        |t AS (SELECT sum(cnt) AS total FROM c)
        |SELECT key, cnt,
        |  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
        |  CAST((cnt * 32 + total - 1) // total AS BIGINT) AS salt_rec
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, key LIMIT 10""".stripMargin,
    // replays streamLshFilter as the batch banding rule: md5-MinHash
    // signatures (k=32), r=2 band keys, flagged iff a smaller-id doc
    // shares a (band_id, bk) bucket, rep = smallest such
    "q_stream_lsh_filter" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |sh AS (SELECT doc_id, list_distinct(list_transform(
         |         generate_series(1, greatest(len(w)-2, 1)),
         |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
         |tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
         |msig AS (SELECT doc_id, i,
         |            min(${duckHash60("'mh' || i || '_' || t")}) AS m
         |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i)
         |          GROUP BY doc_id, i),
         |band AS (SELECT doc_id, i // 2 AS band_id, string_agg(m, '_' ORDER BY i) AS bk
         |         FROM msig GROUP BY doc_id, i // 2),
         |hits AS (SELECT a.doc_id, min(b.doc_id) AS rep
         |         FROM band a JOIN band b ON a.band_id = b.band_id AND a.bk = b.bk
         |           AND b.doc_id < a.doc_id
         |         GROUP BY a.doc_id)
         |SELECT doc_id, rep FROM hits ORDER BY doc_id""".stripMargin,
    // per-batch observed metrics summed over the drain must equal the
    // batch aggregate of the fed slice; batch count pinned at 2
    "q_stream_observed" ->
      """SELECT CAST(2 AS BIGINT) AS n_batches, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE user_id < 50""".stripMargin,
    // the listener-delivered counters must equal the direct aggregate
    "q_observed_counters" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN value < 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DECIMAL(20,6)) AS DOUBLE) AS sum_value
        |FROM events""".stripMargin,
    // replays joinHotspots for the event_type self-join: per-key count
    // products, HUGEINT total (DECIMAL(38,0) twin), integer-ppm share
    "q_join_hotspots" ->
      """WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS cnt
        |           FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |m AS (SELECT key, cnt AS cnt_a, cnt AS cnt_b,
        |        CAST(cnt AS HUGEINT) * cnt AS out_dec FROM c),
        |t AS (SELECT sum(out_dec) AS total FROM m)
        |SELECT key, cnt_a, cnt_b,
        |  CAST(least(out_dec, 9223372036854775807) AS BIGINT) AS out_rows,
        |  CAST((out_dec * 1000000) // total AS BIGINT) AS share_ppm
        |FROM m CROSS JOIN t
        |ORDER BY out_dec DESC, key LIMIT 10""".stripMargin,
    // replays skewProfile over event_type: exact counts, integer-ppm
    // share, salt_rec = ceil(cnt·32/total)
    "q_skew_profile" ->
      """WITH c AS (SELECT coalesce(CAST(event_type AS VARCHAR), '<null>') AS key,
        |             count(*) AS cnt
        |           FROM events GROUP BY 1),
        |t AS (SELECT sum(cnt) AS total FROM c)
        |SELECT key, cnt,
        |  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
        |  CAST((cnt * 32 + total - 1) // total AS BIGINT) AS salt_rec
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, key LIMIT 10""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT event_type, CAST(floor(value / 100.0) AS INT) AS value_band, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY CUBE(event_type, CAST(floor(value / 100.0) AS INT))
        |ORDER BY event_type NULLS FIRST, value_band NULLS FIRST""".stripMargin,
    "q_intersect" -> (cte +
      """SELECT key, value FROM (
        |  SELECT k AS key, v AS value FROM src
        |  INTERSECT ALL
        |  SELECT k AS key, v AS value FROM dst)
        |ORDER BY key""".stripMargin),
    "q_stats" ->
      """SELECT event_type,
        |  round(stddev_samp(value), 6) AS sd_value,
        |  round(corr(value, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)), 6) AS corr_value_k,
        |  round(covar_samp(value, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)), 6) AS cov_value_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_join_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_scan_limit" -> (cte +
      """SELECT upper(hex(k)) AS key_hex, upper(hex(v)) AS value_hex
        |FROM (SELECT k, v FROM src ORDER BY k LIMIT 50) ORDER BY key_hex""".stripMargin),
    "q_meta_gate" -> (cte +
      """SELECT s.src_api_version, s.src_n_keys, d.dst_api_version, d.dst_n_keys,
        |  s.src_api_version = d.dst_api_version AS compatible
        |FROM (SELECT CASE WHEN count(*) > 0 AND min(substr(k,1,1)) = 'r' AND max(substr(k,1,1)) = 'r'
        |             THEN 'V2' ELSE 'V1' END AS src_api_version, count(*) AS src_n_keys FROM src) s,
        |     (SELECT CASE WHEN count(*) > 0 AND min(substr(k,1,1)) = 'r' AND max(substr(k,1,1)) = 'r'
        |             THEN 'V2' ELSE 'V1' END AS dst_api_version, count(*) AS dst_n_keys FROM dst) d""".stripMargin))

  private def parityOracle: Map[String, String] = Map(
    // §2a rows 4-9: the checksum family, fully recomputed in DuckDB via
    // the SQL crc64 (crc64TabCte) — the oracle now checks the digest
    // VALUES, not just shapes
    "q_checksum" -> (cte + "," + crc64TabCte + ",\n" + crcRows("sgn", "src") + "\n" +
      """SELECT COALESCE(bit_xor(crc), 0) AS crc64_xor, count(*) AS total_kvs,
        |  CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS total_bytes
        |FROM sgn""".stripMargin),
    "q_checksum_bucket" -> (cte + "," + crc64TabCte + ",\n" + crcRows("sgn", "src") + "\n" +
      """SELECT substr(k, 1, 10) AS bucket, bit_xor(crc) AS crc64_xor,
        |  count(*) AS total_kvs,
        |  CAST(sum(length(k) + length(v)) AS BIGINT) AS total_bytes
        |FROM sgn GROUP BY 1 ORDER BY bucket""".stripMargin),
    "q_checksum_verdict" -> (cte + "," + crc64TabCte + ",\n" +
      crcRows("ssg", "src") + ",\n" + crcRows("dsg", "dst") + "\n" +
      """SELECT s.c AS src_crc64_xor, s.n AS src_total_kvs, s.b AS src_total_bytes,
        |  d.c AS dst_crc64_xor, d.n AS dst_total_kvs, d.b AS dst_total_bytes,
        |  (s.c = d.c AND s.n = d.n AND s.b = d.b) AS matches
        |FROM (SELECT COALESCE(bit_xor(crc), 0) AS c, count(*) AS n,
        |        CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS b FROM ssg) s,
        |     (SELECT COALESCE(bit_xor(crc), 0) AS c, count(*) AS n,
        |        CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS b FROM dsg) d""".stripMargin),
    // replays the incremental-maintenance identity: derived = src XOR
    // delta digests, direct = dst recomputed — both in pure SQL
    "q_checksum_delta" -> (cte + "," + crc64TabCte + ",\n" +
      """del AS (SELECT s.k, s.v FROM src s LEFT JOIN dst d ON s.k = d.k
        |        WHERE d.k IS NULL OR s.v <> d.v),
        |ins AS (SELECT d.k, d.v FROM dst d LEFT JOIN src s ON d.k = s.k
        |        WHERE s.k IS NULL OR s.v <> d.v),
        |""".stripMargin +
      crcRows("ssg", "src") + ",\n" + crcRows("dsg", "dst") + ",\n" +
      crcRows("delsg", "del") + ",\n" + crcRows("inssg", "ins") + "\n" +
      """SELECT xor(xor(s.c, de.c), i.c) AS derived_crc64_xor,
        |  s.n - de.n + i.n AS derived_total_kvs,
        |  s.b - de.b + i.b AS derived_total_bytes,
        |  d.c AS direct_crc64_xor, d.n AS direct_total_kvs, d.b AS direct_total_bytes,
        |  (xor(xor(s.c, de.c), i.c) = d.c AND s.n - de.n + i.n = d.n
        |     AND s.b - de.b + i.b = d.b) AS matches
        |FROM (SELECT COALESCE(bit_xor(crc), 0) AS c, count(*) AS n,
        |        CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS b FROM ssg) s,
        |     (SELECT COALESCE(bit_xor(crc), 0) AS c, count(*) AS n,
        |        CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS b FROM dsg) d,
        |     (SELECT COALESCE(bit_xor(crc), 0) AS c, count(*) AS n,
        |        CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS b FROM delsg) de,
        |     (SELECT COALESCE(bit_xor(crc), 0) AS c, count(*) AS n,
        |        CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS b FROM inssg) i""".stripMargin),
    // §2a rows 13-17: the codec aggregates — roundtrip-success counts
    // must claim every key, and the APIv2 encoded size is closed-form:
    // 9 bytes per 8-byte group of (4-byte prefix ‖ key), incl. the
    // always-present padding group (TiKVCodec.memcomparableEncode)
    "q_codec_roundtrip" -> (cte +
      """SELECT count(*) AS n_keys, count(*) AS n_apiv2_roundtrip_ok,
        |  count(*) AS n_escape_roundtrip_ok,
        |  CAST(sum(9 * ((4 + length(k)) // 8 + 1)) AS BIGINT) AS sum_enc_bytes
        |FROM src""".stripMargin),
    "q_codec_ts" ->
      """SELECT count(*) AS n_keys, count(*) AS n_ts_roundtrip_ok,
        |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
        |FROM events""".stripMargin,
    "q_diff" -> (cte + diffSelectSql),
    // identical output contract to q_diff — the checksum pruning is a
    // pure execution-strategy change, so the oracle is the same SQL
    "q_diff_pruned" -> (cte + diffSelectSql),
    "q_diff_counts" -> (cte +
      """SELECT diff_class, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN s.k IS NULL THEN 'dst_only'
        |              WHEN d.k IS NULL THEN 'src_only'
        |              ELSE 'mismatch' END AS diff_class
        |  FROM src s FULL OUTER JOIN dst d ON s.k = d.k
        |  WHERE s.k IS NULL OR d.k IS NULL OR s.v <> d.v)
        |GROUP BY diff_class ORDER BY diff_class""".stripMargin),
    "q_diff_src_only" -> (cte +
      """SELECT s.k AS key, s.v AS value FROM src s
        |WHERE s.k NOT IN (SELECT k FROM dst) ORDER BY key""".stripMargin),
    "q_symdiff" -> (cte +
      """SELECT * FROM (
        |  SELECT k AS key, v AS value, 'src' AS side FROM (SELECT k, v FROM src EXCEPT ALL SELECT k, v FROM dst)
        |  UNION ALL
        |  SELECT k AS key, v AS value, 'dst' AS side FROM (SELECT k, v FROM dst EXCEPT ALL SELECT k, v FROM src))
        |ORDER BY key, side""".stripMargin),
    "q_range_filter" -> (cte +
      """SELECT upper(hex(k)) AS key_hex, upper(hex(v)) AS value_hex FROM src
        |WHERE k >= 'li_0000000100' AND k < 'li_0000000300' ORDER BY key_hex""".stripMargin),
    "q_kvbin_scan" -> (cte +
      """SELECT upper(hex(k)) AS key_hex, upper(hex(v)) AS value_hex FROM src
        |WHERE k >= 'li_0000000100' AND k < 'li_0000000300' ORDER BY key_hex""".stripMargin),
    // whole-table stats; ASCII keys make DuckDB's VARCHAR min/max equal
    // Spark's unsigned-lex binary min/max
    "q_kvbin_agg" -> (cte +
      """SELECT count(*) AS n, upper(hex(min(k))) AS min_key_hex,
        |  upper(hex(max(k))) AS max_key_hex FROM src""".stripMargin),
    // identical contract to q_kvbin_scan — the socket transport is a
    // pure execution-path change, so the oracle is the same SQL
    "q_kvbin_socket_scan" -> (cte +
      """SELECT upper(hex(k)) AS key_hex, upper(hex(v)) AS value_hex FROM src
        |WHERE k >= 'li_0000000100' AND k < 'li_0000000300' ORDER BY key_hex""".stripMargin),
    // identical contract again — two stores vs one is pure topology
    "q_kvbin_socket_multi" -> (cte +
      """SELECT upper(hex(k)) AS key_hex, upper(hex(v)) AS value_hex FROM src
        |WHERE k >= 'li_0000000100' AND k < 'li_0000000300' ORDER BY key_hex""".stripMargin),
    // the pushed (server-side) checksum must equal the scan-side digest
    // bit-for-bit, so its oracle is exactly q_checksum's SQL
    "q_kvbin_checksum" -> (cte + "," + crc64TabCte + ",\n" + crcRows("sgn", "src") + "\n" +
      """SELECT COALESCE(bit_xor(crc), 0) AS crc64_xor, count(*) AS total_kvs,
        |  CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS total_bytes
        |FROM sgn""".stripMargin),
    // a write-then-read roundtrip must be invisible to the checksum:
    // q_checksum's SQL verbatim
    "q_kvbin_write_roundtrip" -> (cte + "," + crc64TabCte + ",\n" + crcRows("sgn", "src") + "\n" +
      """SELECT COALESCE(bit_xor(crc), 0) AS crc64_xor, count(*) AS total_kvs,
        |  CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS total_bytes
        |FROM sgn""".stripMargin),
    // sharding across a two-store fleet is pure topology: the union of
    // the shards must carry q_checksum's digest verbatim, and both
    // stores must have served PUT frames (the routing pin)
    "q_kvbin_fleet_write" -> (cte + "," + crc64TabCte + ",\n" + crcRows("sgn", "src") + "\n" +
      """SELECT COALESCE(bit_xor(crc), 0) AS crc64_xor, count(*) AS total_kvs,
        |  CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS total_bytes,
        |  CAST(1 AS BOOLEAN) AS both_stores_served
        |FROM sgn""".stripMargin),
    // compaction must be invisible to content: the roundtrip checksum
    // triple plus the pinned target region count
    "q_kvbin_compact" -> (cte + "," + crc64TabCte + ",\n" + crcRows("sgn", "src") + "\n" +
      """SELECT COALESCE(bit_xor(crc), 0) AS crc64_xor, count(*) AS total_kvs,
        |  CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS total_bytes,
        |  CAST(4 AS BIGINT) AS n_regions
        |FROM sgn""".stripMargin),
    // data skipping is execution strategy only (region pruning + the
    // same spec-derived row filter) — the oracle is the plain
    // conjunctive range scan over the orders parquet the layout encodes
    "q_kvbin_skip" ->
      """SELECT upper(hex(printf('ok_%010d', o_orderkey))) AS key_hex,
        |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
        |  o_custkey AS cust
        |FROM orders
        |WHERE floor(o_totalprice / 1000) BETWEEN 100 AND 160
        |  AND o_custkey < 200
        |ORDER BY key_hex""".stripMargin,
    // and the over-the-wire verdict equals the in-engine verdict:
    // q_checksum_verdict's SQL verbatim
    "q_kvbin_verdict" -> (cte + "," + crc64TabCte + ",\n" +
      crcRows("ssg", "src") + ",\n" + crcRows("dsg", "dst") + "\n" +
      """SELECT s.c AS src_crc64_xor, s.n AS src_total_kvs, s.b AS src_total_bytes,
        |  d.c AS dst_crc64_xor, d.n AS dst_total_kvs, d.b AS dst_total_bytes,
        |  (s.c = d.c AND s.n = d.n AND s.b = d.b) AS matches
        |FROM (SELECT COALESCE(bit_xor(crc), 0) AS c, count(*) AS n,
        |        CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS b FROM ssg) s,
        |     (SELECT COALESCE(bit_xor(crc), 0) AS c, count(*) AS n,
        |        CAST(COALESCE(sum(length(k) + length(v)), 0) AS BIGINT) AS b FROM dsg) d""".stripMargin),
    "q_scan_dump" -> (cte +
      """SELECT upper(hex(k)) AS key_hex, upper(hex(v)) AS value_hex,
        |  ROW_NUMBER() OVER (ORDER BY k) AS cnt FROM src
        |WHERE k >= 'li_0000000001' AND k < 'li_0000000100' ORDER BY cnt""".stripMargin),
    // replays the planted-hazard derivation: if the writer→parser
    // roundtrip preserves every byte, the aggregate equals the mutated
    // documents aggregate
    "q_csv_ingest" ->
      """WITH d AS (SELECT lang,
        |    CASE WHEN doc_id % 10 = 3 THEN 'a,"b' || chr(10) || text
        |         WHEN doc_id % 10 = 4 THEN '  ' || text || '  '
        |         ELSE text END AS text
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q_orc_ingest" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,
    // replays q_binaryfile_ingest by reconstructing each blob string
    // from the synthesize derivation (ASCII header + 4x md5 payload) —
    // the 60-bit md5 sum gates every byte of every file's content
    "q_binaryfile_ingest" -> blobIngestOracleSql("n_files"),
    // q_multimodal_kvbin shares q_binaryfile_ingest's ORACLE (one def —
    // the two 'provably byte-identical' gates cannot drift apart): the
    // md5-XOR monoid gates that the kvbin write→read path delivers the
    // same bytes the per-file path does
    "q_multimodal_kvbin" -> blobIngestOracleSql("n_blobs"),
    // replays the fixture derivation instead of re-parsing files: lines
    // truncated at doc_id % 100 == 7 always fail the JSON parse (the
    // closing brace is among the five cut characters), so the corrupt
    // group is exactly that residue class and good groups are the rest
    "q_jsonl_ingest" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 100 <> 7 GROUP BY lang
        |UNION ALL
        |SELECT '~corrupt' AS lang, count(*) AS n_docs, 0 AS sum_chars
        |FROM documents WHERE doc_id % 100 = 7
        |ORDER BY lang""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_topk_window" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,
    // ---- sketch / approximate-aggregate family (Sketches.scala) ----
    // KMV: same salted 60-bit md5 hash, k smallest distinct, same
    // double-precision estimate arithmetic (IEEE ops on identical
    // integer inputs are bit-deterministic in both engines)
    "q_approx_distinct" ->
      s"""WITH h AS (SELECT DISTINCT ${duckHash60("'kmv_' || CAST(l_partkey AS VARCHAR)")} AS h
        |           FROM lineitem),
        |km AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |a AS (SELECT count(*) AS k_used, max(h) AS kth_hash FROM km),
        |x AS (SELECT count(DISTINCT l_partkey) AS exact_ndv FROM lineitem)
        |SELECT k_used, kth_hash,
        |  CASE WHEN k_used < 256 THEN k_used
        |       ELSE CAST(floor(255.0 * 1152921504606846976.0 / CAST(kth_hash AS DOUBLE)) AS BIGINT)
        |  END AS est_ndv,
        |  exact_ndv
        |FROM a CROSS JOIN x""".stripMargin,
    // KMV set ops: identical two-sketch merge, membership flags, and
    // IEEE estimate arithmetic ((k-1)·2^60 is an exact double literal;
    // the ρ·|union| product runs left-to-right in both engines)
    "q_kmv_setops" -> (cte +
      s""", ha AS (SELECT DISTINCT ${duckHash60("'kmv_' || k")} AS h FROM src),
        |hb AS (SELECT DISTINCT ${duckHash60("'kmv_' || k")} AS h FROM dst),
        |ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        |kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        |ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        |       ORDER BY h LIMIT 256),
        |f AS (SELECT u.h, a.h IS NOT NULL AS ia, b.h IS NOT NULL AS ib
        |      FROM ku u LEFT JOIN ka a ON u.h = a.h LEFT JOIN kb b ON u.h = b.h),
        |agg AS (SELECT count(*) AS k_used, max(h) AS kth_hash,
        |          CAST(sum(CASE WHEN ia AND ib THEN 1 ELSE 0 END) AS BIGINT) AS n_both
        |        FROM f),
        |e AS (SELECT k_used, n_both,
        |        CASE WHEN k_used < 256 THEN k_used
        |             ELSE CAST(floor(255.0 * 1152921504606846976.0 / CAST(kth_hash AS DOUBLE)) AS BIGINT)
        |        END AS est_union FROM agg),
        |xu AS (SELECT count(*) AS exact_union FROM
        |       (SELECT k FROM src UNION SELECT k FROM dst)),
        |xi AS (SELECT count(*) AS exact_intersect FROM
        |       (SELECT k FROM src INTERSECT SELECT k FROM dst))
        |SELECT k_used, n_both, est_union,
        |  CASE WHEN k_used < 256 THEN n_both
        |       ELSE CAST(floor(CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE)
        |              * CAST(est_union AS DOUBLE)) AS BIGINT)
        |  END AS est_intersect,
        |  exact_union, exact_intersect
        |FROM e CROSS JOIN xu CROSS JOIN xi""".stripMargin),
    // grouped KMV: same per-language k-min-distinct-hash construction
    "q_approx_distinct_by" ->
      s"""WITH toks AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT lang, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |tok AS (SELECT lang, unnest(s) AS t FROM sh),
        |h AS (SELECT DISTINCT lang, ${duckHash60("'kmv_' || t")} AS h FROM tok),
        |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h),
        |a AS (SELECT lang, count(*) AS k_used, max(h) AS kth_hash FROM r
        |      WHERE rn <= 64 GROUP BY lang),
        |x AS (SELECT lang, count(DISTINCT t) AS exact_ndv FROM tok GROUP BY lang)
        |SELECT a.lang, k_used, kth_hash,
        |  CASE WHEN k_used < 64 THEN k_used
        |       ELSE CAST(floor(63.0 * 1152921504606846976.0 / CAST(kth_hash AS DOUBLE)) AS BIGINT)
        |  END AS est_ndv,
        |  exact_ndv
        |FROM a JOIN x ON a.lang = x.lang ORDER BY a.lang""".stripMargin,
    // replays Sketches.hllNdvBy: same salted 60-bit hash, p=10 bucket
    // split, generated descending-threshold bit-length CASE (no float
    // log2), ρ capped at 30 so every 2^-ρ register term is exact in
    // DECIMAL(38,30); α·m² embedded as ONE Scala-computed double
    // literal on both sides; ln per the family recipe
    "q_hll_ndv" -> hllNdvOracleSql,
    "q_hll_overlap" -> hllOverlapOracleSql,
    "q_hll_overlap_sketch" -> hllOverlapOracle(withExact = false),
    // the bitmap route must equal the naive distinct — the gate IS the
    // optimization-equals-plain proof
    "q_bitmap_distinct" ->
      """SELECT event_type AS g, count(DISTINCT user_id) AS ndv
        |FROM events GROUP BY 1 ORDER BY g""".stripMargin,
    // persisted-and-merged sketches must equal the ONE-SHOT builds:
    // kvbin roundtrip + max-merge of the two waves' registers replays
    // the unpartitioned q_hll_ndv SQL; OR-merged block words replay the
    // plain count(DISTINCT) — the merge laws leave no seam to hide in
    "q_sketch_persist" -> hllNdvOracleSql,
    "q_bitmap_persist" ->
      """SELECT event_type AS g, count(DISTINCT user_id) AS ndv
        |FROM events GROUP BY 1 ORDER BY g""".stripMargin,
    // replays q_hist_quantile: the same 1024-bucket counters, running
    // counts over the counter table, positive-operand ceil rank target
    "q_hist_quantile" ->
      """WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events),
        |st AS (SELECT g, min(v) AS lo, max(v) AS hi FROM base GROUP BY 1),
        |cells AS (SELECT b.g,
        |    CASE WHEN st.hi > st.lo
        |         THEN least(1023, CAST(floor((b.v - st.lo) / (st.hi - st.lo) * 1024) AS BIGINT))
        |         ELSE 0 END AS bucket, count(*) AS cnt
        |  FROM base b JOIN st ON b.g = st.g GROUP BY 1, 2),
        |run AS (SELECT g, bucket, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS hi_rank,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bucket) - cnt AS lo_rank
        |  FROM cells),
        |nn AS (SELECT g, count(*) AS n FROM base GROUP BY 1)
        |SELECT r.g AS event_type, q.q_permille, nn.n, r.bucket,
        |  round(st.lo + r.bucket * ((st.hi - st.lo) / 1024), 9) AS est_lo,
        |  round(st.lo + (r.bucket + 1) * ((st.hi - st.lo) / 1024), 9) AS est_hi
        |FROM run r
        |JOIN nn ON r.g = nn.g JOIN st ON r.g = st.g
        |CROSS JOIN (VALUES (500), (950)) AS q(q_permille)
        |WHERE r.lo_rank < (q.q_permille * nn.n + 999) // 1000
        |  AND (q.q_permille * nn.n + 999) // 1000 <= r.hi_rank
        |ORDER BY event_type, q_permille""".stripMargin,
    // replays psiDrift: reference-pinned 16-bucket geometry with the
    // two-sided clamp, Laplace-smoothed shares, one double chain per
    // bucket rounded to 6 dp, DECIMAL term sum
    "q_psi_drift" -> psiOracleSql("user_id >= 50"),
    // the streaming twin scores state-store-summed live counters
    // through the identical stage; live slice = the bounded user band
    "q_stream_psi_drift" -> psiOracleSql("user_id >= 50 AND user_id < 100"),
    // the streaming decontamination gate must keep exactly the batch
    // filter's survivors over the fed slice: train docs (bounded band)
    // minus those containment-flagged >= 0.5 against the eval corpus
    "q_stream_decontam_gate" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
        |tr AS (SELECT doc_id AS train_id, t FROM tok
        |       WHERE doc_id % 10 <> 0 AND doc_id < 5000),
        |ev AS (SELECT doc_id AS eval_id, t FROM tok WHERE doc_id % 10 = 0),
        |esz AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1),
        |inter AS (SELECT train_id, eval_id, count(*) AS i
        |          FROM tr JOIN ev USING (t) GROUP BY 1, 2),
        |flagged AS (SELECT DISTINCT train_id FROM (
        |    SELECT train_id,
        |      round(CAST(i AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS containment
        |    FROM inter JOIN esz USING (eval_id))
        |  WHERE containment >= 0.5)
        |SELECT d.doc_id, md5(d.text) AS fp FROM documents d
        |WHERE d.doc_id % 10 <> 0 AND d.doc_id < 5000
        |  AND d.doc_id NOT IN (SELECT train_id FROM flagged)
        |ORDER BY d.doc_id""".stripMargin,
    // streaming NB scoring must equal the batch scorer over the fed
    // slice — same model SQL, streaming output shape (no actual col)
    "q_stream_nb_classify" -> nbOracleSql(" AND doc_id < 5000",
      """SELECT doc_id, pred, CAST(score AS DOUBLE) AS score FROM best
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin),
    // replays q_kll_quantile: same 60-bit md5 row hash, slot = h % k,
    // per-slot minimum (hash, value) row, sample order statistic at the
    // positive-operand ceil rank
    "q_kll_quantile" -> slotSampleOracleSql(""),
    // persisted-and-merged quantile registers ARE the one-shot build
    // (min-fold identity through the bit-plane roundtrip) — the oracle
    // is the identical plain replay
    "q_kll_persist" -> slotSampleOracleSql(""),
    // the streaming register merge must fold to the identical sample:
    // the batch SQL over the fed slice
    "q_stream_kll_quantile" -> slotSampleOracleSql("WHERE user_id < 50"),
    // the streaming register merge must be invisible to the estimate:
    // q_hll_ndv's SQL verbatim
    "q_stream_hll" -> hllNdvOracleSql,
    // exact distinct over the bounded user slice — the word state in
    // the store must reproduce the batch distinct bit for bit
    "q_stream_bitmap_distinct" ->
      """SELECT event_type AS g, count(DISTINCT user_id) AS ndv
        |FROM events WHERE user_id < 50 GROUP BY 1 ORDER BY g""".stripMargin,
    // and the streaming decayed-count fold likewise replays the batch
    // operator's SQL
    "q_stream_decay" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |mx AS (SELECT max(day) AS mxday FROM e)
        |SELECT event_type, count(*) AS n_events, max(day) AS last_day,
        |  CAST(sum(CAST(1 AS BIGINT) << CAST(20 - least(mxday - day, 20) AS INTEGER)) AS BIGINT) AS score
        |FROM e CROSS JOIN mx
        |GROUP BY event_type
        |ORDER BY score DESC, event_type""".stripMargin,
    // the streaming OLS fold replays the batch q_linear_trend SQL on
    // the bounded user slice (committed oracle = scale-1 bounds)
    "q_stream_trend" ->
      """WITH pts AS (SELECT event_type,
        |    epoch_us(ts) // 1000000 - 1704067200 AS x,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS yq
        |  FROM events WHERE user_id < 100),
        |s AS (SELECT event_type, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(CAST(yq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
        |    CAST(sum(CAST(x AS DECIMAL(38,0)) * yq) AS DECIMAL(38,0)) AS sxy,
        |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
        |  FROM pts GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
        |  CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den,
        |  CAST(sy * sxx - sx * sxy AS VARCHAR) AS icept_num
        |FROM s ORDER BY event_type""".stripMargin,
    // count-min: identical d=4 salted bucket hashes; sketch cells are
    // integer counts; estimate = min over the item's 4 cells
    "q_heavy_hitters" -> cmsHeavyOracleSql,
    // persisted-and-summed CMS grids must equal the one-shot sketch:
    // counts are additive over any partition of the rows, so the
    // merged grid prices heavy hitters through the identical SQL
    "q_cms_persist" -> cmsHeavyOracleSql,
    // Bloom pre-filter is execution strategy only (zero false
    // negatives; positives die in the join) — the oracle is the plain
    // fact-dim join the operator must exactly reproduce
    "q_bloom_join" ->
      """SELECT s_suppkey, s_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 0
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,
    // priority sampling: cents weight, 20-bit quantized uniform from
    // the salted md5 hash, integer floor division — ties break on key
    "q_priority_sample" ->
      s"""WITH w AS (SELECT o_orderkey,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w FROM orders),
        |h AS (SELECT o_orderkey, w,
        |        ${duckHash60("'ps_' || CAST(o_orderkey AS VARCHAR)")} AS h FROM w)
        |SELECT o_orderkey, w,
        |  (w * 1048576) // ((h // 1099511627776) + 1) AS priority
        |FROM h ORDER BY priority DESC, o_orderkey LIMIT 50""".stripMargin,
    // grouped priority sampling replayed as the plain per-group rank —
    // the two-phase heap reduction must be invisible
    "q_priority_sample_by" ->
      s"""WITH w AS (SELECT c_mktsegment AS segment, o_orderkey,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w
        |       FROM orders JOIN customer ON o_custkey = c_custkey),
        |h AS (SELECT segment, o_orderkey, w,
        |        (w * 1048576) // ((${duckHash60("'ps_' || CAST(o_orderkey AS VARCHAR)")} // 1099511627776) + 1) AS priority
        |      FROM w),
        |r AS (SELECT *, CAST(row_number() OVER
        |        (PARTITION BY segment ORDER BY priority DESC, o_orderkey) AS INT) AS rk
        |      FROM h)
        |SELECT segment, o_orderkey, w, priority, rk FROM r WHERE rk <= 20
        |ORDER BY segment, rk""".stripMargin,
    // integer PageRank, 3 unrolled iterations: micro-unit ranks,
    // contribution = rank // degree, damping in integer arithmetic —
    // bit-equal to the engine's loop regardless of summation order
    // replays Graph.labelPropagation: symmetrized distinct edges over
    // the >=3-co-occurrence cust↔supp pairs, 3 unrolled synchronous
    // rounds of (neighbor-label count → argmax by (c DESC, label))
    "q_communities" -> {
      val rounds = (1 to 3).map { r =>
        s"""n$r AS (SELECT u.src AS v, l.label, count(*) AS c
           |      FROM und u JOIN l${r - 1} l ON u.dst = l.v GROUP BY 1, 2),
           |l$r AS (SELECT v, label FROM (
           |      SELECT *, row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS r FROM n$r) WHERE r = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT o_custkey*2 AS src, l_suppkey*2+1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |und AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)),
        |l0 AS (SELECT src AS v, src AS label FROM (SELECT DISTINCT src FROM und)),
        |$rounds
        |SELECT v, label FROM l3 ORDER BY v""".stripMargin
    },
    "q_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM e0
        |      UNION ALL SELECT b AS src, a AS dst FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
        |r1 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r.rank // d.deg)) // 100 AS BIGINT) AS rank
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r.rank // d.deg)) // 100 AS BIGINT) AS rank
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r.rank // d.deg)) // 100 AS BIGINT) AS rank
        |       FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst)
        |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
        |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
        |  rank
        |FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin,
    // replays Graph.personalizedPageRank: seed-only teleport (flat
    // 150000/seed/round), contribution rounds unrolled, all integer
    "q_pagerank_personal" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM e0
        |      UNION ALL SELECT b AS src, a AS dst FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 2 = 0 ORDER BY src LIMIT 3),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM seeds),
        |c1 AS (SELECT e.dst AS node, (85 * sum(r.rank // d.deg)) // 100 AS p
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r1 AS (SELECT node, CAST(sum(p) AS BIGINT) AS rank FROM
        |       (SELECT * FROM c1 UNION ALL SELECT node, 150000 AS p FROM seeds) GROUP BY node),
        |c2 AS (SELECT e.dst AS node, (85 * sum(r.rank // d.deg)) // 100 AS p
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r2 AS (SELECT node, CAST(sum(p) AS BIGINT) AS rank FROM
        |       (SELECT * FROM c2 UNION ALL SELECT node, 150000 AS p FROM seeds) GROUP BY node),
        |c3 AS (SELECT e.dst AS node, (85 * sum(r.rank // d.deg)) // 100 AS p
        |       FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r3 AS (SELECT node, CAST(sum(p) AS BIGINT) AS rank FROM
        |       (SELECT * FROM c3 UNION ALL SELECT node, 150000 AS p FROM seeds) GROUP BY node)
        |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
        |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node, rank
        |FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin,
    // the dangling-redistribution round replayed exactly: per round,
    // dm = Σ rank over out-degree-0 nodes, every node gets
    // 0.15·1e6 + 0.85·(Σ contrib + dm // |V|) — all integer, bit-equal
    "q_pagerank_dangling" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM e0),
        |nodes AS (SELECT DISTINCT node FROM
        |          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |nv AS (SELECT count(*) AS cnt FROM nodes),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |dm0 AS (SELECT coalesce(sum(r.rank), 0) AS dm FROM r0 r
        |        LEFT JOIN deg d ON r.node = d.src WHERE d.src IS NULL),
        |c0 AS (SELECT e.dst AS node, sum(r.rank // d.deg) AS s
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.node, CAST(150000 + (85 * (coalesce(c.s, 0) + dm.dm // nv.cnt)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c0 c ON n.node = c.node, dm0 dm, nv),
        |dm1 AS (SELECT coalesce(sum(r.rank), 0) AS dm FROM r1 r
        |        LEFT JOIN deg d ON r.node = d.src WHERE d.src IS NULL),
        |c1 AS (SELECT e.dst AS node, sum(r.rank // d.deg) AS s
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.node, CAST(150000 + (85 * (coalesce(c.s, 0) + dm.dm // nv.cnt)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c1 c ON n.node = c.node, dm1 dm, nv),
        |dm2 AS (SELECT coalesce(sum(r.rank), 0) AS dm FROM r2 r
        |        LEFT JOIN deg d ON r.node = d.src WHERE d.src IS NULL),
        |c2 AS (SELECT e.dst AS node, sum(r.rank // d.deg) AS s
        |       FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.node, CAST(150000 + (85 * (coalesce(c.s, 0) + dm.dm // nv.cnt)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c2 c ON n.node = c.node, dm2 dm, nv)
        |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
        |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
        |  rank
        |FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin,
    // triangle listing replayed as the naive canonical triple join —
    // tractable for the oracle because the support threshold already
    // thinned the edge set; the engine's degree-ordered plan enumerates
    // the identical set
    "q_triangles" ->
      """WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT l1.l_orderkey) >= 2)
        |SELECT e1.a, e1.b, e2.b AS c
        |FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_itemsets" ->
      """WITH gi AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
        |tri AS (SELECT a.i AS x, b.i AS y, c.i AS z, count(*) AS support
        |        FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i
        |                  JOIN gi c ON b.g = c.g AND b.i < c.i
        |        GROUP BY 1, 2, 3 HAVING count(*) >= 2)
        |SELECT x, y, z, support FROM tri ORDER BY x, y, z""".stripMargin,
    // the peel replayed round-for-round: each round keeps vertices of
    // degree >= 2 in the surviving edge set, then the edges both of
    // whose endpoints survived. Every CTE is MATERIALIZED: each round
    // references its predecessor 5 times, and DuckDB's default CTE
    // inlining would re-evaluate e0's self-join 5^rounds times — the
    // oracle-side mirror of the lineage blowup the engine severs with
    // per-round localCheckpoint
    "q_kcore" -> {
      val rounds = (1 to 5).map { r =>
        s"""k$r AS MATERIALIZED (SELECT n FROM (SELECT a AS n FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
           |     GROUP BY n HAVING count(*) >= 2),
           |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
           |     WHERE a IN (SELECT n FROM k$r) AND b IN (SELECT n FROM k$r))""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (SELECT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT l1.l_orderkey) >= 2),
        |$rounds
        |SELECT n, count(*) AS deg
        |FROM (SELECT a AS n FROM e5 UNION ALL SELECT b FROM e5)
        |GROUP BY n ORDER BY n""".stripMargin
    },
    "q_argmax" ->
      """SELECT event_type,
        |  mx.v AS max_value, mx.id AS max_event_id,
        |  mn.v AS min_value, mn.id AS min_event_id
        |FROM (SELECT event_type,
        |        max(struct_pack(v := value, id := event_id)) AS mx,
        |        min(struct_pack(v := value, id := event_id)) AS mn
        |      FROM events GROUP BY 1)
        |ORDER BY event_type""".stripMargin,
    // discrete P05/P95 bounds at ranks ⌈pct·n/100⌉, then the clamp
    "q_winsorize" ->
      """WITH base AS (SELECT event_type AS g, value AS v, event_id AS id FROM events),
        |n AS (SELECT g, count(*) AS n_events FROM base GROUP BY g),
        |rv AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, id) AS r
        |       FROM base),
        |lo AS (SELECT rv.g, v AS p_lo FROM rv JOIN n USING (g)
        |       WHERE r = (5 * n_events + 99) // 100),
        |hi AS (SELECT rv.g, v AS p_hi FROM rv JOIN n USING (g)
        |       WHERE r = (95 * n_events + 99) // 100)
        |SELECT base.g AS event_type, n_events, p_lo, p_hi,
        |  CAST(sum(CASE WHEN v < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
        |  CAST(sum(CASE WHEN v > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
        |  CAST(sum(CAST(greatest(least(v, p_hi), p_lo) AS DECIMAL(20,6))) AS DOUBLE) AS winsor_sum
        |FROM base JOIN lo USING (g) JOIN hi USING (g) JOIN n USING (g)
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    // the discrete-median peel replayed: rank ⌈n/2⌉ in (value, id)
    // order, then the same rank over absolute deviations
    "q_mad_outliers" ->
      """WITH base AS (SELECT event_type AS g, value AS v, event_id AS id FROM events),
        |n AS (SELECT g, count(*) AS n_events FROM base GROUP BY g),
        |rv AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, id) AS r
        |       FROM base),
        |med AS (SELECT rv.g, v AS med FROM rv JOIN n USING (g)
        |        WHERE r = (n_events + 1) // 2),
        |dev AS (SELECT base.g, id, abs(v - med) AS d FROM base JOIN med USING (g)),
        |rd AS (SELECT g, d, row_number() OVER (PARTITION BY g ORDER BY d, id) AS r
        |       FROM dev),
        |mad AS (SELECT rd.g, d AS mad FROM rd JOIN n USING (g)
        |        WHERE r = (n_events + 1) // 2)
        |SELECT dev.g AS event_type, n_events, med, mad,
        |  CAST(sum(CASE WHEN d > 3 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (g) JOIN med USING (g) JOIN n USING (g)
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, event_type, epoch_us(ts) AS ts_us, value,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) AS rolling_1h,
        |  count(*) OVER w AS n_1h
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_event_transitions" ->
      """WITH t AS (SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type, count(*) AS n FROM t
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        |FROM c ORDER BY prev_type, event_type""".stripMargin,
    "q_event_seq" ->
      """SELECT user_id, count(*) AS n_events,
        |  string_agg(event_type, '|' ORDER BY epoch_us(ts), event_id) AS seq
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n,
        |  GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_semi_anti" ->
      """WITH d AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT c_nationkey,
        |  count(CASE WHEN d.o_custkey IS NOT NULL THEN 1 END) AS n_with,
        |  count(CASE WHEN d.o_custkey IS NULL THEN 1 END) AS n_without
        |FROM customer LEFT JOIN d ON c_custkey = o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
        |    count(*) AS n_events,
        |    sum(CAST(value AS DECIMAL(20,6))) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hr) AS mn, max(hr) AS mx FROM hourly),
        |spine AS (
        |  SELECT t.event_type, g.hr
        |  FROM (SELECT DISTINCT event_type FROM hourly) t
        |  CROSS JOIN (SELECT unnest(generate_series((SELECT mn FROM b),
        |                                            (SELECT mx FROM b))) AS hr) g)
        |SELECT s.event_type, s.hr,
        |  coalesce(h.n_events, 0) AS n_events,
        |  CAST(coalesce(
        |    last_value(h.sum_value IGNORE NULLS) OVER (
        |      PARTITION BY s.event_type ORDER BY s.hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    0) AS DOUBLE) AS filled_sum
        |FROM spine s LEFT JOIN hourly h
        |  ON s.event_type = h.event_type AND s.hr = h.hr
        |ORDER BY s.event_type, s.hr""".stripMargin,
    "q_retention" ->
      """WITH weekly AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM weekly GROUP BY 1)
        |SELECT c.cohort_wk AS cohort_week, w.wk - c.cohort_wk AS week_offset,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM weekly w JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "q_dedup_canonical" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^\p{L}\p{N} ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp,
        |  min(doc_id) AS keep_doc_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    // replays the (lang, length-bucket, simhash-chunk) blocking exactly:
    // pairs oriented shorter-first (len, doc_id), the longer side's
    // bucket within radius 2 (= ceil(maxAbsDist 64 / bucketWidth 32)),
    // one exact 15-bit chunk agreement of the 60-bit md5 simhash
    "q_edit_neardup" -> (simhashSigCte +
      """, chunks AS (SELECT doc_id, c, (simhash >> (c * 15)) & 32767 AS chunk
        |            FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c)),
        |d AS (SELECT doc_id, text, lang, length(text) AS len,
        |    length(text) // 32 AS b FROM documents),
        |dc AS (SELECT d.*, ch.c, ch.chunk FROM d JOIN chunks ch USING (doc_id)),
        |cand AS (
        |  SELECT DISTINCT least(d1.doc_id, d2.doc_id) AS doc_a,
        |    greatest(d1.doc_id, d2.doc_id) AS doc_b,
        |    d1.text AS t1, d2.text AS t2,
        |    greatest(d1.len, d2.len) * 100 AS budget
        |  FROM dc d1 JOIN dc d2 ON d1.lang = d2.lang
        |    AND d1.c = d2.c AND d1.chunk = d2.chunk
        |    AND d2.b BETWEEN d1.b AND d1.b + 2
        |    AND (d1.len < d2.len OR (d1.len = d2.len AND d1.doc_id < d2.doc_id)))
        |SELECT doc_a, doc_b, levenshtein(t1, t2) AS dist FROM cand
        |WHERE levenshtein(t1, t2) * 1000 <= budget AND levenshtein(t1, t2) <= 64
        |ORDER BY doc_a, doc_b""".stripMargin),
    // brute force ON PURPOSE: the engine side prunes with the q-gram
    // prefix index, the oracle replays the plain quadratic definition —
    // the comparison is the exact-recall proof (same-lang pairs only;
    // the length-gap prefilter is implied by dist <= 64, not a prune)
    "q_edit_neardup_prefix" ->
      """WITH d AS (SELECT doc_id, text, lang, length(text) AS len FROM documents),
        |cand AS (
        |  SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
        |    levenshtein(d1.text, d2.text) AS dist,
        |    greatest(d1.len, d2.len) * 50 AS budget
        |  FROM d d1 JOIN d d2 ON d1.lang = d2.lang AND d1.doc_id < d2.doc_id
        |    AND abs(d1.len - d2.len) <= 64)
        |SELECT doc_a, doc_b, dist FROM cand
        |WHERE dist <= 64 AND dist * 1000 <= budget
        |ORDER BY doc_a, doc_b""".stripMargin,
    // state at cutoff = src with the seq<=5 slice of the changelog
    // applied: updates take dst's value, applied deletes drop, applied
    // inserts appear; everything else stays src
    "q_time_travel" -> (cte +
      s""", df AS (SELECT coalesce(s.k, d.k) AS key, s.v AS sv, d.v AS dv,
        |    CASE WHEN s.k IS NULL THEN 'dst_only'
        |         WHEN d.k IS NULL THEN 'src_only'
        |         ELSE 'mismatch' END AS diff_class
        |  FROM src s FULL OUTER JOIN dst d ON s.k = d.k
        |  WHERE s.k IS NULL OR d.k IS NULL OR s.v <> d.v),
        |app AS (SELECT key, diff_class, dv, ${duckHash60("key")} % 10 + 1 AS seq FROM df),
        |applied AS (SELECT * FROM app WHERE seq <= 5),
        |state AS (
        |  SELECT s.k AS key, coalesce(a.dv, s.v) AS value
        |  FROM src s LEFT JOIN applied a ON s.k = a.key
        |  WHERE a.key IS NULL OR a.diff_class <> 'src_only'
        |  UNION ALL
        |  SELECT key, dv FROM applied WHERE diff_class = 'dst_only')
        |SELECT substr(key, 1, 10) AS bucket, count(*) AS n,
        |  CAST(sum(length(value)) AS BIGINT) AS bytes
        |FROM state GROUP BY 1 ORDER BY bucket""".stripMargin),
    // the maintained summary must equal the direct dst aggregate
    "q_ivm_agg" -> (cte +
      """SELECT substr(k, 1, 10) AS bucket, count(*) AS n,
        |  CAST(sum(length(v)) AS BIGINT) AS bytes
        |FROM dst GROUP BY 1 ORDER BY bucket""".stripMargin),
    "q_bpe_merges" -> bpeOracleSql(3),
    "q_bpe_compress" -> bpeOracleSql(3, compress = true),
    "q_chunk_windows" ->
      """WITH d AS (SELECT doc_id, text,
        |    1 + (greatest(length(text) - 200, 0) + 149) // 150 AS nw
        |  FROM documents),
        |e AS (SELECT doc_id, text,
        |    unnest(generate_series(0, nw - 1)) AS chunk_idx FROM d)
        |SELECT doc_id, chunk_idx,
        |  length(substr(text, chunk_idx * 150 + 1, 200)) AS chunk_len,
        |  md5(substr(text, chunk_idx * 150 + 1, 200)) AS fp
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_ship_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |       AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    // q_ivm_join's gate IS the delta-rule identity: the oracle joins the
    // NEW relations directly; the engine must reach the same view from
    // V_old + the two delta joins
    "q_ivm_join" ->
      """WITH r_new AS (
        |  SELECT o_custkey AS k, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |      * CASE WHEN o_orderkey % 97 = 2 THEN 2 ELSE 1 END AS price_c
        |  FROM orders WHERE o_orderkey % 97 <> 1),
        |s_new AS (SELECT c_custkey AS k, c_nationkey FROM customer
        |          WHERE c_custkey % 89 <> 3)
        |SELECT r.k, o_orderkey, price_c, c_nationkey, CAST(1 AS BIGINT) AS n
        |FROM r_new r JOIN s_new s ON r.k = s.k
        |ORDER BY o_orderkey""".stripMargin,
    "q_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
        |  FROM lineitem GROUP BY 1 HAVING sq > 250)
        |SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  o_totalprice, CAST(sq AS DOUBLE) AS sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_promo_share" ->
      """WITH r AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |         (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |         10000 AS BIGINT) AS rev_e4,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT ship_month,
        |  CAST((CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS HUGEINT)
        |        * 1000000) // sum(rev_e4) AS BIGINT) AS promo_ppm,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS DOUBLE) / 10000 AS promo_rev,
        |  CAST(sum(rev_e4) AS DOUBLE) / 10000 AS total_rev
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cold_customers" ->
      """WITH bal AS (SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_c
        |  FROM customer),
        |thr AS (SELECT sum(bal_c) // count(*) AS t FROM bal WHERE bal_c > 0),
        |recent AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= '2000-09-01'),
        |cold AS (SELECT b.* FROM bal b, thr WHERE b.bal_c > thr.t
        |         AND NOT EXISTS (SELECT 1 FROM recent r
        |                         WHERE r.o_custkey = b.c_custkey))
        |SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(sum(bal_c) AS DOUBLE) / 100 AS total_bal
        |FROM cold GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_blocking_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l1.l_orderkey
        |                AND o.o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    // replays q_regional_revenue: the Q5 chain with the shared-nation
    // predicate on the customer join, 4-dp integer revenue
    "q_regional_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |      (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |      10000 AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // replays q_rev_forecast: the Q6 scan-only aggregate, discount band
    // compared in DECIMAL(4,2)
    "q_rev_forecast" ->
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |      CAST(l_discount AS DECIMAL(4,2)) * 10000 AS BIGINT)) AS DOUBLE)
        |    / 10000 AS forecast_rev
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND CAST(l_discount AS DECIMAL(4,2))
        |      BETWEEN CAST(0.03 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
        |  AND l_quantity < 24""".stripMargin,
    // replays q_market_share: the Q8 chain, share as a 128-bit-exact
    // integer ppm division (HUGEINT ↔ DECIMAL(38,0))
    "q_market_share" ->
      """WITH r AS (SELECT year(o_orderdate) AS o_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |         (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |         10000 AS BIGINT) AS rev_e4,
        |    sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA')
        |SELECT o_year,
        |  CAST((CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_e4 ELSE 0 END)
        |        AS HUGEINT) * 1000000) // sum(rev_e4) AS BIGINT) AS share_ppm,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_e4 ELSE 0 END)
        |       AS DOUBLE) / 10000 AS nation_rev,
        |  CAST(sum(rev_e4) AS DOUBLE) / 10000 AS market_rev
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // replays q_returned_items: the Q10 chain, returnflag pushed to the
    // lineitem scan and the quarter to the orders scan
    "q_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |      (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |      10000 AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY c_custkey""".stripMargin,
    // replays q_profit: the Q9 chain with the retail-cost proxy, every
    // term exact 4-dp integers
    "q_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |        10000 AS BIGINT)
        |    - CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 10000 AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 10000 AS profit,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // replays q_priority_class: the Q12 two-way CASE split over
    // late-shipped lines
    "q_priority_class" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // replays q_excess_parts: the Q20 decorrelation — the part-total
    // scalar subquery re-aggregated from the pair table, the half gate
    // an exact integer cross-multiply
    "q_excess_parts" ->
      """WITH pair AS (SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS BIGINT)) AS sq
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  GROUP BY 1, 2),
        |tot AS (SELECT l_partkey AS tp, sum(sq) AS tq, count(*) AS n_supp
        |        FROM pair GROUP BY 1),
        |dom AS (SELECT l_suppkey, count(*) AS n_dominated,
        |    CAST(sum(sq) AS BIGINT) AS qty_dominated
        |  FROM pair JOIN tot ON l_partkey = tp
        |  WHERE n_supp > 1 AND sq * 2 > tq
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name, n_dominated, qty_dominated
        |FROM supplier
        |JOIN dom ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "q_above_avg" ->
      """WITH p AS (SELECT p_brand, p_partkey,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM part),
        |c AS (SELECT p_brand, count(*) AS n, sum(cents) AS sc
        |      FROM p GROUP BY 1)
        |SELECT p.p_brand, p.p_partkey, p.cents
        |FROM p JOIN c ON p.p_brand = c.p_brand
        |WHERE p.cents * c.n * 100 > c.sc * 101
        |ORDER BY p.p_brand, p.p_partkey""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc
        |FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w)
        |ORDER BY l_returnflag, metric""".stripMargin
  )


  /** q_hll_ndv's oracle (shared verbatim by q_stream_hll — the
    * streaming register merge must be invisible to the estimate). */
  /** The ONE replay of the deterministic IVF pipeline (label
    * codebook from DECIMAL(27,15)-exact means, 9-dp cosine, nprobe=2,
    * k=3), shared by q_ann_ivf and q_ann_ivf_persist — the persisted
    * codebook roundtrips bit-exactly, so both gates replay one SQL. */
  private lazy val annIvfOracleSql: String =
    """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |px AS (SELECT vec_id, label, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM e),
        |cm AS (SELECT label AS cluster_id, pos,
        |         CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS m
        |       FROM px GROUP BY label, pos),
        |cent AS (SELECT cluster_id, list(m ORDER BY pos) AS cvec FROM cm GROUP BY cluster_id),
        |asg0 AS (SELECT e.vec_id, e.v, c.cluster_id,
        |           round(list_dot_product(e.v, c.cvec)
        |             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
        |         FROM e CROSS JOIN cent c),
        |asg AS (SELECT vec_id, v, cluster_id FROM (
        |          SELECT *, row_number() OVER (PARTITION BY vec_id
        |            ORDER BY csim DESC, cluster_id) AS r FROM asg0) WHERE r = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
        |      FROM e WHERE vec_id < 10),
        |pr0 AS (SELECT q.query_id, q.qv, q.qn, c.cluster_id,
        |          round(list_dot_product(q.qv, c.cvec)
        |            / (q.qn * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
        |        FROM q CROSS JOIN cent c),
        |pr AS (SELECT query_id, qv, qn, cluster_id FROM (
        |         SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY csim DESC, cluster_id) AS r FROM pr0) WHERE r <= 2),
        |sc AS (SELECT p.query_id, a.vec_id,
        |         round(list_dot_product(p.qv, a.v)
        |           / (p.qn * sqrt(list_dot_product(a.v, a.v))), 9) AS sim
        |       FROM pr p JOIN asg a ON p.cluster_id = a.cluster_id AND p.query_id <> a.vec_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |             ORDER BY sim DESC, vec_id) AS rank FROM sc)
        |SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin

  /** The shared curve CTEs behind q_ann_recall and q_ann_nprobe_curve:
    * exact brute top-3 on the capped query slice, the label codebook +
    * assignment of annIvfOracleSql, every (query, vec) scored pair
    * tagged with its probe rank (the query's rank of the vec's unique
    * cluster), the per-depth top-3 (ivfk), and the per-depth hit-count
    * curve — the bit-exact replay of Similarity.nprobeRecallCurve.
    * Ends at `curve(nprobe, n_hit, n_total)`. */
  private lazy val annNprobeCurveCte: String =
    """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    round(list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 9) AS sim
        |  FROM (SELECT * FROM e WHERE vec_id < 10) q JOIN e c ON q.vec_id <> c.vec_id),
        |exact_rk AS (SELECT query_id, vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM scored)
        |  WHERE rank <= 3),
        |px AS (SELECT vec_id, label, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM e),
        |cm AS (SELECT label AS cluster_id, pos,
        |         CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS m
        |       FROM px GROUP BY label, pos),
        |cent AS (SELECT cluster_id, list(m ORDER BY pos) AS cvec FROM cm GROUP BY cluster_id),
        |asg0 AS (SELECT e.vec_id, e.v, c.cluster_id,
        |           round(list_dot_product(e.v, c.cvec)
        |             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
        |         FROM e CROSS JOIN cent c),
        |asg AS (SELECT vec_id, v, cluster_id FROM (
        |          SELECT *, row_number() OVER (PARTITION BY vec_id
        |            ORDER BY csim DESC, cluster_id) AS r FROM asg0) WHERE r = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
        |      FROM e WHERE vec_id < 10),
        |pr0 AS (SELECT q.query_id, q.qv, q.qn, c.cluster_id,
        |          round(list_dot_product(q.qv, c.cvec)
        |            / (q.qn * sqrt(list_dot_product(c.cvec, c.cvec))), 9) AS csim
        |        FROM q CROSS JOIN cent c),
        |prr AS (SELECT query_id, qv, qn, cluster_id,
        |          row_number() OVER (PARTITION BY query_id
        |            ORDER BY csim DESC, cluster_id) AS pr
        |        FROM pr0),
        |scall AS (SELECT p.query_id, a.vec_id, p.pr,
        |            round(list_dot_product(p.qv, a.v)
        |              / (p.qn * sqrt(list_dot_product(a.v, a.v))), 9) AS sim
        |          FROM prr p JOIN asg a ON p.cluster_id = a.cluster_id AND p.query_id <> a.vec_id),
        |nps AS (SELECT np FROM (SELECT unnest(generate_series(1, 4096)) AS np)
        |        WHERE np <= (SELECT count(*) FROM cent)),
        |ivfk AS (SELECT np, query_id, vec_id FROM (
        |           SELECT n.np, s.query_id, s.vec_id,
        |             row_number() OVER (PARTITION BY n.np, s.query_id
        |               ORDER BY s.sim DESC, s.vec_id) AS rank
        |           FROM nps n JOIN scall s ON s.pr <= n.np)
        |         WHERE rank <= 3),
        |curve AS (SELECT n.np AS nprobe,
        |            CAST(sum(CASE WHEN iv.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |            CAST(count(*) AS BIGINT) AS n_total
        |          FROM nps n CROSS JOIN exact_rk ex
        |          LEFT JOIN ivfk iv ON iv.np = n.np
        |            AND ex.query_id = iv.query_id AND ex.vec_id = iv.vec_id
        |          GROUP BY n.np)""".stripMargin

  /** The ONE replay of the CMS heavy-hitter estimate (d=4 × w=1024,
    * per-doc-distinct trigram shingles), shared by q_heavy_hitters and
    * q_cms_persist — the persisted/merged grid is the one-shot grid by
    * count additivity, so both gates replay identical SQL. */
  private lazy val cmsHeavyOracleSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         generate_series(1, greatest(len(w)-2, 1)),
      |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
      |it AS (SELECT unnest(s) AS item FROM sh),
      |cnt AS (SELECT item, count(*) AS c FROM it GROUP BY item),
      |hb AS (SELECT item, j,
      |         ${duckHash60("'cms' || j || '_' || item")} % 1024 AS bucket
      |       FROM cnt CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)),
      |cms AS (SELECT j, bucket, CAST(sum(c) AS BIGINT) AS cnt
      |        FROM hb JOIN cnt USING (item) GROUP BY j, bucket),
      |topk AS (SELECT item, c AS exact_cnt FROM cnt
      |         ORDER BY c DESC, item LIMIT 20)
      |SELECT item, exact_cnt, min(cnt) AS cms_est
      |FROM topk JOIN hb USING (item) JOIN cms USING (j, bucket)
      |GROUP BY item, exact_cnt ORDER BY exact_cnt DESC, item""".stripMargin

  private lazy val hllNdvOracleSql: String = {
      val m = 1024
      val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
      val bitCase = "CASE " + (50 to 1 by -1)
        .map(b => s"WHEN (h>>10) >= ${1L << (b - 1)} THEN $b")
        .mkString(" ") + " ELSE 0 END"
      s"""WITH toks AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT lang, list_distinct(list_transform(
        |         generate_series(1, greatest(len(w)-2, 1)),
        |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
        |tok AS (SELECT lang, unnest(s) AS t FROM sh),
        |h AS (SELECT lang, ${duckHash60("'hll:' || t")} AS h FROM tok),
        |r AS (SELECT lang, h & 1023 AS bucket, least(30, 51 - $bitCase) AS rho FROM h),
        |regs AS (SELECT lang, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
        |a AS (SELECT lang, count(*) AS n_buckets_used, CAST(sum(mj) AS BIGINT) AS sum_rho,
        |        sum(CAST(pow(0.5, mj) AS DECIMAL(38,30))) AS s_used
        |      FROM regs GROUP BY lang),
        |b AS (SELECT lang, n_buckets_used, sum_rho,
        |        CAST(s_used + CAST(1024 - n_buckets_used AS DECIMAL(38,30)) AS DOUBLE) AS s,
        |        1024 - n_buckets_used AS v
        |      FROM a),
        |x AS (SELECT lang, count(DISTINCT t) AS exact_ndv FROM tok GROUP BY lang)
        |SELECT b.lang, n_buckets_used, sum_rho,
        |  round(CASE WHEN $alphaM2 / s <= 2560.0 AND v > 0
        |    THEN 1024.0 * ln(1024.0 / v) ELSE $alphaM2 / s END, 6) AS est_ndv,
        |  exact_ndv
        |FROM b JOIN x ON b.lang = x.lang ORDER BY b.lang""".stripMargin
  }
  /** The ONE oracle replay of
    * [[graft.operators.TextAnalysis.verifiedBlocklistMatches]] (plain
    * position × phrase, overlapping starts counted), shared by
    * q_blocklist and q_blocklist_phrases — ends with ph(p, l) and
    * m(doc_id, p) in scope. */
  private lazy val blocklistMatchCte: String = blocklistMatchCteBounded("TRUE")

  /** [[blocklistMatchCte]] over a bounded doc slice — the streaming
    * twin's oracle replays its feed cap here instead of borrowing the
    * unbounded batch SQL. */
  private def blocklistMatchCteBounded(where: String): String = {
    val vals = blocklistPhrases
      .map(p => s"('${p}', ${p.split(" ").length})").mkString(", ")
    s"""WITH ph(p, l) AS (VALUES $vals),
      |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE $where),
      |pos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w),
      |m AS (SELECT doc_id, p FROM pos JOIN ph ON i + l - 1 <= len(ws)
      |        AND array_to_string(ws[i:i+l-1], ' ') = p)""".stripMargin
  }

  /** Replays [[graft.operators.Sketches.hllOverlap]] over the q_hll_ndv
    * token derivation: per-lang registers, pair union by register max,
    * the shared estimate arithmetic, inclusion–exclusion as the RAW
    * IEEE difference of the 6-dp estimates (no re-round), exact twin
    * from a distinct-pair token join. */
  private lazy val hllOverlapOracleSql: String = hllOverlapOracle(withExact = true)

  /** The register-only sibling — q_hll_overlap_sketch replays the same
    * construction minus the exact-twin join (the Spark plan it gates
    * never re-touches the token table; the oracle, which only checks
    * VALUES, may of course rebuild registers from tokens). */
  private def hllOverlapOracle(withExact: Boolean): String = {
    val m = 1024
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    val bitCase = "CASE " + (50 to 1 by -1)
      .map(b => s"WHEN (h>>10) >= ${1L << (b - 1)} THEN $b")
      .mkString(" ") + " ELSE 0 END"
    // binds to whichever s/v the ENCLOSING SELECT's FROM provides
    val est =
      s"""round(CASE WHEN $alphaM2 / s <= 2560.0 AND v > 0
         |    THEN 1024.0 * ln(1024.0 / v)
         |    ELSE $alphaM2 / s END, 6)""".stripMargin
    s"""WITH toks AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT lang, list_distinct(list_transform(
      |         generate_series(1, greatest(len(w)-2, 1)),
      |         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
      |tok AS (SELECT lang, unnest(s) AS t FROM sh),
      |h AS (SELECT lang, ${duckHash60("'hll:' || t")} AS h FROM tok),
      |r AS (SELECT lang, h & 1023 AS bucket, least(30, 51 - $bitCase) AS rho FROM h),
      |regs AS (SELECT lang, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
      |gp AS (SELECT a.lang AS ga, b.lang AS gb
      |       FROM (SELECT DISTINCT lang FROM regs) a, (SELECT DISTINCT lang FROM regs) b
      |       WHERE a.lang < b.lang),
      |uregs AS (SELECT ga, gb, bucket, max(mj) AS mj
      |          FROM regs JOIN gp ON regs.lang = gp.ga OR regs.lang = gp.gb
      |          GROUP BY 1, 2, 3),
      |pere AS (SELECT lang, CAST(s_used + CAST(1024 - nb AS DECIMAL(38,30)) AS DOUBLE) AS s,
      |           1024 - nb AS v FROM (
      |           SELECT lang, count(*) AS nb,
      |             sum(CAST(pow(0.5, mj) AS DECIMAL(38,30))) AS s_used
      |           FROM regs GROUP BY lang)),
      |pest AS (SELECT lang, $est AS e FROM pere),
      |uest0 AS (SELECT ga, gb, CAST(s_used + CAST(1024 - nb AS DECIMAL(38,30)) AS DOUBLE) AS s,
      |            1024 - nb AS v FROM (
      |            SELECT ga, gb, count(*) AS nb,
      |              sum(CAST(pow(0.5, mj) AS DECIMAL(38,30))) AS s_used
      |            FROM uregs GROUP BY ga, gb)),
      |uest AS (SELECT ga, gb, $est AS e FROM uest0)""".stripMargin +
    (if (withExact)
      """,
        |ex AS (SELECT a.ga, a.gb, count(DISTINCT a.t) AS exact_overlap FROM
        |        (SELECT gp.ga, gp.gb, tok.t FROM tok JOIN gp ON tok.lang = gp.ga) a
        |        JOIN (SELECT gp.ga, gp.gb, tok.t FROM tok JOIN gp ON tok.lang = gp.gb) b
        |        ON a.ga = b.ga AND a.gb = b.gb AND a.t = b.t
        |        GROUP BY a.ga, a.gb)
        |SELECT gp.ga, gp.gb, pa.e AS est_a, pb.e AS est_b, u.e AS est_union,
        |  pa.e + pb.e - u.e AS est_overlap,
        |  COALESCE(ex.exact_overlap, 0) AS exact_overlap
        |FROM gp JOIN pest pa ON gp.ga = pa.lang JOIN pest pb ON gp.gb = pb.lang
        |  JOIN uest u ON gp.ga = u.ga AND gp.gb = u.gb
        |  LEFT JOIN ex ON gp.ga = ex.ga AND gp.gb = ex.gb
        |ORDER BY gp.ga, gp.gb""".stripMargin
    else
      """
        |SELECT gp.ga, gp.gb, pa.e AS est_a, pb.e AS est_b, u.e AS est_union,
        |  pa.e + pb.e - u.e AS est_overlap
        |FROM gp JOIN pest pa ON gp.ga = pa.lang JOIN pest pb ON gp.gb = pb.lang
        |  JOIN uest u ON gp.ga = u.ga AND gp.gb = u.gb
        |ORDER BY gp.ga, gp.gb""".stripMargin)
  }

  /** The upsert family's shared oracle tail: the dst slice the three
    * merge identities (mapGroupsWithState, foreachBatch parquet
    * generations, kvbin generations) must all rebuild byte-for-byte —
    * one string, so the slice bounds cannot drift between them. */
  private val dstSliceSelect: String =
    """SELECT k AS key, v AS value FROM dst
      |WHERE k >= 'li_0000000001' AND k < 'li_0000002000'
      |ORDER BY key""".stripMargin

  /** DuckDB replay of the synthesized blob corpus + metadata/content
    * aggregate, shared VERBATIM by q_binaryfile_ingest (per-file
    * ingest) and q_multimodal_kvbin (kvbin ranged ingest) — only the
    * count alias differs, so any fix to the synthesize derivation
    * (header constant, payload repeat) reaches both gates at once. */
  private def blobIngestOracleSql(countAlias: String): String =
    s"""WITH b AS (SELECT vec_id AS media_id,
      |    'IMG1' || lpad(CAST(16 + vec_id % 48 AS VARCHAR), 4, '0') ||
      |    lpad(CAST(16 + vec_id % 32 AS VARCHAR), 4, '0') ||
      |    CAST(1 + vec_id % 3 AS VARCHAR) ||
      |    repeat(md5(CAST(vec_id AS VARCHAR)), 4) AS blob
      |  FROM embeddings)
      |SELECT 1 + media_id % 3 AS channels, count(*) AS $countAlias,
      |  CAST(sum(length(blob)) AS BIGINT) AS sum_len,
      |  CAST(sum(length(blob) - 13) AS BIGINT) AS sum_payload,
      |  CAST(bit_xor(${duckHash60("blob")}) AS BIGINT) AS xor_sig,
      |  min(media_id) AS min_id, max(media_id) AS max_id
      |FROM b GROUP BY 1 ORDER BY channels""".stripMargin

  /** DuckDB replay of [[graft.operators.TextAnalysis.nbClassify]]'s
    * train/score split: train counts on `doc_id % 5 != 0`, add-1
    * smoothed per-token ln rounded 7 dp, DECIMAL sums, argmax
    * tie-broken by class name. `testExtra` narrows the test split (the
    * streaming twin's bounded feed slice); `finalSelect` picks the
    * output shape (batch emits actual/correct, streaming emits the
    * scorer's raw (doc_id, pred, score)). */
  private def nbOracleSql(testExtra: String, finalSelect: String): String =
    s"""WITH tr AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
      |te AS (SELECT * FROM documents WHERE doc_id % 5 = 0$testExtra),
      |trtok AS (SELECT lang AS l, unnest(string_split(text, ' ')) AS w FROM tr),
      |cw AS (SELECT l, w, count(*) AS c FROM trtok GROUP BY l, w),
      |vocab AS (SELECT DISTINCT w FROM cw),
      |v AS (SELECT count(*) AS v FROM vocab),
      |cls AS (SELECT l, count(*) AS nl FROM trtok GROUP BY l),
      |prior AS (SELECT lang AS l, count(*) AS dl FROM tr GROUP BY lang),
      |nd AS (SELECT count(*) AS nd FROM tr),
      |ct AS (SELECT cls.l, nl, v.v,
      |         round(ln(CAST(dl AS DOUBLE) / CAST(nd.nd AS DOUBLE)), 7) AS lprior
      |       FROM cls JOIN prior USING (l) CROSS JOIN v CROSS JOIN nd),
      |tetok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM te),
      |tev AS (SELECT doc_id, w FROM tetok SEMI JOIN vocab USING (w)),
      |term AS (SELECT doc_id, ct.l, ct.lprior,
      |           round(ln((CAST(coalesce(c, 0) AS DOUBLE) + 1.0) /
      |             (CAST(nl AS DOUBLE) + CAST(v AS DOUBLE))), 7) AS lp
      |         FROM tev CROSS JOIN ct
      |         LEFT JOIN cw ON cw.l = ct.l AND cw.w = tev.w),
      |ds AS (SELECT doc_id, l, lprior,
      |         sum(CAST(lp AS DECIMAL(21,7))) AS s
      |       FROM term GROUP BY doc_id, l, lprior),
      |sc AS (SELECT doc_id, l, s + CAST(lprior AS DECIMAL(21,7)) AS score FROM ds),
      |best AS (SELECT doc_id, l AS pred, score,
      |           row_number() OVER (PARTITION BY doc_id
      |             ORDER BY score DESC, l) AS rk FROM sc)
      |$finalSelect""".stripMargin

  /** DuckDB replay of [[graft.operators.Sketches.psiDrift]] over
    * events (16 buckets, reference = users < 50); `liveWhere` selects
    * the live population (the full complement for the batch entry, the
    * bounded band for the streaming twin). */
  private def psiOracleSql(liveWhere: String): String =
    s"""WITH ref AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      |             FROM events WHERE user_id < 50),
      |live AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      |         FROM events WHERE $liveWhere),
      |st AS (SELECT g, min(v) AS lo, max(v) AS hi FROM ref GROUP BY 1),
      |rcell AS (SELECT b.g,
      |    CASE WHEN st.hi > st.lo
      |         THEN greatest(0, least(15, CAST(floor((b.v - st.lo) / (st.hi - st.lo) * 16) AS BIGINT)))
      |         ELSE 0 END AS bucket, count(*) AS rc
      |  FROM ref b JOIN st ON b.g = st.g GROUP BY 1, 2),
      |lcell AS (SELECT b.g,
      |    CASE WHEN st.hi > st.lo
      |         THEN greatest(0, least(15, CAST(floor((b.v - st.lo) / (st.hi - st.lo) * 16) AS BIGINT)))
      |         ELSE 0 END AS bucket, count(*) AS lc
      |  FROM live b JOIN st ON b.g = st.g GROUP BY 1, 2),
      |rn AS (SELECT g, CAST(sum(rc) AS BIGINT) AS n_ref FROM rcell GROUP BY 1),
      |lv AS (SELECT g, CAST(sum(lc) AS BIGINT) AS n_live FROM lcell GROUP BY 1),
      |j AS (SELECT coalesce(rcell.g, lcell.g) AS g,
      |        coalesce(rcell.bucket, lcell.bucket) AS bucket,
      |        coalesce(rc, 0) AS rc, coalesce(lc, 0) AS lc
      |      FROM rcell FULL JOIN lcell
      |        ON rcell.g = lcell.g AND rcell.bucket = lcell.bucket),
      |t AS (SELECT j.g, rn.n_ref, coalesce(lv.n_live, 0) AS n_live,
      |    round((CAST(rc + 1 AS DOUBLE) / CAST(rn.n_ref + 16 AS DOUBLE)
      |           - CAST(lc + 1 AS DOUBLE) / CAST(coalesce(lv.n_live, 0) + 16 AS DOUBLE))
      |      * ln((CAST(rc + 1 AS DOUBLE) / CAST(rn.n_ref + 16 AS DOUBLE))
      |           / (CAST(lc + 1 AS DOUBLE) / CAST(coalesce(lv.n_live, 0) + 16 AS DOUBLE))), 6) AS term
      |  FROM j JOIN rn ON j.g = rn.g LEFT JOIN lv ON j.g = lv.g)
      |SELECT g AS event_type, n_ref, n_live,
      |  round(CAST(sum(CAST(term AS DECIMAL(20,6))) AS DOUBLE), 6) AS psi
      |FROM t GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin

  /** DuckDB replay of [[graft.operators.Sketches.slotSampleQuantiles]]
    * over events (k=1024, P500/P950); `where` restricts the fed slice
    * for the streaming twin. */
  private def slotSampleOracleSql(where: String): String =
    s"""WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v,
      |    ${duckHash60("CAST(event_id AS VARCHAR)")} AS h
      |  FROM events $where),
      |cells AS (SELECT g, h % 1024 AS slot, h AS hv, v,
      |    row_number() OVER (PARTITION BY g, h % 1024 ORDER BY h, v) AS rn1
      |  FROM base),
      |cell1 AS (SELECT g, slot, hv, v FROM cells WHERE rn1 = 1),
      |m AS (SELECT g, count(*) AS m_slots FROM cell1 GROUP BY 1),
      |ranked AS (SELECT g, v, hv, slot,
      |    row_number() OVER (PARTITION BY g ORDER BY v, hv, slot) AS rn
      |  FROM cell1)
      |SELECT r.g AS event_type, q.q_permille, m.m_slots, r.v AS est_v
      |FROM ranked r JOIN m ON r.g = m.g
      |CROSS JOIN (VALUES (500), (950)) AS q(q_permille)
      |WHERE r.rn = (q.q_permille * m.m_slots + 999) // 1000
      |ORDER BY event_type, q_permille""".stripMargin

  /** Shared local-mean pHash candidate CTEs (replaying
    * [[graft.operators.Multimodal.phashNearDup]] with `local = true`
    * over the planted-twin corpus): ends with `pairs(media_a, media_b,
    * pa, pb)` — chunk-pigeonhole candidates, hamming NOT yet filtered.
    * One definition for the near-dup gate and the cluster closure. */
  private val phashLocalPairsCte: String =
    """WITH p0 AS (SELECT vec_id AS media_id,
      |            repeat(md5(CAST(vec_id AS VARCHAR)), 4) AS pay FROM embeddings),
      |mxo AS (SELECT CAST('1' || repeat('0', length(CAST(max(media_id) AS VARCHAR)))
      |            AS BIGINT) AS off FROM p0),
      |tw AS (SELECT media_id + (SELECT off FROM mxo) AS media_id,
      |            'z' || substr(pay, 2) AS pay
      |       FROM p0 WHERE media_id % 10 = 0),
      |p AS (SELECT * FROM p0 UNION ALL SELECT * FROM tw),
      |ix AS (SELECT media_id, pay, unnest(generate_series(1, len(pay))) AS i FROM p),
      |c AS (SELECT media_id, (i - 1) % 60 AS bk, ord(substr(pay, i, 1)) AS b FROM ix),
      |bs AS (SELECT media_id, bk, bk // 15 AS blk, sum(b) AS s, count(*) AS cnt
      |       FROM c GROUP BY 1, 2, 3),
      |tot AS (SELECT media_id, blk, sum(s) AS t, sum(cnt) AS n FROM bs GROUP BY 1, 2),
      |ph AS (SELECT bs.media_id,
      |         CAST(sum(CASE WHEN bs.s * tot.n > tot.t * bs.cnt
      |                       THEN CAST(1 AS BIGINT) << CAST(bk AS INT) ELSE 0 END) AS BIGINT) AS phash
      |       FROM bs JOIN tot ON bs.media_id = tot.media_id AND bs.blk = tot.blk
      |       GROUP BY bs.media_id),
      |chunks AS (SELECT media_id, phash, c, (phash >> (c * 15)) & 32767 AS chunk
      |           FROM ph CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c)),
      |keep AS (SELECT c, chunk FROM chunks GROUP BY c, chunk HAVING count(*) <= 100),
      |ck AS (SELECT ch.* FROM chunks ch JOIN keep k ON ch.c = k.c AND ch.chunk = k.chunk),
      |pairs AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
      |            a.phash AS pa, b.phash AS pb
      |          FROM ck a JOIN ck b
      |          ON a.c = b.c AND a.chunk = b.chunk AND a.media_id < b.media_id)""".stripMargin

  /** Shared BM25 lexical-ranking CTEs (replaying
    * [[graft.operators.Retrieval.bm25Ranks]] for the doc_id < 5
    * query-by-document set, 4 lexicographic terms, excludeSelf):
    * ends with `lex(query_id, doc_id, rank ≤ cut)`. One definition so
    * the Okapi constants (k1=1.2, b=0.75, milli rounding) can never
    * drift between the oracles that rank through it. */
  private def bm25LexCte(cut: Int): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |qt AS (SELECT doc_id AS query_id, unnest(list_sort(list_distinct(w))[1:4]) AS t
       |       FROM d WHERE doc_id < 5),
       |dl AS (SELECT doc_id, len(w) AS dl FROM d),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |                 CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
       |tok AS (SELECT d.doc_id, dl.dl, unnest(d.w) AS t
       |        FROM d JOIN dl ON d.doc_id = dl.doc_id),
       |tf AS (SELECT doc_id, dl, t, count(*) AS tf FROM tok
       |       WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY doc_id, dl, t),
       |dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
       |sc AS (SELECT tf.doc_id, tf.t,
       |         CAST(floor((ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * (tf.tf * 2.2))
       |           / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)) * 1000.0 + 0.5) AS BIGINT) AS s_milli
       |       FROM tf JOIN dft ON tf.t = dft.t CROSS JOIN stats s),
       |lexagg AS (SELECT q.query_id, sc.doc_id, sum(s_milli) AS score_milli
       |           FROM sc JOIN qt q ON sc.t = q.t WHERE sc.doc_id <> q.query_id
       |           GROUP BY 1, 2),
       |lex AS (SELECT * FROM (SELECT query_id, doc_id,
       |          row_number() OVER (PARTITION BY query_id ORDER BY score_milli DESC, doc_id) AS rank
       |        FROM lexagg) WHERE rank <= $cut)""".stripMargin

  /** DuckDB inline of [[graft.operators.Dedup.md5Hash60]] with the
    * expression `e` as input: `substr(md5(e),1,15)` parsed base-16. */
  private def duckHash60(e: String): String =
    s"""list_reduce(list_transform(string_split_regex(substr(md5($e), 1, 15), ''),
       |      ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
       |    (a, d) -> a * 16 + d)""".stripMargin

  /** Unrolled DuckDB replay of [[graft.operators.Bpe.learnMerges]]:
    * per round, lateral-unnest adjacent pairs of the symbol list,
    * argmax with the (cnt DESC, l, r) tie-break, then the identical
    * delimiter-wrapped `replace` greedy-left merge (chr(31) ≙ the
    * engine's U+001F wrapper). */
  private def bpeOracleSql(rounds: Int, compress: Boolean = false): String = {
    def iter(i: Int): String =
      s"""pairs$i AS (
         |  SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, seq[i] AS l, seq[i+1] AS r
         |    FROM words$i, unnest(generate_series(1, len(seq)-1)) t(i)
         |    WHERE len(seq) > 1)
         |  GROUP BY 1, 2),
         |best$i AS (SELECT l, r, cnt FROM pairs$i ORDER BY cnt DESC, l, r LIMIT 1),
         |words${i + 1} AS (
         |  SELECT word, freq,
         |    list_filter(string_split(
         |      replace(
         |        list_reduce(list_transform(seq, s -> chr(31)||s||chr(31)), (a,b) -> a||b),
         |        chr(31)||b.l||chr(31)||chr(31)||b.r||chr(31), chr(31)||b.l||b.r||chr(31)),
         |      chr(31)), x -> x <> '') AS seq
         |  FROM words$i, best$i b)""".stripMargin
    val selects =
      if (compress) (0 to rounds).map(i =>
        s"SELECT $i AS rank, CAST(sum(len(seq) * freq) AS BIGINT) AS corpus_tokens FROM words$i")
      else (0 until rounds).map(i =>
        s"SELECT ${i + 1} AS rank, l, r, l || r AS merged, cnt FROM best$i")
    s"""WITH w0 AS (
       |  SELECT w AS word, count(*) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |words0 AS (
       |  SELECT word, freq,
       |    list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)) AS seq
       |  FROM w0),
       |${(0 until rounds).map(iter).mkString(",\n")}
       |SELECT * FROM (
       |${selects.mkString("\n  UNION ALL ")})
       |ORDER BY rank""".stripMargin
  }
}
