package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`) —
  * north-star mandate. Two paths:
  *
  *  - `bruteForceTopK`: exact cosine top-k, query-side broadcast. The
  *    correctness baseline; at scale the small query set broadcasts and
  *    each executor scans its candidate partition once (embarrassingly
  *    parallel), then a per-query window takes the top k. Cost is
  *    O(|queries| · |corpus|) — right answer, only viable for small
  *    query batches.
  *  - `ivfTopK`: IVF-style two-stage ANN. Stage 1 builds a coarse
  *    codebook (centroids) and assigns every corpus vector to its
  *    nearest centroid; stage 2 probes only the `nprobe` nearest
  *    clusters per query. At 100 TB the corpus is hash-partitioned (or
  *    bucketed) by `cluster_id`, so a probe touches nprobe/C of the
  *    data — the classic inverted-file pruning, expressed as two
  *    broadcast joins + a window.
  *
  * All dot products accumulate in DOUBLE, left-to-right over the array
  * (`aggregate` is a sequential fold), which the DuckDB oracle
  * reproduces bit-for-bit via list_dot_product over double-cast lists.
  */
object Similarity {

  /** Sequential-fold double dot product of two float/double-array
    * columns. Backed by the codegen'd [[graft.functions.DotProductExpr]]
    * kernel, which is bit-identical to the HOF formulation
    * `aggregate(zip_with(a, b, (x, y) => x.cast(double) *
    * y.cast(double)), 0.0d, (acc, v) => acc + v)` it replaced — the HOF
    * tree is interpreted and ran once per candidate pair, dominating
    * every similarity query. */
  def dot(a: Column, b: Column): Column = graft.functions.Dot.dotProduct(a, b)

  /** L2 norm (double). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array columns, in double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k. `queries` and `corpus` both carry
    * (id, vec) columns; self-matches (same id) are excluded. Output:
    * (query_id, vec_id, sim, rank), rank 1..k per query, ties broken by
    * vec_id. `sim` is rounded to 9 dp for stable cross-engine compares;
    * ranking uses the rounded value so rank and sim can never disagree. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms are computed once per VECTOR (not once per pair): the
    // per-pair kernel is one dot + one divide. Bit-identical to the
    // inline form — sqrt(dot(v,v)) is the same double either way.
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("vec_id"), col("vec").as("cv"),
      norm(col("vec")).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hard-negative mining — the contrastive-training data op: per query
    * vector, the top-k most-similar corpus vectors with a DIFFERENT
    * label ("looks the same, is not" — the examples that actually move
    * an embedding model, versus easy negatives cosine already
    * separates). Same broadcast-query brute-force shape as
    * [[bruteForceTopK]] with the label guard in the join; at corpus
    * scale the same IVF probe swaps in for the corpus side and the
    * label guard rides the rescore. Output: (query_id, vec_id, sim,
    * rank ≤ k), deterministic (9-dp rounding + vec_id tiebreak). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      col("label").as("q_label"), norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("vec_id"), col("vec").as("cv"),
      col("label").as("c_label"), norm(col("vec")).as("cn"))
    val scored = c.join(broadcast(q), col("q_label") =!= col("c_label"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style ANN top-k over the per-`labelCol` mean-vector codebook —
    * the labeled-corpus form; [[kmeansCodebook]] is the unsupervised
    * drop-in for the usual case where no label exists. Probing `nprobe`
    * clusters bounds recall loss; `nprobe = C` degrades to exact search
    * (SimilaritySpec pins that equality against [[bruteForceTopK]]). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
              labelCol: String = "label"): DataFrame =
    ivfTopKWithCodebook(corpus, queries, k, nprobe,
      labelCodebook(corpus, labelCol))

  /** Coarse codebook from a label column: centroid[j] = mean(vec[j]) per
    * label — posexplode + grouped agg, a partial-aggregated shuffle of
    * (label, j, sum, cnt) triples only. The mean sums in DECIMAL(27,15)
    * and divides once as a double: a bare avg(double) adds in partition
    * order, so the codebook — and with it every downstream assignment —
    * would differ run to run; this way the whole ANN pipeline is
    * deterministic and the DuckDB oracle reproduces it bit-for-bit.
    * Output: (cluster_id, cvec array<double>). */
  def labelCodebook(corpus: DataFrame, labelCol: String = "label"): DataFrame =
    meanByCluster(corpus.select(col(labelCol).as("cluster_id"), col("vec")))

  /** The ONE per-(group, pos) DECIMAL(27,15)-exact mean kernel —
    * [[meanByCluster]] (packed arrays) and [[meanPool]] (long form)
    * both route through it so the family's mean arithmetic can never
    * diverge. Input: (g, vec); element values are summed EXACTLY as
    * given — each caller owns its cast path (see [[meanPool]]'s
    * shortest-string note). */
  private def meanLongForm(grouped: DataFrame): DataFrame =
    grouped.select(col("g"), posexplode(col("vec")))
      .groupBy(col("g"), col("pos"))
      .agg(count(lit(1)).as("n"),
        (sum(col("col").cast("decimal(27,15)")).cast("double") /
          count(lit(1))).as("centroid"))

  /** centroid[j] = decimal-exact mean of component j per cluster_id, from
    * a (cluster_id, vec) frame. */
  private[graft] def meanByCluster(assigned: DataFrame): DataFrame =
    meanLongForm(assigned.select(col("cluster_id").as("g"), col("vec")))
      .groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("pos"), col("centroid")))).as("pm"))
      .select(col("g").as("cluster_id"),
        transform(col("pm"), x => x.getField("centroid")).as("cvec"))

  /** Deterministic unsupervised k-means codebook — the IVF default when
    * the corpus has no label column. Every source of k-means
    * nondeterminism is pinned so the DuckDB oracle replays the codebook
    * bit-for-bit:
    *  - INIT: the k corpus vectors with the smallest
    *    `(md5(cast(id as string)), id)` — a seeded pseudo-random draw
    *    both engines compute identically (the distributed plan is a
    *    top-k, never a global sort);
    *  - ASSIGNMENT: the family's 9-dp rounded cosine, ties broken by
    *    cluster_id — same kernel as the probe stages;
    *  - UPDATE: component means summed in DECIMAL(27,15), divided once
    *    as double (partition-order-proof, like [[labelCodebook]]);
    *  - a FIXED iteration count (no data-dependent stopping), and an
    *    emptied cluster keeps its previous centroid.
    * Each round broadcasts k·dim doubles and collects the k new
    * centroids — model parameters, not data; the corpus itself only
    * streams through one assignment scan + one partial-aggregated
    * shuffle per round. Output: (cluster_id, cvec array<double>). */
  def kmeansCodebook(corpus: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val spark = corpus.sparkSession
    import spark.implicits._
    val seeds = corpus
      .select(md5(col("id").cast("string")).as("__h"), col("id"),
        col("vec").cast("array<double>").as("cvec"))
      .orderBy(col("__h"), col("id")).limit(k)
      .select(col("cvec")).as[Seq[Double]].collect()
    var cent: Seq[(Long, Seq[Double])] =
      seeds.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    for (_ <- 1 to iters) {
      val centDf = cent.toDF("cluster_id", "cvec").withColumn("cvn", norm(col("cvec")))
      val assigned = corpus
        .select(col("id"), col("vec"), norm(col("vec")).as("vn"))
        .join(broadcast(centDf))
        .select(col("id"), col("vec"), col("cluster_id"),
          round(dot(col("vec"), col("cvec")) / (col("vn") * col("cvn")), 9).as("csim"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cluster_id"))))
        .filter(col("r") === 1)
        .select(col("cluster_id"), col("vec"))
      val means = meanByCluster(assigned)
        .as[(Long, Seq[Double])].collect().toMap
      cent = cent.map { case (cid, prev) => (cid, means.getOrElse(cid, prev)) }
    }
    cent.toDF("cluster_id", "cvec")
  }

  /** The IVF two-stage probe over an explicit (cluster_id, cvec)
    * codebook — shared core of [[ivfTopK]] (label codebook) and the
    * [[kmeansCodebook]] path. */
  def ivfTopKWithCodebook(corpus: DataFrame, queries: DataFrame, k: Int,
                          nprobe: Int, codebook: DataFrame): DataFrame = {
    // stage 1: assign every corpus vector to its nearest centroid
    val assigned = rankedCentroidSims(corpus, codebook)
      .filter(col("r") === 1)
      .select(col("vec_id"), col("cluster_id"), col("cv"), col("cn"))
    // stage 2: per query, probe the nprobe nearest clusters only
    val probes = rankedCentroidSims(queries, codebook)
      .filter(col("r") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cv").as("qv"),
        col("cn").as("qn"), col("cluster_id"))
    val scored = assigned
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** The recall/nprobe CURVE of the IVF probe — the measurement behind
    * [[nprobeFor]]'s empirical chooser (the srpBandsFor discipline for
    * the IVF family's last manual knob, applied where no analytic form
    * exists: recall at a given nprobe depends on how the corpus
    * clusters, so it is MEASURED on a capped query slice rather than
    * modeled). One row per nprobe 1..C: (nprobe, n_hit, n_total,
    * recall_ppm) against the exact brute-force top-k on the same
    * slice. Cost discipline: the brute side is |queries|·corpus — the
    * caller caps the query slice exactly as the other offline gates do
    * — and the probe side computes ONE scored pair list tagged with
    * each pair's probe rank, then ranks it once per nprobe (a C-way
    * explode of an already-k-bounded frame, never C separate probe
    * jobs over the corpus). Exact integer ppm, oracle-replayable. */
  def nprobeRecallCurve(corpus: DataFrame, queries: DataFrame, k: Int,
                        labelCol: String = "label"): DataFrame =
    nprobeRecallCurveWithCodebook(corpus, queries, k,
      labelCodebook(corpus, labelCol))

  def nprobeRecallCurveWithCodebook(corpus: DataFrame, queries: DataFrame,
                                    k: Int, codebook: DataFrame): DataFrame = {
    val exact = bruteForceTopK(queries, corpus, k)
      .select(col("query_id"), col("vec_id")).localCheckpoint()
    val assigned = rankedCentroidSims(corpus, codebook)
      .filter(col("r") === 1)
      .select(col("vec_id"), col("cluster_id"), col("cv"), col("cn"))
    // keep EVERY probe rank: a (query, vec) pair's probe rank pr is the
    // query's rank of the vec's (unique) cluster, so the pair is in the
    // nprobe-probe candidate set exactly when pr ≤ nprobe
    val probes = rankedCentroidSims(queries, codebook)
      .select(col("vec_id").as("query_id"), col("cv").as("qv"),
        col("cn").as("qn"), col("cluster_id"), col("r").as("pr"))
    val scall = assigned
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("pr"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("sim"))
    val c = codebook.count() // bounded: the codebook is model state
    // the DuckDB replay enumerates depths from a CONSTANT series capped
    // at 4096 (generate_series cannot take a subquery bound) — hold the
    // same bound here so engine and oracle can never enumerate
    // different depth lists; a coarse codebook past 4096 clusters is
    // outside this gate's design point (probe budgets are chosen from
    // tens of clusters, not thousands)
    require(c <= 4096,
      s"nprobeRecallCurve: $c clusters exceeds the replayable depth " +
      "bound (4096) — coarsen the codebook or raise the bound in BOTH " +
      "engines")
    val spark = corpus.sparkSession
    val nps = spark.range(1, c + 1).select(col("id").as("nprobe"))
    val ranked = scall.join(broadcast(nps), col("pr") <= col("nprobe"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("nprobe"), col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("nprobe"), col("query_id"), col("vec_id"),
        lit(1L).as("__hit"))
    nps.crossJoin(exact)
      .join(ranked, Seq("nprobe", "query_id", "vec_id"), "left")
      .groupBy(col("nprobe"))
      .agg(coalesce(sum(col("__hit")), lit(0L)).as("n_hit"),
        count(lit(1)).as("n_total"))
      .select(col("nprobe"), col("n_hit"), col("n_total"),
        expr("n_hit * 1000000 DIV n_total").as("recall_ppm"))
  }

  /** The nprobe CHOOSER: smallest nprobe whose measured recall on the
    * capped slice meets `targetRecallPpm`; the full probe count C when
    * no depth reaches it (degrading to exact search — the honest
    * fallback). Driver-side decision over the C-row curve — the same
    * derive-then-gate shape as [[srpBandsFor]]/[[Dedup.lshParamsFor]],
    * except the derivation is the gate's own measurement because IVF
    * recall has no corpus-free analytic form. floor(n_hit·1e6/n_total)
    * ≥ T is equivalent to n_hit·1e6 ≥ T·n_total for integer T, so the
    * oracle's replay of the threshold cannot straddle a rounding
    * boundary. */
  def nprobeFor(corpus: DataFrame, queries: DataFrame, k: Int,
                targetRecallPpm: Long,
                labelCol: String = "label"): Int = {
    val rows = nprobeRecallCurve(corpus, queries, k, labelCol)
      .select(col("nprobe"), col("recall_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(rows.nonEmpty, "nprobeFor: empty curve (no clusters?)")
    rows.filter(_._2 >= targetRecallPpm).map(_._1).minOption
      .getOrElse(rows.map(_._1).max).toInt
  }

  /** Scalar (int8) quantization of an embedding column: one global
    * (min, max) pair per dimension (a tiny broadcast aggregate), values
    * mapped affinely to 0..255. 4× memory reduction per vector — at
    * 100 TB the quantized corpus is what stays hot; search runs coarse
    * scoring on codes and re-scores only the short candidate list in
    * full precision (see [[quantizedTopK]]). Output: input columns +
    * `qvec` (array<int> codes). The per-dim scale frame is returned for
    * dequantization. */
  def quantize(corpus: DataFrame): (DataFrame, DataFrame) = {
    val dims = corpus
      .select(posexplode(col("vec")))
      .groupBy(col("pos"))
      .agg(min(col("col").cast("double")).as("lo"), max(col("col").cast("double")).as("hi"))
      .select(col("pos"), col("lo"),
        when(col("hi") === col("lo"), lit(1.0)).otherwise(col("hi") - col("lo")).as("span"))
    val scales = dims.orderBy(col("pos"))
      .groupBy().agg(collect_list(struct(col("pos"), col("lo"), col("span"))).as("ds"))
      .select(array_sort(col("ds")).as("ds"))
      .select(transform(col("ds"), d => d.getField("lo")).as("los"),
        transform(col("ds"), d => d.getField("span")).as("spans"))
    val quantized = corpus.crossJoin(broadcast(scales))
      .withColumn("qvec",
        zip_with(col("vec"),
          zip_with(col("los"), col("spans"), (l, s) => struct(l.as("l"), s.as("s"))),
          (x, ls) => round((x.cast("double") - ls.getField("l")) / ls.getField("s") * lit(255.0), 0)
            .cast("int")))
      .drop("los", "spans")
    (quantized, scales)
  }

  /** Two-stage quantized top-k: coarse cosine on dequantized int8 codes
    * selects `k * overfetch` candidates per query, which are re-scored
    * in full float precision; exact ordering within the candidate set.
    * The coarse rank uses the 9-dp-rounded score (like every other
    * similarity ranking here) so the candidate set is reproducible
    * cross-engine — the DuckDB oracle replays the whole
    * quantize→dequantize→rank pipeline bit-for-bit. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    overfetch: Int = 4): DataFrame = {
    val (qcorpus, scales) = quantize(corpus)
    val deq = qcorpus.crossJoin(broadcast(scales))
      .withColumn("dvec",
        zip_with(col("qvec"),
          zip_with(col("los"), col("spans"), (l, s) => struct(l.as("l"), s.as("s"))),
          (c, ls) => (c.cast("double") / lit(255.0)) * ls.getField("s") + ls.getField("l")))
      // per-vector norms hoisted out of the per-(query, vector) kernel —
      // bit-identical (norm is a pure function of the array) and saves
      // an array walk per pair scored
      .select(col("id").as("vec_id"), col("vec").as("cv"), col("dvec"),
        norm(col("vec")).as("cn"), norm(col("dvec")).as("dn"))
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
    val coarse = deq.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("cv"),
        col("qn"), col("cn"),
        round(dot(col("qv"), col("dvec")) / (col("qn") * col("dn")), 9).as("csim"))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("vec_id"))
    val candidates = coarse.withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= k * overfetch)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    candidates
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 (Rademacher) sign-projection hyperplanes:
    * component d of plane j is +1 iff the first hex digit of
    * md5("srp_<j>_<d>") has its high bit set — a construction the
    * DuckDB oracle rebuilds verbatim with md5()/substring(). */
  def srpPlanes(k: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until k).map { j =>
      (0 until dim).map { d =>
        val h = md.digest(s"srp_${j}_$d".getBytes("UTF-8"))
        if ((h(0) & 0x80) != 0) 1.0 else -1.0
      }
    }
  }

  /** Approximate embedding near-dup via sign-random-projection LSH —
    * the scale path [[cosineNearDup]]'s doc promises: no label blocking,
    * no all-pairs. Each vector gets k sign bits (bit j = dot with
    * deterministic ±1 hyperplane j ≥ 0; P[bits agree] = 1 − θ/π), the
    * bits split into `bands` bands joined banded-equi like MinHash-LSH,
    * and every candidate is verified in full precision — so emitted
    * pairs are exactly the threshold-passing subset of the candidates.
    * Recall < 1 is inherent to any cosine LSH at finite k (this is why
    * it is a SEPARATE entry point and not silently inside the exact
    * operator); band width r = k/bands sets the operating point —
    * r = 8 tunes for the high-similarity dedup regime (recall ≈ 0.93 at
    * cos 0.9, candidate rate ≈ 3% on orthogonal noise). Deterministic
    * end-to-end: the DuckDB oracle replays planes → bits → bands →
    * candidates → verification bit-for-bit. */
  def srpNearDup(corpus: DataFrame, threshold: Double,
                 k: Int = 64, bands: Int = 8, probes: Int = 0): DataFrame =
    srpBanded(corpus, k, bands) match {
      case None =>
        corpus.sparkSession.emptyDataFrame
          .select(lit(0L).as("id_a"), lit(0L).as("id_b"), lit(0.0d).as("sim"))
      case Some(banded) =>
        // multi-probe on ONE side of the self-join (the same mechanism
        // as crossCandidates): each probe list contains the unflipped
        // value, so probes > 0 only ADDS candidates — the recall knob
        // to turn when a DEEPER banding (a larger corpus's occupancy
        // choice) would otherwise trade away too much recall. Verified
        // pairs stay exactly the threshold-passing candidate subset.
        val p = math.min(math.max(probes, 0), k / bands)
        val bv = col("band_val")
        val aSide =
          if (p == 0) // single-probe: no explode in the default plan
            banded.select(col("band_id"), bv, col("id").as("id_a"))
          else banded.select(col("band_id"),
            explode(array(bv +: (0 until p).map(j =>
              bv.bitwiseXOR(lit(1L << j))): _*)).as("band_val"),
            col("id").as("id_a"))
        val cand = aSide
          .join(banded.select(col("band_id"), col("band_val"), col("id").as("id_b")),
            Seq("band_id", "band_val"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
          .distinct()
        verifyPairs(cand, corpus, threshold)
    }

  /** The (id, band_id, band_val) SRP signature frame — the shared
    * candidate-generation core of [[srpNearDup]] (same-side near-dup
    * self-join) and [[bitextPairsSrp]] (cross-side bitext candidates):
    * k sign bits over the deterministic ±1 hyperplanes, split into
    * `bands` band values. Materialized once (localCheckpoint) so the
    * bucket join doesn't recompute the k dot products per side — same
    * lesson as the MinHash banded frame. None for an empty corpus (no
    * row to read the plane width from). */
  private def srpBanded(corpus: DataFrame, k: Int, bands: Int): Option[DataFrame] = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    require(r <= 62, "band width must fit a long's bit weights")
    // the corpus must be fixed-dimension (the embedding-table contract);
    // the plane width is read from one row. A vector of a DIFFERENT
    // length dots to null against every plane and can never pair.
    val headRow = corpus.select(size(col("vec")).as("d")).head(1)
    if (headRow.isEmpty) return None
    val dim = headRow(0).getInt(0)
    val planes = srpPlanes(k, dim)
    val bitCols = planes.zipWithIndex.map { case (p, j) =>
      (dot(col("vec"), typedLit(p)) >= lit(0.0)).cast("long").as(s"__b$j")
    }
    val withBits = corpus.select(col("id") +: bitCols: _*)
    val bandVals = (0 until bands).map { i =>
      (0 until r).map(jj => col(s"__b${i * r + jj}") * lit(1L << jj))
        .reduce(_ + _).as(s"__band$i")
    }
    Some(withBits
      .select(col("id"), posexplode(array(bandVals: _*)))
      .toDF("id", "band_id", "band_val")
      .localCheckpoint())
  }

  /** ANN-fed cross-side candidate pairs for [[marginMining]] — the
    * corpus-scale path [[bitextPairs]]'s guard names as the remedy:
    * both sides get the [[srpNearDup]] band signature, and candidates
    * are the DISTINCT cross-side pairs (even id side A × odd id side B)
    * sharing any band value — a banded equi-join whose volume is
    * Σ_buckets |A_b|·|B_b|, never the A×B cross (measured 3.5% of A×B
    * on the fixture embeddings; 3.5× runtime for 10× corpus in
    * BENCH_SF1). At FIXED band width that sum grows superlinearly as
    * buckets fill: the scale knob is r = k/bands bits per band —
    * grow it with log₂(corpus) to hold per-bucket occupancy (and so
    * pairs-per-row) constant, the standard LSH depth/recall trade.
    * Survivors score
    * with the IDENTICAL 1e-9-unit integer cosine as the brute stage,
    * so [[marginMining]] is the unchanged downstream and margins agree
    * EXACTLY with the brute path restricted to the candidate set
    * (SimilaritySpec pins both). Recall < 1 against the full-cross
    * margin is inherent to LSH candidates — the documented trade that
    * makes corpus-scale bitext mining affordable (the CCMatrix
    * FAISS-candidates shape), and the reason the brute stage stays the
    * gated baseline while this is the scale path. */
  /** Analytic SRP band chooser — the sibling of [[Dedup]]'s MinHash
    * banding chooser, automating the knob [[bitextPairsSrp]]'s doc
    * names: under the random-sign model a band of r = k/bands bits has
    * 2^r distinct values, so expected per-side bucket occupancy is
    * n / 2^r; holding it at `targetOccupancy` (and with it the
    * pairs-per-row of the banded join) needs 2^r ≥ n / targetOccupancy
    * — r grows with log₂(corpus). Returns the BAND COUNT for the
    * SMALLEST divisor-of-k width (≤ 62) meeting the bound: smallest
    * admissible width = most bands = highest recall that still meets
    * the occupancy target. A corpus too large for any divisor gets the
    * widest width — the signature budget k is then the binding
    * constraint (raise k). The predicate is pow(2,r) ≥ n/occ in IEEE
    * doubles, NOT a log₂ comparison, so the DuckDB oracle replays the
    * choice bit-exactly (both sides of a boundary corpus agree). */
  def srpBandsFor(k: Int, n: Long, targetOccupancy: Double = 16.0): Int = {
    require(k >= 1 && targetOccupancy > 0)
    val widths = (1 to math.min(k, 62)).filter(k % _ == 0)
    val quota = math.max(n, 1L).toDouble / targetOccupancy
    val r = widths.find(w => math.pow(2.0, w) >= quota).getOrElse(widths.last)
    k / r
  }

  /** [[bitextPairsSrp]] with the band count CHOSEN from the corpus
    * size ([[srpBandsFor]]): one count() of the corpus — O(n) with no
    * shuffle wider than a scalar — buys the occupancy-held banding
    * that keeps the candidate join's volume near-linear as corpora
    * grow, instead of the superlinear fill a FIXED band width shows
    * (the measured 3.5× at 10× rows in BENCH_SF1 flattens once the
    * width deepens at sf1's corpus). */
  def bitextPairsSrpAuto(corpus: DataFrame, k: Int = 64,
                         targetOccupancy: Double = 16.0,
                         probes: Int = 0): DataFrame =
    bitextPairsSrp(corpus, k,
      srpBandsFor(k, CorpusCount.of(corpus), targetOccupancy), probes)

  /** The rollout gate for the SRP bitext candidate stage — the
    * [[Dedup.lshRecall]] analog, turning the documented "recall < 1 vs
    * brute" trade into a RECORDED number: on a corpus-capped slice
    * (the brute side is quadratic — that is exactly why this is an
    * offline gate, not a pipeline stage), mine the brute margin stage's
    * top pairs, then count how many survive as SRP band-collision
    * candidates under the auto-chosen banding — and, since r13, what
    * the MULTI-PROBE expansion ([[crossCandidates]], all r Hamming-1
    * bucket flips on side A) buys back. One row: (n_brute, n_cand,
    * n_hit, recall_bp, n_cand_mp, n_hit_mp, recall_mp_bp) — recall in
    * integer basis points, exact-replayable by the oracle, the
    * candidate-volume COST of the probe expansion recorded right next
    * to the recall it buys (n_cand_mp vs n_cand). The single- and
    * multi-probe sets derive from ONE banded signature frame — the k
    * dot products per vector are computed once, not per probe arm. */
  def bitextSrpRecall(corpus: DataFrame, k: Int = 4, top: Int = 50,
                      kBits: Int = 64,
                      targetOccupancy: Double = 16.0): DataFrame = {
    // brute (quadratic on the capped slice) and each candidate set feed
    // TWO+ aggregates below — materialize once, ≤ top rows / candidate
    // rows, never recompute the cross or the banded join per consumer
    val brute = marginMining(bitextPairs(corpus), k)
      .orderBy(col("margin_q").desc, col("qa"), col("qb")).limit(top)
      .select(col("qa"), col("qb"))
      .localCheckpoint()
    val bands = srpBandsFor(kBits, CorpusCount.of(corpus), targetOccupancy)
    val banded = srpBanded(corpus, kBits, bands)
    def candSet(probes: Int): DataFrame = banded match {
      case None => corpus.sparkSession.emptyDataFrame
        .select(lit(0L).as("qa"), lit(0L).as("qb"))
      case Some(b) => crossCandidates(b, kBits / bands, probes).localCheckpoint()
    }
    val cand = candSet(0)
    val candMp = candSet(Int.MaxValue) // clamped to r: all Hamming-1 flips
    def hits(c: DataFrame, nm: String): DataFrame =
      brute.join(c.withColumn("__in", lit(1L)), Seq("qa", "qb"), "left")
        // a DEGENERATE slice (no brute pairs) must yield 0, not a NULL
        // from a zero-row sum — the oracle guards the same way
        .agg(coalesce(sum(coalesce(col("__in"), lit(0L))), lit(0L)).as(nm))
    brute.agg(count(lit(1)).as("n_brute"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hits(cand, "n_hit"))
      .crossJoin(candMp.agg(count(lit(1)).as("n_cand_mp")))
      .crossJoin(hits(candMp, "n_hit_mp"))
      .select(col("n_brute"), col("n_cand"), col("n_hit"),
        when(col("n_brute") === 0L, lit(0L))
          .otherwise(expr("n_hit * 10000 DIV n_brute")).as("recall_bp"),
        col("n_cand_mp"), col("n_hit_mp"),
        when(col("n_brute") === 0L, lit(0L))
          .otherwise(expr("n_hit_mp * 10000 DIV n_brute")).as("recall_mp_bp"))
  }

  def bitextPairsSrp(corpus: DataFrame, k: Int = 64, bands: Int = 8,
                     probes: Int = 0): DataFrame =
    srpBanded(corpus, k, bands) match {
      case None =>
        corpus.sparkSession.emptyDataFrame
          .select(lit(0L).as("qa"), lit(0L).as("qb"), lit(0L).as("c"))
      case Some(banded) =>
        val cand = crossCandidates(banded, k / bands, probes)
        val v = corpus.select(col("id"), col("vec"), norm(col("vec")).as("nrm"))
        cand
          .join(v.select(col("id").as("qa"), col("vec").as("va"),
            col("nrm").as("na")), Seq("qa"))
          .join(v.select(col("id").as("qb"), col("vec").as("vb"),
            col("nrm").as("nb")), Seq("qb"))
          .select(col("qa"), col("qb"),
            floor(dot(col("va"), col("vb")) / (col("na") * col("nb"))
              * lit(1e9d) + lit(0.5d)).cast("long").as("c"))
    }

  /** The DISTINCT cross-side (even × odd) band-collision candidate
    * pairs of a banded SRP frame, with MULTI-PROBE expansion — the
    * recall-raising mechanism the [[bitextSrpRecall]] gate licenses:
    * `probes` > 0 ALSO visits, for each of side A's band values, the
    * buckets at Hamming distance 1 in the band's lowest `probes` bits
    * (clamped to the band width r). A sign bit flips when the query
    * sits near a hyperplane, so the Hamming-1 neighborhood recovers
    * most near-boundary misses — the classic multi-probe LSH trade:
    * candidate volume grows at most ×(probes+1) (side A explodes to
    * probes+1 probe values per band; side B is untouched, the join
    * stays a banded equi-join), recall rises toward the OR-amplified
    * ceiling. probes = 0 is exactly the single-probe set, and every
    * probe list CONTAINS the unflipped value, so the single-probe
    * candidate set is a SUBSET of any multi-probe set (SimilaritySpec
    * pins it). */
  private def crossCandidates(banded: DataFrame, r: Int,
                              probes: Int): DataFrame = {
    val p = math.min(math.max(probes, 0), r)
    val bv = col("band_val")
    val a =
      if (p == 0) // single-probe (the production default): no Generate
        // node over n·bands rows on the hot candidate path
        banded.filter(col("id") % 2 === 0)
          .select(col("band_id"), bv, col("id").as("qa"))
      else banded.filter(col("id") % 2 === 0)
        .select(col("band_id"),
          explode(array(bv +: (0 until p).map(j =>
            bv.bitwiseXOR(lit(1L << j))): _*)).as("band_val"),
          col("id").as("qa"))
    val b = banded.filter(col("id") % 2 =!= 0)
      .select(col("band_id"), col("band_val"), col("id").as("qb"))
    a.join(b, Seq("band_id", "band_val"))
      .select(col("qa"), col("qb")).distinct()
  }

  /** Full-precision verification of an (id_a, id_b) candidate-pair
    * frame: join both sides' vectors + precomputed norms, emit
    * `(id_a, id_b, sim)` with the family's 9-dp rounded cosine,
    * thresholded. THE one place the near-dup scoring contract lives —
    * every candidate generator (banded LSH, cluster blocking, …)
    * funnels through it so the entry points cannot diverge. */
  private def verifyPairs(cand: DataFrame, corpus: DataFrame,
                          threshold: Double): DataFrame = {
    val v = corpus.select(col("id"), col("vec"), norm(col("vec")).as("nrm"))
    cand
      .join(v.select(col("id").as("id_a"), col("vec").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 9).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine >=
    * threshold, found via the IVF partitioning (pairs are only compared
    * within a cluster — at scale this is the blocked/bucketed near-dup
    * join, not an all-pairs cross join). Exact within-cluster.
    *
    * At 100× the within-cluster work is quadratic in cluster size; the
    * remedies considered and their trade-offs, deliberately:
    *  - sub-bucketing by sign-projection / int8-code LSH would cut the
    *    quadratic but has recall < 1 for cosine at any finite table
    *    count — it CHANGES the output, so it lives behind the separate
    *    approximate entry point [[srpNearDup]], not silently inside the
    *    exact one;
    *  - norm-decomposition upper bounds (Cauchy-Schwarz over vector
    *    segments, |a_h||b_h|+|a_t||b_t| ≥ dot) are sound but vacuous on
    *    embeddings whose energy spreads evenly across dimensions (the
    *    bound sits at ~1 for every pair) — measured useless here;
    *  - the practical exact-scale path is RECURSIVE BLOCKING: split any
    *    oversized cluster by k-means into sub-clusters and verify the
    *    cross-sub-cluster pairs only where sub-centroid similarity
    *    admits threshold-crossing pairs — exact, but warrants its own
    *    operator when a fixture with mega-clusters exists. */
  def cosineNearDup(corpus: DataFrame, threshold: Double,
                    labelCol: String = "label"): DataFrame = {
    val cand = corpus.select(col(labelCol).as("cluster_id"), col("id").as("id_a"))
      .join(corpus.select(col(labelCol).as("cluster_id"), col("id").as("id_b")),
        Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    verifyPairs(cand, corpus, threshold)
  }

  /** [[cosineNearDup]]'s exact scale path — the recursive-blocking
    * remedy its doc promises. Same output, but no within-cluster pair
    * join may exceed `maxBlock`²:
    *
    *  1. [[refineBlocks]] recursively splits every label cluster larger
    *     than `maxBlock` into `branch` sub-blocks (per-block
    *     deterministic seeds, one distributed assignment pass per depth
    *     level — never a per-block driver loop);
    *  2. [[blockedCandidates]] generates within-block pairs, plus
    *     cross-sub-block pairs ONLY where the blocks' centroid geometry
    *     admits a threshold-crossing pair — the spherical triangle
    *     inequality `angle(a,b) >= angle(ca,cb) - rad_a - rad_b` makes
    *     skipping the rest EXACT, not approximate;
    *  3. the shared [[verifyPairs]] kernel scores the candidates.
    *
    * One honest limit: a mega-block of IDENTICAL vectors cannot be split
    * by any similarity-based method (every member ties to every seed),
    * so such a block stays oversized after `maxDepth` — run exact
    * dedup ([[Dedup]]) before near-dup, which removes it. */
  def cosineNearDupBlocked(corpus: DataFrame, threshold: Double,
                           labelCol: String = "label", maxBlock: Int = 256,
                           branch: Int = 4, maxDepth: Int = 4): DataFrame = {
    val blocks = refineBlocks(corpus, labelCol, maxBlock, branch, maxDepth)
    verifyPairs(blockedCandidates(blocks, threshold), corpus, threshold)
  }

  /** Recursively split label clusters larger than `maxBlock` into
    * `branch` sub-blocks. Each depth level is ONE distributed pass over
    * every oversized block at once: per-block seeds are the `branch`
    * members with the smallest `(md5(id), id)` (a per-block window
    * top-k), and every member joins its own block's seeds and takes the
    * nearest by the family's 9-dp cosine (ties → lowest sub id). Blocks
    * already within the cap never reshuffle. Output: (block, root, id,
    * vec) where `block` is the split path ("<label>~2~0") and `root`
    * the original label — candidate generation never crosses roots, so
    * the operator's output stays exactly [[cosineNearDup]]'s. */
  private[graft] def refineBlocks(corpus: DataFrame, labelCol: String,
                                  maxBlock: Int, branch: Int,
                                  maxDepth: Int): DataFrame = {
    require(branch > 1, "branch must be > 1")
    require(maxBlock >= branch, "maxBlock must be >= branch")
    var blocks = corpus.select(
      col(labelCol).cast("string").as("block"),
      col(labelCol).cast("string").as("root"), col("id"), col("vec"))
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      val over = blocks.groupBy(col("block")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBlock).select(col("block"))
      // the oversized-block list is tiny (≤ |corpus| / maxBlock rows);
      // materialized once because four joins route on it
      val overB = broadcast(over.localCheckpoint())
      if (overB.isEmpty) done = true
      else {
        val target = blocks.join(overB, Seq("block"), "left_semi")
        val keep = blocks.join(overB, Seq("block"), "left_anti")
        val seeds = target
          .withColumn("__r", row_number().over(
            Window.partitionBy(col("block"))
              .orderBy(md5(col("id").cast("string")), col("id"))))
          .filter(col("__r") <= branch)
          .select(col("block"), (col("__r") - 1).cast("long").as("__sub"),
            col("vec").cast("array<double>").as("cvec"))
        val seedsB = broadcast(
          seeds.withColumn("cvn", norm(col("cvec"))).localCheckpoint())
        val assigned = target.withColumn("vn", norm(col("vec")))
          .join(seedsB, Seq("block"))
          .select(col("block"), col("root"), col("id"), col("vec"), col("__sub"),
            round(dot(col("vec"), col("cvec")) / (col("vn") * col("cvn")), 9).as("csim"))
          .withColumn("__r", row_number().over(
            Window.partitionBy(col("block"), col("id"))
              .orderBy(col("csim").desc, col("__sub"))))
          .filter(col("__r") === 1)
          .select(concat(col("block"), lit("~"), col("__sub")).as("block"),
            col("root"), col("id"), col("vec"))
        blocks = keep.unionByName(assigned).localCheckpoint()
        depth += 1
      }
    }
    blocks
  }

  /** Candidate (id_a, id_b) pairs from a refined (block, root, id, vec)
    * frame: all within-block pairs, plus pairs across two same-root
    * blocks whose centroid angle minus both angular radii still reaches
    * `arccos(threshold)` — by the spherical triangle inequality no pair
    * in a skipped block pair can score >= threshold, so the pruning is
    * exact. Block metadata (centroid, norm, radius) is |blocks| rows —
    * broadcast; the block-pair admission test is a same-root self-join
    * of that tiny frame, and each admitted pair's member join is at most
    * maxBlock × maxBlock. */
  private[graft] def blockedCandidates(blocks: DataFrame,
                                       threshold: Double): DataFrame = {
    require(threshold > -1.0 && threshold <= 1.0,
      "threshold must be in (-1, 1]")
    val clamped = (c: Column) => acos(least(lit(1.0), greatest(lit(-1.0), c)))
    val cent = meanByCluster(blocks.select(col("block").as("cluster_id"), col("vec")))
      .select(col("cluster_id").as("block"), col("cvec"))
      .withColumn("cvn", norm(col("cvec")))
    val meta = blocks.withColumn("vn", norm(col("vec")))
      .join(broadcast(cent), Seq("block"))
      .groupBy(col("block"), col("root"))
      .agg(max(clamped(dot(col("vec"), col("cvec")) / (col("vn") * col("cvn"))))
        .as("rad"))
      .join(cent, Seq("block"))
      .localCheckpoint()
    val a = meta.select(col("block").as("ba"), col("root"),
      col("cvec").as("ca"), col("cvn").as("na"), col("rad").as("ra"))
    val b = meta.select(col("block").as("bb"), col("root"),
      col("cvec").as("cb"), col("cvn").as("nb"), col("rad").as("rb"))
    // 1e-9 slack absorbs float error in the angle arithmetic — slack can
    // only ADMIT a borderline block pair (extra verification work), never
    // skip one, so exactness is preserved
    val admitted = a.join(b, Seq("root"))
      .filter(col("ba") <= col("bb"))
      .filter(col("ba") === col("bb") ||
        clamped(dot(col("ca"), col("cb")) / (col("na") * col("nb")))
          - col("ra") - col("rb") <= lit(math.acos(threshold) + 1e-9))
      .select(col("ba"), col("bb"))
    val mem = blocks.select(col("block"), col("id"))
    val diag = admitted.filter(col("ba") === col("bb")).select(col("ba"))
    val diagPairs = mem.join(broadcast(diag), col("block") === col("ba"))
      .select(col("ba"), col("id").as("id_a"))
      .join(mem.select(col("block"), col("id").as("id_b")),
        col("ba") === col("block") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val off = admitted.filter(col("ba") < col("bb"))
    // each unordered cross pair appears exactly once in members(ba) ×
    // members(bb); least/greatest canonicalizes the id order
    val offPairs = mem.join(broadcast(off), col("block") === col("ba"))
      .select(col("bb"), col("id").as("__x"))
      .join(mem.select(col("block"), col("id").as("__y")), col("bb") === col("block"))
      .select(least(col("__x"), col("__y")).as("id_a"),
        greatest(col("__x"), col("__y")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    diagPairs.unionAll(offPairs)
  }

  /** Sparse TF-IDF cosine similarity JOIN over raw text — the
    * similarity-search path that needs no embedding model at all: each
    * document is a sparse vector of `tf × idf` token weights and the
    * pair dot products come from an inverted-index self-join on token
    * (only pairs sharing ≥1 token are ever materialized — the sparse
    * analog of the LSH-banded candidate generation, and the standard
    * scale shape for all-pairs text similarity).
    *
    * Determinism contract: weights are INTEGERS — idf is quantized to
    * milli-units (`floor(ln(N/df)·1000 + 0.5)`, both engines compute
    * the same double then floor it), a weight is `tf · idf₃`
    * (≤ 4e6), and dots/norms² are int64 sums of weight products
    * (≤ 1.6e13/term — no overflow, no float summation order). Only the
    * final cosine divides in double (IEEE sqrt/÷ are exactly rounded).
    *
    * `maxDf` prunes tokens present in more than maxDf documents from
    * the VECTOR SPACE itself (not just the index): hot near-stopwords
    * generate quadratic candidates while carrying ~zero idf weight —
    * at 100× corpus scale the cap is what bounds the self-join.
    * Mirrored in the oracle. Output: (doc_a, doc_b, cos) with
    * cos ≥ minCos, rounded to 6 dp. */
  def tfidfCosineJoin(docs: DataFrame, textCol: String, idCol: String,
                      minCos: Double, maxDf: Option[Int] = None,
                      shingleN: Int = 1): DataFrame = {
    val tf = tfOf(docs, textCol, idCol, shingleN)
    val dfc = dfOf(tf)
    tfidfCosineCore(docs, tf, maxDf.fold(dfc)(cap => dfc.filter(col("df") <= cap)),
      minCos)
  }

  /** [[tfidfCosineJoin]] with the df cap DERIVED from a candidate
    * budget instead of hand-set — the chooser discipline the ED-Join
    * blocklist budget set (each kept token with document frequency d
    * contributes C(d,2) inverted-index candidate pairs, so a FIXED cap
    * lets the pair volume grow superlinearly as the corpus grows: the
    * r14 sf1 ritual measured 4.1× work at 10× rows). The cap is the
    * largest df whose cumulative pair cost Σ_{d ≤ cap} m_d·C(d,2)
    * stays within `pairsPerDoc·n` — candidate volume then scales
    * LINEARLY with the corpus by construction. Deterministic from the
    * corpus alone (integer arithmetic over the df histogram), so the
    * DuckDB oracle replays the derivation. Floor 2: a df-1 token
    * yields no pairs, so any functioning cap admits at least the
    * rare-pair tokens — if even those exceed the budget the operator
    * still runs at the floor (the budget is a scaling contract, not a
    * hard admission gate). */
  def tfidfCosineJoinBudgeted(docs: DataFrame, textCol: String, idCol: String,
                              minCos: Double, pairsPerDoc: Int = 32,
                              shingleN: Int = 1): DataFrame = {
    require(pairsPerDoc >= 1, "pairsPerDoc must be positive")
    // one corpus tokenization feeds chooser, weights and norms alike
    val tf = tfOf(docs, textCol, idCol, shingleN).localCheckpoint()
    val dfc = dfOf(tf)
    val cap = dfCapFor(dfc, pairsPerDoc.toLong * CorpusCount.of(docs))
    tfidfCosineCore(docs, tf, dfc.filter(col("df") <= cap), minCos)
  }

  /** The budget→cap solve over the df histogram: largest df whose
    * cumulative C(d,2) candidate cost fits `budget`. The histogram is
    * bounded driver state — at most `probeCeiling` distinct df values
    * (tokens hotter than the ceiling could only be admitted by a
    * budget that already dwarfs any practical candidate volume). */
  private[graft] def dfCapFor(dfc: DataFrame, budget: Long,
                              probeCeiling: Long = 100000L): Int = {
    val dist = dfc.filter(col("df") <= probeCeiling && col("df") >= 2)
      .groupBy(col("df"))
      .agg(expr("count(*) * df * (df - 1) DIV 2").as("cost"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    var cap = 2L
    dist.foreach { case (df, cost) =>
      cum += cost
      if (cum <= budget) cap = df
    }
    math.max(cap, 2L).toInt
  }

  private def tfOf(docs: DataFrame, textCol: String, idCol: String,
                   shingleN: Int): DataFrame = {
    val terms = if (shingleN <= 1) split(col(textCol), " ")
      else Dedup.shingles(col(textCol), shingleN)
    docs.select(col(idCol).as("doc_id"), explode(terms).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
  }

  private def dfOf(tf: DataFrame): DataFrame =
    tf.groupBy(col("t")).agg(count(lit(1)).as("df"))

  private def tfidfCosineCore(docs: DataFrame, tf: DataFrame,
                              dfKept: DataFrame, minCos: Double): DataFrame = {
    val n = docs.select(count(lit(1)).as("n"))
    val weights = tf.join(dfKept, Seq("t")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("t"),
        (col("c") * floor(log(col("n").cast("double") / col("df").cast("double"))
          * 1000.0 + 0.5).cast("long")).as("w"))
    val norms = weights.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).as("ns"))
    val a = weights.select(col("doc_id").as("doc_a"), col("t"), col("w").as("wa"))
    val b = weights.select(col("doc_id").as("doc_b"), col("t"), col("w").as("wb"))
    a.join(b, Seq("t")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("doc_a"), col("ns").as("nsa")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("ns").as("nsb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("dot").cast("double") /
          (sqrt(col("nsa").cast("double")) * sqrt(col("nsb").cast("double"))), 6)
          .as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** SemDeDup-shaped SEMANTIC dedup: embedding-space near-duplicate
    * removal, clustered so no similarity pair is ever scored across the
    * whole corpus (Abbas et al. 2023's recipe re-expressed on the
    * engine's deterministic primitives).
    *
    *  1. cluster with [[kmeansCodebook]] (md5-seeded init, fixed
    *     iterations, decimal-exact means — the whole model is
    *     oracle-replayable, and each round moves only k·dim doubles);
    *  2. assign every vector to its nearest centroid with the family's
    *     9-dp rounded cosine (ties → lowest cluster id);
    *  3. WITHIN each cluster only, a vector is dropped when some
    *     SMALLER-id cluster-mate sits at cosine ≥ `threshold` — the
    *     deterministic keep-first rule. This is deliberately the
    *     non-transitive variant: b near a and c near b (but not near a)
    *     drops BOTH b and c, pruning ε-chains aggressively — the
    *     behavior curation wants for "too semantically close to
    *     something we already kept". Transitive-cluster semantics are
    *     the [[Dedup.nearDupClusters]] composition over emitted pairs.
    *
    * Clustering makes it approximate BY DESIGN: a near pair split
    * across cluster boundaries survives (the paper's trade; raise k for
    * tighter clusters, or run [[cosineNearDupBlocked]] for the exact
    * frontier). Scale shape: one broadcast-join assignment scan, then a
    * self-join bucketed on cluster_id — cluster occupancy ~n/k keeps
    * the pair stage linear ONLY when k grows with the corpus (Σ c² ≈
    * n²/k at fixed k), so the pair stage sits behind an OCCUPANCY
    * GUARD ([[graft.operators.Dedup.editNearDupPrefix]]'s discipline):
    * the exact pair volume Σ c·(c−1)/2 costs one k-row aggregation of
    * the already-materialized assignment, and a volume above
    * `maxPairsPerVec`·n refuses the quadratic with the remedy named
    * (raise k ≈ n / target-occupancy) instead of silently running it.
    * Int.MaxValue disables. The assignment is localCheckpoint'd — the
    * guard reads it once and the pair join's two sides plus the final
    * census reuse it instead of re-running k-means three times.
    *
    * Output census, one row per vector: (vec_id, cluster_id, kept
    * 1|0). */
  def semanticDedup(corpus: DataFrame, k: Int, iters: Int,
                    threshold: Double,
                    maxPairsPerVec: Int = 5000): DataFrame = {
    val cent = kmeansCodebook(corpus, k, iters)
      .withColumn("cvn", norm(col("cvec")))
    val assigned = corpus
      .select(col("id"), col("vec"), norm(col("vec")).as("vn"))
      .join(broadcast(cent))
      .select(col("id"), col("vec"), col("vn"), col("cluster_id"),
        round(dot(col("vec"), col("cvec")) / (col("vn") * col("cvn")), 9).as("csim"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cluster_id"))))
      .filter(col("r") === 1)
      .select(col("id"), col("cluster_id"), col("vec"), col("vn"))
      .localCheckpoint()
    dedupCensus(assigned, threshold, maxPairsPerVec)
  }

  /** The guard + pair + census stage shared by [[semanticDedup]] and
    * [[semanticDedupHier]]: over a localCheckpoint'd assignment
    * (id, cluster_id, vec, vn), refuse when the exact within-cluster
    * pair volume Σ C(c,2) exceeds `maxPairsPerVec`·n (one cheap
    * aggregation of the materialized frame), else run the
    * cluster-bucketed self-join and emit the keep-first census. */
  private def dedupCensus(assigned: DataFrame, threshold: Double,
                          maxPairsPerVec: Int): DataFrame = {
    if (maxPairsPerVec != Int.MaxValue) {
      val occ = assigned.groupBy(col("cluster_id")).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") * (col("c") - lit(1))), lit(0L)).as("p2"),
          coalesce(sum(col("c")), lit(0L)).as("n")).head()
      val (pairs, n) = (occ.getLong(0) / 2, math.max(occ.getLong(1), 1L))
      if (pairs > maxPairsPerVec.toLong * n)
        throw new IllegalStateException(
          s"semanticDedup: within-cluster pair volume $pairs exceeds " +
          s"$maxPairsPerVec/vector over $n vectors — at fixed k the " +
          s"cluster-pair stage is quadratic (Σ c² ≈ n²/k). Raise k with " +
          s"the corpus (k ≈ n / target cluster occupancy), tighten " +
          s"clusters with more iters, or raise maxPairsPerVec explicitly " +
          s"to accept the cost.")
    }
    val l = assigned.select(col("cluster_id"), col("id").as("id_a"),
      col("vec").as("va"), col("vn").as("na"))
    val rr = assigned.select(col("cluster_id"), col("id").as("id_b"),
      col("vec").as("vb"), col("vn").as("nb"))
    val dropped = l.join(rr, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b") &&
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 9)
          >= threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("is_dropped", lit(1))
    assigned.join(dropped, Seq("id"), "left_outer")
      .select(col("id").as("vec_id"), col("cluster_id"),
        when(col("is_dropped").isNull, lit(1)).otherwise(lit(0)).as("kept"))
  }

  /** Uniform random negative sampling — [[hardNegatives]]' cheap twin
    * for contrastive-training batch assembly: per query, `k` candidate
    * ids drawn by a seeded hash (`md5_60("qid_neg_i") mod n` — both
    * engines replay the draw exactly, no RNG state), then the drawn
    * vectors fetched by ONE equi-join (the tiny candidate frame
    * broadcasts into the corpus scan) and filtered to true negatives
    * (different label, not the query itself) — so a query ends up with
    * ≤ k negatives, the standard over-draw-and-filter recipe.
    *
    * Assumes a DENSE id space (ids 0..n−1, the embeddings fixture's
    * contract and the common case after any repartition-and-rewrite);
    * a sparse id space wants a rank-densify pass first — at 100 TB
    * that is one zipWithIndex-style prefix-sum job, not a sort. */
  def uniformNegatives(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val n = emb.agg(count(lit(1)).as("n"))
    val cand = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"))
      .crossJoin(broadcast(n))
      .withColumn("i", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("neg_id",
        pmod(graft.operators.Dedup.md5Hash60(
          concat(col("query_id"), lit("_neg_"), col("i"))), col("n")))
    emb.select(col("vec_id"), col("label"))
      .join(broadcast(cand), col("neg_id") === col("vec_id"))
      .filter(col("label") =!= col("q_label") && col("neg_id") =!= col("query_id"))
      .select(col("query_id"), col("i"), col("neg_id"),
        col("label").as("neg_label"))
  }

  /** Two-level (hierarchical) cluster assignment — the SUBQUADRATIC
    * codebook path. Flat k-means with occupancy-preserving k = n/occ
    * costs O(n·k) = O(n²/occ) in assignment alone (every vector scores
    * every centroid), which just moves [[semanticDedup]]'s quadratic
    * from the pair join into the codebook; splitting k into k1 coarse ×
    * k2 fine centroids costs O(n·k1 + n·k2) = O(n·√k) when k1 ≈ k2 ≈ √k
    * — n^1.5 overall, the standard IVF-style two-level recipe.
    *
    *  - COARSE: a [[kmeansCodebook]] over k1 centroids (√k stays model-
    *    sized: ~4k centroids at n=1e9/occ=64, broadcastable), one
    *    broadcast-join assignment pass.
    *  - FINE: k-means PER COARSE GROUP, all groups trained in PARALLEL
    *    with NO driver collect — seeds are each group's k2 smallest
    *    (md5-60bit(id), id) vectors via a per-group window (bounded:
    *    coarse groups hold ~occ·k2 = occ·√k rows by construction — a
    *    253k-row task at n=1e9 — so the window never one-task-sorts an
    *    unbounded group; a skew-collapsed coarse cluster shows up
    *    downstream as pair-volume and trips the census guard), then
    *    `iters` rounds of: equi-join on coarse (k2 candidates each),
    *    9-dp-cosine argmax with j tie-break, DECIMAL(27,15) component
    *    means grouped by (coarse, j), empty cells keeping their
    *    previous centroid. The centroid frame (k rows) localCheckpoints
    *    per round — model state, bounded, never corpus-sized.
    *
    * Every determinism pin of the flat path carries over, so the whole
    * two-level construction replays in the DuckDB oracle. Output:
    * (id, cluster_id = coarse·k2 + j, vec, vn). */
  def hierAssign(corpus: DataFrame, k1: Int, k2: Int, iters: Int): DataFrame = {
    require(k1 > 0 && k2 > 0 && iters >= 0)
    val coarseCent = kmeansCodebook(corpus, k1, iters)
      .withColumnRenamed("cluster_id", "coarse")
      .withColumn("cvn", norm(col("cvec")))
    val base = corpus.select(col("id"),
      col("vec").cast("array<double>").as("v"), norm(col("vec")).as("vn"))
    val casg = base.join(broadcast(coarseCent))
      .select(col("id"), col("v"), col("vn"), col("coarse"),
        round(dot(col("v"), col("cvec")) / (col("vn") * col("cvn")), 9).as("csim"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("csim").desc, col("coarse"))))
      .filter(col("r") === 1)
      .select(col("id"), col("v"), col("vn"), col("coarse"))
      .localCheckpoint()
    var cent = casg
      .withColumn("j", row_number().over(
        Window.partitionBy(col("coarse"))
          .orderBy(graft.operators.Dedup.md5Hash60(col("id").cast("string")), col("id"))) - 1)
      .filter(col("j") < k2)
      .select(col("coarse"), col("j"), col("v").as("cvec"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val cn = cent.withColumn("cvn", norm(col("cvec")))
      val asg = casg.join(cn, Seq("coarse"))
        .select(col("id"), col("coarse"), col("j"), col("v"),
          round(dot(col("v"), col("cvec")) / (col("vn") * col("cvn")), 9).as("csim"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("csim").desc, col("j"))))
        .filter(col("r") === 1)
      val means = asg.select(col("coarse"), col("j"), posexplode(col("v")))
        .groupBy(col("coarse"), col("j"), col("pos"))
        .agg((sum(col("col").cast("decimal(27,15)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("coarse"), col("j"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("coarse"), col("j"),
          transform(col("pm"), x => x.getField("m")).as("mvec"))
      cent = cent.join(means, Seq("coarse", "j"), "left_outer")
        .select(col("coarse"), col("j"),
          coalesce(col("mvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    val cn = cent.withColumn("cvn", norm(col("cvec")))
    casg.join(cn, Seq("coarse"))
      .select(col("id"), col("coarse"), col("j"), col("v"), col("vn"),
        round(dot(col("v"), col("cvec")) / (col("vn") * col("cvn")), 9).as("csim"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("csim").desc, col("j"))))
      .filter(col("r") === 1)
      .select(col("id"),
        (col("coarse") * k2 + col("j")).as("cluster_id"),
        col("v").as("vec"), col("vn"))
  }

  /** [[semanticDedup]] over the two-level [[hierAssign]] codebook —
    * same keep-first census, same occupancy guard, subquadratic
    * end-to-end. */
  def semanticDedupHier(corpus: DataFrame, k1: Int, k2: Int, iters: Int,
                        threshold: Double,
                        maxPairsPerVec: Int = 5000): DataFrame =
    dedupCensus(hierAssign(corpus, k1, k2, iters).localCheckpoint(),
      threshold, maxPairsPerVec)

  /** [[semanticDedup]] with k DERIVED from the corpus size — the
    * round-7-verdict remedy made the default path: k = max(minK,
    * ⌈n / targetOccupancy⌉) from one count(), so expected cluster
    * occupancy — and with it the within-cluster pair stage
    * Σ C(c,2) ≈ n·occ/2 — stays CONSTANT as the corpus grows. The
    * fixed-k form's Σ c² ≈ n²/k quadratic drift (measured 5.7× for 10×
    * rows at sf1) becomes linear-in-n here; the guard rides along at
    * 4·targetOccupancy pairs/vector, so skew-collapsed clusterings
    * still refuse loudly instead of running the quadratic.
    *
    * The oracle-gated entry keeps EXPLICIT k (a derived k would bake
    * the fixture's row count into the oracle SQL); this is the
    * production entry point. Bound to respect at extreme scale: the
    * codebook broadcasts, so k·dim must stay driver/executor-friendly
    * (~1e6 floats); past that, shard codebook training per partition
    * (the IVF route) before raising k further. */
  def semanticDedupAuto(corpus: DataFrame, iters: Int, threshold: Double,
                        targetOccupancy: Int = 64, minK: Int = 2): DataFrame = {
    require(targetOccupancy > 0)
    val n = CorpusCount.of(corpus)
    val k = math.max(minK.toLong,
      (n + targetOccupancy - 1) / targetOccupancy).min(Int.MaxValue).toInt
    // route through the TWO-LEVEL codebook: flat assignment at k = n/occ
    // is itself O(n·k) = O(n²/occ) — deriving k fixes the pair stage but
    // not the codebook; k1 ≈ k2 ≈ √k makes the whole path O(n^1.5)
    val k1 = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val k2 = math.max(minK, (k + k1 - 1) / k1)
    semanticDedupHier(corpus, k1, k2, iters, threshold,
      maxPairsPerVec = 4 * targetOccupancy)
  }

  /** Product-quantization ANN (Jégou, Douze, Schmid, TPAMI 2011),
    * inner-product/cosine flavor: the embedding splits into `m`
    * contiguous subspaces of `subDim` dims, each quantized by its own
    * deterministic [[kmeansCodebook]] (same md5 seeding, 9-dp cosine
    * assignment, DECIMAL means — the whole construction replays in the
    * oracle); a corpus vector is stored as m small codes. Query-time
    * scoring is ASYMMETRIC (ADC): per query, a lookup table of
    * dot(query_sub, centroid) per (subspace, code) — m·k entries —
    * is broadcast, and each candidate's approximate cosine is the
    * FIXED-ORDER sum d0+d1+…+dm-1 against the reconstructed norm
    * sqrt(e0+…+em-1), so no query-time arithmetic ever touches a raw
    * corpus vector.
    *
    * Scale: this is the memory story brute force can't tell — the
    * searched representation is m codes/vector (m·log2(k) bits), the
    * per-query work is m broadcast-LUT hash joins plus one top-k
    * window, and the full-precision corpus stays at rest. Ties (vectors
    * sharing all m codes score identically) break by vec_id. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, subDim: Int = 16, kSub: Int = 5,
             iters: Int = 2): DataFrame = {
    val (books, allCodes) = pqBooksAndCodes(corpus, m, subDim, kSub, iters)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val luts = pqLuts(q, books, m, subDim)
    val joined = (1 until m).foldLeft(
      allCodes.join(broadcast(luts(0)), Seq("code0"))) { (acc, mi) =>
      acc.join(broadcast(luts(mi)), Seq("query_id", s"code$mi"))
    }
    pqAdcRank(joined, q, m, k)
  }

  /** Train the m per-subspace codebooks and assign every corpus vector
    * its m codes — the build half shared by [[pqTopK]] (exhaustive ADC)
    * and [[ivfPqTopK]] (IVF-pruned ADC).
    *
    * All m books train in ONE iteration loop over a tagged long-form
    * frame (mi, id, subvector) rather than m independent
    * [[kmeansCodebook]] runs: the m per-subspace trainings are
    * embarrassingly independent, and running them sequentially cost
    * m·(1 seed collect + iters·(assign + means collect)) driver
    * round-trips — the PQ pair measured ~70–90 Spark JOBS per query
    * with only ~0.1 core-seconds of parallel work per job, i.e. the
    * plan was scheduler-latency-bound and amplified every ambient
    * jitter (the r14 "ANN-PQ residual" was exactly this noise).
    * Batched, the loop is 1 seed collect + iters collects + one code
    * assignment TOTAL, and each job carries m× the work — fewer,
    * fatter barriers, the shape a 1000-executor cluster needs anyway.
    *
    * Bit-identical to the per-subspace runs by construction: the seed
    * draw `(md5(id), id) limit k` selects the SAME ids for every
    * subspace (the order does not depend on the vector), assignment is
    * the family kernel (9-dp cosine, cluster_id tie-break) per
    * (mi, id), and means replay [[meanByCluster]]'s DECIMAL(27,15)
    * component sums per (mi, cluster) — grouping by the extra mi tag
    * changes which rows share a group, not any group's arithmetic. */
  private def pqBooksAndCodes(corpus: DataFrame, m: Int, subDim: Int,
                              kSub: Int, iters: Int): (Seq[DataFrame], DataFrame) = {
    require(m >= 1 && subDim >= 1 && kSub >= 1, "pq shape must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val tagged = corpus.select(col("id"), posexplode(array((0 until m).map(mi =>
        slice(col("vec"), mi * subDim + 1, subDim)): _*)))
      .select(col("id"), col("pos").as("mi"), col("col").as("vec"))
    // seeds for ALL books from one top-k + one bounded fetch: the seed
    // draw orders by (md5(id), id) — independent of the vector, so
    // every subspace seeds from the SAME k ids (what lets the books
    // share one draw); slices cast to double exactly like
    // kmeansCodebook's seed read
    val seedIds = corpus
      .select(md5(col("id").cast("string")).as("__h"), col("id"))
      .orderBy(col("__h"), col("id")).limit(kSub)
      .select(col("id")).collect().map(_.get(0))
    val seedRank: Map[Any, Long] =
      seedIds.zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    val seedSlices = tagged
      .filter(col("id").isin(seedIds: _*))
      .select(col("mi"), col("id"),
        col("vec").cast("array<double>").as("cvec"))
      .collect()
      .map(r => (r.getInt(0), seedRank(r.get(1)), r.getSeq[Double](2)))
    var cent: Map[Int, Seq[(Long, Seq[Double])]] = seedSlices
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3)).toSeq).toMap
    def centDf(): DataFrame = cent.toSeq
      .flatMap { case (mi, cs) => cs.map { case (cid, v) => (mi, cid, v) } }
      .toDF("mi", "cluster_id", "cvec")
      .withColumn("cvn", norm(col("cvec")))
    def assign(): DataFrame = tagged
      .select(col("mi"), col("id"), col("vec"), norm(col("vec")).as("vn"))
      .join(broadcast(centDf()), Seq("mi"))
      .select(col("mi"), col("id"), col("vec"), col("cluster_id"),
        round(dot(col("vec"), col("cvec")) / (col("vn") * col("cvn")), 9)
          .as("csim"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("mi"), col("id"))
          .orderBy(col("csim").desc, col("cluster_id"))))
      .filter(col("r") === 1)
    for (_ <- 1 to iters) {
      // meanByCluster's arithmetic with the mi tag in the group key
      val means = assign()
        .select(col("mi"), col("cluster_id").as("g"), posexplode(col("vec")))
        .groupBy(col("mi"), col("g"), col("pos"))
        .agg((sum(col("col").cast("decimal(27,15)")).cast("double") /
          count(lit(1))).as("centroid"))
        .groupBy(col("mi"), col("g"))
        .agg(array_sort(collect_list(struct(col("pos"), col("centroid")))).as("pm"))
        .select(col("mi"), col("g"),
          transform(col("pm"), x => x.getField("centroid")).as("cvec"))
        .as[(Int, Long, Seq[Double])].collect()
        .groupBy(_._1).view
        .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
      cent = cent.map { case (mi, cs) =>
        mi -> cs.map { case (cid, prev) =>
          (cid, means.getOrElse(mi, Map.empty[Long, Seq[Double]])
            .getOrElse(cid, prev)) }
      }
    }
    val books = (0 until m).map(mi => cent(mi).toDF("cluster_id", "cvec"))
    // one batched code assignment for all m subspaces, pivoted to the
    // (id, code0..code{m-1}) shape the ADC joins consume
    val codeAggs = (0 until m).map(mi =>
      max(when(col("mi") === mi, col("cluster_id"))).as(s"code$mi"))
    val allCodes = assign()
      .select(col("mi"), col("id"), col("cluster_id"))
      .groupBy(col("id"))
      .agg(codeAggs.head, codeAggs.tail: _*)
    (books, allCodes)
  }

  /** ADC lookup tables: per (query, subspace, code) the subspace dot
    * and the centroid self-dot (for the reconstructed norm). `q` must
    * carry (query_id, qv, qn). */
  private def pqLuts(q: DataFrame, books: Seq[DataFrame], m: Int,
                     subDim: Int): Seq[DataFrame] =
    (0 until m).map { mi =>
      q.select(col("query_id"),
          slice(col("qv"), mi * subDim + 1, subDim).as("qs"))
        .crossJoin(broadcast(books(mi)))
        .select(col("query_id"), col("cluster_id").as(s"code$mi"),
          dot(col("qs"), col("cvec")).as(s"d$mi"),
          dot(col("cvec"), col("cvec")).as(s"e$mi"))
    }

  /** The ADC scoring tail: fixed left-to-right d/e sums (deterministic
    * and oracle-mirrored), reconstructed-norm cosine, per-query top-k. */
  private def pqAdcRank(joined: DataFrame, q: DataFrame, m: Int,
                        k: Int): DataFrame = {
    val sumd = (1 until m).foldLeft(col("d0"))((a, mi) => a + col(s"d$mi"))
    val sume = (1 until m).foldLeft(col("e0"))((a, mi) => a + col(s"e$mi"))
    joined
      .join(broadcast(q.select(col("query_id"), col("qn"))), "query_id")
      .select(col("query_id"), col("id").as("vec_id"),
        round(sumd / (col("qn") * sqrt(sume)), 9).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF+PQ+refine — the three-stage search every production ANN
    * service (the FAISS `IVFPQ` default) runs at corpus scale, composed
    * from the repo's own gated stages: (1) the deterministic coarse
    * k-means codebook prunes the corpus to the `nprobe` clusters
    * nearest each query (the [[ivfTopKWithCodebook]] probe), (2)
    * PQ-ADC scores ONLY the pruned candidates through the broadcast
    * lookup tables — the scanned representation is m codes/vector, the
    * raw corpus stays at rest, (3) the top `k·overfetch` ADC shortlist
    * re-scores in full precision and exact order (the
    * [[quantizedTopK]] refine move, so ADC approximation error can
    * reorder but only within the shortlist). This variant quantizes
    * raw vectors, not IVF residuals — the residual refinement changes
    * the codebook inputs, not the plan shape.
    *
    * Scale: stage-1 assignment + probe are broadcast joins; stage-2
    * candidate volume is corpus·nprobe/kCoarse rows of m codes; stage-3
    * touches |queries|·k·overfetch raw vectors via a broadcast semi
    * fetch. Nothing is ever all-pairs. Deterministic end-to-end (9-dp
    * rounding, vec_id/cluster_id tie-breaks at every rank cut), so the
    * DuckDB oracle replays coarse codebook, subspace codebooks, probe,
    * ADC and refine bit-for-bit. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                kCoarse: Int = 5, nprobe: Int = 2, m: Int = 4,
                subDim: Int = 16, kSub: Int = 5, iters: Int = 2,
                overfetch: Int = 3): DataFrame = {
    require(nprobe >= 1 && overfetch >= 1, "nprobe/overfetch must be positive")
    val coarse = kmeansCodebook(corpus, kCoarse, iters)
    val assigned = assignToCodebook(corpus, coarse)
    val (books, allCodes) = pqBooksAndCodes(corpus, m, subDim, kSub, iters)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val luts = pqLuts(q, books, m, subDim)
    val cent = coarse.withColumn("cvn", norm(col("cvec")))
    val probes = q.join(broadcast(cent))
      .select(col("query_id"), col("cluster_id"),
        round(dot(col("qv"), col("cvec")) / (col("qn") * col("cvn")), 9).as("csim"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cluster_id"))))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("cluster_id"))
    // IVF prune: only codes in probed clusters meet each query's LUTs;
    // self-match excluded like the IVF entry (a search service never
    // returns the query itself)
    val cand = allCodes.join(assigned, col("id") === col("vec_id"))
      .drop("vec_id")
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("query_id") =!= col("id"))
    val joined = (0 until m).foldLeft(cand) { (acc, mi) =>
      acc.join(broadcast(luts(mi)), Seq("query_id", s"code$mi"))
    }
    val shortlist = pqAdcRank(joined, q, m, k * overfetch)
      .select(col("query_id"), col("vec_id"))
    // full-precision refine over the bounded shortlist
    val c = corpus.select(col("id").as("vec_id"), col("vec").as("cv"),
      norm(col("vec")).as("cn"))
    c.join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Semantic-dedup threshold sweep — the release artifact that turns
    * a dedup threshold from a guess into a decision: for each τ in
    * `thresholds`, how much corpus survives keep-first dedup at that
    * cosine bar. One verified pair pass at the LOOSEST τ feeds every
    * row — per doc, only max(sim to any smaller-id neighbor) matters,
    * so the sweep costs one grouped max + a |thresholds|-way literal
    * explode over it, never a re-dedup per τ. Pairs come from the
    * exact blocked path ([[cosineNearDupBlocked]]); keep-first rule =
    * drop v iff some u < v has sim(u,v) ≥ τ (the [[semanticDedup]]
    * rule on the exact pair set). Output: (tau, n_total, n_dropped,
    * n_kept, kept_ppm), τ ascending. */
  def dedupThresholdSweep(corpus: DataFrame, thresholds: Seq[Double],
                          labelCol: String = "label",
                          maxBlock: Int = 256): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val pairs = cosineNearDupBlocked(corpus, thresholds.min, labelCol, maxBlock)
    val maxPrev = pairs.groupBy(col("id_b")).agg(max(col("sim")).as("ms"))
    val tdf = corpus.sparkSession.range(1)
      .select(explode(array(thresholds.sorted.map(lit(_)): _*)).as("tau"))
    val tot = corpus.agg(count(lit(1)).as("n_total"))
    val drops = maxPrev.crossJoin(broadcast(tdf))
      .filter(col("ms") >= col("tau"))
      .groupBy(col("tau")).agg(count(lit(1)).as("n_dropped"))
    tdf.join(drops, Seq("tau"), "left_outer").crossJoin(broadcast(tot))
      .select(col("tau"), col("n_total"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
      .select(col("tau"), col("n_total"), col("n_dropped"),
        (col("n_total") - col("n_dropped")).as("n_kept"),
        // empty corpus → NULL ppm, not an ANSI division error
        expr("CASE WHEN n_total > 0 THEN " +
          "CAST((n_total - n_dropped) * 1000000 div n_total AS BIGINT) END")
          .as("kept_ppm"))
      .orderBy(col("tau"))
  }

  /** Per-group mean-pooled embedding (long form) — the embedding
    * aggregation every pipeline runs to build class/topic prototypes,
    * bi-encoder training targets, or per-source style vectors: for
    * each (group, dimension), the DECIMAL(27,15)-exact mean over the
    * group's vectors (the [[labelCodebook]] arithmetic, exposed as
    * rows rather than packed arrays so the result joins/gates like any
    * frame). One posexplode + one partial-aggregated shuffle of
    * (group, pos, sum, count) — linear at any corpus size; group count
    * bounds the output. Output: (g, pos, n, centroid). */
  def meanPool(corpus: DataFrame, groupCol: String): DataFrame =
    // double BEFORE decimal: a raw float→decimal cast rounds the
    // float's SHORTEST string, not its binary value — engines then
    // disagree by ulps (caught by this entry's gate; the kmeans
    // path never exposed it because means feed a 9-dp cosine)
    meanLongForm(corpus.select(col(groupCol).as("g"),
      col("vec").cast("array<double>").as("vec")))

  /** Nearest-centroid assignment against an explicit codebook —
    * (vec_id, cluster_id), the standalone form of the stage every IVF /
    * semantic-dedup path runs inline: 9-dp rounded cosine with the
    * cluster_id tie-break (the family kernel), codebook broadcast
    * (model parameters, not data), one corpus scan. */
  def assignToCodebook(corpus: DataFrame, codebook: DataFrame): DataFrame =
    rankedCentroidSims(corpus, codebook)
      .filter(col("r") === 1)
      .select(col("vec_id"), col("cluster_id"))

  /** THE centroid-scoring kernel, shared by [[assignToCodebook]],
    * [[ivfTopKWithCodebook]] (both stages) and [[silhouette]]: every
    * input vector against every broadcast centroid with the family
    * 9-dp cosine and the (csim DESC, cluster_id) rank — r = 1 is the
    * assignment argmax, r ≤ nprobe the probe set. ONE definition so
    * the rounding and tie-break the DuckDB oracles replay can never
    * drift between operators. Centroid norms are hoisted out of the
    * per-(vector, centroid) kernel — norm is a pure per-array quantity,
    * so precomputing it is bit-identical and saves an array walk per
    * pair. Output: (vec_id, cv, cn, cluster_id, csim, r). */
  private def rankedCentroidSims(vectors: DataFrame,
                                 codebook: DataFrame): DataFrame = {
    val cent = codebook.withColumn("cvn", norm(col("cvec")))
    vectors.select(col("id").as("vec_id"), col("vec").as("cv"),
        norm(col("vec")).as("cn"))
      .join(broadcast(cent))
      .select(col("vec_id"), col("cv"), col("cn"), col("cluster_id"),
        round(dot(col("cv"), col("cvec")) / (col("cn") * col("cvn")), 9).as("csim"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cluster_id"))))
  }

  /** Cluster-balanced ("topic-balanced") corpus sampling — the curation
    * move that stops one dominant topic from owning the training mix:
    * k-means topics over embeddings (the deterministic, oracle-replayed
    * codebook), then at most `quota` vectors kept per cluster, chosen
    * in the content-addressed (md5('tb_'‖id), id) order so both engines
    * draw the SAME sample. The per-cluster rank is [[Rank.cellRank]]
    * over md5-prefix cells — topics are few and large BY CONSTRUCTION,
    * exactly the regime where a plain per-cluster window would funnel
    * each topic through one task. Output: kept (cluster_id, vec_id,
    * rn ≤ quota). */
  def topicBalance(corpus: DataFrame, k: Int, iters: Int,
                   quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val asg = assignToCodebook(corpus, kmeansCodebook(corpus, k, iters))
      .withColumn("h", md5(concat(lit("tb_"), col("vec_id").cast("string"))))
      .withColumn("__b", Rank.md5Bucket(col("h")))
    Rank.cellRank(asg, Seq("cluster_id"), "__b",
        Seq(col("h"), col("vec_id")), "rn")
      .filter(col("rn") <= quota)
      .select(col("cluster_id"), col("vec_id"), col("rn"))
  }

  /** ANN quality evaluation — recall@k of an approximate top-k result
    * against the exact brute-force top-k: the metric every index
    * rollout gates on before the approximate path replaces the exact
    * one. Both inputs carry (query_id, vec_id) rows, ≤ k per query;
    * output one row per query: (query_id, n_hits, recall_ppm) with
    * recall an exact integer ppm division, so the gate has no float
    * ratio to disagree on. The intersection is a keyed equi-join of
    * two k-rows-per-query frames — eval cost is |queries|·k,
    * corpus-size-independent; the expensive parts are the INPUTS,
    * which is the point: the eval composes the operators it grades.
    * Queries where the approximate path found nothing still emit a
    * row (left join from the exact side, which is total by
    * construction). */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // distinct defends the hit count against a duplicated approx pair
    // (a left join would double-count it past k); both frames are
    // |queries|·k rows, so the dedup shuffle is eval-sized, not corpus-
    // sized
    val hits = approx.select(col("query_id"), col("vec_id")).distinct()
      .withColumn("__hit", lit(1L))
    exact.select(col("query_id"), col("vec_id"))
      .join(hits, Seq("query_id", "vec_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        expr(s"n_hits * 1000000 div $k").as("recall_ppm"))
  }

  /** Reciprocal (mutual) k-nearest-neighbor pairs — the
    * high-precision pairing rule entity matching and robust dedup use
    * when one-directional top-k is too noisy: (a, b) is kept only if
    * b ranks in a's top k AND a ranks in b's top k (hubs that appear
    * in everyone's list but reciprocate nothing drop out). Takes ANY
    * (query_id, vec_id, sim, rank ≤ k) ranking — brute-force on a
    * slice, IVF/PQ at corpus scale — so the mutual filter itself is
    * one |n·k|-row self-equi-join, linear in the ranking it filters.
    * Output: (vec_a < vec_b, rank_ab, rank_ba, sim). */
  def mutualTopK(ranked: DataFrame): DataFrame = {
    val fwd = ranked.select(col("query_id"), col("vec_id"),
      col("rank"), col("sim"))
    val rev = ranked.select(col("query_id").as("vec_id"),
      col("vec_id").as("query_id"), col("rank").as("rank_ba"))
    fwd.join(rev, Seq("query_id", "vec_id"))
      .filter(col("query_id") < col("vec_id"))
      .select(col("query_id").as("vec_a"), col("vec_id").as("vec_b"),
        col("rank").as("rank_ab"), col("rank_ba"), col("sim"))
  }

  /** Cross-side scored pairs for margin mining — the brute-force
    * baseline stage: side A = even ids, side B = odd ids (the
    * deterministic stand-in for two corpora/languages), every A×B pair
    * scored with the cosine floor-quantized to integer 1e-9 units
    * (the binary-exact cross-engine recipe — no round()). Quadratic by
    * construction, like [[bruteForceTopK]]: the margin stage below
    * takes ANY (qa, qb, c) frame, so the corpus-scale path feeds it
    * IVF/PQ or SRP-banded candidates instead — and this baseline
    * REFUSES loudly past `maxPairs` (in-plan `assert_true` over the
    * broadcast 1-row volume, the coTriples guard discipline: the
    * refusal names the ANN remedy instead of silently burning a
    * quadratic at corpus scale; measured 17.5× for 10× rows unguarded
    * at sf1). */
  def bitextPairs(corpus: DataFrame, maxPairs: Long = 100000000L): DataFrame = {
    val a = corpus.filter(col("id") % 2 === 0)
      .select(col("id").as("qa"), col("vec").as("va"), norm(col("vec")).as("na"))
    val b = corpus.filter(col("id") % 2 =!= 0)
      .select(col("id").as("qb"), col("vec").as("vb"), norm(col("vec")).as("nb"))
    // DECIMAL product: two ~1e10-row sides would overflow a long
    val vol = a.agg(count(lit(1)).cast("decimal(38,0)").as("__na"))
      .crossJoin(b.agg(count(lit(1)).cast("decimal(38,0)").as("__nb")))
      .select((col("__na") * col("__nb")).as("__np"))
    b.join(broadcast(a), lit(true))
      .crossJoin(broadcast(vol))
      .filter(assert_true(
        col("__np") <= lit(maxPairs).cast("decimal(38,0)"),
        concat(lit("bitextPairs: "), col("__np").cast("string"),
          lit(s" cross-side pairs exceed maxPairs=$maxPairs — feed " +
            "marginMining the SRP-banded candidate stage (bitextPairsSrp, " +
            "the gated scale path) or an IVF/PQ candidate ranking instead " +
            "of the brute pair stage, or raise maxPairs to accept the " +
            "quadratic cost"))).isNull)
      .select(col("qa"), col("qb"),
        floor(dot(col("va"), col("vb")) / (col("na") * col("nb"))
          * lit(1e9d) + lit(0.5d)).cast("long").as("c"))
  }

  /** Margin-based bitext candidate mining (the Artetxe & Schwenk
    * ratio-margin rule behind LASER/CCMatrix corpus construction): a
    * cross-side pair (x, y) scores margin = cos(x,y) / ((avgₖNN(x) +
    * avgₖNN(y)) / 2) — a pair is a translation candidate when it is
    * much closer than each side's usual neighborhood, which kills the
    * hub vectors plain top-1 cosine mis-pairs. Exact integer
    * arithmetic end-to-end: cosines arrive as 1e-9-unit longs, the two
    * k-NN sums are integer sums, and margin_q = ⌊c·2k·10⁶ / (Σₖa +
    * Σₖb)⌋ via truncating DIV — bit-replayable by the oracle. Takes
    * ANY scored pair frame ([[bitextPairs]] baseline, ANN candidates
    * at scale), ranks both directions (two shuffles of the pair frame,
    * linear in it), and emits forward-top-k candidates with positive
    * cosine. */
  def marginMining(pairs: DataFrame, k: Int = 4): DataFrame = {
    val wa = Window.partitionBy(col("qa")).orderBy(col("c").desc, col("qb"))
    val wb = Window.partitionBy(col("qb")).orderBy(col("c").desc, col("qa"))
    val r = pairs.withColumn("ra", row_number().over(wa))
      .withColumn("rb", row_number().over(wb))
    val sa = r.filter(col("ra") <= k).groupBy(col("qa"))
      .agg(sum(col("c")).as("sa"))
    val sb = r.filter(col("rb") <= k).groupBy(col("qb"))
      .agg(sum(col("c")).as("sb"))
    r.filter(col("ra") <= k && col("c") > 0)
      .join(sa, Seq("qa")).join(sb, Seq("qb"))
      .filter(col("sa") + col("sb") > 0)
      .select(col("qa"), col("qb"),
        expr(s"(c * ${2L * k} * 1000000L) DIV (sa + sb)").as("margin_q"))
  }

  /** Embedding health gate — the data contract an ANN index build
    * checks BEFORE indexing (the `expectations` of the vector world):
    * per dimensionality bucket (a ragged corpus is itself a defect —
    * dim -1 = NULL vector), counts of non-finite vectors (any NaN/±Inf/
    * NULL element, classified portably via the x−x ≠ 0 identity — no
    * engine-specific isnan/isinf in the gate) and zero-norm vectors
    * (cosine against them is undefined), plus the norm envelope
    * (min/max/sum as integer micros via the binary-exact
    * floor(x·1e6+0.5), norms of non-finite vectors excluded). One
    * partial+final aggregate pass; output rows = distinct dims
    * (healthy corpus: exactly one). */
  def vectorHealth(corpus: DataFrame): DataFrame = {
    val v = col("vec")
    val nonfinite = when(v.isNull, lit(0L))
      .when(exists(v, x => x.isNull || !((x - x) === lit(0.0f))), lit(1L))
      .otherwise(lit(0L))
    val m = corpus.select(
      when(v.isNull, lit(-1)).otherwise(size(v)).as("dim"),
      nonfinite.as("__nf"),
      when(v.isNull || nonfinite === 1L, lit(null))
        .otherwise(norm(v)).as("__nrm"))
    m.groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("__nf")).as("n_nonfinite"),
        sum(when(col("__nrm") === 0.0d, 1L).otherwise(0L)).as("n_zero_norm"),
        floor(min(col("__nrm")) * 1e6d + 0.5d).cast("long").as("min_norm_micro"),
        floor(max(col("__nrm")) * 1e6d + 0.5d).cast("long").as("max_norm_micro"),
        sum(floor(col("__nrm") * 1e6d + 0.5d).cast("long")).as("sum_norm_micro"))
  }

  /** Simplified (centroid-based) silhouette — the clustering-quality
    * gate a topic-model / semantic-dedup rollout reads before trusting
    * the codebook: per vector, a = cosine distance to its OWN centroid,
    * b = distance to the nearest OTHER centroid, s = (b−a)/max(a,b)
    * ∈ [−1, 1] (s ≤ 0 means the vector sits closer to a foreign
    * centroid than its own — the cluster count is wrong). The classic
    * all-pairs silhouette is O(n²); the centroid form is the standard
    * linear surrogate (sklearn's `silhouette_score` sampled cousin) and
    * the only one that survives 100 TB: one codebook train + ONE corpus
    * scan against k broadcast centroids + a window over k rows per
    * vector (uniform by construction — no skew).
    *
    * Float discipline: a and b derive from the family's 9-dp-rounded
    * cosine, the ratio stays in IEEE double (both engines divide the
    * SAME doubles), and the per-vector score is quantized to integer
    * nanos via floor(x·1e9 + 0.5) — floor is binary-exact in both
    * engines, unlike round() whose Spark BigDecimal-of-shortest-string
    * semantics diverge from DuckDB's binary rounding on boundary
    * values. Per-cluster output sums those BIGINT nanos (|s| ≤ 1 ⇒
    * bounded by 1e9·n, no overflow until n ~ 9e9 per cluster); the mean
    * is the consumer's division, so no float mean re-manufactures ties.
    * Output: (cluster_id, n, sum_sil_nano). */
  def silhouette(corpus: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    require(k >= 2, "silhouette needs at least 2 clusters")
    // r=1 is the assignment argmax (the shared kernel's tie-break);
    // best_other is the max csim among the k−1 runners-up.
    val perVec = rankedCentroidSims(corpus, kmeansCodebook(corpus, k, iters))
      .groupBy(col("vec_id"))
      .agg(
        max(when(col("r") === 1, col("cluster_id"))).as("cluster_id"),
        max(when(col("r") === 1, col("csim"))).as("own_sim"),
        max(when(col("r") > 1, col("csim"))).as("best_other"))
      .withColumn("denom",
        greatest(lit(1.0d) - col("own_sim"), lit(1.0d) - col("best_other")))
      // denom = 0 ⇔ the vector coincides with both centroids: s := 0
      // (the sklearn convention), keeping NaN out of the BIGINT cast.
      .withColumn("sil_nano",
        when(col("denom") === 0.0d, lit(0L)).otherwise(
          floor((col("own_sim") - col("best_other")) / col("denom") * 1e9d
            + 0.5d).cast("long")))
    perVec.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"), sum(col("sil_nano")).as("sum_sil_nano"))
  }
}
