package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Principal component analysis in the shape a 100 TB corpus demands:
  * ONE distributed pass builds the (D+1)×(D+1) homogeneous Gram matrix
  * (a partial+final aggregate whose shuffle is (D+1)² rows per
  * partition, independent of corpus size), the eigen-solve runs on the
  * driver over that bounded frame (D is a feature-vector width — tens,
  * never data-sized), and the projection is a map-only second pass
  * (`zip_with` dot product against a broadcast-literal component).
  * No row-by-row covariance updates, no iterative data passes: the
  * data is touched exactly twice, both embarrassingly parallel.
  *
  * Everything is integer-exact so the DuckDB oracle replays it
  * bit-for-bit: features are BIGINT counts, the centered scatter
  * matrix C = n·Σxxᵀ − (Σx)(Σx)ᵀ is exact in DECIMAL(38,0) (BigInt on
  * the driver), and the power iteration renormalizes each round by
  * truncating division (BigInt `/` ≡ DuckDB HUGEINT `//` — DECIMAL
  * `//` in DuckDB is REAL division and must not be used). The
  * homogeneous trick folds n and the column sums into the same
  * aggregate: appending a constant 1 to each feature vector makes
  * P(D,D) = n, P(i,D) = Σxᵢ, P(i,j) = the raw scatter — one explode,
  * one aggregation, every statistic.
  *
  * Fixed-round power iteration (no data-dependent stopping) keeps the
  * result a pure function of the input — the oracle replays the same
  * rounds whether or not they converged; PcaSpec pins the fixed point
  * (one extra round moves nothing) and the exact centering invariant
  * Σ pc1 = 0 on the fixture, where the quality-feature scatter is
  * ~2000:1 dominant and 6 rounds converge exactly. */
object Pca {

  /** Quality-feature vector of a document as BIGINT counts — chars,
    * whitespace tokens, distinct tokens, vowels, longest token,
    * stopwords. Counts (not ratios) keep every cell integer; they are
    * heavily size-correlated, so PC1 is the corpus "size factor" and
    * the residual spread is the quality signal. Mirrors the
    * [[TextAnalysis]] tokenization contract (split on single space). */
  def docFeatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id"), array(
      length(col("text")).cast("long"),
      size(split(col("text"), " ")).cast("long"),
      size(array_distinct(split(col("text"), " "))).cast("long"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[aeiou]", ""))).cast("long"),
      array_max(transform(split(col("text"), " "), t => length(t)))
        .cast("long"),
      size(filter(split(col("text"), " "),
        t => t.isin(TextAnalysis.langProfiles.toMap.apply("en"): _*)))
        .cast("long")
    ).as("q"))

  /** Stage 1: the homogeneous Gram — (i, j, pij) with i, j ∈ [0, D]
    * where index D is the appended constant 1. The explode emits
    * (D+1)² structs per row and the hash aggregate combines them
    * map-side, so the shuffle carries (D+1)² rows per task. */
  def gram(feats: DataFrame, dim: Int): DataFrame = {
    val qh = concat(col("q"), array(lit(1L)))
    feats.select(explode(flatten(transform(qh, (xi, i) =>
        transform(qh, (xj, j) =>
          struct(i.as("i"), j.as("j"),
            (xi.cast(DecimalType(38, 0)) * xj).as("x")))))).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.x")).as("pij"))
  }

  /** Exact centered scatter from the bounded Gram collect ((D+1)² rows
    * — the sanctioned bounded-collect shape, like k-means centroids):
    * (C = n·Σxxᵀ − (Σx)(Σx)ᵀ, S = Σx, n), all BigInt. Takes the Gram
    * as a FRAME (i, j, pij) so the streaming twin can hand in the
    * state-store-folded cells — the Gram is a sum monoid, the same
    * applyDelta discipline as the incremental checksum. */
  private[graft] def scatterFromGram(gramDf: DataFrame, dim: Int)
      : (Array[Array[BigInt]], Array[BigInt], BigInt) = {
    val cells = gramDf.collect()
    val p = Array.ofDim[BigInt](dim + 1, dim + 1)
    cells.foreach { r =>
      p(r.getInt(0))(r.getInt(1)) = BigInt(r.getDecimal(2).toBigInteger)
    }
    val n = p(dim)(dim)
    val s = Array.tabulate(dim)(i => p(i)(dim))
    (Array.tabulate(dim, dim)((i, j) => n * p(i)(j) - s(i) * s(j)), s, n)
  }

  private def scatterOf(feats: DataFrame, dim: Int)
      : (Array[Array[BigInt]], Array[BigInt], BigInt) =
    scatterFromGram(gram(feats, dim), dim)

  /** Fixed-round power iteration at 1e6 scale. BigInt / truncates
    * toward zero — the contract the oracle's HUGEINT // replays
    * (never DuckDB's DECIMAL //, which is REAL division; DuckDB
    * integer // also truncates toward zero, verified on negatives). */
  private def powerIter(c: Array[Array[BigInt]], dim: Int, rounds: Int)
      : Array[BigInt] = {
    val scale = BigInt(1000000)
    var v = Array.fill(dim)(scale)
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = w.map(x => x * scale / m)
    }
    v
  }

  /** v'Cv·10⁶ / (tr(C)·v'v) — explained-variance ppm of component v
    * against scatter c (always the ORIGINAL scatter, so deflated
    * components report their true share). */
  private def evrPpm(c: Array[Array[BigInt]], v: Array[BigInt], dim: Int)
      : BigInt = {
    val num = (0 until dim).flatMap(i =>
      (0 until dim).map(j => v(i) * c(i)(j) * v(j))).sum
    val tr = (0 until dim).map(i => c(i)(i)).sum
    val vv = v.map(x => x * x).sum
    if (tr == 0) BigInt(0) else num * 1000000 / (tr * vv)
  }

  /** Rank-1 deflation, exactly and overflow-safely: λ = ⌊v'Cv / v'v⌋,
    * C₂(i,j) = C(i,j) − ⌊λ·vᵢ·vⱼ / v'v⌋ — per-cell truncation keeps
    * every intermediate under HUGEINT's 1.7e38 at sf1 (λ·vᵢ·vⱼ ≲ 1e33)
    * where the textbook C·(v'v)² − (v'Cv)·vvᵀ form overflows. The
    * residual v'C₂v is O(truncation) ≈ 0, so the next power iteration
    * converges to the second eigenvector. */
  private def deflate(c: Array[Array[BigInt]], v: Array[BigInt], dim: Int)
      : Array[Array[BigInt]] = {
    val vv = v.map(x => x * x).sum
    val num = (0 until dim).flatMap(i =>
      (0 until dim).map(j => v(i) * c(i)(j) * v(j))).sum
    val lam = num / vv
    Array.tabulate(dim, dim)((i, j) => c(i)(j) - lam * v(i) * v(j) / vv)
  }

  /** Driver-side exact eigen-solve. Returns (v: D components at 1e6
    * scale, sv = Σᵢ Sᵢvᵢ, n, evrPpm). */
  def solve(feats: DataFrame, dim: Int, rounds: Int)
      : (Array[BigInt], BigInt, Long, Long) = {
    val (c, s, n) = scatterOf(feats, dim)
    val v = powerIter(c, dim, rounds)
    val sv = (0 until dim).map(i => s(i) * v(i)).sum
    (v, sv, n.toLong, evrPpm(c, v, dim).toLong)
  }

  /** Per-row projection onto the top-k components: pcₘ = n·(q·vₘ) −
    * Σᵢ Sᵢvₘᵢ — the exact integer image of n·(q − μ)·vₘ. PC1 is the
    * size factor; PC2 (the deflated component) is the per-document
    * QUALITY residual a curation filter thresholds. Map-only: every
    * component vector is a broadcast literal, each dot product a
    * codegen'd `zip_with` + `aggregate`, so the projection pass adds
    * zero shuffles however many components are emitted.
    *
    * Emits BIGINT, never DECIMAL: the driver's hash canonicalizes
    * parquet DECIMAL differently from DuckDB decimal, and every pcₘ
    * fits int64 at every SF (n·(q·v) ≤ n·6·maxFeature·1e6 ≪ 2^63). */
  /** The top-k component chain — ONE definition of the
    * solve-deflate-resolve sequence so [[project]]'s scores and
    * [[componentsFromGram]]'s loadings can never drift apart. */
  private def topComponents(c0: Array[Array[BigInt]], dim: Int,
                            rounds: Int, k: Int, rounds2: Int)
      : Seq[Array[BigInt]] =
    Iterator.iterate((c0, powerIter(c0, dim, rounds))) { case (c, v) =>
      val c2 = deflate(c, v, dim)
      (c2, powerIter(c2, dim, rounds2))
    }.take(k).map(_._2).toSeq

  def project(feats: DataFrame, dim: Int = 6, rounds: Int = 6,
              k: Int = 2, rounds2: Int = 80): DataFrame = {
    val (c0, s0, n) = scatterOf(feats, dim)
    val pcCols = topComponents(c0, dim, rounds, k, rounds2)
      .zipWithIndex.map { case (v, m) =>
        val sv = (0 until dim).map(i => s0(i) * v(i)).sum
        val vlit = array(v.map(x => lit(x.toLong)): _*)
        val praw = aggregate(
          zip_with(col("q"), vlit, (x, w) => x * w), lit(0L), (a, b) => a + b)
        (lit(n.toLong).cast(DecimalType(38, 0)) * praw - lit(sv.toLong))
          .cast("long").as(s"pc${m + 1}")
      }
    feats.select(col("id") +: pcCols: _*)
  }

  /** The solved components: (comp, i, loading at 1e6 scale, explained
    * variance ppm vs the ORIGINAL scatter) — the k·D-row artifact a
    * feature-health dashboard reads. PC1 alone is the corpus size
    * factor; the quality signal lives in PC2+, found by rank-1
    * deflation and re-iteration over the same bounded driver frame —
    * still zero extra data passes. Deflated components get more rounds
    * (`rounds2`, default 80): the residual eigengap λ₂/λ₃ is small, so
    * the fixed point arrives later (measured: round 26/22/35 at
    * sf0.001/0.01/0.1); rounds stay FIXED (never data-dependent) so
    * the oracle replays the identical chain converged or not. */
  def components(feats: DataFrame, dim: Int = 6, rounds: Int = 6,
                 k: Int = 2, rounds2: Int = 80): DataFrame =
    componentsFromGram(gram(feats, dim), dim, rounds, k, rounds2)

  /** Same solve over an already-aggregated Gram frame — the streaming
    * twin's entry point (its (D+1)² sums fold in the state store). */
  def componentsFromGram(gramDf: DataFrame, dim: Int = 6, rounds: Int = 6,
                         k: Int = 2, rounds2: Int = 80): DataFrame = {
    val spark = gramDf.sparkSession
    import spark.implicits._
    val (c0, _, _) = scatterFromGram(gramDf, dim)
    topComponents(c0, dim, rounds, k, rounds2).zipWithIndex
      .flatMap { case (v, m) =>
        val evr = evrPpm(c0, v, dim).toLong
        v.zipWithIndex.map { case (x, i) => (m, i, x.toLong, evr) }
      }.toDF("comp", "i", "v", "evr_ppm")
  }
}
