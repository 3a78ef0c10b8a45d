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

  /** Driver-side exact eigen-solve over the bounded Gram collect
    * ((D+1)² rows — the sanctioned bounded-collect shape, like k-means
    * centroids). Returns (v: D components at 1e6 scale, sv = Σᵢ Sᵢvᵢ,
    * n, evrPpm = v'Cv·10⁶ / (tr(C)·v'v) — explained-variance ratio).
    * All BigInt; division truncates toward zero on both engines. */
  def solve(feats: DataFrame, dim: Int, rounds: Int)
      : (Array[BigInt], BigInt, Long, Long) = {
    val cells = gram(feats, dim).collect()
    val p = Array.ofDim[BigInt](dim + 1, dim + 1)
    cells.foreach { r =>
      p(r.getInt(0))(r.getInt(1)) = BigInt(r.getDecimal(2).toBigInteger)
    }
    val n = p(dim)(dim)
    val s = Array.tabulate(dim)(i => p(i)(dim))
    val c = Array.tabulate(dim, dim)((i, j) => n * p(i)(j) - s(i) * s(j))
    val scale = BigInt(1000000)
    var v = Array.fill(dim)(scale)
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      // BigInt / truncates toward zero — the contract the oracle's
      // HUGEINT // replays (never DuckDB's DECIMAL //, which is real
      // division)
      v = w.map(x => x * scale / m)
    }
    val sv = (0 until dim).map(i => s(i) * v(i)).sum
    val num = (0 until dim).flatMap(i =>
      (0 until dim).map(j => v(i) * c(i)(j) * v(j))).sum
    val tr = (0 until dim).map(i => c(i)(i)).sum
    val vv = v.map(x => x * x).sum
    val evr = if (tr == 0) BigInt(0) else num * 1000000 / (tr * vv)
    (v, sv, n.toLong, evr.toLong)
  }

  /** PC1 projection per row: pc1 = n·(q·v) − Σᵢ Sᵢvᵢ — the exact
    * integer image of n·(q − μ)·v. Map-only: the component vector is a
    * broadcast literal, the dot product a codegen'd `zip_with` +
    * `aggregate`, so stage 2 adds zero shuffles. */
  def project(feats: DataFrame, dim: Int = 6, rounds: Int = 6): DataFrame = {
    val (v, sv, n, _) = solve(feats, dim, rounds)
    val vlit = array(v.map(x => lit(x.toLong)): _*)
    val praw = aggregate(
      zip_with(col("q"), vlit, (x, w) => x * w), lit(0L), (a, b) => a + b)
    feats.select(col("id"),
      (lit(n).cast(DecimalType(38, 0)) * praw - lit(sv.toLong))
        .cast(DecimalType(38, 0)).as("pc1"))
  }

  /** The solved component itself: (i, loading at 1e6 scale, explained
    * variance ppm) — the D-row artifact a feature-health dashboard
    * reads. Same bounded solve; no second data pass at all. */
  def components(feats: DataFrame, dim: Int = 6, rounds: Int = 6)
      : DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val (v, _, _, evr) = solve(feats, dim, rounds)
    v.zipWithIndex.map { case (x, i) => (i, x.toLong, evr) }
      .toSeq.toDF("i", "v", "evr_ppm")
  }
}
