package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: multi-query lexical (BM25) ranking, and
  * reciprocal-rank fusion of heterogeneous rankings — the standard way
  * a RAG / retrieval pipeline combines a keyword index with a dense
  * embedding index (Cormack, Clarke & Buettcher, SIGIR'09: RRF
  * outperforms either list and needs no score calibration, only ranks).
  *
  * Scale notes. [[bm25Ranks]] differs from the single-query
  * `TextAnalysis.bm25Search` in three ways that matter at corpus scale:
  * (1) MANY queries share one pass — the corpus is tokenized once, term
  * frequencies are computed once for the union of all query terms
  * (left-semi join against a broadcast term set, so the explode output
  * is pruned at the source), and the per-query fan-out happens on the
  * already-tiny (doc, term, score) frame; (2) per-term scores are
  * rounded to integer MILLI-units before summation, so the per-query
  * score is an order-free integer sum — no float summation-order
  * dependence anywhere, which is also what lets the DuckDB oracle
  * replay it exactly; (3) ranking is a per-query window over docs that
  * matched ≥1 query term (not the corpus), bounded by the posting list
  * sizes, then cut to k.
  *
  * [[rrfFuse]] is pure integer arithmetic: each list contributes
  * `1e9 div (rrfK + rank)` and a document absent from a list simply
  * contributes nothing (the standard RRF convention). Fusing n lists of
  * k rows per query costs one grouped sum over ≤ n·k rows per query —
  * independent of corpus size, so fusion is never the bottleneck.
  */
object Retrieval {

  /** Deterministic query-by-document term extraction: the `nTerms`
    * lexicographically-smallest distinct tokens of each query document.
    * Output: (query_id, t) — one row per kept term. array_sort +
    * slice, no window, no shuffle beyond the source read. */
  def queryTermsFromDocs(docs: DataFrame, textCol: String, idCol: String,
                         nTerms: Int): DataFrame =
    docs.select(col(idCol).as("query_id"),
        explode(slice(array_sort(array_distinct(split(col(textCol), " "))),
          1, nTerms)).as("t"))

  /** Multi-query BM25 top-k with integer milli-unit scores.
    * `queryTerms` = (query_id, t). Output: (query_id, doc_id,
    * score_milli, rank ≤ k), rank ties broken by doc_id. Okapi
    * parameters k1/b are the classic 1.2/0.75; idf is the
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` always-positive form. With
    * `excludeSelf` the query id is dropped from its own ranking (the
    * query-by-document / more-like-this mode, mirroring
    * `Similarity.bruteForceTopK`'s self-exclusion). */
  def bm25Ranks(docs: DataFrame, textCol: String, idCol: String,
                queryTerms: DataFrame, k: Int,
                k1: Double = 1.2, b: Double = 0.75,
                excludeSelf: Boolean = false): DataFrame = {
    val qt = queryTerms.select(col("query_id"), col("t"))
    val termSet = qt.select(col("t")).distinct()
    val withDl = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
    // corpus stats: one partial-aggregated pass, broadcast back as 1 row
    val stats = withDl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    // posting lists for the UNION of query terms only: the semi join
    // against the broadcast term set prunes the token explode before it
    // shuffles anything
    val tok = withDl.select(col("doc_id"), col("dl"), explode(col("w")).as("t"))
      .join(broadcast(termSet), Seq("t"), "left_semi")
    val tf = tok.groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    // per-(doc, term) Okapi score, rounded HALF-UP to integer
    // milli-units at the term level: the per-query sum below is then an
    // order-free integer sum (and exactly replayable by the oracle)
    val scored = tf
      .join(broadcast(dfT), Seq("t"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("t"),
        floor(
          (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))) *
          lit(1000.0) + lit(0.5)).cast("long").as("s_milli"))
    val perQuery = scored.join(broadcast(qt), Seq("t"))
    val guarded = if (excludeSelf)
      perQuery.filter(col("doc_id") =!= col("query_id")) else perQuery
    val agg = guarded.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s_milli")).as("score_milli"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_milli").desc, col("doc_id"))
    agg.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion of any number of (query_id, doc_id, rank)
    * rankings: fused score = Σ over lists of `1e9 div (rrfK + rank)`
    * (integer parts-per-billion units — float-free, summation-order
    * free), docs missing from a list contribute nothing. Output:
    * (query_id, doc_id, rrf_ppb, rank ≤ topN), ties by doc_id. */
  def rrfFuse(rankings: Seq[DataFrame], rrfK: Int = 60,
              topN: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      expr(s"CAST(1000000000 div ($rrfK + rank) AS BIGINT)").as("c")))
    val fused = contribs.reduce(_.unionAll(_))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_ppb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppb").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= topN)
  }

  /** Binary-relevance nDCG position gains in integer micro-units:
    * gain(i) = round(1e6 / log2(i + 1)) for ranks 1..k. Positions are
    * FIXED, so the gains are constants — both the Spark plan and the
    * Scala-generated DuckDB oracle inline the same literals, making
    * DCG an order-free integer sum with no transcendental evaluated by
    * either engine at query time. */
  def ndcgGains(k: Int): Seq[(Int, Long)] =
    (1 to k).map(i =>
      i -> math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** Retrieval-quality gate — the rollout metric a search / RAG index
    * change is judged by, the lexical twin of [[Similarity.recallAtK]]:
    * per query, MRR (reciprocal rank of the first relevant hit) and
    * binary-relevance nDCG@k, both as exact integer ppm so the gate has
    * no float ratio to disagree on. `ranked` = (query_id, doc_id,
    * rank ≤ k) from any ranking operator; `truth` = (query_id, doc_id)
    * relevant pairs (metadata-derived or editorial). DCG sums the
    * [[ndcgGains]] constants over relevant positions; IDCG is the
    * prefix sum at min(total relevant, k) — the ideal ranking's value —
    * so ndcg_ppm = dcg·1e6 div idcg is pure integer division. Cost:
    * one broadcast-ready equi-join of two |queries|·k frames plus a
    * grouped count over `truth` — corpus-size-independent; the
    * expensive part is the INPUT ranking, which is the point: the eval
    * composes the operator it grades. Queries with no relevant doc at
    * all emit ndcg_ppm = 0 (idcg = 0 ⇒ nothing to rank ideally).
    * Output: (query_id, n_rel_at_k, rr_ppm, ndcg_ppm). */
  def retrievalQuality(ranked: DataFrame, truth: DataFrame,
                       k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val gains = ndcgGains(k)
    val gain = gains.tail
      .foldLeft(when(col("rank") === 1, lit(gains.head._2))) {
        case (acc, (i, g)) => acc.when(col("rank") === i, lit(g))
      }.otherwise(lit(0L))
    // distinct defends against a duplicated truth pair double-counting
    // a position; truth frames are query-scoped, so the dedup shuffle
    // is eval-sized
    val t = truth.select(col("query_id"), col("doc_id")).distinct()
    val hits = ranked.select(col("query_id"), col("doc_id"), col("rank"))
      .join(t.withColumn("__rel", lit(1L)),
        Seq("query_id", "doc_id"), "left_outer")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
    val perQ = hits.groupBy(col("query_id")).agg(
      sum(col("__rel")).as("n_rel_at_k"),
      min(when(col("__rel") === 1L, col("rank"))).as("__first"),
      sum(when(col("__rel") === 1L, gain).otherwise(lit(0L))).as("__dcg"))
    val totRel = t.groupBy(col("query_id")).agg(count(lit(1)).as("__n_rel"))
    val prefixes = gains.map(_._2).scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (p, i) => (i + 1, p) }
    val idcg = prefixes.tail
      .foldLeft(when(col("__m") === 1, lit(prefixes.head._2))) {
        case (acc, (m, p)) => acc.when(col("__m") === m, lit(p))
      }.otherwise(lit(0L))
    // FULL outer: a query with truth pairs but ZERO ranked rows is the
    // worst retrieval outcome and must score 0, not vanish — a left
    // join from `ranked` would silently inflate the averaged gate
    // after exactly the regression it exists to catch
    perQ.join(totRel, Seq("query_id"), "full_outer")
      .withColumn("__m", least(coalesce(col("__n_rel"), lit(0L)), lit(k.toLong)))
      .withColumn("__idcg", idcg)
      .select(col("query_id"),
        coalesce(col("n_rel_at_k"), lit(0L)).as("n_rel_at_k"),
        coalesce(expr("CAST(1000000 div __first AS BIGINT)"), lit(0L)).as("rr_ppm"),
        when(col("__idcg") > 0L,
          expr("CAST(coalesce(__dcg, 0L) * 1000000 div __idcg AS BIGINT)"))
          .otherwise(lit(0L)).as("ndcg_ppm"))
  }
}
