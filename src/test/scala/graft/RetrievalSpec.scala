package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Retrieval, TextAnalysis}

/** Round-8 additions: hybrid RRF retrieval, DSIR-shaped selection,
  * vocabulary growth, and link prediction. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Retrieval.queryTermsFromDocs -------------------------------

  test("queryTermsFromDocs keeps the n lexicographically-smallest distinct tokens") {
    val d = Seq((1L, "zebra apple apple mango banana")).toDF("doc_id", "text")
    val got = Retrieval.queryTermsFromDocs(d, "text", "doc_id", 3)
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "apple"), (1L, "banana"), (1L, "mango")))
  }

  // ---- Retrieval.bm25Ranks ----------------------------------------

  test("bm25Ranks ranks the doc containing a rare query term first, excludes self") {
    val d = Seq(
      (0L, "rare common common"),
      (1L, "common common common"),
      (2L, "common filler filler"),
      (3L, "rare rare common")).toDF("doc_id", "text")
    val qt = Seq((0L, "rare"), (0L, "common")).toDF("query_id", "t")
    val got = Retrieval.bm25Ranks(d, "text", "doc_id", qt, k = 10,
      excludeSelf = true)
    val rows = got.select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    // self excluded
    assert(!rows.exists { case (q, doc, _) => q == doc })
    // doc 3 has tf("rare")=2 and is shortest on the rare term: rank 1
    assert(rows.find(_._3 == 1).map(_._2).contains(3L))
  }

  test("bm25Ranks milli scores equal the single-query bm25Search ranking") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val qt = Seq((999999L, "spark"), (999999L, "table"), (999999L, "query"))
      .toDF("query_id", "t")
    val multi = Retrieval.bm25Ranks(docs, "text", "doc_id", qt, k = 10)
      .orderBy(col("rank")).select("doc_id").as[Long].collect().toSeq
    val single = TextAnalysis.bm25Search(docs, "text", "doc_id",
        Seq("spark", "table", "query"), 10)
      .select("doc_id").as[Long].collect().toSeq
    // milli-rounding can only reorder exact float ties; the fixture has
    // none in the top 10, so the rankings agree exactly
    assert(multi === single)
  }

  // ---- Retrieval.rrfFuse ------------------------------------------

  test("rrfFuse sums integer ppb contributions and ranks by them") {
    val l1 = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(l1, l2), rrfK = 60, topN = 10)
      .select("doc_id", "rrf_ppb").as[(Long, Long)].collect().toMap
    val c1 = 1000000000L / 61; val c2 = 1000000000L / 62
    assert(got(11L) === c2 + c1) // in both lists
    assert(got(10L) === c1)
    assert(got(12L) === c2)
    // doc 11 (both lists) outranks the single-list docs
    val top = Retrieval.rrfFuse(Seq(l1, l2), 60, 1)
      .select("doc_id").as[Long].collect()
    assert(top.toSeq === Seq(11L))
  }

  test("rrfFuse: a doc missing from one list simply contributes nothing") {
    val l1 = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val l2 = spark.emptyDataset[(Long, Long, Int)]
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(l1, l2), 60, 10)
      .select("doc_id", "rrf_ppb").as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 1000000000L / 61))
  }

  // ---- TextAnalysis.dsirSelect ------------------------------------

  test("dsirSelect scores target-like raw docs above target-unlike ones") {
    // target lang tt: vocabulary {aa bb cc}; raw pool: one doc sharing
    // the target vocabulary, one disjoint
    val d = Seq(
      (0L, "aa bb cc aa bb cc", "tt"),
      (1L, "aa bb cc", "xx"),
      (2L, "zz yy ww", "xx")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.dsirSelect(d, "text", "doc_id", "lang", "tt",
        buckets = 64, quota = 10)
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(!got.contains(0L)) // target docs are never in the scored pool
    assert(got(1L) > got(2L)) // target-vocabulary doc looks more target-like
  }

  test("dsirSelect keeps at most quota rows") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val got = TextAnalysis.dsirSelect(docs, "text", "doc_id", "lang", "en",
      buckets = 256, quota = 7)
    assert(got.count() <= 7)
  }

  // ---- TextAnalysis.vocabGrowth -----------------------------------

  test("vocabGrowth cumulants are monotone and end at the exact corpus totals") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val rows = TextAnalysis.vocabGrowth(docs, "text", "doc_id", 10)
      .orderBy(col("slice"))
      .select("slice", "docs_cum", "tokens_cum", "vocab_cum")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === (0 until 10))
    // monotone non-decreasing
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4)
    case _ => }
    val tok = docs.select(explode(split(col("text"), " ")).as("t"))
    assert(rows.last._2 === docs.count())
    assert(rows.last._3 === tok.count())
    assert(rows.last._4 === tok.distinct().count())
  }

  // ---- Graph.linkPredict ------------------------------------------

  test("linkPredict scores non-adjacent pairs by CN and integer RA") {
    // path graph 1-2-3 plus 1-4: pair (2,4) shares neighbor 1 (deg 2),
    // pair (1,3) shares neighbor 2 (deg 2), pair (3,4) shares nothing
    val e = Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val got = Graph.linkPredict(e, topN = 10)
      .select("a", "b", "cn", "ra_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (2L, 4L, 1L, 500000L),  // via 1, deg(1)=2
      (1L, 3L, 1L, 500000L))) // via 2, deg(2)=2
  }

  test("linkPredict excludes existing edges and respects topN") {
    val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    val edges = Graph.coEdges(li, "l_orderkey", "l_partkey", minGroups = 2)
    val got = Graph.linkPredict(edges, topN = 5)
    assert(got.count() <= 5)
    val preds = got.select("a", "b").as[(Long, Long)].collect().toSet
    val es = edges.as[(Long, Long)].collect().toSet
    assert(preds.intersect(es).isEmpty)
  }

  test("retrievalQuality: hand-computed MRR and nDCG on fixed rankings") {
    // q1: relevant at ranks 1,2 of 2 total relevant → perfect: both 1e6
    // q2: relevant at rank 3 only, 1 total relevant → MRR=333333,
    //     nDCG = gain(3)/gain(1) = 500000/1000000 → 500000 ppm
    // q3: nothing relevant in corpus → all 0
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 10L, 1), (2L, 11L, 2), (2L, 12L, 3),
      (3L, 10L, 1), (3L, 11L, 2)
    ).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("query_id", "doc_id")
    val got = Retrieval.retrievalQuality(ranked, truth, 10)
      .orderBy("query_id").as[(Long, Long, Long, Long)].collect().toSeq
    val g = Retrieval.ndcgGains(10).toMap
    val q1Ndcg = (g(1) + g(2)) * 1000000L / (g(1) + g(2))
    assert(got === Seq(
      (1L, 2L, 1000000L, q1Ndcg),
      (2L, 1L, 1000000L / 3L, g(3) * 1000000L / g(1)),
      (3L, 0L, 0L, 0L)))
    // gains are strictly decreasing and anchored at 1e6
    val gs = Retrieval.ndcgGains(10).map(_._2)
    assert(gs.head === 1000000L && gs === gs.sorted.reverse && gs.distinct === gs)
  }

  test("retrievalQuality: duplicated truth pairs don't double-count") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 10L), (1L, 10L)).toDF("query_id", "doc_id")
    val got = Retrieval.retrievalQuality(ranked, truth, 10)
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((1L, 1L, 1000000L, 1000000L)))
  }

  test("linkPredict volume guard refuses a planted hub") {
    // star graph: one hub with 40 leaves → C(40,2)=780 wedges over 41
    // nodes; bound of 2/node refuses
    val e = (1L to 40L).map(i => (0L, i)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Graph.linkPredict(e, topN = 10, maxWedgesPerNode = 2)
    }
    assert(ex.getMessage.contains("wedge volume"))
    // raising the bound accepts the cost
    assert(Graph.linkPredict(e, topN = 10000,
      maxWedgesPerNode = Int.MaxValue).count() === 780)
  }
}
