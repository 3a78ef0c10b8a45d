package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Similarity-search semantics + IVF recall vs the exact baseline. */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  test("codegen'd dot product is bit-identical to the HOF fold it replaced") {
    // the HOF twin the kernel must reproduce exactly (including the
    // sequential left-to-right fold order — float addition isn't
    // associative, so any reordering would show up bitwise)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (acc, v) => acc + v)
    // float×float on real fixture vectors
    val both = emb.limit(64).crossJoin(
        emb.limit(64).select(col("vec").as("vb")))
      .select(Similarity.dot(col("vec"), col("vb")).as("fast"),
        hofDot(col("vec"), col("vb")).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).isEmpty)
    assert(both.filter(col("fast").isNull).isEmpty)
    // float×double (the centroid path) — doubles from a transform
    val mixed = emb.limit(64)
      .withColumn("dv", transform(col("vec"), x => x.cast("double") * 1.7))
      .select(Similarity.dot(col("vec"), col("dv")).as("fast"),
        hofDot(col("vec"), col("dv")).as("ref"))
    assert(mixed.filter(col("fast") =!= col("ref")).isEmpty)
    // edge cases: empty arrays → 0.0; length mismatch → null (zip_with
    // pads the short side with null, nulling the fold); null array → null
    val edge = Seq(
      (Seq.empty[Float], Seq.empty[Float]),
      (Seq(1.0f, 2.0f), Seq(3.0f))
    ).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("ref"))
      .collect()
    assert(edge(0).getDouble(0) === 0.0 && edge(0).getDouble(1) === 0.0)
    assert(edge(1).isNullAt(0) && edge(1).isNullAt(1))
    val nul = Seq((Option.empty[Seq[Float]], Option(Seq(1.0f))))
      .toDF("a", "b").select(Similarity.dot(col("a"), col("b")))
      .collect()
    assert(nul(0).isNullAt(0))
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "vec")
    val c = df.select(Similarity.cosine(col("vec"), col("vec"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("brute-force top-k: k rows per query, descending sim, no self-match") {
    val res = Similarity.bruteForceTopK(emb.filter(col("id") < 5), emb, 3)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(res.length === 5 * 3)
    assert(res.forall { case (q, v, _, _) => q != v })
    res.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === Seq(1, 2, 3))
      assert(sorted.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true })
    }
  }

  test("hardNegatives: top-k strictly different-label neighbors, consistent with the full ranking") {
    val labels = emb.select(col("id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val res = Similarity.hardNegatives(emb.filter(col("id") < 5), emb, 3)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(res.length === 5 * 3)
    // a hard negative NEVER shares the query's label (self is excluded
    // a fortiori)
    assert(res.forall { case (q, v, _, _) => labels(q) != labels(v) })
    // and it is exactly the label-filtered slice of the full ranking:
    // every same-or-better different-label candidate is ranked above
    val full = Similarity.bruteForceTopK(emb.filter(col("id") < 5), emb, 100000)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val expected = full
      .filter { case (q, v, _, _) => labels(q) != labels(v) }
      .groupBy(_._1).toSeq
      .flatMap { case (q, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, v, s, _), i) => (q, v, s, i + 1) }
      }.toSet
    assert(res.toSet === expected)
  }

  test("IVF ANN achieves high recall@3 on clustered data") {
    // 10 well-separated clusters (scaled one-hot centroids) + small
    // deterministic offsets — the data shape IVF is designed for. (The
    // fixture embeddings are near-uniform, where ANY partition-pruning
    // ANN must lose recall; nprobe=C exactness on the fixture is covered
    // by the next test.)
    val vecs = (0 until 200).map { i =>
      val label = i % 10
      val v = Array.fill(16)(0.0f)
      v(label) = 10.0f
      (0 until 16).foreach(j => v(j) += (((i * 31 + j * 7) % 11) - 5) * 0.05f)
      (i.toLong, v.toSeq, label)
    }
    val df = vecs.toDF("id", "vec", "label")
    val queries = df.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(queries, df, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.ivfTopK(df, queries, 3, 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall@3 = $recall")
  }

  test("IVF with all clusters probed degrades to exact search") {
    val queries = emb.filter(col("id") < 5)
    val nClusters = emb.select(col("label")).distinct().count().toInt
    val exact = Similarity.bruteForceTopK(queries, emb, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val full = Similarity.ivfTopK(emb, queries, 3, nClusters)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(full === exact)
  }

  test("k-means codebook IVF achieves high recall@3 on clustered data, no labels used") {
    // same well-separated shape as the labeled IVF test, but the
    // codebook is learned unsupervised — recall must come from k-means
    // actually recovering the cluster structure
    val vecs = (0 until 200).map { i =>
      val label = i % 10
      val v = Array.fill(16)(0.0f)
      v(label) = 10.0f
      (0 until 16).foreach(j => v(j) += (((i * 31 + j * 7) % 11) - 5) * 0.05f)
      (i.toLong, v.toSeq)
    }
    val df = vecs.toDF("id", "vec")
    val queries = df.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(queries, df, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val codebook = Similarity.kmeansCodebook(df, 10, 3)
    val ann = Similarity.ivfTopKWithCodebook(df, queries, 3, 3, codebook)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"k-means IVF recall@3 = $recall")
  }

  test("k-means codebook is deterministic and k-row, rerun bit-identical") {
    def run() = Similarity.kmeansCodebook(emb, 5, 2)
      .orderBy(col("cluster_id"))
      .as[(Long, Seq[Double])].collect().toSeq
    val a = run()
    val b = run()
    assert(a === b)
    assert(a.map(_._1) === (0L until 5L))
    val dim = emb.select(size(col("vec"))).as[Int].head()
    assert(a.forall(_._2.length == dim))
  }

  test("hashedDocVectors: integer components, near-dups surface at high cosine") {
    import graft.operators.TextAnalysis
    val d = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val v = TextAnalysis.hashedDocVectors(d, "text", "doc_id")
    // components are exact signed counts — every value a whole double
    val frac = v.select(explode(col("vec")).as("x"))
      .filter(col("x") =!= expr("CAST(CAST(x AS BIGINT) AS DOUBLE)")).count()
    assert(frac === 0L)
    // dims fixed at 64, one vector per non-empty doc
    assert(v.select(size(col("vec"))).distinct().as[Int].collect().toSeq === Seq(64))
    // the planted near-dup structure survives the 64-dim projection:
    // some query doc's nearest hashed neighbor sits at cosine > 0.9
    val nz = v.filter(Similarity.norm(col("vec")) > 0.0d)
      .select(col("doc_id").as("id"), col("vec"))
    val top1 = Similarity.bruteForceTopK(nz.filter(col("id") < 5), nz, 1)
      .select("sim").as[Double].collect()
    assert(top1.exists(_ > 0.9), top1.toSeq.toString)
    // rerun is bit-identical (pure hashing, no rand)
    val again = TextAnalysis.hashedDocVectors(d, "text", "doc_id")
    assert(v.exceptAll(again).isEmpty && again.exceptAll(v).isEmpty)
  }

  test("mutualTopK keeps reciprocal pairs and suppresses the hub") {
    // two tight twin pairs on different axes + a hub vector that leans
    // toward vector 1: the hub's top-1 is 1, but 1's top-1 is its twin
    // 2 — so (1, hub) is one-directional and must drop; both twin
    // pairs are mutual at rank 1
    val vecs = Seq(
      (1L, Seq(1.0f, 0.02f, 0.0f)),
      (2L, Seq(1.0f, 0.01f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.02f)),
      (4L, Seq(0.0f, 1.0f, 0.01f)),
      (5L, Seq(0.9f, 0.4f, 0.1f)) // the hub
    ).toDF("id", "vec")
    val got = Similarity.mutualTopK(Similarity.bruteForceTopK(vecs, vecs, 1))
      .select("vec_a", "vec_b", "rank_ab", "rank_ba")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(got === Set((1L, 2L, 1, 1), (3L, 4L, 1, 1)))
    // at k large enough to see everything, mutual == all pairs: the
    // filter never invents pairs, only prunes
    val all = Similarity.mutualTopK(Similarity.bruteForceTopK(vecs, vecs, 4))
    assert(all.count() === 10L)
  }

  test("vectorHealth: planted NaN/Inf/null/zero/ragged vectors all classified") {
    val rows: Seq[(Long, Option[Seq[Float]])] = Seq(
      (1L, Some(Seq(3.0f, 4.0f))),              // healthy, norm 5
      (2L, Some(Seq(0.0f, 0.0f))),              // zero norm
      (3L, Some(Seq(Float.NaN, 1.0f))),         // NaN
      (4L, Some(Seq(Float.PositiveInfinity, 1.0f))), // Inf
      (5L, Some(Seq(1.0f, 0.0f, 0.0f))),        // ragged dim 3, norm 1
      (6L, None)                                 // NULL vector
    )
    val df = rows.toDF("id", "vec")
    val got = Similarity.vectorHealth(df)
      .orderBy("dim")
      .as[(Int, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got === Seq(
      (-1, 1L, 0L, 0L, None, None, None),
      (2, 4L, 2L, 1L, Some(0L), Some(5000000L), Some(5000000L)),
      (3, 1L, 0L, 0L, Some(1000000L), Some(1000000L), Some(1000000L))))
  }

  test("silhouette: planted tight clusters score near 1, shared-cluster pairs score low") {
    // 10 well-separated axis clusters, tiny jitter → every vector is
    // far closer to its own centroid than any other: mean silhouette
    // per cluster must be > 0.9 (nanos > 9e8)
    val vecs = (0 until 200).map { i =>
      val label = i % 10
      val v = Array.fill(16)(0.0f)
      v(label) = 10.0f
      (0 until 16).foreach(j => v(j) += (((i * 31 + j * 7) % 11) - 5) * 0.05f)
      (i.toLong, v.toSeq)
    }
    val good = Similarity.silhouette(vecs.toDF("id", "vec"), 10, 3)
      .as[(Long, Long, Long)].collect()
    assert(good.map(_._2).sum === 200L)
    // md5 seeding may land two seeds in one true cluster, merging two
    // labels under one centroid — silhouette's whole job is to expose
    // that: pure (n=20) clusters score ~1, a merged (n=40) one scores
    // visibly lower
    val pure = good.filter(_._2 == 20L)
    assert(pure.nonEmpty)
    assert(pure.forall { case (_, n, s) => s > n * 900000000L },
      s"expected tight clusters ~1: ${good.toSeq}")
    assert(good.filter(_._2 > 20L).forall { case (_, n, s) => s < n * 800000000L },
      s"a merged cluster must score below the pure ones: ${good.toSeq}")
    // bounds: |sum_sil_nano| <= 1e9 * n always
    assert(good.forall { case (_, n, s) => math.abs(s) <= n * 1000000000L })
    // k=6 over 5 true clusters forces one cluster to split → the split
    // halves sit near a foreign centroid: some cluster mean drops well
    // below the tight-fit score (structure mismatch is visible)
    val five = (0 until 100).map { i =>
      val label = i % 5
      val v = Array.fill(8)(0.0f)
      v(label) = 10.0f
      v((label + 4) % 8) += (((i * 13) % 7) - 3) * 0.4f
      (i.toLong, v.toSeq)
    }
    val over = Similarity.silhouette(five.toDF("id", "vec"), 6, 3)
      .as[(Long, Long, Long)].collect()
    assert(over.map(_._2).sum === 100L)
    // the split label's halves sit near each other's centroid, scoring
    // visibly below the intact clusters' ~0.99
    assert(over.exists(_._2 < 20L), s"k=6 over 5 labels must split one: ${over.toSeq}")
    val worstMean = over.map { case (_, n, s) => s.toDouble / n / 1e9 }.min
    val bestMean = over.map { case (_, n, s) => s.toDouble / n / 1e9 }.max
    assert(worstMean < bestMean - 0.1,
      s"over-clustered corpus should expose a weak cluster: ${over.toSeq}")
  }

  test("k-means codebook with k exceeding the corpus yields one centroid per vector") {
    val df = (0 until 3).map(i => (i.toLong, Seq.fill(4)(i + 1.0))).toDF("id", "vec")
    val cb = Similarity.kmeansCodebook(df, 10, 2)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(cb.length === 3)
    assert(cb.map(_._1).toSeq === Seq(0L, 1L, 2L))
  }

  test("dedup threshold sweep: known survivors per tau, kept count monotone in tau") {
    // one label block: v2 duplicates v1 (cos 1), v3 sits at cos ~0.92,
    // v4 is orthogonal
    val docs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(1f, 0f, 0f, 0f), 0),
      (3L, Seq(0.9239f, 0.3827f, 0f, 0f), 0),
      (4L, Seq(0f, 1f, 0f, 0f), 0)).toDF("id", "vec", "label")
    val r = Similarity.dedupThresholdSweep(docs, Seq(0.5, 0.95))
      .as[(Double, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq((0.5, 4L, 2L, 2L, 500000L), (0.95, 4L, 1L, 3L, 750000L)))
  }

  test("IVF-PQ with all clusters probed and corpus-wide overfetch degrades to exact search") {
    // nprobe = kCoarse disables the IVF prune; overfetch covering the
    // corpus disables the ADC shortlist cut — what remains is the
    // full-precision refine, which must equal brute force exactly
    // (ids, sims AND ranks)
    val queries = emb.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(queries, emb, 3)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val full = Similarity.ivfPqTopK(emb, queries, 3, kCoarse = 5,
        nprobe = 5, overfetch = 1000)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(full === exact)
  }

  test("k-means-codebook IVF probing all clusters degrades to exact search") {
    val queries = emb.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(queries, emb, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val full = Similarity.ivfTopKWithCodebook(emb, queries, 3, 5,
        Similarity.kmeansCodebook(emb, 5, 2))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(full === exact)
  }

  // one label holding 600 vectors in 6 tight orthogonal groups — the
  // mega-cluster shape where cosineNearDup's within-cluster join goes
  // quadratic and recursive blocking must both (a) stay exact and
  // (b) bound every pair join
  private def megaCluster = {
    val vecs = (0 until 600).map { i =>
      val g = i % 6
      val v = Array.fill(16)(0.0f)
      v(g) = 10.0f
      (0 until 16).foreach(j => v(j) += (((i * 13 + j * 5) % 9) - 4) * 0.03f)
      (i.toLong, v.toSeq, 0)
    }
    vecs.toDF("id", "vec", "label")
  }

  test("recursive blocking equals the exact near-dup on a planted mega-cluster") {
    val df = megaCluster
    val exact = Similarity.cosineNearDup(df, 0.6)
      .as[(Long, Long, Double)].collect().toSet
    val blocked = Similarity.cosineNearDupBlocked(df, 0.6,
        maxBlock = 64, branch = 4, maxDepth = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    assert(blocked === exact)
  }

  test("refineBlocks caps block sizes; centroid pruning skips far block pairs") {
    val df = megaCluster
    val blocks = Similarity.refineBlocks(df, "label", 64, 4, 8)
    // same members, just re-blocked
    assert(blocks.count() === 600L)
    val maxBlockSize = blocks.groupBy(col("block")).count()
      .agg(max(col("count"))).as[Long].head()
    assert(maxBlockSize <= 64L,
      s"a block of $maxBlockSize exceeds the cap — no pair join is bounded then")
    // every admitted pair join is therefore <= 64^2; and the candidate
    // set must be far below the mega-cluster's all-pairs 600*599/2 =
    // 179700 — the orthogonal groups' block pairs get pruned by the
    // triangle-inequality bound
    val cand = Similarity.blockedCandidates(blocks, 0.6).count()
    assert(cand < 100000L, s"pruning did not engage: $cand candidates")
    assert(cand >= Similarity.cosineNearDup(df, 0.6).count())
  }

  test("int8 quantization roundtrip error is bounded by half a code step per dim") {
    val (q, scales) = Similarity.quantize(emb)
    val row = q.select(col("vec"), col("qvec")).head()
    val vec = row.getSeq[Float](0)
    val codes = row.getSeq[Int](1)
    assert(codes.length === vec.length)
    assert(codes.forall(c => c >= 0 && c <= 255))
    val s = scales.select("los", "spans").head()
    val los = s.getSeq[Double](0); val spans = s.getSeq[Double](1)
    vec.indices.foreach { i =>
      val deq = codes(i).toDouble / 255.0 * spans(i) + los(i)
      assert(math.abs(deq - vec(i)) <= spans(i) / 255.0 * 0.5 + 1e-9,
        s"dim $i: ${vec(i)} vs $deq span ${spans(i)}")
    }
  }

  test("quantized two-stage top-k achieves high recall vs exact search") {
    val queries = emb.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(queries, emb, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall@3 = $recall")
  }

  test("SRP near-dup emits only true threshold-passing pairs (verified subset)") {
    // every emitted pair must appear in the exact all-pairs result —
    // LSH prunes candidates, verification makes emitted pairs exact
    val srp = Similarity.srpNearDup(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val v = emb.select(col("id"), col("vec"),
      Similarity.norm(col("vec")).as("nrm"))
    val exact = v.select(col("id").as("id_a"), col("vec").as("va"), col("nrm").as("na"))
      .join(v.select(col("id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 9).as("sim"))
      .filter(col("sim") >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(srp.subsetOf(exact), s"false positives: ${srp -- exact}")
    assert(srp.nonEmpty)
  }

  test("SRP near-dup achieves high recall on planted high-cosine pairs") {
    // 100 base vectors with deterministic pseudo-random coords; each gets
    // a planted near-duplicate (tiny perturbation → cosine ≈ 0.99+) —
    // the regime the r=8 band width is tuned for. Distractors are
    // near-orthogonal, so candidate volume stays small.
    def coord(i: Int, d: Int): Float =
      (((i * 1315423911L + d * 2654435761L) % 1000L) / 500.0f) - 1.0f
    val base = (0 until 100).map { i =>
      (i.toLong, (0 until 64).map(d => coord(i, d)))
    }
    val dups = base.map { case (i, v) =>
      (i + 1000L, v.zipWithIndex.map { case (x, d) => x + (if (d % 7 == 0) 0.01f else 0.0f) })
    }
    val df = (base ++ dups).toDF("id", "vec")
    val found = Similarity.srpNearDup(df, 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 100).map(i => (i.toLong, i + 1000L)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("cosine near-dup is symmetric-free (a<b) and thresholded") {
    val pairs = Similarity.cosineNearDup(emb, 0.3)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect()
    assert(pairs.forall { case (a, b, s) => a < b && s >= 0.3 })
  }

  test("sparse tf-idf cosine: identical docs score 1, disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),    // exact dup of 1
      (3L, "epsilon zeta eta theta"),    // disjoint from 1/2
      (4L, "alpha beta gamma iota")      // shares a prefix with 1/2
    ).toDF("doc_id", "text")
    val pairs = Similarity.tfidfCosineJoin(docs, "text", "doc_id",
        minCos = 0.0, shingleN = 1)
      .select("doc_a", "doc_b", "cos").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "disjoint docs must not generate a candidate")
    assert(pairs((1L, 4L)) > 0 && pairs((1L, 4L)) < 1.0)
    // the df cap drops hot terms from the vector space entirely:
    // with maxDf=1 every shared term (df>=2) vanishes -> no pairs
    val capped = Similarity.tfidfCosineJoin(docs, "text", "doc_id",
      minCos = 0.0, maxDf = Some(1), shingleN = 1)
    assert(capped.isEmpty)
  }

  test("budgeted df cap: derived from the histogram, equals the explicit-cap join, scales with the budget") {
    // 6 docs sharing one hot token (df=6, C=15 pairs) plus rare pair
    // tokens (df=2, 1 pair each): a tight budget admits only the rare
    // tokens, a loose one admits the hot token too
    val docs = (1L to 6L).map(i =>
      (i, s"hot rare${(i + 1) / 2} tail$i")).toDF("doc_id", "text")
    val dfc = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .distinct().groupBy(col("t")).agg(count(lit(1)).as("df"))
    // budgets: 3 pairs -> cap 2 (3 rare-token pairs cost 3; hot costs 15)
    assert(Similarity.dfCapFor(dfc, 3L) === 2)
    // 18 pairs -> cap 6 (3 + 15 fits)
    assert(Similarity.dfCapFor(dfc, 18L) === 6)
    // below even the rare tokens: floor 2 (the budget is a scaling
    // contract, not an admission gate)
    assert(Similarity.dfCapFor(dfc, 0L) === 2)
    // the budgeted join IS the explicit-cap join at the derived cap
    val a = Similarity.tfidfCosineJoinBudgeted(docs, "text", "doc_id",
      minCos = 0.0, pairsPerDoc = 1, shingleN = 1)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    val b = Similarity.tfidfCosineJoin(docs, "text", "doc_id",
      minCos = 0.0, maxDf = Some(Similarity.dfCapFor(dfc, 6L)), shingleN = 1)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("semanticDedup census: keep-first drops within clusters, cross-cluster pairs survive") {
    // two tight direction groups far apart → k=2 k-means separates them;
    // ids chosen so each group holds one duplicate pair
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // exact dup of 1 → dropped
      (3L, Seq(0.9f, 0.05f, 0.0f, 0.0f)),  // near 1 (cos>0.99) → dropped
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.1f)),
      (5L, Seq(0.0f, 0.0f, 1.0f, 0.1f)),   // exact dup of 4 → dropped
      (6L, Seq(0.0f, 0.0f, 0.2f, -1.0f))   // same half-space as 4 but far
    ).toDF("id", "vec")
    val census = Similarity.semanticDedup(vecs, 2, 2, 0.99)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    // one row per vector, kept ∈ {0,1}
    assert(census.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val kept = census.filter(_._3 == 1).map(_._1).toSet
    val dropped = census.filter(_._3 == 0).map(_._1).toSet
    assert(dropped === Set(2L, 3L, 5L))
    assert(kept === Set(1L, 4L, 6L))
    // the duplicate members landed in the same cluster as their keeper
    val cluster = census.map(c => c._1 -> c._2).toMap
    assert(cluster(1L) === cluster(2L) && cluster(4L) === cluster(5L))
    // keep-first is id-deterministic: rerun is bit-identical
    val rerun = Similarity.semanticDedup(vecs, 2, 2, 0.99)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(rerun.toSeq === census.toSeq)
  }

  test("PQ-ADC: self-match ranks first on clustered data; rerun bit-identical") {
    // the IVF recall fixture: 10 well-separated clusters in 16 dims →
    // m=4 subspaces of 4 dims. A query's own vector shares all m codes
    // with itself, so its ADC score is the maximum possible for its
    // code tuple and (by vec_id tie-break among equal-coded vectors)
    // the query itself must appear in its top-3.
    val vecs = (0 until 200).map { i =>
      val label = i % 10
      val v = Array.fill(16)(0.0f)
      v(label) = 10.0f
      (0 until 16).foreach(j => v(j) += (((i * 31 + j * 7) % 11) - 5) * 0.05f)
      (i.toLong, v.toSeq, label)
    }
    val df = vecs.toDF("id", "vec", "label")
    val queries = df.filter(col("id") < 10)
    val top = Similarity.pqTopK(df, queries, 3, m = 4, subDim = 4,
        kSub = 10, iters = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(top.length === 30)
    // per query: ranks are 1..3, sims descend, self is present
    top.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === Seq(1L, 2L, 3L))
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sortBy(-(_: Double)).toSeq)
      assert(rows.exists(_._2 == q), s"query $q missing its own vector in top-3")
    }
    val rerun = Similarity.pqTopK(df, queries, 3, m = 4, subDim = 4,
        kSub = 10, iters = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(rerun.sortBy(r => (r._1, r._4)).toSeq ===
      top.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("semanticDedup occupancy guard refuses the fixed-k quadratic and names the remedy") {
    // 200 vectors, k=1 → one cluster of 200 → 19900 pairs ≈ 99/vector;
    // the naive-100×-caller simulation: corpus grew, k did not
    val big = (1 to 200).map(i =>
      (i.toLong, Seq(1.0f + i * 1e-4f, 0.5f, 0.25f, 0.125f))).toDF("id", "vec")
    val e = intercept[IllegalStateException] {
      Similarity.semanticDedup(big, 1, 1, 0.99, maxPairsPerVec = 50)
    }
    assert(e.getMessage.contains("Raise k"), e.getMessage)
    // Int.MaxValue disables the guard — the caller explicitly owns the cost
    assert(Similarity.semanticDedup(big, 1, 1, 0.99,
      maxPairsPerVec = Int.MaxValue).count() == 200)
  }

  test("semanticDedupAuto scales k with the corpus and holds occupancy under the guard") {
    // 10 direction groups; the 10x corpus must get ~10x the clusters,
    // and BOTH runs must clear the tight 4x-occupancy guard that a
    // fixed k would trip on the larger corpus
    def corpus(n: Int) = (0 until n).map { i =>
      val v = Array.fill(8)(0.0f)
      v(i % 8) = 10.0f
      (0 until 8).foreach(j => v(j) += (((i * 31 + j * 7) % 11) - 5) * 0.05f)
      (i.toLong, v.toSeq)
    }.toDF("id", "vec")
    val occ = 40
    val small = Similarity.semanticDedupAuto(corpus(240), 2, 0.999, occ)
      .select("cluster_id").distinct().count() // k = ceil(240/40) = 6
    val big = Similarity.semanticDedupAuto(corpus(2400), 2, 0.999, occ)
      .select("cluster_id").distinct().count() // k = 60
    assert(small <= 6, s"small corpus used $small clusters")
    assert(big > 4 * small,
      s"k did not scale with the corpus: $small -> $big clusters")
    // and the fixed-k form on the same 10x corpus DOES trip that guard
    val e = intercept[IllegalStateException] {
      Similarity.semanticDedup(corpus(2400), 6, 2, 0.999,
        maxPairsPerVec = 4 * occ)
    }
    assert(e.getMessage.contains("Raise k"), e.getMessage)
  }

  test("topicBalance: quota respected per cluster; sample is partitioning-invariant") {
    val e = emb
    val got = Similarity.topicBalance(e, 5, 2, 20)
    val perCluster = got.groupBy("cluster_id").count().collect()
    assert(perCluster.nonEmpty && perCluster.forall(_.getLong(1) <= 20))
    assert(got.select("vec_id").distinct().count() === got.count(), "a vector kept twice")
    // content-addressed: the same sample regardless of physical layout
    val re = Similarity.topicBalance(e.repartition(7), 5, 2, 20)
    assert(got.exceptAll(re).isEmpty && re.exceptAll(got).isEmpty)
  }

  test("recallAtK: hand-built overlap; zero-hit queries still emit a row; self vs self = 1") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
                    (2L, 20L), (2L, 21L), (2L, 22L)).toDF("query_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), // 2/3 hit
                     (2L, 90L), (2L, 91L), (2L, 92L)) // 0/3 hit
      .toDF("query_id", "vec_id")
    val out = Similarity.recallAtK(exact, approx, 3)
      .orderBy("query_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 2 && out(0).getLong(2) === 666666L)
    assert(out(1).getLong(1) === 0 && out(1).getLong(2) === 0L)
    // an exact result evaluated against itself recalls 1.0 everywhere
    val self = Similarity.recallAtK(exact, exact, 3).collect()
    assert(self.forall(r => r.getLong(2) === 1000000L))
  }

  test("recallAtK over the fixture: IVF nprobe=C recalls 1.0 (degrades to exact)") {
    val e = emb
    val q = e.filter($"id" < 5)
    val exact = Similarity.bruteForceTopK(q, e, 3)
    val allProbe = Similarity.ivfTopK(e, q, 3, nprobe = 1000)
    val r = Similarity.recallAtK(exact, allProbe, 3).collect()
    assert(r.nonEmpty && r.forall(_.getLong(2) === 1000000L),
      r.mkString(","))
  }

  test("margin mining: a planted translation pair tops the ranking; hubs are suppressed") {
    // side A (even) / side B (odd). Pair (8, 9) is a near-exact match
    // in a direction nothing else occupies — margin rewards "much
    // closer than each side's usual neighborhood", so the ISOLATED
    // mutual pair must beat absolutely-high cosines sitting in dense
    // neighborhoods (0/1/6 crowd each other). Vector 3 is a HUB nearly
    // equidistant to every A vector — plain top-cosine would pair it
    // everywhere, the ratio margin must not.
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val rows = Seq(
      (0L, v(1, 0, 0, 0)), (2L, v(0, 1, 0, 0)), (4L, v(0.7, 0.7, 0, 0)),
      (6L, v(0.9, 0.1, 0.1, 0)), (8L, v(0, 0, 0.05, 1)),
      (1L, v(0.99, 0.01, 0, 0)),
      (3L, v(0.55, 0.55, 0.55, 0.55)),     // hub: similar to everything
      (5L, v(0, 0.2, 0.95, 0)), (7L, v(0.3, 0.8, 0.1, 0)),
      (9L, v(0, 0, 0.1, 0.99)))            // ≈ vector 8 — the planted pair
    val df = rows.toDF("id", "vec")
    val m = Similarity.marginMining(Similarity.bitextPairs(df), 2)
      .orderBy($"margin_q".desc, $"qa", $"qb")
      .as[(Long, Long, Long)].collect().toSeq
    assert(m.head._1 === 8L && m.head._2 === 9L, m.take(3).toString)
    // the hub's best margin stays below the planted pair's: its own
    // top-k sum is high, so the ratio discounts it
    val hubBest = m.filter(_._2 == 3L).map(_._3).maxOption.getOrElse(0L)
    assert(hubBest < m.head._3, s"hub margin $hubBest vs ${m.head._3}")
    // candidates are forward-top-k only, positive cosine only
    assert(m.forall(_._3 > 0))
  }

  test("margin mining is partitioning-invariant and exact-integer stable") {
    val e = emb.filter($"id" < 60)
    val a = Similarity.marginMining(Similarity.bitextPairs(e), 4)
      .orderBy($"qa", $"qb").as[(Long, Long, Long)].collect().toSeq
    val b = Similarity.marginMining(Similarity.bitextPairs(e.repartition(7)), 4)
      .orderBy($"qa", $"qb").as[(Long, Long, Long)].collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("ANN bitext candidates: strict subset of brute pairs with identical integer cosines; margins agree on the candidate restriction") {
    val e = emb.filter($"id" < 200)
    val brute = Similarity.bitextPairs(e)
      .as[(Long, Long, Long)].collect()
      .map { case (qa, qb, c) => ((qa, qb), c) }.toMap
    val ann = Similarity.bitextPairsSrp(e)
      .as[(Long, Long, Long)].collect().toSeq
    assert(ann.nonEmpty && ann.size < brute.size,
      s"ann ${ann.size} vs brute ${brute.size}")
    // every ANN candidate is a brute pair with the SAME integer cosine
    // — the candidate stage can only SELECT pairs, never re-score them
    ann.foreach { case (qa, qb, c) =>
      assert(brute.get((qa, qb)).contains(c), s"($qa,$qb): ann c=$c brute=${brute.get((qa, qb))}")
    }
    // and the margin stage applied to the brute frame RESTRICTED to the
    // ANN candidate set reproduces the ANN margins exactly — the two
    // paths differ only in which pairs the candidate stage admits
    val candSet = ann.map { case (qa, qb, _) => (qa, qb) }.toSet
    val restricted = Similarity.marginMining(
        Similarity.bitextPairs(e).filter(r =>
          candSet.contains((r.getLong(0), r.getLong(1)))), 4)
      .orderBy($"qa", $"qb").as[(Long, Long, Long)].collect().toSeq
    val viaAnn = Similarity.marginMining(Similarity.bitextPairsSrp(e), 4)
      .orderBy($"qa", $"qb").as[(Long, Long, Long)].collect().toSeq
    assert(restricted === viaAnn)
  }

  test("srpBandsFor: occupancy bound held at every size any width can meet; minimal width = most bands") {
    // explicit pins across the knee points (k = 64, occupancy 16):
    // 2^8 = 256 covers n ≤ 4096, then r = 16 to n ≤ 2^20, then r = 32
    assert(Similarity.srpBandsFor(64, 500L) === 8)
    assert(Similarity.srpBandsFor(64, 2000L) === 8)
    assert(Similarity.srpBandsFor(64, 4096L) === 8)  // boundary: 2^8 == 4096/16
    assert(Similarity.srpBandsFor(64, 4097L) === 4)  // knee: width deepens to 16
    assert(Similarity.srpBandsFor(64, 20000L) === 4)
    assert(Similarity.srpBandsFor(64, 1L << 20) === 4) // 2^16 == 2^20/16
    assert(Similarity.srpBandsFor(64, (1L << 20) + 1) === 2) // r = 32
    assert(Similarity.srpBandsFor(64, Long.MaxValue) === 2)  // widest fallback
    // the analytic occupancy bound n / 2^r ≤ occ holds whenever ANY
    // admissible width can meet it (beyond that the k budget binds and
    // the chooser returns the widest width)
    for (e <- 0 to 40) {
      val n = 1L << e
      val r = 64 / Similarity.srpBandsFor(64, n)
      if (math.pow(2.0, 32) >= n / 16.0)
        assert(n.toDouble / math.pow(2.0, r) <= 16.0, s"n=$n r=$r")
      // minimality: the next-narrower divisor width would violate the
      // bound — the chooser never gives up recall it doesn't have to
      val narrower = (1 until r).filter(64 % _ == 0).lastOption
      narrower.foreach { rn =>
        assert(math.pow(2.0, rn) < n / 16.0, s"n=$n r=$r narrower=$rn admissible")
      }
    }
  }

  test("auto-banded bitext: candidates are a subset of the fixed-width set and shrink past the knee; gated SFs unchanged") {
    // at the gated corpus sizes (≤ 4096) the chooser reproduces the
    // fixed 8-band default — the oracle results are knee-invariant
    val e = emb
    val auto = Similarity.bitextPairsSrpAuto(e)
      .as[(Long, Long, Long)].collect().toSet
    val fixed = Similarity.bitextPairsSrp(e)
      .as[(Long, Long, Long)].collect().toSet
    assert(auto === fixed, "below the knee the chooser must be the default banding")
    // past the knee (n > 4096) the chooser picks r = 16: every r=16
    // band is the concatenation of two adjacent r=8 bands, so a
    // collision requires BOTH halves to collide — the deeper candidate
    // set is a STRICT subset of the fixed-width one on any corpus with
    // partial collisions, and per-row volume drops instead of filling
    val big = (0 until 5000).map { i =>
      (i.toLong, Seq.tabulate(8) { d =>
        (((i * 1103515245L + d * 12345L) % 1000L) / 500.0 - 1.0).toFloat })
    }.toDF("id", "vec")
    val deepCand = Similarity.bitextPairsSrpAuto(big)
      .select($"qa", $"qb").as[(Long, Long)].collect().toSet
    val fixedCand = Similarity.bitextPairsSrp(big)
      .select($"qa", $"qb").as[(Long, Long)].collect().toSet
    assert(deepCand.subsetOf(fixedCand),
      "an r=16 collision implies both constituent r=8 collisions")
    assert(deepCand.size < fixedCand.size,
      s"deeper bands must shrink candidates: ${deepCand.size} vs ${fixedCand.size}")
  }

  test("bitextSrpRecall: hits are exactly the brute-top pairs surviving as SRP candidates, single- and multi-probe") {
    val e = emb.filter($"id" < 200)
    val row = Similarity.bitextSrpRecall(e).head()
    val brute = Similarity.marginMining(Similarity.bitextPairs(e), 4)
      .orderBy($"margin_q".desc, $"qa", $"qb").limit(50)
      .select($"qa", $"qb").as[(Long, Long)].collect().toSet
    val cand = Similarity.bitextPairsSrpAuto(e).select($"qa", $"qb")
      .as[(Long, Long)].collect().toSet
    val candMp = Similarity.bitextPairsSrpAuto(e, probes = Int.MaxValue)
      .select($"qa", $"qb").as[(Long, Long)].collect().toSet
    assert(row.getLong(0) === brute.size.toLong)
    assert(row.getLong(1) === cand.size.toLong)
    assert(row.getLong(2) === (brute & cand).size.toLong)
    assert(row.getLong(3) ===
      (brute & cand).size.toLong * 10000L / brute.size.toLong)
    assert(row.getLong(4) === candMp.size.toLong)
    assert(row.getLong(5) === (brute & candMp).size.toLong)
    assert(row.getLong(6) ===
      (brute & candMp).size.toLong * 10000L / brute.size.toLong)
  }

  test("multi-probe srpNearDup: emitted pairs are a superset of single-probe, all exactly verified") {
    val e = emb
    val p0 = Similarity.srpNearDup(e, 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val pAll = Similarity.srpNearDup(e, 0.5, probes = Int.MaxValue)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // XOR symmetry makes ONE-sided probing cover every Hamming-1 pair
    // of the self-join regardless of (a, b) orientation, and probe
    // lists contain the unflipped value — so probing only adds
    assert(p0.subsetOf(pAll), s"${(p0 -- pAll).take(3)}")
    // every added pair is still a true threshold-passing pair (the
    // verify stage is unchanged — probing widens candidates only)
    val exact = Similarity.cosineNearDup(e, 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pAll.subsetOf(exact), s"${(pAll -- exact).take(3)}")
  }

  test("multi-probe SRP: candidates are a SUPERSET of the single-probe set at every probe depth, and monotone in probes") {
    val e = emb
    val p0 = Similarity.bitextPairsSrpAuto(e, probes = 0)
      .select($"qa", $"qb").as[(Long, Long)].collect().toSet
    val p1 = Similarity.bitextPairsSrpAuto(e, probes = 1)
      .select($"qa", $"qb").as[(Long, Long)].collect().toSet
    val pAll = Similarity.bitextPairsSrpAuto(e, probes = Int.MaxValue)
      .select($"qa", $"qb").as[(Long, Long)].collect().toSet
    // every probe list CONTAINS the unflipped value (f = 0), so probing
    // can only ADD candidates — the gate's recall_mp can never undercut
    // the single-probe recall
    assert(p0.subsetOf(p1), "probes=1 must contain the single-probe set")
    assert(p1.subsetOf(pAll), "deeper probing must contain shallower")
    // and on the fixture it genuinely adds pairs (the mechanism is live,
    // not a no-op): near-boundary sign flips exist in any real corpus
    assert(pAll.size > p0.size,
      s"multi-probe added nothing: ${pAll.size} vs ${p0.size}")
    // scored output agrees with the brute cosine on every added pair —
    // probing only widens the candidate set, never re-scores
    val brute = Similarity.bitextPairs(e)
      .as[(Long, Long, Long)].collect()
      .map { case (qa, qb, c) => ((qa, qb), c) }.toMap
    Similarity.bitextPairsSrpAuto(e, probes = Int.MaxValue)
      .as[(Long, Long, Long)].collect().foreach { case (qa, qb, c) =>
        assert(brute.get((qa, qb)).contains(c), s"($qa,$qb)")
      }
  }

  test("nprobe curve + chooser: recall monotone in depth, full depth exact, chooser = smallest depth meeting target") {
    val e = emb
    val q = e.filter($"id" < 10)
    val curve = Similarity.nprobeRecallCurve(e, q, 3)
      .orderBy($"nprobe").as[(Long, Long, Long, Long)].collect().toSeq
    assert(curve.nonEmpty)
    // more probes only ADD candidates, and a true top-k member present
    // among candidates always survives the subset top-k (its (sim, id)
    // order key is top-3 among ALL vectors) — so recall is monotone
    assert(curve.map(_._4).sliding(2).forall(w => w.size < 2 || w(0) <= w(1)),
      curve.toString)
    // probing every cluster degrades to exact search
    assert(curve.last._4 === 1000000L)
    // the chooser is exactly "smallest depth meeting the target"
    val np = Similarity.nprobeFor(e, q, 3, 900000L)
    assert(curve.filter(_._4 >= 900000L).map(_._1).min === np.toLong)
    // an unreachable target degrades to the full probe count, loudly
    // exact rather than silently approximate
    assert(Similarity.nprobeFor(e, q, 3, 1000001L) === curve.last._1.toInt)
    // the GATE ships ivfTopK at the chosen depth while the chooser
    // measured the curve's own per-depth ranking — pin that they agree
    // at the shallowest, chosen and deepest depths, so the measured
    // recall always describes the implementation that ships
    for (d <- Seq(1, np, curve.size).distinct) {
      val viaIvf = Similarity.recallAtK(
          Similarity.bruteForceTopK(q, e, 3),
          Similarity.ivfTopK(e, q, 3, d), 3)
        .agg(org.apache.spark.sql.functions.sum("n_hits"))
        .head().getLong(0)
      assert(viaIvf === curve(d - 1)._2,
        s"curve and ivfTopK disagree at depth $d")
    }
  }

  test("persisted IVF codebook roundtrips BIT-exactly: search results identical") {
    import graft.operators.SketchStore
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val cb = Similarity.labelCodebook(e).as[(Long, Seq[Double])].collect()
    val tbl = java.nio.file.Files.createTempDirectory("graft-annp-t").toString
    SketchStore.writeWave(
      cb.toSeq.flatMap { case (cid, cv) => cv.zipWithIndex.map { case (c, j) =>
        (cid.toString, j.toLong, java.lang.Double.doubleToLongBits(c)) } }
        .toDF("g", "slot", "v"),
      tbl, "build", "overwrite")
    val back = SketchStore.readMerged(spark, tbl, max)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq.map { case (g, cs) =>
        (g.toLong, cs.sortBy(_._2).map(c =>
          java.lang.Double.longBitsToDouble(c._3)).toSeq) }
      .sortBy(_._1)
    // IEEE bits identical per (cluster, dimension) — not just close
    assert(back === cb.toSeq.sortBy(_._1).map { case (c, v) => (c, v.toSeq) })
    val q = e.filter(col("id") < 10)
    val fresh = Similarity.ivfTopK(e, q, 3, 2)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val persisted = Similarity.ivfTopKWithCodebook(e, q, 3, 2,
        back.toDF("cluster_id", "cvec"))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(persisted === fresh,
      "search through the persisted index must equal the fresh-build search")
  }
}
