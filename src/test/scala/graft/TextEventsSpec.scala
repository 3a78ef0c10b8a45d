package graft

import org.apache.spark.sql.functions._

import graft.operators.{Events, TextAnalysis}

/** Text-analysis known answers + as-of join semantics on hand-built
  * frames (the cases the fixture can't isolate). */
class TextEventsSpec extends SparkTestBase {
  import spark.implicits._

  test("bigram LM: hand-computed conditionals; sub-2-token docs drop out") {
    // corpus bigrams: (a b) ×2 [docs 1, 2], (b a) ×1, (a a) ×1
    // left-context counts: a→3, b→1
    val docs = Seq((1L, "a b"), (2L, "a b a a"), (3L, "x")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProb(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val ln = (x: Double) => BigDecimal(math.log(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc1: P(b|a)=2/3. doc2: P(b|a)=2/3, P(a|b)=1/1, P(a|a)=1/3
    val d1 = ln(2.0 / 3)
    val d2 = BigDecimal((ln(2.0 / 3) + ln(1.0) + ln(1.0 / 3)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === Seq((1L, 1L, d1), (2L, 3L, d2))) // doc 3 has no bigrams
  }

  test("KN bigram: hand-computed smoothing, continuation backoff ranks plausible order higher") {
    // corpus: "a b" x3, "c b" x1, "a c" x1 — b follows TWO distinct
    // contexts (high continuation), c follows one
    val docs = (Seq.fill(3)("a b") ++ Seq("c b", "a c")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val r = TextAnalysis.knBigramLogProb(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // counts: c(a,b)=3 c(c,b)=1 c(a,c)=1; c(a·)=4 c(c·)=1;
    // N1+(a·)=2 N1+(c·)=1; N1+(·b)=2 N1+(·c)=1; types=3
    def p(nb: Long, np: Long, n1p: Long, n1c: Long) =
      math.max(nb - 0.75, 0.0) / np + 0.75 * n1p / np * (n1c / 3.0)
    def lp(x: Double) = BigDecimal(math.log(x))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pab = lp(p(3, 4, 2, 2)); val pcb = lp(p(1, 1, 1, 2)); val pac = lp(p(1, 4, 2, 1))
    assert(r === Seq((0L, 1L, pab), (1L, 1L, pab), (2L, 1L, pab),
      (3L, 1L, pcb), (4L, 1L, pac)))
    // every probability finite and in (0,1); the well-attested (a,b)
    // outranks the singleton (a,c) in the same context
    assert(Seq(pab, pcb, pac).forall(v => v < 0 && !v.isInfinite))
    assert(pab > pac)
  }

  test("NB classify: planted class vocab recovered; OOV-only doc drops; ties break by class name") {
    // train (id % 5 != 0): 'pos' docs speak good/nice, 'neg' speak
    // bad/awful; 'both' is a shared token in every doc
    val docs = Seq(
      (1L, "good nice both", "pos"), (2L, "good good both", "pos"),
      (3L, "nice nice both", "pos"), (4L, "good nice both", "pos"),
      (6L, "bad awful both", "neg"), (7L, "bad bad both", "neg"),
      (8L, "awful awful both", "neg"), (9L, "bad awful both", "neg"),
      // test (id % 5 == 0)
      (0L, "good nice", "pos"), (5L, "bad awful", "neg"),
      (10L, "zzz qqq", "pos")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.nbClassify(docs, "text", "lang", "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "pred", "correct").as[(Long, String, Long)]
      .collect().toSeq
    // doc 10 is all-OOV and emits nothing; the others classify right
    assert(r === Seq((0L, "pos", 1L), (5L, "neg", 1L)))

    // symmetric counts + equal priors → exact DECIMAL score tie →
    // lexicographically smaller class wins on both engines
    val tied = Seq((1L, "w", "b_cls"), (2L, "w", "a_cls"),
      (0L, "w", "b_cls")).toDF("doc_id", "text", "lang")
    val t = TextAnalysis.nbClassify(tied, "text", "lang", "doc_id")
      .select("pred").as[String].collect().toSeq
    assert(t === Seq("a_cls"))
  }

  test("report ops survive an empty corpus: NULL ppm, no division error, no NPE") {
    val empty = spark.emptyDataset[(Long, String, String)]
      .toDF("doc_id", "text", "lang")
    val f = TextAnalysis.curationFunnel(empty, "text", "doc_id")
      .select("gate", "n_kept").as[(String, Long)].collect().toSeq
    assert(f.map(_._2).forall(_ == 0L) && f.size === 5)
    val emptyVec = spark.emptyDataset[(Long, Seq[Float], Int)]
      .toDF("id", "vec", "label")
    val sw = graft.operators.Similarity
      .dedupThresholdSweep(emptyVec, Seq(0.5))
      .select("n_total", "n_kept").as[(Long, Long)].collect().toSeq
    assert(sw === Seq((0L, 0L)))
    val obs = graft.operators.Profile.observedCounters(
      spark.emptyDataset[(Long, Double)].toDF("event_id", "value"))
      .as[(Long, Option[Long], Option[Double])].head()
    assert(obs === ((0L, None, None)))
  }

  test("tokenizer fertility: punctuation splits inflate the ratio; plain words are 1e6 ppm") {
    val docs = Seq((1L, "ab cd", "en"), (2L, "a-b x", "de"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.tokenizerFertility(docs, "text", "lang")
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    // de: "a-b x" → bpe tokens a,-,b,x = 4 over 2 words; en: 2 over 2
    assert(r === Seq(("de", 1L, 2L, 4L, 2000000L), ("en", 1L, 2L, 2L, 1000000L)))
  }

  test("source KL: single source diverges zero; disjoint vocab scores ln(corpus/source) per token") {
    val one = Seq((1L, "w1 w2 w3", "s")).toDF("doc_id", "text", "source")
    val r1 = TextAnalysis.sourceKl(one, "text", "source")
      .as[(String, Long, Double)].collect().toSeq
    assert(r1 === Seq(("s", 3L, 0.0)))
    // disjoint vocab, equal sizes: every token's ratio = nct/ns = 2
    val two = Seq((1L, "a a", "sa"), (2L, "b b", "sb"))
      .toDF("doc_id", "text", "source")
    val r2 = TextAnalysis.sourceKl(two, "text", "source")
      .orderBy("src").as[(String, Long, Double)].collect().toSeq
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2 === Seq(("sa", 2L, 2 * ln2), ("sb", 2L, 2 * ln2)))
  }

  test("curation funnel: monotone survival, per-stage cuts attribute to the right gate") {
    // good: 1/3 stopwords (quality), all trigrams distinct (repetition)
    val good = (1 to 10).map(i => s"the x$i y$i").mkString(" ")
    // rep: passes quality (enough stopwords + distinct unigrams) but
    // duplicated half-text repeats most trigrams → cut at repetition
    val half = "the t1 t2 the t3 t4 the t5 t6"
    val docs = Seq(
      (1L, good),                 // passes everything
      (2L, good),                 // exact dup of 1 → cut at dedup
      (3L, "a b"),                // too short → cut at token_band
      (4L, s"$half $half"))       // repetitive → cut at repetition
      .toDF("doc_id", "text")
    val r = TextAnalysis.curationFunnel(docs, "text", "doc_id")
      .orderBy("stage")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(r.map(x => (x._2, x._3)) === Seq(("total", 4L), ("token_band", 3L),
      ("quality", 3L), ("repetition", 2L), ("exact_dedup", 1L)))
    // n_cut is the delta from the previous stage; kept_ppm of total
    assert(r.map(_._4) === Seq(0L, 1L, 0L, 1L, 1L))
    assert(r.last._5 === 250000L)
  }

  test("NB calibration: buckets partition the test split with contiguous margin ranges") {
    // 40 docs, 4 classes of 10; test split = id % 5 == 0 (8 docs);
    // class tokens overlap pairwise so margins vary
    val docs = (0 until 40).map { i =>
      val cls = i % 4
      val t = cls match {
        case 0 => "alpha beta gamma"
        case 1 => "beta gamma delta"
        case 2 => "gamma delta epsilon"
        case _ => "delta epsilon alpha"
      }
      (i.toLong, t, s"c$cls")
    }.toDF("doc_id", "text", "lang")
    val r = TextAnalysis.nbCalibration(docs, "text", "lang", "doc_id",
        testMod = 5, buckets = 4)
      .orderBy("bucket")
      .as[(Int, Long, Long, Long, Double, Double)].collect().toSeq
    assert(r.map(_._2).sum === 8L)
    assert(r.forall(b => b._4 === b._3 * 1000000L / b._2))
    assert(r.forall(b => b._5 <= b._6))
    // margin ranges are contiguous across buckets (ntile over margin)
    r.sliding(2).foreach {
      case Seq(a, b) => assert(a._6 <= b._5 + 1e-12)
      case _ =>
    }
  }

  test("PMI collocations: known ratios, minCount cutoff, ratio ranks bound pairs first") {
    // corpus: "a b" x5 and "c d" x1 and "a d" x2; bigrams per doc row
    val docs = Seq.fill(5)("a b").zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((10L, "c d"), (11L, "a d"), (12L, "a d"))
    val r = TextAnalysis.pmiCollocations(docs.toDF("doc_id", "text"), "text",
      minCount = 2, topK = 10).as[(String, String, Long, Long)].collect().toSeq
    // bigrams: (a,b) x5, (c,d) x1 [below minCount], (a,d) x2; N=8
    // left marginals: a=7, c=1; right: b=5, d=3
    // ratio(a,b) = 8*5*1e6 / (7*5) = 1142857; ratio(a,d) = 8*2*1e6/(7*3) = 761904
    assert(r === Seq(("a", "b", 5L, 1142857L), ("a", "d", 2L, 761904L)))
  }

  test("MAD outliers: discrete medians, Hampel rule flags the planted spike") {
    // group g: values 1,2,3,4,100 -> med=3 (rank 3),|d|=2,1,0,1,97 -> mad=1
    // (rank 3 of 0,1,1,2,97); 97 > 3*1 flags exactly the spike
    val ev = Seq((1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0),
      (4L, "g", 4.0), (5L, "g", 100.0)).toDF("event_id", "event_type", "value")
    val r = Events.madOutliers(ev, "event_type", "value", "event_id")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(r === Seq(("g", 5L, 3.0, 1.0, 1L)))
  }

  test("spellCorrect: every correction is the typo itself (dist 0) or a " +
    "1-deletion parent of it (dist 1)") {
    // the planted-typo hash decides which tokens get noised, so build a
    // corpus large enough that qualifying tokens fire; every token is
    // vocabulary, so every typo is fixable
    val docs = (0L to 199L).map(i => (i, "table cable able zz"))
    val r = TextAnalysis.spellCorrect(docs.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Int, String, String, Int, Long)].collect().toSeq
    assert(r.nonEmpty) // 1/16 planting fired somewhere in 600 eligible tokens
    for ((_, _, typo, corrected, dist, _) <- r) {
      assert(corrected != null, s"unfixable typo in an all-vocab corpus: $typo")
      val dels = corrected.indices.map(i =>
        corrected.substring(0, i) + corrected.substring(i + 1))
      assert(if (dist == 0) corrected == typo else dels.contains(typo),
        s"$typo -> $corrected (dist $dist)")
    }
    // typos shortened from "able" have exactly one deletion parent in
    // this vocabulary ("able" itself); ties elsewhere break by count
    // then lexicographic order, pinned by the q_spell_correct oracle
    val fromAble = r.filter(t => Set("abe", "ale", "abl", "ble")(t._3))
    for ((_, _, _, corrected, dist, _) <- fromAble)
      assert(dist == 1 && corrected == "able", fromAble.toString)
  }

  test("phashNearDup finds planted one-byte twins and nothing else on a tiny corpus") {
    import graft.operators.Multimodal
    val emb = (0L until 40L).toDF("vec_id")
    val synth = Multimodal.synthesize(emb)
    val off = Multimodal.twinOffset(synth) // max id 39 -> 100
    assert(off === 100L)
    val corpus = Multimodal.withPlantedTwins(synth)
    val pairs = Multimodal.phashNearDup(corpus)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.nonEmpty)
    // every reported pair is a planted twin (base id, base id + offset)
    for ((a, b, h) <- pairs) {
      assert(b == a + off && a % 10 == 0, s"unexpected pair ($a,$b)")
      assert(h <= 3)
    }
  }

  test("local-mean pHash recovers >=49/50 fixture twins, zero false positives") {
    import graft.operators.Multimodal
    val synth = Multimodal.synthesize(
      spark.read.parquet(s"$sfSmoke/embeddings.parquet"))
    val off = Multimodal.twinOffset(synth)
    val corpus = Multimodal.withPlantedTwins(synth)
    val pairs = Multimodal.phashNearDup(corpus, local = true)
      .as[(Long, Long, Int)].collect().toSeq
    val planted = pairs.filter { case (a, b, _) => b == a + off && a % 10 == 0 }
    assert(pairs.size == planted.size,
      s"false positives: ${pairs.filterNot(planted.contains)}")
    assert(planted.size >= 49, s"recovered only ${planted.size}/50")
    // the global-mean variant's documented misses stay recovered-or-honest:
    // local strictly dominates on the fixture
    val globalRec = Multimodal.phashNearDup(corpus)
      .as[(Long, Long, Int)].collect()
      .count { case (a, b, _) => b == a + off && a % 10 == 0 }
    assert(planted.size >= globalRec)
  }

  test("phash clusters: every twin pair closes into one 2-member cluster") {
    import graft.operators.{Dedup, Multimodal}
    val synth = Multimodal.synthesize(
      spark.read.parquet(s"$sfSmoke/embeddings.parquet"))
    val off = Multimodal.twinOffset(synth)
    val pairs = Multimodal.phashNearDup(
        Multimodal.withPlantedTwins(synth), local = true)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    val clusters = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toSeq
    val byCluster = clusters.groupBy(_._2)
    // planted structure: twin groups are exactly {base, base + off},
    // cluster_id = the base (min member)
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).sorted === Seq(cid, cid + off),
        s"cluster $cid: ${members.map(_._1).sorted}")
    }
  }

  test("withPlantedTwins derives a collision-free offset at any id scale") {
    import graft.operators.Multimodal
    // ids straddling the old fixed 1e6 offset (the sf1 regression):
    // max 1000000 has 7 digits -> offset 1e7, twins land at 1e7 + id
    val emb = Seq(999990L, 1000000L).toDF("vec_id")
    val synth = Multimodal.synthesize(emb)
    assert(Multimodal.twinOffset(synth) === 10000000L)
    val ids = Multimodal.withPlantedTwins(synth)
      .select("media_id").as[Long].collect().toSeq
    assert(ids.size === ids.distinct.size, s"twin id collided: $ids")
    assert(ids.contains(10999990L) && ids.contains(11000000L))
  }

  test("interleave: arithmetic positions equal the naive global window; " +
    "short domains drain out") {
    // 3 domains of sizes 3/2/1: round 1 emits one doc per domain, round
    // 2 only from x and y, round 3 only from x
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y"),
      (6L, "z")).toDF("doc_id", "source")
    val got = graft.operators.Pack.interleave(docs, "source", "doc_id")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // the naive form: one global sort over (rk, domain, doc_id)
    val byDomain = got.groupBy(_._2)
    assert(byDomain.keySet === Set("x", "y", "z"))
    val naive = got.sortBy(t => (t._4, t._2, t._3)).zipWithIndex
      .map { case ((_, d, id, rk), i) => (i + 1L, d, id, rk) }
    assert(got.toSeq === naive.toSeq)
    // round-robin property: positions 1..3 cover all three domains
    assert(got.filter(_._1 <= 3).map(_._2).toSet === Set("x", "y", "z"))
    assert(got.map(_._1).toSeq === (1L to 6L).toSeq) // a permutation
  }

  test("globalShuffle: cell-rank positions equal the naive global md5 sort; " +
    "salt re-deals; partitioning-invariant") {
    val docs = (1L to 97L).map(Tuple1(_)).toDF("doc_id")
    def naive(salt: String) = (1L to 97L)
      .map(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$salt$id"), id))
      .sorted.zipWithIndex.map { case ((_, id), i) => (i + 1L, id) }
    val got = graft.operators.Pack.globalShuffle(docs, "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === naive("gs_"))
    // a different salt is a different epoch order (and still a permutation)
    val ep2 = graft.operators.Pack.globalShuffle(docs, "doc_id", "ep2_")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(ep2 === naive("ep2_"))
    assert(ep2 != got)
    assert(ep2.map(_._2).sorted === (1L to 97L).toSeq)
    // reproducible under a different physical partitioning
    val re = graft.operators.Pack.globalShuffle(docs.repartition(7), "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(re === got)
  }

  test("mixEpochPlan: small sources upsample (full epochs), large ones truncate") {
    // A: 10 docs x 100 tokens; B: 2 docs x 5 tokens. budget = 505;
    // sq weights 31622/3162 -> w_A = 909096 ppm, w_B = 90903 ppm;
    // target_A = 459 (epoch 0 + 5-doc partial of 500 tokens),
    // target_B = 45 = 4 FULL epochs of B + a 1-doc partial of 5
    val docs =
      (1L to 10L).map(i => (i, "A", Seq.fill(100)("w").mkString(" "))) ++
        Seq((11L, "B", "w w w w w"), (12L, "B", "w w w w w"))
    val r = TextAnalysis.mixEpochPlan(
        docs.toDF("doc_id", "source", "text"), "source", "text", "doc_id")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq(
      ("A", 10L, 1000L, 909096L, 459L, 0L, 5L, 500L),
      ("B", 2L, 10L, 90903L, 45L, 4L, 1L, 5L)))
  }

  test("winsorize: discrete P-bounds clamp the tails, clip counts exact") {
    // 1..20 in one group: p_lo = rank ceil(0.05*20)=1 -> 1.0,
    // p_hi = rank ceil(0.95*20)=19 -> 19.0; one value (20) clips high,
    // none clip low; winsorized sum = sum(1..19) + 19
    val ev = (1L to 20L).map(i => (i, "g", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val r = Events.winsorize(ev, "event_type", "value", "event_id")
      .as[(String, Long, Double, Double, Long, Long, Double)].collect().toSeq
    assert(r === Seq(("g", 20L, 1.0, 19.0, 0L, 1L, (1 to 19).sum + 19.0)))
  }

  test("char entropy: uniform text hits ln(alphabet), runs hit 0") {
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(r(0) === ((1L, 4L, 1L, 0.0)))           // single symbol: H = 0
    assert(r(1)._4 === 0.693147)                   // ln 2
    assert(r(2) === ((3L, 4L, 4L, 1.386294)))      // ln 4
  }

  test("BM25 and TF-IDF known answers (hand-computed, not oracle-lockstep)") {
    import graft.operators.TextAnalysis
    // three equal-length docs → dl/avgdl = 1, so the tf factor is
    // (1·2.2)/(1+1.2·1) = 1 and the score reduces to the idf term:
    // ln(1 + (3 − 1 + 0.5)/(1 + 0.5)) = ln(8/3)
    val docs = Seq((1L, "w1 w2 rare"), (2L, "w1 w2 w3"), (3L, "w1 w2 w4"))
      .toDF("doc_id", "text")
    val bm = TextAnalysis.bm25Search(docs, "text", "doc_id", Seq("rare"), 3)
      .as[(Long, Double)].collect()
    assert(bm.toSeq === Seq((1L, math.rint(math.log(8.0 / 3.0) * 1e4) / 1e4)))
    // tfidf(y in "x y") = (tf/dl)·ln((N+1)/(df+1)) = 0.5·ln(3/2)
    val tf = TextAnalysis.tfidfTerms(Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text"),
        "text", "doc_id")
      .filter(col("term") === "y")
      .select("weight").as[Double].collect()
    assert(tf.toSeq === Seq(0.5 * math.log(3.0 / 2.0)))
  }

  test("quality score known answers: perfect doc scores 1.0, repetitive doc 0.34") {
    // guards the ppm scale factor: the oracle SQL replays the same
    // arithmetic, so a wrong constant there stays gate-green — only a
    // hand-computed expected value catches it (a 2·10⁵-for-2·10⁶ slip
    // deflated every score 10× and silently emptied q_curation's gate)
    import graft.operators.TextAnalysis
    val docs = Seq(
      // 10 tokens, all distinct, 7 stopwords: num = 4·10+3·10+3·min(21,10)
      // = 100, den = 100 → exactly 1.0
      (1L, "the a of and to in is x1 x2 x3"),
      // 10 tokens, 1 distinct, 0 stopwords: num = 4+30+0 = 34 → 0.34
      (2L, "w w w w w w w w w w")
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.quality(docs, "text", "doc_id")
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(scores(1L) === 1.0)
    assert(scores(2L) === 0.34)
  }

  test("stratified sampling hits quotas exactly, deterministically, dropping unquoted groups") {
    val docs = (1L to 300L).map { i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "xx")
    }.toDF("doc_id", "lang")
    val quotas = Map("en" -> 40L, "zh" -> 500L)   // en capped, zh kept whole, xx dropped
    def sample() = TextAnalysis.stratifiedSample(docs, "lang", "doc_id", quotas)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    val s1 = sample()
    val byLang = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byLang === Map("en" -> 40, "zh" -> 100))   // min(quota, group size)
    assert(s1 === sample())                            // reproducible selection
  }

  test("stratified sampling: hash prune equals the unpruned window on a giant group") {
    // one 20k-row group with a 50-doc quota: the prune passes ~400 rows
    // to the exact window instead of sorting all 20k in one task, and
    // must select the IDENTICAL sample (the q_mix_quota oracle runs the
    // unpruned form in SQL, so this equality is also gate-checked)
    val docs = spark.range(1, 20001).select(col("id").as("doc_id"),
      when(col("id") % 100 === 0, "small").otherwise("big").as("lang"))
    val quotas = Map("big" -> 50L, "small" -> 20L)
    def sample(margin: Int) =
      TextAnalysis.stratifiedSample(docs, "lang", "doc_id", quotas, margin)
        .select("lang", "doc_id").as[(String, Long)].collect().toSet
    val pruned = sample(8)
    val plain = sample(Int.MaxValue) // threshold covers everything: no prune
    assert(pruned === plain)
    assert(pruned.count(_._1 == "big") === 50)
    assert(pruned.count(_._1 == "small") === 20)
    // margin=1 sits right at the expected survivor count — the runtime
    // guard (fall back to the unpruned window when a pruned group keeps
    // fewer than q survivors) must make even this margin exact, so the
    // prune can never silently return an under-quota or different sample
    assert(sample(1) === plain)
  }

  test("token packing: two-phase prefix sum matches the sequential fold, any partitioning") {
    import graft.operators.Pack
    // texts with varied token counts; ids deliberately unsorted on input
    val rows = (1L to 200L).map(i => (i, ("tok " * ((i % 17 + 1)).toInt).trim))
    val expectedStarts = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (id, text)) =>
        (id, acc + text.split(" ").length) }
      .sliding(2).map { case Seq((_, s), (id, _)) => id -> s }.toMap
    for (nPart <- Seq(1, 7)) {
      val df = rows.toDF("doc_id", "text").repartition(nPart)
      val got = Pack.assignBins(df, "text", "doc_id", budget = 64L)
        .select("doc_id", "start", "bin").as[(Long, Long, Long)].collect()
      got.foreach { case (id, start, bin) =>
        assert(start === expectedStarts(id), s"doc $id at $nPart partitions")
        assert(bin === start / 64L)
      }
    }
  }

  test("packed sequences are partition-invariant (order-sensitive assembly is sorted)") {
    import graft.operators.Pack
    val rows = (1L to 100L).map(i => (i, s"doc $i body ${"t " * (i % 9).toInt}".trim))
    def md5s(nPart: Int) = Pack.packedSequences(
        rows.toDF("doc_id", "text").repartition(nPart), "text", "doc_id", 64L)
      .select("bin", "packed_md5").as[(Long, String)].collect().toMap
    assert(md5s(1) === md5s(7))
    assert(md5s(1).nonEmpty)
  }

  test("token packing excludes null-id/null-text rows instead of crashing") {
    import graft.operators.Pack
    val df = Seq((Option(1L), Option("a b c")), (Option.empty[Long], Option("x")),
      (Option(2L), Option.empty[String])).toDF("doc_id", "text")
    val out = Pack.assignBins(df, "text", "doc_id", 64L)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq === Seq(1L))
  }

  test("PII redaction known answers: emails, phones, IPs, order contract, counts") {
    val rows = Seq(
      (1L, "mail a.b+c@x-mail.co now"),
      (2L, "call +1 555-0042 or 44 123-4567"),
      (3L, "host 10.0.0.1 and 999.999.999.999 both go"),
      (4L, "user9@example.com then +12 345-6789 then 172.16.254.3"),
      (5L, "no pii here at all")
    ).toDF("id", "t")
    val out = rows.select(col("id"), TextAnalysis.redactPii(col("t")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "mail <EMAIL> now")
    assert(out(2L) === "call <PHONE> or <PHONE>")
    // recall over validation: a structurally-IP-shaped non-IP is scrubbed
    assert(out(3L) === "host <IP> and <IP> both go")
    assert(out(4L) === "<EMAIL> then <PHONE> then <IP>")
    assert(out(5L) === "no pii here at all")
    val (ne, np, ni) = TextAnalysis.piiCounts(col("t"))
    val counts = rows.select(col("id"), ne, np, ni)
      .as[(Long, Int, Int, Int)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    assert(counts(2L) === ((0, 2, 0)))
    assert(counts(4L) === ((1, 1, 1)))
    assert(counts(5L) === ((0, 0, 0)))
  }

  test("funnel: strict first-occurrence ordering, ties and missing stages stop the depth") {
    // u1 completes all 3 in order; u2 views+clicks but purchase precedes
    // click (out of order); u3 views only; u4 has click==view tie (strict
    // order broken at stage 2); u5 never enters (no view)
    val evts = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 25L, "click"), (2L, 15L, "purchase"),
      (3L, 10L, "view"),
      (4L, 10L, "view"), (4L, 10L, "click"), (4L, 40L, "purchase"),
      (5L, 12L, "click"), (5L, 18L, "purchase")
    ).toDF("user_id", "ts_ns", "event_type")
    val out = graft.operators.Events.funnel(evts, Seq("view", "click", "purchase"))
      .orderBy(col("stage_idx"))
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("redaction scrub guarantee: no residual matches, idempotent on token text") {
    // 300 seeded random compositions of PII-ish and near-miss fragments
    // (space-separated, the realistic tokenized-text shape; digit-dot
    // runs that SPAN fragments — where any single-pass regex scrub can
    // leave re-matchable residue — cannot occur across a space)
    val frags = Seq("user@x.io", "plain words", "+1 555-1234", "10.0.0.1",
      "@@", "x.y", "123-4567", "9.9.9.9999", ".com", "u%p@d-e.org",
      "+123 456-7890", "999.999.999.999", "a@b.cd")
    val rnd = new scala.util.Random(42)
    val texts = (0 until 300).map(i =>
      (i.toLong, Seq.fill(5)(frags(rnd.nextInt(frags.length))).mkString(" ")))
    val df = texts.toDF("id", "t")
    val once = TextAnalysis.redactPii(col("t"))
    val (ne, np, ni) = TextAnalysis.piiCounts(once)
    val bad = df.select(
        once.as("r1"), TextAnalysis.redactPii(once).as("r2"),
        (ne + np + ni).as("resid"))
      .filter(col("r1") =!= col("r2") || col("resid") > 0)
      .count()
    assert(bad === 0L)
  }

  test("repetition ratio: novel text 0, looped phrase 4/7, short doc 0") {
    val rows = Seq(
      (1L, "a b c d e f"),
      (2L, "x y z x y z x y z"), // 7 trigram slots, 3 distinct
      (3L, "hi")
    ).toDF("id", "t")
    val out = rows.select(col("id"), TextAnalysis.repetitionRatio(col("t")).as("rr"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) === 0.0)
    assert(out(2L) === BigDecimal(4.0 / 7.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(3L) === 0.0)
  }

  test("topNgramCoverage: known answers, overlap counting, tie-break, short-doc exclusion") {
    val rows = Seq(
      (1L, "a b c d e"),          // all 2-grams unique → occ 1, top = "a b"
      (2L, "x x x x"),            // "x x" occ 3; 3*2*1000 DIV 4 = 1500 (>1000 by design)
      (3L, "b a b a c"),          // "b a" occ 2 beats "a b"/"a c" occ 1; 2*2*1000 DIV 5 = 800
      (4L, "solo")                // 1 token → excluded
    ).toDF("id", "t")
    val out = TextAnalysis.topNgramCoverage(rows, "t", "id")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((1L, "a b", 1L, 400L)))
    assert(out(2L) === ((2L, "x x", 3L, 1500L)))
    assert(out(3L) === ((3L, "b a", 2L, 800L)))
  }

  test("mixTemperatureWeights: 4:1 token mass flattens to 2:1 in exact ppm") {
    val docs = Seq(
      (1L, "big", ("w " * 16).trim),   // 16 tokens
      (2L, "small", ("w " * 4).trim)   //  4 tokens
    ).toDF("id", "source", "text")
    val out = TextAnalysis.mixTemperatureWeights(docs, "source", "text")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // isqrt milli-units: sqrt(16e6)=4000, sqrt(4e6)=2000; ppm over 6000
    assert(out("big") === (("big", 1L, 16L, 666666L)))
    assert(out("small") === (("small", 1L, 4L, 333333L)))
  }

  test("rolling hash known-answer: 'abc' folds to 304891") {
    // ((7*31+97)*31+98)*31+99 mod 1e9+7 = 304891
    val h = Seq("abc").toDF("text")
      .select(TextAnalysis.rollingHash(col("text"))).as[Long].head()
    assert(h === 304891L)
  }

  test("rolling hash is order-sensitive; md5-bag is not") {
    val df = Seq(("ab c", "c ab")).toDF("x", "y")
    val Array(hx, hy) = df.select(
      TextAnalysis.rollingHash(col("x")), TextAnalysis.rollingHash(col("y")))
      .as[(Long, Long)].collect().flatMap(t => Array(t._1, t._2))
    assert(hx !== hy)
  }

  test("langId picks the profile with most stopword hits; alphabetical tie-break") {
    val df = Seq(
      "the cat sat on the mat in a hat",   // en hits
      "el que la de y",                    // es hits
      "xyzzy plugh").toDF("text")          // no hits → tie → 'de'
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(got === Seq("en", "es", "de"))
  }

  test("char-n-gram langId scores bigram profiles; English text wins on th/he") {
    val got = Seq("the weather here is rather nice these days")
      .toDF("text")
      .select(TextAnalysis.langIdNgram(col("text"))).as[String].head()
    assert(got === "en")
    // no profile hits anywhere → alphabetical tie-break
    val none = Seq("xxxx qqqq").toDF("text")
      .select(TextAnalysis.langIdNgram(col("text"))).as[String].head()
    assert(none === "de")
  }

  test("codegen'd language-ID kernels equal the column-fold formulations on the corpus") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionAll(Seq((9001L, ""), (9002L, "the el le der 的"),
        (9003L, "xyzzy plugh")).toDF("doc_id", "text"))
    val diffTok = docs.select(
        TextAnalysis.langId(col("text")).as("fast"),
        TextAnalysis.langIdFold(col("text")).as("fold"))
      .filter(col("fast") =!= col("fold"))
    assert(diffTok.isEmpty, diffTok.take(3).mkString)
    val diffNg = docs.select(
        TextAnalysis.langIdNgram(col("text")).as("fast"),
        TextAnalysis.langIdNgramFold(col("text")).as("fold"))
      .filter(col("fast") =!= col("fold"))
    assert(diffNg.isEmpty, diffNg.take(3).mkString)
  }

  test("quality score stays in [0,1] on the fixture corpus") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val mm = TextAnalysis.quality(docs, "text", "doc_id")
      .agg(min(col("quality_score")), max(col("quality_score")))
      .as[(Double, Double)].head()
    assert(mm._1 >= 0.0 && mm._2 <= 1.0)
  }

  test("bpe token count: letters/digit-runs/punct each count once") {
    val n = Seq("ab12,cd ef!").toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text"))).as[Int].head()
    // ab | 12 | , | cd | ef | !  = 6
    assert(n === 6)
  }

  test("tfidf vectors: map-typed, rare terms outweigh common ones") {
    val df = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple apple")).toDF("doc_id", "text")
    val vecs = TextAnalysis.tfidfVectors(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getMap[String, Double](1)).toMap
    // 'apple' appears in all docs → lowest idf; 'banana'/'cherry' in one
    assert(vecs(1L)("banana") > vecs(1L)("apple"))
    assert(vecs(2L)("cherry") > vecs(2L)("apple"))
    assert(vecs(3L).keySet === Set("apple"))
    // weights are (tf/dl)·ln((N+1)/(df+1)): spot-check doc 2's cherry
    val expected = (1.0 / 2.0) * math.log(4.0 / 2.0)
    assert(math.abs(vecs(2L)("cherry") - expected) < 1e-12)
  }

  test("asof join attaches most recent strictly-earlier left event per user") {
    val ev = Seq(
      // (event_id, user_id, ts_us, event_type)
      (1L, 1L, 100L, "click"),
      (2L, 1L, 200L, "click"),
      (3L, 1L, 200L, "purchase"), // tie on ts: click id=2 sorts first (id order) → visible
      (4L, 1L, 300L, "purchase"), // sees click 2
      (5L, 2L, 150L, "purchase"), // user 2 has no prior click → null
      (6L, 2L, 160L, "click"),
      (7L, 2L, 170L, "purchase")  // sees click 6
    ).map { case (e, u, t, ty) => (e, u, t, ty, 0.0) }
      .toDF("event_id", "user_id", "ts_us", "event_type", "value")
    val got = Events.asofJoin(ev, "click", "purchase")
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(3L) === Some(2L))
    assert(got(4L) === Some(2L))
    assert(got(5L) === None)
    assert(got(7L) === Some(6L))
  }

  test("chunkWindows covers every char, overlaps by window-stride, no empty chunks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a" * 450),  // 3 windows: 0-200, 150-350, 300-450
      (2L, "b" * 200),  // exactly one window
      (3L, "c" * 10),   // shorter than a window: one short chunk
      (4L, "d" * 201)   // 2 windows; second is 51 chars
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .chunkWindows(docs, "text", "doc_id", 200, 150)
      .select("doc_id", "chunk_idx", "chunk_len")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    assert(got(1L) === List(200, 200, 150))
    assert(got(2L) === List(200))
    assert(got(3L) === List(10))
    assert(got(4L) === List(200, 51))
    // coverage: windows reach the end of every doc
    got.foreach { case (_, lens) => assert(lens.forall(_ > 0)) }
  }

  test("decayedCounts: power-of-two day weights, global max day, 20-day saturation") {
    import spark.implicits._
    val day = 86400000000000L
    // group a: days 2,2,1,0 -> 2^20 + 2^20 + 2^19 + 2^18; group b: day -40
    // (age 42, saturates at 20) -> weight 1, exercising the floor
    val ev = Seq(("a", 2L), ("a", 2L), ("a", 1L), ("a", 0L), ("b", -40L))
      .toDF("event_type", "d").withColumn("ts_ns", col("d") * day)
    val r = graft.operators.Events.decayedCounts(ev, "event_type")
      .orderBy("event_type")
      .select("event_type", "n_events", "last_day", "score")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r === Seq(
      ("a", 4L, 2L, (1L << 20) + (1L << 20) + (1L << 19) + (1L << 18)),
      ("b", 1L, -40L, 1L)))
  }

  test("seasonalAnomaly: only the cell above 2x its hour-of-day mean is flagged") {
    import spark.implicits._
    val hour = 3600000000000L
    // hour 5: counts 1,1,1,10 over days 0..3 (total 13, 4 days) -> the
    // 10 is 10*4 > 2*13; hour 6: uniform 2,2 -> nothing flagged
    val rows =
      (0 to 2).map(d => ("g", d.toLong * 24 + 5, 1)) ++ Seq(("g", 3L * 24 + 5, 10)) ++
      (0 to 1).map(d => ("g", d.toLong * 24 + 6, 2))
    val ev = rows.flatMap { case (g, h, n) => Seq.fill(n)((g, h)) }
      .toDF("event_type", "h").withColumn("ts_ns", col("h") * hour)
    val r = graft.operators.Events.seasonalAnomaly(ev, "event_type")
      .select("event_type", "day", "hr", "n", "days_seen", "total")
      .as[(String, String, Int, Long, Long, Long)].collect().toSeq
    assert(r === Seq(("g", "1970-01-04", 5, 10L, 4L, 13L)))
  }

  test("blocklist: anchor-and-verify equals naive phrase counting, overlaps included") {
    val docs = Seq(
      (1L, "a a a b"),            // "a a" matches at 2 start positions
      (2L, "x y z"),              // no hits
      (3L, "b c d b c"),          // "b c" twice, "b c d" once
      (4L, "a"),                  // anchor word but window too short
      (5L, "c d b c d")           // cross-phrase mix
    ).toDF("doc_id", "text")
    val phrases = Seq("a a", "b c", "b c d")
    val got = TextAnalysis.blocklistHits(docs, "text", "doc_id", phrases)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // naive reference: every start position × every phrase
    val naive = Seq(1L -> "a a a b", 3L -> "b c d b c", 5L -> "c d b c d")
      .map { case (id, t) =>
        val ws = t.split(" ")
        val hits = for {
          p <- phrases; pw = p.split(" ")
          i <- 0 to ws.length - pw.length
          if ws.slice(i, i + pw.length).sameElements(pw)
        } yield p
        (id, hits.size.toLong, hits.distinct.size.toLong)
      }
    assert(got === naive)
    assert(got.map(_._1) === Seq(1L, 3L, 5L), "docs 2 and 4 must not appear")
  }

  test("blocklist stress: stopword-anchored list — verify join sees one row per doc, not per anchor") {
    // adversarial list: the phrase's first word is every doc's most
    // frequent token, so anchor volume ≈ token volume. The old
    // per-anchor verify join materialized one copy of each doc's token
    // array per anchor (here 50 copies/doc); the folded shape ships one.
    val docs = (0L until 40L).map { id =>
      (id, (Seq.fill(50)("the") ++ Seq("quick", "fox")).mkString(" "))
    }.toDF("doc_id", "text")
    val phrases = Seq("the quick", "the the the")
    val anchors = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === "the")
    val anchorVolume = anchors.count()           // 50 anchors × 40 docs
    val verifyRows = anchors.select("doc_id").distinct().count() // 1/doc
    assert(anchorVolume === 2000L && verifyRows === 40L,
      s"stress fixture drifted: $anchorVolume anchors, $verifyRows docs")
    // correctness under anchor pressure: "the quick" fires once per doc
    // (position 50), "the the the" at 48 overlapping starts per doc
    val got = TextAnalysis.blocklistHits(docs, "text", "doc_id", phrases)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got === (0L until 40L).map(id => (id, 49L, 2L)))
  }

  test("blocklist: non-broadcast phrase route (million-phrase escape) matches the broadcast default") {
    val docs = Seq((1L, "a a a b"), (2L, "x y z"), (3L, "b c d b c"))
      .toDF("doc_id", "text")
    val phrases = Seq("a a", "b c", "b c d")
    def rows(bc: Boolean) =
      TextAnalysis.verifiedBlocklistMatches(docs, "text", "doc_id", phrases, bc)
        .orderBy("doc_id", "p").as[(Long, String)].collect().toSeq
    assert(rows(bc = false) === rows(bc = true))
    // and the escape really does drop the broadcast hint on the anchor
    // join (the analyzed plan carries hints verbatim; the optimizer may
    // still CHOOSE broadcast for a tiny list — the point is that a
    // million-phrase table is no longer forced through the driver)
    def analyzed(bc: Boolean) = TextAnalysis.verifiedBlocklistMatches(
      docs, "text", "doc_id", phrases, bc).queryExecution.analyzed.toString
    assert(analyzed(true).contains("ResolvedHint"), analyzed(true))
    assert(!analyzed(false).contains("ResolvedHint"), analyzed(false))
  }
}
