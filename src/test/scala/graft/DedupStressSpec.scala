package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The two dedup failure shapes a 100 TB corpus WILL contain, planted
  * deliberately: a boilerplate shingle shared by every document (df ≈
  * |corpus| — licenses, headers, templates) and a 1000-document
  * duplicate cluster (mirrored pages). These are the scenarios the
  * operators' scale story claims to survive; this suite proves the df
  * cap and the banded join actually engage on them.
  *
  * Corpus: 3000 docs — 2000 with unique 12-word bodies, 1000 exact
  * copies of one text — all sharing a 5-word boilerplate header, so
  * the 3 header-only shingles have df = 3000. */
class DedupStressSpec extends SparkTestBase {
  import spark.implicits._

  private val header = "alpha beta gamma delta epsilon"

  private lazy val corpus: DataFrame = {
    val unique = (0 until 2000).map { i =>
      (i.toLong, header + " " + (0 until 12).map(j => s"u${i}w$j").mkString(" "))
    }
    val dupText = header + " " + (0 until 12).map(j => s"dupw$j").mkString(" ")
    val dups = (2000 until 3000).map(i => (i.toLong, dupText))
    (unique ++ dups).toDF("doc_id", "text").repartition(8).localCheckpoint()
  }

  /** The exact candidate-row count jaccardJoin's inverted-index
    * self-join shuffles: Σ over kept shingles of C(df, 2). */
  private def selfJoinRows(maxDf: Int): Long =
    Dedup.hashedShingleIndex(corpus, "text", "doc_id", 3)
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .agg(coalesce(sum(col("df") * (col("df") - 1)), lit(0L)).cast("long"))
      .as[Long].head() / 2

  test("df cap bounds the hot-shingle self-join; answer unchanged at the gate threshold") {
    val uncapped = selfJoinRows(Int.MaxValue)
    val capped = selfJoinRows(1500)
    // the 3 df=3000 header shingles alone contribute 3 * C(3000,2)
    assert(uncapped >= 3L * 3000 * 2999 / 2, s"uncapped=$uncapped")
    assert(capped <= uncapped - 3L * 3000 * 2999 / 2,
      s"cap did not drop the hot shingles: capped=$capped uncapped=$uncapped")
    // and a header-tight cap removes EVERY multi-doc shingle: the
    // remaining unique-body shingles have df=1 → zero candidate rows
    assert(selfJoinRows(100) === 0L)
    // the cap's documented score semantics: set sizes keep every
    // shingle, intersections only the kept ones — so a true-duplicate
    // pair sharing the 3 hot header shingles scores 12/18 ≈ 0.667
    // capped instead of 1.0, while header-only pairs sit at 3/27 ≈
    // 0.11 either way. At a 0.6 gate (under the deflated duplicate
    // score, above the boilerplate score) the answer is IDENTICAL
    // capped or not, and the cap cut the shuffle by the amount above
    def pairs(maxDf: Int): Set[(Long, Long)] =
      Dedup.jaccardJoin(corpus, "text", "doc_id", 0.6, 3, maxDf)
        .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val withCap = pairs(1500)
    val noCap = pairs(Int.MaxValue)
    assert(withCap === noCap)
    // exactly the duplicate cluster's C(1000,2) pairs
    assert(withCap.size === 1000 * 999 / 2)
  }

  test("banded LSH + exact verify survive the 1000-doc duplicate cluster") {
    // every cluster member shares all 16 band buckets: the candidate
    // join emits 16 * C(1000,2) rows as SHUFFLE volume (AQE-splittable),
    // never one task's in-memory combination explosion — and exact
    // verification then keeps precisely the C(1000,2) true pairs
    val found = Dedup.minhashNearDup(corpus, "text", "doc_id", 0.9)
    val pairs = found.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
    assert(pairs.length === 1000 * 999 / 2)
    assert(pairs.forall { case (a, b, j) => a >= 2000 && b >= 2000 && j === 1.0 })
  }

  test("exact dedup collapses the cluster first, shrinking near-dup input 3000 to 2001") {
    // the composition a real pipeline runs: exact dedup BEFORE near-dup
    // removes identical mega-clusters entirely (the one shape similarity
    // splitting cannot break), so the expensive stage sees one survivor
    val keep = Dedup.exactGroups(corpus, "text", "doc_id")
      .select(col("keep_doc_id").as("doc_id"))
    val survivors = corpus.join(keep, Seq("doc_id"))
    assert(survivors.count() === 2001L)
    val nearDupPairs = Dedup.jaccardJoin(
      survivors.select(col("doc_id"), col("text")), "text", "doc_id", 0.8, 3, 1500)
    assert(nearDupPairs.count() === 0L)
  }

  /** The exact candidate-row count simhashNearDup's chunk self-join
    * shuffles: Σ over kept (chunk_id, chunk) values of C(df, 2). */
  private def chunkJoinRows(maxChunkDf: Int): Long = {
    val sig = Dedup.simhash(corpus, "text", "doc_id")
    val chunked = sig.select(col("doc_id"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("doc_id", "chunk_id", "chunk")
    chunked.groupBy(col("chunk_id"), col("chunk")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxChunkDf)
      .agg(coalesce(sum(col("df") * (col("df") - 1)), lit(0L)).cast("long"))
      .as[Long].head() / 2
  }

  test("chunk-df cap bounds the hot-chunk simhash self-join; deduped answer unchanged") {
    // the 1000-doc duplicate cluster shares ALL FOUR chunk values —
    // each is a planted hot chunk with df >= 1000, contributing
    // 4 * C(1000,2) = ~2M candidate rows to the uncapped self-join
    val uncapped = chunkJoinRows(Int.MaxValue)
    assert(uncapped >= 4L * 1000 * 999 / 2, s"uncapped=$uncapped")
    // a cap below the cluster size drops those values from the join:
    // bounded candidates no matter how big the cluster grows
    val capped = chunkJoinRows(500)
    assert(capped <= uncapped - 4L * 1000 * 999 / 2,
      s"cap did not drop the hot chunks: capped=$capped uncapped=$uncapped")
    // the documented pipeline composition: exact dedup first collapses
    // the cluster, after which chunk dfs are small and the capped
    // operator returns the IDENTICAL answer to the uncapped one
    val keep = Dedup.exactGroups(corpus, "text", "doc_id")
      .select(col("keep_doc_id").as("doc_id"))
    val survivors = corpus.join(keep, Seq("doc_id"))
      .select(col("doc_id"), col("text")).localCheckpoint()
    def pairs(maxChunkDf: Int): Set[(Long, Long)] =
      Dedup.simhashNearDup(survivors, "text", "doc_id", maxChunkDf = maxChunkDf)
        .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(pairs(500) === pairs(Int.MaxValue))
  }

  test("editNearDup content band divides a hot (block, length-bucket) block's candidates") {
    // one giant block: 2000 same-lang docs whose lengths all land in
    // one bucket — WITHOUT a content band every doc meets every other
    // (~C(2000,2) = 2M candidate pairs); the simhash chunk in the join
    // key collapses that to near-zero for distinct contents
    val bucketed = corpus.filter(col("doc_id") < 2000) // the distinct-body docs
      .select(col("doc_id"), lit("en").as("lang"), col("text"))
      .localCheckpoint()
    val d = bucketed.select(col("doc_id"),
        (length(col("text")).divide(lit(32))).cast("long").as("b"))
    // no-band candidate volume: all pairs whose buckets are within the
    // derived radius 2 of each other — the quadratic shape the band
    // exists to break
    val noBand = d.select(col("b").as("ba"), col("doc_id").as("ia"))
      .join(d.select(col("b").as("bb"), col("doc_id").as("ib")),
        col("bb") >= col("ba") - 2 && col("bb") <= col("ba") + 2 &&
          col("ia") < col("ib"))
      .count()
    // banded candidate volume: additionally require one exact 16-bit
    // chunk agreement (what the operator's join key now carries)
    val sig = Dedup.simhash(bucketed, "text", "doc_id")
    val chunked = sig.select(col("doc_id"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("doc_id", "chunk_id", "chunk")
    val dc = d.join(chunked, Seq("doc_id"))
    val banded = dc.select(col("b").as("ba"), col("doc_id").as("ia"),
        col("chunk_id"), col("chunk"))
      .join(dc.select(col("b").as("bb"), col("doc_id").as("ib"),
          col("chunk_id"), col("chunk")), Seq("chunk_id", "chunk"))
      .filter(col("bb") >= col("ba") - 2 && col("bb") <= col("ba") + 2 &&
        col("ia") < col("ib"))
      .select(col("ia"), col("ib")).distinct()
      .count()
    assert(noBand >= 1000000L, s"hot block should be quadratic: $noBand")
    assert(banded < noBand / 100,
      s"content band must shrink the block >100x: banded=$banded noBand=$noBand")
  }

  test("editNearDupPrefix survives the hot block that trips the exact-mode guard") {
    // 1202 same-lang docs, one length bucket: 64-char shared boilerplate
    // + 64-char random tail — editNearDup's exact mode would be
    // quadratic here (the guard refuses it); the banded mode runs but
    // waives the recall guarantee. The q-gram prefix path must (a) run
    // unguarded, (b) return the exact answer — only the two planted
    // pairs — and (c) keep candidate volume orders below m²/2, because
    // the boilerplate grams have df = m and therefore never enter any
    // document's rarest-first prefix.
    val rnd = new scala.util.Random(11)
    val alpha = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toArray
    val boiler = "license header common to every document in this corpus!"
    def tail() = (0 until 64).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val bodies = (0 until 1200).map(i => (i.toLong, boiler + tail()))
    def sub3(s: String): String = {
      def flip(c: Char) = if (c == 'Q') 'R' else 'Q'
      val cs = s.toCharArray
      Seq(60, 80, 100).foreach(p => cs(p) = flip(cs(p)))
      new String(cs)
    }
    val planted = Seq((1200L, sub3(bodies(0)._2)), // dist exactly 3
                      (1201L, bodies(1)._2))        // dist 0
    val docs = (bodies ++ planted).toDF("doc_id", "text")
      .select(col("doc_id"), lit("en").as("lang"), col("text"))
      .localCheckpoint()
    val e = intercept[IllegalStateException] {
      Dedup.editNearDup(docs, "text", "doc_id", "lang", maxBucketOccupancy = 100)
        .count()
    }
    assert(e.getMessage.contains("occupancy"))
    val got = Dedup.editNearDupPrefix(docs, "text", "doc_id", "lang", q = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((0L, 1200L, 3), (1L, 1201L, 0)))
    // candidate-volume replica of the operator's index: positional
    // 3-grams, occurrence-tagged, ranked by global df, per-doc prefix of
    // 3τ+1 rarest — Σ C(bucket, 2) bounds the self-join's pair output
    val d0 = docs.select(col("doc_id"), col("text"), length(col("text")).as("len"))
    val grams = d0.select(col("doc_id"), col("len"),
        explode(sequence(lit(1), col("len") - lit(2))).as("gpos"), col("text"))
      .withColumn("gram", expr("substring(text, gpos, 3)"))
      .withColumn("occ", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"), col("gram")).orderBy(col("gpos"))))
      .select(col("doc_id"), col("len"), col("gram"), col("occ"))
      .localCheckpoint()
    val pref = grams
      .join(grams.groupBy(col("gram"), col("occ")).agg(count(lit(1)).as("gdf")),
        Seq("gram", "occ"))
      .withColumn("prank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("gdf"), col("gram"), col("occ"))))
      .filter(col("prank") <= lit(3) * expr("least(64, ((len + 64) * 100) DIV 1000)") + lit(1))
    val candUpper = pref.groupBy(col("gram"), col("occ"))
      .agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(col("m") * (col("m") - 1)), lit(0L)).cast("long"))
      .as[Long].head() / 2
    val quadratic = 1202L * 1201L / 2
    assert(candUpper < quadratic / 100,
      s"prefix index must break the hot block: cand<=$candUpper quadratic=$quadratic")
  }

  test("prefix-path volume guard refuses a gram-starved corpus; banded path handles it") {
    // single-char alphabet: every document's grams are the SAME few
    // (gram, occ) keys, so rarest-first selection cannot spread the
    // join and candidate volume goes quadratic — the guard must refuse
    // with the remedy named, and the named remedy (the banded
    // editNearDup) must actually handle the corpus
    val docs = (0 until 400).map { i =>
      (i.toLong, "a" * (180 + i % 8)) // one length bucket, zero gram diversity
    }.toDF("doc_id", "text")
      .select(col("doc_id"), lit("en").as("lang"), col("text"))
      .localCheckpoint()
    val e = intercept[IllegalStateException] {
      Dedup.editNearDupPrefix(docs, "text", "doc_id", "lang").count()
    }
    assert(e.getMessage.contains("candidate volume"))
    assert(e.getMessage.contains("contentBand"))
    // the DEFAULT bound is the derived verify-cost one (r14): the
    // refusal names the measured ratio, not a hand-set per-doc budget
    assert(e.getMessage.contains("derived verify-cost bound"), e.getMessage)
    // the banded path runs it (these docs ARE all near-dups; simhash
    // agrees on every chunk, blocking keeps it one dense true cluster)
    val banded = Dedup.editNearDup(docs, "text", "doc_id", "lang",
      contentBand = true, maxBucketOccupancy = Int.MaxValue)
    assert(banded.count() > 0L)
  }

  test("prefix-path derived budget: real text passes with NO knob; the manual per-doc override still arms the old bound") {
    // the flagship entry's exact shape — the derived verify-cost bound
    // (volume ≤ 16 × gram mass) must admit the documents corpus at
    // every fixture SF without a hand-set budget (the r13 seam: a
    // per-doc constant needed raising at each scale jump)
    val d = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val derived = Dedup.editNearDupPrefix(d, "text", "doc_id", "lang",
      maxDistPermille = 50)
    assert(derived.count() >= 0L) // ran unguarded — no refusal
    // the manual override keeps its old semantics: a 1-candidate/doc
    // budget must trip, and the refusal names the MANUAL budget
    val e = intercept[IllegalStateException] {
      Dedup.editNearDupPrefix(d, "text", "doc_id", "lang",
        maxDistPermille = 50, maxCandidatesPerDoc = 1).count()
    }
    assert(e.getMessage.contains("manual budget 1/doc"), e.getMessage)
  }

  test("exact-mode occupancy guard refuses a quadratic (block, length-bucket) bucket") {
    // the naive-caller footgun the guard closes: a big same-block,
    // same-length-bucket corpus on the DEFAULT (exact) path would
    // materialize ~m²/2 candidate pairs; the guard fails fast with the
    // remedy instead of silently running the quadratic join
    val hot = spark.range(0, 300).select(col("id").as("doc_id"),
      lit("en").as("lang"),
      concat(lit("body body body body "), col("id").cast("string")).as("text"))
    val e = intercept[IllegalStateException] {
      Dedup.editNearDup(hot, "text", "doc_id", "lang", maxBucketOccupancy = 100)
        .count()
    }
    assert(e.getMessage.contains("occupancy"))
    assert(e.getMessage.contains("contentBand"))
    // the banded path is immune by construction and must run unguarded
    val banded = Dedup.editNearDup(hot, "text", "doc_id", "lang",
      contentBand = true, maxBucketOccupancy = 100)
    assert(banded.count() >= 0L)
    // and an explicit opt-out keeps the exact contract available
    val optOut = Dedup.editNearDup(hot, "text", "doc_id", "lang",
      maxBucketOccupancy = Int.MaxValue)
    assert(optOut.count() >= 0L)
  }
}
