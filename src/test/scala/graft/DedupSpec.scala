package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operator semantics, incl. planted-near-duplicate recovery (the
  * hard signal the oracle can't give the xxhash64-based paths). */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    // near-dup of 1: one word changed
    (2L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    // bag-dup of 1: same tokens, different order
    (4L, "today the lazy dog jumps over the quick brown fox near the river bank"),
    (5L, "completely different content about spark catalyst optimizer plans and shuffles"),
    (6L, "yet another unrelated document mentioning parquet files and column pruning")
  ).toDF("doc_id", "text")

  test("exact dedup groups exact duplicates, keeps min id") {
    val g = Dedup.exactGroups(corpus, "text", "doc_id")
      .filter(col("dup_count") > 1).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("keep_doc_id") === 1L)
    assert(g.head.getAs[Long]("dup_count") === 2L)
  }

  test("dropExactDuplicates keeps one row per content, min id") {
    val kept = Dedup.dropExactDuplicates(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 4L, 5L, 6L))
  }

  test("bag dedup unifies token-permuted documents") {
    val g = Dedup.bagGroups(corpus, "text", "doc_id")
      .filter(col("dup_count") > 1).collect()
    // {1,3,4} share the token set; 2 differs (cat vs dog)
    assert(g.length === 1)
    assert(g.head.getAs[Long]("keep_doc_id") === 1L)
    assert(g.head.getAs[Long]("dup_count") === 3L)
  }

  test("minhash LSH recovers planted near-duplicates and plants no false positives") {
    val pairs = Dedup.minhashNearDup(corpus, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // high-overlap pairs among {1,2,3} (3==1 exactly; 2 is one word off)
    assert(pairs.contains((1L, 3L)))
    assert(pairs.contains((1L, 2L)) === pairs.contains((2L, 3L))) // symmetry of equal docs
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L || p._1 == 6L || p._2 == 6L))
  }

  test("minhash candidates are a superset of verified pairs") {
    val cand = Dedup.minhashCandidates(corpus, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    val ver = Dedup.minhashNearDup(corpus, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(ver.subsetOf(cand))
  }

  test("jaccard join equals minhash-verified pairs at matching threshold") {
    val exact = Dedup.jaccardJoin(corpus, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDup(corpus, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // LSH never invents pairs
    assert(exact === lsh)       // and at this scale recovers all of them
  }

  test("simhash: exact duplicates share signatures; near-dups are close; hamming classification") {
    val sig = Dedup.simhash(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) === sig(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(2L)) < ham(sig(1L), sig(5L)))
    val pairs = Dedup.simhashNearDup(corpus, "text", "doc_id", 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L))) // hamming 0
  }

  test("nearDupClusters labels every member with the min reachable doc id") {
    // a 5-node chain (worst-case diameter) + a separate pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("shingles of short documents never produce empty arrays") {
    val df = Seq((1L, "one"), (2L, "one two")).toDF("doc_id", "text")
    val sizes = df.select(size(Dedup.shingles(col("text"), 3))).as[Int].collect()
    assert(sizes.forall(_ === 1))
  }
}
