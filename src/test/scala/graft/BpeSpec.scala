package graft

import graft.operators.Bpe

/** BPE merge learning on closed-form corpora. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def merges(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] =
    Bpe.learnMerges(texts.toDF("text"), "text", k)
      .select("rank", "l", "r", "cnt")
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq

  test("hand-computed merges: most frequent pair wins each round") {
    // word freqs: aa x3, ab x2 → pairs (a,a):3 (a,b):2 → merge aa;
    // aa becomes a single symbol, only (a,b):2 remains → merge ab
    val got = merges(Seq("aa ab aa", "aa ab"), 2)
    assert(got === Seq((1, "a", "a", 3L), (2, "a", "b", 2L)))
  }

  test("greedy left-to-right merging: 'aaaa' fuses to (aa)(aa), not a(aa)a") {
    // round 1: (a,a) count 3 → greedy merge gives [aa, aa]; a non-greedy
    // or right-biased merge would leave [a, aa, a]-shaped splits whose
    // round-2 top pair differs
    val got = merges(Seq("aaaa"), 2)
    assert(got === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("ties break lexicographically on (l, r)") {
    // "ab" and "cd" both occur twice: (a,b):2 ties (c,d):2 → (a,b) first
    val got = merges(Seq("ab cd", "cd ab"), 1)
    assert(got === Seq((1, "a", "b", 2L)))
  }

  test("merged symbols participate in later rounds as units") {
    // "abab" x2: (a,b):4 wins (b,a):2 → [ab, ab] x2 → (ab,ab):2
    val got = merges(Seq("abab abab"), 2)
    assert(got === Seq((1, "a", "b", 4L), (2, "ab", "ab", 2L)))
  }

  test("compression: each distinct-symbol merge removes exactly its pair count") {
    // corpus "ab ab abc": chars 7; merge (a,b) cnt 3 → 4; merge (ab,c) → 3.
    // (For l≠r pairs occurrences can't overlap, so Δtokens = cnt.)
    val got = Bpe.compression(Seq("ab ab abc").toDF("text"), "text", 2)
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((0, 7L), (1, 4L), (2, 3L)))
  }

  test("requesting more merges than learnable pairs stops early, never empties the vocab") {
    // "ab" has exactly one learnable merge; asking for 5 used to
    // crossJoin an EMPTY best frame in round 2, silently wiping the
    // vocab and every later compression row
    val got = merges(Seq("ab ab"), 5)
    assert(got === Seq((1, "a", "b", 2L)))
    val comp = Bpe.compression(Seq("ab ab").toDF("text"), "text", 5)
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    // trajectory: 4 chars → 2 tokens, then the loop stops — rows are
    // truncated at the plateau, not emptied to zero
    assert(comp === Seq((0, 4L), (1, 2L)))
    // degenerate corpus of single-char words: zero merges, empty frame
    // with the contract schema
    val none = Bpe.learnMerges(Seq("a b a").toDF("text"), "text", 3)
    assert(none.columns.toSeq === Seq("rank", "l", "r", "merged", "cnt"))
    assert(none.count() === 0L)
  }
}
