package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — the tokenizer-training primitive
  * of an LLM data pipeline, distributed. Classic BPE (Sennrich et al.
  * 2016, public alg): start from characters, repeatedly find the most
  * frequent adjacent symbol pair across the corpus and fuse it.
  *
  * Scale shape: everything runs on the WORD-FREQUENCY table, not the
  * corpus — pair counting is an explode + map-side-combined sum over
  * (vocab-size × avg-word-len) rows, the merge step is a pure
  * projection, and the 1-row argmax broadcasts. The corpus is read
  * once to build word frequencies; at 100 TB the vocabulary table is
  * millions of rows regardless of corpus size, so per-iteration cost is
  * corpus-independent. Each round localCheckpoints the (small) vocab so
  * iteration k never replays rounds 1..k−1.
  *
  * Determinism: ties on pair count break lexicographically on (l, r);
  * merging is greedy left-to-right within each word, implemented as a
  * delimiter-wrapped literal `replace` — each symbol is wrapped
  * `␟s␟`, the pair pattern `␟l␟␟r␟` collapses to `␟lr␟`, and because
  * the wrapping doubles delimiters BETWEEN symbols, consecutive
  * occurrences ("abab", "aaa") merge exactly as the sequential
  * algorithm does. U+001F cannot appear in whitespace-split words. */
object Bpe {
  private val S = "\u001f"

  /** Corpus word-frequency table: (word, freq), whitespace-tokenized. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn the top `numMerges` BPE merges. Output: one row per merge,
    * (rank, l, r, merged, cnt) in learning order. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    learn(docs, textCol, numMerges)._1

  /** Corpus compression trajectory of the learned merges: row `rank` =
    * total corpus token count AFTER applying merges 1..rank (rank 0 =
    * the character baseline) — the measurement that tells you whether
    * the next thousand merges still pay for themselves. Token counts
    * weight each vocab word by its corpus frequency, so this is the
    * real corpus size, computed on the vocab table. */
  def compression(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (_, byRound) = learn(docs, textCol, numMerges)
    byRound.zipWithIndex.map { case (w, i) =>
      w.agg(sum(size(col("seq")) * col("freq")).as("corpus_tokens"))
        .select(lit(i).as("rank"), col("corpus_tokens"))
    }.reduce(_ unionByName _)
  }

  private def learn(docs: DataFrame, textCol: String,
                    numMerges: Int): (DataFrame, Seq[DataFrame]) = {
    var words = wordFreq(docs, textCol)
      .withColumn("seq",
        expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
      .localCheckpoint()
    val byRound = Seq.newBuilder[DataFrame]
    byRound += words
    var merges: DataFrame = null
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      val pairs = words.filter(size(col("seq")) > 1)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(seq)-1), " +
            "i -> struct(element_at(seq, i) AS l, element_at(seq, i+1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .localCheckpoint() // 1 row; evaluated once, reused twice below
      if (best.isEmpty) {
        // every word is a single symbol — no learnable pair remains.
        // Stop rather than carry on: the crossJoin against an EMPTY
        // best would silently empty the whole vocab, wiping later
        // rounds' trajectory instead of plateauing (the emptiness
        // check is one row off a checkpointed frame — cheap).
        exhausted = true
      } else {
        val ranked = best.select(lit(k).as("rank"), col("l"), col("r"),
          concat(col("l"), col("r")).as("merged"), col("cnt"))
        merges = if (merges == null) ranked else merges.unionByName(ranked)
        words = words
          .crossJoin(broadcast(best.select(col("l").as("__ml"), col("r").as("__mr"))))
          .withColumn("__w",
            expr(s"concat_ws('', transform(seq, s -> concat('$S', s, '$S')))"))
          .withColumn("__w2", expr(
            s"replace(__w, concat('$S', __ml, '$S', '$S', __mr, '$S')," +
              s" concat('$S', __ml, __mr, '$S'))"))
          .withColumn("seq", expr(s"filter(split(__w2, '$S'), x -> x != '')"))
          .select(col("word"), col("freq"), col("seq"))
          .localCheckpoint()
        byRound += words
        k += 1
      }
    }
    // zero learnable pairs at round 1 (single-char vocab): an empty
    // merges frame with the contract schema, not null
    val mergesOut =
      if (merges != null) merges
      else words.limit(0).select(lit(0).as("rank"), lit("").as("l"),
        lit("").as("r"), lit("").as("merged"), lit(0L).as("cnt"))
    (mergesOut, byRound.result())
  }
}
