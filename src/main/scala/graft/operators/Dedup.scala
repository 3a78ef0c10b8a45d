package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators over a document corpus — the LLM-training-data
  * slice of the engine (north-star mandate; the reference itself has no
  * analog, being a KV comparator — its nearest concept is the
  * whole-corpus equality check, `checksum/checksum.go:173-178`, which
  * dedup generalizes from "are two corpora identical" to "which rows
  * within one corpus are (near-)identical").
  *
  * Scale design (100 TB):
  *  - exact dedup groups on a 128-bit content hash, never on the full
  *    text — the shuffle moves 16-byte keys, not document bodies;
  *  - near-dup is LSH-banded (MinHash / SimHash chunks): candidates come
  *    from equi-joins on small band hashes, so the plan is a sequence of
  *    hash-partitioned joins — NO all-pairs cross join anywhere;
  *  - exact-Jaccard verification runs only on the candidate set;
  *  - the inverted-index Jaccard join prunes by shingle document
  *    frequency (a hot shingle shared by half the corpus generates
  *    quadratic candidate pairs; drop shingles with df > maxDf, which
  *    only ever *removes* near-constant shingles that carry no
  *    similarity signal).
  */
object Dedup {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles. Documents shorter than n tokens
    * produce one shingle holding all their tokens (never an empty or
    * descending `sequence`). */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(w) - lit(n - 1), lit(1))),
        i => concat_ws(" ", slice(w, i, lit(n)))))
  }

  /** Exact dedup groups: one row per distinct content, keyed by a
    * 128-bit md5 content fingerprint (grouping on the hash, not the
    * body). Output: (fp, keep_doc_id = min id, dup_count). */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("fp"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("dup_count"))

  /** Bag-of-words dedup groups: documents equal up to token order and
    * multiplicity (sorted distinct token set) are one group. */
  def bagGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(
        md5(array_join(array_sort(array_distinct(split(col(textCol), " "))), " ")
          .cast("binary")).as("fp"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("dup_count"))

  /** The deduplicated corpus itself: keep the min-id row per exact
    * content (deterministic survivor rule). */
  def dropExactDuplicates(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol).cast("binary"))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signatures: k independent permutation-minima approximated
    * by `min over shingles of xxhash64(seed_j, shingle)`. Computed as
    * explode(shingles) → k grouped min-aggregates: each shingle is built
    * and hashed exactly once per seed, the mins partial-aggregate
    * map-side, and the plan stays inside whole-stage codegen. (The naive
    * single-projection form — k × array_min(transform(...)) — inlines
    * the shingle subtree k times into one giant expression and ran two
    * orders of magnitude slower.) Output: (doc_id, sig array<long>). */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        n: Int, k: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), n)).as("s"))
    val aggs = (0 until k).map(j => min(xxhash64(lit(j), col("s"))).as(s"__m$j"))
    sh.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(j => col(s"__m$j")): _*).as("sig"))
  }

  /** LSH candidate pairs: split the k-long signature into `bands` bands
    * of k/bands rows, hash each band, group docs by (band, hash) bucket
    * and emit each bucket's pairwise combinations. Deterministic
    * (xxhash64), banded — never all-pairs; the signature aggregation
    * runs ONCE (a banded self-join would recompute it per side — Spark
    * does not reuse the exchange across the two aliases). Bucket pair
    * expansion is in-memory per bucket: LSH bucket sizes are small by
    * construction (a giant bucket means a giant true near-dup cluster,
    * whose quadratic pair OUTPUT is inherent to the problem). */
  def minhashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sig = minhashSignatures(docs, textCol, idCol, n, k)
    val banded = sig.select(col("doc_id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * r + 1, r))): _*)))
      .toDF("doc_id", "band_id", "band_hash")
    // sorted ids → combinations (i < j) are already (doc_a < doc_b)
    val pairs = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
        struct(x.as("a"), y.as("b")))))
    banded.groupBy(col("band_id"), col("band_hash"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(pairs).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** MinHash near-dup pairs, verified: LSH candidates filtered by EXACT
    * shingle Jaccard >= threshold. The LSH stage only prunes; every
    * emitted pair is exactly verified, so output is deterministic. */
  def minhashNearDup(docs: DataFrame, textCol: String, idCol: String,
                     threshold: Double, n: Int = 3, k: Int = 64,
                     bands: Int = 16): DataFrame = {
    val cand = minhashCandidates(docs, textCol, idCol, n, k, bands)
    val sh = docs.select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard similarity join via inverted index: explode
    * distinct shingles, join doc lists per shingle (intersection counts),
    * derive union from set sizes. SQL-expressible — the oracle twin runs
    * the same unnest/join in DuckDB. `maxDf` drops shingles present in
    * more than maxDf documents (hot-key/df pruning; pass Int.MaxValue to
    * disable — at fixture scale the oracle twin disables it too). */
  def jaccardJoin(docs: DataFrame, textCol: String, idCol: String,
                  threshold: Double, n: Int = 3,
                  maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))
    val sz = sh.select(col("doc_id"), size(col("sh")).as("n_sh"))
    // the index joins on xxhash64(shingle), not the shingle string: the
    // shuffle moves 8-byte longs instead of n-gram text (~30% faster at
    // sf0.1; a cross-shingle hash collision would perturb one
    // intersection count with probability ~|shingles|²/2^65 — negligible)
    var tok = sh.select(col("doc_id"), explode(col("sh")).as("t0"))
      .select(col("doc_id"), xxhash64(col("t0")).as("t"))
    if (maxDf != Int.MaxValue) {
      val df = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select(col("t"))
      tok = tok.join(df, Seq("t"))
    }
    val inter = tok.select(col("t"), col("doc_id").as("doc_a"))
      .join(tok.select(col("t"), col("doc_id").as("doc_b")), Seq("t"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast("double") /
         (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over a near-dup pair graph: every document in
    * a pair gets `cluster_id = min doc_id reachable` — the canonical
    * survivor of its duplicate cluster. Iterative min-label propagation
    * (one join + grouped min per round, lineage cut via localCheckpoint);
    * converges in O(graph diameter) rounds — near-dup clusters are
    * dense, so the practical diameter is tiny; `maxIters` is a
    * safety bound, and non-convergence raises rather than returning
    * partial labels. Input: (doc_a, doc_b) pairs. Output:
    * (doc_id, cluster_id). */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(min(col("label")).as("nlabel"))
      val next = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      iter += 1
    }
    require(converged, s"label propagation did not converge in $maxIters rounds")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** 64-bit SimHash per document: hash each token once, then for every
    * bit position sum +1/-1 contributions across tokens (with
    * multiplicity); bit b of the signature is 1 iff the sum is positive.
    * One explode + one 64-column grouped agg — fully partial-aggregated. */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b"))
    val summed = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(b =>
        when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    summed.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit signature into four 16-bit
    * chunks; by pigeonhole any pair within Hamming distance 3 shares at
    * least one exact chunk, so an equi-join per chunk finds ALL such
    * pairs (exact, not probabilistic); verify with bit_count(xor). */
  def simhashNearDup(docs: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole covers Hamming <= 3")
    val sig = simhash(docs, textCol, idCol)
    val chunked = sig.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("doc_id", "simhash", "chunk_id", "chunk")
    val a = chunked.select(col("chunk_id"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = chunked.select(col("chunk_id"), col("chunk"),
      col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
