package graft

/** Candidate-pair telemetry for the sf1 ritual (r15): the three
  * families whose sf1/sf0.1 time ratio runs superlinear — MinHash LSH,
  * edit near-dup, sparse tf-idf cosine — all grow in their CANDIDATE
  * volume, so the ritual records that volume per round next to the
  * times. Prints one line per family: `PAIRS <family> sf=<dir> n=<N>`.
  * Run per SF dir: `SPARK_GRAFT_SF_DIR=... Test/runMain graft.PairStats`. */
object PairStats {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // q_dedup_minhash's banding (n=3, k=64, bands=32)
    val minhash = graft.operators.Dedup
      .minhashCandidates(docs, "text", "doc_id", 3, 64, 32).count()
    println(s"PAIRS minhash sf=$sfDir n=$minhash")

    // q_edit_neardup's blocking (lang block, md5 60-bit content band)
    val tc0 = System.nanoTime()
    val edit = graft.operators.Dedup.editNearDupCandidates(
      docs, "text", "doc_id", "lang",
      contentBand = true, bandBits = 60,
      tokenHash = graft.operators.Dedup.md5Hash60).count()
    val candWall = (System.nanoTime() - tc0) / 1e9
    println(s"PAIRS edit sf=$sfDir n=$edit")
    // r16: the VERIFY wall next to the candidate count — pairs grew
    // 13.6× at 10× in r15; if this wall ever outruns the pair growth,
    // the banded-DP verify (not the blocking) is the knob to revisit.
    // The candidate-only run above populated the candidate memo, so
    // this full run's wall is dominated by the verify stage (counting
    // filter + banded DP + body join-back) — report it as the
    // memo-warm verify bound, not a subtraction (the stages share JIT
    // and scheduler noise a difference would amplify).
    val tv0 = System.nanoTime()
    val editKept = graft.operators.Dedup.editNearDup(
      docs, "text", "doc_id", "lang",
      contentBand = true, bandBits = 60,
      tokenHash = graft.operators.Dedup.md5Hash60).count()
    val verifyBound = (System.nanoTime() - tv0) / 1e9
    println(f"PAIRS edit_verify sf=$sfDir kept=$editKept cand_wall=$candWall%.2f verify_bound_wall=$verifyBound%.2f")

    // q_sparse_cosine's inverted index under the budget-derived df cap
    val dfc = docs.select(col("doc_id"),
        explode(graft.operators.Dedup.shingles(col("text"), 3)).as("t"))
      .distinct().groupBy(col("t")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val n = docs.count()
    val cap = graft.operators.Similarity.dfCapFor(dfc, 32L * n)
    val sparse = dfc.filter(col("df") <= cap)
      .agg(sum(expr("df * (df - 1) DIV 2"))).head().getLong(0)
    println(s"PAIRS sparse_cosine sf=$sfDir cap=$cap n=$sparse")
    spark.stop()
  }
}
