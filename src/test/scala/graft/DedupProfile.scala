package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manual profiling harness (Test/runMain graft.DedupProfile) — times the
  * dedup-family stages at a given SF to locate bench hot spots. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(docs.groupBy(col("lang")).count())

    time("shingles explode count") {
      noop(docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s")))
    }
    time("tok (hashed)") {
      noop(docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("t")))
    }
    time("jaccard_join full") {
      noop(Dedup.jaccardJoin(docs, "text", "doc_id", 0.0, 3)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5))
    }
    val pairs = Dedup.jaccardJoin(docs, "text", "doc_id", 0.0, 3)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("j"))
      .filter(col("j") >= 0.5)
    time("clusters (incl jaccard)") {
      noop(Dedup.nearDupClusters(pairs))
    }
    time("minhash_neardup") {
      noop(Dedup.minhashNearDup(docs, "text", "doc_id", 0.4, 3, 64, 32)
        .filter(col("jaccard") >= 0.5))
    }
    spark.stop()
  }
}
