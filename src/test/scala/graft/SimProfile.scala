package graft

import org.apache.spark.sql.SparkSession

/** Manual profiling harness (Test/runMain graft.SimProfile) — times the
  * similarity-family queries at a given SF to locate bench hot spots. */
object SimProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sims = Seq("q_cosine_topk", "q_cosine_neardup", "q_srp_neardup",
      "q_ann_ivf", "q_quantized_topk")
    // warmup
    SparkEntry.queries("q_cosine_topk")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    sims.foreach { q =>
      time(q) {
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // auto-k semanticDedup (the production path): same inputs as
    // q_semantic_dedup but k derived from the corpus — occupancy, and
    // with it the pair-stage cost, should hold flat across SFs
    import org.apache.spark.sql.functions.col
    val embd = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    time("semantic_dedup_fixed_k5") {
      graft.operators.Similarity.semanticDedup(embd, 5, 2, 0.4)
        .write.format("noop").mode("overwrite").save()
    }
    time("semantic_dedup_auto") {
      graft.operators.Similarity.semanticDedupAuto(embd, 2, 0.4)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
