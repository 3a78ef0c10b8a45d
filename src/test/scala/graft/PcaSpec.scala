package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pca, Sketches}

/** PCA (one-pass Gram + integer power iteration) and the exact bitmap
  * distinct count: the fixed-round solve's convergence on the
  * quality-feature fixture, the exact Σpc1 = 0 centering invariant,
  * partitioning invariance, and the bitmap's equality with the naive
  * distinct (including negative ids, where truncating block division
  * would alias id −1 onto id 63) plus shard OR-merge invariance. */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def fixtureDocs = {
    // deterministic word-soup docs with a strong size factor, sizes
    // spread over two decades so the scatter is PC1-dominant
    val words = Seq("the", "table", "scan", "of", "merge", "a", "window",
      "batch", "to", "sort")
    (1 to 300).map { i =>
      val n = 5 + (i * 7) % 90 + (i % 3) * 40
      val text = (0 until n).map(k => words((i * 31 + k * 17) % 10))
        .mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("power iteration reaches its fixed point and PC1 explains the size factor") {
    val feats = Pca.docFeatures(fixtureDocs)
    val (v6, sv6, n6, evr) = Pca.solve(feats, 6, 6)
    val (v7, sv7, n7, _) = Pca.solve(feats, 6, 7)
    assert(v6.toSeq === v7.toSeq,
      "one extra round must move nothing once converged")
    assert(sv6 === sv7 && n6 === n7)
    assert(evr > 900000, s"size factor should dominate, evr_ppm=$evr")
    // strongest loading is the char count (feature 0) at full scale
    assert(v6(0).abs === BigInt(1000000))
  }

  test("projection is exactly centered (Σ pc1 = 0) and partitioning-invariant") {
    val feats = Pca.docFeatures(fixtureDocs)
    val total = Pca.project(feats).agg(sum(col("pc1"))).head().getDecimal(0)
    assert(total.signum === 0, s"n·Σ(q·v) − n·Σsᵢvᵢ must cancel, got $total")
    val a = Pca.project(feats).orderBy("id").collect().toSeq
    val b = Pca.project(feats.repartition(13)).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("bitmap distinct equals naive count_distinct, negatives included") {
    val df = ((-200 to 400) ++ (0 to 300) ++ Seq(-1, -1, 63, 63))
      .map(i => (s"g${math.abs(i) % 3}", i.toLong)).toDF("g", "id")
    val bm = Sketches.bitmapDistinct(df, col("g"), col("id"))
      .orderBy("g").as[(String, Long)].collect().toSeq
    val naive = df.groupBy(col("g")).agg(countDistinct(col("id")).as("ndv"))
      .orderBy("g").as[(String, Long)].collect().toSeq
    assert(bm === naive)
  }

  test("bitmap words OR-merge across shards to the single-pass sketch") {
    val df = (0 to 5000).map(i => ("g", (i * 37 % 1000).toLong)).toDF("g", "id")
    val single = Sketches.bitmapEstimate(
      Sketches.bitmapWords(df, col("g"), col("id")))
      .as[(String, Long)].head()
    val shards = (0 until 3).map(b =>
      Sketches.bitmapWords(df.filter(pmod(col("id"), lit(3)) === b),
        col("g"), col("id")))
    val merged = Sketches.bitmapEstimate(
      shards.reduce(_ unionAll _).groupBy(col("g"), col("blk"))
        .agg(expr("bit_or(w)").as("w")))
      .as[(String, Long)].head()
    assert(merged === single)
    assert(single._2 === 1000L)
  }
}
