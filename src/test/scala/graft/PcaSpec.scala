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
    val proj = Pca.project(feats)
    for (c <- Seq("pc1", "pc2"))
      assert(proj.schema(c).dataType.typeName === "long",
        "output must be BIGINT, never DECIMAL (driver-hash convention)")
    val totals = Pca.project(feats)
      .agg(sum(col("pc1")), sum(col("pc2"))).head()
    assert(totals.getLong(0) === 0L && totals.getLong(1) === 0L,
      s"n·Σ(q·v) − n·Σsᵢvᵢ must cancel for EVERY component, got $totals")
    val a = Pca.project(feats).orderBy("id").collect().toSeq
    val b = Pca.project(feats.repartition(13)).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("deflated PC2 reaches its fixed point and is near-orthogonal to PC1") {
    val feats = Pca.docFeatures(fixtureDocs)
    def comps(r2: Int): Map[Int, Seq[Long]] =
      Pca.components(feats, rounds2 = r2).orderBy("comp", "i")
        .as[(Int, Int, Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (c, rs) => c -> rs.map(_._3) }
    val at80 = comps(80)
    // fixture fixed point is round 69 — one extra round moves nothing
    assert(at80 === comps(81))
    val v1 = at80(0).map(BigInt(_))
    val v2 = at80(1).map(BigInt(_))
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum.abs
    val n1 = v1.map(x => x * x).sum
    val n2 = v2.map(x => x * x).sum
    // truncation-deflated orthogonality: |v1·v2| ≤ 10% of |v1||v2| on
    // the fixture (real corpora measure ~1e-3)
    assert(dot * dot * 100 < n1 * n2, s"dot=$dot n1=$n1 n2=$n2")
    // PC2 explains less than PC1 and both report vs the original scatter
    val evr = Pca.components(feats).select("comp", "evr_ppm").distinct()
      .as[(Int, Long)].collect().toMap
    assert(evr(0) > 900000 && evr(1) < evr(0) && evr(1) > 0, evr.toString)
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
