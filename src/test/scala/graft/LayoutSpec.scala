package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: key correctness (hand-computed interleavings) and
  * the pruning benefit — per-partition bounding boxes shrink on BOTH
  * dimensions vs a 1-D sort. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zorder2 known answers: bit interleaving, x even / y odd") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (1023L, 1023L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        Layout.zorder2(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => ((x, y), z) }.toMap
    assert(got((0L, 0L)) === 0L)
    assert(got((1L, 0L)) === 1L)      // x bit 0 → z bit 0
    assert(got((0L, 1L)) === 2L)      // y bit 0 → z bit 1
    assert(got((1L, 1L)) === 3L)
    // x=5 (101), y=3 (011): z = 1·1 + 2·1 + 4·0 + 8·1 + 16·1 + 32·0 = 27
    assert(got((5L, 3L)) === 27L)
    assert(got((1023L, 1023L)) === (1L << 20) - 1)
  }

  test("z-clustering shrinks per-partition y-extent vs an x-only sort") {
    // a uniform 128×128 grid; 16 partitions. x-sorted partitions are
    // full-height stripes (y-extent = 127 each); z-sorted partitions
    // cover compact squares (y-extent ≈ 31)
    val pts = (for (x <- 0 until 128; y <- 0 until 128) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def yExtents(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(spark_partition_id().as("p"), col("y"))
        .groupBy("p").agg((max("y") - min("y")).as("ext"))
        .as[(Int, Long)].collect().map(_._2).toSeq
    val xSorted = pts.repartitionByRange(16, col("x"))
    val zSorted = Layout.clusterByZ(pts, col("x"), col("y"), 7, 16)
    val xExt = yExtents(xSorted)
    val zExt = yExtents(zSorted)
    assert(xExt.max >= 120, s"x-stripes should span ~full y: $xExt")
    assert(zExt.max <= 63, s"z-partitions must stay boxed in y: $zExt")
    // content untouched
    assert(zSorted.count() === 128L * 128L)
  }

  test("compact: sizes output files from input bytes, content-identical") {
    def parquetFiles(p: String): Seq[java.io.File] = {
      val d = new java.io.File(p)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).toSeq
    }
    val root = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    try {
      val frag = s"$root/frag"
      val out = s"$root/out"
      spark.read.parquet(s"$sfSmoke/documents.parquet").repartition(32)
        .write.mode("overwrite").parquet(frag)
      val fragFiles = parquetFiles(frag)
      assert(fragFiles.size === 32, s"fixture must be fragmented: ${fragFiles.size}")
      val total = fragFiles.map(_.length).sum
      val target = total / 4 + 1 // expect ~4 output files
      val n = Layout.compact(spark, frag, out, target)
      assert(n === ((total + target - 1) / target).toInt, s"n=$n")
      assert(parquetFiles(out).size === n,
        s"output must hold exactly $n files: ${parquetFiles(out).size}")
      assert(n < 32 && n >= 1)
      // content identical, bag semantics (md5 over every text)
      val a = spark.read.parquet(frag).select(md5(col("text").cast("binary")))
      val b = spark.read.parquet(out).select(md5(col("text").cast("binary")))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    } finally {
      graft.sources.FixtureStore.deleteRecursively(root)
    }
  }
}
