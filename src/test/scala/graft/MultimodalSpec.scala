package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: header decode, sampling kernels, partition-wise
  * feature extraction (codecs are deterministic stubs by design). */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val blobs = Multimodal.synthesize(
    spark.read.parquet(s"$sfSmoke/embeddings.parquet"))

  test("sampleBytes kernel known answers") {
    val b = (0 until 10).map(_.toByte).toArray
    assert(Multimodal.sampleBytes(b, 2, 3, 1).toSeq === Seq[Byte](2, 5, 8))
    assert(Multimodal.sampleBytes(b, 0, 4, 2).toSeq === Seq[Byte](0, 1, 4, 5, 8, 9))
    assert(Multimodal.sampleBytes(b, 10, 1, 1).toSeq === Seq.empty)
  }

  test("decodeMeta recovers the synthesized header fields") {
    val bad = Multimodal.decodeMeta(blobs)
      .filter(col("magic") =!= "IMG1" ||
        col("width") =!= (lit(16) + col("media_id") % 48).cast("int") ||
        col("height") =!= (lit(16) + col("media_id") % 32).cast("int") ||
        col("channels") =!= (lit(1) + col("media_id") % 3).cast("int") ||
        col("payload_bytes") =!= 128)
      .count()
    assert(bad === 0L)
  }

  test("thumbnail and frame-sample lengths follow the stride arithmetic") {
    val r = blobs.select(
        length(Multimodal.thumbnail(col("blob"), 7)).as("t"),
        length(Multimodal.frameSample(col("blob"), 16, 2)).as("f"))
      .distinct().as[(Int, Int)].collect()
    // payload 128 bytes: every 7th byte → ceil(128/7) = 19;
    // 8 frames of 16 → keep frames 0,2,4,6 → 64 bytes
    assert(r.toSeq === Seq((19, 64)))
  }

  test("extractFeatures is deterministic and schema-stable") {
    val a = Multimodal.extractFeatures(blobs).collect().map(_.toSeq).toSet
    val b = Multimodal.extractFeatures(blobs).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
    val row = Multimodal.extractFeatures(blobs).head()
    assert(row.getAs[Int]("payload_bytes") === 128)
    val mean = row.getAs[Double]("byte_mean")
    assert(mean > 0 && mean < 255)
  }
}
