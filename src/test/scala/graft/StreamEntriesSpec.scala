package graft

import org.apache.spark.sql.functions._

import graft.functions.Checksum
import graft.operators.{Diff, Events}
import graft.sources.KVSnapshot
import graft.streaming.StreamEntries

/** The driver-visible streaming entries must equal their batch twins on
  * the sf0.001 fixture — stream/batch equivalence at the query surface
  * (the per-operator semantics are covered by StreamingSpec). The batch
  * twins take their slice bounds from StreamEntries itself, so running
  * this suite under SPARK_GRAFT_STREAM_SCALE=N proves the equivalence
  * on the N×-widened state feeds too (the BENCH_SF1 configuration). */
class StreamEntriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val scale = StreamEntries.sliceScale

  test("q_stream_diff equals the batch diff on the same key range") {
    val streamed = StreamEntries.streamDiff(spark, dir)
    val batch = Diff.diff(
        KVSnapshot.srcStr(spark, dir).select(col("k").as("key"), col("v").as("value"))
          .filter(col("key") >= "li_0000000001" && col("key") < StreamEntries.keyUpper),
        KVSnapshot.dstStr(spark, dir).select(col("k").as("key"), col("v").as("value"))
          .filter(col("key") >= "li_0000000001" && col("key") < StreamEntries.keyUpper))
      .orderBy(col("key"), col("diff_class"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_sessions equals batch sessionization (bounds + counts)") {
    val streamed = StreamEntries.streamSessions(spark, dir)
    val batch = Events.sessionize(
        Events.read(spark, dir).filter(col("user_id") < lit(20L * scale)), 1800000000L)
      .select(col("user_id"), col("ts_start_us"), col("ts_end_us"), col("n_events"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_dedup equals batch distinct on the same key range") {
    val streamed = StreamEntries.streamDedup(spark, dir)
    val batch = KVSnapshot.srcStr(spark, dir)
      .select(col("k").as("key"), col("v").as("value"))
      .filter(col("key") >= "li_0000000001" && col("key") < StreamEntries.keyUpper)
    assert(streamed.count() > 0)
    // every row was fed 4x; exactly one copy survives
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_topk equals the batch Zipf head (counts summed across batches)") {
    val streamed = StreamEntries.streamTopK(spark, dir)
    val batch = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t")).limit(20)
    assert(streamed.count() === 20)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_keyed_checksum equals the batch per-group checksum") {
    val streamed = StreamEntries.streamKeyedChecksum(spark, dir)
    val kv = Events.read(spark, dir)
      .filter(col("user_id") < lit(100L * scale))
      .select(
        col("event_type").as("group"),
        col("event_id").cast("string").cast("binary").as("key"),
        col("props").cast("binary").as("value"))
    val batch = Checksum.byBucket(kv, col("group"))
      .select(col("bucket").as("group"), col("crc64_xor"),
        col("total_kvs"), col("total_bytes"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
