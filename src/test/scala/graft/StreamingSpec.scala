package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.WindowedChecksum

/** Structured-Streaming windowed checksum: stream/batch equivalence and
  * watermark late-data semantics (SURVEY §7-M5). */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
  private def kv(min: Int, k: String, v: String) =
    (ts(min), k.getBytes("UTF-8"), v.getBytes("UTF-8"))

  test("stream result equals batch result; late row beyond watermark is dropped") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Array[Byte], Array[Byte])]
    val stream = WindowedChecksum(
      mem.toDF.toDF("ts", "key", "value"), "ts", "10 minutes", Some("5 minutes"))
    val q = stream.writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      // window [00:00,00:10): two rows
      mem.addData(kv(1, "k1", "v1"), kv(2, "k2", "v2"))
      q.processAllAvailable()
      // advance event time to 00:20 → watermark 00:15 → first window closes
      mem.addData(kv(20, "k3", "v3"))
      q.processAllAvailable()
      // late row at 00:03, behind the 00:15 watermark → MUST be dropped
      mem.addData(kv(3, "late", "late"))
      q.processAllAvailable()
      // advance to 00:40 → second window closes
      mem.addData(kv(40, "k4", "v4"))
      q.processAllAvailable()

      val streamed = spark.table("wc")
        .select(col("w_start"), col("crc64_xor"), col("total_kvs"), col("total_bytes"))
        .collect().map(_.toSeq).toSet
      // batch twin over the NON-late rows only
      val batch = WindowedChecksum(
        Seq(kv(1, "k1", "v1"), kv(2, "k2", "v2"), kv(20, "k3", "v3"))
          .toDF("ts", "key", "value"), "ts", "10 minutes")
        .select(col("w_start"), col("crc64_xor"), col("total_kvs"), col("total_bytes"))
        .collect().map(_.toSeq).toSet
      assert(batch.subsetOf(streamed), s"streamed=$streamed batch=$batch")
      // the late row changed nothing: the [00:00,00:10) window holds 2 kvs
      val w0 = streamed.find(_.head == ts(0).toLocalDateTime
        .atZone(java.time.ZoneOffset.UTC)).orElse(
        streamed.find(r => r(2) == 2L))
      assert(w0.isDefined && w0.get(2) === 2L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops within the horizon, re-emits after eviction") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = mem.toDF.toDF("ts", "key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("key")
      .writeStream.format("memory").queryName("dd_evict")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), "a"))
      q.processAllAvailable()
      // same key inside the horizon: state live → dropped
      mem.addData((ts(5), "a"))
      q.processAllAvailable()
      // advance event time to 00:59 → watermark 00:49, far past the
      // first "a"'s 00:10 expiry → its state is EVICTED
      mem.addData((ts(59), "w"))
      q.processAllAvailable()
      // same key again, beyond the horizon: no state → re-emits. This is
      // the bounded-state contract: the store tracks the recent-key
      // window, not all keys ever seen.
      mem.addData((ts(59), "a"))
      q.processAllAvailable()
      val emitted = spark.table("dd_evict").filter(col("key") === "a").count()
      assert(emitted === 2L, "one emit per horizon, not one per key-lifetime")
    } finally q.stop()
  }

  test("mapGroupsWithState keyed checksum accumulates across micro-batches to the batch value") {
    import graft.streaming.KeyedChecksumState
    import graft.streaming.KeyedChecksumState.KVRecord
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[KVRecord]
    val q = KeyedChecksumState(mem.toDS())
      .writeStream.format("memory").queryName("kcs")
      .outputMode(KeyedChecksumState.outputMode).start()
    try {
      def rec(g: String, k: String, v: String) =
        KVRecord(g, k.getBytes("UTF-8"), v.getBytes("UTF-8"))
      // two micro-batches touching group "a"; one record for "b"
      mem.addData(rec("a", "k1", "v1"), rec("b", "k2", "v2"))
      q.processAllAvailable()
      mem.addData(rec("a", "k3", "v3"))
      q.processAllAvailable()
      // memory sink in Update mode appends each update; the latest state
      // per group is the one with the highest total_kvs (counts only grow)
      val last = spark.table("kcs")
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).maxBy(_._2) }
      // batch twin: checksum of all records per group via the monoid
      import graft.functions.{Crc64, RawChecksum}
      def batchOf(recs: (String, String)*) =
        recs.map { case (k, v) => RawChecksum.of(k.getBytes("UTF-8"), v.getBytes("UTF-8")) }
          .foldLeft(RawChecksum.zero)(_.merge(_))
      val ea = batchOf(("k1", "v1"), ("k3", "v3"))
      val eb = batchOf(("k2", "v2"))
      assert(last("a") === ((ea.crc64_xor, ea.total_kvs, ea.total_bytes)))
      assert(last("b") === ((eb.crc64_xor, eb.total_kvs, eb.total_bytes)))
    } finally q.stop()
  }

  test("stream-stream diff classifies src_only / dst_only / mismatch per closed window") {
    import graft.streaming.StreamDiff
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val srcMem = MemoryStream[(Timestamp, Array[Byte], Array[Byte])]
    val dstMem = MemoryStream[(Timestamp, Array[Byte], Array[Byte])]
    val out = StreamDiff(
      srcMem.toDF.toDF("ts", "key", "value"),
      dstMem.toDF.toDF("ts", "key", "value"),
      "ts", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("sdiff")
      .outputMode("append").start()
    try {
      // window [00:00,00:10): equal pair, mismatch pair, src-only, dst-only
      srcMem.addData(kv(1, "same", "x"), kv(2, "mut", "a"), kv(3, "only_src", "s"))
      dstMem.addData(kv(1, "same", "x"), kv(2, "mut", "b"), kv(4, "only_dst", "d"))
      q.processAllAvailable()
      // advance both watermarks past the window end
      srcMem.addData(kv(30, "tick", "t"))
      dstMem.addData(kv(30, "tick", "t"))
      q.processAllAvailable()
      val got = spark.table("sdiff")
        .collect()
        .map(r => (new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
          r.getAs[String]("diff_class")))
        .toSet
      assert(got === Set(
        ("mut", "mismatch"), ("only_src", "src_only"), ("only_dst", "dst_only")))
    } finally q.stop()
  }

  test("k-anon release gate: cells flush only at k, cross-batch; fixed point = batch filter") {
    import graft.streaming.StreamKAnon
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val out = StreamKAnon(
      mem.toDS().map(r => StreamKAnon.Record(r._1, r._2, r._3)), 3)
    val q = out.toDF("cell", "sub", "id").writeStream.format("memory")
      .queryName("skanon").outputMode("append").start()
    try {
      // batch 1: cell a has 2 rows (below k=3, held), cell b has 3 (flush)
      mem.addData(("a", 0L, 1L), ("a", 0L, 2L), ("b", 0L, 10L),
        ("b", 0L, 11L), ("b", 0L, 12L))
      q.processAllAvailable()
      val afterB1 = spark.table("skanon").select("id").collect().map(_.getLong(0)).toSet
      assert(afterB1 === Set(10L, 11L, 12L), s"only cell b may release: $afterB1")
      // batch 2: cell a's third row arrives -> buffered rows flush with it;
      // cell c stays below k and never releases
      mem.addData(("a", 0L, 3L), ("c", 0L, 20L), ("c", 0L, 21L))
      q.processAllAvailable()
      val afterB2 = spark.table("skanon").select("id").collect().map(_.getLong(0)).toSet
      assert(afterB2 === Set(1L, 2L, 3L, 10L, 11L, 12L), afterB2.toString)
      // batch 3: a released cell passes rows straight through
      mem.addData(("b", 0L, 13L))
      q.processAllAvailable()
      val fin = spark.table("skanon").select("id").collect().map(_.getLong(0)).toSet
      assert(fin === Set(1L, 2L, 3L, 10L, 11L, 12L, 13L), fin.toString)
      // fixed point: equals the batch kAnonFilter of everything fed
      val fed = Seq(("a", 0L, 1L), ("a", 0L, 2L), ("b", 0L, 10L), ("b", 0L, 11L),
        ("b", 0L, 12L), ("a", 0L, 3L), ("c", 0L, 20L), ("c", 0L, 21L), ("b", 0L, 13L))
        .toDF("cell", "sub", "id")
      val batch = graft.operators.Profile.kAnonFilter(fed, Seq("cell", "sub"), 3)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(fin === batch)
    } finally q.stop()
  }
}
