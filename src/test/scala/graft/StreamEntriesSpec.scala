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
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val scale = StreamEntries.sliceScale

  test("replica apply is idempotent: a replayed batch is a no-op, marker and rows ride one commit") {
    // foreachBatch is at-least-once — a crash between the kvbin commit
    // and Spark's commit log replays the batch. The replica's
    // meta.replica_batch stamp (same atomic index swap as the rows)
    // makes every replay a no-op, for batch 0 and any later batch alike.
    val dst = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-ridem-")
    val conf = spark.sessionState.newHadoopConf()
    def kv(rows: (String, String)*) = rows.toSeq.toDF("key", "value")
      .select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"))
    def count() = spark.read
      .format(classOf[graft.sources.kvbin.KVBinSource].getName)
      .option("path", dst).load().count()
    def meta(k: String) =
      graft.sources.kvbin.KVBin.readMeta(dst, conf).get(k)
    StreamEntries.applyReplicaBatch(dst, kv("a" -> "1", "b" -> "2"), 0L)
    StreamEntries.applyReplicaBatch(dst, kv("c" -> "3"), 1L)
    assert(count() === 3L && meta("replica_batch") === Some("1"))
    val gen = meta("generation")
    // the retry: within one lineage Spark replays only the LATEST
    // uncommitted batch — it must change NOTHING
    StreamEntries.applyReplicaBatch(dst, kv("c" -> "3"), 1L)
    assert(count() === 3L, "a replayed batch appended a duplicate generation")
    assert(meta("generation") === gen && meta("replica_batch") === Some("1"))
    // and the stream continues past the replay
    StreamEntries.applyReplicaBatch(dst, kv("d" -> "4"), 2L)
    assert(count() === 4L && meta("replica_batch") === Some("2"))
    // a FRESH checkpoint lineage (the watchdogs' standard remedy)
    // restarts numbering at 0: batch 0 must RESYNC the replica to the
    // new stream's base snapshot, never skip as a phantom replay
    StreamEntries.applyReplicaBatch(dst, kv("x" -> "9"), 0L)
    assert(count() === 1L && meta("replica_batch") === Some("0"),
      "fresh-lineage batch 0 must overwrite-resync the replica")
    StreamEntries.applyReplicaBatch(dst, kv("y" -> "8"), 1L)
    assert(count() === 2L && meta("replica_batch") === Some("1"))
  }

  test("WIRE replica apply is idempotent through PUT/COMMIT: replays no-op, marker rides the store's one swap") {
    // the r13 endpoints-only sink must honor the identical at-least-once
    // contract as the filesystem sink — here the marker probe is a POLL
    // and the apply is PUT frames + one framed COMMIT, with NO path
    val dst = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-rwire-")
    val conf = spark.sessionState.newHadoopConf()
    val srv = new graft.sources.kvbin.KVBinServer(dst, conf)
    try {
      val addr = srv.address
      def kv(rows: (String, String)*) = rows.toSeq.toDF("key", "value")
        .select(col("key").cast("binary").as("key"),
          col("value").cast("binary").as("value"))
      def count() = spark.read
        .format(classOf[graft.sources.kvbin.KVBinSource].getName)
        .option("endpoints", addr).load().count()
      def meta(k: String) =
        new graft.sources.kvbin.SocketRegionClient(addr).pollMeta().get(k)
      StreamEntries.applyReplicaBatchWire(addr, kv("a" -> "1", "b" -> "2"), 0L)
      StreamEntries.applyReplicaBatchWire(addr, kv("c" -> "3"), 1L)
      assert(count() === 3L && meta("replica_batch") === Some("1"))
      val gen = meta("generation")
      val commitsBefore = srv.commitRequests.get()
      // the retry: nothing changes, and NOT EVEN a COMMIT crosses the
      // wire — the POLL probe short-circuits the whole apply
      StreamEntries.applyReplicaBatchWire(addr, kv("c" -> "3"), 1L)
      assert(count() === 3L, "a replayed batch appended a duplicate generation")
      assert(meta("generation") === gen && meta("replica_batch") === Some("1"))
      assert(srv.commitRequests.get() === commitsBefore,
        "a replayed batch must not even reach COMMIT")
      StreamEntries.applyReplicaBatchWire(addr, kv("d" -> "4"), 2L)
      assert(count() === 4L && meta("replica_batch") === Some("2"))
      // fresh-lineage batch 0 resyncs over the wire too
      StreamEntries.applyReplicaBatchWire(addr, kv("x" -> "9"), 0L)
      assert(count() === 1L && meta("replica_batch") === Some("0"))
    } finally srv.close()
  }

  test("stateful entries are provider-invariant: RocksDB state store == default") {
    // the larger-than-heap state provider a production deployment runs:
    // the same entries must produce byte-identical sinks whether state
    // lives in the HDFS-backed in-memory maps (default) or RocksDB.
    // Representative heavies across the state shapes: stream-stream
    // join state (inner + left-outer), flatMapGroupsWithState buffers
    // (k-anon), dropDuplicates key state, and aggregation counters
    // (histogram sketch)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val entries = Seq("q_stream_ijoin", "q_stream_left_ijoin",
      "q_stream_k_anon", "q_stream_dedup", "q_stream_hist_quantile",
      // second session's flatMapGroupsWithState shapes: per-bucket min
      // (LSH filter), per-fingerprint boolean (funnel), per-key open
      // run (SCD2)
      "q_stream_lsh_filter", "q_stream_funnel", "q_stream_scd2",
      // round 10's complete-mode monoid folds: the 49-cell Gram, the
      // per-(group, bucket) register max, the per-phrase counters
      "q_stream_pca", "q_stream_hll_overlap", "q_stream_blocklist",
      // round 11's kvbin SOURCE tail: stateless passthrough — the row
      // pins that the source's offset bookkeeping (which batches exist
      // and what they contain) is state-store-provider-independent —
      // and the live verdict, whose per-bucket digest triples fold in
      // the state store across the append's micro-batch
      "q_stream_kvbin_scan", "q_stream_kvbin_verdict")
    def runAll() = entries.map(q =>
      q -> SparkEntry.queries(q)(spark, dir).collect().toSeq)
    val prev = spark.conf.getOption(key)
    val underRocks =
      try { spark.conf.set(key, rocks); runAll() }
      finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    val underDefault = runAll()
    for (((q, r), (_, d)) <- underRocks.zip(underDefault)) {
      assert(r.nonEmpty, s"$q produced no rows under RocksDB")
      assert(r === d, s"$q differs between RocksDB and default state store")
    }
  }

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

  test("q_stream_kvbin_sink read-back is checksum-equal to batch applyChangelog") {
    import org.apache.spark.sql.DataFrame
    def kv(df: DataFrame) = df
      .filter(col("k") >= "li_0000000001" && col("k") < StreamEntries.keyUpper)
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
    val src = kv(KVSnapshot.srcStr(spark, dir))
    val dst = kv(KVSnapshot.dstStr(spark, dir))
    val batch = Diff.applyChangelog(src, Diff.diffAsChangelog(Diff.diff(src, dst)))
    val streamed = StreamEntries.streamKvbinSink(spark, dir)
      .select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"))
    val a = Checksum.of(streamed).collect().head
    val b = Checksum.of(batch).collect().head
    assert(a === b, s"streamed kvbin generation $a != batch applyChangelog $b")
    assert(a.getLong(1) > 0)
  }

  test("q_stream_kvbin_scan drains to the batch scan; the append is its OWN batch, nothing re-read") {
    val streamed = StreamEntries.streamKvbinScan(spark, dir)
    val batch = KVSnapshot.srcStr(spark, dir)
      .select(col("k").as("key"), col("v").as("value"))
      .filter(col("key") >= "li_0000000001" && col("key") < StreamEntries.keyUpper)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "drained kvbin tail != batch scan of the final table")
    // the offset contract's observable: exactly two non-empty batches
    // (base generation, then the appended regions), whose input rows
    // partition the slice — the append batch re-reads NOTHING
    val tape = StreamEntries.lastKvbinScanBatches
    assert(tape.size === 2, s"expected base + append micro-batches, got $tape")
    assert(tape(0)._1 < tape(1)._1)
    assert(tape.map(_._2).sum === batch.count(),
      s"batches must cover the slice exactly once: $tape")
    val mid = f"li_${1000L * StreamEntries.sliceScale}%010d"
    assert(tape(1)._2 === batch.filter(col("key") >= mid).count(),
      s"append batch must carry exactly the second wave's rows: $tape")
  }

  test("q_stream_kvbin_verdict equals the batch per-bucket verdict on the same slices") {
    import org.apache.spark.sql.DataFrame
    def slice(df: DataFrame) = df
      .filter(col("k") >= "li_0000000001" && col("k") < StreamEntries.keyUpper)
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
    val bucketOf = substring(col("key").cast("string"), 1, 10)
    def b(df: DataFrame, p: String) =
      Checksum.byBucket(slice(df), bucketOf).select(col("bucket"),
        col("crc64_xor").as(s"${p}_crc64_xor"),
        col("total_kvs").as(s"${p}_total_kvs"),
        col("total_bytes").as(s"${p}_total_bytes"))
    val batch = b(KVSnapshot.srcStr(spark, dir), "src")
      .join(b(KVSnapshot.dstStr(spark, dir), "dst"), Seq("bucket"), "full_outer")
      .select(col("*"),
        coalesce(col("src_crc64_xor") === col("dst_crc64_xor") &&
          col("src_total_kvs") === col("dst_total_kvs") &&
          col("src_total_bytes") === col("dst_total_bytes"),
          lit(false)).as("matches"))
    val streamed = StreamEntries.streamKvbinVerdict(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "live kvbin verdict != batch per-bucket verdict")
  }

  test("q_stream_kvbin_replicate: the replica is checksum-identical to the source slice") {
    val replica = StreamEntries.streamKvbinReplicate(spark, dir)
      .select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"))
    val source = KVSnapshot.srcStr(spark, dir)
      .filter(col("k") >= "li_0000000001" && col("k") < StreamEntries.keyUpper)
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
    val a = Checksum.of(replica).collect().head
    val b = Checksum.of(source).collect().head
    assert(a === b, s"replica digest $a != source digest $b")
    assert(a.getLong(1) > 0)
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

  test("q_stream_lsh_filter equals the batch banding rule, with cross-batch hits") {
    val streamed = StreamEntries.streamLshFilter(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(streamed.nonEmpty)
    // rep is always an earlier (smaller-id) doc
    assert(streamed.forall { case (d, r) => r < d })
    // batch rule recomputed in Spark: smallest smaller-id doc sharing
    // any (band, key) bucket of the same md5 signatures
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sig = graft.operators.Dedup.minhashSignatureMd5(d, "text", "doc_id", 3, 32)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until 16).map(b =>
        concat_ws("_", col(s"m${2 * b}"), col(s"m${2 * b + 1}"))): _*)))
      .toDF("doc_id", "band_id", "bk")
    val batch = banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bk") === col("b.bk") &&
          col("b.doc_id") < col("a.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(min(col("b.doc_id")).as("rep"))
      .as[(Long, Long)].collect().toSeq
    assert(streamed.sorted === batch.sorted)
    // the state genuinely crosses the micro-batch boundary: at least
    // one doc fed in batch 2 (id > mid) is flagged against a batch-1 rep
    val mid = d.agg(max(col("doc_id"))).as[Long].head() / 2
    assert(streamed.exists { case (dd, r) => dd > mid && r <= mid },
      s"no cross-batch hit in ${streamed.size} rows")
  }

  test("q_stream_scd2 equals batch scd2's closed intervals; a run crosses the boundary") {
    val streamed = StreamEntries.streamScd2(spark, dir)
    val batch = Events.scd2(
        Events.read(spark, dir).filter(col("user_id") < lit(50L * scale)),
        "user_id", "event_type", "ts_us", "event_id")
      .filter(col("valid_to_us").isNotNull)
      .select("user_id", "value", "valid_from_us", "valid_to_us", "change_id")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // at least one interval opened in batch 1 was CLOSED by a batch-2
    // event — the open-run state genuinely crossed the boundary
    val ev = Events.read(spark, dir).filter(col("user_id") < lit(50L * scale))
      .agg(min(col("ts_us")), max(col("ts_us"))).as[(Long, Long)].head()
    val tmid = ev._1 + (ev._2 - ev._1) / 2
    assert(streamed.filter(col("valid_from_us") <= tmid &&
      col("valid_to_us") > tmid).count() > 0)
  }

  test("q_stream_funnel equals the batch funnel; dedup state crosses the batch boundary") {
    val streamed = StreamEntries.streamFunnel(spark, dir)
      .select("stage", "gate", "n_kept", "n_cut", "kept_ppm")
    val batch = graft.operators.TextAnalysis.curationFunnel(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
      .select("stage", "gate", "n_kept", "n_cut", "kept_ppm")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the smallest fixture has no exact duplicates, so the dedup state
    // there is trivially all-keepers — prove the cross-batch path on a
    // planted corpus instead: ids 1 and 9 are the SAME text, and the
    // operator splits the id range at the dup group's keeper (1), so
    // the keeper arrives in batch 1 and its duplicate in batch 2; the
    // streamed funnel must still cut it at the exact_dedup stage
    val planted = graft.sources.FixtureStore
      .tempDirDeletedAtExit("graft-fnl-spec-").toString
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    (Seq((1L, body), (9L, body)) ++
      (2L to 8L).map(i => (i, s"$body extra$i")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$planted/documents.parquet")
    val got = StreamEntries.streamFunnel(spark, planted)
      .select("gate", "n_kept", "n_cut")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("total") === ((9L, 0L)))
    // all 9 pass the stateless gates; the duplicate (id 9, batch 2) is
    // cut ONLY by the stateful dedup stage whose keeper saw batch 1
    assert(got("exact_dedup") === ((8L, 1L)), got.toString)
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

  test("q_stream_ijoin equals the batch interval join on the same slice") {
    val streamed = StreamEntries.streamIntervalJoin(spark, dir)
    val e = Events.read(spark, dir)
      .filter(col("user_id") < lit(20L * scale))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("view_ts_us"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts_us").as("click_ts_us"))
    val batch = v.join(c, col("user_id") === col("cu") &&
        col("click_ts_us") >= col("view_ts_us") &&
        col("click_ts_us") <= col("view_ts_us") + lit(6L * 3600L * 1000000L))
      .select(col("user_id"), col("view_ts_us"), col("click_ts_us"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream interval join state is EVICTED once the watermark passes") {
    // tiny two-batch feed on a dedicated query so the progress metrics
    // are observable: batch 1 loads view+click state, batch 2's ticks
    // advance both watermarks a day past the data — the interval bound
    // (6 h) plus the 1-minute delay makes every batch-1 row expired, and
    // the join's state cleanup must REMOVE rows, not hold them forever
    // (the unbounded-state trap of an unconstrained stream-stream join)
    import spark.implicits._
    import java.sql.Timestamp
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vMem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp)]
    val cMem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp)]
    val v = vMem.toDF.toDF("v_user", "v_ts").withWatermark("v_ts", "1 minute")
    val c = cMem.toDF.toDF("c_user", "c_ts").withWatermark("c_ts", "1 minute")
    val joined = v.join(c,
      col("v_user") === col("c_user") && col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 6 HOURS"))
    val q = joined.writeStream.format("memory")
      .queryName("graft_ijoin_evict").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      vMem.addData(Seq((1L, t0), (2L, t0)))
      cMem.addData(Seq((1L, new Timestamp(t0.getTime + 60000L))))
      q.processAllAvailable()
      val day = 86400000L
      vMem.addData(Seq((-1L, new Timestamp(t0.getTime + day))))
      cMem.addData(Seq((-1L, new Timestamp(t0.getTime + day))))
      q.processAllAvailable()
      // one more batch so the cleanup driven by the advanced watermark
      // lands in an observed progress entry
      vMem.addData(Seq((-2L, new Timestamp(t0.getTime + 2 * day))))
      cMem.addData(Seq((-2L, new Timestamp(t0.getTime + 2 * day))))
      q.processAllAvailable()
      val removed = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "watermark-driven join state eviction never ran")
    } finally {
      q.stop()
      spark.catalog.dropTempView("graft_ijoin_evict")
    }
  }

  test("left-outer interval join: null rows appear ONLY in the post-horizon batch") {
    // a view with no click must NOT emit while a matching click could
    // still arrive (watermark below v_ts + 6 h + delay) — early emission
    // would contradict a late click and append mode cannot retract — and
    // MUST emit with nulls once the ticks push the watermark past the
    // horizon (never emitting would lose the attribution report's rows)
    import spark.implicits._
    import java.sql.Timestamp
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vMem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp)]
    val cMem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp)]
    val v = vMem.toDF.toDF("v_user", "v_ts").withWatermark("v_ts", "1 minute")
    val c = cMem.toDF.toDF("c_user", "c_ts").withWatermark("c_ts", "1 minute")
    val joined = v.join(c,
      col("v_user") === col("c_user") && col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 6 HOURS"),
      "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("graft_loijoin_timing").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      // user 1: view, never clicks; user 2: view + click (matched pair)
      vMem.addData(Seq((1L, t0), (2L, t0)))
      cMem.addData(Seq((2L, new Timestamp(t0.getTime + 60000L))))
      q.processAllAvailable()
      val after1 = spark.table("graft_loijoin_timing")
        .select(col("v_user"), col("c_user")).collect()
      assert(!after1.exists(_.isNullAt(1)),
        s"null row emitted BEFORE the horizon passed: ${after1.toSeq}")
      assert(after1.map(_.getLong(0)).toSet === Set(2L))
      // ticks a day out: watermark (effective next batch) passes every
      // horizon; the unmatched view must flush with nulls now
      val day = 86400000L
      vMem.addData(Seq((-1L, new Timestamp(t0.getTime + day))))
      cMem.addData(Seq((-1L, new Timestamp(t0.getTime + day))))
      q.processAllAvailable()
      vMem.addData(Seq((-2L, new Timestamp(t0.getTime + 2 * day))))
      cMem.addData(Seq((-2L, new Timestamp(t0.getTime + 2 * day))))
      q.processAllAvailable()
      val nulls = spark.table("graft_loijoin_timing")
        .filter(col("v_user") === 1L)
        .select(col("v_user"), col("c_user")).collect()
      assert(nulls.length === 1 && nulls.head.isNullAt(1),
        s"unmatched view did not flush with nulls post-horizon: ${nulls.toSeq}")
    } finally {
      q.stop()
      spark.catalog.dropTempView("graft_loijoin_timing")
    }
  }

  test("q_stream_decay equals the batch decayed counts (scores summed across batches)") {
    val streamed = StreamEntries.streamDecay(spark, dir)
    val batch = Events.decayedCounts(Events.read(spark, dir), "event_type")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_survival equals the batch KM curve on the slice (spans extend across batches)") {
    val streamed = StreamEntries.streamSurvival(spark, dir)
    val batch = Events.kmSurvival(
      Events.read(spark, dir).filter(col("user_id") < lit(100L * scale)),
      col("value") > 150.0)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_trend equals the batch OLS trend on the slice (sums fold across batches)") {
    val streamed = StreamEntries.streamTrend(spark, dir)
    val batch = Events.linearTrend(
      Events.read(spark, dir).filter(col("user_id") < lit(100L * scale)),
      "event_type", "value", 1704067200L)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_pca equals the batch eigen-solve (Gram sums fold across batches)") {
    val streamed = StreamEntries.streamPca(spark, dir)
    val batch = graft.operators.Pca.components(
      graft.operators.Pca.docFeatures(spark.read.parquet(s"$dir/documents.parquet")))
    assert(streamed.count() === 12)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_blocklist equals the batch per-phrase report (counters fold across batches)") {
    val streamed = StreamEntries.streamBlocklist(spark, dir)
    val batch = graft.operators.TextAnalysis.blocklistPhraseStats(
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < lit(5000L * scale)),
      "text", "doc_id", SparkEntry.blocklistPhrases)
    assert(streamed.count() === SparkEntry.blocklistPhrases.size.toLong)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_hll_overlap equals the batch pair overlap (same registers, same estimate)") {
    val streamed = StreamEntries.streamHllOverlap(spark, dir)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"),
        explode(graft.operators.Dedup.shingles(col("text"), 3)).as("t"))
    val batch = graft.operators.Sketches.hllOverlap(toks, col("lang"), col("t"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_hll registers max-merge across batches to the batch estimate") {
    val streamed = StreamEntries.streamHll(spark, dir)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"),
        explode(graft.operators.Dedup.shingles(col("text"), 3)).as("t"))
    val est = graft.operators.Sketches.hllNdvBy(toks, col("lang"), col("t"))
    val exact = toks.groupBy(col("lang").as("g2"))
      .agg(count_distinct(col("t")).as("exact_ndv"))
    val batch = est.join(exact, col("g") === col("g2"))
      .select(col("g").as("lang"), col("n_buckets_used"), col("sum_rho"),
        col("est_ndv"), col("exact_ndv"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("file sink: manifest-committed read-back equals batch; an orphan file is invisible") {
    import graft.streaming.StreamEntries
    val first = StreamEntries.streamFileSink(spark, sfSmoke).collect().toSeq
    val batch = graft.operators.Events.read(spark, sfSmoke)
      .filter(col("user_id") < 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
      .orderBy(col("event_type")).collect().toSeq
    assert(first === batch)
    // exactly-once at the file level: drop an ORPHAN parquet file (a
    // simulated failed-task leftover) into a fresh sink dir — the
    // _spark_metadata manifest must keep it invisible to readers
    val out = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-fsink-orphan-")
    spark.range(5).toDF("event_id")
      .withColumn("event_type", lit("ORPHAN")).withColumn("value", lit(1.0))
      .write.mode("overwrite").parquet(s"$out/orphan_stage")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double)]
    val ck = graft.sources.FixtureStore.tempDirDeletedAtExit("graft-fsink-ck-")
    val q = mem.toDF.toDF("event_id", "event_type", "value")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    try { mem.addData((1L, "a", 2.0)); q.processAllAvailable() } finally q.stop()
    // copy the orphan INTO the sink dir beside the committed files
    val stage = new java.io.File(s"$out/orphan_stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(stage.toPath,
      java.nio.file.Paths.get(out, "part-99999-orphan.snappy.parquet"))
    val seen = spark.read.parquet(out).select("event_type")
      .as[String].collect().toSeq
    assert(seen === Seq("a"), s"orphan leaked into the read: $seen")
  }
}
