package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** A KV pair — the reference's entire data model
  * (`scan/scan.go:45`, `diff/diff.go:36,40`: parallel byte-slice arrays). */
case class KVPair(key: Array[Byte], value: Array[Byte])

/** The reference's checksum triple (`rawkv.RawChecksum`), merged with
  * XOR / sum / sum — a commutative monoid with identity (0,0,0)
  * (`checksum/checksum.go:25-29`), hence exactly partial+final
  * aggregatable by Catalyst with no ordering constraints. */
case class RawChecksum(crc64_xor: Long, total_kvs: Long, total_bytes: Long) {
  def merge(o: RawChecksum): RawChecksum =
    RawChecksum(crc64_xor ^ o.crc64_xor, total_kvs + o.total_kvs, total_bytes + o.total_bytes)
}

object RawChecksum {
  val zero: RawChecksum = RawChecksum(0L, 0L, 0L)
  def of(key: Array[Byte], value: Array[Byte]): RawChecksum =
    RawChecksum(Crc64.crc64(key, value), 1L, key.length.toLong + value.length.toLong)
}

/** Typed Aggregator form — `ds.select(ChecksumAggregator.toColumn)`.
  * The `merge` is the reference's `UpdateChecksum`
  * (`checksum/checksum.go:25-29`); Catalyst applies it across partitions
  * exactly like the reference's worker pool + mutex
  * (`checksum/checksum.go:78-95`) but without the lock. */
object ChecksumAggregator extends Aggregator[KVPair, RawChecksum, RawChecksum] {
  override def zero: RawChecksum = RawChecksum.zero
  override def reduce(b: RawChecksum, a: KVPair): RawChecksum =
    b.merge(RawChecksum.of(a.key, a.value))
  override def merge(b1: RawChecksum, b2: RawChecksum): RawChecksum = b1.merge(b2)
  override def finish(r: RawChecksum): RawChecksum = r
  override def bufferEncoder: Encoder[RawChecksum] = Encoders.product[RawChecksum]
  override def outputEncoder: Encoder[RawChecksum] = Encoders.product[RawChecksum]
}

/** DataFrame-level checksum formulations. The expression form keeps the
  * whole aggregate inside whole-stage codegen (crc64 is a codegen'd
  * Expression; xor/count/sum are built-in declarative aggregates) — this
  * is the 100 TB path: map-side partial agg reduces each partition to a
  * 3-long buffer before any shuffle. */
object Checksum {
  import Crc64Expr._

  /** One-row DataFrame `(crc64_xor, total_kvs, total_bytes)` over a KV frame.
    * Null-safe: empty input yields the monoid identity (0, 0, 0). */
  def of(kv: DataFrame): DataFrame = {
    kv.select(
        crc64Pair(col("key"), col("value")).as("__crc"),
        (length(col("key")).cast("long") + length(col("value")).cast("long")).as("__len"))
      .agg(
        coalesce(expr("bit_xor(__crc)"), lit(0L)).as("crc64_xor"),
        // count(__crc), not count(*): rows with a NULL key or value are
        // excluded from ALL THREE components, preserving the monoid /
        // partition-invariance contract on inputs containing nulls.
        count(col("__crc")).as("total_kvs"),
        coalesce(sum(col("__len")), lit(0L)).as("total_bytes"))
  }

  /** Grouped (per-bucket) checksum — the reference's per-region report
    * (`checksum/checksum.go:89-90` prints one checksum per sub-range). */
  def byBucket(kv: DataFrame, bucket: Column): DataFrame = {
    kv.select(
        bucket.as("bucket"),
        crc64Pair(col("key"), col("value")).as("__crc"),
        (length(col("key")).cast("long") + length(col("value")).cast("long")).as("__len"))
      .groupBy(col("bucket"))
      .agg(
        expr("bit_xor(__crc)").as("crc64_xor"),
        count(col("__crc")).as("total_kvs"),
        sum(col("__len")).as("total_bytes"))
  }

  /** Incremental checksum maintenance — the payoff of the XOR monoid:
    * crc64-xor is SELF-INVERSE (x ^ x = 0), so removing a pair from a
    * snapshot's digest is the same XOR that added it. Given a base
    * snapshot's checksum triple and a change delta (deleted pairs,
    * inserted pairs — an update is one of each), the new snapshot's
    * exact checksum is
    *   crc = base ^ crc(deletes) ^ crc(inserts)
    *   kvs = base − kvs(deletes) + kvs(inserts)      (bytes likewise)
    * — no rescan of the 100 TB base, just a pass over the delta. This is
    * why the reference's digest is XOR-folded rather than sequential
    * (`checksum/checksum.go:25-29`): continuous re-verification against
    * a change stream costs O(delta), not O(snapshot). */
  def applyDelta(base: DataFrame, deletes: DataFrame, inserts: DataFrame): DataFrame = {
    def agg(kv: DataFrame, p: String) = of(kv).select(
      col("crc64_xor").as(s"${p}_crc"), col("total_kvs").as(s"${p}_kvs"),
      col("total_bytes").as(s"${p}_bytes"))
    base.select(col("crc64_xor").as("base_crc"), col("total_kvs").as("base_kvs"),
        col("total_bytes").as("base_bytes"))
      .crossJoin(agg(deletes, "del"))
      .crossJoin(agg(inserts, "ins"))
      .select(
        (col("base_crc").bitwiseXOR(col("del_crc")).bitwiseXOR(col("ins_crc"))).as("crc64_xor"),
        (col("base_kvs") - col("del_kvs") + col("ins_kvs")).as("total_kvs"),
        (col("base_bytes") - col("del_bytes") + col("ins_bytes")).as("total_bytes"))
  }

  /** [[verdict]] with the two cluster scans submitted as two CONCURRENT
    * Spark jobs from the driver — the reference's explicit src/dst
    * errgroup concurrency (`checksum/checksum.go:140-169`,
    * `scan/scan.go:87-108`). The single-plan [[verdict]] already
    * evaluates both branches inside one job; this form exists for the
    * case where the two sources have very different latencies (e.g. two
    * remote clusters) and should overlap wall-clock. Results are
    * identical (the aggregate is deterministic per side). */
  def verdictConcurrent(src: DataFrame, dst: DataFrame,
                        timeout: scala.concurrent.duration.Duration =
                          scala.concurrent.duration.Duration.Inf): DataFrame =
    verdictConcurrentFromTriples(of(src), of(dst), timeout)

  /** [[verdictConcurrent]] over ALREADY-AGGREGATED one-row checksum
    * triple frames — the shape the pushed (server-side) checksum path
    * produces ([[graft.sources.kvbin.KVBinChecksum.pushed]]): each
    * side's triple job runs concurrently, mirroring the reference's
    * src/dst errgroup (`checksum/checksum.go:140-169`) where each
    * cluster's per-region RPC fan-out overlaps the other's. */
  def verdictConcurrentFromTriples(srcTriple: DataFrame, dstTriple: DataFrame,
                        timeout: scala.concurrent.duration.Duration =
                          scala.concurrent.duration.Duration.Inf): DataFrame = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val spark = srcTriple.sparkSession
    // per-call unique group ids: two overlapping verdictConcurrent calls
    // must not cancel each other's jobs
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val (srcGroup, dstGroup) = (s"graft-src-$tag", s"graft-dst-$tag")
    def triple(t: DataFrame, group: String) = Future {
      spark.sparkContext.setJobGroup(group, s"checksum $group", interruptOnCancel = true)
      try t.head() finally spark.sparkContext.clearJobGroup()
    }
    val (s, d) = (triple(srcTriple, srcGroup), triple(dstTriple, dstGroup))
    // first failure cancels the sibling's jobs instead of letting them
    // run (and hold executors) untracked behind the caller's exception
    s.failed.foreach(_ => spark.sparkContext.cancelJobGroup(dstGroup))
    d.failed.foreach(_ => spark.sparkContext.cancelJobGroup(srcGroup))
    val Seq(sr, dr) =
      try Await.result(Future.sequence(Seq(s, d)), timeout)
      catch {
        case e: java.util.concurrent.TimeoutException =>
          // a hung source must not block the caller forever: reap both
          // sides' jobs before surfacing the timeout
          spark.sparkContext.cancelJobGroup(srcGroup)
          spark.sparkContext.cancelJobGroup(dstGroup)
          throw e
      }
    import spark.implicits._
    Seq((sr.getLong(0), sr.getLong(1), sr.getLong(2),
         dr.getLong(0), dr.getLong(1), dr.getLong(2)))
      .toDF("src_crc64_xor", "src_total_kvs", "src_total_bytes",
        "dst_crc64_xor", "dst_total_kvs", "dst_total_bytes")
      .withColumn("matches",
        col("src_crc64_xor") === col("dst_crc64_xor") &&
        col("src_total_kvs") === col("dst_total_kvs") &&
        col("src_total_bytes") === col("dst_total_bytes"))
  }

  /** The reference's flagship verdict (`checksum/checksum.go:173-178`):
    * compare src and dst checksum triples, one row with both + match flag. */
  def verdict(src: DataFrame, dst: DataFrame): DataFrame =
    verdictFromTriples(of(src), of(dst))

  /** [[verdict]] given each side's one-row `(crc64_xor, total_kvs,
    * total_bytes)` triple frame (e.g. pushed server-side checksums). */
  def verdictFromTriples(srcTriple: DataFrame, dstTriple: DataFrame): DataFrame = {
    val s = srcTriple.select(
      col("crc64_xor").as("src_crc64_xor"),
      col("total_kvs").as("src_total_kvs"),
      col("total_bytes").as("src_total_bytes"))
    val d = dstTriple.select(
      col("crc64_xor").as("dst_crc64_xor"),
      col("total_kvs").as("dst_total_kvs"),
      col("total_bytes").as("dst_total_bytes"))
    s.crossJoin(d).withColumn("matches",
      col("src_crc64_xor") === col("dst_crc64_xor") &&
      col("src_total_kvs") === col("dst_total_kvs") &&
      col("src_total_bytes") === col("dst_total_bytes"))
  }
}
