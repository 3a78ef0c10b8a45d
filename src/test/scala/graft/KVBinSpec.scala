package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.functions.Checksum
import graft.sources.KVSnapshot
import graft.sources.kvbin.KVBin

/** DSv2 kvbin connector: content parity with the parquet snapshot,
  * range-filter pushdown, and region-file pruning at planning time. */
class KVBinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val parquetSrc = KVSnapshot.src(spark, sfSmoke)
  private lazy val binSrc = KVSnapshot.srcBin(spark, sfSmoke)

  test("kvbin DSv2 content equals the parquet snapshot (checksum identity)") {
    val a = Checksum.of(parquetSrc).as[(Long, Long, Long)].head()
    val b = Checksum.of(binSrc).as[(Long, Long, Long)].head()
    assert(a === b)
    assert(a._2 > 0)
  }

  test("range filter prunes region files at planning time") {
    def partitions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case b: BatchScanExec => b.inputPartitions.size
      }.sum
    val full = partitions(binSrc)
    val narrow = partitions(KVSnapshot.rangeFilter(binSrc,
      "li_0000000100".getBytes("UTF-8"), "li_0000000140".getBytes("UTF-8")))
    assert(full > 1, s"expected multiple region files, got $full")
    assert(narrow < full, s"narrow range should prune: narrow=$narrow full=$full")
  }

  test("pushed range filter returns exactly the [start,end) rows") {
    val lo = "li_0000000100".getBytes("UTF-8")
    val hi = "li_0000000300".getBytes("UTF-8")
    val viaBin = KVSnapshot.rangeFilter(binSrc, lo, hi)
      .select(col("key").cast("string")).as[String].collect().sorted.toSeq
    val viaParquet = KVSnapshot.rangeFilter(parquetSrc, lo, hi)
      .select(col("key").cast("string")).as[String].collect().sorted.toSeq
    assert(viaBin === viaParquet)
    assert(viaBin.nonEmpty)
    assert(viaBin.forall(k => k >= "li_0000000100" && k < "li_0000000300"))
  }

  test("strict greater-than pushes the resume-key semantics (k > v ⇒ start at v‖0x00)") {
    val someKey = binSrc.orderBy(col("key")).limit(1)
      .select(col("key")).as[Array[Byte]].head()
    val strict = binSrc.filter(col("key") > lit(someKey)).count()
    val all = binSrc.count()
    assert(strict === all - 1)
  }

  test("column pruning reaches the kvbin scan (key-only projection)") {
    val keyOnly = binSrc.select("key")
    val scans = keyOnly.queryExecution.executedPlan.collectLeaves().collect {
      case b: BatchScanExec => b.output.map(_.name)
    }
    assert(scans.nonEmpty && scans.head === Seq("key"))
    assert(keyOnly.count() === binSrc.count())
  }

  test("kvbin roundtrip preserves arbitrary binary payloads") {
    val data = Seq(
      (Array[Byte](0, 1, 2), Array[Byte](-1, -2)),
      (Array[Byte](0xFF.toByte), Array.emptyByteArray),
      ("plain".getBytes("UTF-8"), "value".getBytes("UTF-8")))
    val df = data.toDF("key", "value")
    val dir = java.nio.file.Files.createTempDirectory("kvbin-test-").toString
    KVBin.write(df, dir, 2)
    val back = KVBin.read(spark, dir)
      .collect().map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(back === data.map(t => (t._1.toSeq, t._2.toSeq)).toSet)
  }
}
