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

  test("api_version option gates a mismatched source at planning time") {
    val data = Seq(("k1".getBytes("UTF-8"), "v1".getBytes("UTF-8"))).toDF("key", "value")
    val dir = java.nio.file.Files.createTempDirectory("kvbin-gate-").toString
    KVBin.write(data, dir, 1, apiVersion = "V1")
    // matching (and absent) expectation reads fine
    assert(spark.read.format(classOf[graft.sources.kvbin.KVBinSource].getName)
      .option("path", dir).option("api_version", "V1").load().count() === 1)
    assert(KVBin.read(spark, dir).count() === 1)
    // mismatched expectation fails fast, before any region file is read
    val e = intercept[Exception] {
      spark.read.format(classOf[graft.sources.kvbin.KVBinSource].getName)
        .option("path", dir).option("api_version", "V2").load().count()
    }
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(rootChain(e).exists(m => m != null && m.contains("api version mismatch")))
  }

  test("index meta: stamped version read back; pre-stamp indexes default to V1") {
    val conf = spark.sessionState.newHadoopConf()
    val data = Seq(("k".getBytes("UTF-8"), "v".getBytes("UTF-8"))).toDF("key", "value")
    val dir = java.nio.file.Files.createTempDirectory("kvbin-meta-").toString
    KVBin.write(data, dir, 1, apiVersion = "V2")
    assert(KVBin.readMeta(dir, conf)("api_version") === "V2")
    // strip the header line → legacy index → defaults to V1, still
    // readable (rewrite through the Hadoop FS so its .crc sidecar stays
    // consistent)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir), conf)
    val idx = new org.apache.hadoop.fs.Path(dir, KVBin.IndexFile)
    val legacy = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(idx), "UTF-8"))
      try Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filterNot(_.startsWith("#")).mkString("\n")
      finally in.close()
    }
    val out = fs.create(idx, true)
    out.write(legacy.getBytes("UTF-8"))
    out.close()
    assert(KVBin.readMeta(dir, conf)("api_version") === "V1")
    assert(KVBin.read(spark, dir).count() === 1)
  }

  test("partition reader honors the pruned schema's field order") {
    import graft.sources.kvbin.{KVBinInputPartition, KVBinPartitionReader}
    val data = Seq(("kk".getBytes("UTF-8"), "vvv".getBytes("UTF-8"))).toDF("key", "value")
    val dir = java.nio.file.Files.createTempDirectory("kvbin-order-").toString
    KVBin.write(data, dir, 1)
    val file = KVBin.readIndex(dir, spark.sessionState.newHadoopConf()).head._1
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    def readWith(cols: Array[String]): Seq[Seq[String]] = {
      val r = new KVBinPartitionReader(
        KVBinInputPartition(dir, file, null, null, null, cols, sconf))
      val rows = Iterator.continually(r)
        .takeWhile(_.next())
        .map(x => cols.indices.map(i =>
          new String(x.get().getBinary(i), "UTF-8")).toSeq)
        .toList
      r.close(); rows
    }
    assert(readWith(Array("key", "value")) === Seq(Seq("kk", "vvv")))
    assert(readWith(Array("value", "key")) === Seq(Seq("vvv", "kk")))
    assert(readWith(Array("value")) === Seq(Seq("vvv")))
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
