package graft

import graft.operators.Scan
import graft.sources.KVSnapshot

/** The scan dump SINK: file layout + line format of the reference's
  * `scan/scan.go:35-41,51-54` log. */
class ScanSinkSpec extends SparkTestBase {

  test("writeHexDump writes the reference line format with contiguous cnt") {
    val out = java.nio.file.Files.createTempDirectory("scan-sink-").toString
    val kv = KVSnapshot.rangeFilter(KVSnapshot.src(spark, sfSmoke),
      "li_0000000001".getBytes("UTF-8"), "li_0000000050".getBytes("UTF-8"))
    val path = Scan.writeHexDump(kv, out, "src", "2026-01-01T00.00.00Z")
    assert(path === s"$out/src_scan.log.2026-01-01T00.00.00Z")
    val lines = spark.read.textFile(path).collect()
    assert(lines.nonEmpty)
    val pat = "^key:([0-9A-F]+), value:([0-9A-F]+), cnt:(\\d+)\\.$".r
    val cnts = lines.map {
      case pat(_, _, c) => c.toLong
      case bad => fail(s"malformed line: $bad")
    }.sorted
    assert(cnts.toSeq === (1L to lines.length).toSeq)
    // cnt order must agree with key order
    val byCnt = lines.map { case pat(k, _, c) => (c.toLong, k) }.sortBy(_._1).map(_._2)
    assert(byCnt.toSeq === byCnt.sorted.toSeq)
  }
}
