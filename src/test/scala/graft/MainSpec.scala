package graft

/** CLI surface: the session-free codec subcommands (format / decodets /
  * encodekey — reference `codec/codec.go:14-54`) and argument-parsing
  * validation. The session-backed subcommands (checksum/scan/diff) are
  * covered through the operator specs they delegate to. */
class MainSpec extends SparkTestBase {

  private def captureOut(f: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(f)
    bos.toString("UTF-8")
  }

  test("format prints raw and uppercase-hex renderings of both keys") {
    val out = captureOut(Main.main(Array(
      "format", "--start-key", "6162", "--end-key", "6163")))
    assert(out.contains("Formatted Raw StartKey: ab"))
    assert(out.contains("Formatted Raw EndKey: ac"))
    assert(out.contains("Formatted Hex StartKey: 6162"))
    assert(out.contains("Formatted Hex EndKey: 6163"))
  }

  test("format honors --format raw") {
    val out = captureOut(Main.main(Array(
      "format", "--start-key", "ab", "--format", "raw")))
    assert(out.contains("Formatted Hex StartKey: 6162"))
  }

  test("decodets prints the complemented big-endian uint64") {
    // key = 0xFFFFFFFFFFFFFFFF → ~ts = 0
    val out = captureOut(Main.main(Array(
      "decodets", "--start-key", "FFFFFFFFFFFFFFFF")))
    assert(out.contains("Decoded Ts: 0"))
    // key = ~1 = 0xFFFFFFFFFFFFFFFE → ts = 1
    val out2 = captureOut(Main.main(Array(
      "decodets", "--start-key", "FFFFFFFFFFFFFFFE")))
    assert(out2.contains("Decoded Ts: 1"))
  }

  test("encodekey prints the APIv2 memcomparable encoding") {
    // "ab" → prefix r\0\0\0 + ab = 6 bytes → one 9-byte group, pad 2,
    // marker 0xF7+6 = 0xFD
    val out = captureOut(Main.main(Array("encodekey", "--start-key", "6162")))
    assert(out.contains("Encoded StartKey: 7200000061620000FD"))
  }

  test("parseArgs rejects a trailing unpaired flag instead of dropping it") {
    intercept[IllegalArgumentException] {
      Main.main(Array("format", "--start-key"))
    }
  }

  test("parseArgs rejects a non-flag token where a flag is expected") {
    intercept[RuntimeException] {
      Main.main(Array("format", "startkey", "6162"))
    }
  }
}
