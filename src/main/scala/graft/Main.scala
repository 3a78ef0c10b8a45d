package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{Checksum, TiKVCodec}
import graft.operators.{Diff, Gate, Scan}
import graft.sources.kvbin.KVBin

/** Thin CLI over the engine — the analog of the reference's six cobra
  * subcommands (`cmd/main.go:16-33`): checksum | scan | diff | format |
  * decodets | encodekey, with `--format raw|hex|escaped` key parsing
  * (`config/config.go:34,59-64`).
  *
  * KV inputs are snapshot dirs: kvbin region dirs (containing `_index`)
  * or parquet dirs with binary (key, value) columns.
  *
  * Usage:
  *   graft.Main checksum  --src <dir> --dst <dir> [--start-key K --end-key K]
  *   graft.Main diff      --src <dir> --dst <dir> [range] [--limit N]
  *   graft.Main scan      --src <dir> [--dst <dir>] --out <dir> [range]
  *   graft.Main format    --start-key K --end-key K [--format hex|raw|escaped]
  *   graft.Main decodets  --start-key K [--format ...]
  *   graft.Main encodekey --start-key K --end-key K [--format ...]
  */
object Main {

  private def parseArgs(args: Array[String]): (String, Map[String, String]) = {
    require(args.nonEmpty, "missing subcommand")
    require(args.tail.length % 2 == 0,
      s"flags must come in --name value pairs; got: ${args.tail.mkString(" ")}")
    val flags = args.tail.sliding(2, 2).map {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case Array(k, _) => sys.error(s"expected a --flag, got: $k")
    }.toMap
    (args.head, flags)
  }

  /** `--format` key parsing (reference `config/config.go:59-64`). */
  private def parseKey(flags: Map[String, String], name: String): Option[Array[Byte]] =
    flags.get(name).map { s =>
      flags.getOrElse("format", "hex") match {
        case "raw" => s.getBytes("UTF-8")
        case "hex" => KVBin.unhex(s)
        case "escaped" =>
          val b = TiKVCodec.unescapeGo(s)
          require(b != null, s"malformed escaped key: $s")
          b
        case other => sys.error(s"unknown key format: $other")
      }
    }

  private def readKV(spark: SparkSession, dir: String): DataFrame = {
    val isKvbin = new java.io.File(dir, KVBin.IndexFile).exists()
    val kv = if (isKvbin) KVBin.read(spark, dir) else spark.read.parquet(dir)
    kv.select(col("key"), col("value"))
  }

  private def ranged(kv: DataFrame, start: Option[Array[Byte]],
                     end: Option[Array[Byte]]): DataFrame = {
    val lower = start.map(s => col("key") >= lit(s)).getOrElse(lit(true))
    val upper = end.map(e => col("key") < lit(e)).getOrElse(lit(true))
    kv.filter(lower && upper)
  }

  def main(args: Array[String]): Unit = {
    val (cmd, flags) = parseArgs(args)
    val start = parseKey(flags, "start-key")
    val end = parseKey(flags, "end-key")

    // codec subcommands are pure — no session needed
    cmd match {
      case "format" =>
        start.foreach(k => println(s"Formatted Raw StartKey: ${new String(k, "UTF-8")}"))
        end.foreach(k => println(s"Formatted Raw EndKey: ${new String(k, "UTF-8")}"))
        start.foreach(k => println(s"Formatted Hex StartKey: ${KVBin.hexOf(k)}"))
        end.foreach(k => println(s"Formatted Hex EndKey: ${KVBin.hexOf(k)}"))
        return
      case "decodets" =>
        val k = start.getOrElse(sys.error("decodets requires --start-key"))
        val ts = TiKVCodec.decodeTs(k)
        require(ts != null, "key shorter than 8 bytes")
        println(s"Decoded Ts: ${java.lang.Long.toUnsignedString(ts)}")
        return
      case "encodekey" =>
        start.foreach(k => println(s"Encoded StartKey: ${KVBin.hexOf(TiKVCodec.encodeApiV2Key(k))}"))
        end.foreach(k => println(s"Encoded EndKey: ${KVBin.hexOf(TiKVCodec.encodeApiV2Key(k))}"))
        return
      case _ => ()
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // record the exit code and raise it AFTER the finally has stopped the
    // session — sys.exit inside the try would halt the JVM before the
    // finally block runs, leaking the session
    var exitCode = 0
    try {
      def src = ranged(readKV(spark, flags("src")), start, end)
      def dst = ranged(readKV(spark, flags("dst")), start, end)
      cmd match {
        case "checksum" =>
          // API-version gate first, like every reference subcommand
          val gate = Gate.check(src, dst).head()
          require(gate.getAs[Boolean]("compatible"), s"api version mismatch: $gate")
          val verdict = Checksum.verdict(src, dst).head()
          println(verdict)
          if (!verdict.getAs[Boolean]("matches")) exitCode = 2
        case "diff" =>
          val limit = flags.getOrElse("limit", "100").toInt
          val d = Diff.diff(src, dst)
          d.orderBy(col("key")).limit(limit)
            .select(upper(hex(col("key"))).as("key_hex"),
              upper(hex(col("src_value"))).as("src_hex"),
              upper(hex(col("dst_value"))).as("dst_hex"), col("diff_class"))
            .collect().foreach(println)
          val counts = Diff.diffCounts(src, dst).collect()
          println(counts.mkString("diff counts: ", ", ", ""))
          if (counts.nonEmpty) exitCode = 2
        case "scan" =>
          val out = flags.getOrElse("out", ".")
          val p1 = Scan.writeHexDump(src, out, "src")
          println(s"src scan kv is written into $p1")
          flags.get("dst").foreach { _ =>
            val p2 = Scan.writeHexDump(dst, out, "dst")
            println(s"dst scan kv is written into $p2")
          }
        case other => sys.error(s"unknown subcommand: $other")
      }
    } finally spark.stop()
    if (exitCode != 0) sys.exit(exitCode)
  }
}
