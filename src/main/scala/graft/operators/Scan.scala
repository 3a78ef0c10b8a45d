package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** The reference's `scan` subcommand (`scan/scan.go:22-65`): ordered dump
  * of a key range as `key:<HEX>, value:<HEX>, cnt:<n>` with a running
  * counter. Re-expressed as an ordered projection; the pagination loop
  * (`scan/scan.go:59` resume at lastKey‖0x00) disappears — Spark's
  * range-partitioned sort replaces it. */
object Scan {

  /** Ordered uppercase-hex projection (the reference's dump format,
    * `scan/scan.go:51-54`, minus the counter). Fully codegen'd. */
  def hexDump(kv: DataFrame): DataFrame =
    kv.orderBy(col("key"))
      .select(upper(hex(col("key"))).as("key_hex"), upper(hex(col("value"))).as("value_hex"))

  /** Hex dump with the running `cnt` (`scan/scan.go:43,50`).
    *
    * Scale note: a `row_number().over(Window.orderBy(...))` would funnel
    * 100 TB through ONE task. Instead: range-partitioned total sort, then
    * `RDD.zipWithIndex` — which computes per-partition counts in one
    * lightweight pass and assigns contiguous offsets per partition, fully
    * parallel (the Spark-native equivalent of the reference's per-batch
    * counter carried across pages). */
  def hexDumpWithCnt(kv: DataFrame): DataFrame = {
    val spark = kv.sparkSession
    val dump = hexDump(kv)
    val outSchema = StructType(dump.schema.fields :+ StructField("cnt", LongType, nullable = false))
    val indexed = dump.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    // sortWithinPartitions makes the ORDER-BY-cnt contract structural
    // (zipWithIndex already yields ascending cnt across the range-sorted
    // partitions; this pins it against future plan/AQE changes without
    // adding a global shuffle).
    spark.createDataFrame(indexed, outSchema).sortWithinPartitions(col("cnt"))
  }

  /** Ordered limit — first n pairs from startKey (the reference's
    * batch-pagination viewed as a query). */
  def scanLimit(kv: DataFrame, n: Int): DataFrame =
    kv.orderBy(col("key")).limit(n)

  /** The reference's scan SINK (`scan/scan.go:35-41,51-54`): the ordered
    * dump written as text lines `key:<HEX>, value:<HEX>, cnt:<n>.` into
    * `<outDir>/<name>_scan.log.<timestamp>`. Distributed write — one
    * shard per range partition (the reference's single bufio stream
    * doesn't survive 100 TB; a sharded sorted dump does, and `cnt` still
    * totally orders it). Returns the output path. */
  def writeHexDump(kv: DataFrame, outDir: String, name: String,
                   timestamp: String = java.time.ZonedDateTime
                     .now(java.time.ZoneOffset.UTC)
                     .format(java.time.format.DateTimeFormatter
                       .ofPattern("yyyy-MM-dd'T'HH.mm.ssX"))): String = {
    val path = s"$outDir/${name}_scan.log.$timestamp"
    hexDumpWithCnt(kv)
      .select(concat(
        lit("key:"), col("key_hex"),
        lit(", value:"), col("value_hex"),
        lit(", cnt:"), col("cnt"), lit(".")).as("value"))
      .write.mode("overwrite").text(path)
    path
  }
}
