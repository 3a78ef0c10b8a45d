package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Physical-layout operators — how 100 TB of data gets ARRANGED so
  * that scans can skip most of it. The reference's analog is the
  * region-range partitioning its checksum fans out over
  * (`checksum/checksum.go:52-65`): a 1-D sort key gives perfect
  * pruning on that key and none on any other. Z-ordering (bit
  * interleaving, the Morton curve) is the standard multi-dimensional
  * upgrade: sorting by the interleaved key keeps BOTH dimensions
  * locally clustered, so per-file min/max stats prune range predicates
  * on either column — the technique behind Delta/Iceberg Z-ORDER
  * clustering.
  *
  * The key computation is pure integer bit arithmetic on pre-quantized
  * coordinates (shift/and/or of constants — fully codegen'd, and
  * replayable verbatim in any SQL engine), so it is oracle-checkable;
  * the layout BENEFIT (shrunken per-partition bounding boxes) is
  * asserted by LayoutSpec. */
object Layout {

  /** Morton/Z-order key of two quantized coordinates: interleaves the
    * low `bits` bits of each (x in even positions, y in odd). Inputs
    * must already be non-negative and < 2^bits — quantization is the
    * caller's contract (it depends on the column's domain). */
  def zorder2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Clamped power-of-two quantizer: floor the double into [0, 2^bits). */
  def quantize(c: Column, bits: Int): Column =
    least(greatest(floor(c), lit(0.0)), lit((1L << bits) - 1.0)).cast("long")

  /** Range-partition + sort by the Z-key: after this, each partition
    * (file, at write time) covers a compact square-ish region of the
    * (x, y) plane instead of a full-width stripe, so min/max stats on
    * BOTH x and y are tight. This is a layout decision — row content
    * is untouched. */
  def clusterByZ(df: DataFrame, x: Column, y: Column, bits: Int,
                 partitions: Int): DataFrame = {
    val withZ = df.withColumn("__z", zorder2(x, y, bits))
    withZ.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  // --- materialized layouts (write once, scan many) --------------------
  // The other two lakehouse layout primitives next to Z-order: HIVE
  // PARTITIONING (directory-per-value of a low-cardinality column, so a
  // filter on it prunes whole directories before any file is opened) and
  // BUCKETING (pre-hash-partitioned files on a join key, so an equi-join
  // between two tables bucketed the same way runs with ZERO shuffle —
  // the shuffle was paid once at write time, amortized over every
  // subsequent join). Both are materialized once per JVM via
  // [[graft.sources.FixtureStore]]; that is the production shape too:
  // a layout is written once and scanned many times.
  private lazy val store = new graft.sources.FixtureStore("graft-layout-")

  /** The documents table re-written `partitionBy(lang)`: one directory
    * per language, each holding only that language's rows. A reader
    * filtering on `lang` sees the predicate as a PARTITION filter
    * (directory pruning — pinned in PlanShapeSpec), not a data filter:
    * at 100 TB the scan for one language never lists, opens, or reads
    * any other language's files. */
  def partitionedDocs(s: SparkSession, dir: String): DataFrame = {
    val path = store(s"$dir/docs_by_lang", "docs") { p =>
      s.read.parquet(s"$dir/documents.parquet")
        .write.mode("overwrite").partitionBy("lang").parquet(p)
    }
    s.read.parquet(path)
  }

  /** Small-files COMPACTION — the table-maintenance primitive every
    * long-lived lakehouse table needs: streaming ingest and per-executor
    * writes leave directories of tiny files whose per-file open/footer
    * cost dominates scans at 100 TB. Sizes the output from the INPUT's
    * actual on-disk bytes (ceil(total/targetBytes) files, floor 1),
    * rewrites content-identically, and returns the file count chosen.
    * A driver-side file listing (metadata only — no data moves through
    * the driver) feeds one distributed rewrite job. */
  def compact(s: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val hp = new org.apache.hadoop.fs.Path(inPath)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hp, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    val n = math.max(1L, (total + targetBytes - 1L) / targetBytes).toInt
    s.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** The documents table deliberately FRAGMENTED (64 shards — the
    * shape a micro-batching ingest leaves behind) and then compacted
    * with [[compact]] at a 4 MB target; returns the compacted read.
    * The q_compaction oracle replays its aggregate over the original
    * table, so the gate proves the rewrite is content-identical down
    * to per-text md5; LayoutSpec pins the file-count mechanics. */
  def compactedDocs(s: SparkSession, dir: String): DataFrame = {
    val path = store(s"$dir/docs_compacted", "compact") { p =>
      val frag = s"${p}_frag"
      s.read.parquet(s"$dir/documents.parquet").repartition(64)
        .write.mode("overwrite").parquet(frag)
      compact(s, frag, p, targetBytes = 4L * 1024 * 1024)
      ()
    }
    s.read.parquet(path)
  }

  /** The orders table written once per JVM as a STATS-BEARING kvbin
    * layout — the Delta/Iceberg data-skipping analog over the house
    * connector. Value bytes carry two fixed-width BE64 fields
    * (`price_k` = ⌊o_totalprice/1000⌋ at offset 0, `cust` = o_custkey
    * at offset 8) that the index sidecar summarizes per region
    * (`#stats=` header + min/max pairs), and the placement CLUSTERS by
    * the Morton key of the two stats ([[zorder2]], 16 bits each) so
    * every region is a compact box in (price_k, cust) space — the
    * property that makes per-region min/max tight enough for a
    * conjunctive range predicate on EITHER column to skip most regions
    * at planning time (KVBinSpec pins regions-opened < total). Keys
    * stay sorted within each region, so in-region key scoping is
    * untouched; cross-region key ranges may overlap (the documented
    * Z-order trade). */
  def kvbinSkipTable(s: SparkSession, dir: String): String =
    store(s"$dir/kvbin_skip", "kvskip") { p =>
      val priceK = floor(col("o_totalprice") / 1000.0).cast("long")
      val be64 = (c: Column) => unhex(lpad(hex(c), 16, "0"))
      val kv = s.read.parquet(s"$dir/orders.parquet").select(
        encode(format_string("ok_%010d", col("o_orderkey")), "UTF-8").as("key"),
        concat(be64(priceK), be64(col("o_custkey"))).as("value"),
        zorder2(least(priceK, lit(65535L)),
          least(col("o_custkey"), lit(65535L)), 16).as("__cluster"))
      graft.sources.kvbin.KVBin.write(kv, p, 32, "V1",
        Seq("price_k" -> "v_be64@0", "cust" -> "v_be64@8"))
      ()
    }

  /** A KV snapshot written as a BUCKETED parquet table —
    * `bucketBy(buckets, k)` + `sortBy(k)` — and read back through the
    * catalog (bucket metadata lives there). Two snapshots bucketed with
    * the same (column, count) join bucket-to-bucket with no exchange,
    * and an equality filter on `k` prunes to a single bucket
    * (`SelectedBucketsCount` — both pinned in PlanShapeSpec). The write
    * happens at most once per (snapshot, session); at 100 TB this is
    * the one-time layout job that makes every later diff/join/point
    * lookup shuffle-free. */
  def bucketedSnapshot(s: SparkSession, dir: String, side: String,
                       buckets: Int = 8): DataFrame = {
    require(side == "src" || side == "dst", s"side must be src|dst, got $side")
    // md5 of the dir, not dir.hashCode: Int hashCode collisions (or the
    // Int.MinValue abs edge case) would alias two snapshots to one table
    val dirKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val table = s"graft_bkt_${side}_$dirKey"
    if (!s.catalog.tableExists(table)) {
      val df = if (side == "src") graft.sources.KVSnapshot.srcStr(s, dir)
               else graft.sources.KVSnapshot.dstStr(s, dir)
      // write-once is enforced by the tableExists check (per session —
      // the catalog entry carries the bucket spec), so the store key is
      // a fresh UUID: a later session in the same JVM must rewrite, and
      // reusing a memoized path would hand saveAsTable a non-empty dir
      val path = store(s"$dir/bkt_$side@${java.util.UUID.randomUUID()}",
        s"bkt_$side") { p =>
        df.write.mode("overwrite").format("parquet")
          .bucketBy(buckets, "k").sortBy("k")
          .option("path", p)
          .saveAsTable(table)
      }
      require(path.nonEmpty) // memo path is unused beyond the write
    }
    s.table(table)
  }
}
