package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV and ORC ingest fixtures — the rest of the file-format family
  * (parquet snapshots, the kvbin DSv2 connector, JSONL with quarantine,
  * the text sink). Like [[Jsonl]], fixtures derive deterministically
  * from the documents parquet so the DuckDB oracle replays the
  * DERIVATION in SQL and the Spark side must survive the real
  * writer→parser roundtrip.
  *
  * The CSV fixture PLANTS the quoting hazards the synthetic corpus
  * lacks: every `doc_id % 10 == 3` text is prefixed with `a,"b\n` — the
  * field delimiter, the quote character and the record separator all
  * inside one field — so the gate actually exercises quoting, escaping
  * and multi-line record parsing, not just comma-free happy paths. ORC
  * is the columnar member: its gate query filters on `lang`, and
  * PlanShapeSpec pins that the predicate reaches the ORC scan as a
  * pushed filter (min/max stripe skipping at scale). */
object FileFormats {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val store = new FixtureStore("graft-fmt-")

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))

  /** The planted-hazard text: delimiter + quote + newline inside the
    * field for one residue class, leading/trailing whitespace for
    * another (the writer's trim defaults would silently eat it),
    * verbatim otherwise. */
  private def hazardText: org.apache.spark.sql.Column =
    when(pmod(col("doc_id"), lit(10)) === 3,
      concat(lit("a,\"b\n"), col("text")))
    .when(pmod(col("doc_id"), lit(10)) === 4,
      concat(lit("  "), col("text"), lit("  ")))
    .otherwise(col("text"))

  /** CSV read end-to-end: derive (memoized, real Spark CSV writer with
    * default quote/escape) + parse (multiLine for the planted embedded
    * newlines, same default quote/escape). The writer's whitespace
    * trimming is OFF and empty/null encodings pinned explicitly —
    * Spark's CSV WRITE defaults trim leading/trailing whitespace
    * (ignore*WhiteSpace=true), which would silently mutate the planted
    * whitespace hazard in the roundtrip; the read side's trim defaults
    * are already false. */
  def readCsv(spark: SparkSession, dir: String): DataFrame = {
    val p = store(s"csv:$dir", "csv") { path =>
      docs(spark, dir).withColumn("text", hazardText)
        .write.option("header", "false")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("nullValue", "")
        .option("emptyValue", "\"\"")
        .csv(path)
    }
    spark.read.schema(docSchema)
      .option("header", "false")
      .option("multiLine", "true")
      .csv(p)
  }

  /** ORC read end-to-end: derive (memoized) + read — the columnar
    * format with stats-based predicate pushdown. */
  def readOrc(spark: SparkSession, dir: String): DataFrame = {
    val p = store(s"orc:$dir", "orc") { path =>
      docs(spark, dir).write.orc(path)
    }
    spark.read.schema(docSchema).orc(p)
  }

  /** `binaryFile` ingest end-to-end: the multimodal corpus written as
    * ONE FILE PER BLOB (`media_<id>.bin`) — the layout a crawler or
    * object store actually delivers media in — then read back through
    * Spark's built-in `binaryFile` source (path, modificationTime,
    * length, content). The write fans out over executor tasks via
    * `foreachPartition` (never a driver collect); the read side
    * re-derives the media id from the file name, so the gate proves
    * path metadata + raw content both survive the roundtrip.
    *
    * Scale: binaryFile lists + reads files in parallel and carries
    * per-file length without opening content when only `length` is
    * selected; for 100 TB of media the same plan runs against an
    * object-store listing, with `pathGlobFilter`/partitioned prefixes
    * bounding the listing. Caveat pinned in the scaladoc on purpose:
    * binaryFile loads EACH file fully into one row — it is the
    * small-object path (thumbnails, clips), not a large-video format;
    * large media wants the kvbin-style ranged connector. */
  def readBinaryFiles(spark: SparkSession, dir: String): DataFrame = {
    val p = store(s"bin:$dir", "bin") { path =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
      val blobs = spark.read.parquet(s"$dir/embeddings.parquet")
      graft.operators.Multimodal.synthesize(blobs)
        .select(col("media_id"), col("blob"))
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          rows.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(path, s"media_${r.getLong(0)}.bin"),
              r.getAs[Array[Byte]](1))
          }
        }
    }
    spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(p)
      .withColumn("media_id",
        regexp_extract(col("path"), "media_(\\d+)\\.bin", 1).cast("long"))
  }

  /** The multimodal corpus through the kvbin ranged connector — the
    * LARGE-MEDIA path [[readBinaryFiles]]' scaladoc points at: blobs as
    * kvbin VALUES keyed by fixed-width ASCII-decimal media id (20
    * digits — every non-negative BIGINT fits, because Spark's lpad
    * TRUNCATES overlong strings and a truncated key would silently
    * collide two blobs; so unsigned-lex key order IS numeric id order
    * and the
    * DSv2 write's declared range distribution sorts blobs by id into
    * contiguous region files). Reading N blobs then costs
    * region-count file opens against a planner-pruned key range —
    * never binaryFile's open-and-list per object, which measured 4.5×
    * for 10× blobs at sf1 (BENCH_SF1.md) exactly because per-file
    * metadata dominates small objects. The write fans out over
    * executor tasks via the connector's planner-integrated path
    * (range exchange + per-task region streams; commit publishes
    * `_index`), so no driver ever holds a blob.
    *
    * Contract cross-reference: content parity between the two paths is
    * gated by the same md5-XOR monoid over raw blob bytes
    * (`q_binaryfile_ingest` vs `q_multimodal_kvbin` share the oracle
    * derivation); binaryFile remains the crawler-delivery ingest shape
    * (one object per blob as produced upstream), kvbin the curated
    * at-rest layout a 100 TB media corpus scans and random-reads. */
  def readKvbinBlobs(spark: SparkSession, dir: String): DataFrame = {
    val p = store(s"kvblob:$dir", "kvblob") { path =>
      graft.operators.Multimodal.synthesize(
          spark.read.parquet(s"$dir/embeddings.parquet"))
        .select(
          lpad(col("media_id").cast("string"), 20, "0").cast("binary").as("key"),
          col("blob").as("value"))
        .write.format(classOf[graft.sources.kvbin.KVBinSource].getName)
        .option("path", path).option("api_version", "V1")
        .mode("overwrite").save()
    }
    spark.read.format(classOf[graft.sources.kvbin.KVBinSource].getName)
      .option("path", p).load()
      .select(col("key").cast("string").cast("long").as("media_id"),
        col("value").as("blob"))
  }
}
