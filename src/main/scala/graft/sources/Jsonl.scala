package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSONL ingest with corrupt-line quarantine — the file format and the
  * failure mode every LLM data pipeline starts from: newline-delimited
  * JSON scraped/exported by someone else, where a fraction of lines is
  * truncated or mangled and MUST be quarantined, not dropped silently
  * and not allowed to kill the job. (The reference has no ingest
  * surface — it reads a live cluster — so this is §2b "sources/file
  * formats" coverage, not §2a parity.)
  *
  * Like [[KVSnapshot]], the fixture is DERIVED deterministically from
  * the driver's parquet so the DuckDB oracle can replay the derivation
  * in SQL instead of re-parsing files: every document becomes one
  * `to_json` line, and lines with `doc_id % 100 == 7` are truncated by
  * five characters — always invalid JSON, because the closing brace is
  * among the cut characters and never restored. The parse pipeline is
  * the real Spark JSON reader in PERMISSIVE mode with a corrupt-record
  * column: well-formed lines parse to typed rows, mangled lines survive
  * as quarantine rows with every data field null. At 100 TB the scan
  * parallelizes per file split and the parser is a per-row map — no
  * shuffle until the caller aggregates; DROPMALFORMED/FAILFAST are the
  * same reader one option away. */
object Jsonl {

  /** The ingest schema plus the quarantine column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_bad", StringType)))

  private val store = new FixtureStore("graft-jsonl-")

  /** Materialize the JSONL fixture for `dir`'s documents table, once
    * per JVM (source setup, not query work — the file "already exists"
    * in a real pipeline). */
  def fixturePath(spark: SparkSession, dir: String): String =
    store(dir, "docs") { p =>
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("line", to_json(struct(col("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars"))))
        .select(
          when(pmod(col("doc_id"), lit(100)) === 7,
            expr("substring(line, 1, length(line) - 5)"))
            .otherwise(col("line")).as("value"))
        .write.mode("overwrite").text(p)
    }

  /** Read a JSONL path through the permissive parser: typed rows for
    * well-formed lines, `_bad = raw line` (all data fields null) for
    * mangled ones. */
  def readQuarantine(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(path)

  /** The fixture read end-to-end: derive (memoized) + parse. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readQuarantine(spark, fixturePath(spark, dir))
}
