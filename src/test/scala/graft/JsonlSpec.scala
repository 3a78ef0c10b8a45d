package graft

import org.apache.spark.sql.functions._

import graft.sources.Jsonl

/** JSONL ingest: the permissive parse must type every well-formed line,
  * quarantine every mangled one with its raw bytes, and lose nothing. */
class JsonlSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("jsonl-spec-").toString
    Seq.tabulate(250)(i =>
        (i.toLong, s"body of document $i with some text", "en", "unit", 30L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("corrupt lines are quarantined with raw bytes; good lines parse typed and complete") {
    val got = Jsonl.read(spark, dir).localCheckpoint()
    // nothing dropped: every input line is a row
    assert(got.count() === 250L)
    val bad = got.filter(col("_bad").isNotNull)
    // exactly the truncated residue class doc_id % 100 == 7
    assert(bad.count() === 3L) // ids 7, 107, 207
    // quarantine rows carry the raw mangled line and no parsed fields
    val badRows = bad.select(col("_bad"), col("doc_id"), col("n_chars")).collect()
    assert(badRows.forall(r => r.getString(0).startsWith("{") &&
      !r.getString(0).endsWith("}") && r.isNullAt(1) && r.isNullAt(2)))
    // good rows roundtrip the parquet values exactly
    val good = got.filter(col("_bad").isNull)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect().toMap
    assert(good.size === 247)
    assert(good.keySet.forall(_ % 100 != 7))
    assert(good.forall { case (id, nc) => nc === 30L + id })
  }

  test("DROPMALFORMED is the same reader one option away") {
    val dropped = spark.read.schema(Jsonl.schema)
      .option("mode", "DROPMALFORMED")
      .json(Jsonl.fixturePath(spark, dir))
      .filter(col("doc_id").isNotNull)
    assert(dropped.count() === 247L)
  }
}
