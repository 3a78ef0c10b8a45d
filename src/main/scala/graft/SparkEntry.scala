package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Checksum
import graft.operators.{Diff, Scan}
import graft.sources.KVSnapshot

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query ends in a fully deterministic ORDER BY and
  * aliases every computed column identically in Spark and DuckDB (the
  * driver sorts columns by name, then hashes values). Double-typed
  * aggregates go through exact DECIMAL arithmetic and only cast the
  * final result to DOUBLE, so Spark's and DuckDB's summation order
  * can't produce differing bits. */
object SparkEntry {

  private val cte = KVSnapshot.duckdbCte

  /** Flagship query (reference's `checksum` subcommand end-to-end,
    * SURVEY.md §3.1) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Checksum.verdict(KVSnapshot.src(spark, dir), KVSnapshot.dst(spark, dir))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2a rows 4-7: checksum aggregate (crc64-xor monoid; partial+final agg)
    "q_checksum" -> ((s, dir) => Checksum.of(KVSnapshot.src(s, dir))),
    // §2a row 6: per-range (region-style) grouped checksum
    "q_checksum_bucket" -> ((s, dir) =>
      Checksum.byBucket(KVSnapshot.src(s, dir),
          substring(col("key").cast("string"), 1, 10))
        .orderBy(col("bucket"))),
    // §2a row 9: src-vs-dst checksum equality verdict
    "q_checksum_verdict" -> ((s, dir) =>
      Checksum.verdict(KVSnapshot.src(s, dir), KVSnapshot.dst(s, dir))),
    // §2a row 10: diff = full-outer join on key, classified
    "q_diff" -> ((s, dir) =>
      Diff.diff(kvStrSrc(s, dir), kvStrDst(s, dir))
        .orderBy(col("key"), col("diff_class"))),
    // §2a row 12: per-class running-counter totals
    "q_diff_counts" -> ((s, dir) =>
      Diff.diffCounts(kvStrSrc(s, dir), kvStrDst(s, dir)).orderBy(col("diff_class"))),
    // left_anti variant: keys only in src
    "q_diff_src_only" -> ((s, dir) =>
      Diff.srcOnly(kvStrSrc(s, dir), kvStrDst(s, dir)).orderBy(col("key"))),
    // §2b set ops: symmetric difference on whole pairs
    "q_symdiff" -> ((s, dir) =>
      Diff.symmetricDiff(kvStrSrc(s, dir), kvStrDst(s, dir))
        .orderBy(col("key"), col("side"))),
    // §2a row 3: key-range predicate, unsigned-lexicographic
    "q_range_filter" -> ((s, dir) =>
      KVSnapshot.rangeFilter(KVSnapshot.src(s, dir),
          "li_0000000100".getBytes("UTF-8"), "li_0000000300".getBytes("UTF-8"))
        .select(upper(hex(col("key"))).as("key_hex"), upper(hex(col("value"))).as("value_hex"))
        .orderBy(col("key_hex"))),
    // §2a row 11: ordered hex scan dump with running cnt
    "q_scan_dump" -> ((s, dir) =>
      Scan.hexDumpWithCnt(KVSnapshot.rangeFilter(KVSnapshot.src(s, dir),
        "li_0000000001".getBytes("UTF-8"), "li_0000000100".getBytes("UTF-8")))),
    // §2b aggregations: TPC-H Q1-style grouped agg (exact decimal sums)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
          ).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // §2b window functions: top-k per group with deterministic tie-break
    "q_topk_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("l_returnflag"), col("rn"))
    })
  )

  private def kvStrSrc(s: SparkSession, dir: String): DataFrame =
    KVSnapshot.srcStr(s, dir).select(col("k").as("key"), col("v").as("value"))
  private def kvStrDst(s: SparkSession, dir: String): DataFrame =
    KVSnapshot.dstStr(s, dir).select(col("k").as("key"), col("v").as("value"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (crc64 checksum family) → driver records a rows-only check; those
    * are covered by scalatest/scalacheck property suites instead. */
  def oracleSql: Map[String, String] = Map(
    "q_diff" -> (cte +
      """SELECT COALESCE(s.k, d.k) AS key, s.v AS src_value, d.v AS dst_value,
        |  CASE WHEN s.k IS NULL THEN 'dst_only'
        |       WHEN d.k IS NULL THEN 'src_only'
        |       ELSE 'mismatch' END AS diff_class
        |FROM src s FULL OUTER JOIN dst d ON s.k = d.k
        |WHERE s.k IS NULL OR d.k IS NULL OR s.v <> d.v
        |ORDER BY key, diff_class""".stripMargin),
    "q_diff_counts" -> (cte +
      """SELECT diff_class, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN s.k IS NULL THEN 'dst_only'
        |              WHEN d.k IS NULL THEN 'src_only'
        |              ELSE 'mismatch' END AS diff_class
        |  FROM src s FULL OUTER JOIN dst d ON s.k = d.k
        |  WHERE s.k IS NULL OR d.k IS NULL OR s.v <> d.v)
        |GROUP BY diff_class ORDER BY diff_class""".stripMargin),
    "q_diff_src_only" -> (cte +
      """SELECT s.k AS key, s.v AS value FROM src s
        |WHERE s.k NOT IN (SELECT k FROM dst) ORDER BY key""".stripMargin),
    "q_symdiff" -> (cte +
      """SELECT * FROM (
        |  SELECT k AS key, v AS value, 'src' AS side FROM (SELECT k, v FROM src EXCEPT ALL SELECT k, v FROM dst)
        |  UNION ALL
        |  SELECT k AS key, v AS value, 'dst' AS side FROM (SELECT k, v FROM dst EXCEPT ALL SELECT k, v FROM src))
        |ORDER BY key, side""".stripMargin),
    "q_range_filter" -> (cte +
      """SELECT upper(hex(k)) AS key_hex, upper(hex(v)) AS value_hex FROM src
        |WHERE k >= 'li_0000000100' AND k < 'li_0000000300' ORDER BY key_hex""".stripMargin),
    "q_scan_dump" -> (cte +
      """SELECT upper(hex(k)) AS key_hex, upper(hex(v)) AS value_hex,
        |  ROW_NUMBER() OVER (ORDER BY k) AS cnt FROM src
        |WHERE k >= 'li_0000000001' AND k < 'li_0000000100' ORDER BY cnt""".stripMargin),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_topk_window" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin
  )
}
