package graft

/** The q_edit_neardup{,_prefix} ENTRIES checkpoint their verified pairs
  * before the oracle orderBy (r16 change 3), so the entry-level plan is
  * a checkpoint scan + sort. This dumps the OPERATOR plans — the ones
  * the checkpoint job executes — as `<q>_operator_<suffix>.txt`, so the
  * single-levenshtein / lev_capped claims stay checkable offline. */
object PlanDumpEdit {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "after"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = java.nio.file.Paths.get("plans/r16")
    java.nio.file.Files.createDirectories(out)
    val plans = Seq(
      "q_edit_neardup" -> graft.operators.Dedup.editNearDup(
        docs, "text", "doc_id", "lang", contentBand = true, bandBits = 60,
        tokenHash = graft.operators.Dedup.md5Hash60),
      "q_edit_neardup_prefix" -> graft.operators.Dedup.editNearDupPrefix(
        docs, "text", "doc_id", "lang", maxDistPermille = 50))
    for ((q, df) <- plans) {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(out.resolve(s"${q}_operator_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"dumped $q operator plan")
    }
    spark.stop()
  }
}
