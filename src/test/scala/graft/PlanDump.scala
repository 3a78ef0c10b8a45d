package graft

/** Measurement tooling (optimization rounds): dump the FORMATTED
  * physical plan of named queries to `plans/<tag>/<query>_<suffix>.txt`
  * so plan claims in OPTIMIZATION_r*.md are checkable offline.
  *
  * Usage: Test/runMain graft.PlanDump <tag> <suffix> q_a,q_b[,...]
  *   SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1 — plans are
  *   captured at the benched SF so AQE/size-dependent choices match
  *   what the bench measures).
  *
  * Streaming entries have no batch executedPlan; for those the dump
  * records the analyzed logical plan of the sink table instead (the
  * micro-batch runtime plans are per-batch and ephemeral).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> q_a,q_b")
    val (tag, suffix, names) = (args(0), args(1), args(2).split(",").toSeq)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(out)
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, dir)
      val txt =
        if (df.isStreaming) "streaming sink (no batch executedPlan)\n" +
          df.queryExecution.analyzed.toString
        else df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(out.resolve(s"${q}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"dumped $q -> plans/$tag/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
