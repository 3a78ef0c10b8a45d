package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_range_filter","q_kvbin_scan","q_checksum","q_join_revenue","q_cosine_topk")
    for (q <- qs) {
      println(s"===== $q =====")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Scan") || l.contains("Exchange") || l.contains("HashAggregate") ||
        l.contains("Broadcast") || l.contains("PushedFilters") || l.contains("Filter") ||
        l.contains("SortMergeJoin")).take(14).mkString("\n"))
    }
    spark.stop()
  }
}
