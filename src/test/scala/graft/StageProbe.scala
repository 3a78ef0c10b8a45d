package graft

/** Optimization-round diagnostic: run named queries once (after a
  * small-SF warmup) and print EVERY completed stage's task time, task
  * count, shuffle bytes and the head of its name/details — the
  * where-does-the-task-time-go view the UI would give if it were
  * enabled. Not part of the driver contract. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(name: String, tasks: Int, taskMs: Long, shufR: Long,
                  shufW: Long, inB: Long, sub: Long, done: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = e.stageInfo
          val m = i.taskMetrics
          stages.add(St(i.name.linesIterator.next().take(120), i.numTasks,
            m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
            i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L)))
          ()
        }
      })
    for (n <- args.toSeq) {
      val fn = SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      graft.operators.Dedup.clearCaches()
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STAGEPROBE $n wall=$dt%.2fs stages=${stages.size}")
      import scala.jdk.CollectionConverters._
      val all = stages.asScala.toSeq
      val t00 = if (all.isEmpty) 0L else all.map(_.sub).min
      all.sortBy(_.sub).foreach { s =>
        println(f"  [${(s.sub - t00) / 1000.0}%6.2f-${(s.done - t00) / 1000.0}%6.2f] " +
          f"${s.taskMs / 1000.0}%8.2fs tasks=${s.tasks}%3d " +
          f"shufR=${s.shufR / 1048576.0}%7.1fM shufW=${s.shufW / 1048576.0}%7.1fM " +
          f"in=${s.inB / 1048576.0}%7.1fM  ${s.name}")
      }
    }
    spark.stop()
  }
}
