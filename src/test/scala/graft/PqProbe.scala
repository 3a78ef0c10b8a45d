package graft

/** One-off diagnostic for the r14→r15 ANN-PQ residual: runs the PQ
  * pair repeatedly in one JVM and prints per-run wall time, GC time
  * delta, and GC count delta, so plan cost and collector noise
  * separate. Not part of the driver contract. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import scala.jdk.CollectionConverters._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gc(): (Long, Long) = {
      val bs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (bs.map(_.getCollectionTime).sum, bs.map(_.getCollectionCount).sum)
    }
    val names = args.toSeq match {
      case Nil => Seq("q_ann_pq", "q_ann_ivf_pq")
      case s => s
    }
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(); () }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          Option(t.taskMetrics).foreach(m =>
            { taskMs.addAndGet(m.executorRunTime); () })
      })
    val reps = sys.env.getOrElse("PQ_PROBE_REPS", "5").toInt
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // one warmup at the smallest sf
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      (1 to reps).foreach { i =>
        val (g0, c0) = gc()
        val (j0, tk0) = (jobs.get(), taskMs.get())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val (g1, c1) = gc()
        println(f"PQPROBE $n run=$i wall=$dt%.2fs gc=${(g1 - g0) / 1000.0}%.2fs " +
          f"gcN=${c1 - c0} jobs=${jobs.get() - j0} taskSec=${(taskMs.get() - tk0) / 1000.0}%.1f")
      }
    }
    spark.stop()
  }
}
