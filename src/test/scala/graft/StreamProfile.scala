package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable

/** Diagnostic main: where does a streaming entry's wall time go?
  * Attaches a [[StreamingQueryListener]] and dumps each micro-batch's
  * `durationMs` phase breakdown (addBatch / queryPlanning / stateCommit /
  * triggerExecution / walCommit …) plus the start→first-batch and
  * last-batch→stop gaps, for a handful of representative entries run
  * back-to-back. Run with:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt "Test/runMain graft.StreamProfile"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batches = mutable.ArrayBuffer[(String, Long, Map[String, Long])]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        batches.synchronized {
          batches += ((e.progress.name, e.progress.batchId,
            e.progress.durationMs.asScala.map { case (k, v) => (k, v.toLong) }.toMap))
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val entries: Seq[(String, () => Unit)] = Seq(
      "static" -> (() => { graft.streaming.StreamEntries.streamStaticJoin(spark, dir).count(); () }),
      "diff" -> (() => { graft.streaming.StreamEntries.streamDiff(spark, dir).count(); () }),
      "cms" -> (() => { graft.streaming.StreamEntries.streamCms(spark, dir).count(); () }),
      "upsert" -> (() => { graft.streaming.StreamEntries.streamUpsert(spark, dir).count(); () }))

    // two passes like Bench, report the second (warm) one
    (0 until 2).foreach { pass =>
      entries.foreach { case (name, run) =>
        batches.synchronized(batches.clear())
        val t0 = System.nanoTime()
        run()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        if (pass == 1) {
          val rows = batches.synchronized(batches.toVector)
          val phaseTotal = rows.map(_._3.getOrElse("triggerExecution", 0L)).sum
          println(f"== $name%-8s wall=${wallMs}ms batches=${rows.size} triggerTotal=${phaseTotal}ms unaccounted=${wallMs - phaseTotal}ms")
          rows.foreach { case (_, bid, d) =>
            val interesting = d.toSeq.sortBy(-_._2).filter(_._2 > 0)
              .map { case (k, v) => s"$k=$v" }.mkString(" ")
            println(s"   batch $bid: $interesting")
          }
        }
      }
    }
    spark.stop()
  }
}
