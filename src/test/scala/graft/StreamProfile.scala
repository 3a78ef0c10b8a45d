package graft

import org.apache.spark.sql.SparkSession

/** Manual profiling harness (Test/runMain graft.StreamProfile) — times
  * the streaming entries at a given SF. Note: the entries pin their own
  * STATE partitioning (StreamEntries.withStatePartitions), so the
  * session's shuffle-partition setting only affects the non-stateful
  * stages around them. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    import graft.streaming.StreamEntries
    // warm the KV snapshots so the diff entry isn't billed materialization
    graft.sources.KVSnapshot.srcStr(spark, dir).count()
    graft.sources.KVSnapshot.dstStr(spark, dir).count()
    time("stream_diff")(StreamEntries.streamDiff(spark, dir).count())
    time("stream_sessions")(StreamEntries.streamSessions(spark, dir).count())
    time("stream_keyed_checksum")(StreamEntries.streamKeyedChecksum(spark, dir).count())
    spark.stop()
  }
}
