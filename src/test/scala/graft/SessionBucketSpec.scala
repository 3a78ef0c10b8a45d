package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Sessionization cross-check against Spark's native session_window,
  * streaming stateful dedup, and bucketed co-located joins. */
class SessionBucketSpec extends SparkTestBase {
  import spark.implicits._

  test("gap sessionize agrees with the native session_window formulation") {
    val ev = Events.read(spark, sfSmoke)
    val mine = Events.sessionize(ev, 1800000000L)
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().sorted.toSeq
    val native = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(mine === native)
    assert(mine.nonEmpty)
  }

  test("streaming dropDuplicates drops cross-batch duplicate keys (stateful dedup)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val dedup = mem.toDF.toDF("ts", "id")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("id")
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
      mem.addData((t(1), 1L), (t(2), 2L), (t(2), 1L))
      q.processAllAvailable()
      mem.addData((t(3), 1L), (t(4), 3L)) // id 1 already seen in batch 1
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("id").as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions by gap and by event-time timeout") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSessions
    import graft.streaming.StreamingSessions.{ClosedSession, Evt}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val mem = MemoryStream[Evt]
    val sessions = StreamingSessions(
      mem.toDS().withWatermark("ts", "0 seconds").as[Evt], 1800000000L) // 30 min gap
    val q = sessions.writeStream.format("memory").queryName("ssess")
      .outputMode(StreamingSessions.outputMode).start()
    try {
      // user 1: two events 5 min apart (one session); user 2: events 50
      // min apart in ONE batch → first closes by in-batch gap
      mem.addData(Evt(1L, t(0), 1.0), Evt(1L, t(5), 2.0),
        Evt(2L, t(0), 5.0), Evt(2L, t(50), 6.0))
      q.processAllAvailable()
      // push the watermark far ahead → user 1's open session times out
      mem.addData(Evt(3L, t(600), 0.0))
      q.processAllAvailable()
      mem.addData(Evt(3L, t(1200), 0.0))
      q.processAllAvailable()
      val got = spark.table("ssess").as[ClosedSession].collect()
        .map(s => (s.user_id, s.n_events, s.sum_value)).toSet
      assert(got.contains((2L, 1L, 5.0)))  // in-batch gap close
      assert(got.contains((1L, 2L, 3.0)))  // event-time timeout close
    } finally q.stop()
  }

  test("joining two tables bucketed on the join key plans no shuffle") {
    val bt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"$sfSmoke/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .saveAsTable("li_bucketed")
      spark.read.parquet(s"$sfSmoke/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bt)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
