package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous diff of two KV CHANGE STREAMS — the reference's `diff`
  * subcommand (`diff/diff.go:18-63`) lifted from batch snapshots to
  * Structured Streaming: records from both sides are bucketed into
  * event-time windows and full-outer stream-stream-joined on
  * (window, key); once the watermark closes a window, unmatched or
  * mismatched pairs emit with the same classification the batch diff
  * uses (src_only / dst_only / mismatch).
  *
  * State: each side buffers only rows whose window the watermark hasn't
  * passed — O(in-flight window volume), evicted automatically. The
  * equality join on (window, key) hash-partitions both streams, so the
  * compare is distributed exactly like the batch sort-merge diff.
  */
object StreamDiff {

  /** `src`/`dst`: streaming frames with (tsCol: timestamp, key, value).
    * Output per closed window: w_start, key, src_value, dst_value,
    * diff_class — equal pairs are dropped, like the batch diff. */
  def apply(src: DataFrame, dst: DataFrame, tsCol: String,
            windowDur: String, watermark: String): DataFrame = {
    def prep(df: DataFrame, side: String): DataFrame =
      df.withWatermark(tsCol, watermark)
        .select(window(col(tsCol), windowDur).as("w"),
          col("key").as(s"${side}_key"),
          col("value").as(s"${side}_value"))
    val s = prep(src, "src")
    val d = prep(dst, "dst")
    s.join(d,
        s("w") === d("w") && col("src_key") === col("dst_key"),
        "full_outer")
      .select(
        coalesce(s("w.start"), d("w.start")).as("w_start"),
        coalesce(col("src_key"), col("dst_key")).as("key"),
        col("src_value"), col("dst_value"),
        when(col("src_key").isNull, "dst_only")
          .when(col("dst_key").isNull, "src_only")
          .when(col("src_value") =!= col("dst_value"), "mismatch")
          .otherwise("equal").as("diff_class"))
      .filter(col("diff_class") =!= "equal")
  }
}
