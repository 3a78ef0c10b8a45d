package graft

import graft.operators.{Events, Rank}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed two-phase rank ([[graft.operators.Rank]]) — the
  * replacement for one-task-per-group sort windows. Pins (a) rank
  * equality with the plain window definition under heavy group skew,
  * (b) the constant-value fallback, and (c) the plan shape: the data
  * windows partition by (group, bucket), never by the group alone. */
class RankSpec extends SparkTestBase {
  import spark.implicits._

  // 1 group holds ~90% of rows (the "one hot event type" regime);
  // deterministic pseudo-values with collisions and negatives
  private def skewed(n: Int) = (1 to n).map { i =>
    val g = if (i % 10 == 0) (i % 3 + 1).toString else "hot"
    (g, ((i * 2654435761L) % 997).toDouble / 7.0 - 50.0, i.toLong)
  }.toDF("g", "v", "id")

  test("cellRank equals the plain per-group row_number window under skew") {
    val df = skewed(3000)
    val got = Rank.cellRank(Rank.valueBuckets(df, "g", "v", "id", 16),
      Seq("g"), "__b", Seq(col("v"), col("id")), "r")
    val want = df.withColumn("r", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
    assert(got.select("g", "v", "id", "r").except(want).isEmpty)
    assert(want.except(got.select("g", "v", "id", "r")).isEmpty)
  }

  test("NULL group keys and NULL values rank exactly like the plain window") {
    // a NULL group is its own partition; a NULL value sorts first
    // (Spark asc = NULLS FIRST) — both previously fell out of the rank
    // via the equi-joins; the null-safe join + the -1 null-value bucket
    // restore window parity
    val df = Seq(
      (Option("a"), Option(3.0), 1L), (Option("a"), None, 2L),
      (Option("a"), Option(1.0), 3L), (None, Option(2.0), 4L),
      (None, Option(1.0), 5L), (None, None, 6L))
      .toDF("g", "v", "id")
    val got = Rank.cellRank(Rank.valueBuckets(df, "g", "v", "id", 4),
      Seq("g"), "__b", Seq(col("v"), col("id")), "r")
    val want = df.withColumn("r", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
    assert(got.count() === 6, "no row may drop out of the rank")
    assert(got.select("g", "v", "id", "r").except(want).isEmpty)
    assert(want.except(got.select("g", "v", "id", "r")).isEmpty)
  }

  test("constant-value group falls back to id buckets and still ranks by id") {
    val df = (1 to 500).map(i => ("c", 42.0, i.toLong)).toDF("g", "v", "id")
      .union(Seq(("d", 1.0, 1L), ("d", 2.0, 2L)).toDF("g", "v", "id"))
    val got = Rank.cellRank(Rank.valueBuckets(df, "g", "v", "id", 8),
      Seq("g"), "__b", Seq(col("v"), col("id")), "r")
    // constant group: rank == id (ids are 1..500 in (v, id) order)
    assert(got.filter(col("g") === "c" && col("r") =!= col("id")).isEmpty)
    assert(got.filter(col("g") === "d").select("id", "r")
      .as[(Long, Long)].collect().sorted.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("madOutliers/winsorize match a driver-side brute force under skew") {
    val df = skewed(1100)
    val rows = df.as[(String, Double, Long)].collect()
    val byG = rows.groupBy(_._1)
    def medianOf(xs: Seq[(Double, Long)]): Double = {
      val s = xs.sortBy(identity)
      s(((s.size + 1) / 2) - 1)._1
    }
    val expMad = byG.map { case (g, xs) =>
      val med = medianOf(xs.map(x => (x._2, x._3)).toSeq)
      val mad = medianOf(xs.map(x => (math.abs(x._2 - med), x._3)).toSeq)
      val out = xs.count(x => math.abs(x._2 - med) > 3 * mad)
      (g, xs.size.toLong, med, mad, out.toLong)
    }.toSet
    val gotMad = Events.madOutliers(df, "g", "v", "id", k = 3, buckets = 16)
      .as[(String, Long, Double, Double, Long)].collect().toSet
    assert(gotMad == expMad)

    val expWin = byG.map { case (g, xs) =>
      val s = xs.map(x => (x._2, x._3)).toSeq.sorted
      val n = s.size
      val lo = s((5 * n + 99) / 100 - 1)._1
      val hi = s((95 * n + 99) / 100 - 1)._1
      val clipLo = s.count(_._1 < lo).toLong
      val clipHi = s.count(_._1 > hi).toLong
      val wsum = s.map(x => BigDecimal(math.max(math.min(x._1, hi), lo))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      (g, n.toLong, lo, hi, clipLo, clipHi, wsum)
    }.toSet
    val gotWin = Events.winsorize(df, "g", "v", "id", buckets = 16)
      .as[(String, Long, Double, Double, Long, Long, Double)].collect().toSet
    assert(gotWin == expWin)
  }

  test("rank-family plans: no row_number window partitioned by the group alone") {
    // q_split_stratified's quota apportionment legitimately windows the
    // strata×classes table (ordered by `rem`) — tiny by construction;
    // every DATA-side rank window must carry the __b bucket key
    for (q <- Seq("q_mad_outliers", "q_winsorize", "q_split_stratified",
        "q_interleave")) {
      val p = SparkEntry.queries(q)(spark, sfSmoke)
        .queryExecution.executedPlan.toString
      val rankWindows = p.linesIterator
        .filter(l => l.contains("row_number()") && l.contains("windowspecdefinition"))
        .toSeq
      assert(rankWindows.nonEmpty, p)
      rankWindows.foreach(l =>
        assert(l.contains("__b") || l.contains("rem"),
          s"$q has a per-group one-task rank window:\n$l"))
      assert(!p.contains("SinglePartition, Window"), p)
    }
  }

  test("groupedTopK equals the plain per-group window top-n under skew") {
    val df = skewed(3000).select(col("g"),
      col("id"), (col("v") * 1000).cast("long").as("vi"))
    val got = Rank.groupedTopK(df, col("g"), col("id"), col("vi"), 7)
      .select(col("g"), col("id"), col("v"), col("rk"))
      .as[(String, Long, Long, Int)].collect().toSet
    val expect = df
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("vi").desc, col("id"))))
      .filter(col("rk") <= 7)
      .select(col("g"), col("id"), col("vi"), col("rk"))
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got === expect)
    // partition-layout invariance: a different input layout, same top-n
    val got2 = Rank.groupedTopK(df.repartition(7, col("id")),
        col("g"), col("id"), col("vi"), 7)
      .select(col("g"), col("id"), col("v"), col("rk"))
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got2 === expect)
  }

  test("trendOutliers recovers a planted spike; floor quantization handles negatives") {
    // series on the exact line v = x micro-trend, one planted spike at
    // x=50 and one planted dip at x=75 — the two largest |residuals|
    val ev = ((0L until 100L).map(x => (x, x.toDouble + 100.0)) :+
      (50L, 400.0) :+ (75L, -100.0))
      .zipWithIndex.map { case ((x, v), i) =>
        (i.toLong + 1000, x * 1000000L, v, "s") }
      .toDF("event_id", "ts_us", "value", "event_type")
    val got = Events.trendOutliers(ev, "event_type", "value", "event_id",
        epoch0Sec = 0L, k = 2)
      .orderBy(col("rk"))
      .select(col("x"), col("resid")).as[(Long, Long)].collect()
    assert(got.length === 2)
    // rank 1 = the dip at x=75 (residual ≈ −275 units, the largest
    // magnitude), rank 2 = the spike at x=50 (≈ +250) — sign survives
    // the abs ranking
    assert(got(0)._1 === 75L && got(0)._2 < 0)
    assert(got(1)._1 === 50L && got(1)._2 > 0)
  }

  test("ksDrift: identical samples score 0; disjoint samples score 1e6") {
    def ev(rows: Seq[(String, Double)]) = rows.zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("event_id", "event_type", "value")
    val same = ev((1 to 50).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))))
    val r1 = Events.ksDrift(same, "event_type", "value", "a", "b")
      .select(col("ks_ppm")).as[Long].collect()
    assert(r1.toSeq === Seq(0L))
    val apart = ev((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble + 1000.0)))
    val r2 = Events.ksDrift(apart, "event_type", "value", "a", "b")
      .select(col("ks_ppm"), col("at_bin")).as[(Long, Long)].collect()
    assert(r2.head._1 === 1000000L)
  }

  test("benford: exact ppm shares on a hand fixture, non-positive values dropped") {
    // 30 values with first digits 1×15, 2×9, 3×6 (micro-quantized),
    // plus a zero and a negative that must not count
    val rows = (Seq.fill(15)(1.23) ++ Seq.fill(9)(25.0) ++
      Seq.fill(6)(0.3) ++ Seq(0.0, -5.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, "t", v) }
      .toDF("event_id", "event_type", "value")
    val got = Events.benford(rows, "event_type", "value")
      .select(col("digit"), col("n_obs"), col("obs_ppm"), col("exp_ppm"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1, 15L, 500000L, 301030L),
      (2, 9L, 300000L, 176091L),
      (3, 6L, 200000L, 124939L)))
  }
}
