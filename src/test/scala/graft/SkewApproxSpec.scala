package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted-join equivalence + HLL approx-distinct sanity. */
class SkewApproxSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under a hot key") {
    // one hot key (90% of left rows) + a long tail
    val left = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "lv")
    val right = (Seq(("hot", 1), ("hot", 2)) ++ (1 to 100).map(i => (s"k$i", i * 10)))
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    // threshold 500: the planted key (900 rows) routes through the salted
    // path, the tail (1 row each) through the plain path
    val salted = Skew.saltedJoin(left, right, "k", 8, hotThreshold = 500L)
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    assert(salted === plain)
    assert(plain.length === 900 * 2 + 100)
    // threshold above every count: pure plain path, same rows
    val unsalted = Skew.saltedJoin(left, right, "k", 8, hotThreshold = 10000L)
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    assert(unsalted === plain)
  }

  test("hot-key detection finds exactly the planted key, full or sampled") {
    val left = ((1 to 5000).map(i => ("hot", i)) ++ (1 to 200).map(i => (s"k$i", i)))
      .toDF("k", "lv")
    assert(Skew.hotKeys(left, "k", 1000L).as[String].collect().toSeq === Seq("hot"))
    assert(Skew.hotKeys(left, "k", 10000L).isEmpty)
    // sampled estimation: 5000-row key vs threshold 1000 at 10% sampling
    // (expected 500 sampled rows vs scaled threshold 100 — far from the
    // noise floor, deterministic seed)
    assert(Skew.hotKeys(left, "k", 1000L, sampleFraction = 0.1)
      .as[String].collect().toSeq === Seq("hot"))
  }

  test("salted join with an explicit hot-key list equals the plain join") {
    val left = ((1 to 300).map(i => ("hot", i)) ++ (1 to 50).map(i => (s"k$i", i)))
      .toDF("k", "lv")
    val right = (Seq(("hot", 7)) ++ (1 to 50).map(i => (s"k$i", i * 10))).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", 4, Seq("hot").toDF("k"))
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("skewProfile: planted 90% key gets share and ceil salt; nulls surface as <null>") {
    import spark.implicits._
    // 90 rows of 'hot', 9 of 'warm', 1 null
    val df = (Seq.fill(90)(Some("hot")) ++ Seq.fill(9)(Some("warm")) ++ Seq(None))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val r = Skew.skewProfile(df, "k", topK = 2, partitions = 32)
      .as[(String, Long, Long, Long)].collect().toSeq
    // hot: 900000 ppm, salt = ceil(90*32/100) = 29; warm drops nothing
    // but ranks second with salt ceil(9*32/100) = 3
    assert(r === Seq(("hot", 90L, 900000L, 29L), ("warm", 9L, 90000L, 3L)))
    val all = Skew.skewProfile(df, "k", topK = 10, partitions = 32)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(all.map(_._1) === Seq("hot", "warm", "<null>"))
    assert(all.last === (("<null>", 1L, 10000L, 1L)))
  }

  test("joinHotspots: exact per-key products, null keys excluded, estimate equals real join size") {
    import spark.implicits._
    val l = (Seq.fill(6)(Some("a")) ++ Seq.fill(2)(Some("b")) ++ Seq(None))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val r = (Seq.fill(4)(Some("a")) ++ Seq.fill(5)(Some("c")) ++ Seq(None))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val hs = Skew.joinHotspots(l, r, "k")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // only 'a' matches: 6·4 = 24 rows, 100% of the output; b/c/null gone
    assert(hs === Seq(("a", 6L, 4L, 24L, 1000000L)))
    assert(hs.head._4 === l.join(r, Seq("k")).count())
  }

  test("joinHotspots law: total estimated volume equals the real join's row count on seeded random frames") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val l = (0 until 500).map(i => (i.toLong, s"k${rnd.nextInt(23)}")).toDF("id", "k")
    val r = (0 until 300).map(i => (i.toLong, s"k${rnd.nextInt(31)}")).toDF("id", "k")
    val est = Skew.joinHotspots(l, r, "k", topK = 1000)
      .agg(sum(col("out_rows"))).as[Long].head()
    assert(est === l.join(r, Seq("k")).count())
  }

  test("approx_percentile tracks exact percentiles within 5% of the value range") {
    val ev = graft.operators.Events.read(spark, sfSmoke)
    val r = ev.agg(
        expr("percentile(value, 0.5D)"),
        expr("approx_percentile(value, 0.5D, 1000)"),
        min(col("value")), max(col("value")))
      .as[(Double, Double, Double, Double)].head()
    val (exact, approx, lo, hi) = r
    assert(math.abs(approx - exact) <= (hi - lo) * 0.05,
      s"approx=$approx exact=$exact range=${hi - lo}")
  }

  test("approx_count_distinct tracks the exact distinct count within 5%") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val (exact, approx) = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(count_distinct(col("t")), approx_count_distinct(col("t")))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }
}
