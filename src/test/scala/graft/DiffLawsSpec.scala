package graft

import org.apache.spark.sql.functions._

import graft.operators.Diff
import graft.sources.KVSnapshot

/** Diff algebraic laws (SURVEY §5): self-diff is empty; the
  * classification partitions the key universe; symdiff is consistent
  * with the join diff. */
class DiffLawsSpec extends SparkTestBase {

  private lazy val src = KVSnapshot.src(spark, sfSmoke)
  private lazy val dst = KVSnapshot.dst(spark, sfSmoke)

  test("diff(x, x) = ∅ and symmetricDiff(x, x) = ∅") {
    assert(Diff.diff(src, src).count() === 0L)
    assert(Diff.symmetricDiff(src, src).count() === 0L)
  }

  test("diff classification partitions the key universe") {
    val classes = Diff.diff(src, dst)
      .groupBy(col("diff_class")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcOnly = classes.getOrElse("src_only", 0L)
    val dstOnly = classes.getOrElse("dst_only", 0L)
    val mismatch = classes.getOrElse("mismatch", 0L)
    val nSrc = src.count()
    val nDst = dst.count()
    val nAllKeys = src.select("key").union(dst.select("key")).distinct().count()
    // equal keys = those in both with same value; universe identity:
    // |keys| = equal + mismatch + srcOnly + dstOnly
    val equal = nSrc - srcOnly - mismatch
    assert(nAllKeys === equal + mismatch + srcOnly + dstOnly)
    // the fixture plants all three divergence classes
    assert(srcOnly > 0 && dstOnly > 0 && mismatch > 0)
    // anti-join formulation agrees with the classified full-outer join
    assert(Diff.srcOnly(src, dst).count() === srcOnly)
  }

  test("checksum-pruned diff equals the full join diff") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Array[Byte]]("key").toSeq,
        Option(r.getAs[Array[Byte]]("src_value")).map(_.toSeq),
        Option(r.getAs[Array[Byte]]("dst_value")).map(_.toSeq),
        r.getAs[String]("diff_class"))).toSet
    val full = rows(Diff.diff(src, dst))
    // enough buckets that pruning is non-trivial, few enough that some
    // bucket holds multiple fixture rows
    val pruned = rows(Diff.checksumPrunedDiff(src, dst, buckets = 64))
    assert(pruned === full)
    assert(pruned.nonEmpty)
  }

  test("checksum-pruned self-diff prunes everything and is empty") {
    // identical sides → every bucket digest matches → both pruned scans
    // are empty before the join even runs (the 100 TB fast path)
    assert(Diff.checksumPrunedDiff(src, src).count() === 0L)
  }

  test("checksum-pruned diff stays exact on null keys and values") {
    import spark.implicits._
    // null-key/value rows carry no crc64 digest, so bucket pruning can't
    // see them — they must reach the diff unconditionally, once
    val srcN = Seq((Option("k1"), Option("v1")), (Option.empty[String], Option("vx")),
      (Option("k2"), Option.empty[String])).toDF("key", "value")
    val dstN = Seq((Option("k1"), Option("v1"))).toDF("key", "value")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        Option(r.getString(2)), r.getString(3))).toSeq.sortBy(_.toString)
    assert(rows(Diff.checksumPrunedDiff(srcN, dstN, buckets = 8)) ===
      rows(Diff.diff(srcN, dstN)))
  }

  test("checksum-pruned diff catches a single mutated value") {
    import spark.implicits._
    val base = (1 to 1000).map(i => (s"k$i", s"v$i")).toDF("key", "value")
    val mut = (1 to 1000).map(i => (s"k$i", if (i == 617) "CHANGED" else s"v$i"))
      .toDF("key", "value")
    val out = Diff.checksumPrunedDiff(base, mut, buckets = 16)
      .collect().map(r => (r.getString(0), r.getString(3)))
    assert(out.toSeq === Seq(("k617", "mismatch")))
  }

  test("diff over key-bucketed snapshots plans no shuffle (the co-located 100 TB layout)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val bt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      KVSnapshot.srcStr(spark, sfSmoke).toDF("key", "value").write.mode("overwrite")
        .bucketBy(8, "key").saveAsTable("kv_src_bucketed")
      KVSnapshot.dstStr(spark, sfSmoke).toDF("key", "value").write.mode("overwrite")
        .bucketBy(8, "key").saveAsTable("kv_dst_bucketed")
      val d = Diff.diff(spark.table("kv_src_bucketed"), spark.table("kv_dst_bucketed"))
      val shuffles = d.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed diff should be shuffle-free:\n${d.queryExecution.executedPlan}")
      // and it still classifies identically to the unbucketed diff
      val bucketed = d.collect().map(r => (r.getString(0), r.getString(3))).toSet
      val plain = Diff.diff(KVSnapshot.srcStr(spark, sfSmoke).toDF("key", "value"),
          KVSnapshot.dstStr(spark, sfSmoke).toDF("key", "value"))
        .collect().map(r => (r.getString(0), r.getString(3))).toSet
      assert(bucketed === plain && bucketed.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bt)
      spark.sql("DROP TABLE IF EXISTS kv_src_bucketed")
      spark.sql("DROP TABLE IF EXISTS kv_dst_bucketed")
    }
  }

  test("typed cogroup diff classifies identically to the join diff") {
    import spark.implicits._
    import graft.functions.KVPair
    import graft.operators.TypedDiff
    val srcDs = src.as[(Array[Byte], Array[Byte])].map(t => KVPair(t._1, t._2))
    val dstDs = dst.as[(Array[Byte], Array[Byte])].map(t => KVPair(t._1, t._2))
    val typed = TypedDiff.cogroupDiff(srcDs, dstDs)
      .collect().map(r => (r.key.toSeq, r.diff_class)).toSet
    val joined = Diff.diff(src, dst)
      .collect().map(r => (r.getAs[Array[Byte]]("key").toSeq,
        r.getAs[String]("diff_class"))).toSet
    assert(typed === joined)
    assert(typed.nonEmpty)
  }

  test("symmetric difference counts = 2·mismatch + src_only + dst_only") {
    val classes = Diff.diff(src, dst)
      .groupBy(col("diff_class")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sym = Diff.symmetricDiff(src, dst).count()
    assert(sym === 2 * classes("mismatch") + classes("src_only") + classes("dst_only"))
  }

  test("one-pass symmetric difference equals the set-ops formulation") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("key").cast("string"), col("value").cast("string"), col("side"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    val onePass = rows(Diff.symmetricDiff(src, dst))
    val setOps = rows(Diff.symmetricDiffSetOps(src, dst))
    assert(onePass === setOps)
    assert(onePass.nonEmpty)
  }

  test("merge inverse identity: applyChangelog(src, diff(src,dst)) = dst") {
    import spark.implicits._
    val merged = Diff.applyChangelog(src,
      Diff.diffAsChangelog(Diff.diff(src, dst)))
    // exact equality both directions
    assert(merged.exceptAll(dst).isEmpty && dst.exceptAll(merged).isEmpty)
    assert(merged.count() === dst.count())
    // last-writer-wins and delete semantics on a hand-built changelog
    val base = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("key", "value")
    val log = Seq(
      ("a", "10", 1L, "U"), ("a", "11", 2L, "U"),   // two updates: seq 2 wins
      ("b", null.asInstanceOf[String], 1L, "D"),    // delete b
      ("d", "4", 1L, "U"))                          // insert d
      .toDF("key", "value", "seq", "op")
    val got = Diff.applyChangelog(base, log)
      .as[(String, String)].collect().sorted.toSeq
    assert(got === Seq(("a", "11"), ("c", "3"), ("d", "4")))
  }

  test("IVM identity: maintainAgg(src, diff) = direct aggregate of dst") {
    def direct(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(substring(col("key"), 1, 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("value"))).as("bytes"))
    val maintained = Diff.maintainAgg(src, Diff.diff(src, dst),
      k => substring(k, 1, 10))
    val want = direct(dst)
    assert(maintained.exceptAll(want).isEmpty && want.exceptAll(maintained).isEmpty)
    assert(maintained.count() > 0)
    // a fully-deleted bucket must vanish from the maintained summary
    import spark.implicits._
    val b = Seq(("aaaa_k1", "x"), ("aaaa_k2", "yy"), ("bbbb_k1", "z"))
      .toDF("key", "value")
    val d2 = Seq(("bbbb_k1", "z")).toDF("key", "value")
    val m2 = Diff.maintainAgg(b, Diff.diff(b, d2), k => substring(k, 1, 4))
      .as[(String, Long, Long)].collect().toSet
    assert(m2 === Set(("bbbb", 1L, 1L)))
  }

  test("IVM join delta rule on true bags: multiplicities add, n<=0 rows vanish") {
    import spark.implicits._
    // R is a BAG: key 1 appears twice with the same payload (n folds to
    // 2 in the view); deltas delete one copy and insert a new S-side
    // match — the mixed old/new rule must account exactly
    val rOld = Seq((1L, "r1"), (1L, "r1"), (2L, "r2"), (3L, "r3"))
      .toDF("k", "rv")
    val sOld = Seq((1L, "s1"), (2L, "s2"), (4L, "s4")).toDF("k", "sv")
    // ΔR: remove ONE copy of (1, r1); remove (2, r2); insert (4, r4)
    val dR = Seq((1L, "r1", -1L), (2L, "r2", -1L), (4L, "r4", 1L))
      .toDF("k", "rv", "m")
    // ΔS: delete customer 2 (its R row is also going — both deltas hit)
    val dS = Seq((2L, "s2", -1L)).toDF("k", "sv", "m")
    val sNew = Seq((1L, "s1"), (4L, "s4")).toDF("k", "sv")
    val vOld = rOld.join(sOld, "k").withColumn("n", lit(1L))
      .groupBy(col("k"), col("rv"), col("sv")).agg(sum(col("n")).as("n"))
    val got = Diff.maintainJoin(vOld, rOld, dR, sNew, dS, "k")
      .as[(Long, String, String, Long)].collect().toSet
    // direct recompute of R_new ⋈ S_new:
    //   R_new = {(1,r1)×1, (3,r3), (4,r4)}, S_new = {(1,s1), (4,s4)}
    assert(got === Set((1L, "r1", "s1", 1L), (4L, "r4", "s4", 1L)))
    // subtlety pinned: (2, r2, s2) must reach n = 1 − 1 (ΔR⋈S_new gives
    // 0: s2 is gone from S_new) − 1 (R_old⋈ΔS) + ... = exactly 0 via
    // vOld(1) + dvS(−1); a naive ΔR⋈S_old formulation would have
    // double-subtracted it to −1 and a missing-term one left it at +1
  }
}
