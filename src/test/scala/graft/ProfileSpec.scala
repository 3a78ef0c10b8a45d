package graft

import graft.operators.Profile

/** tableStats: both execution strategies produce the identical stats
  * table, and the stats are right on a hand-built frame. */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("multi-pass and single-pass tableStats agree; known answers") {
    val df = Seq((1, Option("a")), (2, Option("b")), (2, None), (3, Option("a")))
      .toDF("k", "s")
    val multi = Profile.tableStats(df, Seq("k", "s"))
      .orderBy("column").collect().toSeq
    val single = Profile.tableStats(df, Seq("k", "s"), singlePass = true)
      .orderBy("column").collect().toSeq
    assert(multi === single)
    val k = multi(0)
    assert(k.getString(0) === "k" && k.getLong(1) === 4 && k.getLong(2) === 4 &&
      k.getLong(3) === 3 && k.getString(4) === "1" && k.getString(5) === "3")
    val s = multi(1)
    assert(s.getString(0) === "s" && s.getLong(2) === 3 && s.getLong(3) === 2 &&
      s.getString(4) === "a" && s.getString(5) === "b")
  }

  test("expectations: per-rule violation counts; NULL is a violation; one row per rule") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Option(5), Option(15), Option(25), None).toDF("v")
    val out = Profile.expectations(df, Seq(
        "v_lt_20" -> (col("v") < 20),
        "v_pos" -> (col("v") > 0)))
      .orderBy("rule").collect()
    assert(out.length === 2)
    assert(out(0).getString(0) === "v_lt_20" && out(0).getLong(1) === 4 &&
      out(0).getLong(2) === 2) // 25 fails, NULL counts as violation
    assert(out(1).getString(0) === "v_pos" && out(1).getLong(2) === 1) // NULL only
  }

  test("expectations rejects empty and duplicate rule names") {
    import org.apache.spark.sql.functions.lit
    val df = Seq(1).toDF("v")
    intercept[IllegalArgumentException] { Profile.expectations(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      Profile.expectations(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }

  test("kAnonFilter: rows in cells below k drop; schema preserved; k=1 keeps all") {
    val df = Seq(
      ("a", 1, "r1"), ("a", 1, "r2"), ("a", 1, "r3"), // cell (a,1): n=3
      ("a", 2, "r4"), ("b", 1, "r5"), ("b", 1, "r6")) // (a,2): 1, (b,1): 2
      .toDF("t", "h", "payload")
    val kept = Profile.kAnonFilter(df, Seq("t", "h"), 2)
    assert(kept.columns.toSeq === Seq("t", "h", "payload"))
    assert(kept.select("payload").as[String].collect().sorted.toSeq ===
      Seq("r1", "r2", "r3", "r5", "r6"))
    assert(Profile.kAnonFilter(df, Seq("t", "h"), 1).count() === 6)
    assert(Profile.kAnonFilter(df, Seq("t", "h"), 4).count() === 0)
  }

  test("binaryAuc equals brute-force pair counting on 20 seeded random datasets") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val n = 5 + rnd.nextInt(40)
      // small score domain forces heavy ties — the case the rank-sum
      // half-credit arithmetic must get exactly right
      val data = (1 to n).map(_ => (rnd.nextInt(6).toLong, rnd.nextBoolean()))
      val pos = data.filter(_._2).map(_._1)
      val neg = data.filterNot(_._2).map(_._1)
      val expected =
        if (pos.isEmpty || neg.isEmpty) None
        else {
          val u2 = (for (p <- pos; q <- neg) yield
            if (p > q) 2L else if (p == q) 1L else 0L).sum
          Some(u2 * 1000000L / (2L * pos.size * neg.size))
        }
      val got = Profile.binaryAuc(data.toDF("score", "y"), Seq.empty,
          col("score"), col("y"))
        .select("auc_ppm").as[Option[Long]].head()
      assert(got === expected, s"trial $trial: n=$n pos=${pos.size}")
    }
  }

  test("binaryAuc: separation extremes, ties, one-class NULL, hand case") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      // g=perfect: every positive above every negative → 1e6
      ("perfect", 10L, true), ("perfect", 9L, true),
      ("perfect", 2L, false), ("perfect", 1L, false),
      // g=reversed: every positive below every negative → 0
      ("reversed", 1L, true), ("reversed", 2L, true),
      ("reversed", 9L, false), ("reversed", 10L, false),
      // g=ties: all scores equal → 0.5 exactly
      ("ties", 5L, true), ("ties", 5L, true),
      ("ties", 5L, false), ("ties", 5L, false),
      // g=onecls: no negatives → AUC undefined (NULL)
      ("onecls", 3L, true), ("onecls", 4L, true),
      // g=hand: pos at {3, 1}, neg at {2, 1}:
      // pairs (3>2)=1 (3>1)=1 (1<2)=0 (1=1)=0.5 → 2.5/4 = 0.625
      ("hand", 3L, true), ("hand", 1L, true),
      ("hand", 2L, false), ("hand", 1L, false)
    ).toDF("g", "score", "pos")
    val got = Profile.binaryAuc(df, Seq("g"), col("score"), col("pos"))
      .orderBy("g")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq(
      ("hand", 2L, 2L, Some(625000L)),
      ("onecls", 2L, 0L, None),
      ("perfect", 2L, 2L, Some(1000000L)),
      ("reversed", 2L, 2L, Some(0L)),
      ("ties", 2L, 2L, Some(500000L))))
  }
}
