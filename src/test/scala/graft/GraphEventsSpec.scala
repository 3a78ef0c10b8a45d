package graft

import org.apache.spark.sql.functions._

import graft.operators.{Events, Graph}

/** Triangle enumeration and the event-sequence operators
  * (transitions / sequences) on closed-form fixtures. */
class GraphEventsSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("a", "b")

  test("triangles: K4 has exactly its 4 triangles") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = Graph.triangles(k4).as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: stars and paths are triangle-free") {
    val star = edges((1L to 9L).map(i => (0L, i)): _*)
    val path = edges((1L to 9L).map(i => (i - 1, i)): _*)
    assert(Graph.triangles(star).count() === 0)
    assert(Graph.triangles(path).count() === 0)
  }

  test("triangles match brute force and are partition-invariant") {
    // deterministic sparse-ish graph on 24 nodes
    val pairs = for {
      a <- 0L until 24L; b <- (a + 1) until 24L
      if (a * 7 + b * 11 + a * b) % 5 == 0
    } yield (a, b)
    val expect = (for {
      (a, b) <- pairs; (b2, c) <- pairs if b2 == b
      if pairs.contains((a, c))
    } yield (a, b, c)).toSet
    assert(expect.nonEmpty) // fixture sanity: brute force found triangles
    val e = edges(pairs: _*)
    val got = Graph.triangles(e).as[(Long, Long, Long)].collect().toSet
    assert(got === expect)
    val got7 = Graph.triangles(e.repartition(7)).as[(Long, Long, Long)].collect().toSet
    assert(got7 === expect)
  }

  test("kCore: cycles survive the 2-core peel, pendant tails peel away") {
    // lollipop: triangle 1-2-3 with tail 3-4-5-6; the tail peels one
    // vertex per round, the triangle is the 2-core
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val got = Graph.kCore(g, k = 2, rounds = 3).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 2L), (3L, 2L)))
    // a pure path has an empty 2-core
    val path = edges((1L to 9L).map(i => (i - 1, i)): _*)
    assert(Graph.kCore(path, k = 2, rounds = 5).count() === 0)
  }

  test("kCore: the q_kcore round count reaches the fixed point on the fixture") {
    val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    val e = Graph.coEdges(li, "l_orderkey", "l_partkey", minGroups = 2)
    val r5 = Graph.kCore(e, k = 2, rounds = 5).as[(Long, Long)].collect().toSet
    val r6 = Graph.kCore(e, k = 2, rounds = 6).as[(Long, Long)].collect().toSet
    assert(r5.nonEmpty)
    assert(r5 === r6) // round 6 is a no-op: the entry is the true 2-core
    // convergence-detected variant: a generous cap stops at the same
    // fixed point instead of running all 64 peels
    val conv = Graph.kCore(e, k = 2, rounds = 64, untilConverged = true)
      .as[(Long, Long)].collect().toSet
    assert(conv === r5)
  }

  test("labelPropagation untilConverged equals the fixed-round result at the fixed point") {
    // two triangles bridged by one edge: LPA converges in a few rounds
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val fixedA = Graph.labelPropagation(e, rounds = 6)
      .as[(Long, Long)].collect().toSet
    val fixedB = Graph.labelPropagation(e, rounds = 7)
      .as[(Long, Long)].collect().toSet
    assert(fixedA === fixedB) // round 7 is a no-op: true fixed point
    val conv = Graph.labelPropagation(e, rounds = 64, untilConverged = true)
      .as[(Long, Long)].collect().toSet
    assert(conv === fixedA)
  }

  test("coTriples counts distinct-group support for ordered triples") {
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), // {1,2,3,4}
      (11L, 1L), (11L, 2L), (11L, 3L),            // {1,2,3} -> (1,2,3) sup 2
      (12L, 2L), (12L, 3L), (12L, 4L)             // {2,3,4} -> (2,3,4) sup 2
    ).toDF("g", "item")
    val t1 = graft.operators.Graph.coTriples(df, "g", "item", minGroups = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(t1 === Set((1L, 2L, 3L, 2L), (2L, 3L, 4L, 2L)))
    val t2 = graft.operators.Graph.coTriples(df, "g", "item", minGroups = 1)
      .count()
    assert(t2 === 4) // the 4 distinct triples of group 10 cover groups 11/12's
  }

  test("coTriples Apriori prune answers a planted hub basket exactly") {
    // one 60-item hub basket whose items co-occur nowhere else: every
    // hub pair has support 1 < minGroups=2, so the level-2 prune thins
    // the hub to NOTHING — the C(60,3)=34220 cube (which the guard
    // bound 1000/group would refuse unpruned) never materializes, and
    // the small baskets' exact answer comes through
    val hub = (1 to 60).map(i => (99L, (1000 + i).toLong)) ++
      Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L))
    val df = hub.toDF("g", "item")
    val pruned = graft.operators.Graph.coTriples(df, "g", "item",
      minGroups = 2, maxTriplesPerGroup = 1000)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pruned === Set((1L, 2L, 3L, 2L)))
    // the unpruned route on the same data still refuses — the prune,
    // not the guard bound, is what made the hub tractable
    val e0 = intercept[Throwable] {
      graft.operators.Graph.coTriples(df, "g", "item", minGroups = 2,
        maxTriplesPerGroup = 1000, aprioriPrune = false).count()
    }
    val chain0 = Iterator.iterate(e0)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain0.contains("Apriori"), chain0)
  }

  test("coTriples post-prune guard still refuses the irreducible hub") {
    // minGroups=1 makes EVERY hub pair frequent — the prune keeps the
    // hub whole and the output itself is cubic; the post-prune guard
    // refuses naming that irreducibility (no remedy but capping)
    val hub = (1 to 60).map(i => (99L, i.toLong)) ++
      Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L), (2L, 4L))
    val df = hub.toDF("g", "item")
    // the guard is plan-integrated (assert_true over the broadcast
    // volume row), so the refusal surfaces at the first ACTION
    val e = intercept[Throwable] {
      graft.operators.Graph.coTriples(df, "g", "item", minGroups = 1,
        maxTriplesPerGroup = 1000).count()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("OUTPUT itself is cubic"), chain)
    // Int.MaxValue disables; the small-basket remainder passes the bound
    val small = df.filter($"g" =!= 99L)
    assert(graft.operators.Graph.coTriples(small, "g", "item", minGroups = 1,
      maxTriplesPerGroup = 1000).count() == 2)
  }

  test("coTriples pruned and unpruned routes agree bit-for-bit") {
    // baskets with overlapping structure: monotonicity says the pruned
    // cube loses nothing at the support floor — support values included
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 2L), (12L, 3L), (12L, 4L),
      (13L, 1L), (13L, 2L), (13L, 3L), (13L, 5L),
      (14L, 5L), (14L, 6L)
    ).toDF("g", "item")
    for (mg <- Seq(1, 2, 3)) {
      val p = graft.operators.Graph.coTriples(df, "g", "item", minGroups = mg)
        .as[(Long, Long, Long, Long)].collect().toSet
      val u = graft.operators.Graph.coTriples(df, "g", "item", minGroups = mg,
        aprioriPrune = false).as[(Long, Long, Long, Long)].collect().toSet
      assert(p === u, s"minGroups=$mg")
    }
  }

  test("coEdges thins by distinct-group support") {
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), // group 10: pairs (1,2)(1,3)(2,3)
      (11L, 1L), (11L, 2L),            // (1,2) again -> support 2
      (12L, 1L), (12L, 2L)             // (1,2) a third time
    ).toDF("g", "item")
    val e1 = Graph.coEdges(df, "g", "item", minGroups = 1)
      .as[(Long, Long)].collect().toSet
    val e2 = Graph.coEdges(df, "g", "item", minGroups = 2)
      .as[(Long, Long)].collect().toSet
    assert(e1 === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(e2 === Set((1L, 2L)))
  }

  private def evts(rows: (Long, Long, Long, String)*) = // (event_id, ts_us, user, type)
    rows.toDF("event_id", "ts_us", "user_id", "event_type")

  test("transitions count consecutive pairs per user; p sums to 1 per prev") {
    val e = evts(
      (1L, 100L, 1L, "a"), (2L, 200L, 1L, "b"), (3L, 300L, 1L, "a"),
      (4L, 100L, 2L, "a"), (5L, 200L, 2L, "b"))
    val got = Events.transitions(e)
      .select(col("prev_type"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L), ("b", "a", 1L)))
    val sums = Events.transitions(e).groupBy(col("prev_type"))
      .agg(sum(col("p")).as("s")).as[(String, Double)].collect()
    sums.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-12) }
  }

  test("sequences order by ts then event_id (tie-break) per user") {
    val e = evts(
      (5L, 100L, 1L, "x"), (2L, 100L, 1L, "y"), // ts tie: event_id 2 first
      (9L, 50L, 1L, "z"),
      (1L, 10L, 2L, "a"))
    val got = Events.sequences(e)
      .select(col("user_id"), col("n_events"), col("seq"))
      .as[(Long, Long, String)].collect().map { case (u, n, s) => (u, (n, s)) }.toMap
    assert(got(1L) === ((3L, "z|y|x")))
    assert(got(2L) === ((1L, "a")))
  }

  test("sequences are input-partitioning-invariant") {
    val base = Events.read(spark, sfSmoke)
    val a = Events.sequences(base).orderBy(col("user_id")).collect()
    val b = Events.sequences(base.repartition(13)).orderBy(col("user_id")).collect()
    assert(a.sameElements(b))
  }

  private def nsEvents(rows: (Long, Long, Long, String, Double)*) =
    // (event_id, ts_ns, user_id, type, value) shaped like Events.read output
    rows.toDF("event_id", "ts_ns", "user_id", "event_type", "value")
      .withColumn("ts_us", expr("ts_ns DIV 1000"))

  test("gapFillHourly fills holes with the last observed sum") {
    val h = 3600000000000L // ns per hour
    val e = nsEvents(
      (1L, 0 * h, 1L, "a", 10.0),
      (2L, 0 * h, 1L, "a", 5.0),
      (3L, 3 * h, 1L, "a", 2.0), // hours 1-2 are gaps
      (4L, 1 * h, 1L, "b", 7.0)) // b missing at 0 (before first obs) and 2-3
    val got = Events.gapFillHourly(e)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === Set(
      ("a", 0L, 2L, 15.0), ("a", 1L, 0L, 15.0), ("a", 2L, 0L, 15.0),
      ("a", 3L, 1L, 2.0),
      ("b", 0L, 0L, 0.0), // before b's first observation: zero-filled
      ("b", 1L, 1L, 7.0), ("b", 2L, 0L, 7.0), ("b", 3L, 0L, 7.0)))
  }

  test("retention cohorts count returning users by week offset") {
    val wk = 604800000000000L // ns per week
    val e = nsEvents(
      (1L, 0 * wk, 1L, "x", 0.0), (2L, 1 * wk, 1L, "x", 0.0), // u1: wks 0,1
      (3L, 0 * wk, 2L, "x", 0.0), (4L, 2 * wk, 2L, "x", 0.0), // u2: wks 0,2
      (5L, 1 * wk, 3L, "x", 0.0))                             // u3: wk 1 only
    val got = Events.retention(e)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L)))
  }

  test("neighborAgg: both SAGE layers take exact integer-micro-unit means on a path") {
    // path 1-2-3 with features 10, 20, 40:
    // h1(1)=f(2)=20e6; h1(2)=(10+40)/2=25e6; h1(3)=f(2)=20e6
    // h2(1)=h1(2)=25e6; h2(2)=(h1(1)+h1(3))/2=20e6; h2(3)=h1(2)=25e6
    val feats = Seq((1L, 10L), (2L, 20L), (3L, 40L)).toDF("v", "f")
    val got = Graph.neighborAgg(edges((1L, 2L), (2L, 3L)), feats)
      .orderBy("v").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 10L, 20000000L, 25000000L),
      (2L, 20L, 25000000L, 20000000L),
      (3L, 40L, 20000000L, 25000000L)))
  }

  test("trainingPairs: oldest-first contexts, partial prefixes kept, no empty context") {
    val ev = Seq(
      (1L, 10L, "a", 1L), (2L, 20L, "b", 1L), (3L, 30L, "c", 1L),
      (4L, 40L, "d", 1L), (5L, 50L, "e", 1L),
      (6L, 10L, "x", 2L) // single-event user: no pairs at all
    ).toDF("event_id", "ts_us", "event_type", "user_id")
    val got = Events.trainingPairs(ev, 3)
      .orderBy("user_id", "pos")
      .as[(Long, Int, String, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2, "a", "b"),
      (1L, 3, "a b", "c"),
      (1L, 4, "a b c", "d"),
      (1L, 5, "b c d", "e")))
  }

  test("attribution: last touch wins, touchless purchases unattributed, revenue conserved") {
    val ev = Seq(
      (1L, 1L, 10L, "click", 0.0, "{\"k\": 3}"),
      (2L, 1L, 20L, "click", 0.0, "{\"k\": 7}"),
      (3L, 1L, 30L, "purchase", 5.0, "{\"k\": 0}"),
      (4L, 2L, 5L, "purchase", 2.0, "{\"k\": 0}")
    ).toDF("event_id", "user_id", "ts_us", "event_type", "value", "props")
    val got = Events.attribution(ev, "click", "purchase")
      .orderBy("campaign")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("7", 1L, 5.0), ("unattributed", 1L, 2.0)))
    // fixture-level conservation: the report's revenue total equals the
    // purchase table's, whatever the attribution split
    val fix = Events.read(spark, sfSmoke)
    val rep = Events.attribution(fix, "click", "purchase")
      .agg(sum(col("revenue"))).as[Double].head()
    val direct = fix.filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(20,6)")).cast("double"))
      .as[Double].head()
    assert(math.abs(rep - direct) < 1e-6, s"$rep vs $direct")
  }

  test("scd2: runs collapse null-safely, intervals abut, current run open") {
    // user 1: A A B B A (runs A[10,30) B[30,50) A[50,∞));
    // user 2: null null C (null IS a run: null[5,25) C[25,∞))
    val log = Seq(
      (1L, Option("A"), 10L, 100L), (1L, Option("A"), 20L, 101L),
      (1L, Option("B"), 30L, 102L), (1L, Option("B"), 40L, 103L),
      (1L, Option("A"), 50L, 104L),
      (2L, Option.empty[String], 5L, 200L), (2L, Option.empty[String], 15L, 201L),
      (2L, Option("C"), 25L, 202L)
    ).toDF("user_id", "v", "ts_us", "event_id")
    val got = Events.scd2(log, "user_id", "v", "ts_us", "event_id")
      .orderBy("user_id", "valid_from_us")
      .as[(Long, Option[String], Long, Option[Long], Long)].collect().toSeq
    assert(got === Seq(
      (1L, Some("A"), 10L, Some(30L), 100L),
      (1L, Some("B"), 30L, Some(50L), 102L),
      (1L, Some("A"), 50L, None, 104L),
      (2L, None, 5L, Some(25L), 200L),
      (2L, Some("C"), 25L, None, 202L)))
    // equal-timestamp changes collapse to the LAST (max id): no
    // zero-width [t, t) interval, the state at t is the final value
    val ties = Seq(
      (7L, Option("A"), 10L, 300L), (7L, Option("B"), 10L, 301L),
      (7L, Option("C"), 20L, 302L)
    ).toDF("user_id", "v", "ts_us", "event_id")
    val tied = Events.scd2(ties, "user_id", "v", "ts_us", "event_id")
      .orderBy("valid_from_us")
      .as[(Long, Option[String], Long, Option[Long], Long)].collect().toSeq
    assert(tied === Seq(
      (7L, Some("B"), 10L, Some(20L), 301L),
      (7L, Some("C"), 20L, None, 302L)))
    // reconstruction: as-of lookup at every source event's ts returns
    // that event's value (intervals partition the timeline per key)
    val hist = Events.scd2(log, "user_id", "v", "ts_us", "event_id")
    val back = log.as("e").join(hist.as("h"),
        col("e.user_id") === col("h.user_id") &&
          col("h.valid_from_us") <= col("e.ts_us") &&
          (col("h.valid_to_us").isNull || col("e.ts_us") < col("h.valid_to_us")))
    assert(back.count() === log.count())
    assert(back.filter(!(col("e.v") <=> col("h.value"))).isEmpty)
  }

  test("hits: integer rounds match a plain-Scala replay; max node scores 1e6") {
    // bipartite: customers 0,2,4 → suppliers 1,3; 0 buys from both,
    // 2 and 4 only from 1 — supplier 1 is the authority, 0 the hub
    val e = Seq((0L, 1L), (0L, 3L), (2L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.hits(e, 2).as[(String, Long, Long)].collect()
      .map { case (s, n, v) => (s, n) -> v }.toMap
    // replay the exact integer iteration
    val edges = Seq((0L, 1L), (0L, 3L), (2L, 1L), (4L, 1L))
    var h = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val ar = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => h(x._1)).sum }
      val amx = ar.values.max
      a = ar.map { case (k, v) => k -> (v * 1000000L) / amx }
      val hr = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(x => a(x._2)).sum }
      val hmx = hr.values.max
      h = hr.map { case (k, v) => k -> (v * 1000000L) / hmx }
    }
    assert(got === (h.map { case (k, v) => ("hub", k) -> v } ++
      a.map { case (k, v) => ("authority", k) -> v }))
    assert(got(("authority", 1L)) === 1000000L)
    assert(got(("hub", 0L)) === 1000000L)
    assert(got(("authority", 3L)) < got(("authority", 1L)))
  }

  test("linearTrend: exact rational slope/intercept on a perfect line") {
    // v = 2·x + 1 at x ∈ {0,1,2,3} seconds past epoch0 → slope 2e6
    // micro-units/sec, intercept-at-epoch0 1e6 micro-units, EXACTLY
    val epoch0 = 1000L
    val ev = Seq((0L, 1.0), (1L, 3.0), (2L, 5.0), (3L, 7.0))
      .toDF("xoff", "value")
      .select(((col("xoff") + epoch0) * 1000000L).as("ts_us"),
        col("value"), lit("m").as("g"))
    val r = Events.linearTrend(ev, "g", "value", epoch0)
      .as[(String, Long, String, String, String)].collect().head
    val (_, n, sn, sd, in) = r
    assert(n === 4L)
    assert(BigInt(sn) === BigInt(sd) * 2000000L) // slope = 2e6/1
    assert(BigInt(in) === BigInt(sd) * 1000000L) // icept = 1e6/1
  }

  test("kmSurvival: risk sets, censoring, and S=0 tail match hand computation") {
    // 3 users event at day 0,1,1; 1 censored at day 2; 1 event day 3
    // at_risk: d0=5, d1=4, d2=2(cens), d3=1 → S hits 0 at d3 → NULL
    def u(id: Long, days: Seq[(Long, Double)]) =
      days.map { case (d, v) => (id, d * 86400000000L, v) }
    val ev = (u(1, Seq((0L, 200.0))) ++                     // event day 0
      u(2, Seq((0L, 1.0), (1L, 200.0))) ++                  // event day 1
      u(3, Seq((0L, 1.0), (1L, 200.0))) ++                  // event day 1
      u(4, Seq((0L, 1.0), (2L, 1.0))) ++                    // censored day 2
      u(5, Seq((0L, 1.0), (3L, 200.0))))                    // event day 3
      .toDF("user_id", "ts_us", "value")
    val got = Events.kmSurvival(ev, col("value") > 150.0)
      .orderBy("day")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    def l6(num: Long, den: Long): BigDecimal = BigDecimal(
      (math.log(num.toDouble / den.toDouble) * 1e6).round, 6)
    val s1 = l6(4, 5); val s2 = s1 + l6(2, 4)
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ===
      Seq((0L, 1L, 0L, 5L), (1L, 2L, 0L, 4L), (2L, 0L, 1L, 2L),
        (3L, 1L, 0L, 1L)))
    assert(got(0)._5 === Some(s1.toDouble))
    assert(got(1)._5 === Some(s2.toDouble))
    assert(got(2)._5 === Some(s2.toDouble)) // censor-only day: flat
    assert(got(3)._5 === None)              // risk set exhausted: S=0
  }

  test("chi2Terms: perfect association scores N, universal terms excluded") {
    val docs = ((0 until 10).map(i => (i.toLong, "A", "zebra common")) ++
      (10 until 20).map(i => (i.toLong, "B", "yak common")))
      .toDF("doc_id", "lang", "text")
    val got = graft.operators.TextAnalysis
      .chi2Terms(docs, "text", "lang", "doc_id", minDf = 5,
        thresholdPpm = 3841459L)
      .as[(String, String, Long, Long)].collect().toSet
    // χ² for a perfectly separating term on a balanced 2-label corpus
    // is exactly N = 20 → 20e6 ppm; 'common' (ta = n) must be excluded
    // rather than divide by zero
    assert(got === Set(("A", "zebra", 10L, 20000000L),
      ("B", "yak", 10L, 20000000L)))
  }
}
