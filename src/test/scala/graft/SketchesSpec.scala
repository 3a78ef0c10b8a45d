package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Sketches}

/** Sketch operators: KMV distinct estimation, count-min heavy hitters,
  * Bloom-filtered join, priority sampling, and integer PageRank. Each
  * test pins determinism (partitioning invariance) plus the sketch's
  * defining guarantee (KMV accuracy, CMS over-count-only, Bloom
  * no-false-negative, sample = exact top-k by priority, PageRank mass
  * conservation). */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("KMV estimate is partitioning-invariant and within 20% of true NDV") {
    val n = 5000
    val df = (1 to 20000).map(i => i % n).toDF("key")
    val est = Sketches.kmvDistinct(df, col("key"), 256)
      .select("est_ndv").as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.2, s"est=$est true=$n")
    // same rows, different partitioning → identical sketch result
    // (the per-partition bounded pass only changes which partials
    // exist, not the global k smallest distinct hashes)
    val est2 = Sketches.kmvDistinct(df.repartition(13), col("key"), 256)
      .select("est_ndv").as[Long].head()
    assert(est2 === est)
  }

  test("grouped KMV estimates per-group NDV within 3σ and is partitioning-invariant") {
    val rows = (1 to 20000).map(i => ("a", i % 3000)) ++
      (1 to 5000).map(i => ("b", i % 400))
    val df = rows.toDF("g", "key")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvDistinctBy(d, col("g"), col("key"), 64)
        .select("g", "est_ndv").as[(String, Long)].collect().toMap
    val est = run(df)
    // KMV relative sd ≈ 1/√(k−2) ≈ 12.7%; 3σ ≈ 40%
    assert(math.abs(est("a") - 3000.0) / 3000 < 0.4, est("a"))
    assert(math.abs(est("b") - 400.0) / 400 < 0.4, est("b"))
    assert(run(df.repartition(13)) === est)
  }

  test("KMV with NDV below k returns the exact distinct count") {
    val df = (1 to 1000).map(i => i % 40).toDF("key")
    val r = Sketches.kmvDistinct(df, col("key"), 256)
      .select("k_used", "est_ndv").as[(Long, Long)].head()
    assert(r === ((40L, 40L)))
  }

  test("KMV set ops estimate union/intersection within the k error bound; exact below k") {
    // A = 0..5999, B = 3000..8999: |A∪B| = 9000, |A∩B| = 3000
    val a = spark.range(0, 6000).toDF("key")
    val b = spark.range(3000, 9000).toDF("key")
    val r = Sketches.kmvSetOps(a, col("key"), b, col("key"), 256)
      .select("k_used", "n_both", "est_union", "est_intersect")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 === 256L)
    assert(math.abs(r._3 - 9000).toDouble / 9000 < 0.2, s"union est ${r._3}")
    assert(math.abs(r._4 - 3000).toDouble / 3000 < 0.35, s"intersect est ${r._4}")
    // partitioning-invariant (the sketches are global k-min sets)
    val r2 = Sketches.kmvSetOps(a.repartition(7), col("key"),
        b.repartition(5), col("key"), 256)
      .select("k_used", "n_both", "est_union", "est_intersect")
      .as[(Long, Long, Long, Long)].head()
    assert(r2 === r)
    // union smaller than k: both estimates collapse to exact counts
    val sa = spark.range(0, 100).toDF("key")
    val sb = spark.range(60, 160).toDF("key")
    val ex = Sketches.kmvSetOps(sa, col("key"), sb, col("key"), 256)
      .select("k_used", "n_both", "est_union", "est_intersect")
      .as[(Long, Long, Long, Long)].head()
    assert(ex === ((160L, 40L, 160L, 40L)))
  }

  test("count-min estimates are >= exact and tight for a planted heavy hitter") {
    // one token at 5000 occurrences + 2000 singletons: the heavy
    // hitter's relative error is bounded by the tail mass per bucket
    val items = (Seq.fill(5000)("heavy") ++ (1 to 2000).map(i => s"rare$i"))
      .toDF("item")
    val hh = Sketches.cmsHeavyHitters(items, col("item"), d = 4, w = 1024, topK = 5)
      .as[(String, Long, Long)].collect()
    assert(hh.head._1 === "heavy")
    hh.foreach { case (it, exact, est) =>
      assert(est >= exact, s"$it: CMS must never under-count")
    }
    val (_, exact, est) = hh.head
    assert(exact === 5000L)
    // tail mass 2000 over 1024 buckets ≈ 2/bucket; min over 4 rows
    // stays far under +1% of a 5000-count item
    assert(est - exact <= 50, s"heavy hitter over-count $est vs $exact")
  }

  test("Bloom-filtered join returns exactly the plain join's rows") {
    val fact = (1 to 5000).map(i => (i % 500, i)).toDF("fk", "payload")
    val dim = (0 until 500 by 25).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name").as[(Int, Int, String)].collect().sorted.toSeq
    val bloomed = Sketches.bloomFilteredJoin(fact, "fk", dim, "dk")
      .select("fk", "payload", "name").as[(Int, Int, String)].collect().sorted.toSeq
    assert(bloomed === plain)
    assert(plain.nonEmpty)
  }

  test("hllOverlap: inclusion-exclusion tracks the exact overlap; unions commute with sharding") {
    val rows =
      (1 to 3000).map(i => ("a", s"k$i")) ++
      (2001 to 5000).map(i => ("b", s"k$i")) ++   // |a∩b| = 1000
      (1 to 500).map(i => ("c", s"z$i"))           // disjoint from both
    val df = rows.toDF("g", "t")
    val got = Sketches.hllOverlap(df, col("g"), col("t"))
      .orderBy("ga", "gb")
      .as[(String, String, Double, Double, Double, Double, Long)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2)) === Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = got.head
    assert(ab._7 === 1000L, "exact twin")
    // p=10 standard error ~3.25%; inclusion-exclusion compounds three
    // estimates — allow 15% of the union's scale
    assert(math.abs(ab._6 - 1000.0) < 750.0, ab.toString)
    // disjoint pairs: estimate near zero relative to set sizes
    got.tail.foreach(r => assert(r._7 === 0L && math.abs(r._6) < 500.0, r.toString))
    // partitioning invariance: the register max-merge is order-free
    val re = Sketches.hllOverlap(df.repartition(13), col("g"), col("t"))
      .orderBy("ga", "gb")
      .as[(String, String, Double, Double, Double, Double, Long)]
      .collect().toSeq
    assert(re === got)
  }

  test("Bloom join equals the plain join at ANY FPP (tiny bitmap included)") {
    val fact = (1 to 5000).map(i => (i % 500, i)).toDF("fk", "payload")
    val dim = (0 until 500 by 25).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name").as[(Int, Int, String)].collect().sorted.toSeq
    // m=64 with 20 keys × 3 hashes ≈ saturated bitmap → FPP near 1:
    // correctness must not depend on bitmap sizing, only cost does
    for ((m, k) <- Seq((64, 3), (128, 1), (8192, 5))) {
      val got = Sketches.bloomFilteredJoin(fact, "fk", dim, "dk", m, k)
        .select("fk", "payload", "name").as[(Int, Int, String)].collect().sorted.toSeq
      assert(got === plain, s"m=$m k=$k")
    }
  }

  test("distributed bitmap build equals the naive driver OR-fold; params honor the FPP contract") {
    val dim = (1 to 400).map(k => (s"key$k", k)).toDF("dk", "x")
    val m = 2048; val k = 3
    val agged = Sketches.bloomBits(dim, col("dk"), m, k)
    val naive = {
      val pos = dim.select(explode(array((0 until k).map(j =>
          pmod(graft.operators.Dedup.md5Hash60(concat(lit(s"bloom${j}_"), col("dk"))),
            lit(m.toLong))): _*)).as("p"))
        .as[Long].collect()
      val bits = new Array[Long](m / 64)
      pos.foreach(p => bits((p / 64).toInt) |= 1L << (p % 64))
      bits
    }
    assert(agged.toSeq === naive.toSeq)
    // partitioning invariance: the OR-monoid merge is order-free
    assert(Sketches.bloomBits(dim.repartition(7), col("dk"), m, k).toSeq
      === agged.toSeq)
    val (m2, k2) = Sketches.bloomParams(1000000, 0.01)
    assert(m2 % 64 === 0 && Sketches.bloomFpp(1000000, m2, k2) <= 0.011,
      s"m=$m2 k=$k2 fpp=${Sketches.bloomFpp(1000000, m2, k2)}")
  }

  test("Bloom pre-filter actually prunes non-matching rows") {
    val dim = (1 to 20).map(k => (k, k)).toDF("dk", "x")
    val bits = Sketches.bloomBits(dim, col("dk"), 8192, 3)
    val fact = (1 to 10000).map(i => i).toDF("fk")
    val kept = fact.filter(Sketches.bloomMightContain(bits, col("fk"), 8192, 3))
      .count()
    // all 20 members kept (no false negatives); false-positive rate at
    // 60 set bits / 8192 is ~(60/8192)^3 ≈ 4e-7 — essentially none of
    // the 9980 non-members survive
    assert(kept >= 20 && kept <= 25, s"kept=$kept")
  }

  test("priority sample equals the brute-force top-k by priority and is weight-biased") {
    val rows = (1 to 2000).map(i => (i.toLong, (i % 100 + 1) * 100L))
    val df = rows.toDF("id", "w")
    val got = Sketches.prioritySample(df, "id", col("w"), 100)
      .select("id", "w", "priority").as[(Long, Long, Long)].collect().toSeq
    // brute force in Scala with the same arithmetic
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val brute = rows.map { case (id, w) =>
      val p = (w * 1048576L) / ((h60(s"ps_$id") / 1099511627776L) + 1L)
      (id, w, p)
    }.sortBy { case (id, _, p) => (-p, id) }.take(100)
    assert(got === brute)
    // weight bias: size-biased sampling pulls the mean toward
    // E[w²]/E[w] ≈ 6700 for these weights (population mean 5050)
    val meanSample = got.map(_._2).sum.toDouble / got.size
    val meanPop = rows.map(_._2).sum.toDouble / rows.size
    assert(meanSample > meanPop * 1.2, s"sample mean $meanSample vs pop $meanPop")
  }

  test("grouped priority sample: n per group, partition-invariant, equals per-group brute force") {
    val rows = (1L to 3000L).map(i => (if (i % 3 == 0) "a" else "b", i, 1L + i % 97))
    val df = rows.toDF("g", "key", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.groupedPrioritySample(d, col("g"), "key", col("w"), 15)
        .select("g", "id", "w", "p", "rk")
        .as[(String, Long, Long, Long, Int)].collect().toSet
    val got = run(df.repartition(3))
    assert(got === run(df.repartition(11))) // bounded-heap phase is layout-blind
    assert(got.count(_._1 == "a") === 15 && got.count(_._1 == "b") === 15)
    // equals the unreduced per-group top-n (priority desc, key asc)
    def h60(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val brute = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map { case (_, k, w) =>
        (g, k, w, (w * 1048576L) / ((h60(s"ps_$k") / 1099511627776L) + 1L))
      }.sortBy(t => (-t._4, t._2)).take(15).zipWithIndex
        .map { case ((gg, k, w, p), i) => (gg, k, w, p, i + 1) }
    }.toSet
    assert(got === brute)
  }

  test("grouped priority sample keeps duplicate (key, weight) rows — multiset, layout-blind") {
    // two identical copies of the best row must BOTH survive with n=2,
    // whether they share a partition or not (a set-semantics phase 1
    // would collapse colocated copies and diverge from the window form)
    val rows = Seq(("a", 5L, 1000L), ("a", 5L, 1000L), ("a", 7L, 1L), ("a", 9L, 1L))
    def run(parts: Int) =
      Sketches.groupedPrioritySample(
          rows.toDF("g", "key", "w").repartition(parts), col("g"), "key", col("w"), 2)
        .select("id", "rk").as[(Long, Int)].collect().toSet
    assert(run(1) === Set((5L, 1), (5L, 2)))
    assert(run(4) === Set((5L, 1), (5L, 2)))
    // non-integral keys are a contract violation, not silent aliasing
    intercept[IllegalArgumentException] {
      Sketches.groupedPrioritySample(
        Seq(("a", 1.5, 1L)).toDF("g", "key", "w"), col("g"), "key", col("w"), 1)
    }
  }

  test("PageRank conserves rank mass, favors hubs, and is partitioning-invariant") {
    // star graph: hub connected to 10 spokes (symmetrized) + a 2-cycle
    val raw = ((1 to 10).map(i => ("hub", s"s$i")) ++ Seq(("a", "b"))).toDF("a", "b")
    val edges = raw.select(col("a").as("src"), col("b").as("dst"))
      .union(raw.select(col("b").as("src"), col("a").as("dst")))
    val r = Graph.pageRank(edges, 3).as[(String, Long)].collect().toMap
    assert(r.size === 13)
    // hub holds the largest rank; spokes all equal by symmetry
    assert(r("hub") === r.values.max)
    assert((1 to 10).map(i => r(s"s$i")).distinct.size === 1)
    // integer damping loses mass only to truncation: within 13 nodes *
    // (100 micro-units/node slack per round * 3 rounds)
    val mass = r.values.sum
    assert(mass <= 13000000L && mass > 13000000L - 13 * 300L, s"mass=$mass")
    val r2 = Graph.pageRank(edges.repartition(7), 3).as[(String, Long)].collect().toMap
    assert(r2 === r)
  }

  test("PageRank redistributes dangling mass on a directed graph with a sink") {
    // 1→2, 1→3, 2→3: node 3 is a sink. Hand-computed round 1 with
    // dm = 1e6 (node 3's initial rank), share = dm div 3 = 333333:
    //   r(1) = 150000 + 85·(0       + 333333) div 100 =  433333
    //   r(2) = 150000 + 85·(500000  + 333333) div 100 =  858333
    //   r(3) = 150000 + 85·(1500000 + 333333) div 100 = 1708333
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.pageRank(edges, 1, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 433333L, 2L -> 858333L, 3L -> 1708333L))
    // total mass conserved up to per-node truncation across 3 rounds
    val r3 = Graph.pageRank(edges, 3, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    val mass = r3.values.sum
    assert(mass <= 3000000L && mass > 3000000L - 3 * 300L, s"mass=$mass")
    // without redistribution the same graph leaks the sink's mass each
    // round — the precondition the fast path documents
    val leaky = Graph.pageRank(edges, 3).as[(Long, Long)].collect().toMap
    assert(leaky.values.sum < mass - 500000L,
      s"fast path should visibly leak on a sink graph: $leaky vs $mass")
  }

  test("personalized PageRank: hand-computed chain, mass stays local to seeds") {
    // chain 1→2→3→4, seed {1}. Unrolled integer rounds:
    //   r1 = {1:150000, 2:850000}
    //   r2 = {1:150000, 2:127500, 3:722500}
    //   r3 = {1:150000, 2:127500, 3:108375, 4:614125}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r3 = Graph.personalizedPageRank(edges, seeds, 3)
      .as[(Long, Long)].collect().toMap
    assert(r3 === Map(1L -> 150000L, 2L -> 127500L, 3L -> 108375L, 4L -> 614125L))
    // locality: a disconnected component never acquires mass
    val twoComp = edges.unionAll(Seq((10L, 11L), (11L, 10L)).toDF("src", "dst"))
    val loc = Graph.personalizedPageRank(twoComp, seeds, 3)
      .as[(Long, Long)].collect().toMap
    assert(!loc.contains(10L) && !loc.contains(11L))
    assert(loc === r3)
    // partitioning invariance
    val rep = Graph.personalizedPageRank(edges.repartition(7), seeds, 3)
      .as[(Long, Long)].collect().toMap
    assert(rep === r3)
  }

  test("HLL estimate is within 3σ of true NDV and partitioning-invariant") {
    // m=1024 → standard error ≈ 1.04/√1024 ≈ 3.25%; 3σ ≈ 9.8%
    val n = 20000
    val df = (1 to n).map(i => (s"item_$i", i % 7)).toDF("k", "grp")
    val est = Sketches.hllNdvBy(df, lit("all"), col("k"))
      .select("est_ndv").as[Double].head()
    assert(math.abs(est - n) / n <= 0.098, s"est=$est vs $n")
    val rep = Sketches.hllNdvBy(df.repartition(17), lit("all"), col("k"))
      .select("est_ndv").as[Double].head()
    assert(rep === est, "register max-fold must be partitioning-invariant")
  }

  test("HLL registers merge by max: union sketch == max of part sketches") {
    val a = (1 to 5000).map(i => s"a_$i").toDF("k")
    val b = (2500 to 7500).map(i => s"a_$i").toDF("k") // overlaps a
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, col("k"), lit("g"))
        .select("bucket", "mj").as[(Long, Int)].collect().toMap
    val ra = regs(a); val rb = regs(b); val ru = regs(a.unionAll(b))
    val merged = (ra.keySet ++ rb.keySet).map { bkt =>
      bkt -> math.max(ra.getOrElse(bkt, 0), rb.getOrElse(bkt, 0))
    }.toMap
    assert(ru === merged,
      "union-of-streams registers must equal per-stream register max")
  }

  test("label propagation: two planted cliques with one bridge resolve to two communities") {
    // cliques {1..5} and {11..15}, bridge 5-11: within-clique majority
    // dominates the single bridge vote, so each clique converges to its
    // min label and the bridge endpoints stay with their cliques
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L)))
      .toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, 3)
      .as[(Long, Long)].collect().toMap
    assert(labels.keySet === ((1L to 5L) ++ (11L to 15L)).toSet)
    assert((1L to 5L).map(labels).toSet.size === 1)
    assert((11L to 15L).map(labels).toSet.size === 1)
    assert(labels(1L) !== labels(15L), "cliques must keep distinct labels")
    // determinism: rerun identical
    val rerun = Graph.labelPropagation(edges, 3).as[(Long, Long)].collect().toMap
    assert(rerun === labels)
  }

  test("label propagation is direction- and multi-edge-invariant") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val noisy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (1L, 3L))
      .toDF("src", "dst")
    val a = Graph.labelPropagation(base, 2).as[(Long, Long)].collect().toSet
    val b = Graph.labelPropagation(noisy, 2).as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("HLL small-range: NDV below m/3 lands in linear counting and stays accurate") {
    val df = (1 to 150).map(i => s"x_$i").toDF("k")
    val row = Sketches.hllNdvBy(df, lit("all"), col("k"))
      .select("n_buckets_used", "est_ndv").as[(Long, Double)].head()
    assert(row._1 <= 150)
    assert(math.abs(row._2 - 150) / 150 <= 0.10, s"est=${row._2}")
  }

  test("histQuantiles: bracket contains the exact discrete quantile; shards merge to the whole") {
    val vals = (1 to 997).map(i => ("g", ((i * 2654435761L) % 9973).toDouble / 7.0))
    val df = vals.toDF("g", "v")
    val qs = Sketches.histQuantiles(df, col("g"), col("v"), 128, Seq(500, 950))
      .collect().map(r => r.getInt(1) -> (r.getDouble(4), r.getDouble(5))).toMap
    val sorted = vals.map(_._2).sorted
    for ((q, (lo, hi)) <- Seq(500, 950).map(q => q -> qs(q))) {
      val exact = sorted((q * 997 + 999) / 1000 - 1) // rank ⌈q·n/1000⌉, 1-based
      assert(lo <= exact && exact <= hi + 1e-9,
        s"P$q exact $exact outside bracket [$lo, $hi]")
      assert(hi - lo <= (sorted.last - sorted.head) / 128 + 1e-9,
        "bracket wider than range/buckets")
    }
    // merge = plain addition of shard counter tables: quantiles over the
    // union equal quantiles computed from per-shard sketches summed
    val whole = Sketches.histQuantiles(df, col("g"), col("v"), 128, Seq(500))
      .select("bucket").as[Long].head()
    // simulate the merged sketch by just re-running over the union of two
    // partitionings — counters are a pure function of (value, range)
    val reparted = Sketches.histQuantiles(df.repartition(7), col("g"), col("v"),
        128, Seq(500)).select("bucket").as[Long].head()
    assert(whole === reparted)
  }

  test("slotSampleQuantiles: rank-error bound holds and shard merges are invisible") {
    // heavy-tailed values (squared congruential stream): the equi-width
    // histogram's value brackets degrade here, the sample's RANK error
    // must not. k=1024 → σ_rank ≈ √(q(1−q)/1024) ≈ 1.6%; the fixture is
    // deterministic, so the observed error is a fixed number — bound it
    // at 5% (≈3σ) with room to spare
    val n = 20000
    val vals = (1 to n).map { i =>
      val u = ((i * 2654435761L) % 100003).toDouble / 100003.0
      ("g", u * u * 1000.0, i.toLong) // quadratic: heavy right tail
    }
    val df = vals.toDF("g", "v", "id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.slotSampleQuantiles(d, col("g"), col("v"), col("id"),
        1024, Seq(500, 950))
    val est = run(df).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    val sorted = vals.map(_._2).sorted
    for (q <- Seq(500, 950)) {
      val trueRank = sorted.count(_ <= est(q)).toDouble / n
      assert(math.abs(trueRank - q / 1000.0) <= 0.05,
        s"P$q est=${est(q)} true rank $trueRank")
    }
    // merge invariance: registers are a pure function of the row SET —
    // re-partitioned shards fold to the identical sample and estimates
    val reparted = run(df.repartition(13)).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(reparted === est)
    // explicit shard merge: per-shard cell tables unioned then re-folded
    // through the same min equal the whole-data cells
    val base = df.select(col("g"), col("v").cast("double").as("v"),
      col("id").cast("string").as("id"))
    val whole = Sketches.slotSampleCells(base, 1024)
    val shards = (0 until 3).map(s =>
      Sketches.slotSampleCells(base.filter(col("id").cast("long") % 3 === s), 1024))
    val mergedCells = shards.reduce(_ unionAll _)
      .groupBy(col("g"), col("slot"))
      .agg(min(struct(col("hv"), col("v"))).as("mn"))
      .select(col("g"), col("slot"), col("mn.hv").as("hv"), col("mn.v").as("v"))
    assert(mergedCells.exceptAll(whole).isEmpty &&
      whole.exceptAll(mergedCells).isEmpty)
  }

  test("psiDrift: self-drift ~0, a shifted population alarms, counters merge invisibly") {
    val ref = (1 to 4000).map(i =>
      ("g", ((i * 2654435761L) % 9973).toDouble / 9973.0)).toDF("g", "v")
    // identical population: PSI must sit at the stable floor
    val self = Sketches.psiDrift(ref, ref, col("g"), col("v"), 16)
      .select("psi").as[Double].head()
    assert(math.abs(self) < 0.01, s"self-PSI $self")
    // live shifted +0.5 (half the mass clamps into the top bucket):
    // well past the 0.25 action threshold
    val shifted = ref.select(col("g"), (col("v") + 0.5).as("v"))
    val drift = Sketches.psiDrift(ref, shifted, col("g"), col("v"), 16)
      .select("psi").as[Double].head()
    assert(drift > 0.25, s"shifted PSI $drift")
    // counter merge invariance: per-shard live cells summed == whole
    val base = shifted.select(col("g"), col("v").cast("double").as("v"))
    val stats = Sketches.histStats(ref.select(col("g").as("g"),
      col("v").cast("double").as("v")))
    val whole = Sketches.psiCells(base, stats, 16)
    val merged = (0 until 3).map(s =>
        Sketches.psiCells(base.filter(crc32(col("v").cast("string")) % 3 === s),
          stats, 16))
      .reduce(_ unionAll _)
      .groupBy(col("g"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("histQuantiles: NULL group keeps its sketch, NULL values are not observations") {
    // group NULL has real values; group "a" has NULLs mixed in — the
    // NULLs must not shift ranks (n counts observations only), and the
    // NULL group must not silently vanish from the output
    val df = Seq[(Option[String], Option[Double])](
      (None, Some(1.0)), (None, Some(2.0)), (None, Some(3.0)), (None, Some(4.0)),
      (Some("a"), Some(10.0)), (Some("a"), None), (Some("a"), Some(20.0)),
      (Some("a"), None), (Some("a"), Some(30.0)), (Some("a"), Some(40.0))
    ).toDF("g", "v")
    val out = Sketches.histQuantiles(df, col("g"), col("v"), 8, Seq(500))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(out.keySet === Set(None, Some("a")))
    assert(out(None) === 4L && out(Some("a")) === 4L) // NULLs not counted in n
  }

  test("SketchStore: persisted-and-merged cells ARE the one-shot build (HLL + bitmap)") {
    import graft.operators.SketchStore
    val ev = spark.read.parquet(s"$sfSmoke/events.parquet")
    // HLL: two waves over disjoint halves, kvbin roundtrip, max-merge
    val hllTbl = java.nio.file.Files.createTempDirectory("graft-skp-t").toString
    Seq(0 -> "overwrite", 1 -> "append").foreach { case (i, mode) =>
      SketchStore.writeWave(
        Sketches.hllRegisters(ev.filter(pmod(col("user_id"), lit(2)) === i),
            col("user_id"), col("event_type"))
          .select(col("g"), col("bucket").as("slot"), col("mj").as("v")),
        hllTbl, s"w$i", mode)
    }
    val merged = SketchStore.readMerged(spark, hllTbl, max)
      .select(col("g"), col("slot").as("bucket"), col("v").as("mj"))
    val oneShot = Sketches.hllRegisters(ev, col("user_id"), col("event_type"))
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty,
      "kvbin-persisted max-merged registers differ from the one-shot build")
    // bitmap: same waves, OR-merge; negative-safe via signed BE64
    val bmTbl = java.nio.file.Files.createTempDirectory("graft-bmp-t").toString
    Seq(0 -> "overwrite", 1 -> "append").foreach { case (i, mode) =>
      SketchStore.writeWave(
        Sketches.bitmapWords(ev.filter(pmod(col("user_id"), lit(2)) === i),
            col("event_type"), col("user_id"))
          .select(col("g"), col("blk").as("slot"), col("w").as("v")),
        bmTbl, s"w$i", mode)
    }
    val mergedW = SketchStore.readMerged(spark, bmTbl, c => bit_or(c))
      .select(col("g"), col("slot").as("blk"), col("v").as("w"))
    val oneShotW = Sketches.bitmapWords(ev, col("event_type"), col("user_id"))
    assert(mergedW.exceptAll(oneShotW).isEmpty && oneShotW.exceptAll(mergedW).isEmpty,
      "kvbin-persisted OR-merged words differ from the one-shot build")
    // CMS: same waves, SUM-merge (counts additive over any partition)
    val cmsTbl = java.nio.file.Files.createTempDirectory("graft-cms-t").toString
    Seq(0 -> "overwrite", 1 -> "append").foreach { case (i, mode) =>
      SketchStore.writeWave(
        Sketches.cmsSketch(ev.filter(pmod(col("user_id"), lit(2)) === i),
            col("event_type"), 4, 256)
          .select(col("j").cast("long").as("g"),
            col("bucket").as("slot"), col("cnt").as("v")),
        cmsTbl, s"w$i", mode)
    }
    val mergedC = SketchStore.readMerged(spark, cmsTbl, sum)
      .select(col("g").cast("int").as("j"), col("slot").as("bucket"),
        col("v").as("cnt"))
    val oneShotC = Sketches.cmsSketch(ev, col("event_type"), 4, 256)
    assert(mergedC.exceptAll(oneShotC).isEmpty && oneShotC.exceptAll(mergedC).isEmpty,
      "kvbin-persisted sum-merged CMS grid differs from the one-shot build")
    // a bit-63 word (negative long) survives the BE64 value roundtrip
    val neg = Seq(("g1", 0L, java.lang.Long.MIN_VALUE | 5L)).toDF("g", "slot", "v")
    val negTbl = java.nio.file.Files.createTempDirectory("graft-neg-t").toString
    SketchStore.writeWave(neg, negTbl, "w0", "overwrite")
    assert(SketchStore.readMerged(spark, negTbl, max)
      .select("v").as[Long].head() === (java.lang.Long.MIN_VALUE | 5L))
  }

  test("SketchStore refuses a group key that would corrupt the key encoding") {
    import graft.operators.SketchStore
    val bad = Seq(("a/b", 1L, 1L)).toDF("g", "slot", "v")
    val tbl = java.nio.file.Files.createTempDirectory("graft-bad-t").toString
    val e = intercept[Exception] {
      SketchStore.writeWave(bad, tbl, "w0", "overwrite")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(chain(e).exists(_.contains("'/'-free")), chain(e).mkString(" | "))
  }

  test("quantile registers persist as bit planes: merged store IS the one-shot register table, doubles bit-exact") {
    import graft.operators.{Sketches, SketchStore}
    // values deliberately hostile to any decimal roundtrip: negatives,
    // -0.0, subnormals, 1/3 — the IEEE bit planes must carry them all
    val rows = (0 until 400).map { i =>
      val v = i % 5 match {
        case 0 => -123.456e-7 * (i + 1)
        case 1 => if (i == 1) -0.0 else java.lang.Double.MIN_VALUE * (i + 1)
        case 2 => 1.0 / 3.0 * i
        case 3 => -1.0 * i
        case _ => i * 1e12
      }
      (s"g${i % 3}", v, s"id$i")
    }.toDF("g", "v", "id")
    val oneShot = Sketches.slotSampleCells(rows, 64)
      .as[(String, Long, Long, Double)].collect().toSet
    val tbl = java.nio.file.Files.createTempDirectory("graft-kllp-t").toString
    Seq(0 -> "overwrite", 1 -> "append").foreach { case (i, mode) =>
      Sketches.slotSampleCellsPersist(
        Sketches.slotSampleCells(rows.filter(crc32(col("id")) % 2 === i), 64),
        tbl, s"w$i", mode)
    }
    val merged = Sketches.slotSampleCellsFromStore(spark, tbl)
      .as[(String, Long, Long, Double)].collect().toSet
    // EXACT equality: same registers, same hashes, bit-identical doubles
    assert(merged === oneShot,
      "persisted-and-merged registers differ from the one-shot build")
    // a NULL group — which the sketch deliberately PRESERVES — must
    // survive the persist roundtrip too (the "n"/"s" key encoding), and
    // a real group literally named "n" must not collide with it
    val withNull = Seq[(Option[String], Double, String)](
      (None, 5.0, "a1"), (None, 7.0, "a2"),
      (Some("n"), 1.0, "b1"), (Some("g"), 2.0, "b2"))
      .toDF("g", "v", "id")
    val oneShotN = Sketches.slotSampleCells(withNull, 16)
      .as[(Option[String], Long, Long, Double)].collect().toSet
    val tblN = java.nio.file.Files.createTempDirectory("graft-klln-t").toString
    Sketches.slotSampleCellsPersist(
      Sketches.slotSampleCells(withNull, 16), tblN, "w0", "overwrite")
    val mergedN = Sketches.slotSampleCellsFromStore(spark, tblN)
      .as[(Option[String], Long, Long, Double)].collect().toSet
    assert(mergedN === oneShotN,
      "NULL group or the literal 'n' group lost in the persist roundtrip")
    assert(mergedN.exists(_._1.isEmpty) && mergedN.exists(_._1.contains("n")))
    // and the estimate stage sees no difference either
    val estA = Sketches.slotSampleQuantilesFromCells(
        Sketches.slotSampleCellsFromStore(spark, tbl), Seq(250, 500, 950))
      .orderBy("g", "q_permille").collect().toSeq
    val estB = Sketches.slotSampleQuantilesFromCells(
        Sketches.slotSampleCells(rows, 64), Seq(250, 500, 950))
      .orderBy("g", "q_permille").collect().toSeq
    assert(estA === estB)
  }

  test("SketchStore.compactWaves: estimates EXACTLY unchanged under all three laws; folded ids stay refusable; appends continue") {
    import graft.operators.SketchStore
    def wave(seed: Int): org.apache.spark.sql.DataFrame =
      (0 until 40).map { i =>
        (s"g${i % 3}", (i % 7).toLong,
          math.abs((i * 2654435761L + seed * 97L) % 100000L))
      }.toDF("g", "slot", "v")
    val laws: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] =
      Seq(("max", c => max(c)), ("bit_or", c => bit_or(c)), ("sum", c => sum(c)))
    for ((name, law) <- laws) {
      val tbl = java.nio.file.Files
        .createTempDirectory(s"graft-cw-$name-t").toString
      Seq("w1" -> "overwrite", "w2" -> "append", "w3" -> "append",
        "w4" -> "append").zipWithIndex.foreach { case ((w, mode), i) =>
        SketchStore.writeWave(wave(i + 1), tbl, w, mode)
      }
      val before = SketchStore.readMerged(spark, tbl, law)
        .as[(String, Long, Long)].collect().toSet
      // fold w1+w2 into a baseline: monoid ⇒ the merged view is EXACTLY
      // the pre-compaction one, for every law
      SketchStore.compactWaves(spark, tbl, "w2", law, "base")
      val after = SketchStore.readMerged(spark, tbl, law)
        .as[(String, Long, Long)].collect().toSet
      assert(after === before, s"law $name: estimates moved under compaction")
      // folded, kept and baseline ids all refuse a re-append forever
      for (dup <- Seq("w1", "w2", "w3", "base")) {
        val e = intercept[IllegalArgumentException] {
          SketchStore.writeWave(wave(9), tbl, dup, "append")
        }
        assert(e.getMessage.contains("already persisted"), s"$name/$dup")
      }
      // the monitor keeps going: a fresh wave appends and folds in
      SketchStore.writeWave(wave(5), tbl, "w9", "append")
      val withNew = SketchStore.readMerged(spark, tbl, law)
        .as[(String, Long, Long)].collect().toSet
      if (name == "sum") // max/or may coincide; additive counts must move
        assert(withNew !== before, "sum law must see the new wave")
      // a SECOND compaction folds baseline + everything else; estimates
      // still identical, every historical id still refusable
      SketchStore.compactWaves(spark, tbl, "w9", law, "base2")
      val after2 = SketchStore.readMerged(spark, tbl, law)
        .as[(String, Long, Long)].collect().toSet
      assert(after2 === withNew, s"law $name: second compaction moved estimates")
      for (dup <- Seq("w1", "w4", "w9", "base")) {
        val e = intercept[IllegalArgumentException] {
          SketchStore.writeWave(wave(9), tbl, dup, "append")
        }
        assert(e.getMessage.contains("already persisted"), s"$name/$dup round 2")
      }
      // a cut below every wave is a clean no-op
      SketchStore.compactWaves(spark, tbl, "0", law, "zz")
      assert(SketchStore.readMerged(spark, tbl, law)
        .as[(String, Long, Long)].collect().toSet === after2)
    }
    // the '!' namespace is reserved for the registry
    val e = intercept[IllegalArgumentException] {
      SketchStore.writeWave(wave(1),
        java.nio.file.Files.createTempDirectory("graft-cw-r-t").toString,
        "!waves", "overwrite")
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("SketchStore: an EMPTY wave is a no-op generation, not a failure") {
    // the nightly-run reality: a wave with no new data must commit
    // cleanly (empty generation) and leave the merged state unchanged —
    // a pipeline that crashes on a quiet day is not a pipeline
    import graft.operators.SketchStore
    val tbl = java.nio.file.Files.createTempDirectory("graft-empty-t").toString
    val cells = Seq(("g1", 1L, 3L)).toDF("g", "slot", "v")
    SketchStore.writeWave(cells, tbl, "w0", "overwrite")
    SketchStore.writeWave(cells.filter(lit(false)), tbl, "w1", "append")
    assert(SketchStore.readMerged(spark, tbl, max)
      .as[(String, Long, Long)].collect().toSeq === Seq(("g1", 1L, 3L)))
    // an empty FIRST run reads back as zero cells, not an error
    val tbl2 = java.nio.file.Files.createTempDirectory("graft-empty2-t").toString
    SketchStore.writeWave(cells.filter(lit(false)), tbl2, "w0", "overwrite")
    assert(SketchStore.readMerged(spark, tbl2, max).count() === 0L)
  }

  test("SketchStore refuses re-appending an existing wave id (sum law would double-count)") {
    import graft.operators.SketchStore
    val cells = Seq(("g1", 1L, 3L), ("g1", 2L, 5L)).toDF("g", "slot", "v")
    val tbl = java.nio.file.Files.createTempDirectory("graft-dup-t").toString
    SketchStore.writeWave(cells, tbl, "w0", "overwrite")
    SketchStore.writeWave(cells, tbl, "w1", "append")
    val e = intercept[IllegalArgumentException] {
      SketchStore.writeWave(cells, tbl, "w1", "append")
    }
    assert(e.getMessage.contains("double-count"), e.getMessage)
    // a fresh id still appends fine
    SketchStore.writeWave(cells, tbl, "w2", "append")
    assert(SketchStore.readMerged(spark, tbl, sum)
      .agg(sum("v")).as[Long].head() === 3L * 8)
  }
}
