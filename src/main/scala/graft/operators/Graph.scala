package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph computation as repeated join + aggregate — the
  * second iterative operator family after [[Dedup.nearDupClusters]]'
  * connected components (pointer jumping). PageRank is the classic
  * "does your engine iterate?" benchmark: each round is one
  * hash-partitioned join of the edge list with the current rank vector
  * plus one grouped sum, i.e. exactly the shuffle pattern a 1000-node
  * cluster runs (edges partitioned by src; rank partitioned by node;
  * AQE free to co-locate the repeated key).
  *
  * Determinism contract: all arithmetic is 64-bit INTEGER — ranks are
  * micro-units (1e6 = 1.0), the per-edge contribution is
  * `rank div out_degree` and the damping step is
  * `0.15*1e6 + (85 * Σcontrib) div 100` — so Spark and the unrolled
  * DuckDB CTE oracle agree bit-for-bit regardless of summation order
  * (integer + is commutative; no float drift). Truncation loss stays
  * inside the engine-equality contract because both engines truncate
  * identically. */
object Graph {

  /** Fixed-iteration integer PageRank. `edges` must be the directed
    * edge list (src, dst) — for an undirected graph pass both
    * directions.
    *
    * Two dangling-node modes. The DEFAULT fast path assumes every node
    * has out-degree ≥ 1 (always true for symmetrized edges — the
    * engine's own callers) and skips the dangling machinery entirely;
    * feeding it a general directed graph with sink nodes silently
    * leaks their rank mass out of circulation each round.
    * `redistributeDangling = true` is the general contract: each round
    * the total rank held by out-degree-0 nodes is gathered (one
    * anti-join + 1-row aggregate, broadcast back) and every node
    * receives an equal integer share — `rank = 0.15·1e6 +
    * 0.85·(Σ contrib + dm div |V|)` — so mass is conserved up to
    * truncation and sinks themselves keep earning rank. All still
    * 64-bit integer, so the unrolled-CTE oracle replays it bit-exact.
    *
    * Returns (node, rank) with rank in micro-units; in redistributing
    * mode every node of V = src ∪ dst gets a row (a no-in-edge node
    * still earns the damping floor + dangling share). Iterations are
    * O(edges) shuffles each; the loop runs on the driver but every
    * data pass is distributed. `iters` is small and fixed (plan depth
    * grows linearly; callers wanting >8 rounds should checkpoint).
    * `broadcastRanks = false` for graphs whose node set itself exceeds
    * broadcast size — iterations then shuffle-join on src. */
  def pageRank(edges: DataFrame, iters: Int,
               broadcastRanks: Boolean = true,
               redistributeDangling: Boolean = false): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // NOT checkpointed: all iterations evaluate in ONE action, where
    // Spark's ReusedExchange already computes the edge-degree join's
    // shuffle once and replays it per iteration — an eager
    // localCheckpoint here measured ~1.7× SLOWER at sf0.1 (it pays a
    // separate materialization job and severs the exchange reuse).
    // Callers running MANY actions over the rank (or >8 iterations)
    // should persist the edge list themselves.
    val withDeg = e.join(deg, "src")
    if (!redistributeDangling) {
      var rank = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
      for (_ <- 1 to iters) {
        // the rank vector is |V| rows against |E| edges — broadcast it
        // when it fits (the common case; V ≪ E for any dense-ish graph)
        // so the big edge side never re-shuffles per iteration
        val r = if (broadcastRanks) broadcast(rank) else rank
        rank = withDeg.join(r, withDeg("src") === r("node"))
          .select(col("dst").as("node"), expr("rank div deg").as("c"))
          .groupBy(col("node"))
          .agg(expr("150000L + (85 * sum(c)) div 100").as("rank"))
      }
      rank
    } else {
      val nodes = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct()
      // |V| stays in-plan as a broadcast 1-row aggregate — no
      // driver-side count() action at build time
      val nv = nodes.agg(count(lit(1)).as("cnt"))
      // srcs is |V|-sized like the rank vector: honor the same
      // broadcastRanks escape hatch, or the anti-join would rebuild a
      // node-set broadcast each round on exactly the graphs whose node
      // set was declared too big to broadcast
      val srcs0 = deg.select(col("src").as("node"))
      val srcs = if (broadcastRanks) broadcast(srcs0) else srcs0
      var rank = nodes.select(col("node"), lit(1000000L).as("rank"))
      for (_ <- 1 to iters) {
        val r = if (broadcastRanks) broadcast(rank) else rank
        val contrib = withDeg.join(r, withDeg("src") === r("node"))
          .select(col("dst").as("node"), expr("rank div deg").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("s"))
        // mass currently held by sinks: one anti-join against the
        // out-degree'd node list, folded to a single row. The previous
        // rank is consumed twice per round (broadcast for contributions,
        // streamed here) — a per-round lazy localCheckpoint to cut that
        // re-evaluation measured ~1.5× SLOWER at sf0.1 (the
        // materialization barriers cost more than the shared subtree,
        // which ReusedExchange already dedupes on the broadcast side),
        // so, like the fast path, this loop stays checkpoint-free.
        val dangling = rank.join(srcs, Seq("node"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
        rank = nodes.join(contrib, Seq("node"), "left")
          .crossJoin(broadcast(dangling))
          .crossJoin(broadcast(nv))
          .select(col("node"),
            expr("150000L + (85 * (coalesce(s, 0L) + dm div cnt)) div 100")
              .as("rank"))
      }
      rank
    }
  }

  /** Personalized PageRank (Haveliwala 2002): the teleport mass lands
    * ONLY on the seed set, so rank measures proximity-to-seeds — the
    * recommendation / related-entities form ("suppliers this customer
    * cohort effectively buys from", "docs near these docs"). Same
    * integer arithmetic as [[pageRank]] (total mass |S|·1e6, each seed
    * receives the flat 150000 teleport per round, contributions scaled
    * 85 div 100), so the DuckDB oracle replays rounds bit-for-bit.
    *
    * Scale shape: the rank vector starts |S|-sized and only ever holds
    * nodes REACHED from the seeds — for local seed sets on a big graph
    * that is a small frontier, the classic PPR locality win; the edge
    * side never re-shuffles when `broadcastRanks` holds. Each round is
    * one grouped contribution sum plus one union+regroup with the
    * |S|-row teleport frame — the regroup runs over the already
    * aggregated vector (|reached| rows), not the edges. Nodes with
    * zero mass are absent from the output (they'd be rank-0 rows). */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                           broadcastRanks: Boolean = true): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, "src")
    val sd = seeds.select(col("node")).distinct()
    val tel = sd.select(col("node"), lit(150000L).as("p"))
    var rank = sd.select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val r = if (broadcastRanks) broadcast(rank) else rank
      val contrib = withDeg.join(r, withDeg("src") === r("node"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy(col("node"))
        .agg(expr("(85 * sum(c)) div 100").as("p"))
      rank = contrib.select(col("node"), col("p")).unionAll(tel)
        .groupBy(col("node")).agg(sum(col("p")).as("rank"))
    }
    rank
  }

  /** Co-occurrence edge list: nodes are `itemCol` values, an edge joins
    * two items that appear together in at least `minGroups` distinct
    * `groupCol` groups (e.g. parts co-purchased in ≥2 orders). The
    * self-join is per-group — quadratic only in GROUP size, which for
    * order-like groups is small and bounded — and shuffles on the group
    * key, which the source is typically already clustered by. The
    * `minGroups` support threshold is the standard market-basket thinning
    * that keeps the graph sparse as the corpus grows: co-occurrence
    * counts concentrate, so the ≥k edge set grows ~linearly, not
    * quadratically, with data size. Output: (a, b) with a < b, distinct. */
  def coEdges(df: DataFrame, groupCol: String, itemCol: String,
              minGroups: Int): DataFrame = {
    // distinct (group, item) FIRST: shrinks the self-join input and
    // makes every surviving (a, b) pair unique per group, so the
    // support count is a plain count(*) — no count_distinct dedup
    // state inside the aggregation
    val gi = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val l = gi.select(col("g"), col("i").as("a"))
    val r = gi.select(col("g"), col("i").as("b"))
    l.join(r, Seq("g")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minGroups)
      .select(col("a"), col("b"))
  }

  /** Frequent triple mining (market-basket level 3): item triples
    * co-occurring in at least `minGroups` distinct groups. Like
    * [[coEdges]], the combination explode is per-GROUP — cubic only in
    * basket size (avg ~4, max ~17 on the fixtures).
    *
    * The DEFAULT route is Apriori-pruned (Agrawal & Srikant 1994, the
    * level-2→3 monotonicity): a frequent triple's three member pairs
    * are each frequent, so before the cubic explode a level-2 pass
    * computes per-group pairs (quadratic, the cheap level), keeps the
    * globally frequent ones (support ≥ `minGroups` — the SAME floor the
    * triples use), and thins each basket to the items holding ≥ 2
    * frequent-pair memberships WITHIN that basket (a triple member
    * needs two frequent partners co-present). Any group containing a
    * frequent triple keeps all three members (its member pairs are
    * globally frequent and co-present there), so the pruned cube's
    * output — support values included — is bit-identical to the
    * unpruned one; a hub basket of mostly-unique items (the real-corpus
    * norm) prunes to nothing and costs C(c,2), not C(c,3).
    * `aprioriPrune = false` skips the level-2 pass for corpora whose
    * baskets are known-small (saves one pair shuffle).
    *
    * Both explodes sit behind the house VOLUME GUARD
    * ([[graft.operators.Dedup.editNearDupPrefix]]'s discipline): the
    * exact volumes — Σ C(c,2) over raw baskets for the pair pass,
    * Σ C(c',3) over PRUNED baskets for the cube — are aggregated
    * IN-PLAN from the same frames the joins read (ReusedExchange, no
    * separate guard job), and a volume above `maxTriplesPerGroup`·groups
    * fails the job via `assert_true` on the first probe row — before
    * any join materializes a pair or triple. A post-prune refusal is
    * irreducible: the OUTPUT itself is cubic in a surviving hub (every
    * pair frequent), and no algorithm shrinks its own answer — cap
    * basket size upstream or raise the bound to accept the cost.
    * Int.MaxValue disables. The support count is one grouped shuffle on
    * the triple key. Output: (x, y, z, support) with x < y < z. */
  def coTriples(df: DataFrame, groupCol: String, itemCol: String,
                minGroups: Int, maxTriplesPerGroup: Int = 5000,
                aprioriPrune: Boolean = true): DataFrame = {
    val gi0 = df.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .distinct()
    // The guard is PLAN-INTEGRATED, not a separate driver action: the
    // exact volume aggregates the same distinct frame the join reads,
    // so Catalyst reuses ONE shuffle (ReusedExchange) for guard and
    // join alike, and `assert_true` over the broadcast 1-row volume
    // fails the job on the first probe row. (Round-8 measurements: an
    // eager `.head()` guard action re-ran the distinct and cost ~2× the
    // whole query at sf0.1 — 1.9→3.5 s — and a localCheckpoint'd frame
    // cost 19 s at sf1; the in-plan guard pays one mapside
    // re-aggregation, ~zero.) The price is failure semantics: the
    // refusal surfaces at the first ACTION on the result, not at the
    // call — same message, wrapped in Spark's job failure.
    // `volNum`: Σ c·(c−1)·…·(c−arity+1) folds in DECIMAL(38,0) — in
    // BIGINT a single hub basket of ~2.1M+ distinct items wraps the
    // product past Long.MaxValue (under ANSI, the Spark 4 default, the
    // fold would abort with a job-level overflow error instead of the
    // guard's own message; decimal keeps the message) — the
    // mixEpochPlan overflow discipline applied here.
    def guarded(frame: DataFrame, arity: Int, what: String): DataFrame = {
      if (maxTriplesPerGroup == Int.MaxValue) frame else {
        val prod = (0 until arity).map(k =>
            (col("c") - lit(k)).cast("decimal(38,0)")).reduce(_ * _)
        val fact = (1 to arity).product
        val occ = frame.groupBy(col("g")).agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(prod), lit(0).cast("decimal(38,0)")).as("vn"),
            count(lit(1)).as("ng"))
        frame.crossJoin(broadcast(occ))
          .filter(assert_true(
            expr(s"vn div $fact") <= lit(maxTriplesPerGroup.toLong) * col("ng"),
            concat(lit(s"coTriples: $what volume "),
              expr(s"CAST(vn div $fact AS STRING)"),
              lit(s" exceeds $maxTriplesPerGroup/group over "),
              col("ng").cast("string"),
              lit(" groups — a hub basket makes the per-group " +
                s"combination explode ${if (arity == 3) "cubic" else "quadratic"}. " +
                (if (arity == 2)
                  "The level-2 pass is the prune's own floor — cap " +
                  "basket size upstream or raise maxTriplesPerGroup " +
                  "explicitly to accept the cost."
                else if (aprioriPrune)
                  "This volume already survived the Apriori level-2 prune " +
                  "(every hub pair is frequent), so the OUTPUT itself is " +
                  "cubic — cap basket size upstream or raise " +
                  "maxTriplesPerGroup explicitly to accept the cost."
                else
                  "Cap basket size upstream, Apriori-prune through " +
                  "coEdges first (triple support <= min pair support), " +
                  "or raise maxTriplesPerGroup explicitly to accept the " +
                  "cost.")))).isNull)
          .select(col("g"), col("i"))
      }
    }
    val gi = if (!aprioriPrune) guarded(gi0, 3, "triple") else {
      // level-2 pass: per-group pairs — guarded at the SAME bound (a
      // basket passing C(c,2) ≤ bound is far inside the cube's budget)
      val gp = guarded(gi0, 2, "Apriori level-2 pair")
      val pl = gp.select(col("g"), col("i").as("a"))
      val pr = gp.select(col("g"), col("i").as("b"))
      val pairsG = pl.join(pr, Seq("g")).filter(col("a") < col("b"))
      // global pair support as a WINDOW count over the pair frame — one
      // shuffle on (a, b) producing the per-group frequent-pair
      // instances directly. (A groupBy-support + semi-join-back
      // formulation reads pairsG twice with NO shared exchange — the
      // aggregate exchange carries partial counts, the join exchange
      // raw rows — and measured 2.1× this query's cost at sf0.1.)
      val fpg = pairsG
        .withColumn("w", count(lit(1)).over(
          Window.partitionBy(col("a"), col("b"))))
        .filter(col("w") >= minGroups)
      // basket thinning: a triple member holds ≥2 frequent-pair
      // memberships co-present in its basket
      val thinned = fpg.select(col("g"), col("a").as("i"))
        .unionAll(fpg.select(col("g"), col("b").as("i")))
        .groupBy(col("g"), col("i")).agg(count(lit(1)).as("fpc"))
        .filter(col("fpc") >= 2).select(col("g"), col("i"))
      guarded(thinned, 3, "post-prune triple")
    }
    val a = gi.select(col("g"), col("i").as("x"))
    val b = gi.select(col("g"), col("i").as("y"))
    val c = gi.select(col("g"), col("i").as("z"))
    a.join(b, Seq("g")).filter(col("x") < col("y"))
      .join(c, Seq("g")).filter(col("y") < col("z"))
      .groupBy(col("x"), col("y"), col("z"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minGroups)
  }

  /** Exact triangle enumeration by degree ordering (the MapReduce-classic
    * node-iterator++): orient each undirected edge from its lower-(deg,id)
    * endpoint to the higher, form wedges at the low vertex, and close them
    * against the oriented edge set. Orientation bounds every vertex's
    * out-degree by O(√E), so the wedge join materializes O(E^1.5) rows
    * worst-case instead of Σdeg² — the difference between "survives a
    * power-law graph at 100 TB" and "one hub vertex OOMs the shuffle".
    * Both joins are plain hash equi-joins on node ids. Input must be the
    * canonical a<b distinct edge list; output is one row per triangle
    * (a < b < c). */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // orient low->high in the (deg, id) total order; carry the target's
    // rank so wedge endpoints can be ordered without re-joining degrees
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("b").as("v"),
          struct(col("db").as("d"), col("b").as("n")).as("rv")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("v"),
            struct(col("da").as("d"), col("a").as("n")).as("rv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.rv").as("rv"))
    val e1 = oriented.select(col("u"), col("v").as("x"), col("rv").as("rx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("rv").as("ry"))
    val wedges = e1.join(e2, Seq("u")).filter(col("rx") < col("ry"))
      .select(col("u"), col("x"), col("y"))
    val closing = oriented.select(col("u").as("x"), col("v").as("y"))
    wedges.join(closing, Seq("x", "y"), "left_semi")
      .select(array_sort(array(col("u"), col("x"), col("y"))).as("t"))
      .select(col("t").getItem(0).as("a"), col("t").getItem(1).as("b"),
        col("t").getItem(2).as("c"))
  }

  /** Fixed-round k-core peeling (Seidman 1983; the distributed peel of
    * Montresor et al. 2011): each round computes degrees over the
    * SURVIVING undirected edge set and removes every vertex of degree
    * < k together with its incident edges. The k-core is the fixed
    * point; `rounds` is FIXED rather than data-dependent — the same
    * determinism discipline as [[pageRank]] and [[labelPropagation]],
    * which is what lets an unrolled SQL oracle replay the peel
    * round-for-round. Callers pick `rounds` at least the peel depth of
    * their graph (KCoreSpec asserts the fixture entry reaches the
    * fixed point: one more round changes nothing), and the contract
    * for a non-converged cut is still well-defined: the round-r peel
    * state.
    *
    * Scale: each round is one grouped degree count plus two left-semi
    * joins on vertex ids — O(E) shuffle per round, no per-vertex state
    * beyond a count, and the edge set only ever shrinks, so round cost
    * is monotone non-increasing. Peel depth (not |V|) bounds the round
    * count a converged caller needs; for the degenerate
    * long-path worst case callers should cap rounds and accept the
    * peel-state contract rather than iterate to convergence. The
    * surviving edge set is MATERIALIZED per round (localCheckpoint —
    * one job each, the [[Dedup.nearDupClusters]] pointer-jumping
    * discipline): the peel consumes its own output 5× per round (twice
    * in the degree union, once per semi-join side, once forward), so
    * an un-severed lineage grows the logical plan ~5^rounds and
    * Catalyst analysis, not the data, becomes the bottleneck —
    * measured as a multi-minute analysis hang at rounds = 5 on a
    * 2.3k-edge fixture.
    *
    * Input must be the canonical a<b distinct edge list (the
    * [[coEdges]] output shape, like [[triangles]]). Output: (n, deg)
    * — every vertex surviving `rounds` peels with its degree in the
    * surviving edge set.
    *
    * `untilConverged = true` turns `rounds` into a CAP and stops at
    * the fixed point instead: edges only shrink, so an unchanged edge
    * count after a peel IS convergence. Detection is the
    * [[Dedup.nearDupClusters]] changed-count discipline — one count()
    * per round of the already-materialized edge set, which forces a
    * checkpoint EVERY round (the fixed-round path's every-second-round
    * severing measured ~25% faster; that saving is the price of not
    * having to guess the peel depth). Default stays fixed-round —
    * that's what the unrolled SQL oracle replays. */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
            untilConverged: Boolean = false): DataFrame = {
    require(k >= 1, "k must be positive")
    require(rounds >= 0, "rounds must be non-negative")
    var e = edges.select(col("a"), col("b")).localCheckpoint()
    var prevCnt = if (untilConverged) e.count() else -1L
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val keep = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("n"))
      e = e.join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
      if (untilConverged) {
        e = e.localCheckpoint()
        val c = e.count()
        done = c == prevCnt
        prevCnt = c
      } else if (r % 2 == 0 || r == rounds) {
        // sever every SECOND round: one un-severed round multiplies the
        // plan by ~5 (tolerable); two compound to ~25 and beyond that
        // Catalyst analysis, not the data, dominates. Halving the
        // materializations halves the per-round job overhead.
        e = e.localCheckpoint()
      }
      r += 1
    }
    e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
  }

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007), fully deterministic: labels start as vertex ids; each
    * round EVERY vertex simultaneously adopts the most frequent label
    * among its neighbors, ties broken by smallest label; a FIXED round
    * count (no data-dependent stopping — same discipline as
    * [[pageRank]] and the k-means codebook, which is what makes the
    * unrolled oracle replay possible). Input edges are symmetrized and
    * de-duplicated, so directionality and multi-edges cannot skew the
    * neighbor vote.
    *
    * Scale: one hash-shuffle join (edges × labels on dst) plus one
    * partial-aggregated count and a per-vertex argmax window per
    * round — O(E) per round, no vertex ever holds more than its
    * neighbor label histogram. Output: (v, label) per vertex.
    *
    * `untilConverged = true` turns `rounds` into a CAP and stops when
    * a synchronous round changes no vertex's label (an anti-join
    * changed-count per round on the checkpointed label frame — the
    * [[Dedup.nearDupClusters]] discipline). Synchronous LPA can
    * 2-cycle on bipartite-ish structures (labels oscillate, changed
    * count never 0) — the cap still bounds those, returning the
    * round-`rounds` state like the fixed-round contract. Default
    * stays fixed-round for the unrolled oracle replay. */
  def labelPropagation(edges: DataFrame, rounds: Int,
                       untilConverged: Boolean = false): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var labels = und.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
    if (untilConverged) labels = labels.localCheckpoint()
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val neigh = und.join(labels, und("dst") === labels("v"))
        .select(und("src").as("v"), col("label"))
      val next = neigh.groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("v")).orderBy(col("c").desc, col("label"))))
        .filter(col("r") === 1)
        .select(col("v"), col("label"))
      if (untilConverged) {
        val nextM = next.localCheckpoint()
        val changed = nextM.select(col("v"), col("label"))
          .join(labels.select(col("v"), col("label")),
            Seq("v", "label"), "left_anti").count()
        labels = nextM
        done = changed == 0
      } else labels = next
      r += 1
    }
    labels
  }

  /** Link prediction over an undirected graph (canonical a<b edge
    * list): for every NON-adjacent pair sharing at least one common
    * neighbor, the common-neighbor count and the Resource Allocation
    * index (Zhou, Lü & Zhang 2009) — Σ over shared neighbors z of
    * 1/deg(z), here in exact integer micro-units `1e6 div deg(z)` so
    * the score is float-free and summation-order free. RA is the
    * published top performer of the local-similarity family and, unlike
    * Adamic-Adar's 1/ln(deg), needs no transcendental — which is what
    * keeps the cross-engine gate exact.
    *
    * The wedge materialization is Σ C(deg(z), 2) rows — quadratic in
    * the degree of each hub — so it sits behind the house VOLUME GUARD
    * ([[coTriples]]' discipline): the exact wedge volume costs one
    * grouped degree count, and a volume above `maxWedgesPerNode`·nodes
    * refuses the join naming the remedies (thin the graph through a
    * higher [[coEdges]] support floor, cap hub degree upstream, or
    * raise the bound to accept the cost). Int.MaxValue disables.
    *
    * Output: top-`topN` (a, b, cn, ra_ppm) by (ra_ppm desc, cn desc,
    * a, b) — a TakeOrdered, never a global sort. Existing edges are
    * removed with one left-anti join on the canonical pair. */
  def linkPredict(edges: DataFrame, topN: Int,
                  maxWedgesPerNode: Int = 5000): DataFrame = {
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    // symmetrized adjacency: one row per (center z, neighbor n)
    val adj = e.select(col("a").as("z"), col("b").as("n"))
      .unionAll(e.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("d"))
    if (maxWedgesPerNode != Int.MaxValue) {
      val occ = deg.agg(
        coalesce(sum(col("d") * (col("d") - lit(1))), lit(0L)).as("w2"),
        count(lit(1)).as("nv")).head()
      val (wedges, nv) = (occ.getLong(0) / 2, math.max(occ.getLong(1), 1L))
      if (wedges > maxWedgesPerNode.toLong * nv)
        throw new IllegalStateException(
          s"linkPredict: wedge volume $wedges exceeds $maxWedgesPerNode/" +
          s"node over $nv nodes — a hub makes the common-neighbor join " +
          s"quadratic in its degree. Thin the graph (higher coEdges " +
          s"support floor), cap hub degree upstream, or raise " +
          s"maxWedgesPerNode explicitly to accept the cost.")
    }
    val awd = adj.join(deg, Seq("z"))
      .select(col("z"), col("n"), expr("CAST(1000000 div d AS BIGINT)").as("inv"))
    val l = awd.select(col("z"), col("n").as("a"), col("inv"))
    val r = awd.select(col("z"), col("n").as("b"))
    val cand = l.join(r, Seq("z")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum(col("inv")).as("ra_ppm"))
    cand.join(e, Seq("a", "b"), "left_anti")
      .orderBy(col("ra_ppm").desc, col("cn").desc, col("a"), col("b"))
      .limit(topN)
  }

  /** GNN-style two-layer neighbor feature aggregation (the GraphSAGE
    * mean aggregator's data-layer half — what a training pipeline
    * precomputes per vertex before any model sees the graph): layer 1
    * is each vertex's mean over its neighbors' input features, layer 2
    * the mean over its neighbors' layer-1 values — the 2-hop receptive
    * field. Means are exact integer micro-units (`Σf·1e6 div n`, then
    * `Σh1 div n` — h1 already carries the 1e6 scale), so both layers
    * replay bit-for-bit cross-engine with no float accumulation.
    * Exactness bound: Σ of neighbor features per vertex must stay under
    * ~9.2e12 (the ·1e6 headroom in a BIGINT) — at larger magnitudes
    * route the product through DECIMAL(38,0) as pmiCollocations does.
    *
    * Scale: each layer is ONE O(E) equi-join against a V-row frame plus
    * a grouped partial agg — the message-passing shape; depth is a
    * fixed small constant (the pageRank/LPA contract), never data-
    * dependent. `edges` (a, b) undirected; `features` (v, f BIGINT).
    * Output: (v, f, h1_ppm, h2_ppm) for vertices with both hops. */
  def neighborAgg(edges: DataFrame, features: DataFrame): DataFrame = {
    val adj = edges.select(col("a").as("z"), col("b").as("n"))
      .unionAll(edges.select(col("b").as("z"), col("a").as("n")))
    val h1 = adj.join(features.withColumnRenamed("v", "n"), Seq("n"))
      .groupBy(col("z").as("v"))
      .agg(expr("CAST(sum(f) * 1000000 div count(1) AS BIGINT)").as("h1_ppm"))
    val h2 = adj.join(
        h1.withColumnRenamed("v", "n").withColumnRenamed("h1_ppm", "nh1"), Seq("n"))
      .groupBy(col("z").as("v"))
      .agg(expr("CAST(sum(nh1) div count(1) AS BIGINT)").as("h2_ppm"))
    features.join(h1, Seq("v")).join(h2, Seq("v"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge
    * list — on a bipartite src→dst graph the two scores are the two
    * natural rankings (e.g. customers as hubs, suppliers as
    * authorities). Integer power iteration in the [[pageRank]]
    * discipline: hubs start at 1e6; each round computes raw authority
    * mass a(v) = Σ_{u→v} h(u), renormalizes to micro-units of the
    * round's MAX via `(s·1e6) div max` (all masses positive, so the
    * truncating div is floor in both engines), then the hub half-step
    * h(u) = Σ_{u→v} a(v) renormalized the same way — so the unrolled-
    * CTE oracle replays every round bit-for-bit. max-normalization
    * (not L2) keeps the iteration integer-exact; the fixed point's
    * RANKING is the same, which is what the scores are for.
    *
    * Scale: per round, two O(E) equi-joins against broadcast score
    * vectors plus grouped partial aggs, and the round max rides a
    * broadcast 1-row aggregate — never a driver action. `iters` is
    * small and fixed (plan depth grows linearly — the pageRank
    * contract; callers wanting >8 rounds should checkpoint). Scores
    * stay ≤ 1e6 so Σ over any in-degree < 9.2e12 in BIGINT. Output:
    * (side ∈ hub|authority, node, score) — every src node gets a hub
    * row, every dst node an authority row. */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "hits needs at least one round")
    val e = edges.select(col("src"), col("dst"))
    var hub = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val hb = broadcast(hub)
      val ar = e.join(hb, e("src") === hb("node"))
        .groupBy(col("dst").as("n2")).agg(sum(col("h")).as("s"))
      val amax = ar.agg(max(col("s")).as("mx"))
      auth = ar.crossJoin(broadcast(amax))
        .select(col("n2").as("node"), expr("(s * 1000000) div mx").as("a"))
      val ab = broadcast(auth)
      val hr = e.join(ab, e("dst") === ab("node"))
        .groupBy(e("src").as("n2")).agg(sum(col("a")).as("s"))
      val hmax = hr.agg(max(col("s")).as("mx"))
      hub = hr.crossJoin(broadcast(hmax))
        .select(col("n2").as("node"), expr("(s * 1000000) div mx").as("h"))
    }
    hub.select(lit("hub").as("side"), col("node"), col("h").as("score"))
      .unionAll(auth.select(lit("authority").as("side"), col("node"),
        col("a").as("score")))
  }
}
