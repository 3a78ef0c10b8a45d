package graft.operators

import org.apache.spark.sql.DataFrame
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
    * directions. Every node must have out-degree ≥ 1 (true for
    * symmetrized edges); dangling-node mass is therefore not a case
    * this operator needs to redistribute.
    *
    * Returns (node, rank) with rank in micro-units. Iterations are
    * O(edges) shuffles each; the loop runs on the driver but every
    * data pass is distributed. `iters` is small and fixed (plan depth
    * grows linearly; callers wanting >8 rounds should checkpoint).
    * `broadcastRanks = false` for graphs whose node set itself exceeds
    * broadcast size — iterations then shuffle-join on src. */
  def pageRank(edges: DataFrame, iters: Int,
               broadcastRanks: Boolean = true): DataFrame = {
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
  }
}
