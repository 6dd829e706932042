package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list, in exact integer micro-units.
  *
  * Serves the training-data curation story the near-dup family builds:
  * run over the similarity graph (e.g. the co-shingle pairs of
  * [[graft.dedup.Dedup.coShinglePairs]]) it ranks template hubs — the
  * boilerplate documents that near-duplicate half the corpus score
  * orders of magnitude above singleton-ish pages, which is exactly the
  * priority order a scrub/review queue wants. The same operator covers
  * link-graph centrality when edges come from a crawl frontier.
  *
  * Determinism: ranks live in integer micro-units (1 000 000 = mass
  * 1.0) and the damping update is the integer shadow of the standard
  * 0.15 + 0.85 · Σ r(u)/deg(u):
  *
  *   r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div deg(u))) div 100
  *
  * Every per-edge contribution is a floor division and the combine is
  * a sum of longs, so the result is exact — shuffle/merge order cannot
  * change a bit, which is what lets a DuckDB oracle (same floor
  * arithmetic, `//`) grade it by hash. Floors bleed a little mass per
  * round (bounded by #edges micro-units); rankings are what the
  * operator promises, not a stochastic-matrix invariant.
  *
  * Scale shape: out-degrees are joined onto the edge set ONCE up
  * front (one shuffle, then localCheckpoint — the edge table is the
  * big side and must not be recomputed per round). Each iteration is
  * one node-cardinality join (rank table onto edges — sort-merge or
  * broadcast as AQE sees fit) plus one shuffle on dst for the
  * contribution sum. O(iterations) rounds, lineage truncated per
  * round exactly like [[ConnectedComponents]]; nothing driver-side,
  * nothing pairwise beyond the given edges.
  */
object PageRank {

  /** Rank every vertex of `edges` (directed (src, dst) rows; callers
    * with undirected graphs pass both orientations). Vertices with no
    * out-edge would be dangling mass sinks; over a symmetrized graph
    * they do not exist, and over a directed graph they are simply
    * absent from the rank table (documented, standard sparse
    * treatment). Output: (id, rank_micro) — one row per vertex with
    * out-degree >= 1. */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // one edge-cardinality join, materialized once for all rounds
    val e = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    val nodes = deg.select(col("src").as("id"))
    var ranks = nodes.select(col("id"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iterations) {
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst").as("id"), expr("rank_micro div outdeg").as("c"))
      val sums = contribs.groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100"))
            .as("rank_micro"))
        .localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank: same integer-exact damping update, but the
    * teleport mass lands ONLY on `seeds` — rank becomes proximity to
    * the seed set weighted by connectivity strength, the blast-radius
    * score decontamination wants (BFS answers "how many hops from a
    * known-bad doc"; this answers "how much of its influence reaches
    * me", which separates a one-edge brush from a dense entanglement).
    *
    *   r⁰(v)  = 1 000 000 · [v ∈ seeds]
    *   r'(v)  = 150000 · [v ∈ seeds] + (85 · Σ_{u→v} r(u) div deg(u)) div 100
    *
    * Unreached vertices keep rank 0 (they appear in the output — their
    * zero IS the answer). Same per-round shape and determinism as
    * [[pageRank]]; seeds outside the graph contribute nothing. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    val nodes = deg.select(col("src").as("id"))
      .join(seeds.select(col("id"), lit(true).as("is_seed")), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint()
    val teleport = when(col("is_seed"), lit(150000L)).otherwise(lit(0L))
    var ranks = nodes.select(col("id"),
      when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)).as("rank_micro"))
    for (_ <- 1 to iterations) {
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst").as("id"), expr("rank_micro div outdeg").as("c"))
      val sums = contribs.groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(sums, Seq("id"), "left")
        .select(col("id"),
          (teleport + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100"))
            .as("rank_micro"))
        .localCheckpoint()
    }
    ranks.orderBy(col("id"))
  }
}
