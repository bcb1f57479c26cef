package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over pair tables (near-dup graphs, co-engagement
 * graphs): per-node degree and triangle participation. North-star
 * extensions (SURVEY.md §2.3 Tier B) — the structure report read after
 * any dedup pass: a high-degree node is a boilerplate hub (its text
 * matches everything), and triangle density separates tight clone
 * clusters (every pair similar — safe to collapse) from star-shaped
 * accidental chains (only hub links — collapsing merges unrelated docs).
 * Complements [[ConnectedComponents]]: components say WHICH docs cluster,
 * this says HOW tightly.
 *
 * Scale shape: all joins are equi-joins on node ids over the PAIR TABLE
 * (dedup output — orders of magnitude under the corpus). Triangles use
 * the standard ordered-wedge formulation: with every edge stored
 * (a < b), a wedge (a<b, b<c) closes iff edge (a, c) exists — each
 * triangle is counted exactly once, and the wedge join is bounded by
 * Σ deg²(node) of the (small) graph, the same budget the candidate
 * generation that produced the pairs already paid. Counts are exact
 * integers — bit-identical SQL replay.
 */
object GraphOps {

  /** Canonicalize an edge table to distinct (a < b) pairs on the first
    * two columns, dropping self-loops. */
  private def canonical(edges: DataFrame): DataFrame = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2)
    edges.select(least(col(ca), col(cb)).as("a"),
        greatest(col(ca), col(cb)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Both directed copies of each canonical edge from ONE pass over `e`
    * (r16 opt, guide §1.2/§5): `union(e, e.swapped)` evaluates the whole
    * upstream subtree once per branch — for a cached source that is a
    * second cache scan, for a derivation the entire pipeline twice. The
    * 2×-explode emits both directions per input row in a single
    * evaluation; identical rows. */
  private def bothDirections(e: DataFrame): DataFrame =
    e.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("__d"))
      .select(col("__d.src").as("src"), col("__d.dst").as("dst"))

  /** Both endpoints of each edge from one pass over `e` (same rationale
    * as [[bothDirections]]), as a single `id` column. */
  private def endpoints(e: DataFrame): DataFrame =
    e.select(explode(array(col("a"), col("b"))).as("id"))

  /**
   * Synchronous majority label propagation over a pair graph: each round,
   * every node takes the most common label among its neighbors AND itself
   * (self-loop), ties broken by (vote count desc, label asc) — fully
   * deterministic, no convergence race. The training-data face: seed
   * labels (language, source, quality verdict) spread across a near-dup
   * graph so a cluster votes itself to a consistent label, flagging docs
   * whose metadata disagrees with their duplicates (mislabeled language,
   * misattributed source).
   *
   * Scale shape: per round, ONE equi-join (directed edges × current
   * labels on the src key) and ONE hash aggregation on (dst, label) with
   * map-side partials, then a per-node `WindowGroupLimit` argmax cut —
   * the [[ConnectedComponents]] iteration budget exactly, with `rounds`
   * fixed (no driver-side convergence loop, the plan is static). The
   * edge list is the DEDUP PAIR TABLE (orders of magnitude under the
   * corpus); nodes without edges ride the self-loop and keep their seed.
   */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      rounds: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val Seq(idC, labC) = nodes.columns.toSeq.take(2)
    val seed = nodes.select(col(idC).as("id"), col(labC).as("label"))
    val e = canonical(edges)
    val directed = graft.SparkUtil.trackCache(
      bothDirections(e)
        .union(seed.select(col("id").as("src"), col("id").as("dst"))))
    var labels = seed
    for (_ <- 1 to rounds) {
      val votes = directed
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("votes").desc, col("label").asc)
      labels = votes.withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") === 1)
        .select(col("dst").as("id"), col("label"))
    }
    labels.join(seed.select(col("id"), col("label").as("__seed")), Seq("id"))
      .select(col("id"), col("label"),
        (col("label") =!= col("__seed")).as("changed"))
  }

  /**
   * Integer-arithmetic PageRank over an undirected pair graph (Page,
   * Brin, Motwani, Winograd, "The PageRank Citation Ranking", 1999 — the
   * original non-normalized per-node form `PR(v) = (1−d) + d·Σ PR(u)/deg(u)`,
   * here with every division an INTEGER floor so the fixed-point replays
   * bit-identically in SQL): ranks start at `scale` per node and run
   * `rounds` synchronous updates; damping d = dampNum/dampDen. Rank mass
   * is conserved up to floor truncation (spec-pinned), so scores are
   * comparable across runs and engines. The training-data face:
   * centrality over a co-engagement or near-dup graph ranks the items /
   * canonical docs that anchor the corpus — degree says how MANY
   * neighbors, PageRank says how IMPORTANT they are.
   *
   * Scale shape: the edge table joins its degree ONCE and caches; per
   * round, ONE equi-join (cached (src,dst,deg) × current ranks on src —
   * the rank side is exactly one row per node) and ONE hash aggregation
   * on dst with map-side partials — the [[ConnectedComponents]] /
   * [[labelPropagation]] iteration budget, with `rounds` fixed so the
   * plan is static (no driver-side convergence loop). Isolated nodes
   * don't appear (no edges → no rank flow); dangling mass can't exist in
   * a symmetric graph (every node with an out-edge has the in-edge back).
   */
  def pageRank(edges: DataFrame, rounds: Int = 3, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    require(dampDen > dampNum && dampNum > 0,
      s"damping $dampNum/$dampDen must be in (0, 1)")
    val teleport = (dampDen - dampNum) * scale / dampDen
    // Cache the canonical edge list: dirx scans it twice (the union), and
    // deg is referenced by the rank seed, every round's aggregate input
    // (via withDeg) and the final degree join — without the cache the
    // whole upstream edge-generation pipeline re-runs once per reference
    // (r16 opt: q143 measured two full single-task co-engagement builds
    // per query). deg itself is node-bounded and consumed three times, so
    // it is cached too (A/B-measured: both caches together beat either
    // alone and the uncached original in matched solo runs).
    val e = graft.SparkUtil.trackCache(canonical(edges))
    val dirx = bothDirections(e)
    val deg = graft.SparkUtil.trackCache(dirx.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("deg")))
    val withDeg = graft.SparkUtil.trackCache(dirx.join(deg, Seq("src")))
    var ranks = deg.select(col("src").as("id"),
      lit(scale).cast("long").as("rank"))
    for (_ <- 1 to rounds) {
      ranks = withDeg
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank div deg")).as("__s"))
        .select(col("dst").as("id"),
          expr(s"$teleport + ($dampNum * __s) div $dampDen").as("rank"))
    }
    ranks.join(deg.select(col("src").as("id"), col("deg").as("degree")),
        Seq("id"))
      .select(col("id"), col("rank"), col("degree"))
  }

  /**
   * k-core of an undirected pair graph by synchronous peeling (Seidman,
   * "Network structure and minimum degree", Social Networks 1983): each
   * round drops every node whose CURRENT degree is below k, with all its
   * edges; after `rounds` rounds the survivors with final degree >= k
   * are reported with their within-core degree. When a round removes
   * nothing the iteration has reached the true k-core (peeling is
   * confluent — removal order never changes the fixpoint), which the
   * caller can assert by comparing `rounds` and `rounds + 1` outputs.
   * The training-data face: the near-dup graph's 2-core separates
   * genuinely interlinked clone clusters from the pendant/chain edges a
   * single boilerplate overlap creates — CC says WHICH docs cluster,
   * nodeStats says how tight each node is, the k-core says which part
   * of the graph survives when weakly-attached members are discarded.
   *
   * Scale shape: per round ONE degree aggregation (map-side partials)
   * and TWO left-semi equi-joins on node ids, all over the PAIR TABLE
   * (dedup output, orders under the corpus) — the [[labelPropagation]]
   * iteration budget. Each round's edge set is localCheckpointed (the
   * [[ConnectedComponents]] treatment): a round references its
   * predecessor three times (two degree-union scans + the semi-join
   * probe), so without lineage truncation the logical plan is 3^rounds
   * copies of the upstream pair-generation subtree — AQE's per-update
   * explainString alone OOMs on that before any data moves. Exact
   * integer counts — bit-identical SQL replay as unrolled CTE stages.
   */
  def kCore(edges: DataFrame, k: Int = 2, rounds: Int = 3): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1 && rounds <= 8, s"rounds=$rounds must be in [1, 8]")
    var e = canonical(edges).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val surv = endpoints(e)
        .groupBy(col("id")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k)
        .select(col("id"))
      e = e.join(surv.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(surv.select(col("id").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
    }
    endpoints(e)
      .groupBy(col("id")).agg(count(lit(1)).as("core_degree"))
      .filter(col("core_degree") >= k)
  }

  /**
   * Degree distribution of an undirected pair graph in power-of-two
   * bands (band = bit length of the degree, the q47 `length(bin(v))`
   * trick): node counts per band with the band's exact [lo, hi] degree
   * range — the one-page shape report behind hub detection (a fat top
   * band = boilerplate magnets) at bounded output size (<= 63 rows)
   * regardless of graph size.
   *
   * Scale shape: one degree aggregation over the pair table (map-side
   * partials, bounded by node count), then ONE hash aggregation on the
   * band key — the corpus-scale analogue never shuffles anything wider
   * than the node id. Exact integer arithmetic throughout.
   */
  def degreeBands(edges: DataFrame): DataFrame = {
    val e = canonical(edges)
    endpoints(e)
      .groupBy(col("id")).agg(count(lit(1)).as("__deg"))
      .select(col("id"), length(bin(col("__deg"))).cast("int").as("band"),
        col("__deg"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_nodes"), min(col("__deg")).as("min_degree"),
        max(col("__deg")).as("max_degree"))
  }

  /** Per-node degree and triangle count over an undirected pair table:
    * one row per node appearing in an edge, with `degree` (distinct
    * neighbors) and `n_triangles` (triangles the node participates in). */
  def nodeStats(edges: DataFrame): DataFrame = {
    val e = graft.SparkUtil.trackCache(canonical(edges))
    val degrees = endpoints(e)
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    // ordered wedges (a<b<c) closed by edge (a, c): each triangle once
    val triangles = e.as("x").join(e.as("y"), col("x.b") === col("y.a"))
      .join(e.as("z"),
        col("x.a") === col("z.a") && col("y.b") === col("z.b"), "left_semi")
      .select(col("x.a").as("ta"), col("x.b").as("tb"), col("y.b").as("tc"))
    // one pass over the WEDGE JOIN, not three: the 3-way endpoint union
    // re-ran the (expensive, uncached) triangle join once per branch
    // (r16 opt — same explode rewrite as bothDirections/endpoints)
    val perNode = triangles
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    degrees.join(perNode, Seq("id"), "left_outer")
      .select(col("id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
