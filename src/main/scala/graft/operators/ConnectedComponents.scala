package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components by min-label propagation — the clustering step of a
 * near-duplicate pipeline: candidate pairs (MinHash/SimHash/Jaccard) are
 * edges; each component keeps one representative (its minimum id).
 *
 * Algorithm: every vertex starts labeled with its own id; each round every
 * vertex takes the minimum of its label and its neighbors' labels, then
 * pointer-doubles (jumps to its component's component — path compression,
 * the Shiloach-Vishkin shortcut). Labels are always ids of connected
 * witnesses, so the jump is sound; the remaining hop distance to the
 * component minimum halves per round — O(log diameter) rounds (a 200-hop
 * chain converges in ~9; near-dup cliques in 2-3). Deterministic: the
 * fixpoint (min id reachable) is unique regardless of execution order.
 *
 * Scale design (100 TB posture):
 *   - each round is one shuffle (join on edge endpoint + groupBy min) —
 *     the standard iterative-join formulation; the alternating
 *     small-star/large-star optimization drops in here if diameters grow;
 *   - a checkpoint per round truncates the lineage so the plan doesn't
 *     grow with the iteration count (the classic iterative-Spark failure
 *     mode). Two modes: `localCheckpoint` (default — no extra I/O, but
 *     checkpoint blocks live on executors and die with them) and
 *     RELIABLE `checkpoint()` against the cluster checkpoint dir —
 *     the right choice on preemptible/spot executors, where losing one
 *     node mid-iteration would otherwise kill the whole job. Callers on
 *     real clusters: `spark.sparkContext.setCheckpointDir(...)` and pass
 *     `reliableCheckpoints = true`;
 *   - the driver only ever sees one scalar per round (the label-sum
 *     convergence check), never row data.
 */
object ConnectedComponents {

  /** Symmetrized-edge count at or under which the label computation runs
    * as ONE single-task union-find over the checkpointed edge list
    * instead of iterative join rounds: 2 M edges ≈ 32 MB in the task —
    * far under executor memory — and O(m α) beats 5+ rounds of fixed
    * per-round scheduling cost. Above it, the per-round cost is
    * data-dominated and the distributed iteration wins. */
  val LocalEdgeCutoff: Long = 2000000L

  /**
   * @param edges two-column DataFrame of undirected edges (ids must be a
   *              numeric type); isolated vertices may be supplied via
   *              `vertices`
   * @param reliableCheckpoints use fault-tolerant `checkpoint()` (requires
   *              `SparkContext.setCheckpointDir`) instead of executor-local
   *              checkpoints
   * @param alternatingStars use the Kiveris et al. two-phase
   *              large-star/small-star alternation (O(log²) rounds on any
   *              graph shape) instead of min-label propagation with
   *              pointer-doubling (also O(log diameter) rounds, lighter
   *              per round). Identical output (spec-pinned); both engines
   *              handle chain-shaped graphs inside the round budget.
   * @return (id, component) where component = min id in the component
   */
  def apply(edges: DataFrame, vertices: Option[DataFrame] = None,
      maxIterations: Int = 25, reliableCheckpoints: Boolean = false,
      alternatingStars: Boolean = false,
      localEdgeCutoff: Long = LocalEdgeCutoff): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint(true) else df.localCheckpoint(true)
    val Seq(ca, cb) = edges.columns.toSeq.take(2)
    // A null endpoint carries no connectivity (SQL equality never matches
    // it), so drop such edges up front. This also pins ONE failure mode
    // across engines: before the filter, the single-task fast path threw
    // a typed-decode NPE on a null endpoint while the iterative branch
    // silently dropped the same edge through join semantics — divergent
    // behavior on dirty input depending only on graph size.
    // Symmetrize with ONE pass over `edges`, not a self-union (r16 opt,
    // guide §1.2/§5): `edges` is usually an UNMATERIALIZED derivation —
    // the full near-dup pair pipeline in q120/q148/q99 — and a
    // union(edges, edges.swapped) re-runs that whole upstream once per
    // branch (measured: the two heaviest q120 stages were the same
    // candidate-scoring subtree, 25.9 s + 9.2 s task time, each writing
    // the same 14.9 MB shuffle). The 2×-explode emits both directions
    // from a single evaluation; same rows, same null handling, and the
    // checkpoint right above still cuts the lineage.
    val sym = ckpt(edges.select(col(ca).as("a"), col(cb).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("__e"))
      .select(col("__e.a").as("a"), col("__e.b").as("b"))
      .distinct())

    // SMALL-GRAPH FAST PATH — a hand-rolled CBO rule (the q49/q99
    // dispatcher pattern) decided from one bounded statistic: the
    // symmetrized edge count, a cheap count over the just-materialized
    // checkpoint. Every iterative round below costs a fixed scheduling
    // floor (edge join + label groupBy + jump join + checkpoint + one
    // convergence scalar ≈ 0.5-0.6 s at 32 shuffle partitions)
    // REGARDLESS of data size, so an 8-round convergence on a 200 K-edge
    // graph pays ~5 s of pure overhead — measured as the dominant term
    // of q99 at sf0.1 and of every small-corpus components call (q51,
    // q120, q148, q242). At or under `localEdgeCutoff` edges the whole
    // graph fits one task (2 M edges ≈ 32 MB), where a single
    // union-find pass with path compression labels it in O(m α) —
    // the designated per-partition escape hatch, dispatched ONLY under
    // a bounded count, like the Multimodal codec. Above the cutoff the
    // iterative engine takes over unchanged (its 100× numbers are the
    // round-9 tables). Output identical (spec-pinned): component = min
    // id, the same fixpoint the propagation computes. Long ids only —
    // the entity-resolution string-id path stays iterative.
    if (!alternatingStars &&
        sym.schema.forall(_.dataType ==
          org.apache.spark.sql.types.LongType) &&
        sym.count() <= localEdgeCutoff) {
      val spark = edges.sparkSession
      import spark.implicits._
      val labels = ckpt(sym.as[(Long, Long)].coalesce(1).mapPartitions { it =>
        // union by MIN root: the root of every tree is its component's
        // minimum id by construction, so find(k) IS the label — no
        // second min pass. Path compression keeps finds near-constant.
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        val keys = parent.keysIterator.toArray
        keys.iterator.map(k => (k, find(k)))
      }.toDF("id", "component"))
      return withIsolated(labels, labels.select(col("id")), vertices)
    }

    // Iterate only over vertices that have edges: isolated vertices can
    // never change label, so they are appended self-labeled at the end
    // instead of riding through every propagation join (in near-dup graphs
    // the edge subgraph is a tiny fraction of the corpus).
    val edgeVerts = sym.select(col("a").as("id")).distinct()

    if (alternatingStars) {
      // anti-join against the labels themselves (not edgeVerts): stars
      // drops self-loop edges, so a self-loop-only vertex is isolated
      // and must come back through the `vertices` append
      val labels = stars(sym, ckpt, maxIterations)
      return withIsolated(labels, labels.select(col("id")), vertices)
    }

    // Self-loops make one join+groupBy compute min(own, neighbors) in a
    // single pass — no second join to merge the previous label back in.
    val symAll = ckpt(sym
      .union(edgeVerts.select(col("id").as("a"), col("id").as("b"))))

    // SUM over zero rows is SQL NULL — null-safed to 0 so an edgeless
    // input (a clean corpus with no near-dup pairs) converges on the
    // first round instead of NPE-ing in the compare.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component").cast("decimal(38,0)")))
        .head().getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)

    // Non-numeric (e.g. string) vertex ids — the entity-resolution path,
    // where vertices are a distinct-value DICTIONARY — can't ride the
    // decimal-sum scalar; an exact changed-row probe against the
    // (checkpointed) previous labels replaces it. One extra equi-join
    // per round, bounded by the dictionary, never the corpus.
    val numericIds = edgeVerts.schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def anyChanged(updated: DataFrame, prev: DataFrame): Boolean =
      !updated.join(prev.withColumnRenamed("component", "__prev"), "id")
        .filter(col("component") =!= col("__prev")).isEmpty

    var labels = ckpt(edgeVerts.select(col("id"), col("id").as("component")))
    // Labels are per-vertex monotone non-increasing, so the total is
    // strictly decreasing until fixpoint: an unchanged sum IS convergence
    // (decimal sum — a 64-bit sum could overflow at cluster-scale id
    // ranges). One scalar to the driver per round, no row compare.
    var prevSum =
      if (numericIds) labelSum(labels) else java.math.BigDecimal.ZERO
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // propagate: min over own + neighbors' labels (self-loops fold the
      // own label in)
      val prop = symAll
        .join(labels, symAll("b") === labels("id"))
        .groupBy(symAll("a").as("id"))
        .agg(min(col("component")).as("component"))
      // pointer-double (path compression): jump component → the
      // PREVIOUS round's label of the component. A label is always the
      // id of a vertex connected to its owner (neighbors' labels are
      // witnesses; the jump target connects through the intermediate),
      // so labels stay valid and monotone — and if the previous table
      // covered hop distance d, propagate+jump covers 2d+1: O(log
      // diameter) rounds on chain-shaped graphs instead of one hop per
      // round (the q99 edge-form value chains measured 13 min-label
      // rounds; with the jump, 9). Jumping through the CHECKPOINTED
      // previous table (not prop itself) keeps the plan self-join-free
      // and the jump join is labels-sized, ≪ the edge join above.
      val updated = ckpt(prop
        .join(labels.select(col("id").as("__jid"), col("component").as("__jc")),
          prop("component") === col("__jid"), "left")
        .select(prop("id"),
          coalesce(col("__jc"), prop("component")).as("component")))
      if (numericIds) {
        val s = labelSum(updated)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
      } else {
        converged = !anyChanged(updated, labels)
      }
      labels = updated
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIterations rounds")
    withIsolated(labels, edgeVerts, vertices)
  }

  /**
   * Incremental labeling — the daily-ingest composition for a PERSISTED
   * label store (the component face of the q89 signature store): merge
   * yesterday's (id, component) labels with today's new edges without
   * re-deriving yesterday's pair graph. Each stored label is itself a
   * connectivity witness (an id–component edge), so the union graph
   * `{(id, component) : id ≠ component} ∪ newEdges` has exactly the
   * components of the full graph — old clusters collapse to 2-hop stars
   * regardless of their original diameter, so the iteration cost is
   * driven by today's delta, not yesterday's corpus. Spec pins equality
   * with a full recompute over the union pair set.
   */
  def incremental(labels: DataFrame, newEdges: DataFrame,
      vertices: Option[DataFrame] = None,
      maxIterations: Int = 25): DataFrame = {
    val Seq(li, lc) = labels.columns.toSeq.take(2)
    val Seq(ea, eb) = newEdges.columns.toSeq.take(2)
    val labelEdges = labels
      .select(col(li).as("a"), col(lc).as("b"))
      .filter(col("a") =!= col("b"))
    apply(labelEdges.union(newEdges.select(col(ea).as("a"), col(eb).as("b"))),
      vertices, maxIterations)
  }

  /** Append isolated vertices (no edges) self-labeled. */
  private def withIsolated(labels: DataFrame, edgeVerts: DataFrame,
      vertices: Option[DataFrame]): DataFrame = vertices match {
    case None => labels
    case Some(v) =>
      val vs = v.select(col(v.columns.head).as("id"))
      val isolated = vs.join(edgeVerts.withColumnRenamed("id", "eid"),
          vs("id") === col("eid"), "left_anti")
        .select(col("id"), col("id").as("component"))
      labels.union(isolated)
  }

  /**
   * Kiveris et al. ("Connected Components in MapReduce and Beyond",
   * SoCC'14) two-phase alternation. Each round rewires the edge set
   * toward a forest of stars centered at component minima:
   *
   *   - large-star(u): with m = min(N(u) ∪ {u}), emit (v, m) for every
   *     neighbor v > u — big neighbors reattach to u's best-known min;
   *   - small-star(u), over edges directed big→small: with m = min(N(u)),
   *     emit (u, m) and (v, m) for the other small neighbors — u's small
   *     fringe collapses onto its min.
   *
   * Both operations preserve connectivity, never grow the edge count
   * beyond O(|E|), and converge in O(log²) rounds regardless of diameter
   * — the fix for propagation's O(diameter) on chain-shaped graphs. At
   * the fixpoint every non-minimum vertex holds exactly one edge to its
   * component minimum, which IS the label assignment.
   *
   * Spark shape per round: two join+groupBy pairs (one per star op),
   * each one shuffle on the grouping endpoint; a checkpoint truncates
   * lineage; convergence compares an order-insensitive (count, hash-sum)
   * edge-set checksum — two scalars to the driver per round, never rows.
   */
  private def stars(sym: DataFrame, ckpt: DataFrame => DataFrame,
      maxIterations: Int): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val s = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = s.groupBy("a").agg(min("b").as("mn"))
      s.join(mins, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), least(col("a"), col("mn")).as("b"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = { // e directed: a > b
      val mins = e.groupBy("a").agg(min("b").as("mn"))
      e.join(mins, "a")
        .filter(col("b") =!= col("mn"))
        .select(col("b").as("a"), col("mn").as("b"))
        .union(mins.select(col("a"), col("mn").as("b")))
        .distinct()
    }
    // Order-insensitive edge-set fingerprint: (count, sum of row hashes)
    // as exact integers (decimal sum — no 64-bit overflow at scale).
    def checksum(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head()
      (r.getLong(0), Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    var cur = ckpt(sym.filter(col("a") > col("b")))
    var prevSum = checksum(cur)
    var converged = cur.isEmpty // an edgeless graph is already a fixpoint
    var iter = 0
    while (!converged && iter < maxIterations) {
      val next = ckpt(smallStar(largeStar(cur)))
      val s = checksum(next)
      converged = s == prevSum
      prevSum = s
      cur = next
      iter += 1
    }
    require(converged, s"alternating stars did not converge in $maxIterations rounds")
    // fixpoint: (v, min) for every non-min vertex; minima label themselves
    val roots = cur.select(col("b").as("id")).distinct()
      .join(cur.select(col("a").as("id2")), col("id") === col("id2"), "left_anti")
      .select(col("id"), col("id").as("component"))
    cur.select(col("a").as("id"), col("b").as("component")).union(roots)
  }
}
