package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components by min-label propagation — the clustering step of a
 * near-duplicate pipeline: candidate pairs (MinHash/SimHash/Jaccard) are
 * edges; each component keeps one representative (its minimum id).
 *
 * Algorithm: every vertex starts labeled with its own id; each round every
 * vertex takes the minimum of its label and its neighbors' labels; stop at
 * fixpoint. Converges in O(component diameter) rounds — near-dup clusters
 * are shallow (pairs chain through shared content), so typically 2-4
 * rounds. Deterministic: the fixpoint (min id reachable) is unique
 * regardless of execution order.
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

  /**
   * @param edges two-column DataFrame of undirected edges (ids must be a
   *              numeric type); isolated vertices may be supplied via
   *              `vertices`
   * @param reliableCheckpoints use fault-tolerant `checkpoint()` (requires
   *              `SparkContext.setCheckpointDir`) instead of executor-local
   *              checkpoints
   * @return (id, component) where component = min id in the component
   */
  def apply(edges: DataFrame, vertices: Option[DataFrame] = None,
      maxIterations: Int = 25, reliableCheckpoints: Boolean = false): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint(true) else df.localCheckpoint(true)
    val Seq(ca, cb) = edges.columns.toSeq.take(2)
    val sym = ckpt(edges.select(col(ca).as("a"), col(cb).as("b"))
      .union(edges.select(col(cb).as("a"), col(ca).as("b")))
      .distinct())

    // Iterate only over vertices that have edges: isolated vertices can
    // never change label, so they are appended self-labeled at the end
    // instead of riding through every propagation join (in near-dup graphs
    // the edge subgraph is a tiny fraction of the corpus).
    val edgeVerts = sym.select(col("a").as("id")).distinct()

    // Self-loops make one join+groupBy compute min(own, neighbors) in a
    // single pass — no second join to merge the previous label back in.
    val symAll = ckpt(sym
      .union(edgeVerts.select(col("id").as("a"), col("id").as("b"))))

    // SUM over zero rows is SQL NULL — null-safed to 0 so an edgeless
    // input (a clean corpus with no near-dup pairs) converges on the
    // first round instead of NPE-ing in the compare.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component").cast("decimal(38,0)")))
        .head.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)

    var labels = ckpt(edgeVerts.select(col("id"), col("id").as("component")))
    // Labels are per-vertex monotone non-increasing, so the total is
    // strictly decreasing until fixpoint: an unchanged sum IS convergence
    // (decimal sum — a 64-bit sum could overflow at cluster-scale id
    // ranges). One scalar to the driver per round, no row compare.
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val updated = ckpt(symAll
        .join(labels, symAll("b") === labels("id"))
        .groupBy(symAll("a").as("id"))
        .agg(min(col("component")).as("component")))
      val s = labelSum(updated)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = updated
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIterations rounds")
    vertices match {
      case None => labels
      case Some(v) =>
        val vs = v.select(col(v.columns.head).as("id"))
        val isolated = vs.join(edgeVerts.withColumnRenamed("id", "eid"),
            vs("id") === col("eid"), "left_anti")
          .select(col("id"), col("id").as("component"))
        labels.union(isolated)
    }
  }
}
