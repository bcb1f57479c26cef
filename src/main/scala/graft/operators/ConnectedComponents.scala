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
 *   - `localCheckpoint` per round truncates the lineage so the plan
 *     doesn't grow with the iteration count (the classic iterative-Spark
 *     failure mode);
 *   - the driver only ever sees one Boolean per round (the convergence
 *     check), never row data.
 */
object ConnectedComponents {

  /**
   * @param edges two-column DataFrame of undirected edges (ids must be a
   *              numeric type); isolated vertices may be supplied via
   *              `vertices`
   * @return (id, component) where component = min id in the component
   */
  def apply(edges: DataFrame, vertices: Option[DataFrame] = None,
      maxIterations: Int = 25): DataFrame = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2)
    val sym = edges.select(col(ca).as("a"), col(cb).as("b"))
      .union(edges.select(col(cb).as("a"), col(ca).as("b")))
      .distinct()
      .localCheckpoint(true)

    // Iterate only over vertices that have edges: isolated vertices can
    // never change label, so they are appended self-labeled at the end
    // instead of riding through every propagation join (in near-dup graphs
    // the edge subgraph is a tiny fraction of the corpus).
    val edgeVerts = sym.select(col("a").as("id")).distinct()

    var labels = edgeVerts.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val nbMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("id"))
        .agg(min(col("component")).as("nb_min"))
      // Carry the previous label through the projection so convergence is
      // a filter over the checkpointed result, not another join.
      val updated = labels.as("l")
        .join(nbMin.as("n"), col("l.id") === col("n.id"), "left")
        .select(col("l.id").as("id"), col("l.component").as("prev"),
          least(col("l.component"), coalesce(col("n.nb_min"), col("l.component")))
            .as("component"))
        .localCheckpoint(true)
      val changed = updated.filter(col("component") =!= col("prev"))
        .limit(1).count()
      converged = changed == 0
      labels = updated.select("id", "component")
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
