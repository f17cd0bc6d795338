package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over candidate-pair edges — the cluster-resolution
  * step of a dedup pipeline: near-duplicate PAIRS (from banding, simhash
  * blocks, or cosine) become duplicate CLUSTERS, and each cluster keeps
  * one canonical survivor.
  *
  * Algorithm: min-label propagation. Every node starts as its own
  * component (label = own id); each round a node adopts the minimum label
  * among itself and its neighbors; fixpoint after at most
  * graph-diameter rounds. Deterministic — labels are ids, min is total.
  *
  * 100 TB notes: each round is one join + one groupBy (shuffle on node
  * id); `localCheckpoint` truncates the lineage each round so plan size
  * and stage retries stay O(1) instead of O(iterations) — the classic
  * iterative-DataFrame failure mode. Convergence is detected by counting
  * changed labels (an O(nodes) agg, not a collect). Dedup clusters are
  * short chains (diameter rarely exceeds single digits), so the loop is
  * bounded in practice; `maxIter` is the safety stop.
  */
object Components {

  /** Edges (aCol, bCol) → (id, component) with component = min node id
    * reachable. Nodes are the ids present in edges; isolated docs are
    * their own component and can be unioned in by the caller.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    val adj = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(edges.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint()
    var comp = adj.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = adj
        .join(comp.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src"))
        .agg(min(col("comp")).as("ncomp"))
      val updated = comp
        .join(neighborMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("next"))
        .localCheckpoint()
      val changed = updated.where(col("next") < col("comp")).count()
      comp = updated.select(col("id"), col("next").as("comp"))
      converged = changed == 0
      i += 1
    }
    comp
  }

  /** Components plus survivor marking: within each cluster the minimum id
    * is the canonical copy (`is_survivor`), everything else is a
    * removable duplicate.
    */
  def dedupClusters(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(edges, aCol, bCol)
      .withColumn("is_survivor", (col("id") === col("comp")).cast("int"))
}
