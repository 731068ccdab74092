package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns pairwise near-duplicate EDGES (MinHash/SimHash/embedding
  * candidates) into duplicate CLUSTERS, so a corpus dedup can keep one
  * representative per component (cf. the union-find pass every
  * large-scale dedup pipeline ends with).
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with its own id; each round (1) labels flow across
  * edges (both directions) and every node keeps the minimum seen, then
  * (2) every node jumps to its label's label — the classic
  * pointer-doubling step, sound because label(v) is always a
  * same-component node with a ≤ label. Propagation alone needs
  * O(diameter) rounds; the jump contracts label chains geometrically,
  * so long chains converge in O(log diameter) rounds.
  *
  * Scale notes:
  *  - Each round is one equi-join (edges ⨝ labels, shuffle keyed by
  *    node id) + one min-aggregate — all Catalyst-planned; no driver
  *    state beyond the loop counter.
  *  - `localCheckpoint` truncates lineage each round: without it the
  *    plan doubles per iteration and the optimizer re-walks it.
  *  - For graphs with long chains at 100 TB, switch to the
  *    large-star/small-star variant (Kiveris et al., "Connected
  *    Components in MapReduce and Beyond"), which contracts diameter
  *    logarithmically; the per-round plumbing here is unchanged.
  *  - Convergence detection: labels only ever DECREASE, so the sum of
  *    all labels is a monotone potential function — fixpoint iff the
  *    sum is unchanged between rounds. That makes the probe a single
  *    scan of the just-checkpointed labels (exact decimal sum, no
  *    overflow at any id range) instead of a join against the previous
  *    round.
  */
object ConnectedComponents {

  /** @param ids   one column `id` — every node (isolated nodes keep
    *              their own id as cluster)
    * @param edges columns `id1`, `id2` — undirected pairs
    * @return (id, cluster_id) where cluster_id = min id in the component
    */
  def run(ids: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val bi = edges.select(col("id1").as("a"), col("id2").as("b"))
      .unionByName(edges.select(col("id2").as("a"), col("id1").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = ids.select(col("id"), col("id").as("cluster_id"))
        .localCheckpoint()
      def labelSum(df: DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head()
          .getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
      var prevSum = labelSum(labels)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val msgs = bi.join(labels, bi("a") === labels("id"))
          .select(bi("b").as("id"), labels("cluster_id"))
        val propagated = labels.unionByName(msgs)
          .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        // pointer jump: follow cluster_id one more hop through the
        // (pre-jump) label table — left join because a label may be a
        // component-min node that only appears as its own id
        val jumpTo = propagated
          .select(col("id").as("jid"), col("cluster_id").as("jlabel"))
        val updated = propagated
          .join(jumpTo, propagated("cluster_id") === jumpTo("jid"), "left")
          .select(propagated("id"),
            least(propagated("cluster_id"), col("jlabel")).as("cluster_id"))
          .localCheckpoint()
        val newSum = labelSum(updated)
        labels = updated
        converged = newSum.compareTo(prevSum) == 0
        prevSum = newSum
        iter += 1
      }
      require(converged, s"connected components did not converge in $maxIter rounds")
      labels
    } finally bi.unpersist()
  }
}
