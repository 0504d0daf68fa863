package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph helpers for dedup clustering: the pair-finding
  * operators ([[Dedup.dupePairs]], [[Dedup.minhashDupePairs]], …) emit
  * EDGES; turning them into keep/drop decisions needs the connected
  * components (each component = one duplicate cluster, canonical doc = min
  * id — or any policy applied per component).
  */
object Graph {

  /** Connected components by iterative min-label propagation: every node
    * starts as its own component and repeatedly adopts the smallest label
    * among itself and its neighbors, until a fixpoint (checked with a
    * 1-row aggregate per round, not a collect).
    *
    * Rounds needed = graph diameter. Duplicate clusters are near-cliques
    * (pair generators emit most intra-cluster pairs), so 2–3 rounds close
    * them; `maxIter` bounds adversarial chains. Each round is ONE shuffle
    * (join + min-aggregate on ids only — no payload); labels are cached
    * per round and the previous round unpersisted, so lineage stays flat
    * at any scale. For graphs with genuinely large diameters switch to the
    * O(log n)-round alternating-star algorithm (Kiveris et al. 2014) —
    * duplicate clustering never needs it.
    *
    * @param edges two id columns (`srcCol`, `dstCol`), undirected.
    * @return (id, component) for every node appearing in `edges`;
    *         component = min reachable id.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
    val adj = sym.distinct().persist()
    var labels = adj.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id")).persist()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // Each neighbor offers its current label; a node keeps the min of its
      // own and all offers.
      val offers = adj.join(labels, adj("v") === labels("id"))
        .select(col("u").as("id"), col("comp").as("offer"))
        .groupBy("id").agg(min(col("offer")).as("offer"))
      val next = labels.join(offers, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("offer"), col("comp"))).as("comp"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("comp", "__old"), "id")
        .where(col("comp") =!= col("__old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      it += 1
    }
    adj.unpersist()
    labels
  }

  /** Duplicate clusters from a pair list: (id, component, is_canonical) —
    * canonical = the component's smallest id (the keeper under the usual
    * keep-first policy; join any other per-component policy on `component`).
    */
  def dedupClusters(pairs: DataFrame, idA: String, idB: String): DataFrame = {
    val cc = connectedComponents(pairs, idA, idB)
    cc.select(col("id"), col("comp").as("component"),
      (col("id") === col("comp")).cast("int").as("is_canonical"))
  }
}
