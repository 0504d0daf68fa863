package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    * A diameter-D graph needs D propagation rounds plus ONE extra round
    * that observes zero changes, so the minimum sufficient `maxIter` is
    * D + 1. Duplicate clusters are near-cliques (pair generators emit most
    * intra-cluster pairs), so 3–4 rounds close them; `maxIter` bounds
    * adversarial chains. Each round is ONE shuffle (join + min-aggregate
    * on ids only — no payload). Each round's labels are re-seated on a
    * persisted row RDD (`createDataFrame` over `df.rdd`): the DataFrame
    * becomes a LEAF plan, so the logical tree stays constant-size across
    * rounds (`labels` feeds two branches per round — offers + next — and
    * an unbroken plan would double every iteration, blowing up planning
    * around round 10), while the RDD keeps its lineage (an executor loss
    * recomputes, unlike a localCheckpoint) and the PREVIOUS round is
    * unpersisted eagerly, so at most two label snapshots are ever
    * materialized. For graphs with genuinely large diameters switch to the
    * O(log n)-round alternating-star algorithm (Kiveris et al. 2014) —
    * duplicate clustering never needs it.
    *
    * @param edges two id columns (`srcCol`, `dstCol`), undirected.
    * @param strict when true (default), throw if `maxIter` rounds pass
    *        without reaching the fixpoint — partially-propagated labels
    *        split one real cluster into several components, each electing
    *        its own "canonical" keeper, so duplicates silently survive
    *        dedup. Pass false to accept partial labels (a warning is
    *        logged to stderr instead).
    * @return (id, component) for every node appearing in `edges`;
    *         component = min reachable id.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      strict: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
    val adj = sym.distinct().persist()
    val init = adj.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
    val labelSchema = init.schema
    var labelsRdd = init.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    var labels = spark.createDataFrame(labelsRdd, labelSchema)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // Each neighbor offers its current label; a node keeps the min of its
      // own and all offers.
      val offers = adj.join(labels, adj("v") === labels("id"))
        .select(col("u").as("id"), col("comp").as("offer"))
        .groupBy("id").agg(min(col("offer")).as("offer"))
      val nextRdd = labels.join(offers, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("offer"), col("comp"))).as("comp"))
        .rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val next = spark.createDataFrame(nextRdd, labelSchema)
      val changed = next.join(labels.withColumnRenamed("comp", "__old"), "id")
        .where(col("comp") =!= col("__old")).limit(1).count()
      labelsRdd.unpersist(blocking = false)
      labelsRdd = nextRdd
      labels = next
      converged = changed == 0L
      it += 1
    }
    adj.unpersist()
    if (!converged) {
      val msg = s"connectedComponents did not converge within $maxIter rounds: " +
        "labels are only partially propagated and would split real clusters. " +
        "Raise maxIter (rounds needed = graph diameter + 1 — the final " +
        "round observes the fixpoint)."
      if (strict) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] WARNING: $msg")
    }
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
