package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023): cluster the corpus, compare pairs ONLY within a
  * cluster with exact cosine, and keep one representative per semantic
  * duplicate group. The clustering bounds the quadratic pair work: with
  * k ∝ N / targetClusterSize centroids the per-cluster comparison cost is a
  * constant, so total work stays linear in the corpus while catching the
  * near-duplicates a hash-based dedup (exact / MinHash) misses — paraphrases
  * and re-encodings land in the same cluster with cosine ≈ 1.
  *
  * Scale shape (100 TB): the centroid assignment is shuffle-free (broadcast
  * centroids, one scan — [[Similarity.assignToCentroids]]); the pair stage
  * shuffles once on `cell` and compares within partitions. Cluster size is
  * the scaling contract: size the centroid count so clusters hold
  * ~`maxClusterSize` vectors, and the deterministic cap (lowest ids
  * participate, the tail is kept unconditionally) converts an unexpected
  * skewed cluster into bounded work instead of an O(m²) straggler — same
  * policy as [[Dedup]]'s capped LSH buckets, and exactly reproducible by an
  * independent engine, unlike a sampled cap.
  */
object SemDedup {

  /** Per-vector keep/drop verdict: `(id, cell, keep)` — `keep = 0` iff a
    * lower-id vector in the same cluster (within the participation cap) has
    * cosine ≥ `threshold` with this one. Ids drop at most once (DISTINCT on
    * the dropped side), and vectors beyond the cap are kept unconditionally.
    */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centers: Seq[(Int, Array[Float])],
      threshold: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    val assign = Similarity.assignToCentroids(corpus, idCol, vecCol, centers)
    val withVec = assign.join(
      corpus.select(col(idCol).cast("long").as(idCol), col(vecCol)), Seq(idCol))
    // Deterministic participation cap: the m lowest ids per cluster. The
    // window partitions by `cell`, whose cardinality the caller sizes to the
    // corpus (k ∝ N) — this is NOT a low-cardinality window at scale when
    // that contract holds, and the cap bounds the per-partition sort input.
    val part = withVec
      .withColumn("__rn",
        row_number().over(Window.partitionBy("cell").orderBy(col(idCol))))
      .where(col("__rn") <= maxClusterSize)
      .select(col(idCol), col("cell"), col(vecCol))
    val left = part.select(col(idCol).as("id_a"), col("cell"),
      col(vecCol).as("__va"))
    val right = part.select(col(idCol).as("id_b"), col("cell"),
      col(vecCol).as("__vb"))
    val drops = left.join(right, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(Similarity.cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_b").as(idCol))
      .distinct()
      .withColumn("__dropped", lit(1))
    assign.join(drops, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        when(col("__dropped").isNull, 1).otherwise(0).as("keep"))
  }

  /** Cross-corpus semantic dedup — the INCREMENTAL form: drop candidate
    * rows (a new crawl) that are semantic near-dups of the reference
    * corpus (the data already kept). Same cluster-then-exact-cosine shape:
    * both sides assign to the shared centroids, and each candidate
    * compares only against reference members of its own cell, so the
    * cross product never materializes. The reference side carries the
    * same deterministic lowest-id participation cap; candidates are
    * always judged (a capped cell keeps its candidates — fail-open, like
    * the batch cap).
    *
    * Output: one row per candidate — (id, cell, keep) with keep = 0 iff
    * some in-cap reference vector in the same cell has cosine ≥ threshold.
    */
  def crossSemanticDedup(
      candidates: DataFrame,
      reference: DataFrame,
      idCol: String,
      vecCol: String,
      centers: Seq[(Int, Array[Float])],
      threshold: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    val candAssign = Similarity.assignToCentroids(candidates, idCol, vecCol,
      centers)
    val candVec = candAssign.join(
      candidates.select(col(idCol).cast("long").as(idCol), col(vecCol)),
      Seq(idCol))
    val refAssign = Similarity.assignToCentroids(reference, idCol, vecCol,
      centers)
    val refPart = refAssign
      .join(reference.select(col(idCol).cast("long").as(idCol), col(vecCol)),
        Seq(idCol))
      .withColumn("__rn",
        row_number().over(Window.partitionBy("cell").orderBy(col(idCol))))
      .where(col("__rn") <= maxClusterSize)
      .select(col(idCol).as("__ref_id"), col("cell"),
        col(vecCol).as("__rv"))
    val dropped = candVec
      .join(refPart, Seq("cell"))
      .where(Similarity.cosine(col(vecCol), col("__rv")) >= threshold)
      .select(col(idCol))
      .distinct()
      .withColumn("__dropped", lit(1))
    candAssign.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        when(col("__dropped").isNull, 1).otherwise(0).as("keep"))
  }

  /** The deduplicated corpus itself (rows whose verdict is keep = 1). */
  def semanticDedupKept(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centers: Seq[(Int, Array[Float])],
      threshold: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    val verdicts = semanticDedup(corpus, idCol, vecCol, centers, threshold,
      maxClusterSize)
    corpus.join(
      verdicts.where(col("keep") === 1).select(col(idCol)),
      Seq(idCol))
  }
}
