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
  *
  * The cap bounds TOTAL per-cell work but would still put all m² in-cap
  * comparisons of one oversized cell into ONE task (10⁸ cosines at the
  * 10 000 default — an hours-long straggler). The pair join is therefore
  * TILED: rows get a tile index from their in-cell rank (`tileSize` rows
  * per tile), each (tileA ≤ tileB) block becomes its own join key, and an
  * m-row cell's pairs spread over (m/tileSize)² independent tasks of at
  * most tileSize² comparisons. Cells within `tileSize` rows have exactly
  * one tile — no replication, the join key degenerates to `cell` — so the
  * contract-respecting path pays nothing.
  */
object SemDedup {

  /** Per-task pair bound: ceil(m / tileSize)² tasks of ≤ tileSize²
    * comparisons for an m-row (post-cap) cell. 1000² = 10⁶ cosines ≈ a
    * fraction of a second — a graceful ceiling when a caller violates the
    * k ∝ N sizing contract.
    */
  val DefaultTileSize = 1000

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
      maxClusterSize: Int = 10000,
      tileSize: Int = DefaultTileSize): DataFrame = {
    require(tileSize > 0, s"tileSize must be positive, got $tileSize")
    val assign = Similarity.assignToCentroids(corpus, idCol, vecCol, centers)
    val withVec = assign.join(
      corpus.select(col(idCol).cast("long").as(idCol), col(vecCol)), Seq(idCol))
    // Deterministic participation cap: the m lowest ids per cluster. The
    // window partitions by `cell`, whose cardinality the caller sizes to the
    // corpus (k ∝ N) — this is NOT a low-cardinality window at scale when
    // that contract holds, and the cap bounds the per-partition sort input.
    // The same rank yields the tile index; the per-cell tile count window
    // reuses the rank window's partitioning (no extra shuffle).
    val part = withVec
      .withColumn("__rn",
        row_number().over(Window.partitionBy("cell").orderBy(col(idCol))))
      .where(col("__rn") <= maxClusterSize)
      .withColumn("__tile", ((col("__rn") - 1) / tileSize).cast("int"))
      .withColumn("__nt",
        (ceil(max(col("__rn")).over(Window.partitionBy("cell")).cast("double")
          / tileSize)).cast("int"))
      .select(col(idCol), col("cell"), col(vecCol), col("__tile"), col("__nt"))
    // Ranks are ordered by id, so id_a < id_b implies tile_a <= tile_b: the
    // a-side replicates to its upper-triangle tile row, the b-side to its
    // tile column, and each (cell, ta, tb) block is one independent task.
    val left = part
      .withColumn("__tb", explode(sequence(col("__tile"), col("__nt") - 1)))
      .select(col(idCol).as("id_a"), col("cell"), col(vecCol).as("__va"),
        col("__tile").as("__ta"), col("__tb"))
    val right = part
      .withColumn("__ta", explode(sequence(lit(0), col("__tile"))))
      .select(col(idCol).as("id_b"), col("cell"), col(vecCol).as("__vb"),
        col("__ta"), col("__tile").as("__tb"))
    val drops = left.join(right, Seq("cell", "__ta", "__tb"))
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
      maxClusterSize: Int = 10000,
      tileSize: Int = DefaultTileSize): DataFrame = {
    require(tileSize > 0, s"tileSize must be positive, got $tileSize")
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
        col(vecCol).as("__rv"), ((col("__rn") - 1) / tileSize)
          .cast("int").as("__ta"))
    // Tile the capped reference side: a candidate compares against one ref
    // tile per task instead of the whole (possibly oversized) cell. The
    // per-cell tile count is at most |centers| rows — a broadcast.
    val ntPerCell = refPart.groupBy("cell")
      .agg((max(col("__ta")) + 1).as("__nt"))
    val candTiled = candVec
      .join(broadcast(ntPerCell), Seq("cell")) // cells without ref rows can't drop
      .withColumn("__ta", explode(sequence(lit(0), col("__nt") - 1)))
    val dropped = candTiled
      .join(refPart, Seq("cell", "__ta"))
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
      maxClusterSize: Int = 10000,
      tileSize: Int = DefaultTileSize): DataFrame = {
    val verdicts = semanticDedup(corpus, idCol, vecCol, centers, threshold,
      maxClusterSize, tileSize)
    corpus.join(
      verdicts.where(col("keep") === 1).select(col(idCol)),
      Seq(idCol))
  }
}
