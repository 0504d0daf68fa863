package graft.ops

import graft.functions.HyperplaneFunctions.{hyperplane_band_keys, hyperplane_bits}
import graft.functions.HyperplaneOps
import graft.functions.TextFunctions.cosine_similarity
import graft.functions.TopKByScore.topk_by_score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, as a training-data pipeline needs:
  *   - [[bruteForceTopK]] — exact cosine top-k. The query side is broadcast,
  *     so the corpus streams once; the per-query top-k is a k-BOUNDED
  *     aggregate ([[graft.functions.TopKByScore]]), so the only exchange
  *     carries ≤ tasks × queries × k rows — never the scored corpus (a
  *     `row_number` window would put the whole corpus in one partition per
  *     query, the classic 100 TB collapse).
  *   - [[lshTopK]] / [[ivfTopK]] / [[cosinePairsLsh]] — blocked ANN:
  *     signature → bucket join (size-capped) → exact re-rank within buckets.
  *     corpus² never materializes; the only shuffles are on bucket keys and
  *     the k-bounded final aggregate.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column = cosine_similarity(a, b)

  /** Cap for LSH bucket joins — see [[Dedup.DefaultMaxBucketSize]]. */
  def defaultMaxBucketSize: Int = Dedup.DefaultMaxBucketSize

  /** Embedding dimensionality — a one-row job; callers that know the dim
    * pass it explicitly (`dim` parameter) and skip this probe entirely.
    */
  private def vectorDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot infer vector dimension of '$vecCol' from an empty corpus — " +
          "pass dim explicitly"))

  /** Scored (query_id, neighbor_id, cos) → per-query top-k with rank.
    * One k-bounded aggregate: map-side partial buffers hold ≤ k entries per
    * query, the exchange ships those buffers, reduce merges k-lists.
    * `distinctIds` dedupes neighbors that reach a query via several LSH/IVF
    * probe buckets inside the same aggregate — no dropDuplicates exchange.
    */
  private[ops] def topKPerQuery(scored: DataFrame, k: Int,
      distinctIds: Boolean): DataFrame =
    scored.groupBy("query_id")
      .agg(topk_by_score(col("cos"), col("neighbor_id"), k, distinctIds).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cos"), (col("pos") + 1).as("rank"))

  /** Greedy k-center diversity sample (farthest-point traversal, Gonzalez
    * 1985) over an embedding column — the coverage-maximizing selection a
    * curation pipeline uses to pick k REPRESENTATIVE-AND-DIVERSE documents
    * (seed sets, eval panels, coreset-style pruning): start from the
    * lowest id, then k−1 times pick the point FARTHEST (max min-distance,
    * d = 1 − cosine) from everything selected so far. The greedy result is
    * a 2-approximation of the optimal k-center cover under a metric; for
    * cosine "distance" it is the standard embedding-diversity heuristic.
    *
    * Scale shape: the selected set never exceeds k (broadcast as a
    * literal), and each round is ONE narrow scan — the per-point
    * min-distance is maintained INCREMENTALLY (`least(d, d_new_center)`),
    * so round i costs one cosine per point, not i of them; total work is
    * O(n·k) with k bounded jobs, each ending in a 1-row TakeOrdered. The
    * running state round-trips through a persisted row RDD (leaf plan,
    * eager unpersist — the [[Graph.connectedComponents]] pattern) so the
    * plan stays constant-size across rounds.
    *
    * Determinism / oracle-ability: per-center distances are ROUNDED to
    * `roundTo` decimals before the running min, and the argmax breaks ties
    * on (rounded d desc, id asc) — identical floating-point policy for any
    * engine replaying the chain, so the full selection sequence is
    * hash-matchable (the [[graft.SparkEntry]] oracle unrolls it into k
    * chained CTEs). Already-selected ids are excluded from the argmax, so
    * exact duplicates of a center (d = 0) can be selected only once each
    * and only after genuine diversity is exhausted.
    *
    * Output: (rank 0..k−1, id, dist) in selection order; `dist` is the
    * point's min-distance to the earlier selection at pick time (null for
    * the rank-0 seed) — rank-monotone non-increasing, and max over the
    * REMAINING corpus of that quantity is the k-cover radius.
    */
  def kCenterSample(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("v").isNotNull)
    val seed = vecs.orderBy("id").limit(1).collect()
      .headOption.getOrElse(throw new IllegalArgumentException(
        "kCenterSample: empty corpus"))
    val picks = Seq.newBuilder[(Int, Long, Option[Double])]
    picks += ((0, seed.getLong(0), None))
    var selected = List(seed.getLong(0))
    var curVec = seed.getSeq[Float](1)
    // The running min-distance state persists COLUMNAR each round (k is
    // small and bounded, so the k-deep lineage stays trivial to analyze —
    // no Row round-trip needed, unlike the unbounded-rounds
    // [[Graph.connectedComponents]] loop); each round's argmax job also
    // materializes the cache the next round builds on, and the previous
    // round's cache is dropped eagerly.
    var st = vecs.withColumn("d", lit(Double.PositiveInfinity))
    var prev: DataFrame = null
    var i = 1
    while (i < k) {
      val updated = st.select(col("id"), col("v"),
        least(col("d"),
          round(lit(1.0) - cosine(col("v"), typedLit(curVec)), roundTo))
          .as("d"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = updated.where(!col("id").isin(selected: _*))
        .orderBy(desc("d"), col("id")).limit(1).collect()
      if (prev != null) prev.unpersist(blocking = false)
      prev = updated
      st = updated
      top.headOption match {
        case None => i = k // fewer than k points — stop
        case Some(r) =>
          picks += ((i, r.getLong(0), Some(r.getDouble(2))))
          selected ::= r.getLong(0)
          curVec = r.getSeq[Float](1)
          i += 1
      }
    }
    if (prev != null) prev.unpersist(blocking = false)
    picks.result().toDF("rank", "id", "dist")
      .select(col("rank"), col("id").as(idCol), col("dist"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    * greedily pick k documents maximizing
    * `λ·cos(d, query) − (1−λ)·max_{s∈selected} cos(d, s)` — the
    * relevance-vs-redundancy trade-off a retrieval/eval-set builder uses
    * where [[kCenterSample]] optimizes pure coverage. Rank 0 is the most
    * RELEVANT document; each later pick balances relevance against
    * similarity to everything already chosen.
    *
    * Scale shape is [[kCenterSample]]'s: the selected set is ≤ k broadcast
    * literals; the per-point max-similarity-to-selected is maintained
    * INCREMENTALLY (`greatest(m, cos_to_new_pick)`), so each of the k
    * bounded rounds is ONE narrow scan ending in a 1-row TakeOrdered —
    * O(n·k) total, constant-size plan via per-round persist + eager
    * unpersist of the previous state.
    *
    * Determinism / oracle-ability: both cosines round to `roundTo`
    * decimals before entering the running max and the score, λ = 0.5 makes
    * the λ-scaling an exact power-of-two multiply, and the argmax breaks
    * ties on (score desc, id asc) — the same cross-engine floating-point
    * policy as [[kCenterSample]], so the full selection sequence is
    * hash-matchable by an unrolled SQL oracle. Output: (rank 0..k−1, id,
    * rel, max_sim) — `max_sim` is the pick-time max similarity to the
    * earlier selection (null for the rank-0 seed).
    */
  def mmrSelect(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Array[Float],
      k: Int,
      lambda: Double = 0.5,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .withColumn("r",
        round(cosine(col("v"), typedLit(queryVec.toIndexedSeq)), roundTo))
    val seed = vecs.orderBy(desc("r"), col("id")).limit(1).collect()
      .headOption.getOrElse(throw new IllegalArgumentException(
        "mmrSelect: empty corpus"))
    val picks = Seq.newBuilder[(Int, Long, Double, Option[Double])]
    picks += ((0, seed.getLong(0), seed.getDouble(2), None))
    var selected = List(seed.getLong(0))
    var curVec = seed.getSeq[Float](1)
    var st = vecs.withColumn("m", lit(-1.0))
    var prev: DataFrame = null
    var i = 1
    while (i < k) {
      val updated = st.select(col("id"), col("v"), col("r"),
        greatest(col("m"),
          round(cosine(col("v"), typedLit(curVec)), roundTo)).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = updated.where(!col("id").isin(selected: _*))
        .withColumn("score",
          lit(lambda) * col("r") - lit(1.0 - lambda) * col("m"))
        .orderBy(desc("score"), col("id"))
        .limit(1).collect()
      if (prev != null) prev.unpersist(blocking = false)
      prev = updated
      st = updated
      top.headOption match {
        case None => i = k
        case Some(r) =>
          picks += ((i, r.getLong(0), r.getDouble(2), Some(r.getDouble(3))))
          selected ::= r.getLong(0)
          curVec = r.getSeq[Float](1)
          i += 1
      }
    }
    if (prev != null) prev.unpersist(blocking = false)
    picks.result().toDF("rank", "id", "rel", "max_sim")
      .select(col("rank"), col("id").as(idCol), col("rel"), col("max_sim"))
  }

  /** Embedding outlier detection: the k corpus points FARTHEST from the
    * corpus centroid — mislabeled/garbage/off-distribution detection before
    * training (points whose embedding sits far from everything else).
    * All arithmetic is engine-independent fixed-point ([[kMeansQuantized]]'s
    * policies): coordinates quantize once to round(x·2^qBits), the centroid
    * is the exact integer per-dimension floor-mean (pmod-corrected
    * truncating division), and the score is the exact int64 squared L2
    * distance to it — so the full ranking is hash-matchable by a SQL
    * oracle. Scale shape: per-dim sums are ONE map-side-combined aggregate
    * (dim rows out, driver holds dim longs), the distance pass is narrow
    * (centroid broadcast as a literal), and the global top-k is the
    * k-bounded aggregate (ties break to the lower id). Output:
    * (rank 1..k, id, d2).
    */
  def embeddingOutliers(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 20,
      qBits: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val scale = (1L << qBits).toDouble
    val vecs = corpus
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => round(x.cast("double") * scale).cast("long"))
          .as("q"))
      .where(col("q").isNotNull)
    val cent = vecs.select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("i").agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .withColumn("m", expr("(s - pmod(s, n)) DIV n"))
      .orderBy("i").collect().map(_.getAs[Long]("m"))
    require(cent.nonEmpty, "embeddingOutliers: empty corpus")
    // Exactness envelope, enforced loudly: d2 rides the k-bounded
    // aggregate as a DOUBLE, so the ranking and the emitted d2 are
    // bit-exact only while the max possible d2 (≈ dim · 2^(2qBits+2) for
    // unit-range coords) stays under 2^53 — beyond it, near-ties collapse
    // and the hash-matchable-oracle promise silently breaks (dim 3072 at
    // qBits 20 is already over). Lower qBits for high-dim embeddings.
    require(cent.length.toLong <= ((1L << 53) >> (2 * (qBits + 1))),
      s"embeddingOutliers: dim=${cent.length} at qBits=$qBits exceeds the " +
        "2^53 double-exact ranking window; lower qBits")
    val mLit = typedLit(cent.toIndexedSeq)
    val d2 = aggregate(zip_with(col("q"), mLit, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    // Global k-bounded top-k: negative-id tie policy — TopKByScore breaks
    // equal scores on LOWER id, matching the oracle's (d2 DESC, id ASC).
    vecs.select(lit(0L).as("query_id"), col("id").as("neighbor_id"),
        d2.cast("double").as("cos"))
      .transform(topKPerQuery(_, k, distinctIds = false))
      .select(col("rank"), col("neighbor_id").as("id"),
        col("cos").cast("long").as("d2"))
  }

  /** Deterministic Lloyd k-means over an embedding column, on FIXED-POINT
    * coordinates: every coordinate is quantized once up front to
    * `round(x · 2^qBits)` (a pure function of the float), and every later
    * step — squared-L2 distances, argmin assignment, centroid means — is
    * EXACT 64-bit integer arithmetic. That makes the whole iteration
    * engine-independent: any system replaying the policy (floor-division
    * means via the pmod-corrected numerator, argmin ties to the lowest
    * centroid index, init = the k lowest-id vectors) reproduces the
    * assignment bit-for-bit, so the full Lloyd loop is hash-matchable
    * (the [[graft.SparkEntry]] oracle unrolls it into per-iteration CTE
    * blocks). Quantization error 2⁻²⁰ is orders below embedding noise;
    * this is the clustering front-end SemDeDup / IVF pipelines need, with
    * determinism a float implementation cannot offer across engines.
    *
    * Scale shape: centroids are a k×dim literal — broadcast, never joined;
    * the E-step is ONE narrow codegen'd pass (k fused zip_with/aggregate
    * distance folds per row, first-min argmin via `array_position`); the
    * M-step explodes (cluster, dim, q) longs and partially aggregates
    * map-side, so each iteration's only exchange carries ≤ tasks × k × dim
    * rows. Driver materialization is k×dim longs per round (the codebook
    * bound). Overflow headroom: |sum| per (cluster, dim) stays under
    * n · 2^(qBits+1) — at qBits = 20 that allows ~4×10¹² members per
    * cluster before approaching 2⁶³.
    *
    * Output: (idCol, cluster 0..k−1, d2) — final assignment against the
    * post-loop centroids; d2 is the exact integer squared distance in
    * quantized units.
    */
  def kMeansQuantized(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      qBits: Int = 20): DataFrame =
    kMeansQuantizedIvf(corpus, idCol, vecCol, k, iters, qBits)._1
      .select(col(idCol), col("cluster"), col("d2"))

  /** [[kMeansQuantized]] exposing what an integer-exact IVF index needs:
    * the final assignment WITH the quantized vectors, plus the post-loop
    * centroid codebook the assignment was computed against (k × dim
    * longs) — so a query side can replay cell probing (centroid d2,
    * ties to the lowest cid) with the same engine-independent integer
    * arithmetic, and a DuckDB oracle can hash-match the whole
    * probe-search-recall chain, not just the assignment
    * (`q_nprobe_sweep`'s value oracle).
    *
    * @return (assignment (idCol, q array<long>, cluster, d2), centers
    *         indexed by cid).
    */
  def kMeansQuantizedIvf(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      qBits: Int = 20): (DataFrame, IndexedSeq[Seq[Long]]) = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0: got $k, $iters")
    val scale = (1L << qBits).toDouble
    val vecs = corpus
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => round(x.cast("double") * scale).cast("long"))
          .as("q"))
      .where(col("q").isNotNull)
    var cents: IndexedSeq[Seq[Long]] = vecs.orderBy("id").limit(k).collect()
      .map(_.getSeq[Long](1)).toIndexedSeq
    require(cents.nonEmpty, "kMeansQuantized: empty corpus")

    def assigned(): DataFrame = {
      val ds = array(cents.map(c =>
        aggregate(zip_with(col("q"), typedLit(c), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)): _*)
      vecs.select(col("id"), col("q"), ds.as("__ds"))
        .select(col("id"), col("q"),
          (array_position(col("__ds"), array_min(col("__ds"))) - 1L)
            .as("cluster"),
          array_min(col("__ds")).as("d2"))
    }

    var it = 0
    while (it < iters) {
      // Exact integer mean: floor(s / n) via the pmod-corrected numerator
      // (s − ((s mod n) + n) mod n is exactly divisible, so truncating DIV
      // equals floor for any sign — the policy the oracle replays).
      val means = assigned()
        .select(col("cluster"), posexplode(col("q")).as(Seq("i", "x")))
        .groupBy("cluster", "i")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .withColumn("m", expr("(s - pmod(s, n)) DIV n"))
        .groupBy("cluster")
        .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
          s => s.getField("m")).as("c"))
        .collect().map(r => r.getLong(0).toInt -> r.getSeq[Long](1)).toMap
      // Empty clusters keep their previous centroid.
      cents = cents.indices.map(j => means.getOrElse(j, cents(j)))
      it += 1
    }
    (assigned().select(col("id").as(idCol), col("q"), col("cluster"),
      col("d2")), cents)
  }

  /** Integer-exact IVF search over a [[kMeansQuantizedIvf]] index: probe
    * the `nprobe` cells nearest the query by integer centroid d²
    * (ties to the low cid), rank in-cell candidates by integer
    * quantized-L2 (ties to the low id), top-k. Every step is 64-bit
    * integer arithmetic on the quantized coordinates, so the whole
    * probe→search chain is engine-replayable — `q_nprobe_sweep`'s value
    * oracle hash-matches it in DuckDB, and `nprobe = nlist` IS the exact
    * quantized-L2 truth (full probe covers every cell). The float-index
    * twin is [[ivfSearch]]; this one trades cosine-on-floats for
    * bit-exact determinism at the same candidate-pruning shape.
    *
    * @param asg     (id, q array<long>, cluster) — [[kMeansQuantizedIvf]]'s
    *                assignment (extra columns ignored).
    * @param centers the codebook, indexed by cid.
    * @param queries quantized query vectors (query id, q) — e.g. rows of
    *                `asg` itself for self-search; the id/vector column
    *                names are `queryId`/`queryVec`.
    * @return (query_id, neighbor_id, d2, rank 1..k), self excluded.
    */
  def ivfSearchQuantized(
      asg: DataFrame,
      centers: IndexedSeq[Seq[Long]],
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      nprobe: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1 && nprobe <= centers.length,
      s"nprobe must be in [1, ${centers.length}], got $nprobe")
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    val qv = queries.select(col(queryId).cast("long").as("qid"),
      col(queryVec).as("qq"))
    val cdArr = array(centers.map(c => d2(col("qq"), typedLit(c))): _*)
    val wProbe = Window.partitionBy("qid").orderBy(col("__cd"), col("cid"))
    val probes = qv
      .select(col("qid"), col("qq"),
        posexplode(cdArr).as(Seq("cid", "__cd")))
      .withColumn("__pr", row_number().over(wProbe))
      .where(col("__pr") <= nprobe)
      .select(col("qid"), col("qq"), col("cid").cast("int").as("cid"))
    // k-bounded aggregate, NOT a row_number window: the window form ships
    // EVERY scored candidate (≈ n·nprobe/nlist per query) through the
    // exchange and sorts each query's candidates in one task — the
    // corpus-sized-exchange shape the float twin ivfSearch already avoids
    // with topKPerQuery. Scores ride as −d2 (top-k keeps highest score,
    // ties to the lower id — exactly the (d2 ASC, neighbor ASC) order the
    // oracle replays). No forced broadcast of probes either: for
    // self-search probes is corpus-sized and the cid join plans fine.
    val scored = probes
      .join(asg.select(col(asg.columns.head).cast("long")
          .as("neighbor_id"), col("q"),
        col("cluster").cast("int").as("cid")), Seq("cid"))
      .where(col("neighbor_id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("neighbor_id"),
        (-d2(col("qq"), col("q")).cast("double")).as("cos"))
    topKPerQuery(scored, k, distinctIds = false)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cos")).cast("long").as("d2"), col("rank"))
  }

  /** Assign every corpus vector to its nearest centroid by cosine
    * similarity — the E-step of k-means / the coarse-assignment pass of an
    * IVF build, exposed directly so a pipeline can bucket a corpus by a
    * FIXED, externally-chosen centroid set (cluster-balanced sharding,
    * semantic partitioning, replaying an existing quantizer).
    *
    * Embarrassingly parallel and shuffle-free: centroids (k × dim floats —
    * tiny by construction) are broadcast, each partition scans its vectors
    * once. Ties break to the LOWEST centroid id, matching the
    * `ORDER BY score DESC, cell` convention an oracle re-derives. Null
    * vectors are skipped. Output: (id, cell).
    */
  def assignToCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centers: Seq[(Int, Array[Float])]): DataFrame = {
    require(centers.nonEmpty, "assignToCentroids needs at least one centroid")
    require(centers.map(_._2.length).distinct.size == 1,
      s"centroids must share one dimension, got ${centers.map(_._2.length).distinct}")
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      centers.sortBy(_._1).map { case (cell, v) =>
        var i = 0; var n = 0.0
        while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
        (cell, v, math.sqrt(n))
      }.toArray)
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .where(col(vecCol).isNotNull)
      .as[(Long, Seq[Float])]
      .map { case (id, vSeq) =>
        val v = vSeq.toArray
        val dim = bc.value.head._2.length
        if (v.length != dim)
          throw new IllegalArgumentException(
            s"corpus vector for id=$id has dim ${v.length}, centroids have " +
              s"dim $dim — a truncated dot product would silently assign " +
              "the wrong cell")
        var vn = 0.0
        var i = 0
        while (i < v.length) { vn += v(i).toDouble * v(i); i += 1 }
        val vNorm = math.sqrt(vn)
        var bestCell = -1
        var bestCos = Double.NegativeInfinity
        val cents = bc.value
        var c = 0
        while (c < cents.length) {
          val (cell, cv, cNorm) = cents(c)
          var dot = 0.0
          i = 0
          while (i < cv.length) { dot += v(i).toDouble * cv(i); i += 1 }
          val cos = if (vNorm == 0.0 || cNorm == 0.0) 0.0 else dot / (vNorm * cNorm)
          if (cos > bestCos) { bestCos = cos; bestCell = cell }
          c += 1
        }
        (id, bestCell)
      }
      .toDF(idCol, "cell")
  }

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * queries). Output: (query_id, neighbor_id, cos, rank).
    */
  /** ColBERT-style MaxSim late-interaction scoring (Khattab & Zaharia
    * 2020): documents and queries are BAGS of token vectors, and
    *
    *   score(q, d) = Σ_{t ∈ q} max_{u ∈ d} cos(t, u)
    *
    * — each query token independently finds its best-matching document
    * token, which is what lets one token's exact match dominate where a
    * single pooled vector would wash it out. Emitted scores are
    * integer sums of per-query-token round(1e6·max) (each max is a max
    * over identical doubles, each rounding per-row deterministic), so
    * ranking and scores replay bit-for-bit cross-engine.
    *
    * Shape: token-level cross scores against the BROADCAST query token
    * bag (the [[bruteForceTopK]] audit tier — exact for a bounded query
    * batch), then two map-side-combined aggregations (per-(q-token,
    * doc) max → per-(q, doc) integer sum) and a k-bounded top-k per
    * query. At 100 TB, replace the token cross with per-token ANN
    * candidates (IVF/LSH over the token-vector table) and keep the same
    * max→sum→top-k algebra.
    */
  def maxSimTopK(
      docTokens: DataFrame, docId: String, tokenVec: String,
      queryTokens: DataFrame, queryId: String, queryTokenId: String,
      queryVec: String, k: Int = 10): DataFrame = {
    val cross = docTokens
      .select(col(docId).as("did"), col(tokenVec).as("__dv"))
      .join(broadcast(queryTokens.select(col(queryId).as("query_id"),
        col(queryTokenId).as("__qt"), col(queryVec).as("__qv"))))
      .where(col("did") =!= col("query_id"))
    val maxes = cross
      .groupBy(col("query_id"), col("__qt"), col("did"))
      .agg(max(cosine(col("__dv"), col("__qv"))).as("__m"))
    val scores = maxes
      .groupBy(col("query_id"), col("did"))
      .agg(sum(round(col("__m") * 1e6).cast("long")).as("score"))
    topKPerQuery(
      scores.select(col("query_id"), col("did").as("neighbor_id"),
        col("score").cast("double").as("cos")), k, distinctIds = false)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id").as("doc_id"), col("cos").cast("long").as("score"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix mining rule): a cross-corpus candidate (x, y)
    * scores
    *
    *   margin(x, y) = cos(x, y) / ((avgTopK(x→right) + avgTopK(y→left)) / 2)
    *
    * because absolute cosine is miscalibrated across embedding-space
    * regions (hubness): dividing by each side's local neighborhood
    * level makes thresholds transferable. The forward-best y per x is
    * emitted with its margin and `mined` = margin > threshold.
    *
    * This audit-scale form scores ALL cross pairs exactly (one
    * broadcast nested-loop, the [[bruteForceTopK]] tier) and computes
    * the cross table ONCE — it feeds both directions' top-k averages
    * and the per-x argmax, all k-bounded or argmax-as-aggregate, no
    * windows over the pair table. `left` is the BOUNDED mining batch
    * (it is the broadcast side); `right` is the streamed corpus. At
    * 100 TB generate candidates with [[bitextMineLsh]] (the
    * [[cosinePairsLsh]] tier) and apply the same margin algebra to the
    * candidate set; the neighborhood tables stay k-bounded aggregates
    * either way.
    */
  def bitextMine(
      left: DataFrame, leftId: String, leftVec: String,
      right: DataFrame, rightId: String, rightVec: String,
      k: Int = 4,
      threshold: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    marginMine(bitextCross(left, leftId, leftVec, right, rightId, rightVec),
      k, threshold)
  }

  /** The exact scored cross behind [[bitextMine]], pre-checkpoint —
    * exposed package-private so the broadcast-side law is assertable on
    * its plan (the checkpointed leaf in marginMine hides it from the
    * final plan). Broadcast the LEFT (the API contract's bounded mining
    * batch) and stream the corpus side: the cross rows are identical
    * either way, but replicating the corpus would hit the broadcast/
    * driver memory ceiling at scale long before cross mass matters.
    */
  private[ops] def bitextCross(
      left: DataFrame, leftId: String, leftVec: String,
      right: DataFrame, rightId: String, rightVec: String): DataFrame =
    right.select(col(rightId).as("rid"), col(rightVec).as("__rv"))
      .join(broadcast(
        left.select(col(leftId).as("lid"), col(leftVec).as("__lv"))))
      .select(col("lid"), col("rid"),
        cosine(col("__lv"), col("__rv")).as("cos"))

  /** The margin algebra shared by [[bitextMine]] (exact cross) and
    * [[bitextMineLsh]] (LSH candidates): both neighborhood averages, the
    * per-x argmax, and the mined bit — all k-bounded aggregates or
    * argmax-as-aggregate, no windows over the pair table. The pair table
    * is computed ONCE (persisted) and feeds all three.
    */
  private def marginMine(
      pairs: DataFrame, k: Int, threshold: Double): DataFrame = {
    // EAGER leaf, not a lazy persist: the three consumers below plan as
    // broadcast-exchange jobs that run CONCURRENTLY, and concurrent jobs
    // race past an unpopulated cache — a stage profile showed the whole
    // candidate subtree executing three times (3 × ~1.2 s at sf0.1)
    // behind a persist() that claimed to compute it once. The eager
    // localCheckpoint materializes the pair table exactly once and every
    // consumer reads the leaf. Footprint class is unchanged (persist
    // stored the same partitions); the lineage trade is the documented
    // Graph-loop convention.
    val cross = pairs.localCheckpoint(true)
    def avgTopK(df: DataFrame, key: String, other: String): DataFrame =
      df.groupBy(col(key))
        .agg(graft.functions.TopKByScore.topk_by_score(
          col("cos"), col(other), k).as("__t"))
        .select(col(key),
          (aggregate(col("__t"), lit(0.0),
            (a, s) => a + s.getField("score")) /
            greatest(size(col("__t")), lit(1)).cast("double")).as("__avg"))
    val fwd = avgTopK(cross, "lid", "rid")
      .withColumnRenamed("__avg", "__favg")
    val bwd = avgTopK(cross, "rid", "lid")
      .withColumnRenamed("__avg", "__bavg")
    val best = cross.groupBy(col("lid"))
      .agg(max(struct(col("cos"), (-col("rid")).as("nrid"))).as("m"))
      .select(col("lid"), (-col("m.nrid")).as("rid"), col("m.cos").as("cos"))
    val denom = greatest((col("__favg") + col("__bavg")) / 2, lit(1e-9))
    best.join(fwd, "lid").join(bwd, "rid")
      .select(col("lid").as("left_id"), col("rid").as("right_id"),
        round(col("cos"), 6).as("cos"),
        round(col("cos") / denom, 6).as("margin"),
        (col("cos") / denom > threshold).cast("int").as("mined"))
  }

  /** The 100 TB bitext path: candidate pairs from hyperplane-LSH banding
    * (both corpora banded with the SAME planes, cross-side bucket joins
    * only), then the identical [[marginMine]] algebra over the candidate
    * set. Neither side is broadcast or bounded — band rows carry
    * (bucket, id) only and vectors join back per deduped candidate pair
    * (the [[cosinePairsLsh]] payload-free shape), so shuffle bytes stay
    * linear in corpus size and the per-bucket cap bounds pair mass.
    * Margins are computed over each side's CANDIDATE neighborhood rather
    * than the exact top-k neighborhood — the LASER/CCMatrix production
    * approximation — so mined pairs are graded by recall against
    * [[bitextMine]] (the q_ann_lsh convention), not by equality.
    */
  def bitextMineLsh(
      left: DataFrame, leftId: String, leftVec: String,
      right: DataFrame, rightId: String, rightVec: String,
      k: Int = 4,
      threshold: Double = 1.0,
      bands: Int = 16,
      planesPerBand: Int = 6,
      seed: Long = 42L,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize,
      dim: Int = -1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val d = if (dim > 0) dim else vectorDim(left, leftVec)
    val hp = HyperplaneOps.flatPlanes(d, bands * planesPerBand, seed)
    val lv = left.select(col(leftId).as("lid"), col(leftVec).as("__lv"))
    val rv = right.select(col(rightId).as("rid"), col(rightVec).as("__rv"))
    val lb = lv.select(col("lid").as("id"), lit(0).as("side"),
      explode(hyperplane_band_keys(col("__lv"), hp, bands, planesPerBand))
        .as("bucket"))
    val rb = rv.select(col("rid").as("id"), lit(1).as("side"),
      explode(hyperplane_band_keys(col("__rv"), hp, bands, planesPerBand))
        .as("bucket"))
    // collect_list drops nulls, so each side lands in its own member list;
    // the total-members cap is the bucketPairsIds convention (an over-full
    // bucket is hub structure, not signal).
    val buckets = lb.unionByName(rb)
      .groupBy(col("bucket"))
      .agg(
        collect_list(when(col("side") === 0, col("id"))).as("__ls"),
        collect_list(when(col("side") === 1, col("id"))).as("__rs"))
      .where(size(col("__ls")) >= 1 && size(col("__rs")) >= 1 &&
        (if (maxBucketSize > 0)
          size(col("__ls")) + size(col("__rs")) <= maxBucketSize
        else lit(true)))
    val cand = buckets
      .select(explode(col("__ls")).as("lid"), col("__rs"))
      .select(col("lid"), explode(col("__rs")).as("rid"))
      .dropDuplicates("lid", "rid")
    // The LEFT side is the API contract's bounded mining batch — hint it
    // broadcast so the planner never picks the post-aggregate candidate
    // table (whose size estimate is garbage) as a single-threaded build
    // side. The corpus-side join is left unhinted: rv is a plain parquet
    // projection with RELIABLE stats, so it broadcasts when small and
    // shuffles at scale on its own.
    marginMine(
      cand.join(broadcast(lv), "lid").join(rv, "rid")
        .select(col("lid"), col("rid"),
          cosine(col("__lv"), col("__rv")).as("cos")),
      k, threshold)
  }

  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10): DataFrame = {
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .join(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__cv"), col("__qv")).as("cos"))
    topKPerQuery(scored, k, distinctIds = false)
  }

  /** Greedy beam search over a prebuilt k-NN graph — the graph-index
    * SEARCH path (the HNSW/NSG-family public technique, single-layer):
    * [[knnGraph]] built the index; this serves NEW queries against it.
    * From a fixed entry set, repeatedly expand the current beam's graph
    * neighbors, score candidates against the query, and keep the best
    * `beamWidth` — `hops` rounds, then top-k. Complements the IVF/PQ/LSH
    * search paths with the index family whose recall/latency frontier is
    * best-published at high recall.
    *
    * Determinism: entry set = the `entryPoints` corpus ids of minimal
    * (xxhash64(id), id) — pseudo-uniform spread, engine-replayable; all
    * expansion and top-k tie-breaks are (cos desc, neighbor id)
    * ([[topKPerQuery]]).
    *
    * Scale shape: queries are the bounded side (broadcast — the
    * [[bruteForceTopK]] contract); per hop the candidate frontier is
    * ≤ |queries|·beamWidth·k rows of (query, id) longs, which joins the
    * graph (id-keyed) and the corpus vectors (id-keyed) with the tiny
    * side broadcast by AQE — never a corpus-wide pass after the entry
    * hop. `hops` is a hard round bound (the plan is hops-unrolled, no
    * iterative checkpointing needed at ≤ 5); measure recall with
    * [[auditRecall]] per deployment, as with every ANN entry point.
    *
    * @param graph (id, neighbor_id) adjacency — [[knnGraph]] output or
    *              any edge table; extra columns ignored.
    * @return (query_id, neighbor_id, cos, rank 1..k).
    */
  def graphSearch(
      graph: DataFrame,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      beamWidth: Int = 32,
      hops: Int = 3,
      entryPoints: Int = 8): DataFrame = {
    require(k >= 1 && beamWidth >= k,
      s"need beamWidth >= k >= 1, got k=$k beamWidth=$beamWidth")
    require(hops >= 1 && hops <= 8, s"hops must be in [1, 8], got $hops")
    val vecs = corpus.select(col(corpusId).cast("long").as("neighbor_id"),
      col(corpusVec).as("__cv"))
    val edges = graph.select(col("id").cast("long").as("__src"),
      col("neighbor_id").cast("long").as("__dst"))
    val q = queries.select(col(queryId).cast("long").as("query_id"),
      col(queryVec).as("__qv"))
    val entry = vecs.select(col("neighbor_id"))
      .orderBy(xxhash64(col("neighbor_id")), col("neighbor_id"))
      .limit(entryPoints)
    beamLoop(edges, vecs, q,
      q.select("query_id").crossJoin(broadcast(entry)),
      k, beamWidth, hops)
  }

  /** The shared greedy-beam core of [[graphSearch]] /
    * [[graphSearchLayered]]: seed candidates → score → keep best
    * `beamWidth` per query → expand graph neighbors, `hops` rounds.
    * `seed` is (query_id, neighbor_id) — the entry frontier.
    */
  private[ops] def beamLoop(
      edges: DataFrame,
      vecs: DataFrame,
      q: DataFrame,
      seed: DataFrame,
      k: Int,
      beamWidth: Int,
      hops: Int): DataFrame = {
    def score(cand: DataFrame): DataFrame =
      cand.join(vecs, "neighbor_id")
        .join(broadcast(q), "query_id")
        .where(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("__cv"), col("__qv")).as("cos"))
    var beam = topKPerQuery(score(seed), beamWidth, distinctIds = false)
    var h = 0
    while (h < hops) {
      val cand = beam
        .select(col("query_id"), col("neighbor_id").as("__src"))
        .join(edges, "__src")
        .select(col("query_id"), col("__dst").as("neighbor_id"))
        .unionByName(beam.select("query_id", "neighbor_id"))
        .dropDuplicates("query_id", "neighbor_id")
      beam = topKPerQuery(score(cand), beamWidth, distinctIds = false)
      h += 1
    }
    beam.where(col("rank") <= k)
  }

  /** Coarse routing layer for [[graphSearchLayered]]: a deterministic
    * ~√n node sample, minimal (xxhash64(id), id) order — the
    * [[graphSearch]] entry convention, engine-replayable.
    *
    * Design note (the HNSW hierarchy's public idea, adapted to batch):
    * HNSW walks its top layer with a greedy beam because it serves one
    * query at a time; at Spark batch scale the right physical move is to
    * score the √n layer EXHAUSTIVELY per query — one broadcast-join
    * stage of |q|·√n cosines, cheaper than a single base-layer hop
    * (beam·(k+1) candidates per query joined against corpus-scale
    * tables) and immune to subgraph-connectivity traps. That trap is
    * measured, not hypothetical: on the sf1 replica geometry a
    * degree-8 beam-searched coarse SUBGRAPH stranded the 7 non-replica
    * sample nodes in their own component and routed every query into
    * the near-parallel replica blob (recall 0); exhaustive coarse
    * scoring finds the true region in one stage (SCALING.md round 14).
    *
    * @param coarseSize sample node count; ≤ 0 derives ⌈√n⌉ (floor 64)
    *                   from a corpus count — the derived-parameter
    *                   convention ([[Dedup.derivedTokenDfCap]]). For
    *                   corpora where √n is too large to score per query
    *                   (n ≳ 10¹⁰), cap it and accept coarser routing.
    * @return (id) — the sampled node ids.
    */
  def coarseLayer(
      corpus: DataFrame,
      corpusId: String,
      coarseSize: Int = 0): DataFrame = {
    val m =
      if (coarseSize > 0) coarseSize
      else math.max(64L, math.ceil(math.sqrt(
        corpus.count().toDouble)).toLong).toInt
    corpus
      .select(col(corpusId).cast("long").as("id"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(m)
  }

  /** Two-layer graph search: score the [[coarseLayer]] sample
    * exhaustively per query to get query-LOCAL entry points, then run
    * the base-layer beam from there — [[graphSearch]] with the
    * fixed-global-entry weakness removed. Single-layer search from
    * `entryPoints` FIXED nodes needs hops proportional to the base
    * graph's diameter (and can be trapped outright by disconnected or
    * near-degenerate regions — measured at recall 0 on the sf1 replica
    * geometry), so the hard `hops ≤ 8` bound costs recall as n grows;
    * entering at the query's own coarse cell leaves the base hops only
    * the last coarse-cell-sized gap to close. Recall per scored
    * candidate is equal or better (measured — SCALING.md round 14);
    * audit per deployment with [[auditRecall]] like every ANN path.
    *
    * Scale shape: phase 1 is one broadcast join stage — |q|·|coarse|
    * cosines against a √n-row id-semi-join of the corpus; phase 2 is
    * the same [[beamLoop]] as [[graphSearch]], seeded per-query.
    * Nothing scans the full corpus per hop.
    *
    * @param coarse (id) node sample — [[coarseLayer]] output or any
    *               corpus-id subset.
    */
  def graphSearchLayered(
      graph: DataFrame,
      coarse: DataFrame,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      beamWidth: Int = 32,
      hops: Int = 2,
      entryPoints: Int = 8): DataFrame = {
    require(k >= 1 && beamWidth >= k,
      s"need beamWidth >= k >= 1, got k=$k beamWidth=$beamWidth")
    require(hops >= 1 && hops <= 8, s"hops must be in [1, 8], got $hops")
    require(entryPoints >= 1,
      s"entryPoints must be >= 1, got $entryPoints")
    val vecs = corpus.select(col(corpusId).cast("long").as("neighbor_id"),
      col(corpusVec).as("__cv"))
    val coarseCorpus = vecs
      .join(coarse.select(col("id").cast("long").as("neighbor_id")),
        "neighbor_id")
      .select(col("neighbor_id").as("cid"), col("__cv").as("cv"))
    val entries = bruteForceTopK(coarseCorpus, "cid", "cv",
      queries, queryId, queryVec, k = entryPoints)
    val edges = graph.select(col("id").cast("long").as("__src"),
      col("neighbor_id").cast("long").as("__dst"))
    val q = queries.select(col(queryId).cast("long").as("query_id"),
      col(queryVec).as("__qv"))
    beamLoop(edges, vecs, q, entries.select("query_id", "neighbor_id"),
      k, beamWidth, hops)
  }

  /** A built graph index: the kNN edge table and the coarse routing node
    * sample — the two artifacts [[graphSearchLayered]] serves from, made
    * durable together (the FAISS build-once/search-many split, across
    * SESSIONS: at 100 TB nobody rebuilds a corpus kNN graph per job).
    */
  final case class GraphIndex(graph: DataFrame, coarse: DataFrame) {
    /** Write edges + coarse nodes; reload with [[loadGraphIndex]]. */
    def save(path: String): Unit = {
      graph.select(col("id"), col("neighbor_id"))
        .write.mode("overwrite").parquet(s"$path/edges")
      coarse.select("id")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_coarse")
    }
  }

  /** Build the durable pair [[graphSearchLayered]] needs: the kNN edge
    * table ([[knnGraph]]) and the coarse routing sample ([[coarseLayer]],
    * derived ⌈√n⌉ by default). Both are deterministic, so a rebuilt index
    * equals a loaded one — but the build pays the banded kNN construction,
    * which is exactly what [[GraphIndex.save]] amortizes away.
    */
  def buildGraphIndex(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      k: Int = 10,
      coarseSize: Int = 0): GraphIndex =
    GraphIndex(
      knnGraph(corpus, corpusId, corpusVec, k),
      coarseLayer(corpus, corpusId, coarseSize))

  def loadGraphIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): GraphIndex =
    GraphIndex(
      spark.read.parquet(s"$path/edges"),
      spark.read.parquet(s"$path/_coarse"))

  /** Embedding-level decontamination: the TRAIN-side removal list against
    * a benchmark/eval set — train rows whose embedding cosine against ANY
    * eval row reaches `threshold` (the semantic complement to the n-gram
    * [[Curation]] decontamination: paraphrases and near-verbatim leaks
    * that shared-n-gram tests miss, the SemDeDup-era published technique).
    *
    * Scale shape: eval sets are SMALL by construction (the benchmark
    * contract — same bounded-side rationale as [[bruteForceTopK]]'s query
    * side), so the eval frame broadcasts and the train corpus is scanned
    * ONCE with an |eval|-wide fan-out collapsed map-side per train row;
    * no shuffle of train rows, no index build. For eval sets too large to
    * broadcast, block both sides through [[cosinePairsLsh]] instead —
    * this is deliberately the exact small-eval tool.
    *
    * @return (train_id, n_eval_hits, nearest_eval_id) — one row per
    *         CONTAMINATED train doc; nearest = argmax (cos desc, eval id
    *         asc), the [[bruteForceTopK]] tie order.
    */
  def semanticDecontaminate(
      train: DataFrame,
      trainId: String,
      trainVec: String,
      eval: DataFrame,
      evalId: String,
      evalVec: String,
      threshold: Double = 0.95): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val scored = train
      .select(col(trainId).as("train_id"), col(trainVec).as("__tv"))
      .join(broadcast(
        eval.select(col(evalId).as("eval_id"), col(evalVec).as("__ev"))))
      .select(col("train_id"), col("eval_id"),
        cosine(col("__tv"), col("__ev")).as("cos"))
      .where(col("cos") >= threshold)
    scored.groupBy("train_id")
      .agg(count(lit(1)).as("n_eval_hits"),
        min(struct((-col("cos")).as("nc"), col("eval_id").as("eid")))
          .as("__top"))
      .select(col("train_id"), col("n_eval_hits"),
        col("__top.eid").as("nearest_eval_id"))
  }

  /** Measured recall@k telemetry for ANY approximate-neighbor table — the
    * round-12 sf10 lesson made law: a fixed-`nlist` IVF silently fell to
    * recall 0.27 at one decade's growth, and the only place that number
    * existed was a SCALING.md investigation. A 100 TB operator must be
    * able to read degradation off the API instead: this audit takes the
    * approximate result as produced ([[lshTopK]], [[ivfSearch]],
    * [[hammingTopK]], [[knnGraph]] edges, a loaded index — anything with
    * (query id, neighbor id) columns), draws a DETERMINISTIC sample of its
    * query ids (xxhash64(id, seed) order — reproducible across runs and
    * engines), recomputes exact brute-force top-k for just that sample,
    * and reports integer-ppm recall.
    *
    * Cost model: brute force over `sample` queries only — one broadcast
    * of ≤ sample vectors against a corpus scan ([[bruteForceTopK]]), so
    * the audit prices at ~one corpus pass regardless of corpus size;
    * run it on every index build/append the way `q_ivf_append` does in
    * miniature.
    *
    * Semantics: recall per query = |approx ∩ exact-top-k| / k against the
    * tie-BROKEN exact list ((cos desc, neighbor id) — [[topKPerQuery]]'s
    * order), so an approx method returning the OTHER member of a cosine
    * tie counts as a miss: conservative, never flattering. Queries with
    * fewer than k approx rows are penalized, not excused (missing rows
    * are misses — that is the degradation being measured).
    *
    * @return one row: (n_queries, k, mean_recall_ppm, min_recall_ppm) —
    *         mean = ⌊10⁶·Σhits/(n·k)⌋, min = per-query ⌊10⁶·hits/k⌋
    *         minimum; all longs.
    */
  def auditRecall(
      approx: DataFrame,
      queryIdCol: String,
      neighborIdCol: String,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      k: Int,
      sample: Int = 100,
      seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(sample >= 1, s"sample must be >= 1, got $sample")
    val qids = approx.select(col(queryIdCol).as("query_id")).distinct()
      .orderBy(xxhash64(col("query_id"), lit(seed)), col("query_id"))
      .limit(sample)
    val queries = corpus
      .join(broadcast(qids), col(corpusId) === col("query_id"))
      .select(col("query_id"), col(corpusVec).as("__qv"))
    val exact = bruteForceTopK(corpus, corpusId, corpusVec,
      queries, "query_id", "__qv", k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact
      // distinct BEFORE the join: the doc accepts "anything with (query
      // id, neighbor id) columns", and a pre-dedup candidate table (one
      // row per colliding LSH band) would otherwise multiply hits and
      // inflate recall past 10^6 ppm — the one direction this telemetry
      // must never err.
      .join(approx.select(col(queryIdCol).as("query_id"),
          col(neighborIdCol).as("neighbor_id"))
          .distinct()
          .withColumn("__hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(coalesce(sum("__hit"), lit(0L)).as("__h"))
    hits.agg(
      count(lit(1)).as("n_queries"),
      lit(k.toLong).as("k"),
      expr(s"(sum(__h) * 1000000) DIV (count(1) * $k)")
        .as("mean_recall_ppm"),
      min(expr(s"(__h * 1000000) DIV $k")).as("min_recall_ppm"))
  }

  /** Matryoshka truncation recall audit — "how many leading dimensions
    * does THIS corpus actually need?": recall@k of exact top-k under
    * PREFIX-truncated cosine (first d dims only) against full-dimension
    * exact top-k, per candidate d, on a deterministic query sample. The
    * published scale path for 100 TB embedding columns (Kusupati et al.
    * 2022's Matryoshka representations; dimension-slashed first-stage
    * retrieval + full-dim rerank): searching d of D dims cuts scan bytes
    * and FLOPs by D/d, and this audit prices the recall that purchase
    * costs BEFORE the fleet-wide change — the [[auditRecall]] telemetry
    * law applied to the truncation knob.
    *
    * Determinism: the sample is the `sample` smallest (xxhash64(id, seed),
    * id) corpus ids ([[auditRecall]]'s convention); both top-k sides are
    * exact brute force with the (cos desc, id) tie-break; recalls are
    * integer ppm. The full-dimension row (d = D) is a built-in
    * self-check: it compares the metric with itself, so its recall is
    * 10⁶ BY CONSTRUCTION and any other value is a harness bug.
    *
    * Scale shape: one broadcast-sample corpus pass per audited dimension
    * (|dims|+1 passes total — audit cost, paid once per corpus, not per
    * query); exchanges carry (query, neighbor, cos) triples bounded by
    * sample·k after the per-partition top-k combine.
    *
    * @return one row per audited d: (dim, n_queries, k, mean_recall_ppm,
    *         min_recall_ppm), ordered by dim.
    */
  def truncationRecallAudit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Seq[Int],
      k: Int = 10,
      sample: Int = 100,
      seed: Long = 42L): DataFrame = {
    require(dims.nonEmpty, "dims must be non-empty")
    require(dims.forall(_ >= 1), s"dims must be >= 1, got $dims")
    require(k >= 1, s"k must be >= 1, got $k")
    val fullDim = vectorDim(corpus, vecCol)
    // Sample draw = the md5-48 kmv convention (not xxhash64): this audit
    // is VALUE-oracled (q_matryoshka_recall hash-matches the whole
    // sample → exact-truth → truncated-rank → recall chain), and md5 is
    // the draw any engine replays — the reason the sampling convention
    // differs from auditRecall's cheaper xxhash64.
    val draw = conv(substring(md5(concat(col("query_id").cast("string"),
      lit(s"-$seed")).cast("binary")), 1, 12), 16, 10).cast("long")
    val qids = corpus.select(col(idCol).as("query_id")).distinct()
      .orderBy(draw, col("query_id"))
      .limit(sample)
    val queries = corpus
      .join(broadcast(qids), col(idCol) === col("query_id"))
      .select(col("query_id"), col(vecCol).as("__qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()
    val exact = bruteForceTopK(corpus, idCol, vecCol,
        queries, "query_id", "__qv", k)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()
    val rows = (dims.filter(_ < fullDim).distinct.sorted :+ fullDim)
      .map { d =>
        val trunc = bruteForceTopK(
          corpus.select(col(idCol), slice(col(vecCol), 1, d).as(vecCol)),
          idCol, vecCol,
          queries.select(col("query_id"),
            slice(col("__qv"), 1, d).as("__qv")),
          "query_id", "__qv", k)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1L))
        exact.join(trunc, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(coalesce(sum("__hit"), lit(0L)).as("__h"))
          .agg(lit(d).as("dim"),
            count(lit(1)).as("n_queries"), lit(k.toLong).as("k"),
            expr(s"(sum(__h) * 1000000) DIV (count(1) * $k)")
              .as("mean_recall_ppm"),
            min(expr(s"(__h * 1000000) DIV $k")).as("min_recall_ppm"))
      }
    val out = rows.reduce(_ unionByName _).orderBy("dim")
    out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    queries.unpersist(blocking = false)
    exact.unpersist(blocking = false)
    out
  }

  /** Fitted PCA basis: feature means, row-major principal components
    * (descending eigenvalue), and the eigenvalues of the SAMPLE covariance
    * (n−1 denominator).
    */
  case class PcaBasis(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Fit PCA on an embedding column. Distributed part: ONE Gram/covariance
    * tree-aggregation (RowMatrix.computeCovariance — dim² doubles per
    * partition, no shuffle of rows; dim is small by construction, so the
    * driver holds a dim×dim matrix, the [[kMeansQuantized]] bounded-driver
    * contract). Driver part: a cyclic JACOBI eigensolver instead of the
    * ML PCA's LAPACK SVD — fully deterministic (fixed sweep order, fixed
    * tolerance, sign fixed by largest-|coordinate| positive), so the basis
    * is reproducible across JVMs/BLAS variants, the property every other
    * trainer in this repo maintains.
    */
  def pcaFit(df: DataFrame, vecCol: String, k: Int): PcaBasis = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val vecs = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("v"))
    val rm = new RowMatrix(vecs.rdd.map(r =>
      OldVectors.fromML(r.getAs[org.apache.spark.ml.linalg.Vector](0))))
    val dim = rm.numCols().toInt
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val cov = rm.computeCovariance() // dim×dim, sample (n−1)
    val mean = rm.computeColumnSummaryStatistics().mean.toArray
    val c = Array.tabulate[Double](dim, dim)((i, j) => cov(i, j))
    val (evals, evecs) = jacobiEigSym(c)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    val comps = order.map { i =>
      val v = evecs.map(_(i))
      // Sign convention: the largest-|coordinate| entry is positive.
      val m = v.indices.maxBy(d => (math.abs(v(d)), -d))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaBasis(mean, comps, order.map(evals).toArray)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues, column
    * eigenvectors). Deterministic: fixed (p,q) sweep order, fixed sweep
    * count bound, rotation skipped below an absolute off-diagonal
    * threshold.
    */
  private[ops] def jacobiEigSym(
      a0: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cth = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * cth
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = cth * aip - s * aiq
              a(i)(q) = s * aip + cth * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = cth * api - s * aqi
              a(q)(i) = s * api + cth * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = cth * vip - s * viq
              v(i)(q) = s * vip + cth * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Project (and optionally WHITEN — unit variance per component, the
    * SemDeDup/embedding-normalization preprocessing) onto a fitted basis.
    * Perfectly narrow: mean and components are plan constants, each output
    * component one codegen'd fold — no UDF, no shuffle, no broadcast
    * needed at any corpus size (k·dim doubles of constants).
    */
  def pcaProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      basis: PcaBasis,
      whiten: Boolean = false): DataFrame = {
    val comps = basis.components.zipWithIndex.map { case (w, ci) =>
      val dot = w.iterator.zipWithIndex.map { case (wd, d) =>
        (element_at(col(vecCol), d + 1).cast("double") - lit(basis.mean(d))) * lit(wd)
      }.reduceLeft(_ + _)
      if (whiten) dot / lit(math.sqrt(math.max(basis.eigenvalues(ci), 1e-12)))
      else dot
    }
    df.select(col(idCol), array(comps.toIndexedSeq: _*).as("proj"))
  }

  /** Audited PCA summary — the oracle-able face of [[pcaFit]], the
    * [[Sketches.hllAuditedDistinct]] audit-bit pattern: any engine replays
    * n and the covariance TRACE exactly (Σ per-dimension sample
    * variances), while the eigenbasis itself (not expressible in one SQL
    * pass) is audited in-job per component: eigen-residual ‖Cv − λv‖ ≤
    * 1e-8·max(1, λmax), unit norm, mutual orthogonality, descending
    * eigenvalues, and Σ top-k eigenvalues ≤ trace.
    */
  def pcaAudited(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val spark = df.sparkSession
    import spark.implicits._
    val basis = pcaFit(df, vecCol, k)
    val vecs = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("v"))
    val rm = new RowMatrix(vecs.rdd.map(r =>
      OldVectors.fromML(r.getAs[org.apache.spark.ml.linalg.Vector](0))))
    val n = rm.numRows()
    val cov = rm.computeCovariance()
    val dim = basis.mean.length
    val trace = (0 until dim).map(d => cov(d, d)).sum
    val lmax = basis.eigenvalues.head.max(1.0)
    val rows = basis.components.zipWithIndex.map { case (w, ci) =>
      val cv = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i, j) * w(j)).sum)
      val resid = math.sqrt(Array.tabulate(dim)(i =>
        math.pow(cv(i) - basis.eigenvalues(ci) * w(i), 2)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      val orthoOk = basis.components.take(ci).forall { u =>
        math.abs(u.zip(w).map { case (x, y) => x * y }.sum) < 1e-8
      }
      val descOk = ci == 0 || basis.eigenvalues(ci) <= basis.eigenvalues(ci - 1) + 1e-12
      (ci, n,
        if (resid <= 1e-8 * lmax) 1 else 0,
        if (math.abs(norm - 1.0) < 1e-10 && orthoOk) 1 else 0,
        if (descOk && basis.eigenvalues.sum <= trace * (1 + 1e-10)) 1 else 0)
    }
    rows.toIndexedSeq
      .toDF("component", "n", "resid_ok", "ortho_ok", "spectrum_ok")
      .withColumn("trace", round(lit(trace), 4))
  }

  /** The ±1/0 sign matrix of [[randomProjection]]: row j, column i from
    * one fixed splitmix-style stream (value mod 6 → {0: +1, 1: −1,
    * 2..5: 0} — Achlioptas' sparse distribution {1/6, 1/6, 2/3}).
    * Deterministic and engine-replayable: the DuckDB oracle generator
    * derives the identical matrix, so the projection is exact-oracled,
    * not audit-bit-oracled.
    */
  def projectionSigns(outDim: Int, inDim: Int, seed: Long = 0x5DEECE66DL): Array[Array[Int]] = {
    var x = seed
    Array.fill(outDim, inDim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % 6) match {
        case 0 => 1
        case 1 => -1
        case _ => 0
      }
    }
  }

  /** Sparse random projection (Achlioptas 2003): out(j) = √(3/outDim) ·
    * Σᵢ s(j,i)·x(i) with s from [[projectionSigns]] — the
    * Johnson–Lindenstrauss embedding-compression step (pairwise distances
    * preserved within (1±ε) for outDim = O(log n / ε²)) that makes every
    * downstream ANN / dedup / clustering pass cheaper by dim/outDim.
    *
    * Scale shape: perfectly NARROW — the matrix is plan constants (⅓
    * nonzero, so ~inDim·outDim/3 codegen'd adds per row, no UDF, no
    * shuffle, no broadcast needed at any corpus size). Arithmetic is
    * double with terms added in ascending column order, so any engine
    * replaying the same order reproduces the sums bit-for-bit.
    */
  def randomProjection(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      inDim: Int,
      outDim: Int = 8,
      seed: Long = 0x5DEECE66DL): DataFrame = {
    require(outDim >= 1 && inDim >= 1, s"dims must be >= 1: $inDim -> $outDim")
    val signs = projectionSigns(outDim, inDim, seed)
    val scale = math.sqrt(3.0 / outDim)
    val comps = signs.map { row =>
      val terms = row.iterator.zipWithIndex.filter(_._1 != 0).map {
        case (1, i) => element_at(col(vecCol), i + 1).cast("double")
        case (_, i) => -element_at(col(vecCol), i + 1).cast("double")
      }.toSeq
      val s = if (terms.isEmpty) lit(0.0) else terms.reduceLeft(_ + _)
      s * scale
    }
    df.select(col(idCol), array(comps.toIndexedSeq: _*).as("proj"))
  }

  /** Sign-bit binary quantization: each embedding packs to ⌈dim/64⌉ int64
    * words (bit b of word w set iff coordinate 64·w+b is > 0) — a 32×
    * compression under which angular similarity survives as Hamming
    * distance (the 1-bit limit of hyperplane LSH: for unit vectors,
    * E[hamming]/dim = θ/π). Pure fold over literal powers of two — no UDF;
    * the bit-63 term is Long.MinValue so the top bit lands exactly without
    * shift arithmetic.
    */
  def binarySignCodes(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val nWords = (dim + 63) / 64
    val pow2 = typedLit((0 until 64).map(b => 1L << b))
    transform(sequence(lit(0), lit(nWords - 1)), w =>
      aggregate(
        sequence(lit(0), lit(63)), lit(0L),
        (acc, b) => {
          val idx = w * 64 + b
          acc + when(idx < dim && element_at(vec, idx + 1) > 0f,
            element_at(pow2, b + 1)).otherwise(0L)
        }))
  }

  /** Exact-Hamming top-k over [[binarySignCodes]]-packed embeddings — the
    * brute-force tier of binary-quantized ANN (what FAISS's IndexBinaryFlat
    * does): queries broadcast, per-pair distance is a popcount-XOR fold
    * over the packed words (64 coordinates per cheap int64 op — the reason
    * binary quantization is the memory-bandwidth scale path for a first
    * filter pass at 10⁹+ vectors), and the per-query top-k is the k-bounded
    * aggregate — the only exchange carries ≤ tasks × queries × k rows.
    * Ranks break distance ties on neighbor id. Output: (query_id,
    * neighbor_id, hamming, rank).
    */
  def hammingTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else vectorDim(corpus, corpusVec)
    val scored = corpus.select(col(corpusId).as("neighbor_id"),
        binarySignCodes(col(corpusVec), d).as("__cc"))
      .join(broadcast(queries.select(col(queryId).as("query_id"),
        binarySignCodes(col(queryVec), d).as("__qc"))))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(
          zip_with(col("__cc"), col("__qc"), (x, y) => bit_count(x.bitwiseXOR(y))),
          lit(0), (acc, x) => acc + x).as("hamming"))
    topKPerQuery(scored.select(col("query_id"), col("neighbor_id"),
        (-col("hamming").cast("double")).as("cos")), k, distinctIds = false)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cos")).cast("int").as("hamming"), col("rank"))
  }

  /** Hard-negative mining for contrastive / embedding training: for each
    * query (anchor), the top-k MOST similar corpus items that are NOT
    * near-duplicates — cosine below `dupThreshold` (above it the "negative"
    * is almost surely a positive mislabeled by sampling: the classic false
    * negative that collapses contrastive training) and not the anchor
    * itself. Same scale shape as [[bruteForceTopK]]: anchors broadcast,
    * corpus streams once, the near-dup filter runs BEFORE the k-bounded
    * top-k aggregate so the exchange carries ≤ tasks × anchors × k rows.
    * Output: (query_id, neighbor_id, cos, rank) — rank 1..k by (cos desc,
    * neighbor id asc).
    */
  def hardNegatives(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      dupThreshold: Double = 0.95): DataFrame = {
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .join(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__cv"), col("__qv")).as("cos"))
      .where(col("cos") < dupThreshold)
    topKPerQuery(scored, k, distinctIds = false)
  }

  /** Approximate top-k via multi-table hyperplane LSH (the E2LSH
    * construction): `tables` independent signatures of `planesPerTable` bits
    * each; a corpus vector is a candidate for a query iff they agree on ALL
    * bits of ANY table. Recall for a neighbor at angle θ is
    * 1 − (1 − p^planesPerTable)^tables with p = 1 − θ/π — `tables` is the
    * recall knob, `planesPerTable` the candidate-volume knob. `probes` > 1
    * additionally probes each table's buckets at Hamming distance 1
    * (multi-probe LSH, recovering near-boundary neighbors without more
    * tables). Signatures come from the fused
    * [[graft.functions.HyperplaneBandKeys]] expression — one loop for all
    * tables' planes. The only shuffles are the bucket join and the k-bounded
    * top-k aggregate; cross-table duplicate candidates are absorbed by the
    * aggregate's distinct-id mode, not a dropDuplicates exchange.
    */
  def lshTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      tables: Int = 16,
      planesPerTable: Int = 6,
      probes: Int = 1,
      seed: Long = 42L,
      dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else vectorDim(corpus, corpusVec)
    val hp = HyperplaneOps.flatPlanes(d, tables * planesPerTable, seed)

    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      explode(hyperplane_band_keys(col(corpusVec), hp, tables, planesPerTable))
        .as("bucket"))
    val qKeys = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"),
      hyperplane_band_keys(col(queryVec), hp, tables, planesPerTable).as("__keys"))
    // Multi-probe: each table's own bucket + (probes-1) single-bit flips of
    // the table's low signature bits (the table id lives above them).
    val nProbes = math.min(probes, planesPerTable + 1)
    val q =
      if (nProbes <= 1) qKeys.select(col("query_id"), col("__qv"),
        explode(col("__keys")).as("bucket"))
      else qKeys.select(col("query_id"), col("__qv"),
        explode(flatten(transform(col("__keys"), k0 =>
          array((0 until nProbes).map {
            case 0 => k0
            case i => k0.bitwiseXOR(lit(1L << (i - 1)))
          }: _*)))).as("bucket"))

    val scored = c.join(q, "bucket")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__cv"), col("__qv")).as("cos"))
    topKPerQuery(scored, k, distinctIds = true)
  }

  /** IVF-style ANN (the FAISS IVF-Flat construction on DataFrames): a coarse
    * k-means quantizer assigns every corpus vector to a centroid cell; each
    * query probes its `nprobe` nearest cells and exact-reranks only those.
    *
    * Scale shape: the quantizer fits on a bounded SAMPLE (≤ `maxTrainRows`
    * by default — k-means over the full corpus would be a multi-pass scan at
    * 100 TB for no recall gain), cell assignment is one narrow pass, the
    * centroid table stays driver-side (nlist × dim floats), and the only
    * shuffles are the query↔cell join and the k-bounded top-k aggregate —
    * corpus² never materializes. Versus [[lshTopK]]: data-adaptive cells give
    * better recall on clustered embeddings at the same probe budget.
    *
    * @param trainFraction explicit sample fraction for the quantizer fit;
    *                      NaN (default) derives min(1, maxTrainRows/|corpus|).
    */
  /** A built IVF index: the cell-assigned corpus (id, vector, cell) and the
    * driver-side centroid table (nlist × dim floats — tiny). `assigned` is a
    * plain DataFrame: persist/cache it, or write it out partitioned/bucketed
    * by `cell` so repeated query batches pay neither the quantizer fit nor
    * the assignment pass again — the FAISS build-once/search-many split.
    */
  final case class IvfIndex(assigned: DataFrame, centers: Array[Array[Float]]) {
    /** Write the assigned corpus partitioned by cell; reload with
      * [[Similarity.loadIvfIndex]]. Cell-partitioned layout means a query
      * batch's nprobe cells prune to exactly those directories at scan time.
      */
    def save(path: String): Unit = {
      assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
      val spark = assigned.sparkSession
      import spark.implicits._
      centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "center")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
    }
  }

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val centers = spark.read.parquet(s"$path/_centroids")
      .orderBy("cell").collect()
      .map(_.getAs[Seq[Float]]("center").toArray)
    IvfIndex(spark.read.parquet(path), centers)
  }

  /** Fit the coarse quantizer on a BOUNDED sample and assign every corpus
    * vector to its cell — the expensive, reusable half of IVF search.
    * K-means over the full corpus at 100 TB would be a multi-pass full scan
    * for no recall gain; `maxTrainRows` caps the fit cost independent of
    * corpus size (explicit `trainFraction` overrides).
    */
  def buildIvfIndex(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      nlist: Int = 16,
      trainFraction: Double = Double.NaN,
      maxTrainRows: Long = 200000L,
      maxIter: Int = 8,
      seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val vecCol = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      array_to_vector(col(corpusVec).cast("array<double>")).as("__features"))
    val train =
      if (!trainFraction.isNaN)
        (if (trainFraction < 1.0) vecCol.sample(trainFraction, seed) else vecCol)
          .select(col("__features").as("features"))
      else {
        // Bounded sample WITHOUT a counting pass: a full corpus.count() just
        // to derive a fraction is an extra 100 TB scan before any work
        // happens. Take maxTrainRows/numPartitions rows from EACH partition
        // instead — one narrow pass that stops early per file split and
        // stays spread across the corpus (a plain limit() would draw the
        // whole sample from the first few splits).
        val feats = vecCol.select(col("__features").as("features"))
        val nPart = math.max(1, feats.rdd.getNumPartitions)
        val perPart = math.max(1, (maxTrainRows / nPart).toInt)
        feats.sparkSession.createDataFrame(
          feats.rdd.mapPartitions(_.take(perPart)), feats.schema)
      }
    // A coarse quantizer doesn't need tight convergence: nprobe cell routing
    // absorbs centroid jitter, so a handful of Lloyd iterations buys the same
    // recall at a fraction of the (multi-pass, whole-sample) fit cost.
    // Likewise random init over the bounded sample: k-means|| init is itself
    // multiple distributed passes (its job count rivals the Lloyd loop's),
    // bought to avoid bad seeds on adversarial data — jitter the probe spill
    // already absorbs here (recall re-measured within noise at both sf).
    // Random init draws a DISTINCT sample, so the guard counts DISTINCT
    // sampled vectors, not raw rows: heavy exact duplication (common in
    // crawl corpora) can shrink a large sample to fewer than nlist distinct
    // points, and random init would then return fewer than nlist centers.
    // Only use it when the distinct sample dwarfs nlist, else keep
    // k-means|| (tiny samples make its extra passes cheap anyway).
    // approx_count_distinct (±5% default) over the bounded (≤ maxTrainRows)
    // sample is one cheap agg; the 32× margin dwarfs its error.
    val distinctTrain = train
      .agg(approx_count_distinct(
        org.apache.spark.ml.functions.vector_to_array(col("features"))))
      .head.getLong(0)
    val initMode = if (distinctTrain >= 32L * nlist) "random" else "k-means||"
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setInitMode(initMode).setFeaturesCol("features").fit(train)

    val assigned = model.setPredictionCol("cell").setFeaturesCol("__features")
      .transform(vecCol)
      .select(col("neighbor_id"), col("__cv"), col("cell"))
    IvfIndex(assigned, model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Append a batch to a built IVF index WITHOUT refitting the quantizer:
    * new vectors route to their nearest EXISTING cell through the same
    * constant-folded centroid Column algebra searches use, and the
    * assigned rows union into the index — the incremental maintenance
    * path of the build-once/search-many contract (a crawl appends
    * embeddings hourly; re-running k-means per batch would re-scan the
    * corpus for no recall gain). Appended mass can drift cell balance
    * over time; when a cell outgrows its siblings, the REFIT cadence is
    * the policy knob — until then the nprobe spill absorbs quantizer
    * staleness exactly as it absorbs fit jitter.
    */
  def appendToIvf(
      index: IvfIndex,
      batch: DataFrame,
      idCol: String,
      vecCol: String): IvfIndex = {
    val probe = probeCellsCol(index.centers,
      col(vecCol).cast("array<double>"), 1)
    val assigned = batch
      .where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("__cv"),
        element_at(probe, 1).as("cell"))
    IvfIndex(index.assigned.unionByName(assigned), index.centers)
  }

  /** Search a built IVF index: each query probes its `nprobe` nearest cells
    * and exact-reranks only those cells' vectors through the k-bounded
    * top-k aggregate. Cell routing is pure Column algebra — the centroid
    * table is tiny (nlist × dim), so each centroid becomes a constant
    * array literal and its squared L2 distance a codegen'd
    * `zip_with`+`aggregate` fold; `array_sort` over (distance, cell)
    * structs picks the `nprobe` nearest (struct ordering breaks distance
    * ties by cell id, matching a stable sort over the centroid order).
    * No UDF: the routing inlines into the same whole-stage-codegen span
    * as the explode that follows it.
    */
  def ivfSearch(
      index: IvfIndex,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val probe = probeCellsCol(index.centers, col("__qv").cast("array<double>"), nprobe)
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .withColumn("cell", explode(probe))

    val scored = index.assigned.join(q, "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__cv"), col("__qv")).as("cos"))
    topKPerQuery(scored, k, distinctIds = true)
  }

  /** nprobe-nearest-cell routing as ONE compact Column: the centroid table
    * becomes a single 2-D array literal and the squared-L2 distances one
    * `transform` loop over it (inner `zip_with`+`aggregate` fold per cell);
    * `array_sort` over (distance, cell) structs picks the `nprobe` nearest
    * (struct ordering breaks distance ties by cell id, matching a stable
    * sort over the centroid order). No UDF, no join, no shuffle — and,
    * critically, COMPACT generated code: the earlier formulation unrolled
    * one independent fold expression PER centroid, and the resulting huge
    * generated method was bimodal under JIT — the identical one-task
    * routing stage measured 0.7 s in some runs and 13+ s CPU in others
    * (interpreted/deopt path). A 16-cell loop over a literal array stays
    * far under method-size limits and times stably.
    */
  private def probeCellsCol(
      centers: Array[Array[Float]], vec: Column, nprobe: Int): Column = {
    val centsLit = typedLit(
      centers.map(_.map(_.toDouble).toIndexedSeq).toIndexedSeq)
    val dists = transform(centsLit, (c, i) => struct(
      aggregate(zip_with(vec, c, (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, x) => acc + x).as("d"),
      i.as("cell")))
    transform(
      slice(array_sort(dists), 1, math.min(nprobe, centers.length)),
      s => s.getField("cell"))
  }

  /** One-shot IVF ANN: [[buildIvfIndex]] + [[ivfSearch]]. */
  def ivfTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4,
      trainFraction: Double = Double.NaN,
      maxTrainRows: Long = 200000L,
      maxIter: Int = 8,
      seed: Long = 42L): DataFrame =
    ivfSearch(
      buildIvfIndex(corpus, corpusId, corpusVec, nlist, trainFraction,
        maxTrainRows, maxIter, seed),
      queries, queryId, queryVec, k, nprobe)

  /** All pairs with cosine ≥ threshold, banded-LSH-blocked (for embedding
    * dedup). Banding (minhash-style) over hyperplane bits keeps recall high —
    * P(miss) = (1 − p^planesPerBand)^bands for per-plane agreement
    * p = 1 − θ/π — while each band's buckets stay small and are hard-capped
    * via [[Dedup.bucketPairs]] (`maxBucketSize`): one degenerate bucket (zero
    * vectors, a dominant cluster) can otherwise go quadratic at corpus scale.
    * Candidate pairs expand intra-row from the grouped bucket, carrying their
    * vectors as payload — one shuffle total, then exact cosine verification.
    */
  /** Approximate k-NN GRAPH of the whole corpus — every vector's top-k
    * neighbors in one job (the input to graph clustering, SemDeDup-style
    * pruning, label propagation, diversity sampling). Candidate edges come
    * from the banded hyperplane LSH ([[cosinePairsLsh]]'s machinery, no
    * similarity threshold), each node keeps its top-k via the k-bounded
    * `topk_by_score` aggregate, then `refineRounds` of NN-descent (Dong et
    * al. 2011): neighbors-of-neighbors become candidates, exact cosine
    * re-ranks — each round is one self-join bounded by k² candidates per
    * node plus a k-bounded re-aggregation, and recovers edges LSH banding
    * missed.
    *
    * Output: (id, neighbor_id, cos, rank) with rank 1..k by (cos desc,
    * neighbor id). Shuffles stay linear: band rows are (bucket, id),
    * vectors join back per candidate, per-node state is ≤ k edges. The
    * refinement references the round-N graph three times in one plan
    * (both self-join sides + the union); AQE's exchange reuse
    * materializes its shuffle once (verified: 7 ReusedExchange nodes at
    * one round), so the LSH candidate stage does not re-execute.
    *
    * Defaults differ from [[cosinePairsLsh]]'s (16 bands × 8 planes, tuned
    * for near-dup θ≈0): a k-NN graph needs MODERATE-similarity neighbors
    * too, so shorter signatures / more bands raise collision probability —
    * measured on the sf0.01 embeddings (k=10): 16×8+1 round = 0.47 recall,
    * 24×6+1 round = 0.81, and each NN-descent round adds ~0.15-0.2.
    *
    * SCALING LAW: with a FIXED band resolution, expected bucket size is
    * n/2^planes, so candidate-pair volume is ~n²/2^planes per band —
    * quadratic in the corpus (measured: a 10× corpus cost 56× before this
    * was fixed). `planesPerBand` is therefore a FLOOR: the effective
    * resolution is raised to ceil(log2(n / targetBucketSize)) so the
    * expected bucket holds ~`targetBucketSize` members regardless of n,
    * making pair volume ~n·targetBucketSize/2 per band — LINEAR. The one
    * `corpus.count()` this needs is a metadata-cheap pass next to the
    * multi-job graph build. Finer bands lower per-band recall; NN-descent
    * rounds recover it (raise `refineRounds` with very large corpora, or
    * `bands` for more independent tables). Buckets denser than the
    * expectation (near-duplicate clusters — they collide at ANY
    * resolution) are hard-capped at `maxBucketSize`, deterministically.
    * The 512 default is the measured knee on the sf1 stress (20k
    * clustered vectors): vs cap 1024 it is 1.9× faster (27.1 → 14.0 s)
    * for −0.01 recall (0.795 → 0.785; sf0.1 recall identical at 0.786),
    * while 256 costs a real −0.044 here — unlike [[knnGraphSharded]],
    * whose cell-bounded buckets lose nothing at 256.
    */
  def knnGraph(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      bands: Int = 24,
      planesPerBand: Int = 6,
      seed: Long = 42L,
      maxBucketSize: Int = 512,
      refineRounds: Int = 1,
      dim: Int = -1,
      targetBucketSize: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(targetBucketSize >= 1, s"targetBucketSize must be >= 1, got $targetBucketSize")
    val n = corpus.count()
    val needed = math.max(1L, (n + targetBucketSize - 1) / targetBucketSize)
    val autoPlanesHere = math.min(20, math.max(planesPerBand,
      64 - java.lang.Long.numberOfLeadingZeros(needed - 1)))
    val scored = cosinePairsLsh(corpus, idCol, vecCol,
      threshold = Double.NegativeInfinity, bands, autoPlanesHere, seed,
      maxBucketSize, dim, nHint = n)
    val sym = symmetrize(scored)
    val vecs = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
      .where(col("__v").isNotNull)
    nnDescent(sym, vecsSide(vecs, n, if (dim > 0) dim else vectorDim(corpus, vecCol)),
      k, refineRounds)
  }

  /** Broadcast-hint the one-row-per-id vector table when it fits the
    * broadcast budget (~64 MB of row data) — else return it unhinted for
    * the shuffle join. The hint matters BOTH ways: without it, the
    * planner's post-aggregate size estimates routinely pick the candidate-
    * PAIR side as the broadcast build (measured on q_knn_graph_sharded:
    * the ~400k-row deduped pair table built single-threaded into a hash
    * relation — 1.5 s of the query's 3.4 s — while the 2000-row vector
    * table shuffled), and at corpus scale the vector side must NOT be
    * broadcast at all. `n < 0` (unknown) never hints.
    */
  private def vecsSide(vecs: DataFrame, n: Long, dim: Int): DataFrame = {
    val rowBytes = 4L * math.max(1, dim) + 24L
    if (n >= 0 && n * rowBytes <= (64L << 20)) broadcast(vecs) else vecs
  }

  /** Per-node top-k over symmetric (id, nb, cos) candidate edges.
    * distinctIds keeps max score per (id, nb) — collapses band and round
    * duplicates inside the k-bounded partial buffers.
    */
  private def topKGraphEdges(edges: DataFrame, k: Int): DataFrame = edges
    .groupBy("id")
    .agg(graft.functions.TopKByScore.topk_by_score(
      col("cos"), col("nb"), k, distinctIds = true).as("__top"))
    .select(col("id"), posexplode(col("__top")).as(Seq("__r", "__e")))
    .select(col("id"), col("__e.id").as("neighbor_id"),
      col("__e.score").as("cos"), (col("__r") + 1).cast("int").as("rank"))

  /** NN-descent refinement (Dong et al. 2011) over an initial candidate
    * edge set: per round, neighbors-of-neighbors become candidates, exact
    * cosine re-ranks, each node keeps top-k — one self-join bounded by k²
    * candidates per node plus a k-bounded re-aggregation. `vecs` must be
    * (id, __v).
    */
  private def nnDescent(
      initialEdges: DataFrame,
      vecs: DataFrame,
      k: Int,
      refineRounds: Int): DataFrame = {
    var graph = topKGraphEdges(initialEdges, k)
    var round = 0
    while (round < refineRounds) {
      val cand = graph.select(col("id"), col("neighbor_id").as("__mid"))
        .join(graph.select(col("id").as("__mid"), col("neighbor_id").as("nb")),
          Seq("__mid"))
        .where(col("id") =!= col("nb"))
        .select("id", "nb")
        .dropDuplicates("id", "nb")
        .join(vecs.select(col("id"), col("__v").as("__va")), Seq("id"))
        .join(vecs.select(col("id").as("nb"), col("__v").as("__vb")), Seq("nb"))
        .select(col("id"), col("nb"), cosine(col("__va"), col("__vb")).as("cos"))
      graph = topKGraphEdges(
        graph.select(col("id"), col("neighbor_id").as("nb"), col("cos"))
          .unionByName(cand), k)
      round += 1
    }
    graph
  }

  /** [[knnGraph]] pre-sharded by IVF cell — the n = 10⁹ scale path
    * SCALING.md's knnGraph note prescribes. A single global LSH table must
    * keep raising band resolution as n grows (the 20-plane clamp lands at
    * n ≈ 10⁸·targetBucket); sharding first by a coarse quantizer makes the
    * banding problem PER-CELL (n/nlist points), so resolution, bucket
    * occupancy, and candidate volume are governed by the cell size — grow
    * `nlist` with the corpus and the per-cell geometry is scale-invariant.
    *
    * Spark shape — ONE distributed job, not a per-cell loop: every vector
    * is assigned to its `nprobe` nearest cells (the same constant-folded
    * centroid Column algebra as [[ivfSearch]]; the spill to nprobe > 1
    * cells is what stitches the graph across cell boundaries — a point
    * near a boundary banding in BOTH cells gives cross-cell candidate
    * edges), the LSH bucket key is PREFIXED with the cell id (candidates
    * generate intra-cell only, buckets stay cell-coherent), and the
    * NN-descent rounds then run globally, propagating those cross-cell
    * seeds outward — boundary stitching beyond nprobe happens through
    * neighbors-of-neighbors, cheaper than more probes. Shuffle payloads
    * match [[knnGraph]] (band rows are (cell, bucket, id); vectors join
    * back per candidate) at nprobe× the band-row volume.
    *
    * `nprobe` is the recall knob (band-row volume scales with it):
    * measured at k=10 against exact brute force with the redundancy floor
    * in place, nprobe=3 (default) gives 0.92 on the sf0.01 embeddings
    * (cap-safe cells → the exact all-pairs path) and 0.79 on the sf0.1
    * set vs knnGraph's 0.83/0.79 — recall parity with the global variant
    * at a fraction of its candidate mass; nprobe=2 drops to ~0.7
    * (neighborhoods straddle more than two cells). The coarse fit needs
    * few Lloyd rounds (`kmeansIter` = 4: recall −0.01 for half the build
    * time — the spill absorbs quantizer jitter, the same law as
    * ivfSearch's nprobe routing).
    *
    * `maxBucketSize` defaults far TIGHTER than the near-dup pipelines'
    * cap (256 vs 1024): pair volume is quadratic in bucket occupancy and
    * a k-NN graph only needs each node's top-k, so a dense bucket's
    * 500k-pair tail buys nothing a node's other 23 bands and the
    * NN-descent round don't already provide. Measured on the sf1 stress
    * (20k vectors, clustered): cap 1024 → 52.6 s, cap 256 → 13.3 s with
    * recall UNCHANGED (0.662 vs 0.661; sf0.1 identical at 0.843); cap 128
    * starts costing recall (0.640). Oversized buckets are dropped whole
    * (the [[Dedup.bucketPairs]] policy) — their members keep candidates
    * via their other bands and the nprobe spill.
    */
  def knnGraphSharded(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nlist: Int = -1,
      nprobe: Int = 3,
      bands: Int = 24,
      seed: Long = 42L,
      maxBucketSize: Int = 256,
      refineRounds: Int = 1,
      dim: Int = -1,
      targetBucketSize: Int = 64,
      maxTrainRows: Long = 200000L,
      kmeansIter: Int = 4,
      prebuiltIndex: Option[IvfIndex] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(targetBucketSize >= 1, s"targetBucketSize must be >= 1, got $targetBucketSize")
    val n = corpus.count()
    // nlist < 0 (default) DERIVES the cell count from the corpus — the
    // "grow nlist with the corpus" law made automatic instead of left to
    // the caller: cells target ~4096 spilled members (n·nprobe/4096,
    // floored at 16 so every small-corpus result is byte-identical to the
    // old fixed default, capped at 4096 — past that the per-cell k-means
    // fit, not the cell size, is what needs re-architecting). A fixed 16
    // at 200k vectors measured 37.5k-member cells and recall 0.27 on the
    // sf10 stress; the derived 146 cells measured 0.63 — recall is the
    // default's job, the time trade is the caller's knob.
    val nlistEff =
      if (nlist > 0) nlist
      else math.max(16L, math.min(4096L, n * nprobe / 4096L)).toInt
    // prebuiltIndex: the build-once/search-many split — a session/catalog
    // caller that already fit the coarse quantizer (IvfIndex.save/load)
    // skips the k-means jobs entirely; nlist/maxTrainRows/kmeansIter are
    // then ignored.
    val index = prebuiltIndex.getOrElse(buildIvfIndex(corpus, idCol, vecCol,
      nlistEff, maxTrainRows = maxTrainRows, maxIter = kmeansIter, seed = seed))
    val vecs = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
      .where(col("__v").isNotNull)
    // nprobe-nearest-cell routing: one compact loop over the centroid
    // array literal — no UDF ([[probeCellsCol]], ivfSearch's routing
    // applied to the corpus itself).
    val probeCells = probeCellsCol(index.centers,
      col("__v").cast("array<double>"), nprobe)
    // Band resolution from the expected SPILLED cell population
    // (n·nprobe/nlist) — the cell is the bounding mechanism, so unlike
    // knnGraph there is no resolution floor: a cell that already fits the
    // target bucket banding-partitions into singletons and loses its
    // candidates. needed == 1 ⇒ no LSH at all (per-cell all-pairs, still
    // hard-capped by maxBucketSize); otherwise expected bucket ≈
    // targetBucketSize regardless of n or nlist. Sizing from the MAX cell
    // instead was measured WORSE on the sf1 stress (58.7 → 80.3 s): dense
    // clusters collide at any plane count, so finer bands just add band
    // rows — the quadratic tail is maxBucketSize's job (below), not the
    // resolution's.
    val d = if (dim > 0) dim else vectorDim(corpus, vecCol)
    val cellSize = math.max(1L, n * nprobe / math.max(1, index.centers.length))
    val needed = math.max(1L, (cellSize + targetBucketSize - 1) / targetBucketSize)
    val rawPlanes = math.min(20,
      64 - java.lang.Long.numberOfLeadingZeros(needed - 1)).toInt
    // Redundancy floor: with 2^planes ≤ bands, a RANDOM pair collides in
    // bands/2^planes ≥ 1 bands in expectation — the generator emits MORE
    // raw rows than per-cell all-pairs would, all of it re-deduped
    // downstream (measured at sf0.1: planes=3 × 24 bands → ~3× all-pairs
    // mass, and the dedup/verify of that mass was most of the query).
    // Two responses, chosen by cell size:
    //  - a cap-safe cell (≤ maxBucketSize) takes the all-pairs path
    //    outright (each pair generated ONCE, exact recall — strictly
    //    better than any banding at the same mass);
    //  - a bigger cell raises resolution to the LAST redundant level,
    //    ceil(log2(bands)) — measured the best of the three candidate
    //    responses at sf0.1 (2000 vecs, 16 cells): planes 3 → 5 cut the
    //    query 5.5 → 1.25 s at recall 0.87 → 0.79, while one MORE plane
    //    (the first non-redundant level) lost far more recall for no
    //    further time (0.67 @ 1.5 s), and trimming bands to 2^planes
    //    instead was worse on both axes (0.77 @ 1.7 s — coarse 8-bucket
    //    bands push dense clusters over maxBucketSize, dropping them
    //    whole). The remaining ≈1 expected redundant collision is what
    //    keeps the moderate-similarity S-curve tail.
    // Cells above the target at large n derive planes > log2(bands) on
    // their own, so the floor is inert exactly where the original law
    // already worked.
    val minUseful =
      (64 - java.lang.Long.numberOfLeadingZeros((bands - 1).toLong)).toInt
    val autoPlanes =
      if (rawPlanes <= 0) 0
      else if ((1L << rawPlanes) > bands) rawPlanes
      else if (cellSize <= maxBucketSize) 0
      else math.min(20, minUseful)
    val spilled = vecs.withColumn("cell", explode(probeCells))
    val banded =
      if (autoPlanes <= 0)
        spilled.select(col("id"), col("cell"), lit(0L).as("bucket"))
      else {
        val hp = HyperplaneOps.flatPlanes(d, bands * autoPlanes, seed)
        spilled.select(col("id"), col("cell"),
          explode(hyperplane_band_keys(col("__v"), hp, bands, autoPlanes))
            .as("bucket"))
      }
    val pairs = Dedup.bucketPairsIds(banded, Seq("cell", "bucket"), maxBucketSize)
      .dropDuplicates("id_a", "id_b")
      .join(vecsSide(vecs.select(col("id").as("id_a"), col("__v").as("v_a")), n, d), "id_a")
      .join(vecsSide(vecs.select(col("id").as("id_b"), col("__v").as("v_b")), n, d), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
    nnDescent(symmetrize(pairs), vecsSide(vecs, n, d), k, refineRounds)
  }

  /** (id_a, id_b, cos) → both directed edges in ONE pass over the pair
    * pipeline. The union-of-two-selects formulation executes the whole
    * candidate subtree TWICE (exchange reuse dedups shuffle writes, but the
    * joins and cosine evaluation above them re-run per branch); a 2-way
    * struct explode is a narrow fan-out of rows already in hand.
    */
  private def symmetrize(pairs: DataFrame): DataFrame = pairs
    .select(explode(array(
      struct(col("id_a").as("id"), col("id_b").as("nb"), col("cos")),
      struct(col("id_b").as("id"), col("id_a").as("nb"), col("cos")))).as("__e"))
    .select(col("__e.id").as("id"), col("__e.nb").as("nb"),
      col("__e.cos").as("cos"))

  /** Contrastive (anchor, positive, negative) triplet mining — the
    * training-pair assembly for embedding/retrieval fine-tuning. A
    * POSITIVE is the anchor's best near-duplicate (cosine ≥
    * `posThreshold` via the banded-LSH pair generator, argmax on
    * (rounded cosine desc, id asc) — the kCenter float policy). The
    * NEGATIVE is an in-batch draw: ids ring-order inside md5-bucket
    * shards (successor in (draw, id) order, wrapping per shard), so
    * every anchor gets a pseudo-random partner that is a pure function
    * of (id, salt) — deterministic across retries and engines, with NO
    * global sort (each shard windows independently). `neg_ok` flags the
    * draws a trainer keeps: not the anchor, not its positive, and below
    * the positive threshold (false negatives are flagged, not silently
    * dropped, so batch statistics stay audit-able).
    *
    * Scale shape: positives ride [[cosinePairsLsh]]'s payload-free
    * banding; the ring is one (id, 12-hex-char draw) window per shard;
    * vectors join back ONLY for the anchor/negative cosine — one
    * id-keyed join each. Output: (anchor_id, pos_id, pos_cos, neg_id,
    * neg_cos, neg_ok) (+ n_pos_candidates when capped).
    *
    * `maxPositivesPerAnchor` > 0 bounds the positive-candidate mass per
    * anchor BEFORE the argmax — the bucket-cap convention applied to
    * output mass (a dense replica cluster of size c emits c−1 candidate
    * positives per member; a trainer samples positives anyway). The kept
    * set is the N smallest deterministic md5 pair-draws (a pure function
    * of (anchor, pos, salt) — no RNG state), selected by the k-bounded
    * [[graft.functions.TopKByScore]] aggregate (map-side combined, never
    * a window over the pair table), and the argmax runs among them.
    * `n_pos_candidates` audits the residual: the TRUE per-anchor
    * candidate count pre-cap, so subsampled anchors are visible, not
    * silent. 0 (default) = uncapped, output byte-identical to before.
    */
  def contrastiveTriplets(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      posThreshold: Double = 0.99,
      salt: String = "graft-ring",
      bands: Int = 16,
      planesPerBand: Int = 8,
      seed: Long = 42L,
      ringHexChars: Int = 1,
      maxPositivesPerAnchor: Int = 0): DataFrame = {
    // 16^ringHexChars ring shards: each shard is an independent window
    // sort, so raise this with the corpus (3 hex chars = 4096 shards at
    // web scale) — the draw stays a pure function of (id, salt) at any
    // sharding; the DEFAULT stays 1 so the registered oracle's replay
    // (substr(draw, 1, 1)) is byte-stable.
    require(ringHexChars >= 1 && ringHexChars <= 6,
      s"ringHexChars must be in [1,6], got $ringHexChars")
    val pairs = cosinePairsLsh(df, idCol, vecCol, posThreshold,
      bands, planesPerBand, seed)
    val bothRaw = pairs
      .select(col("id_a").as("anchor_id"), col("id_b").as("pos_id"), col("cos"))
      .unionByName(pairs
        .select(col("id_b").as("anchor_id"), col("id_a").as("pos_id"), col("cos")))
    // Argmax as a max-struct AGGREGATE, not a row_number window: the pair
    // table is true output mass (15.8M rows on a cluster-dense sf1 slice),
    // and the aggregate partially combines map-side where a window must
    // sort the full pair set. (rounded cos desc, id asc) via (c, -id) max.
    val best =
      if (maxPositivesPerAnchor <= 0)
        bothRaw
          .groupBy(col("anchor_id"))
          .agg(max(struct(round(col("cos"), 6).as("c"),
            (-col("pos_id")).as("nid"))).as("b"))
          .select(col("anchor_id"), (-col("b.nid")).as("pos_id"),
            col("b.c").as("pos_cos"))
      else {
        // Capped: ONE k-bounded aggregate pass — the top-N smallest md5
        // pair-draws per anchor (−draw as the top-k score; draw < 2^52 is
        // exact as a double), each entry CARRYING its rounded cosine via
        // the payload variant, so no second pass or join back into the
        // pair table is ever needed (the join-back formulation measured
        // ~1.6× the whole uncapped query at sf1). The argmax over the
        // ≤ N kept entries is a narrow array fold.
        val drawL = graft.functions.TextFunctions.md5_pair_draw(
          col("anchor_id").cast("long"), col("pos_id").cast("long"),
          salt + "-cap")
        bothRaw
          .select(col("anchor_id"), col("pos_id"),
            round(col("cos"), 6).as("__rc"), drawL.as("__d"))
          .groupBy(col("anchor_id"))
          .agg(
            graft.functions.TopKByScorePayload.topk_by_score_payload(
              -col("__d").cast("double"), col("pos_id"), col("__rc"),
              maxPositivesPerAnchor).as("__t"),
            count(lit(1)).as("n_pos_candidates"))
          .select(col("anchor_id"),
            array_max(transform(col("__t"), e =>
              struct(e.getField("payload").as("c"),
                (-e.getField("id")).as("nid")))).as("b"),
            col("n_pos_candidates"))
          .select(col("anchor_id"), (-col("b.nid")).as("pos_id"),
            col("b.c").as("pos_cos"), col("n_pos_candidates"))
      }
    // Ring negatives: md5 draw → 16 shards on the first hex char; the
    // successor in (draw, id) order (wrap to the shard's first) is the
    // deterministic in-batch partner.
    val drawn = df.select(col(idCol).cast("long").as("id"))
      .withColumn("__draw",
        substring(md5(concat(col("id").cast("string"), lit("-" + salt))
          .cast("binary")), 1, 12))
      .withColumn("__shard", substring(col("__draw"), 1, ringHexChars))
    val wRing = Window.partitionBy(col("__shard"))
      .orderBy(col("__draw"), col("id"))
    val ring = drawn.select(col("id").as("anchor_id"),
      coalesce(lead(col("id"), 1).over(wRing),
        first(col("id")).over(wRing.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .as("neg_id"))
    val vecs = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val auditCols =
      if (maxPositivesPerAnchor > 0) Seq(col("n_pos_candidates")) else Nil
    best.join(ring, "anchor_id")
      .join(vecs.select(col("id").as("anchor_id"), col("v").as("__av")),
        "anchor_id")
      .join(vecs.select(col("id").as("neg_id"), col("v").as("__nv")),
        "neg_id")
      .select(Seq(col("anchor_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"),
        round(cosine(col("__av"), col("__nv")), 6).as("neg_cos")) ++
        auditCols: _*)
      .withColumn("neg_ok",
        (col("neg_id") =!= col("anchor_id") &&
          col("neg_id") =!= col("pos_id") &&
          col("neg_cos") < posThreshold).cast("int"))
  }

  /** Auto hyperplane-band resolution — [[knnGraph]]'s law generalized to
    * the threshold-pair generators: a FIXED planes-per-band leaves
    * expected bucket size n / 2^planes, so candidate-pair mass grows
    * quadratically once the corpus outgrows the resolution (measured 17×
    * at a 10× embedding scale-up with r = 8 on 20k vectors). Raise the
    * resolution toward ceil(log2(n / targetBucketSize)) — holding the
    * expected bucket CONSTANT — but never past the point where the
    * angular S-curve 1 − (1 − p^r)^bands (p = 1 − θ/π at the verify
    * threshold) drops below 0.95 recall; identical vectors collide at ANY
    * resolution, so the exact-duplicate contract is resolution-free.
    * Thresholds ≤ 0 (no verify floor — the knnGraph top-k path, which
    * recovers recall by NN-descent) take the bucket-size target directly.
    */
  private[ops] def autoPlanes(
      n: Long, bands: Int, floorPlanes: Int, threshold: Double,
      targetBucketSize: Int = 64, maxPlanes: Int = 20): Int = {
    val needed = math.max(1L, (n + targetBucketSize - 1) / targetBucketSize)
    val wanted =
      if (needed <= 1) floorPlanes
      else math.max(floorPlanes, math.min(maxPlanes,
        64 - java.lang.Long.numberOfLeadingZeros(needed - 1)))
    if (wanted <= floorPlanes) floorPlanes
    else if (threshold.isNaN || threshold <= 0.0) wanted
    else {
      val p = 1.0 - math.acos(math.min(1.0, threshold)) / math.Pi
      def recall(r: Int): Double =
        1.0 - math.pow(1.0 - math.pow(p, r), bands.toDouble)
      var r = floorPlanes
      while (r < wanted && recall(r + 1) >= 0.95) r += 1
      r
    }
  }

  def cosinePairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bands: Int = 16,
      planesPerBand: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize,
      dim: Int = -1,
      nHint: Long = -1L): DataFrame = {
    val d = if (dim > 0) dim else vectorDim(df, vecCol)
    // One metadata-cheap count (the knnGraph precedent) feeds the
    // [[autoPlanes]] resolution; callers that already counted pass nHint.
    val n = if (nHint >= 0) nHint else df.count()
    val effPlanes = autoPlanes(n, bands, planesPerBand, threshold)
    val hp = HyperplaneOps.flatPlanes(d, bands * effPlanes, seed)
    // Band rows carry (bucket, id) only; vectors join back per deduped
    // candidate pair from the one-row-per-doc table — shuffle bytes linear
    // in the corpus, not `bands`× the vector table (the same payload-free
    // shape as Dedup.ngramJaccardPairs/minhashDupePairs).
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = vecs.select(col("id"),
      explode(hyperplane_band_keys(col("v"), hp, bands, effPlanes)).as("bucket"))
    Dedup.bucketPairsIds(banded, Seq("bucket"), maxBucketSize)
      .dropDuplicates("id_a", "id_b")
      .join(vecsSide(vecs.select(col("id").as("id_a"), col("v").as("v_a")), n, d), "id_a")
      .join(vecsSide(vecs.select(col("id").as("id_b"), col("v").as("v_b")), n, d), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Per-label centroid drift between two embedding snapshots — the
    * distribution-shift monitor for a re-embedded or re-crawled corpus
    * ("did class c's embedding cloud move between model v1 and v2 /
    * snapshot t and t+1"). Reported as the SIGNED squared cosine between
    * the two per-label centroid directions, in ppm, with zero floating
    * point: components quantize to ⌊x·quant⌋ (floor — exact in any
    * engine, unlike round), per-label component sums are exact int64,
    * and
    *
    *   cos²_ppm = sign(dot) · ⌊⌊|dot|·10⁶ / aa⌋ · |dot| / bb⌋
    *   (dot = Σ sa·sb, aa = Σ sa², bb = Σ sb²)
    *
    * in DECIMAL(38,0). The divide-multiply-divide ORDER is load-bearing:
    * dot² alone overflows DECIMAL(38,0) at second-decade magnitudes
    * (measured: 9.4e41 at 200k vectors with offset-replica components),
    * while this form is Cauchy–Schwarz-bounded — every intermediate is
    * ≤ 10⁶·bb — at any corpus size. It is a floor-of-floor recipe, not
    * the exact floor of the real quotient (off by at most a few µ), and
    * both engines replay the identical recipe bit-for-bit (the
    * [[graft.ops.Stats.pearsonCorr]] sign-factoring convention). 10⁶ =
    * parallel
    * centroids (no drift), 0 = orthogonal or a degenerate zero centroid,
    * negative = the direction flipped. The unnormalized sums ARE the
    * centroid directions (n divides out of cos), so no per-label mean is
    * ever materialized.
    *
    * Scale shape: each snapshot fans (label, dim, quantized x) rows and
    * collapses map-side to |labels|·dim sums; the join and everything
    * after are label×dim-bounded. Labels must appear in BOTH snapshots
    * to report (inner join — a label absent from one side has no drift
    * to measure).
    */
  def centroidDrift(
      a: DataFrame,
      b: DataFrame,
      labelCol: String,
      vecCol: String,
      quant: Int = 100): DataFrame = {
    require(quant >= 1, s"quant must be >= 1, got $quant")
    val dec = "decimal(38,0)"
    def sums(df: DataFrame, tag: String): DataFrame = df
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("d", "__x")))
      .groupBy("label", "d")
      // explicit float→double BEFORE the multiply: float×int arithmetic
      // differs across engines near floor boundaries; double is IEEE-
      // identical everywhere.
      .agg(sum(expr(s"CAST(floor(CAST(__x AS DOUBLE) * $quant) AS BIGINT)"))
        .as(s"__s_$tag"),
        count(lit(1)).as(s"__n_$tag"))
    sums(a, "a").join(sums(b, "b"), Seq("label", "d"))
      .groupBy("label")
      .agg(max(col("__n_a")).as("n_a"), max(col("__n_b")).as("n_b"),
        sum(col("__s_a").cast(dec) * col("__s_b")).as("__dot"),
        sum(col("__s_a").cast(dec) * col("__s_a")).as("__aa"),
        sum(col("__s_b").cast(dec) * col("__s_b")).as("__bb"))
      .select(col("label"), col("n_a"), col("n_b"),
        expr("""CAST(CASE WHEN __aa = 0 OR __bb = 0 THEN 0 ELSE
          (CASE WHEN __dot >= 0 THEN 1 ELSE -1 END) *
          (((abs(__dot) * 1000000) DIV __aa) * abs(__dot) DIV __bb)
          END AS BIGINT)""")
          .as("cos2_ppm"))
  }
}
