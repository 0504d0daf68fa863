package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions.col

class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def v(xs: Float*): Seq[Float] = xs.toSeq

  // Two well-separated clusters along axes 0 and 1.
  private val centers = Seq(
    0 -> Array(1f, 0f, 0f),
    1 -> Array(0f, 1f, 0f))

  private lazy val corpus = Seq(
    (1L, v(1f, 0f, 0f)),        // cluster 0
    (2L, v(1f, 0f, 0f)),        // exact dup of 1 → drop
    (3L, v(0.99f, 0.01f, 0f)),  // near dup of 1 (cos ≈ 1) → drop
    (4L, v(0.8f, 0f, 0.6f)),    // cluster 0 but cos(1,4) = 0.8 < t → keep
    (10L, v(0f, 1f, 0f)),       // cluster 1
    (11L, v(0f, 1f, 0f)))       // exact dup of 10 → drop
    .toDF("vec_id", "embedding")

  private def verdicts(maxClusterSize: Int = 100) =
    SemDedup.semanticDedup(corpus, "vec_id", "embedding", centers,
        threshold = 0.95, maxClusterSize = maxClusterSize)
      .as[(Long, Int, Int)].collect()
      .map { case (id, cell, keep) => id -> ((cell, keep)) }.toMap

  test("drops same-cluster near-dups, keeps one representative") {
    val m = verdicts()
    assert(m(1L) === ((0, 1)))
    assert(m(2L) === ((0, 0)))
    assert(m(3L) === ((0, 0)))
    assert(m(4L) === ((0, 1))) // below threshold → kept
    assert(m(10L) === ((1, 1)))
    assert(m(11L) === ((1, 0)))
  }

  test("cap keeps beyond-cap vectors unconditionally") {
    // Cluster 0 participants under cap 2: ids 1, 2 → only 2 drops; 3 is
    // past the cap and survives even though it is a near-dup of 1.
    val m = verdicts(maxClusterSize = 2)
    assert(m(2L)._2 === 0)
    assert(m(3L)._2 === 1)
    assert(m(4L)._2 === 1)
  }

  test("semanticDedupKept returns exactly the keep=1 rows") {
    val kept = SemDedup.semanticDedupKept(corpus, "vec_id", "embedding",
        centers, threshold = 0.95)
      .select("vec_id").as[Long].collect().sorted
    assert(kept === Array(1L, 4L, 10L))
  }

  test("distinct same-cluster vectors survive; their twins do not") {
    // Vector 20 lands in cluster 1 (cos 0.92 with its centroid — below the
    // 0.95 dup threshold, so distinct from vector 10); its exact twin 21
    // shares the cell and is dropped against it.
    val extra = corpus.union(Seq(
      (20L, v(0.3f, 0.7f, 0f)),
      (21L, v(0.3f, 0.7f, 0f))).toDF("vec_id", "embedding"))
    val m = SemDedup.semanticDedup(extra, "vec_id", "embedding", centers,
        threshold = 0.95)
      .as[(Long, Int, Int)].collect()
      .map { case (id, cell, keep) => id -> ((cell, keep)) }.toMap
    assert(m(20L) === ((1, 1)))
    assert(m(21L) === ((1, 0)))
  }

  test("crossSemanticDedup drops candidates near the reference, keeps the rest") {
    val reference = Seq(
      (1L, v(1f, 0f, 0f)),
      (10L, v(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val candidates = Seq(
      (100L, v(1f, 0f, 0f)),       // copy of ref 1 → drop
      (101L, v(0.99f, 0.01f, 0f)), // near ref 1 → drop
      (102L, v(0.8f, 0f, 0.6f)),   // cell 0 but cos 0.8 < t → keep
      (103L, v(0f, 1f, 0f)))       // copy of ref 10 → drop
      .toDF("vec_id", "embedding")
    val m = SemDedup.crossSemanticDedup(candidates, reference, "vec_id",
        "embedding", centers, threshold = 0.95)
      .as[(Long, Int, Int)].collect()
      .map { case (id, cell, keep) => id -> ((cell, keep)) }.toMap
    assert(m(100L) === ((0, 0)))
    assert(m(101L) === ((0, 0)))
    assert(m(102L) === ((0, 1)))
    assert(m(103L) === ((1, 0)))
    assert(m.size === 4)
    // Candidates never compare against each other: two identical
    // candidates with no reference neighbor both survive.
    val twins = Seq(
      (200L, v(0.3f, 0.7f, 0f)),
      (201L, v(0.3f, 0.7f, 0f)))
      .toDF("vec_id", "embedding")
    val t2 = SemDedup.crossSemanticDedup(twins, reference, "vec_id",
        "embedding", centers, threshold = 0.95)
      .as[(Long, Int, Int)].collect()
      .map { case (id, _, keep) => id -> keep }.toMap
    assert(t2(200L) === 1 && t2(201L) === 1)
  }

  test("kCenterSample walks farthest-first with deterministic ties") {
    // Four tight groups at the simplex corners plus the seed's own dups:
    // greedy coverage must visit one member of each distinct corner before
    // any near-duplicate, in max-min-distance order.
    val docs = Seq(
      1L -> v(1f, 0f, 0f), 2L -> v(1f, 0f, 0f),        // corner A (id 1 = seed)
      10L -> v(0f, 1f, 0f), 11L -> v(0f, 0.99f, 0.01f), // corner B
      20L -> v(0f, 0f, 1f),                             // corner C
      30L -> v(0.6f, 0.55f, 0.55f))                     // center-ish
      .map { case (id, e) => (id, e) }.toDF("vec_id", "embedding")
    val got = Similarity.kCenterSample(docs, "vec_id", "embedding", k = 4)
      .orderBy("rank")
      .as[(Int, Long, Option[Double])].collect()
    assert(got.map(_._2).take(3).toSet === Set(1L, 10L, 20L),
      s"first three picks must cover the three far corners: ${got.toSeq}")
    assert(got(0)._2 === 1L && got(0)._3.isEmpty) // lowest-id seed, null dist
    // dist is non-increasing over ranks 1..k-1.
    val ds = got.drop(1).map(_._3.get)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, ds.toSeq.toString)
    // rank 3 prefers the genuinely-distant center point over corner dups.
    assert(got(3)._2 === 30L)
    // Exact duplicates of centers can be picked only once each, after
    // diversity is exhausted: ids stay distinct at k = corpus size.
    val all = Similarity.kCenterSample(docs, "vec_id", "embedding", k = 6)
      .as[(Int, Long, Option[Double])].collect()
    assert(all.map(_._2).distinct.length === 6)
    // Deterministic across runs.
    val again = Similarity.kCenterSample(docs, "vec_id", "embedding", k = 4)
      .orderBy("rank").as[(Int, Long, Option[Double])].collect()
    assert(got.toSeq === again.toSeq)
  }

  test("kMeansQuantized separates obvious clusters deterministically") {
    // Two tight groups on orthogonal axes, k = 2: after any iterations the
    // two groups must land in different clusters, together within a group.
    val docs = Seq(
      1L -> v(1f, 0f, 0f), 2L -> v(0.99f, 0.01f, 0f), 3L -> v(0.98f, 0f, 0.02f),
      10L -> v(0f, 1f, 0f), 11L -> v(0.01f, 0.99f, 0f), 12L -> v(0f, 0.98f, 0.02f))
      .toDF("vec_id", "embedding")
    val got = Similarity.kMeansQuantized(docs, "vec_id", "embedding",
        k = 2, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L))
    assert(Set(got(1L), got(2L), got(3L)).size === 1, got.toString)
    assert(Set(got(10L), got(11L), got(12L)).size === 1, got.toString)
    assert(got(1L) !== got(10L), got.toString)
    // Iterations genuinely move centroids off the lowest-id seeds: seeds
    // 1 and 2 start in DIFFERENT clusters (each is its own centroid);
    // after Lloyd rounds they must co-cluster.
    val it0 = Similarity.kMeansQuantized(docs, "vec_id", "embedding",
        k = 2, iters = 0)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(it0(1L) !== it0(2L), it0.toString)
    // Deterministic across runs (bit-exact integer policy).
    val again = Similarity.kMeansQuantized(docs, "vec_id", "embedding",
        k = 2, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got === again)
  }

  test("knnGraph: k edges per node, ranked, refinement helps recall") {
    // Clustered vectors (modular structure) so LSH buckets carry signal.
    val rng = new scala.util.Random(3)
    val docs = (0L until 200L).map { i =>
      val c = (i % 5).toInt
      val base = Array.fill(16)(0f)
      base(c * 3) = 1f; base(c * 3 + 1) = 0.5f
      (i, base.toSeq.map(x => x + rng.nextFloat() * 0.2f))
    }.toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(docs, "vec_id", "embedding", k = 5)
      .collect()
    assert(g.length === 200 * 5)
    val byId = g.groupBy(_.getLong(0))
    byId.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted === (1 to 5).toArray)     // ranks
      assert(rows.map(_.getLong(1)).distinct.length === 5)          // distinct nbs
      val sorted = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
    assert(g.forall(r => r.getLong(0) != r.getLong(1)), "no self edges")
    // Recall vs exact, with and without the NN-descent round.
    val truth = Similarity.bruteForceTopK(docs, "vec_id", "embedding",
        docs, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    def recall(rounds: Int): Double = {
      val approx = Similarity.knnGraph(docs, "vec_id", "embedding", k = 5,
          refineRounds = rounds)
        .select("id", "neighbor_id").as[(Long, Long)].collect().toSet
      truth.count(approx.contains).toDouble / truth.size
    }
    val r0 = recall(0)
    val r1 = recall(1)
    assert(r1 >= r0, s"refinement must not hurt: $r0 -> $r1")
    assert(r1 >= 0.6, s"refined recall too low: $r1")
  }

  test("tiling an oversized cell changes no verdicts") {
    // 60 vectors all in cell 0 (near the axis-0 centroid), several exact-dup
    // families plus distinct spreads. tileSize = 7 forces ceil(60/7) = 9
    // tiles — every upper-triangle tile block participates — and must
    // reproduce the single-tile verdicts exactly.
    val rng = new scala.util.Random(7)
    val big = (0L until 60L).map { i =>
      if (i % 3 == 0) (i, v(1f, 0f, 0f))                      // dup family
      else (i, v(1f, rng.nextFloat() * 0.6f, rng.nextFloat() * 0.6f))
    }.toDF("vec_id", "embedding")
    def run(tile: Int) =
      SemDedup.semanticDedup(big, "vec_id", "embedding", centers,
          threshold = 0.98, maxClusterSize = 100, tileSize = tile)
        .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val tiled = run(7)
    assert(tiled === run(100), "tiled verdicts must equal single-tile verdicts")
    // The dup family (every 3rd id) collapses to its lowest id.
    assert(tiled.filter(_._1 % 3 == 0).count(_._3 == 1) === 1)

    // Cross-corpus: tiled reference side reproduces single-tile verdicts.
    val refs = (1000L until 1020L).map(i => (i, v(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    def runCross(tile: Int) =
      SemDedup.crossSemanticDedup(big, refs, "vec_id", "embedding", centers,
          threshold = 0.98, maxClusterSize = 100, tileSize = tile)
        .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(runCross(3) === runCross(100))
  }

  test("pair stage compares within cells only (no corpus cross join)") {
    val n = 500
    val docs = (0L until n.toLong)
      .map(i => (i, Seq(((i % 7) + 1).toFloat, ((i % 11) + 1).toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val out = SemDedup.semanticDedup(docs, "vec_id", "embedding", centers,
      threshold = 0.999999, maxClusterSize = 1000)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"within-cluster pairing must not be a cartesian product:\n$plan")
    assert(out.count() === n.toLong)
  }

  test("centroidDrift: identical snapshots 1e6, orthogonal 0, flipped -1e6, " +
      "inner-join label scope") {
    import org.apache.spark.sql.functions.col
    val a = Seq(
      (1L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)),
      (9L, Array(1.0f, 1.0f))). // label 9 absent from b → no row
      toDF("lab", "v")
    val b = Seq(
      (1L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("lab", "v")
    val got = graft.ops.Similarity.centroidDrift(a, b, "lab", "v")
      .orderBy("label").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 2L, 1000000L),
      (2L, 1L, 1L, 0L),
      (3L, 1L, 1L, -1000000L)))
    // a rotated (not flipped) centroid lands strictly between: b = (1, 1)
    // against a = (1, 0) → cos² = 1/2 → 500000.
    val rot = graft.ops.Similarity.centroidDrift(
      Seq((5L, Array(1.0f, 0.0f))).toDF("lab", "v"),
      Seq((5L, Array(1.0f, 1.0f))).toDF("lab", "v"), "lab", "v")
      .as[(Long, Long, Long, Long)].head()
    assert(rot === ((5L, 1L, 1L, 500000L)))
  }
}
