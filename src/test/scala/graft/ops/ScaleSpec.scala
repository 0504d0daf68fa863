package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class ScaleSpec extends SparkTestBase {

  test("zone-map manifest: pruned scan equals full scan, skips distant files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zm-spec").toString
    val df = (0L until 8000L).map(i => (i, i % 7)).toDF("k", "v")
    val manifest = Scale.writeWithManifest(df, dir, "k", numFiles = 8)
    val files = manifest.collect()
    assert(files.length >= 2, "expected multiple sorted runs")
    // Key rectangles are disjoint (sorted runs): total row mass preserved.
    assert(files.map(_.getLong(3)).sum === 8000L)
    val (rows, total, scanned) = Scale.zoneMapScan(manifest, "k", 100L, 400L)
    val got = rows.select("k").as[Long].collect().sorted
    assert(got === (100L to 400L).toArray)
    assert(scanned < total, s"no pruning: $scanned of $total")
    // Out-of-range scan prunes everything and returns no rows.
    val (none, _, s0) = Scale.zoneMapScan(manifest, "k", 100000L, 200000L)
    assert(s0 === 0L && none.count() === 0L)
  }
  import spark.implicits._

  test("bucketed tables join without exchanges on either side") {
    val a = (0 until 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Scale.writeBucketed(a, "bucketed_a", Seq("k"), 4, sortCols = Seq("k"))
    Scale.writeBucketed(b, "bucketed_b", Seq("k"), 4, sortCols = Seq("k"))
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Disable broadcast so the join must co-locate — at fact×fact scale
      // (where bucketing matters) broadcast isn't an option anyway.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      // compatible bucketing: sort-merge join with no shuffle exchange
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("ShuffleExchange"), s"expected shuffle-free join, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("salted aggregation equals direct aggregation") {
    // One hot key (90% of rows) + a long tail.
    val rows = (0 until 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"key${i % 97}"
      (k, i.toDouble, i.toLong)
    }.toDF("k", "x", "y")

    val direct = rows.groupBy("k")
      .agg(sum($"x").as("sum_x"), count(lit(1)).as("cnt"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .orderBy("k").collect()
    val salted = Scale.saltedAggregate(rows, Seq("k"),
      sums = Seq("x"), count = true, mins = Seq("y"), maxs = Seq("y"))
      .orderBy("k").collect()
    assert(salted.length === direct.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) === s.getString(0))
      assert(math.abs(d.getDouble(1) - s.getDouble(1)) < 1e-6)
      assert(d.getLong(2) === s.getLong(2))
      assert(d.getLong(3) === s.getLong(3))
      assert(d.getLong(4) === s.getLong(4))
    }
  }

  test("saltedJoin equals the plain join and spreads the hot key") {
    // One hot key ("hot" × 5000) plus a tail; dim has 2 rows per key.
    val big = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .flatMap(k => Seq((k, s"$k-a"), (k, s"$k-b"))).toDF("key", "attr")
    val plain = big.join(dim, Seq("key")).select("key", "v", "attr")
      .as[(String, Long, String)].collect().sorted.toSeq
    val salted = Scale.saltedJoin(big, dim, Seq("key"), saltFactor = 8)
      .select("key", "v", "attr")
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
    // left_outer keeps unmatched big rows exactly once.
    val bigger = big.unionByName(Seq(("orphan", 0L)).toDF("key", "v"))
    val lo = Scale.saltedJoin(bigger, dim, Seq("key"), saltFactor = 8,
        joinType = "left_outer")
      .where($"key" === "orphan").collect()
    assert(lo.length === 1 && lo.head.isNullAt(2))
    // The hot key really does occupy several salt lanes.
    val lanes = big.withColumn("__salt", (rand(42) * 8).cast("int"))
      .where($"key" === "hot").select("__salt").distinct().count()
    assert(lanes >= 6, s"hot key spread over only $lanes lanes")
    // Replication-unsafe join types are rejected.
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(big, dim, Seq("key"), joinType = "full_outer")
    }
  }

  test("zValue interleaves bits (a even positions, b odd)") {
    // a=5 (101b): bits at z-positions 0,4 -> 17; b=3 (011b): z-positions
    // 1,3 -> 10; z = 27.
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Scale.zValue($"a", $"b", bits = 3)).as[Long].head()
    assert(z === 27L)
    // order independence of the dimensions' magnitudes: max 3-bit input
    val zMax = Seq((7L, 7L)).toDF("a", "b")
      .select(Scale.zValue($"a", $"b", bits = 3)).as[Long].head()
    assert(zMax === 63L)
  }

  test("zorder buckets are bounded rectangles; single-key sort is not") {
    val grid = (for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val stats = Scale.zorderStats(grid, "a", "b", bits = 4, bucketBits = 2)
      .orderBy("bucket").collect()
    // Top 2 z-bits = (b_bit3, a_bit3) -> exact quadrants of the grid.
    assert(stats.length === 4)
    stats.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) === 7L) // max_a - min_a
      assert(r.getLong(5) - r.getLong(4) === 7L) // max_b - min_b
      assert(r.getLong(1) === 64L)
    }
    // Contrast: bucketing the same grid by the top bits of `a` ALONE leaves
    // b spanning its full range in every bucket — the skip-stats failure
    // z-order exists to fix.
    val byA = grid.groupBy(($"a" / 8).cast("long").as("bucket"))
      .agg(min("b").as("min_b"), max("b").as("max_b")).collect()
    byA.foreach(r => assert(r.getLong(2) - r.getLong(1) === 15L))
  }

  test("zorderStats auto-bits: >2^24 keys fit, >=2^30 keys hit the 31-bit ceiling") {
    // Engine rule: smallest k in [8, 30] with max(key) < 2^k, else 31 —
    // the oracle replays coalesce(list_min(list_filter(range(8, 31), ...)),
    // 31), so BOTH branches must agree past the old 2^24 regime.
    def replayBits(mx: Long): Int = (8 to 30).find(k => mx < (1L << k)).getOrElse(31)
    // Keys just past 2^25: auto-bits must pick 26 and produce the same
    // buckets as the explicit bits=26 call.
    val big = Seq((1L << 25, 3L), ((1L << 25) + 9000L, (1L << 20) + 7L), (123L, 1L << 24))
      .toDF("a", "b")
    assert(replayBits((1L << 25) + 9000L) === 26)
    val auto = Scale.zorderStats(big, "a", "b", bucketBits = 6)
      .orderBy("bucket").collect().toSeq
    val fixed = Scale.zorderStats(big, "a", "b", bits = 26, bucketBits = 6)
      .orderBy("bucket").collect().toSeq
    assert(auto === fixed)
    // Keys at/above 2^30: no k in [8, 30] fits — both engine and oracle
    // fall back to 31 bits (zValue's ceiling).
    val huge = Seq(((1L << 30) + 5L, 2L), (7L, (1L << 31) - 1L)).toDF("a", "b")
    assert(replayBits((1L << 31) - 1L) === 31)
    val autoHuge = Scale.zorderStats(huge, "a", "b", bucketBits = 6)
      .orderBy("bucket").collect().toSeq
    val fixedHuge = Scale.zorderStats(huge, "a", "b", bits = 31, bucketBits = 6)
      .orderBy("bucket").collect().toSeq
    assert(autoHuge === fixedHuge)
  }

  test("hilbert index: base quadrant order and full-curve adjacency") {
    import graft.functions.HilbertOps
    // bits = 1: the canonical U: (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3.
    assert(HilbertOps.index(0, 0, 1) === 0L)
    assert(HilbertOps.index(0, 1, 1) === 1L)
    assert(HilbertOps.index(1, 1, 1) === 2L)
    assert(HilbertOps.index(1, 0, 1) === 3L)
    // The defining property at any depth: the curve is a bijection whose
    // CONSECUTIVE indices are grid-adjacent cells (|Δa| + |Δb| = 1) —
    // Morton fails this (diagonal jumps). Verified exhaustively at 3 bits.
    for (bits <- 1 to 3) {
      val n = 1 << bits
      val cells = for (a <- 0 until n; b <- 0 until n)
        yield (HilbertOps.index(a, b, bits), (a, b))
      val byD = cells.sortBy(_._1)
      assert(byD.map(_._1) === (0 until n * n).map(_.toLong))
      byD.sliding(2).foreach { case Seq((_, (a1, b1)), (_, (a2, b2))) =>
        assert(math.abs(a1 - a2) + math.abs(b1 - b2) === 1,
          s"jump at bits=$bits: ($a1,$b1)->($a2,$b2)")
      }
    }
  }

  test("hilbert buckets bound tighter rectangles than morton on a uniform grid") {
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    def area(rows: Array[org.apache.spark.sql.Row]): Long = rows.map { r =>
      (r.getLong(3) - r.getLong(2) + 1) * (r.getLong(5) - r.getLong(4) + 1)
    }.sum
    val hil = Scale.hilbertStats(grid, "a", "b", bits = 6, bucketBits = 4)
      .collect()
    val mor = Scale.zorderStats(grid, "a", "b", bits = 6, bucketBits = 4)
      .collect()
    assert(hil.length === 16 && mor.length === 16)
    assert(hil.forall(_.getLong(1) === 256L))
    // Hilbert's 16 buckets each bound a 16×16 square (area 256); Morton's
    // rectangles are no tighter in total.
    assert(area(hil) <= area(mor))
    assert(hil.forall(r => (r.getLong(3) - r.getLong(2) + 1) *
      (r.getLong(5) - r.getLong(4) + 1) === 256L))
  }

  test("rendezvousShard: stable re-scale — moved fraction ~1/(n+1), not hash-mod's n/(n+1)") {
    val ids = (0L until 2000L).toDF("id")
    val audit = Scale.rendezvousMoveAudit(ids, "id", 8, 9)
    val rows = audit.as[(Long, Int, Int, Int)].collect()
    assert(rows.length === 2000)
    rows.foreach { case (_, a, b, m) =>
      assert(a >= 0 && a < 8 && b >= 0 && b < 9)
      assert(m === (if (a != b) 1 else 0))
    }
    // The HRW stability law: expected moved fraction at 8 → 9 is 1/9
    // (~222 of 2000). Deterministic fixture, generous band.
    val moved = rows.count(_._4 == 1)
    assert(moved > 2000 / 20 && moved < 2000 / 4,
      s"moved $moved of 2000 — outside the ~1/9 HRW band")
    // Contrast: hash-mod re-sharding moves ~8/9 of keys on the same step.
    val modMoved = ids
      .select((xxhash64($"id") % 8 =!= xxhash64($"id") % 9).cast("int").as("m"))
      .agg(sum("m")).as[Long].head()
    assert(modMoved > 2000 / 2, s"hash-mod moved only $modMoved — fixture degenerate")
    // Balance: every shard of the 9 receives a reasonable share.
    val byShard = rows.groupBy(_._3).view.mapValues(_.size)
    assert(byShard.size === 9 && byShard.values.min > 2000 / 9 / 3)
    // Pure function: a second computation is identical.
    val again = Scale.rendezvousMoveAudit(ids, "id", 8, 9)
      .as[(Long, Int, Int, Int)].collect()
    assert(rows.sortBy(_._1) === again.sortBy(_._1))
  }

  test("zorderLayout preserves rows and drops the helper column") {
    val grid = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val laid = Scale.zorderLayout(grid, "a", "b", numPartitions = 4, bits = 5)
    assert(laid.columns.toSeq === Seq("a", "b"))
    assert(laid.count() === 1024L)
    // Physical layout: range partitioner on the z-value.
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning")
      || plan.contains("Exchange rangepartitioning"))
  }
}
