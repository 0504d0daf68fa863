package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class IntervalsStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("pointIntervalJoin matches brute force across bin boundaries") {
    // Intervals chosen to cover the tricky shapes: inside one bin, spanning
    // several bins, zero-length, touching a bin edge exactly, and
    // degenerate (end < start — must match nothing).
    val iv = Seq(
      (1L, 3L, 7L), (2L, 8L, 29L), (3L, 15L, 15L),
      (4L, 9L, 10L), (5L, 20L, 11L)).toDF("iv_id", "s", "e")
    val pts = (0L to 32L).toDF("t")
    val got = Intervals.pointIntervalJoin(pts, "t", iv, "s", "e", binWidth = 10L)
      .select("t", "iv_id").as[(Long, Long)].collect().toSet
    val brute = (for {
      (id, s, e) <- Seq((1L, 3L, 7L), (2L, 8L, 29L), (3L, 15L, 15L), (4L, 9L, 10L))
      t <- 0L to 32L if t >= s && t <= e
    } yield (t, id)).toSet
    assert(got === brute)
    assert(!got.exists(_._2 == 5L))
  }

  test("coverageCounts preserves zero-coverage points") {
    val iv = Seq((1L, 5L, 9L), (2L, 7L, 12L)).toDF("iv_id", "s", "e")
    val pts = Seq(1L, 6L, 8L, 20L).toDF("t")
    val got = Intervals.coverageCounts(pts, "t", iv, "s", "e", binWidth = 4L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 6L -> 1L, 8L -> 2L, 20L -> 0L))
  }

  test("volumeAnomalies integer verdict equals the floating-point z-test") {
    // One key with a clear spike, one uniform key (zero variance — nothing
    // |x−μ| > 2σ since every x equals μ).
    val rows =
      (1 to 5).flatMap(b => Seq.fill(10)(("a", b))) ++ Seq.fill(60)(("a", 6)) ++
      (1 to 4).flatMap(b => Seq.fill(7)(("b", b)))
    val df = rows.toDF("k", "b")
    val got = Stats.volumeAnomalies(df, "k", col("b"), z = 2)
      .select("k", "bucket", "cnt", "is_anomaly")
      .as[(String, Int, Long, Int)].collect()
    val byKey = got.groupBy(_._1)
    for ((_, g) <- byKey) {
      val n = g.length.toDouble
      val mean = g.map(_._3).sum / n
      val varr = g.map(r => (r._3 - mean) * (r._3 - mean)).sum / n
      for ((_, _, cnt, flag) <- g) {
        val expect = math.abs(cnt - mean) > 2 * math.sqrt(varr)
        assert(flag == (if (expect) 1 else 0), s"cnt=$cnt mean=$mean var=$varr")
      }
    }
    assert(got.filter(_._1 == "a").count(_._4 == 1) === 1)
    assert(got.filter(_._1 == "b").forall(_._4 == 0))
  }

  test("quarterPercentiles interpolates quarters exactly; rejects non-quarters") {
    val df = Seq(("x", 1), ("x", 2), ("x", 3), ("x", 10),
      ("y", 4), ("y", 8)).toDF("k", "v")
    val got = Stats.quarterPercentiles(df, "k", "v")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // x: sorted [1,2,3,10], positions 0.75/1.5/2.25 → 1.75, 2.5, 4.75.
    assert(got("x") === ((1.75, 2.5, 4.75)))
    assert(got("y") === ((5.0, 6.0, 7.0)))
    intercept[IllegalArgumentException] {
      Stats.quarterPercentiles(df, "k", "v", Seq(0.9))
    }
  }

  test("quartilesAudited: exact quartiles ship, GK audit bit holds") {
    val df = (0 until 1000).map(i => ("x", (i * 37) % 991)) ++
      (0 until 200).map(i => ("y", i / 3))
    val got = Stats.quartilesAudited(df.toDF("k", "v"), "k", "v")
      .as[(String, Double, Double, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    // The exact columns match quarterPercentiles exactly.
    val exact = Stats.quarterPercentiles(df.toDF("k", "v"), "k", "v")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (k <- Seq("x", "y")) {
      assert((got(k)._2, got(k)._3, got(k)._4) ===
        ((exact(k)._2, exact(k)._3, exact(k)._4)))
      assert(got(k)._5 === 1, s"GK rank guarantee must hold for $k")
    }
  }

  test("quartilesAudited: tie-heavy groups pass via the rank interval") {
    // 1000 copies of 0 and 10 copies of 1: the median estimate is 0, whose
    // max rank (count <= 0) is 1000 >> 0.5*n + eps*n. Only the rank
    // INTERVAL [count(<0), count(<=0)] = [0, 1000] makes est_ok hold —
    // the pre-fix max-rank check flipped this to 0.
    val ties = (0 until 1000).map(_ => ("t", 0)) ++
      (0 until 10).map(_ => ("t", 1))
    val got = Stats.quartilesAudited(ties.toDF("k", "v"), "k", "v")
      .as[(String, Double, Double, Double, Int)].collect()
    assert(got.length === 1)
    assert((got(0)._2, got(0)._3, got(0)._4) === ((0.0, 0.0, 0.0)))
    assert(got(0)._5 === 1, "tied mass straddling the quantile must not flip est_ok")
  }

  test("pointIntervalJoin equals brute force on random inputs (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      nIv <- Gen.choose(0, 40)
      iv <- Gen.listOfN(nIv, for {
        s <- Gen.choose(-50L, 150L)
        len <- Gen.choose(-5L, 60L) // negative → degenerate, must match nothing
      } yield (s, s + len))
      pts <- Gen.listOfN(30, Gen.choose(-60L, 200L))
      bw <- Gen.oneOf(1L, 3L, 7L, 16L, 64L)
    } yield (iv, pts, bw)
    for (i <- 0 until 8) {
      val (iv, pts, bw) = gen(Gen.Parameters.default, Seed(42L + i)).get
      val ivDf = iv.zipWithIndex.map { case ((s, e), id) => (id.toLong, s, e) }
        .toDF("iv_id", "s", "e")
      val ptDf = pts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("pt_id", "t")
      val got = Intervals.pointIntervalJoin(ptDf, "t", ivDf, "s", "e", bw)
        .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
      val brute = (for {
        ((s, e), ivId) <- iv.zipWithIndex
        (t, ptId) <- pts.zipWithIndex
        if t >= s && t <= e
      } yield (ptId.toLong, ivId.toLong)).toSet
      assert(got === brute, s"seed=${42 + i} bw=$bw")
    }
  }

  test("scale guards: no nested-loop join in interval join, broadcast moments") {
    // Bin fragmentation must plan an EQUI join — a cartesian/nested-loop
    // node means the rewrite regressed to the O(n·m) shape it exists to
    // avoid. (With a broadcast-sized side Spark may legitimately pick
    // BroadcastHashJoin; only the nested-loop/cartesian families are
    // forbidden.)
    val iv = (0L until 200L).map(i => (i, i * 3, i * 3 + 10)).toDF("iv_id", "s", "e")
    val pts = (0L until 300L).toDF("t")
    val joinPlan = Intervals.pointIntervalJoin(pts, "t", iv, "s", "e", 8L)
      .queryExecution.executedPlan.toString
    assert(!joinPlan.contains("BroadcastNestedLoopJoin") &&
      !joinPlan.contains("CartesianProduct"), joinPlan)
    // volumeAnomalies must broadcast the tiny per-key moments table and
    // plan no window (a low-cardinality key would collapse a window).
    val ev = (0L until 1000L).map(i => (s"k${i % 3}", i % 50)).toDF("k", "b")
    val anomPlan = Stats.volumeAnomalies(ev, "k", col("b"))
      .queryExecution.executedPlan.toString
    assert(anomPlan.contains("BroadcastHashJoin"), anomPlan)
    assert(!anomPlan.contains("Window"), anomPlan)
    // The extreme-cardinality fallback (no broadcast hint) must produce the
    // identical result set.
    val hinted = Stats.volumeAnomalies(ev, "k", col("b"))
      .as[(String, Long, Long, Int)].collect().toSet
    val unhinted = Stats.volumeAnomalies(ev, "k", col("b"), broadcastMoments = false)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(hinted === unhinted)
  }

  test("abTest: z statistic matches the textbook two-proportion formula") {
    // control: 100 units, 20 convert; treatment: 100 units, 35 convert.
    val units = ((1 to 100).map(i => (0, i <= 20)) ++
      (1 to 100).map(i => (1, i <= 35))).toDF("variant", "converted")
    val got = Stats.abTest(units, "variant", "converted")
      .as[(Long, Long, Long, Long, Double, Double, Double, Int)]
      .collect().head
    assert((got._1, got._2, got._3, got._4) === ((100L, 20L, 100L, 35L)))
    val pp = 55.0 / 200
    val se = math.sqrt(pp * (1 - pp) * (1.0 / 100 + 1.0 / 100))
    assert(got._7 === (0.35 - 0.20) / se)
    assert(got._8 === 1, s"z=${got._7} must be significant")
    // Identical rates → z = 0, not significant.
    val same = ((1 to 50).map(i => (0, i <= 10)) ++
      (1 to 50).map(i => (1, i <= 10))).toDF("variant", "converted")
    val g2 = Stats.abTest(same, "variant", "converted")
      .as[(Long, Long, Long, Long, Double, Double, Double, Int)]
      .collect().head
    assert(g2._7 === 0.0 && g2._8 === 0)
  }

  test("poissonBootstrap: one-pass replicates behave like bootstrap resamples") {
    // 400 rows, constant value 10: every replicate's mean is EXACTLY 10
    // (weights scale numerator and denominator together) while n_eff
    // fluctuates around 400 like a Poisson(400) draw.
    val const = (1L to 400L).map(i => (i, 10L)).toDF("id", "v")
    val c = Stats.poissonBootstrap(const, "id", "v", replicates = 16)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(c.length === 16)
    assert(c.forall(_._4 === 10.0))
    val effs = c.map(_._2)
    assert(effs.min > 300L && effs.max < 500L, effs.toString)
    assert(effs.distinct.length > 1, "replicates must differ")
    // Mixed values: replicate means scatter AROUND the true mean with
    // bootstrap-scale spread (sd of mean ≈ sd/√n ≈ 0.25 here).
    val mixed = (1L to 400L).map(i => (i, (i % 11).toLong)).toDF("id", "v")
    val trueMean = (1L to 400L).map(_ % 11).sum.toDouble / 400
    val ms = Stats.poissonBootstrap(mixed, "id", "v", replicates = 16)
      .as[(Long, Long, Long, Double)].collect().map(_._4)
    assert(math.abs(ms.sum / ms.length - trueMean) < 0.5, ms.mkString(","))
    assert(ms.forall(m => math.abs(m - trueMean) < 1.5))
    // Pure function of (id, replicate, salt): repartition-invariant.
    val again = Stats.poissonBootstrap(mixed.repartition(7), "id", "v",
      replicates = 16).as[(Long, Long, Long, Double)].collect().map(_._4)
    assert(again.toSeq === ms.toSeq)
  }

  test("pavCalibrate: textbook pooling, monotone output, already-monotone untouched") {
    // Bins (n, sum): 0:(4,0), 1:(4,3), 2:(4,1), 3:(4,4) — the 1→2
    // violation (0.75 > 0.25) pools into (8,4)=0.5; still ≥ bin 0's 0 and
    // ≤ bin 3's 1, so blocks are [0][1,2][3].
    val rows =
      Seq.fill(4)((0L, 0)) ++ Seq((1L, 1), (1L, 1), (1L, 1), (1L, 0)) ++
      Seq((2L, 1), (2L, 0), (2L, 0), (2L, 0)) ++ Seq.fill(4)((3L, 1))
    val got = Stats.pavCalibrate(rows.toDF("bin", "y"), "bin", "y")
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 4L, 0L, 0L, 0L),
      (1L, 4L, 3L, 750000L, 500000L),
      (2L, 4L, 1L, 250000L, 500000L),
      (3L, 4L, 4L, 1000000L, 1000000L)))
    // cal_ppm is monotone non-decreasing by construction.
    assert(got.map(_._5) === got.map(_._5).sorted)
    // An already-monotone profile calibrates to itself.
    val mono = Seq((0L, 0), (0L, 0), (1L, 0), (1L, 1), (2L, 1), (2L, 1))
    val m = Stats.pavCalibrate(mono.toDF("bin", "y"), "bin", "y")
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(m.forall(r => r._4 === r._5))
    // Cascading: means 1.0, 0.0, 0.0 pool ALL THREE into one block.
    val casc = Seq((0L, 1), (1L, 0), (2L, 0))
    val c = Stats.pavCalibrate(casc.toDF("bin", "y"), "bin", "y")
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(c.map(_._5) === Seq(333333L, 333333L, 333333L))
  }

  test("f1Threshold: textbook confusion counts, argmax election, tie to lowest") {
    // Bins (n, pos): 0:(4,0), 1:(4,2), 2:(4,4). Thresholds keep bin ≥ t:
    //  t=2: tp=4 fp=0 fn=2 → P=1, R=2/3, F1=0.8
    //  t=1: tp=6 fp=2 fn=0 → P=.75, R=1, F1=6/7≈0.857 ← best
    //  t=0: tp=6 fp=6 fn=0 → F1 = 12/18 = 2/3
    val rows = Seq.fill(4)((0L, 0)) ++
      Seq((1L, 1), (1L, 1), (1L, 0), (1L, 0)) ++ Seq.fill(4)((2L, 1))
    val got = Stats.f1Threshold(rows.toDF("bin", "y"), "bin", "y")
      .orderBy("threshold")
      .as[(Long, Long, Long, Long, Long, Long, Long, Int)].collect().toSeq
    assert(got === Seq(
      (0L, 6L, 6L, 0L, 500000L, 1000000L, 666666L, 0),
      (1L, 6L, 2L, 0L, 750000L, 1000000L, 857142L, 1),
      (2L, 4L, 0L, 2L, 1000000L, 666666L, 800000L, 0)))
    // A ppm tie elects the LOWEST threshold: two identical bins.
    val tie = Seq((0L, 1), (0L, 0), (1L, 1), (1L, 0))
    val t = Stats.f1Threshold(tie.toDF("bin", "y"), "bin", "y")
      .where(col("is_best") === 1).select("threshold")
      .as[Long].collect().toSeq
    assert(t === Seq(0L)) // t=0: tp=2 fp=2 fn=0 F1=2/3; t=1: tp=1 fp=1 fn=1 F1=1/2
  }

  test("hillTailIndex: hand-computed ln terms, uniform floor, Zipf sensitivity") {
    // Keys with counts 8, 4, 2, 1 (and k = 2): top-3 = (8, 4, 2), tail = 2.
    // terms: round(1e6·ln 4) + round(1e6·ln 2) = 1386294 + 693147.
    val rows = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++
      Seq("d")
    val got = Stats.hillTailIndex(rows.toDF("k"), "k", k = 2)
      .as[(Int, Long, Long, Long, Long)].head()
    val expSum = math.round(1e6 * math.log(4.0)) + math.round(1e6 * math.log(2.0))
    assert(got === ((2, 4L, 2L, expSum, expSum / 2)))
    // A uniform distribution has zero tail index sum (all ratios 1).
    val unif = (1 to 30).flatMap(i => Seq.fill(3)(s"k$i"))
    val u = Stats.hillTailIndex(unif.toDF("k"), "k", k = 10)
      .select("hill_sum_scaled").as[Long].head()
    assert(u === 0L)
    // Steeper head → larger estimate than the flat case.
    val zipf = (1 to 30).flatMap(i => Seq.fill(300 / i)(s"k$i"))
    val z = Stats.hillTailIndex(zipf.toDF("k"), "k", k = 10)
      .select("alpha_inv_scaled").as[Long].head()
    assert(z > 0L)
  }

  test("skewProfile: exact Gini from counts-of-counts, uniform and skewed") {
    // Keys a,b → 1 row each; c → 2; d → 4. Sorted x = [1,1,2,4]:
    // S = 1+2+6+16 = 25, T = 8, n = 4 → G = (50−40)/32 = 0.3125.
    val rows = Seq("a", "b", "c", "c", "d", "d", "d", "d").map(Tuple1(_))
      .toDF("k")
    val got = Stats.skewProfile(rows, "k")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((8L, 4L, 4L, 312500L)))
    // Perfectly uniform → Gini 0; invariant under partitioning.
    val uni = (0 until 30).map(i => Tuple1(s"k${i % 5}")).toDF("k")
    assert(Stats.skewProfile(uni, "k")
      .as[(Long, Long, Long, Long)].collect().head === ((30L, 5L, 6L, 0L)))
    assert(Stats.skewProfile(rows.repartition(7), "k")
      .as[(Long, Long, Long, Long)].collect().head === got)
  }

  test("assignToCentroids: nearest by cosine, ties to lowest cell, nulls skipped") {
    val centers = Seq(
      0 -> Array(1f, 0f, 0f),
      1 -> Array(0f, 1f, 0f),
      2 -> Array(1f, 0f, 0f)) // duplicate of cell 0 — ties must pick 0
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f, 0f)),
      (11L, Seq(0.1f, 0.9f, 0f)),
      (12L, Seq(1f, 0f, 0f)),
      (13L, null.asInstanceOf[Seq[Float]])).toDF("id", "vec")
    val got = Similarity.assignToCentroids(corpus, "id", "vec", centers)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(10L -> 0, 11L -> 1, 12L -> 0))
  }

  test("trendSlopes: exact ppm slope, truncation toward zero, null on one bucket") {
    // "up": y = 2x + 3 over buckets 10..14 — slope exactly 2 (2_000_000 ppm),
    //   total = 23+25+27+29+31 = 135.
    // "down": y = (13, 12, 12) over consecutive buckets — num = 3·36 − 3·37
    //   = −3, den = 6 → slope −1/2 → −500_000 ppm (sign-factored truncation).
    // "frac": y = (1, 2, 4) → num = 3·10 − 3·7 = 9, den = 6 → 3/2 →
    //   1_500_000 ppm; and with y = (2, 2, 3): num = 3·8 − 3·7 = 3, den = 6
    //   → 1/2 truncated at 500_000 exactly — use (1, 1, 2): num = 3·5 −
    //   3·4 = 3, den = 6 → 500_000 ppm.
    // "solo": single bucket → den = 0 → null slope.
    val rows =
      (10 to 14).flatMap(x => Seq.fill(2 * x + 3)(("up", x.toLong))) ++
      Seq(13, 12, 12).zipWithIndex.flatMap { case (y, x) =>
        Seq.fill(y)(("down", 100L + x)) } ++
      Seq(1, 1, 2).zipWithIndex.flatMap { case (y, x) =>
        Seq.fill(y)(("frac", 1000L + x)) } ++
      Seq.fill(9)(("solo", 7L))
    val df = rows.toDF("k", "b")
    val got = Stats.trendSlopes(df, "k", col("b"))
      .select("k", "n_buckets", "total", "slope_ppm")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)))))
      .toMap
    assert(got("up") === ((5L, 135L, java.lang.Long.valueOf(2000000L))))
    assert(got("down") === ((3L, 37L, java.lang.Long.valueOf(-500000L))))
    assert(got("frac") === ((3L, 4L, java.lang.Long.valueOf(500000L))))
    assert(got("solo") === ((1L, 9L, null)))
  }

  test("paretoFront matches brute-force dominance; duplicate points both kept") {
    // Points engineered for every edge: interior dominated points, a
    // duplicated frontier point (both must survive), same-x dominated-by-y,
    // same-y dominated-by-x, and a single max corner.
    val pts = Seq(
      (1L, 1L, 9L), (2L, 1L, 9L),          // duplicate frontier point
      (3L, 1L, 5L),                        // same x, lower y → dominated
      (4L, 3L, 7L), (5L, 5L, 7L),          // same y: x=3 dominated by x=5
      (6L, 5L, 3L),                        // same x=5, lower y → dominated
      (7L, 8L, 2L), (8L, 2L, 8L),
      (9L, 4L, 4L)                         // interior
    ).toDF("id", "x", "y")
    val got = Stats.paretoFront(pts, "id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    val all = Seq((1L, 1L, 9L), (2L, 1L, 9L), (3L, 1L, 5L), (4L, 3L, 7L),
      (5L, 5L, 7L), (6L, 5L, 3L), (7L, 8L, 2L), (8L, 2L, 8L), (9L, 4L, 4L))
    val brute = all.filter { case (_, px, py) =>
      !all.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py) }
    }.toSet
    assert(got === brute)
    assert(got.map(_._1) === Set(1L, 2L, 5L, 7L, 8L))
  }

  test("chiSquareTerms: hand 2x2 tables, degenerate margin, minDf prune") {
    import org.apache.spark.sql.functions.{col => c}
    // 6 docs, 3 labeled (ids 0-2). "sep" appears in exactly the 3 labeled
    // docs: a=3 b=0 c=0 d=3 → χ² = 6·(9)²/(3·3·3·3) = 6 → 6_000_000 ppm.
    // "univ" appears everywhere: a=3 b=3 c=0 d=0 → margin (c+d)=0 → 0.
    // "half" in one labeled + one rest doc: a=1 b=1 c=2 d=2 →
    //   χ² = 6·(2−2)²/… = 0.
    // "rare" appears in 1 doc — pruned by minDf=2.
    val docs = Seq(
      (0L, "sep univ half"), (1L, "sep univ"), (2L, "sep univ rare"),
      (3L, "univ half"), (4L, "univ"), (5L, "univ")).toDF("doc_id", "text")
    val got = TextAnalysis.chiSquareTerms(docs, "doc_id", "text",
        c("doc_id") < 3, minDf = 2, topK = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === Set("sep", "univ", "half"))
    val m = got.map(r => r._1 -> r).toMap
    assert(m("sep") === (("sep", 3L, 3L, 6000000L)))
    assert(m("univ") === (("univ", 6L, 3L, 0L)))
    assert(m("half") === (("half", 2L, 1L, 0L)))
    // ordering: chi2 desc then term asc
    assert(got.head._1 === "sep")
    assert(got.drop(1).map(_._1).toSeq === Seq("half", "univ"))
  }

  test("burstiness: hand VMR with zeros, constant term floors at 0, minDf") {
    // N = 4. "x": c = (3, 1, 0, 0) → Σc = 4, Σc² = 10 →
    //   VMR = (4·10 − 16)/(4·4) = 1.5 → 1_500_000 ppm.
    // "y": once per doc → variance 0 → 0 ppm. "z": df = 1 → pruned.
    val docs = Seq(
      (0L, "x x x y z"), (1L, "x y"), (2L, "y"), (3L, "y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.burstiness(docs, "doc_id", "text",
        minDf = 2, topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("x", 2L, 4L, 1500000L), ("y", 4L, 4L, 0L)))
  }

  test("clusteringAgreement: hand contingency, perfect and inverted cases") {
    // cm (0,a)=2 (0,b)=1 (1,b)=2 → purity 4/5; I/H terms hand-integerized
    // (python-checked): inum 1455517, hc = hl = 3365060 → nmi 432538.
    val df = Seq((0L,"a"),(0L,"a"),(0L,"b"),(1L,"b"),(1L,"b")).toDF("c","l")
    assert(Stats.clusteringAgreement(df, col("c"), col("l"))
      .as[(Long, Long, Long)].head() === ((5L, 800000L, 432538L)))
    // Perfect agreement: NMI = 1 exactly (inum = hc = hl).
    val perf = Seq((0L,"a"),(0L,"a"),(1L,"b")).toDF("c","l")
    assert(Stats.clusteringAgreement(perf, col("c"), col("l"))
      .as[(Long, Long, Long)].head() === ((3L, 1000000L, 1000000L)))
    // Single cluster, single label: H sums are 0 → NMI 0 by convention.
    val const = Seq((0L,"a"),(0L,"a")).toDF("c","l")
    assert(Stats.clusteringAgreement(const, col("c"), col("l"))
      .as[(Long, Long, Long)].head() === ((2L, 1000000L, 0L)))
  }

  test("calibrationReport: hand ECE and Murphy components, 2 bins") {
    // bin0: n=2 p=1 (acc .5, conf .25); bin1: n=2 p=2 (acc 1, conf .75);
    // ȳ = .75 → ece .25, rel .0625, res .0625, unc .1875 — all exact ppm.
    val df = Seq((0L, 0), (0L, 1), (1L, 1), (1L, 1)).toDF("b", "y")
    val got = Stats.calibrationReport(df, col("b"), col("y") === 1,
        nBins = 2)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((4L, 3L, 250000L, 62500L, 62500L, 187500L)))
  }

  test("decayedFreshness: exact shift staircase, cap, per-key means") {
    // max day 14, half-life 7: ages 0/7/14 → weights 1e6/5e5/25e4.
    val df = Seq(("a", 14L), ("a", 7L), ("a", 0L), ("b", 14L))
      .toDF("k", "day")
    val got = Stats.decayedFreshness(df, "k", col("day"), halfLifeDays = 7)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 3L, 1750000L, 583333L), ("b", 1L, 1000000L, 1000000L)))
    // Shift cap: age 1000·7 days floors at >> 62 → weight 0, not UB.
    val old = Seq(("c", 7000L), ("c", 0L)).toDF("k", "day")
    val g2 = Stats.decayedFreshness(old, "k", col("day"), halfLifeDays = 7)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(g2 === Seq(("c", 2L, 1000000L, 500000L)))
  }

  test("aucBinned: hand rank-sum with tie halves, degenerate class") {
    // bins/labels: (0,0) (0,1) (1,1) (2,0) (2,1) — pairwise: 3 of 6
    // (1 + 1 wins, 2 ties at ½) → AUC .5 exactly.
    val df = Seq((0L, 0), (0L, 1), (1L, 1), (2L, 0), (2L, 1)).toDF("b", "y")
    assert(Stats.aucBinned(df, col("b"), col("y") === 1)
      .as[(Long, Long, Long)].head() === ((3L, 2L, 500000L)))
    // Perfect separation: all negatives below all positives → 1.0.
    val sep = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1)).toDF("b", "y")
    assert(Stats.aucBinned(sep, col("b"), col("y") === 1)
      .as[(Long, Long, Long)].head() === ((2L, 2L, 1000000L)))
    // Single-class input: auc 0 by convention, counts expose why.
    val one = Seq((0L, 1), (5L, 1)).toDF("b", "y")
    assert(Stats.aucBinned(one, col("b"), col("y") === 1)
      .as[(Long, Long, Long)].head() === ((2L, 0L, 0L)))
  }

  test("ksTest: hand ECDF gap, cross-mult exactness, reject bit") {
    // A = {1, 2}, B = {2, 3, 4}: gaps at v = 1..4 are |3−0|, |6−2|, |6−4|,
    // |6−6| → D_num = 4 of Na·Nb = 6 → ks_ppm 666666; far under the
    // α = .05 bar at these sizes → reject 0.
    val df = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 0), (4L, 0)).toDF("v", "a")
    val got = Stats.ksTest(df, col("v"), col("a") === 1)
      .as[(Long, Long, Long, Long, Int)].head()
    assert(got === ((2L, 3L, 4L, 666666L, 0)))
    // Disjoint supports: D = 1 exactly, tiny n still fails the α bar?
    // D² = 1, threshold 1.844·(4/4) = 1.844 → not rejected (n too small).
    val dj = Seq((1L, 1), (2L, 1), (5L, 0), (6L, 0)).toDF("v", "a")
    val g2 = Stats.ksTest(dj, col("v"), col("a") === 1)
      .as[(Long, Long, Long, Long, Int)].head()
    assert(g2 === ((2L, 2L, 4L, 1000000L, 0)))
  }

  test("ksTest/aucBinned: distinct-count knee — exact below, bounded above") {
    // 40 distinct values; below the knee the statistic is bit-identical
    // whatever maxHistBins is set to (as long as it's >= the distinct
    // count) — the exact regime is not a different code path, it's the
    // same histogram.
    val rows = (1 to 40).flatMap(v => Seq((v.toLong, 1), (v.toLong + 5L, 0)))
    val df = rows.toDF("v", "a")
    val exact = Stats.ksTest(df, col("v"), col("a") === 1)
      .as[(Long, Long, Long, Long, Int)].head()
    val sameKnee = Stats.ksTest(df, col("v"), col("a") === 1, maxHistBins = 64)
      .as[(Long, Long, Long, Long, Int)].head()
    assert(exact === sameKnee)
    // Above the knee (45 distinct > 8 bins): runs bounded, keeps the
    // totals, and the coarsened D is a LOWER bound on the exact D —
    // interior gaps are unseen, never invented.
    val coarse = Stats.ksTest(df, col("v"), col("a") === 1, maxHistBins = 8)
      .as[(Long, Long, Long, Long, Int)].head()
    assert(coarse._1 === exact._1 && coarse._2 === exact._2)
    assert(coarse._4 <= exact._4)
    // aucBinned: same law. Exact regime identical under a generous knee;
    // coarsened regime merges adjacent bins (ties), still in [0, 1e6].
    val sc = (1 to 40).map(v => (v.toLong, if (v > 20) 1 else 0)).toDF("b", "y")
    val aucExact = Stats.aucBinned(sc, col("b"), col("y") === 1)
      .as[(Long, Long, Long)].head()
    val aucKnee = Stats.aucBinned(sc, col("b"), col("y") === 1, maxHistBins = 64)
      .as[(Long, Long, Long)].head()
    assert(aucExact === aucKnee)
    val aucCoarse = Stats.aucBinned(sc, col("b"), col("y") === 1, maxHistBins = 4)
      .as[(Long, Long, Long)].head()
    assert(aucCoarse._1 === aucExact._1 && aucCoarse._2 === aucExact._2)
    assert(aucCoarse._3 >= 0L && aucCoarse._3 <= 1000000L)
    assert(aucExact._3 === 1000000L) // separable: exact regime is perfect
  }

  test("ksTest: knee width survives a span wider than the long range; " +
      "knownBinsAtMostMax skips the deciding agg bit-identically") {
    // Long.MinValue sentinel mixed with epoch-millis: hi − lo overflows
    // int64, so the pre-fix equal-width knee derived a NEGATIVE width and
    // scattered bucket ids. Now the width computes in BigInt and the
    // shift runs in DECIMAL — the coarsened run must produce sane totals
    // and a [0, 1e6] statistic.
    val wide = (Seq((Long.MinValue, 1)) ++
      (1 to 500).map(k => (k * 1000000L + 1700000000000L, if (k <= 250) 1 else 0)))
      .toDF("v", "a")
    val got = Stats.ksTest(wide, col("v"), col("a") === 1, maxHistBins = 64)
      .as[(Long, Long, Long, Long, Int)].head()
    assert(got._1 === 251L && got._2 === 250L)
    assert(got._4 >= 0L && got._4 <= 1000000L)
    // The escape hatch: for a column the caller KNOWS is bounded, the
    // result is the exact regime's, with no deciding aggregation run.
    val bounded = (1 to 40).flatMap(v => Seq((v.toLong, 1), (v.toLong + 5L, 0)))
      .toDF("v", "a")
    val exact = Stats.ksTest(bounded, col("v"), col("a") === 1)
      .as[(Long, Long, Long, Long, Int)].head()
    val hatch = Stats.ksTest(bounded, col("v"), col("a") === 1,
      knownBinsAtMostMax = true).as[(Long, Long, Long, Long, Int)].head()
    assert(hatch === exact)
    val aucExact = Stats.aucBinned(bounded, col("v"), col("a") === 1)
      .as[(Long, Long, Long)].head()
    val aucHatch = Stats.aucBinned(bounded, col("v"), col("a") === 1,
      knownBinsAtMostMax = true).as[(Long, Long, Long)].head()
    assert(aucHatch === aucExact)
  }

  test("pearsonCorr: bounded by 1e6 and exactly invariant under positive " +
      "affine maps (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(50, for {
      x <- Gen.choose(-100L, 100L); y <- Gen.choose(-100L, 100L)
    } yield (x, y))
    for (i <- 0 until 3) {
      val rows = gen(Gen.Parameters.default, Seed(31L + i)).get
        .map { case (x, y) => ("k", x, y) }
      val df = rows.toDF("k", "x", "y")
      val base = Stats.pearsonCorr(df, "k", col("x"), col("y"))
        .as[(String, Long, Long)].head()
      assert(math.abs(base._3) <= 1000000L, s"|r2_ppm| must be <= 1e6: $base")
      // x → 3x + 7: cov and var scale by the same a², and floor(a²A/a²B)
      // = floor(A/B), so the reported integer is IDENTICAL, not merely
      // close.
      val aff = Stats.pearsonCorr(df, "k", col("x") * 3 + 7, col("y"))
        .as[(String, Long, Long)].head()
      assert(aff._3 === base._3, s"affine invariance: $aff vs $base")
      // y → −y flips only the sign.
      val neg = Stats.pearsonCorr(df, "k", col("x"), -col("y"))
        .as[(String, Long, Long)].head()
      assert(neg._3 === -base._3, s"sign flip: $neg vs $base")
    }
  }

  test("crosstabChi2: perfect association scores exactly 1e6·N·(k−1)") {
    // a == b bijective with equal cell counts: χ² = N·(k−1) exactly, and
    // every per-cell floor is exact for these margins.
    val df = Seq("p", "q").flatMap(v => Seq.fill(3)((v, v))).toDF("a", "b")
    val got = Stats.crosstabChi2(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((6L, 2L, 2L, 1L, 6000000L)))
  }

  test("crosstabChi2: hand 2x2, empty-cell accounting, single-category dof 0") {
    // counts (x,p)=2 (x,q)=1 (y,p)=1 (y,q)=2; N=6, all margins 3 →
    // per cell (O·N − R·C)²·1e6 DIV (N·R·C) = 9e6 DIV 54 = 166666 ×4.
    val df = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"),
      ("y", "q")).toDF("a", "b")
    val got = Stats.crosstabChi2(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((6L, 2L, 2L, 1L, 666664L)))
    // an EMPTY cell must contribute its full expectation: (x,q) absent.
    // counts (x,p)=2 (y,p)=1 (y,q)=1; N=4, Rx=2 Ry=2 Cp=3 Cq=1.
    //  (x,p): (8−6)²e6/24 = 166666   (x,q): (0−2)²e6/8 = 500000
    //  (y,p): (4−6)²e6/24 = 166666   (y,q): (4−2)²e6/8 = 500000  Σ=1333332
    val sparse = Seq(("x", "p"), ("x", "p"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val g2 = Stats.crosstabChi2(sparse, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(g2 === ((4L, 2L, 2L, 1L, 1333332L)))
    // one-column table: dof 0, chi2 0 (margins equal cells exactly).
    val one = Seq(("x", "p"), ("y", "p")).toDF("a", "b")
    val g3 = Stats.crosstabChi2(one, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(g3 === ((2L, 2L, 1L, 0L, 0L)))
  }

  test("pearsonCorr: hand moments, perfect/anti/degenerate, ties") {
    // key a: x=(1,2,3), y=(1,2,4) → cov_n=9, varx_n=6, vary_n=14 →
    //   r2_ppm = (81e6 DIV 6) DIV 14 = 964285 (true r² = .9643).
    // key b: y = −2x exactly → signed −1e6. key c: constant y → 0.
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 4L),
      ("b", 1L, -2L), ("b", 2L, -4L), ("b", 3L, -6L),
      ("c", 1L, 7L), ("c", 2L, 7L)).toDF("k", "x", "y")
    val got = Stats.pearsonCorr(df, "k", col("x"), col("y"))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 3L, 964285L), ("b", 3L, -1000000L), ("c", 2L, 0L)))
    // timestamp-magnitude inputs: moments must survive in DECIMAL —
    // an int64 partial sum of x² wraps at (1e12)².
    val big = Seq(("t", 1700000000000L, 1L), ("t", 1700000003600L, 2L),
      ("t", 1700000007200L, 3L)).toDF("k", "x", "y")
    val r = Stats.pearsonCorr(big, "k", col("x"), col("y"))
      .as[(String, Long, Long)].head()
    assert(r === (("t", 3L, 1000000L))) // exactly linear
  }

  test("trimmedMean: overlap-exact tail drops, straddling classes, k = 0") {
    // "a": [1, 2, 2, 3, 100] at 20% trim → k = 1, drop one 1 and one 100,
    // mid = [2, 2, 3] → 7e6 // 3. "b": single value, k = 0 → plain mean.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("a", 100L),
      ("b", 5L)).toDF("k", "v")
    val got = Stats.trimmedMean(df, "k", col("v"), trimPpm = 200000L)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq(
      ("a", 5L, 1L, Some(2333333L)), ("b", 1L, 0L, Some(5000000L))))
    // Tie mass straddling the cut: [2, 2, 2, 9] at 25% → k = 1 drops ONE
    // 2 from the bottom and the 9 from the top → mid [2, 2] → 2e6.
    val tie = Seq(("t", 2L), ("t", 2L), ("t", 2L), ("t", 9L)).toDF("k", "v")
    val g2 = Stats.trimmedMean(tie, "k", col("v"), trimPpm = 250000L)
      .as[(String, Long, Long, Option[Long])].head()
    assert(g2 === (("t", 4L, 1L, Some(2000000L))))
  }

  test("rakeKeyphrases: textbook degree/frequency scoring, phrase runs") {
    // "deep learning of deep models and learning", stops {of, and}:
    // phrases [deep learning], [deep models], [learning];
    // deep: freq 2 deg 4 → 2e6; learning: freq 2 deg 3 → 1.5e6;
    // models: freq 1 deg 2 → 2e6. Scores: deep models 4e6,
    // deep learning 3.5e6, learning 1.5e6.
    val docs = Seq((1L, "deep learning of deep models and learning"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(docs, "doc_id", "text",
        Seq("of", "and"), maxPhraseLen = 4, topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("deep models", 2L, 1L, 4000000L),
      ("deep learning", 2L, 1L, 3500000L),
      ("learning", 1L, 1L, 1500000L)))
  }

  test("luhnValid/cardScan: known checksums, regex gate, candidate counts") {
    // 4532015112830366 is a valid test Visa; +1 on the check digit fails;
    // 1234567890123 (13 digits) passes the regex but fails Luhn;
    // 123 is too short for the candidate gate entirely.
    val df = Seq(
      (1L, "pay 4532015112830366 now 1234567890123 or 123"),
      (2L, "bad 4532015112830367 only"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.cardScan(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_candidates"), col("s.n_valid"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, 2L, 1L), (2L, 1L, 0L)))
  }

  test("vocabCoverage: within-class interpolation, ceil thresholds, edges") {
    // counts a=4 b=2 c=1 (total 7, vocab 3); histogram classes 4, 2, 1.
    // 50%: T = ceil(3.5) = 4 → one type of the c=4 class (covered 4).
    // 857142 ppm: T = 6 → finish the c=2 class (vocab 2, covered 6,
    //   covered_ppm lands exactly back on 857142).
    // 100%: T = 7 → the whole vocabulary.
    val docs = Seq((0L, "a a a a b b c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "text",
        targetsPpm = Seq(500000L, 857142L, 1000000L))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (500000L, 7L, 3L, 1L, 4L, 571428L),
      (857142L, 7L, 3L, 2L, 6L, 857142L),
      (1000000L, 7L, 3L, 3L, 7L, 1000000L)))
  }

  test("cohenKappa: textbook 2x2, perfect-disagreement negative, constant") {
    // cm: (x,x)=4 (x,y)=2 (y,y)=3 (y,x)=1 → N=10 A=7, P = 6·5+4·5 = 50 →
    // po = .7, pe = .5, κ = (70−50)/(100−50) = .4.
    val d = Seq(
      ("x","x"),("x","x"),("x","x"),("x","x"),("x","y"),("x","y"),
      ("y","y"),("y","y"),("y","y"),("y","x")).toDF("a", "b")
    assert(Stats.cohenKappa(d, "a", "b")
      .as[(Long, Long, Long, Long, Long)].head() ===
      ((10L, 7L, 700000L, 500000L, 400000L)))
    // Perfect disagreement on a symmetric marginal: κ = −1.
    val neg = Seq(("x","y"),("y","x")).toDF("a", "b")
    assert(Stats.cohenKappa(neg, "a", "b")
      .as[(Long, Long, Long, Long, Long)].head() ===
      ((2L, 0L, 0L, 500000L, -1000000L)))
    // Both raters constant: N² = P → κ = 0 by convention.
    val const = Seq(("x","x"),("x","x")).toDF("a", "b")
    assert(Stats.cohenKappa(const, "a", "b")
      .as[(Long, Long, Long, Long, Long)].head() ===
      ((2L, 2L, 1000000L, 1000000L, 0L)))
  }

  test("krippendorffAlpha: hand coincidence matrix, 2- and 3-rater items") {
    // Items A(1,1) B(1,0) C(0,0) D(0,0): n = 8, Σo_{c≠k} = 2,
    // marginals n_1 = 3, n_0 = 5, M = 64 − 34 = 30;
    // α = 1 − 7·2/30 = 8/15 → 533333 ppm (floor).
    val two = Seq(
      ("A","r1",1), ("A","r2",1), ("B","r1",1), ("B","r2",0),
      ("C","r1",0), ("C","r2",0), ("D","r1",0), ("D","r2",0))
      .toDF("item", "rater", "label")
    assert(Stats.krippendorffAlpha(two, "item", "rater", "label")
      .as[(Long, Long, Long, Long, Long)].head() ===
      ((4L, 4L, 8L, 2L, 533333L)))
    // Add a 3-rater item E(1,0,0): per-item terms (n²−Σc²)/(n−1) are
    // B: 2/1, E: 4/2 → Σo = 4 with lcm(1,2) = 2 scaling; n = 11,
    // n_1 = 4, n_0 = 7, M = 121 − 65 = 56; α = 1 − 10·4/56 = 16/56
    // → 285714 ppm.
    val mixed = two.unionByName(
      Seq(("E","r1",1), ("E","r2",0), ("E","r3",0))
        .toDF("item", "rater", "label"))
    assert(Stats.krippendorffAlpha(mixed, "item", "rater", "label")
      .as[(Long, Long, Long, Long, Long)].head() ===
      ((5L, 5L, 11L, 2L, 285714L)))
  }

  test("krippendorffAlpha: perfect, systematic-negative, single-rated excluded") {
    val perfect = Seq(("A","r1","x"), ("A","r2","x"), ("B","r1","y"),
      ("B","r2","y")).toDF("item", "rater", "label")
    assert(Stats.krippendorffAlpha(perfect, "item", "rater", "label")
      .as[(Long, Long, Long, Long, Long)].head() ===
      ((2L, 2L, 4L, 2L, 1000000L)))
    // Two items, both split (1,0): Σo = 4, n = 4, M = 16 − 8 = 8;
    // α = 1 − 3·4/8 = −1/2 → −500000 ppm exactly.
    val neg = Seq(("A","r1",1), ("A","r2",0), ("B","r1",1), ("B","r2",0))
      .toDF("item", "rater", "label")
    assert(Stats.krippendorffAlpha(neg, "item", "rater", "label")
      .as[(Long, Long, Long, Long, Long)].head()._5 === -500000L)
    // A single-rated item is unpairable: dropped from n/marginals but
    // still counted in n_items.
    val lone = perfect.unionByName(Seq(("Z","r1","x"))
      .toDF("item", "rater", "label"))
    assert(Stats.krippendorffAlpha(lone, "item", "rater", "label")
      .as[(Long, Long, Long, Long, Long)].head() ===
      ((3L, 2L, 4L, 2L, 1000000L)))
    // NOTHING pairable: alpha undefined -> 0 by the kappa convention.
    val none = Seq(("Z","r1","x")).toDF("item", "rater", "label")
    assert(Stats.krippendorffAlpha(none, "item", "rater", "label")
      .as[(Long, Long, Long, Long, Long)].head() ===
      ((1L, 0L, 0L, 0L, 0L)))
  }

  test("madOutliers: hand median/MAD, outlier flag, robustness to the outlier") {
    // key a: values 1,2,3,4,100 -> median 3 (med2 6), devs 2,1,0,1,97
    //   -> dev2 {4,2,0,2,194}, MAD = median(dev) = 1 (mad4 4).
    //   flag: dev > 3.5 * MAD = 3.5 -> only 97 -> n_outliers 1.
    //   (mean/std would be dragged to ~22 +/- 43 — MAD isn't.)
    val d = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      ("b", 10L), ("b", 10L))
      .toDF("k", "v")
    val got = Stats.madOutliers(d, "k", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 5L, 6L, 4L, 1L, 194L)))
    // Constant key: MAD 0 -> nothing can exceed k*0 strictly unless dev>0;
    // here all devs are 0 -> no outliers.
    assert(got("b") === (("b", 2L, 20L, 0L, 0L, 0L)))
    // Even-n interpolation: 1,2,3,10 -> median 2.5 (med2 5), dev2
    // {3,1,1,15}, sorted {1,1,3,15} -> MAD = (1+3)/2/2... mad4 = 4.
    val e = Seq(("c", 1L), ("c", 2L), ("c", 3L), ("c", 10L)).toDF("k", "v")
    val r = Stats.madOutliers(e, "k", "v")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert((r._3, r._4) === ((5L, 4L)))
    // dev(10) = 7.5 > 3.5 * MAD(1.0)... mad4=4 -> MAD=1: 2*15e5*... flag.
    assert(r._5 === 1L)
  }

  test("sliceKlDivergence: hand two-slice KL, exact integer ln terms") {
    // A = "a a b" (a:2 b:1), B = "b b b"; corpus a:2 b:4, C = 6.
    // A: 2·round(1e6·ln 2) + 1·round(1e6·ln ½) = 693147 → // 3 = 231049.
    // B: 3·round(1e6·ln 1.5) = 1216395 → // 3 = 405465.
    val docs = Seq((0L, "A", "a a b"), (1L, "B", "b b b"))
      .toDF("doc_id", "src", "text")
    val got = TextAnalysis.sliceKlDivergence(docs, "src", "text")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("A", 3L, 2L, 231049L), ("B", 3L, 1L, 405465L)))
  }

  test("sliceJsDivergence: hand two-slice JSD is symmetric; single slice is 0") {
    // Same corpus as the KL spec: A = "a a b", B = "b b b".
    // A: sp = 2·ln2 − ln2 = 693147; sq = 3·round(1e6·ln1.5) = 1216395,
    //    absent mass 0 → 693147//6 + 1216395//6 = 115524 + 202732.
    // B mirrors A exactly (two slices ⇒ rest-of-corpus symmetry).
    val docs = Seq((0L, "A", "a a b"), (1L, "B", "b b b"))
      .toDF("doc_id", "src", "text")
    val got = TextAnalysis.sliceJsDivergence(docs, "src", "text")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("A", 3L, 3L, 318256L), ("B", 3L, 3L, 318256L)))
    // One slice owns the corpus: P = M → 0 by convention.
    val solo = Seq((0L, "A", "a a b"), (1L, "A", "b b"))
      .toDF("doc_id", "src", "text")
    assert(TextAnalysis.sliceJsDivergence(solo, "src", "text")
      .collect().head.getAs[Long]("jsd_ppm") === 0L)
  }

  test("vocabRichness: hand Chao1 and Good-Turing coverage, empty corpus zeros") {
    import org.apache.spark.sql.functions.col
    // "a a b c d": N=5, V=4, F1=3 (b,c,d), F2=1 (a) →
    // chao1 = 4 + 3·2 DIV 4 = 5; coverage = 1e6 − 3e6 DIV 5 = 400000.
    val docs = Seq((0L, "a a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabRichness(docs, col("text")).collect().head
    assert((r.getAs[Long]("n_tokens"), r.getAs[Long]("v_observed"),
      r.getAs[Long]("f1"), r.getAs[Long]("f2"),
      r.getAs[Long]("chao1_est"), r.getAs[Long]("coverage_ppm")) ===
      ((5L, 4L, 3L, 1L, 5L, 400000L)))
    // F2 > 0 engages the bias-corrected denominator:
    // "a a a b b c d": F1=2, F2=1 → chao1 = 4 + 2·1 DIV 4 = 4.
    val d2 = Seq((0L, "a a a b b c d")).toDF("doc_id", "text")
    val r2 = TextAnalysis.vocabRichness(d2, col("text")).collect().head
    assert((r2.getAs[Long]("f1"), r2.getAs[Long]("f2"),
      r2.getAs[Long]("chao1_est")) === ((2L, 1L, 4L)))
    // Empty corpus: all zeros, never a divide-by-zero.
    val e = TextAnalysis.vocabRichness(
      Seq((0L, "")).toDF("doc_id", "text"), col("text")).collect().head
    assert((e.getAs[Long]("n_tokens"), e.getAs[Long]("v_observed"),
      e.getAs[Long]("chao1_est"), e.getAs[Long]("coverage_ppm")) ===
      ((0L, 0L, 0L, 0L)))
  }

  test("robustTrend: hand Mann-Kendall + Theil-Sen, ties, degenerate buckets") {
    import org.apache.spark.sql.functions.col
    def rows(ys: Seq[Int]): Seq[(String, Long)] =
      ys.zipWithIndex.flatMap { case (y, b) =>
        Seq.fill(y)(("k", b.toLong)) }
    def run(ys: Seq[Int]) =
      Stats.robustTrend(rows(ys).toDF("g", "b"), "g", col("b"))
        .collect().head
    // Monotone 1,2,3,4: S = 6, no ties → z² = 25·18e6/156 = 2884615;
    // every pairwise slope is exactly 1 → Theil–Sen 10⁶.
    val up = run(Seq(1, 2, 3, 4))
    assert((up.getAs[Long]("n_buckets"), up.getAs[Long]("s_stat"),
      up.getAs[Long]("z2_ppm"), up.getAs[Long]("theil_sen_ppm"),
      up.getAs[Int]("significant_95")) === ((4L, 6L, 2884615L, 1000000L, 0)))
    // Mirror: S flips sign, z² identical, slope −10⁶.
    val dn = run(Seq(4, 3, 2, 1))
    assert((dn.getAs[Long]("s_stat"), dn.getAs[Long]("z2_ppm"),
      dn.getAs[Long]("theil_sen_ppm")) === ((-6L, 2884615L, -1000000L)))
    // Flat counts: all pairs tie → S = 0, z² = 0, slope 0.
    val flat = run(Seq(2, 2, 2))
    assert((flat.getAs[Long]("s_stat"), flat.getAs[Long]("z2_ppm"),
      flat.getAs[Long]("theil_sen_ppm")) === ((0L, 0L, 0L)))
    // Ten monotone buckets: z² = 44²·18e6/2250 = 15488000 → significant.
    val ten = run((1 to 10))
    assert(ten.getAs[Long]("z2_ppm") === 15488000L)
    assert(ten.getAs[Int]("significant_95") === 1)
    // Single bucket: nothing measurable — zero z², null slope.
    val one = run(Seq(5))
    assert((one.getAs[Long]("n_buckets"), one.getAs[Long]("s_stat"),
      one.getAs[Long]("z2_ppm")) === ((1L, 0L, 0L)))
    assert(one.isNullAt(one.fieldIndex("theil_sen_ppm")))
  }

  test("autocorrelation: period-2 series, constant zero, missing-lag rows absent") {
    import org.apache.spark.sql.functions.col
    def rows(ys: Seq[Int]): Seq[(String, Long)] =
      ys.zipWithIndex.flatMap { case (y, b) => Seq.fill(y)(("k", b.toLong)) }
    // Alternating 1,3,1,3,1,3: lag-1 perfectly anti-correlated (−10⁶),
    // lag-2 perfectly correlated (+10⁶).
    val got = Stats.autocorrelation(rows(Seq(1, 3, 1, 3, 1, 3))
        .toDF("g", "b"), "g", col("b"), lags = Seq(1, 2))
      .as[(String, Int, Long, Long)].collect().toSeq
    assert(got === Seq(("k", 1, 5L, -1000000L), ("k", 2, 4L, 1000000L)))
    // Constant series: zero variance → 0 by the pearson convention.
    val const = Stats.autocorrelation(rows(Seq(2, 2, 2)).toDF("g", "b"),
        "g", col("b"), lags = Seq(1))
      .collect().head
    assert(const.getAs[Long]("r2_ppm") === 0L)
    // A lag longer than the series yields no row at all.
    assert(Stats.autocorrelation(rows(Seq(1, 2)).toDF("g", "b"), "g",
      col("b"), lags = Seq(5)).count() === 0L)
  }

  test("hodgesLehmann: hand Walsh medians, outlier robustness, ties") {
    import org.apache.spark.sql.functions.col
    def run(vs: Seq[Long]) =
      Stats.hodgesLehmann(vs.map(Tuple1(_)).toDF("v"), col("v"))
        .collect().head
    // {1,2,3}: Walsh ×2 sorted = 2,3,4,4,5,6 → lower median 4 → HL = 2.
    val sym = run(Seq(1L, 2L, 3L))
    assert((sym.getAs[Long]("n"), sym.getAs[Long]("n_pairs"),
      sym.getAs[Long]("hl_x2")) === ((3L, 6L, 4L)))
    // One wild outlier barely moves it: {1,2,3,1000} → HL = 2.5
    // (hl_x2 = 5) where the mean is 251.5 — the 29% breakdown at work.
    val rob = run(Seq(1L, 2L, 3L, 1000L))
    assert((rob.getAs[Long]("n_pairs"), rob.getAs[Long]("hl_x2")) ===
      ((10L, 5L)))
    // All tied: the estimate is the value itself.
    val tie = run(Seq(5L, 5L))
    assert((tie.getAs[Long]("n_pairs"), tie.getAs[Long]("hl_x2")) ===
      ((3L, 10L)))
  }

  test("wassersteinShift: hand transport distances, identical zero, one-sided") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(Long, Int)]) =
      Stats.wassersteinShift(rows.toDF("v", "a"), col("v"), col("a") === 1)
        .collect()
    // All A-mass at 0, all B-mass at 10: every unit moves 10 → W1 = 10.
    val far = run(Seq((0L, 1), (0L, 1), (10L, 0), (10L, 0))).head
    assert((far.getAs[Long]("n_a"), far.getAs[Long]("n_b"),
      far.getAs[Long]("w1_x1e6")) === ((2L, 2L, 10000000L)))
    // Unit shift: {1,3} vs {2,4} → W1 exactly 1.
    assert(run(Seq((1L, 1), (3L, 1), (2L, 0), (4L, 0))).head
      .getAs[Long]("w1_x1e6") === 1000000L)
    // Identical distributions → 0; one-sided input → 0.
    assert(run(Seq((1L, 1), (2L, 1), (1L, 0), (2L, 0))).head
      .getAs[Long]("w1_x1e6") === 0L)
    assert(run(Seq((1L, 1), (5L, 1))).head.getAs[Long]("w1_x1e6") === 0L)
    // Single distinct value: no gap exists → no row (documented).
    assert(run(Seq((7L, 1), (7L, 0))).isEmpty)
  }

  test("psiDrift: hand smoothed PSI, identical zero, threshold bits, knee") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(Long, Int)], bins: Int = 32) =
      Stats.psiDrift(rows.toDF("v", "a"), col("v"), col("a") === 1,
        maxHistBins = bins).collect().head
    // Polarized two-bin case: smoothed shares 3/4 vs 1/4 both bins →
    // PSI = 2·(1/2)·ln3 = 1.098612… → act bit fires.
    val pol = run(Seq((0L, 1), (0L, 1), (10L, 0), (10L, 0)))
    assert((pol.getAs[Long]("n_a"), pol.getAs[Long]("n_b"),
      pol.getAs[Long]("n_bins")) === ((2L, 2L, 2L)))
    assert(pol.getAs[Long]("psi_ppm") === 1098612L)
    assert((pol.getAs[Int]("watch_01"), pol.getAs[Int]("act_025")) ===
      ((1, 1)))
    // Identical distributions: every ratio is exactly 1 → PSI 0.
    val same = run(Seq((1L, 1), (2L, 1), (1L, 0), (2L, 0)))
    assert((same.getAs[Long]("psi_ppm"), same.getAs[Int]("watch_01")) ===
      ((0L, 0)))
    // Knee: near-unique values coarsen to 2 equal-width bins — the PSI
    // of the bucketed variable still separates a gross shift.
    val knee = run((0 until 50).map(i => (i.toLong, 1)) ++
      (0 until 50).map(i => ((1000 + i).toLong, 0)), bins = 2)
    assert(knee.getAs[Long]("n_bins") === 2L)
    assert(knee.getAs[Int]("act_025") === 1)
  }

  test("rankLeveneTest: hand deviation ranks, equal spreads exactly 0, planted blow-up") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(Long, String)]) =
      Stats.rankLeveneTest(rows.toDF("v", "g"), col("v"), col("g"))
        .collect().head
    // a = {0, 10} (lower median 0 → devs {0, 10}), b = {5, 5, 5}
    // (devs all 0): hand KW on devs = 0.75, tie ratio ×2 → 1500000.
    val hand = run(Seq((0L, "a"), (10L, "a"), (5L, "b"), (5L, "b"),
      (5L, "b")))
    assert((hand.getAs[Long]("n"), hand.getAs[Long]("n_groups"),
      hand.getAs[Long]("h_ppm"), hand.getAs[Int]("significant_95")) ===
      ((5L, 2L, 1500000L, 0)))
    // Identical spreads at different locations: deviation distributions
    // coincide → H exactly 0 (location shifts are invisible here —
    // that's kruskalWallis's job).
    val same = run(Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (101L, "b"), (102L, "b"), (103L, "b")))
    assert(same.getAs[Long]("h_ppm") === 0L)
    // Planted variance blow-up at matched medians: wide a vs constant b.
    val blow = run((0 until 50).map(i => (i.toLong, "a")) ++
      Seq.fill(50)((24L, "b")))
    assert(blow.getAs[Int]("significant_95") === 1)
  }

  test("wilcoxonSignedRank: hand rank sums, ties, zero-drop, degenerate") {
    import org.apache.spark.sql.functions.col
    def run(pairs: Seq[(Long, Long)]) =
      Stats.wilcoxonSignedRank(pairs.toDF("x", "y"), col("x"), col("y"))
        .collect().head
    // All-positive distinct diffs (1,2,3): 2W⁺ = 12, z² = 3·144/168 =
    // 2.571428… — n = 3 can never reach 0.05, as published.
    val up = run(Seq((11L, 10L), (12L, 10L), (13L, 10L)))
    assert((up.getAs[Long]("n_nonzero"), up.getAs[Long]("w_plus_x2"),
      up.getAs[Int]("direction"), up.getAs[Long]("z2_ppm"),
      up.getAs[Int]("significant_95")) === ((3L, 12L, 1, 2571428L, 0)))
    // Mixed with a tie at |d| = 1 and a zero pair dropped:
    // diffs (+1, −1, +2, 0) → 2W⁺ = 3 + 6 = 9, T = 6, z² = 2/3.
    val mix = run(Seq((11L, 10L), (9L, 10L), (12L, 10L), (10L, 10L)))
    assert((mix.getAs[Long]("n_nonzero"), mix.getAs[Long]("w_plus_x2"),
      mix.getAs[Long]("z2_ppm")) === ((3L, 9L, 666666L)))
    // Twenty positive distinct diffs: z² = 3·420²/34440 = 15.365853…
    // → significant.
    val big = run((1 to 20).map(i => (10L + i, 10L)))
    assert(big.getAs[Long]("z2_ppm") === 15365853L)
    assert(big.getAs[Int]("significant_95") === 1)
    // Identical columns: every diff is zero → nothing to test.
    val none = run(Seq((5L, 5L), (7L, 7L)))
    assert((none.getAs[Long]("n_nonzero"), none.getAs[Int]("direction"),
      none.getAs[Long]("z2_ppm")) === ((0L, 0, 0L)))
  }

  test("cramersV: perfect association is 1, independence 0, degenerate single column") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, String)]) =
      Stats.cramersV(rows.toDF("a", "b"), col("a"), col("b"))
        .collect().head
    // Diagonal 2×2: V² = 1 exactly.
    val perf = run(Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v")))
    assert((perf.getAs[Long]("n"), perf.getAs[Long]("v2_ppm")) ===
      ((4L, 1000000L)))
    // Uniform 2×2: every cell matches expectation → 0.
    val ind = run(Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")))
    assert(ind.getAs[Long]("v2_ppm") === 0L)
    // One column: min(r−1, c−1) = 0 → 0 by convention.
    val deg = run(Seq(("x", "u"), ("y", "u")))
    assert(deg.getAs[Long]("v2_ppm") === 0L)
  }

  test("cmhTest: hand single-stratum chi2 and MH odds ratio, Simpson guard, degenerates") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, Int, Boolean)]) =
      Stats.cmhTest(rows.toDF("s", "v", "c"), col("s"), col("v"), col("c"))
        .collect().head
    def cell(s: String, v: Int, c: Boolean, n: Int) =
      Seq.fill(n)((s, v, c))
    // Single stratum a=9 b=1 c=1 d=9: E = 5, V = 10⁴/7600 → χ² =
    // 3.5²/V = 9.310…; OR_MH = 81.
    val one = run(cell("s", 1, true, 9) ++ cell("s", 1, false, 1) ++
      cell("s", 0, true, 1) ++ cell("s", 0, false, 9))
    assert((one.getAs[Long]("n_strata"), one.getAs[Long]("n")) === ((1L, 20L)))
    assert(one.getAs[Long]("chi2_ppm") === 9310003L)
    assert(one.getAs[Int]("significant_95") === 1)
    assert(one.getAs[Long]("or_mh_ppm") === 81000000L)
    // Simpson guard: two strata, each with NO within-stratum effect but
    // wildly different base rates and arm sizes — pooled 2×2 shows an
    // effect, CMH correctly reports χ² ≈ 0, OR = 1.
    val simpson = run(
      cell("lo", 1, true, 1) ++ cell("lo", 1, false, 9) ++
        cell("lo", 0, true, 4) ++ cell("lo", 0, false, 36) ++
        cell("hi", 1, true, 36) ++ cell("hi", 1, false, 4) ++
        cell("hi", 0, true, 9) ++ cell("hi", 0, false, 1))
    assert(simpson.getAs[Long]("chi2_ppm") === 0L)
    assert(simpson.getAs[Long]("or_mh_ppm") === 1000000L)
    // Fully-converted treatment arm (b = 0): bc mass 0 → OR null
    // (infinite association), never a divide-by-zero.
    val inf = run(cell("s", 1, true, 3) ++
      cell("s", 0, true, 2) ++ cell("s", 0, false, 2))
    assert(inf.isNullAt(inf.fieldIndex("or_mh_ppm")))
    // Constant outcome: V = 0 everywhere → χ² 0, not significant.
    val const = run(cell("s", 1, true, 5) ++ cell("s", 0, true, 5))
    assert((const.getAs[Long]("chi2_ppm"),
      const.getAs[Int]("significant_95")) === ((0L, 0)))
  }

  test("consistency law: kruskalWallis at k=2 equals the MWU z² across random tie-heavy fixtures") {
    import org.apache.spark.sql.functions.col
    // Two independent audited numeric paths compute the SAME statistic
    // at k = 2 (tie-corrected H ≡ tie-corrected z²); they may differ
    // only by the documented floors: each KW group's nested pair
    // (a_g, b_g) understates b_g by < 2 units, the final ×12 scales
    // that to < 24 ppm per group, 2 groups → < 48 ppm, plus the two
    // IEEE chains' last-bit wobble — a bounded-slop identity that
    // catches a regression in either path.
    for (seed <- Seq(11, 37, 101)) {
      def h(i: Int): Long = {
        var x = (i + seed * 1000003).toLong * 0x9E3779B97F4A7C15L
        x ^= (x >>> 33); x * 0xFF51AFD7ED558CCDL >>> 40
      }
      val rows = (0 until 300).map(i => (h(i) % 37, (h(i + 7919) % 2).toInt))
      val mwu = Stats.mannWhitneyU(rows.toDF("v", "a"), col("v"),
        col("a") === 1).collect().head.getAs[Long]("z2_ppm")
      val kw = Stats.kruskalWallis(rows.toDF("v", "a"), col("v"),
        col("a")).collect().head.getAs[Long]("h_ppm")
      assert(math.abs(mwu - kw) <= 50L,
        s"seed $seed: MWU z2 $mwu vs KW h $kw diverged beyond floor slop")
      assert(kw <= mwu + 2, // KW's floors UNDERSTATE (±2: IEEE last-bit)
        s"seed $seed: KW h $kw exceeds MWU z2 $mwu")
    }
  }

  test("kruskalWallis: matches the MWU hand cases at k=2, ties, degenerate") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(Long, String)]) =
      Stats.kruskalWallis(rows.toDF("v", "g"), col("v"), col("g"))
        .collect().head
    // Separated two-group case: H = z²_MWU = 3.857… minus two
    // documented group floors (3857136 vs the exact 3857142) —
    // conservative, still over the df=1 critical value.
    val sep = run(Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "b")))
    assert((sep.getAs[Long]("n"), sep.getAs[Long]("n_groups")) === ((6L, 2L)))
    assert(sep.getAs[Long]("h_ppm") === 3857136L)
    assert(sep.getAs[Int]("significant_95") === 1)
    // Tie case (the MWU z² = 1.5 fixture): group terms are exact here,
    // the tie multiply is the documented IEEE chain.
    val tie = run(Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b")))
    val expected = math.floor(1350000.0 *
      (60.0 / 54.0)).toLong // chain replayed from first principles
    assert(tie.getAs[Long]("h_ppm") === expected)
    // Single group: df = 0 → statistic 0 (up to greatest-0 clamp),
    // verdict NULL (no critical literal exists).
    val solo = run(Seq((1L, "a"), (2L, "a"), (3L, "a")))
    assert(solo.getAs[Long]("h_ppm") === 0L)
    assert(solo.isNullAt(solo.fieldIndex("significant_95")))
    // Everything tied: zero variance → 0, not significant.
    val flat = run(Seq((7L, "a"), (7L, "b"), (7L, "c")))
    assert(flat.getAs[Long]("h_ppm") === 0L)
  }

  test("pettittChangePoint: hand step series, tie-break, degenerate single bucket") {
    import org.apache.spark.sql.functions.col
    def rows(ys: Seq[Int]): Seq[(String, Long)] =
      ys.zipWithIndex.flatMap { case (y, b) => Seq.fill(y)(("k", b.toLong)) }
    def run(ys: Seq[Int]) =
      Stats.pettittChangePoint(rows(ys).toDF("g", "b"), "g", col("b"))
        .collect().head
    // Step 1,1,1,5,5: six crossing pairs, U = [2,4,6,3,0] → K = 6 at
    // t = 2 (the last bucket of the first segment); tiny n → not sig.
    val s = run(Seq(1, 1, 1, 5, 5))
    assert((s.getAs[Long]("n_buckets"), s.getAs[Long]("k_stat"),
      s.getAs[Long]("change_bucket"), s.getAs[Int]("sig_05")) ===
      ((5L, 6L, 2L, 0)))
    // 10 low days then 10 high days: K = 100 at t = 9, significant
    // (6·100²·1e6 > ln40·(20³+20²)·1e6).
    val big = run(Seq.fill(10)(1) ++ Seq.fill(10)(9))
    assert((big.getAs[Long]("k_stat"), big.getAs[Long]("change_bucket"),
      big.getAs[Int]("sig_05")) === ((100L, 9L, 1)))
    // Flat series: K = 0, change point is the min bucket by tie-break.
    val flat = run(Seq(3, 3, 3))
    assert((flat.getAs[Long]("k_stat"), flat.getAs[Long]("change_bucket"))
      === ((0L, 0L)))
    // Single bucket: nothing to split.
    val one = run(Seq(4))
    assert(one.getAs[Long]("k_stat") === 0L)
    assert(one.isNullAt(one.fieldIndex("change_bucket")))
  }

  test("concentrationProfile: hand Gini/HHI/top-share, uniform zero, single key") {
    def run(rows: Seq[String]) =
      Stats.concentrationProfile(rows.map(Tuple1(_)).toDF("k"), "k")
        .collect().head
    // Counts a:1 b:1 c:2 → Gini = 2/12 = 166666 ppm, HHI = 6/16,
    // top share = 2/4.
    val r = run(Seq("a", "b", "c", "c"))
    assert((r.getAs[Long]("n_keys"), r.getAs[Long]("total"),
      r.getAs[Long]("gini_ppm"), r.getAs[Long]("hhi_ppm"),
      r.getAs[Long]("top_share_ppm")) ===
      ((3L, 4L, 166666L, 375000L, 500000L)))
    // Uniform mass → Gini exactly 0.
    val u = run(Seq("a", "a", "b", "b"))
    assert((u.getAs[Long]("gini_ppm"), u.getAs[Long]("hhi_ppm")) ===
      ((0L, 500000L)))
    // Single key owns everything: Gini 0 (n = 1), HHI and top share 10⁶.
    val s = run(Seq("a", "a", "a"))
    assert((s.getAs[Long]("gini_ppm"), s.getAs[Long]("hhi_ppm"),
      s.getAs[Long]("top_share_ppm")) === ((0L, 1000000L, 1000000L)))
  }

  test("spearmanCorr: tie midranks exact; monotone-nonlinear beats pearson; constant axis is 0") {
    import org.apache.spark.sql.functions.col
    // Hand-ranked tie case: x ranks ×2 = (2,5,5,8), y = (2,4,6,8) →
    // signed ρ² = 72²/(72·80) = 0.9 exactly.
    val ties = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 2L, 30L),
      ("k", 3L, 40L)).toDF("g", "x", "y")
    val t = Stats.spearmanCorr(ties, "g", col("x"), col("y")).collect().head
    assert(t.getAs[Long]("n") === 4L)
    assert(t.getAs[Long]("rho2_ppm") === 900000L)
    // Perfect monotone but nonlinear: Spearman saturates at 10^6 where
    // Pearson stays below (the reason the operator exists).
    val cube = Seq(("k", 1L, 1L), ("k", 2L, 8L), ("k", 3L, 27L),
      ("k", 4L, 64L)).toDF("g", "x", "y")
    val s = Stats.spearmanCorr(cube, "g", col("x"), col("y")).collect().head
    assert(s.getAs[Long]("rho2_ppm") === 1000000L)
    val p = Stats.pearsonCorr(cube, "g", col("x"), col("y")).collect().head
    assert(p.getAs[Long]("r2_ppm") < 1000000L)
    // Constant axis → 0 (no monotone association measurable).
    val const = Seq(("k", 1L, 7L), ("k", 2L, 7L), ("k", 3L, 7L))
      .toDF("g", "x", "y")
    assert(Stats.spearmanCorr(const, "g", col("x"), col("y"))
      .collect().head.getAs[Long]("rho2_ppm") === 0L)
  }

  test("mcnemarTest: discordant algebra, ppm verdict, zero-discordance convention") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(Boolean, Boolean)]) =
      Stats.mcnemarTest(rows.toDF("a", "b"), col("a"), col("b"))
        .collect().head
    // both=5, a_only=4, b_only=1, neither=2: chi2 = 9/5 = 1.8 — below the
    // 3.841459 critical value.
    val r = run(Seq.fill(5)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(2)((false, false)))
    assert((r.getAs[Long]("n"), r.getAs[Long]("n_both"),
      r.getAs[Long]("n_a_only"), r.getAs[Long]("n_b_only"),
      r.getAs[Long]("n_neither")) === ((12L, 5L, 4L, 1L, 2L)))
    assert(r.getAs[Long]("chi2_ppm") === 1800000L)
    assert(r.getAs[Int]("significant_95") === 0)
    // One-sided churn: 9 vs 0 discordant → chi2 = 9 > 3.84 → significant.
    val sig = run(Seq.fill(9)((true, false)) ++ Seq.fill(3)((true, true)))
    assert(sig.getAs[Long]("chi2_ppm") === 9000000L)
    assert(sig.getAs[Int]("significant_95") === 1)
    // Zero discordance: chi2 0, not significant (never a 0/0).
    val z = run(Seq.fill(4)((true, true)) ++ Seq.fill(2)((false, false)))
    assert(z.getAs[Long]("chi2_ppm") === 0L)
    assert(z.getAs[Int]("significant_95") === 0)
  }

  test("mannWhitneyU: hand rank-sum, tie correction, degenerate conventions") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(Long, Int)]) =
      Stats.mannWhitneyU(rows.toDF("v", "a"), col("v"), col("a") === 1)
        .collect().head
    // Fully separated, no ties: A={1,2,3} all below B={4,5,6} → U_A = 0,
    // z² = 20.25/5.25 = 3.857142… (the classic hand value) → significant.
    val sep = run(Seq((1L, 1), (2L, 1), (3L, 1), (4L, 0), (5L, 0), (6L, 0)))
    assert((sep.getAs[Long]("n_a"), sep.getAs[Long]("n_b"),
      sep.getAs[Long]("u_a_x2")) === ((3L, 3L, 0L)))
    assert(sep.getAs[Int]("direction") === -1)
    assert(sep.getAs[Long]("z2_ppm") === 3857142L)
    assert(sep.getAs[Int]("significant_95") === 1)
    // Tie case: A={1,2}, B={2,3} → U_A = 0.5 (u_a_x2 = 1), T = 2³−2 = 6,
    // σ² = (4/12)·(5 − 6/12) = 1.5 → z² = 2.25/1.5 = 1.5 exactly.
    val tie = run(Seq((1L, 1), (2L, 1), (2L, 0), (3L, 0)))
    assert(tie.getAs[Long]("u_a_x2") === 1L)
    assert(tie.getAs[Long]("z2_ppm") === 1500000L)
    assert(tie.getAs[Int]("significant_95") === 0)
    // All rows tied: zero variance → z² = 0, direction 0 (U_A hits its
    // mean exactly), never a divide-by-zero.
    val flat = run(Seq((7L, 1), (7L, 1), (7L, 0), (7L, 0)))
    assert((flat.getAs[Int]("direction"), flat.getAs[Long]("z2_ppm"),
      flat.getAs[Int]("significant_95")) === ((0, 0L, 0)))
    // One side empty → degenerate-zero convention.
    val empt = run(Seq((1L, 1), (2L, 1)))
    assert((empt.getAs[Long]("n_b"), empt.getAs[Long]("z2_ppm")) ===
      ((0L, 0L)))
    // Independent replay on a pseudo-random tie-heavy fixture: midrank
    // U and the tie-corrected z² recomputed from first principles must
    // match the engine bit-for-bit (same IEEE chain).
    val rows = (0 until 240).map(i => (((i * 37) % 50).toLong, i % 3 min 1))
    val got = run(rows.map { case (v, a) => (v, 1 - a) }) // a when i%3==0
    val as = rows.filter(_._2 == 0).map(_._1)
    val bs = rows.filter(_._2 == 1).map(_._1)
    val na = as.size.toLong; val nb = bs.size.toLong; val n = na + nb
    val u2a = as.map(v => 2L * bs.count(_ < v) + bs.count(_ == v)).sum
    val t = (as ++ bs).groupBy(identity).values
      .map(g => g.size.toLong).map(c => c * c * c - c).sum
    assert(got.getAs[Long]("u_a_x2") === u2a)
    val z2 = 1000000.0d *
      ((math.abs(u2a - na * nb).toDouble / (na * nb).toDouble) *
        math.abs(u2a - na * nb).toDouble) *
      ((3L * n * (n - 1)).toDouble / (n * (n * n - 1) - t).toDouble)
    assert(got.getAs[Long]("z2_ppm") === math.floor(z2).toLong)
    // Knee path: coarsening merges values into ties, the statistic stays
    // defined and the dominance direction on a separated corpus survives.
    val knee = Stats.mannWhitneyU(
      (0 until 100).map(i => (i.toLong, if (i < 50) 1 else 0))
        .toDF("v", "a"), col("v"), col("a") === 1, maxHistBins = 4)
      .collect().head
    assert(knee.getAs[Int]("direction") === -1)
    assert(knee.getAs[Long]("z2_ppm") > 0L)
  }

  test("averagePrecision: perfect/reversed/tied hand values, degenerate zero") {
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(Long, Int)]) =
      Stats.averagePrecision(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
    // Perfect ranking: both positives above all negatives → AP = 1.
    val perf = run(Seq((4L, 1), (3L, 1), (2L, 0), (1L, 0)))
    assert((perf.getAs[Long]("n"), perf.getAs[Long]("n_pos"),
      perf.getAs[Long]("ap_ppm")) === ((4L, 2L, 1000000L)))
    // Worst ranking: positives below both negatives →
    // AP = (1/2)(1/3) + (1/2)(2/4) = 5/12 (416666 floored).
    val rev = run(Seq((4L, 0), (3L, 0), (2L, 1), (1L, 1)))
    assert(rev.getAs[Long]("ap_ppm") === 416666L)
    // One score group (all tied): AP = prevalence exactly.
    val tied = run(Seq((5L, 1), (5L, 1), (5L, 0), (5L, 0)))
    assert(tied.getAs[Long]("ap_ppm") === 500000L)
    // No positives → 0 by the degenerate convention.
    val none = run(Seq((2L, 0), (1L, 0)))
    assert((none.getAs[Long]("n_pos"), none.getAs[Long]("ap_ppm")) ===
      ((0L, 0L)))
    // Knee path: bucketed scores report the exact AP of the bucketed
    // scorer — still 10^6 when bucketing preserves the separation.
    val knee = Stats.averagePrecision(
      (0 until 100).map(i => ((100 - i).toLong, if (i < 50) 1 else 0))
        .toDF("s", "y"), col("s"), col("y"), maxHistBins = 2)
      .collect().head
    assert(knee.getAs[Long]("ap_ppm") === 1000000L)
  }
}
