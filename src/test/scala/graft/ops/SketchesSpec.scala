package graft.ops

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("cmsAuditedTopTokens: exact counts, sketch estimate honors the bound") {
    // 'alpha' ×30, 'beta' ×12, 'gamma' ×5, long tail of singletons.
    val docs = (
      Seq.fill(30)("alpha") ++ Seq.fill(12)("beta") ++ Seq.fill(5)("gamma") ++
        (1 to 40).map(i => s"tail$i")
    ).grouped(9).map(_.mkString(" ")).toSeq.toDF("text")
    val got = Sketches.cmsAuditedTopTokens(docs, "text", k = 3)
      .as[(String, Long, Int)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq(("alpha", 30L), ("beta", 12L), ("gamma", 5L)))
    assert(got.forall(_._3 == 1), got.mkString(", "))
  }

  test("hllAuditedDistinct: exact per-key distincts, estimate in envelope") {
    val rows = (0 until 1000).map(i => (s"k${i % 3}", (i * 7) % 211)) ++
      (0 until 50).map(i => ("rare", i))
    val got = Sketches.hllAuditedDistinct(rows.toDF("k", "v"), "k", "v")
      .as[(String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // k0/k1/k2 each see a dense residue class of size min(334,211)=211-ish;
    // exact counts come from the data, envelope bit must hold everywhere.
    assert(got("rare")._1 === 50L)
    assert(got.size === 4)
    assert(got.values.forall(_._2 === 1), got.toString)
    // Small keys (≤ 4 absolute slack) audit exactly.
    val tiny = Seq(("a", 1), ("a", 1), ("a", 2)).toDF("k", "v")
    val t = Sketches.hllAuditedDistinct(tiny, "k", "v")
      .as[(String, Long, Int)].collect().head
    assert(t === (("a", 2L, 1)))
  }

  test("quantileProfile: rank audit holds, exact-known quantiles on uniform keys") {
    // k0: values 1..1000 (quantiles fully known), k1: heavy-tailed, k2: tiny.
    val rows = (1 to 1000).map(i => ("k0", i.toDouble)) ++
      (1 to 500).map(i => ("k1", math.pow(i.toDouble, 3))) ++
      Seq(("k2", 1.0), ("k2", 2.0), ("k2", 3.0))
    val got = Sketches.quantileProfile(rows.toDF("k", "v"), "k", "v",
        probabilities = Seq(0.5, 0.9, 0.99))
      .as[(String, Double, Long, Int)].collect()
    assert(got.length === 9)
    assert(got.forall(_._4 == 1), got.mkString(", "))
    assert(got.filter(_._1 == "k0").forall(_._3 == 1000L))
    assert(got.filter(_._1 == "k2").forall(_._3 == 3L))
    // Deterministic regardless of partitioning (GK bound is worst-case).
    val repart = Sketches.quantileProfile(
      rows.toDF("k", "v").repartition(13), "k", "v",
      probabilities = Seq(0.5, 0.9, 0.99))
      .as[(String, Double, Long, Int)].collect()
    assert(repart.forall(_._4 == 1))
  }

  test("kmvDistinct: exact below k, estimate within envelope above, merge-invariant") {
    // keyA: 10 distinct values repeated (below k=16 → exact);
    // keyB: 5000 distinct (well above k → estimator path).
    val rows = (0 until 100).map(i => ("a", (i % 10).toLong)) ++
      (0 until 5000).map(i => ("b", 1000L + i))
    val df = rows.toDF("k", "v")
    val got = Sketches.kmvDistinct(df, "k", "v", k = 16)
      .as[(String, Long, Int, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    val a = got("a")
    assert(a._2 === 10L && a._3 === 10 && a._5 === 10L && a._6 === 1)
    val b = got("b")
    assert(b._2 === 5000L && b._3 === 16)
    assert(b._6 === 1, s"estimate ${b._5} outside 4-sigma of 5000")
    // Partitioning never changes the sketch: min-k merges associatively.
    val repart = Sketches.kmvDistinct(df.repartition(17), "k", "v", k = 16)
      .as[(String, Long, Int, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(repart === got)
    // Duplicates of a kept hash never occupy extra slots (distinct min-k).
    val dup = Seq.fill(50)(("d", 7L)).toDF("k", "v")
    val d = Sketches.kmvDistinct(dup, "k", "v", k = 16)
      .as[(String, Long, Int, Long, Long, Int)].collect().head
    assert(d._2 === 1L && d._3 === 1 && d._5 === 1L)
  }

  test("kmvIntersect: hash-exact below k, envelope above, sketch-only union") {
    // Small pair (union 15 < k=16): intersection recovered hash-exactly.
    val small = ((0 until 10).map(i => ("a", s"v$i")) ++
      (5 until 15).map(i => ("b", s"v$i"))).toDF("k", "v")
    val s = Sketches.kmvIntersect(small, "k", "v", k = 16)
      .as[(String, String, Long, Long, Int, Long, Long, Long, Int)]
      .collect().head
    assert(s._1 === "a" && s._2 === "b")
    assert(s._3 === 5L && s._4 === 15L)            // exact inter/union
    assert(s._5 === 15 && s._7 === 15L && s._8 === 5L && s._9 === 1)
    // Large pair (5000 ∪ 5000, 2500 shared): estimator path, n_kept = k,
    // audit bit holds at 4σ.
    val big = ((0 until 5000).map(i => ("a", s"x$i")) ++
      (2500 until 7500).map(i => ("b", s"x$i"))).toDF("k", "v")
    val g = Sketches.kmvIntersect(big, "k", "v", k = 64)
      .as[(String, String, Long, Long, Int, Long, Long, Long, Int)]
      .collect().head
    assert(g._3 === 2500L && g._4 === 7500L && g._5 === 64)
    assert(g._9 === 1, s"est_inter ${g._8} outside envelope of 2500")
    // Partition-invariant (min-k merges associatively).
    val re = Sketches.kmvIntersect(big.repartition(13), "k", "v", k = 64)
      .as[(String, String, Long, Long, Int, Long, Long, Long, Int)]
      .collect().head
    assert(re === g)
  }

  test("cmsAuditedTopTokens is deterministic across runs (seeded sketch)") {
    val docs = (1 to 50).map(i => s"w${i % 7} w${i % 13} common").toDF("text")
    val a = Sketches.cmsAuditedTopTokens(docs, "text", k = 10)
      .as[(String, Long, Int)].collect().toSeq
    val b = Sketches.cmsAuditedTopTokens(docs, "text", k = 10)
      .as[(String, Long, Int)].collect().toSeq
    assert(a === b)
    assert(a.head._1 === "common" && a.head._2 === 50L)
  }

  test("kmvRollingDistinct: merged window sketch equals direct union sketch") {
    // Days 10..16 with overlapping value sets (day d sees v_{3d..3d+20}),
    // plus a gap day (day 14 absent) to exercise partial windows.
    def md5h(v: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
    }
    val dayValues: Map[Long, Seq[String]] =
      (Seq(10L, 11L, 12L, 13L, 15L, 16L)).map { d =>
        d -> (3 * d to 3 * d + 20).map(i => s"v$i")
      }.toMap
    val rows = dayValues.toSeq.flatMap { case (d, vs) =>
      vs.flatMap(v => Seq((d, v), (d, v))) // duplicates must not matter
    }
    val k = 8
    val got = Sketches.kmvRollingDistinct(rows.toDF("d", "v"), $"d", "v",
        window = 3, k = k)
      .as[(Long, Long, Long, Int, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === dayValues.keySet)
    for ((w, (_, nDays, nExact, nKept, kth, est, estOk)) <- got) {
      val daysIn = dayValues.keys.filter(d => d >= w - 2 && d <= w).toSeq
      val union = daysIn.flatMap(dayValues).distinct
      assert(nDays === daysIn.size.toLong)
      assert(nExact === union.size.toLong)
      // direct sketch over the union must equal the merged-sketch state
      val hs = union.map(md5h).distinct.sorted.take(k)
      assert(nKept === hs.size)
      assert(kth === hs.last)
      val expEst =
        if (hs.size < k) hs.size.toLong
        else (k - 1).toLong * (1L << 48) / (hs.last + 1L)
      assert(est === expEst)
      assert(estOk === 1, s"w=$w est=$est exact=$nExact")
    }
  }
}
