package graft.ops

import graft.SparkTestBase

class WalkBenfordSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent replay of the walk-draw policy: 13-hex md5 prefix of
    * "start-walk-step-salt" mod degree, over id-sorted neighbor lists.
    */
  private def expectedWalks(
      edges: Seq[(Long, Long)], wpn: Int, len: Int,
      salt: String): Set[(Long, Long, Long, Long)] = {
    val adj = (edges ++ edges.map(_.swap)).distinct.filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).sorted }
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(start: Long, walk: Long, t: Int): Long = {
      val hex = md.digest(s"$start-$walk-$t-$salt".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    val rows = Set.newBuilder[(Long, Long, Long, Long)]
    for (start <- adj.keys; walk <- 0 until wpn) {
      var cur = start
      rows += ((start, walk.toLong, 0L, cur))
      for (t <- 1 to len) {
        val nbrs = adj(cur)
        cur = nbrs((draw(start, walk, t) % nbrs.length).toInt)
        rows += ((start, walk.toLong, t.toLong, cur))
      }
    }
    rows.result()
  }

  test("randomWalks reproduces the md5-draw policy row for row") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L))
    val got = Graph.randomWalks(edges.toDF("src", "dst"), "src", "dst",
        walksPerNode = 2, walkLen = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expectedWalks(edges, 2, 3, "walk"))
    // Re-run is bit-identical (pure function of (start, walk, step, salt)).
    val again = Graph.randomWalks(edges.toDF("src", "dst"), "src", "dst",
        walksPerNode = 2, walkLen = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again === got)
  }

  test("randomWalks: directed walks stop at sinks; a fresh salt re-draws") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.randomWalks(e, "src", "dst", walkLen = 3,
        directed = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    // From 1: step 1 reaches the sink 2, nothing after. From 2: only step 0.
    assert(got === Set((1L, 0L, 0L, 1L), (1L, 0L, 1L, 2L), (2L, 0L, 0L, 2L)))
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
    val a = Graph.randomWalks(edges.toDF("src", "dst"), "src", "dst",
      walksPerNode = 1, walkLen = 4, salt = "epoch1")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a === expectedWalks(edges, 1, 4, "epoch1"))
  }

  test("walkCooccurrence: pairs/marginals/PMI replay from the walk table") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L))
    val walks = expectedWalks(edges, 2, 4, "walk").toSeq
    // Independent replay: windowed ordered pairs, marginals, ln PMI.
    val pairs = for {
      ((s, k), steps) <- walks.groupBy(w => (w._1, w._2)).toSeq
      sorted = steps.sortBy(_._3)
      i <- sorted.indices; j <- sorted.indices
      if sorted(j)._3 > sorted(i)._3 && sorted(j)._3 <= sorted(i)._3 + 2
    } yield (sorted(i)._4, sorted(j)._4)
    val n = pairs.length.toLong
    val cAB = pairs.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val cL = pairs.groupBy(_._1).map { case (x, xs) => x -> xs.length.toLong }
    val cR = pairs.groupBy(_._2).map { case (x, xs) => x -> xs.length.toLong }
    val want = cAB.collect { case ((a, b), nab) if nab >= 2 =>
      (a, b, nab, math.round(1e6 * math.log(
        nab.toDouble * n / (cL(a).toDouble * cR(b)))))
    }.toSet
    val got = Graph.walkCooccurrence(edges.toDF("src", "dst"), "src", "dst",
        walksPerNode = 2, walkLen = 4, window = 2, minCount = 2L,
        topK = 1000)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("benfordAudit: hand counts, zero-filled digits, positives only") {
    val d = Seq(("a", 1L), ("a", 1L), ("a", 19L), ("a", 2L), ("a", 300L),
      ("a", 9L), ("a", 0L), ("a", -5L), ("b", 4L))
      .toDF("k", "v")
    val got = Stats.benfordAudit(d, "k", "v")
      .as[(String, Long, Int, Long, Long, Long)].collect()
    val a = got.filter(_._1 == "a").sortBy(_._3)
    assert(a.map(_._2).toSet === Set(6L)) // 0 and -5 excluded
    assert(a.map(r => r._3 -> r._4).toMap ===
      Map(1 -> 3L, 2 -> 1L, 3 -> 1L, 4 -> 0L, 5 -> 0L, 6 -> 0L,
        7 -> 0L, 8 -> 0L, 9 -> 1L))
    // Exact integer tvd replay from the shared ppm literals.
    val e = Stats.BenfordPpm.toMap
    val num = a.map(r => math.abs(1000000L * r._4 - 6L * e(r._3))).sum
    assert(a.map(_._6).toSet === Set(num / 12))
    // Expectation column carries the literals verbatim.
    assert(a.map(r => r._3 -> r._5).toMap === e.map { case (k, v) => k -> v })
    val b = got.filter(_._1 == "b")
    assert(b.length === 9 && b.map(_._2).toSet === Set(1L))
  }
}
