package graft.ops

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("connected components: two cliques stay separate, chain needs rounds") {
    // Clique {1,2,3}, clique {10,11}, and a 4-link chain 20-21-22-23-24
    // (the chain label needs several propagation rounds to reach the end).
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L))
  }

  test("components are direction-independent and handle shared nodes") {
    // Same component regardless of edge orientation; 5 bridges two pairs.
    val edges = Seq((7L, 5L), (5L, 3L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 3L, 5L -> 3L, 7L -> 3L))
  }

  test("non-convergence is loud: strict throws, non-strict warns and returns") {
    // A 10-link chain has diameter 10: label 0 cannot reach node 10 in 3
    // rounds, so maxIter=3 must NOT silently return split components.
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Graph.connectedComponents(chain, "a", "b", maxIter = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // Non-strict mode returns the partial labels (caller opted in).
    val partial = Graph.connectedComponents(chain, "a", "b", maxIter = 3,
      strict = false).as[(Long, Long)].collect().toMap
    assert(partial.size === 11 && partial.values.toSet.size > 1)
    // And the same chain with enough rounds converges to one component.
    val full = Graph.connectedComponents(chain, "a", "b", maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(full.values.toSet === Set(0L))
  }

  test("alternating-star CC handles a long chain in O(log n) rounds") {
    // A 128-link chain has diameter 128: min-label propagation would need
    // 129 rounds, the alternating-star algorithm converges well inside its
    // default maxIter = 50 (expected ~2 log n).
    val chain = (0L until 128L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Graph.connectedComponentsStar(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 129)
    assert(got.values.toSet === Set(0L))
  }

  test("alternating-star CC widens mixed src/dst column types") {
    // src INT, dst LONG: the working schema must be captured after union
    // type-widening or createDataFrame declares int over long row values.
    val mixed = Seq((1, 2L), (2, 3L), (10, 11L)).toDF("a", "b")
    val got = Graph.connectedComponentsStar(mixed, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("alternating-star CC equals min-label propagation on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(80)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
        .toDF("a", "b")
      val star = Graph.connectedComponentsStar(edges, "a", "b")
        .as[(Long, Long)].collect().toMap
      val label = Graph.connectedComponents(edges, "a", "b", maxIter = 30)
        .as[(Long, Long)].collect().toMap
      assert(star === label)
    }
  }

  test("empty edge set converges cleanly to empty labels") {
    // sum over zero rows is SQL NULL: a corpus with no duplicate pairs
    // (a normal production case) must return empty labels, not NPE on
    // the convergence check.
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.connectedComponents(none, "a", "b").count() === 0L)
    assert(Graph.connectedComponentsStar(none, "a", "b").count() === 0L)
    assert(Graph.dedupClusters(none, "a", "b").count() === 0L)
  }

  test("pageRank: hand-computed integer fixed point on a 3-node cycle + sink") {
    // Graph: 1→2, 1→3, 2→3, 3→1 plus dangling sink 2→4.
    // q=20, base=2^20=1048576, tele=(3*2^20) DIV 20 = 157286.
    // Out-degrees: 1→{2,3} od=2, 2→{3,4} od=2, 3→{1} od=1.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L))
      .toDF("src", "dst")
    val base = 1L << 20
    val tele = (3L * base) / 20L
    // Iteration 1 by hand (all ranks start at base):
    //   send: 1→524288 each to 2,3; 2→524288 each to 3,4; 3→1048576 to 1.
    //   r1(1)=tele+(17*1048576)/20 ; r1(2)=tele+(17*524288)/20
    //   r1(3)=tele+(17*(524288+524288))/20 ; r1(4)=tele+(17*524288)/20
    def it(m: Long): Long = tele + (17L * m) / 20L
    val exp1 = Map(
      1L -> it(base), 2L -> it(base / 2), 3L -> it(base), 4L -> it(base / 2))
    val got1 = Graph.pageRank(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got1 === exp1)
    // Iteration 2 from r1 (floor-div at every step, like the engine).
    val exp2 = Map(
      1L -> it(exp1(3L)),
      2L -> it(exp1(1L) / 2),
      3L -> it(exp1(1L) / 2 + exp1(2L) / 2),
      4L -> it(exp1(2L) / 2))
    val got2 = Graph.pageRank(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got2 === exp2)
    // The cycle hub (3: two in-edges) outranks the sink (4: one in-edge
    // from a split sender) after convergence-ish iterations.
    val got5 = Graph.pageRank(edges, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got5(3L) > got5(4L) && got5(1L) > got5(4L))
  }

  test("triangleCount: K4 + square + pendant, duplicate/reversed edges collapse") {
    // K4 on {1,2,3,4} → 4 triangles; square {10,11,12,13} → 0; pendant 5–1.
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val noisy = k4.map { case (a, b) => (b, a) } ++ // reversed duplicates
      Seq((1L, 1L)) // self loop dropped
    val edges = (k4 ++ square ++ noisy ++ Seq((5L, 1L))).toDF("src", "dst")
    val got = Graph.triangleCount(edges, "src", "dst")
      .as[(Long, Long, Long)].collect().head
    assert(got === ((9L, 11L, 4L))) // 9 vertices, 6+4+1 canonical edges
  }

  test("kCore peels to the exact fixpoint; cascading removals included") {
    // K4 {1,2,3,4} + a tail 4–5–6 + a triangle {10,11,12} hanging off 1.
    // k=3: the triangle's members have degree 2 once examined inside the
    // candidate subgraph — first peel drops 5, 6 and (after 10's bridge
    // edge to 1 survives round 1) the cascade must ALSO drop the
    // triangle: {10,11,12} have degree 3 only counting the bridge and
    // each other... hand-check: degrees in full graph: 1:4 (k4+bridge),
    // 2:3, 3:3, 4:4 (k4+tail), 5:2, 6:1, 10:3 (11,12,1), 11:2, 12:2.
    // Round 1 keeps {1,2,3,4,10}; edges among them: K4 + (1,10).
    // Round 2: 10 has degree 1 -> dropped; K4 stable at degree 3 each.
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val extra = Seq((4L, 5L), (5L, 6L), (1L, 10L), (10L, 11L), (10L, 12L),
      (11L, 12L))
    val edges = (k4 ++ extra).toDF("src", "dst")
    val got = Graph.kCore(edges, "src", "dst", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the densest core: empty result, still converges.
    assert(Graph.kCore(edges, "src", "dst", k = 4).count() === 0L)
    // k=1 drops only isolated-after-dedup structure: all 9 vertices stay.
    assert(Graph.kCore(edges, "src", "dst", k = 1).count() === 9L)
  }

  test("kTruss peels bridges a degree test keeps; cascade and supports exact") {
    // K5 {1..5} + a bridge edge (1,10) into a triangle pair
    // {10,11,12},{10,12,13} sharing edge (10,12).
    // 4-truss (support >= 2): K5 edges each close 3 triangles -> all 10
    // survive. The shared edge (10,12) has support 2 BUT its supporting
    // triangles' OTHER edges have support 1 and drop in round 1 — the
    // cascade must then drop (10,12) too: final 4-truss = K5 exactly.
    // Contrast with kCore: every vertex in the triangle blob has degree
    // >= 2, so the 3-core keeps... (hand: 3-core drops 11,13 (deg 2),
    // then 10,12 fall below 3) — the case where the two DO agree; the
    // discriminating case is the 3-truss below, which keeps the blob the
    // 4-truss dropped, proving truss grading is support-, not
    // degree-based.
    val k5 = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val blob = Seq((1L, 10L), (10L, 11L), (11L, 12L), (10L, 12L),
      (12L, 13L), (10L, 13L))
    val edges = (k5 ++ blob).toDF("src", "dst")
    val got4 = Graph.kTruss(edges, "src", "dst", k = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got4.map(e => (e._1, e._2)) === k5.toSet)
    assert(got4.forall(_._3 === 3L), "every K5 edge closes 3 triangles")
    // 3-truss (support >= 1): the triangle blob survives (each blob
    // triangle edge closes >= 1), the bridge (1,10) closes none -> drops.
    val got3 = Graph.kTruss(edges, "src", "dst", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got3.map(e => (e._1, e._2)) ===
      k5.toSet ++ Set((10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L),
        (10L, 13L)))
    assert(got3.find(e => (e._1, e._2) == (10L, 12L)).get._3 === 2L)
    // Above the densest truss: empty, still converges.
    assert(Graph.kTruss(edges, "src", "dst", k = 6).count() === 0L)
  }

  test("labelPropagation: two bridged triangles separate; deterministic") {
    // Triangles {1,2,3} and {4,5,6} with bridge 3–4. Hand-unrolled
    // 4 synchronous min-tie-break rounds: left community converges to
    // label 1, right to label 3 (the bridge pulls 4's label leftward for
    // one round, then the right triangle's majority re-asserts).
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // Reversed/duplicate edges and repartitioning change nothing.
    val noisy = edges.unionByName(Seq((2L, 1L), (3L, 2L), (4L, 3L))
      .toDF("src", "dst")).repartition(7)
    val again = Graph.labelPropagation(noisy, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(again === got)
  }

  test("dedupClusters marks the min id of each cluster canonical") {
    val pairs = Seq((2L, 9L), (9L, 4L), (30L, 31L)).toDF("id_a", "id_b")
    val got = Graph.dedupClusters(pairs, "id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set(
      (2L, 2L, 1), (4L, 2L, 0), (9L, 2L, 0),
      (30L, 30L, 1), (31L, 30L, 0)))
  }

  test("hits: hand-computed two max-normalized rounds") {
    // E = {1→3, 2→3, 2→4}, B = 2^20.
    // r1: rawA = (3: 2B, 4: B), max 2B → a = (3: B, 4: B/2);
    //     rawH = (1: B, 2: 3B/2) → h = (1: 2^40//(3·2^19) = 699050, 2: B).
    // r2: rawA = (3: 1747626, 4: B) → a = (3: B, 4: 2^40//1747626 = 629145);
    //     rawH = (1: B, 2: 1677721) → h = (1: 2^40//1677721 = 655360, 2: B).
    // Sinks/sources score 0 on the side they lack edges for.
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.hits(e, "src", "dst", iters = 2)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 655360L, 0L), (2L, 1048576L, 0L),
      (3L, 0L, 1048576L), (4L, 0L, 629145L)))
  }

  test("bfsDistances: hop distances, nearest-seed attribution, tie to min seed") {
    // Path 1-2-3-4-5 with seeds {1, 5}: node 3 is 2 hops from BOTH seeds
    // -> seed 1 by min-id tie-break; 2 and 4 attribute to their adjacent
    // seed. Node 9 is disconnected and must be absent.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
      .toDF("src", "dst")
    val got = Graph.bfsDistances(e, "src", "dst", seeds = Seq(1L, 5L))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 1L), (2L, 1L, 1L), (3L, 2L, 1L), (4L, 1L, 5L), (5L, 0L, 5L)))
  }

  test("bfsDistances: maxHops truncates, directed follows edge direction") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val trunc = Graph.bfsDistances(e, "src", "dst", seeds = Seq(1L),
      maxHops = 1).as[(Long, Long, Long)].collect().toSet
    assert(trunc === Set((1L, 0L, 1L), (2L, 1L, 1L)))
    // Directed: 4 is reachable from 1 but 1 gets nothing back from 4.
    val fwd = Graph.bfsDistances(e, "src", "dst", seeds = Seq(4L),
      directed = true).as[(Long, Long, Long)].collect().toSet
    assert(fwd === Set((4L, 0L, 4L)))
    val bwd = Graph.bfsDistances(e, "src", "dst", seeds = Seq(1L),
      directed = true).as[(Long, Long, Long)].collect().toSet
    assert(bwd === Set((1L, 0L, 1L), (2L, 1L, 1L), (3L, 2L, 1L), (4L, 3L, 1L)))
  }

  test("bfsDistances: seeds absent from the graph yield an empty result") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    assert(Graph.bfsDistances(e, "src", "dst", seeds = Seq(99L)).count() === 0L)
  }

  test("weightedPageRank: hand one-iteration fixed point; constant weights = uniform") {
    // Edges 1→2 (w1), 1→3 (w3), 2→1 (w1), 3→1 (w1); qBits 4 (base 16,
    // tele (3·16)/20 = 2), 1 iter:
    //   sends: 1→2 ⌊16·1/4⌋=4, 1→3 ⌊16·3/4⌋=12, 2→1 16, 3→1 16
    //   r1 = tele + ⌊17·m/20⌋: 1→ 2+27=29, 2→ 2+3=5, 3→ 2+10=12.
    val e = Seq((1L, 2L, 1L), (1L, 3L, 3L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.weightedPageRank(e, "src", "dst", "w", iters = 1,
        qBits = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 29L, 2L -> 5L, 3L -> 12L))
    // Constant weights are EXACTLY the uniform split: ⌊r·c/(c·od)⌋ = ⌊r/od⌋.
    val e7 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val uni = Graph.pageRank(e7, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val cst = Graph.weightedPageRank(
        e7.withColumn("w", org.apache.spark.sql.functions.lit(7L)),
        "src", "dst", "w", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(cst === uni)
    // Non-positive edges drop: w=0 edge behaves as absent.
    val withZero = Seq((1L, 2L, 1L), (1L, 3L, 0L), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    val noZero = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val a = Graph.weightedPageRank(withZero, "src", "dst", "w", iters = 2)
      .as[(Long, Long)].collect().toMap
    val b = Graph.weightedPageRank(noZero, "src", "dst", "w", iters = 2)
      .as[(Long, Long)].collect().toMap
    // node 3 only appeared via the zero edge -> absent entirely.
    assert(a === b)
  }

  test("scc: two cycles joined by a one-way bridge stay separate components") {
    // 1→2→3→1 and 4→5→6→4 with bridge 3→4: the bridge is not mutual, so
    // the SCCs are {1,2,3} and {4,5,6}. The SYMMETRIC cc would merge them.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L)).toDF("src", "dst")
    val got = Graph.stronglyConnectedComponents(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    val cc = Graph.connectedComponents(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet === Set(1L)) // the undirected view merges
  }

  test("scc: DAG nodes are singletons; figure-8 through a shared node is one") {
    val dag = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.stronglyConnectedComponents(dag, "src", "dst")
      .as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val fig8 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    assert(Graph.stronglyConnectedComponents(fig8, "src", "dst")
      .as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("scc: trim settles pure DAGs in one phase") {
    // A 5-chain is all singleton SCCs: the trim step peels it without any
    // coloring phase exhausting — maxPhases = 1 suffices where the
    // untrimmed coloring would need 5.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.stronglyConnectedComponents(chain, "src", "dst",
        maxPhases = 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("scc: phase exhaustion is loud under strict, fallback warns otherwise") {
    // A chain of 2-cycles resists trim (every node sits on a cycle) and
    // the coloring settles ONE cycle per phase: 3 cycles need 3 phases.
    val cycles = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 6L),
      (6L, 5L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.stronglyConnectedComponents(cycles, "src", "dst", maxPhases = 1)
    }
    val full = Graph.stronglyConnectedComponents(cycles, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(full === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 5L))
    // Non-strict exhaustion: the settled prefix is right, the remainder
    // falls back to singleton labels (documented approximation).
    val part = Graph.stronglyConnectedComponents(cycles, "src", "dst",
        maxPhases = 1, strict = false)
      .as[(Long, Long)].collect().toMap
    assert(part(1L) === 1L && part(2L) === 1L)
    assert(part.keySet === full.keySet)
  }

  test("adamicAdar: hand weights, edge exclusion, hub cap") {
    // Path 1-2-3: only non-edge pair is (1,3) through center 2 (deg 2)
    // → aa = round(1e6/ln 2) = 1442695.
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = Graph.adamicAdar(path, "a", "b").collect()
    assert(p.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq((1L, 3L, 1L, 1442695L)))
    // Star 0-{1,2,3}: three leaf pairs through the deg-3 center,
    // each round(1e6/ln 3) = 910239; ordered (score desc, u, v).
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val s = Graph.adamicAdar(star, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(s === Seq((1L, 2L, 910239L), (1L, 3L, 910239L),
      (2L, 3L, 910239L)))
    // Hub cap: maxDegree = 2 drops the deg-3 center → no candidates.
    assert(Graph.adamicAdar(star, "a", "b", maxDegree = 2).count() === 0L)
    // Triangle: every common-neighbor pair is already an edge → empty.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.adamicAdar(tri, "a", "b").count() === 0L)
  }

  test("degreeAssortativity: hand anti-correlated star, degenerate constant") {
    // Star 0-{1,2,3}: every edge instance pairs deg 3 with deg 1 →
    // perfect anti-correlation, signed r² = −10⁶ over 2|E| = 6 endpoints.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = Graph.degreeAssortativity(star, "a", "b").collect().head
    assert((r.getAs[Long]("n_endpoints"),
      r.getAs[Long]("assort_r2_ppm")) === ((6L, -1000000L)))
    // Regular graph (two disjoint edges): constant degree → 0 by the
    // pearsonCorr zero-variance convention.
    val reg = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    assert(Graph.degreeAssortativity(reg, "a", "b")
      .collect().head.getAs[Long]("assort_r2_ppm") === 0L)
  }
}
