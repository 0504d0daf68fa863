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
    * materialized. The fixpoint check is FUSED into the label update: the
    * update select also emits a per-row `chg` flag (did this node's label
    * shrink?), so observing convergence is a 1-row sum over the round's
    * freshly persisted rows — no join against the previous labels, no
    * second shuffle. For graphs with genuinely large diameters switch to
    * the O(log n)-round alternating-star algorithm (Kiveris et al.
    * 2014) — duplicate clustering never needs it.
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
      .withColumn("chg", lit(1))
    val labelSchema = init.schema
    var labelsRdd = init.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    var labels = spark.createDataFrame(labelsRdd, labelSchema)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // Each neighbor offers its current label; a node keeps the min of its
      // own and all offers. The same select computes the round's `chg`
      // flag (label strictly shrank), so convergence is observable from
      // the new snapshot alone.
      val offers = adj.join(labels, adj("v") === labels("id"))
        .select(col("u").as("id"), col("comp").as("offer"))
        .groupBy("id").agg(min(col("offer")).as("offer"))
      val nextRdd = labels.join(offers, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("offer"), col("comp"))).as("comp"),
          (coalesce(col("offer"), col("comp")) < col("comp"))
            .cast("int").as("chg"))
        .rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val next = spark.createDataFrame(nextRdd, labelSchema)
      // One full-scan job: materializes the persist for the next round AND
      // totals the changed flags — a 1-row partial-aggregate, no shuffle
      // join against the previous labels. (A limit(1) early-exit would be
      // cheaper on non-final rounds but would leave unscanned partitions
      // uncached, forcing a lineage recompute next round.)
      // coalesce: sum over zero rows is SQL NULL — an empty edge set (no
      // duplicate pairs at all) must converge cleanly, not NPE.
      val changed =
        next.agg(coalesce(sum(col("chg")), lit(0L))).first().getLong(0)
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
    labels.select(col("id"), col("comp"))
  }

  /** Connected components in O(log n) ROUNDS by alternating large-star /
    * small-star operations (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC 2014) — the scale path for graphs whose
    * diameter makes per-round min-label propagation
    * ([[connectedComponents]]) too slow: a diameter-D chain needs D
    * label-propagation rounds but only ~log D alternation rounds.
    *
    * Each operation is expressed as one aggregation + one join on ids only
    * (no adjacency lists are ever collected — a high-degree node's
    * neighborhood stays distributed):
    *   - large-star, per node u: every neighbor v > u re-attaches to
    *     m = min(Γ(u) ∪ {u});
    *   - small-star, per node u over its smaller neighbors N: every
    *     v ∈ N ∪ {u} re-attaches to min(N).
    * Both preserve connectivity and strictly flatten trees toward stars;
    * at the fixpoint every component is a star centered on its minimum id.
    * Labels round-trip through a persisted row RDD each iteration (leaf
    * plan, eager unpersist of the previous round) exactly like
    * [[connectedComponents]].
    *
    * @return (id, comp) for every node in `edges`; comp = min reachable id.
    */
  def connectedComponentsStar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val nodes = edges.select(col(srcCol).as("id"))
      .unionByName(edges.select(col(dstCol).as("id"))).distinct()
    // Working edge set (a, b), kept distinct; after the first small-star
    // every edge points big → small, i.e. b < a. Seeded from the SYMMETRIC
    // union (the graph is undirected, so this is the same edge set): the
    // union also type-widens mixed src/dst column types, so the schema
    // captured here matches every later round's rows — a schema captured
    // from the one-sided projection would declare the narrow type and
    // crash createDataFrame on the widened values.
    val init = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b")).distinct()
    val edgeSchema = init.schema
    var curRdd = init.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    var cur = spark.createDataFrame(curRdd, edgeSchema)
    var curCnt = -1L // lazily counted on the first round
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // Large-star over the symmetric view: m(u) = min(Γ(u) ∪ {u});
      // emit (v, m(u)) for v ∈ Γ(u), v > u.
      val sym = cur.unionByName(cur.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a")
        .agg(min(col("b")).as("__mn"))
        .select(col("a"), least(col("a"), col("__mn")).as("__m"))
      val ls = sym.join(mins, "a")
        .where(col("b") > col("a"))
        .select(col("b").as("a"), col("__m").as("b"))
        .where(col("a") =!= col("b")).distinct()
      // Small-star: edges now point big → small; per big endpoint u with
      // smaller neighbors N, emit (v, min(N)) for v ∈ N ∪ {u}, v ≠ min(N).
      val mins2 = ls.groupBy("a").agg(min(col("b")).as("__m"))
      val ss = ls.join(mins2, "a")
        .where(col("b") =!= col("__m"))
        .select(col("b").as("a"), col("__m").as("b"))
        .unionByName(mins2.select(col("a"), col("__m").as("b")))
        .distinct()
      val nextRdd = ss.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val next = spark.createDataFrame(nextRdd, edgeSchema)
      // Fixpoint test in two tiers: counts first (a cached-RDD count — both
      // sets are distinct, so different sizes can't be equal), and only on
      // a size match the real symmetric difference. Non-final rounds almost
      // always change the edge count, so the expensive diff runs ~once.
      if (curCnt < 0) curCnt = curRdd.count()
      val nextCnt = nextRdd.count()
      val changed = if (nextCnt != curCnt) 1L
        else next.unionByName(cur).groupBy("a", "b")
          .agg(count(lit(1)).as("__n")).where(col("__n") === 1)
          .limit(1).count()
      curRdd.unpersist(blocking = false)
      curRdd = nextRdd
      cur = next
      curCnt = nextCnt
      converged = changed == 0L
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxIter rounds " +
          "(expected O(log n)); the edge set is still changing.")
    // At the fixpoint `cur` is a star forest (node → center). Nodes absent
    // from the a-side are centers or isolated — they label themselves.
    // The result stays backed by the final round's persisted RDD; once the
    // caller drops the returned DataFrame, Spark's ContextCleaner
    // unpersists the now-unreachable blocks (same lifecycle as
    // [[connectedComponents]]' final labels).
    nodes.join(cur.select(col("a").as("id"), col("b").as("__c")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("__c"), col("id")).as("comp"))
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

  /** PageRank in FIXED-POINT integer arithmetic — the link-centrality
    * quality signal a web-corpus curation stack weighs documents by
    * (harmonic/centrality-ranked crawl selection), computed so that any
    * engine replaying the policy reproduces every rank bit-for-bit (the
    * [[graft.ops.Curation.linearProbe]] discipline applied to graphs).
    *
    * Ranks live in 2^`qBits` scale. Per iteration, with damping d =
    * `dampNum`/`dampDen` (default 17/20 = 0.85):
    *
    *   send(u)  = r(u) DIV outdeg(u)                 (exact floor div)
    *   r'(v)    = tele + (dampNum · Σ_{u→v} send(u)) DIV dampDen
    *   tele     = ((dampDen − dampNum) · 2^qBits) DIV dampDen
    *
    * Every quantity is a positive int64 — floor division and integer sums
    * are order-independent and engine-identical (no doubles anywhere).
    * Overflow headroom: Σ send ≤ n·2^qBits, int64-safe past 10⁹ nodes at
    * the default qBits = 20. Dangling-node mass (no out-edges) evaporates
    * — the standard unnormalized simplification; ranks are comparative
    * signals, not probabilities, in this form.
    *
    * Scale shape: out-degrees are ONE count aggregation; each iteration is
    * one edge-keyed join (ranks × edges, AQE-broadcast when ranks fit) and
    * one map-side-combined sum by destination; ranks round-trip through a
    * persisted row RDD per round (leaf plan, eager unpersist — the
    * [[connectedComponents]] lifecycle), so the logical plan stays
    * constant-size across iterations.
    *
    * @return (id, rank) for every node appearing in `edges`, rank in
    *         2^qBits fixed-point scale.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      dampNum: Long = 17L,
      dampDen: Long = 20L,
      qBits: Int = 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    require(qBits >= 1 && qBits <= 30, s"qBits must be in [1, 30], got $qBits")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__od"))
    val base = 1L << qBits
    val tele = ((dampDen - dampNum) * base) / dampDen
    var ranks = nodes.withColumn("rank", lit(base))
    val rankSchema = ranks.schema
    var ranksRdd = ranks.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    ranks = spark.createDataFrame(ranksRdd, rankSchema)
    var it = 0
    while (it < iters) {
      val mass = e
        .join(outdeg, Seq("src"))
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .select(col("dst").as("id"),
          expr("rank DIV __od").as("__send"))
        .groupBy("id").agg(sum(col("__send")).as("__m"))
      val nextRdd = nodes
        .join(mass, Seq("id"), "left")
        .select(col("id"),
          (lit(tele) + expr(s"($dampNum * coalesce(__m, 0L)) DIV $dampDen"))
            .as("rank"))
        .rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val next = spark.createDataFrame(nextRdd, rankSchema)
      next.count() // materialize before dropping the parent snapshot
      ranksRdd.unpersist(blocking = false)
      ranksRdd = nextRdd
      ranks = next
      it += 1
    }
    e.unpersist(blocking = false)
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999) in fixed-point integer
    * arithmetic — the directed-graph dual of [[pageRank]]: a page is a
    * good AUTHORITY if good hubs point at it, a good HUB if it points at
    * good authorities. On a link corpus this separates directory/index
    * pages (hubs) from canonical content (authorities) — a different
    * curation signal than PageRank's single centrality, and the classic
    * one for picking seed lists.
    *
    * Per round (Kleinberg's order: authorities from previous hubs, then
    * hubs from the NEW authorities), with scores in 2^`qBits` scale:
    *
    *   rawA(v) = Σ_{u→v} h(u)      a(v) = (rawA(v) · 2^qBits) DIV max rawA
    *   rawH(u) = Σ_{u→v} a(v)      h(u) = (rawH(u) · 2^qBits) DIV max rawH
    *
    * Max-normalization replaces the usual L2 norm so every quantity stays
    * an exact integer: the argmax lands exactly on 2^qBits each round, the
    * normalize multiply runs in DECIMAL(38,0) (raw · 2^qBits overflows
    * int64 once degree exceeds 2^(63−2·qBits); decimal lifts the ceiling
    * past any real graph), and non-negative truncating division is floor —
    * engine-independent, so a SQL oracle replays every bit. Nodes with no
    * in-edges (resp. out-edges) score authority (resp. hub) 0.
    *
    * Scale shape: each half-step is one edge-keyed join + one map-side-
    * combined sum + a 1-row broadcast max — id-and-score rows only, the
    * [[pageRank]] wire discipline; scores round-trip through a persisted
    * row RDD per half-step (leaf plan, eager unpersist) so the logical
    * plan stays constant-size across rounds.
    *
    * @return (id, hub, auth) for every node in `edges`, both in 2^qBits
    *         fixed-point scale.
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      qBits: Int = 20): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1, 16], got $iters")
    require(qBits >= 1 && qBits <= 30, s"qBits must be in [1, 30], got $qBits")
    val spark = edges.sparkSession
    val dec = "decimal(38,0)"
    val base = 1L << qBits
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // One normalized half-step: raw(id) = Σ over `joinKey`-matched edges of
    // the counterpart score, then (raw · base) DIV max(raw), 0 for absent.
    def halfStep(scores: DataFrame, scoreName: String,
        edgeKeyIn: String, edgeKeyOut: String, outName: String): DataFrame = {
      val raw = e
        .join(scores.select(col("id").as(edgeKeyIn), col(scoreName)), Seq(edgeKeyIn))
        .groupBy(col(edgeKeyOut).as("id"))
        .agg(sum(col(scoreName)).as("__raw"))
      val mx = raw.agg(max(col("__raw")).as("__mx"))
      nodes.join(raw, Seq("id"), "left").crossJoin(broadcast(mx))
        .select(col("id"),
          (col("__raw").cast(dec) * lit(base).cast(dec)).as("__num"),
          col("__mx").cast(dec).as("__den"))
        .select(col("id"),
          coalesce(expr("__num DIV __den").cast("long"), lit(0L)).as(outName))
    }
    var live = List.empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def snapshot(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val out = spark.createDataFrame(rdd, df.schema)
      out.count()
      live = rdd :: live
      out
    }
    // Superseded snapshots (everything but the latest hub/auth pair) are
    // released once the round that replaced them has materialized.
    def reap(): Unit = {
      live.drop(2).foreach(_.unpersist(blocking = false))
      live = live.take(2)
    }

    // One snapshot per ROUND, not per half-step: within a round the chain
    // hubs → auth → hub references each stage once, so the lazy plan stays
    // linear; only the round boundary needs a materialized leaf (the final
    // round also pins the auth side, which the output joins).
    var hubs = snapshot(nodes.withColumn("hub", lit(base)))
    var auths: DataFrame = null
    var it = 0
    while (it < iters) {
      val nextA = halfStep(hubs, "hub", "src", "dst", "auth")
      val lastRound = it == iters - 1
      val aSnap = if (lastRound) snapshot(nextA) else nextA
      val nextH = snapshot(halfStep(aSnap, "auth", "dst", "src", "hub"))
      hubs = nextH
      auths = aSnap
      reap()
      it += 1
    }
    val out = hubs.join(auths, Seq("id"))
    e.unpersist(blocking = false)
    out
  }

  /** Global triangle census — the structural summary (clustering mass) of
    * a similarity/link graph that separates near-clique dup families from
    * sparse organic linkage. Counting is the oriented-wedge-join
    * formulation (Suri & Vassilvitskii, WWW 2011): orient every canonical
    * undirected edge from its lower (degree, id) endpoint to the higher —
    * a DAG in which each triangle has exactly one (source, middle, sink)
    * realization, so `wedge ⋈ closing-edge` counts each triangle ONCE.
    * The orientation is the scale bound: oriented out-degree is O(√m) for
    * ANY graph, so the wedge join's volume is Σ outdeg² ≤ m^1.5 — a hub
    * vertex of degree 10⁶ contributes √m wedges instead of the 10¹² a
    * naive neighbor self-join would generate. Shuffles: degree agg, the
    * two equi-joins, and 1-row final aggregates — all on id pairs, never
    * payloads.
    *
    * Output (one row): n_vertices, n_edges (canonical distinct),
    * n_triangles. The count is orientation-invariant, so a SQL oracle
    * replays it with the simpler id-ordered 3-way join.
    */
  /** k-core of an undirected graph: the maximal subgraph in which every
    * vertex keeps degree ≥ k — the standard density filter for web/link
    * spam (low-core pages are the periphery; link farms concentrate in
    * high cores) and for picking well-connected dedup families. Computed
    * by the classic peeling fixpoint: drop vertices with degree < k,
    * recompute degrees, repeat. The loop is a DRIVER loop over edge
    * DataFrames with a convergence count per round — each round is one
    * degree aggregation + one semi-join, all keyed by vertex id, so a
    * round costs two compact shuffles regardless of graph size, and the
    * round count is the peel DEPTH — small on real web/link graphs
    * (hubs-and-spokes peel in a handful of rounds), but adversarially
    * linear on chain-shaped graphs (a path at k = 2 sheds only its two
    * endpoints per round), which is why the bound is explicit: reaching
    * `maxRounds` without convergence THROWS rather than return a
    * partial peel that silently violates the degree-≥-k contract (a
    * graph that deep is chain-shaped and wants the sequential
    * bucket-peel algorithm, not a data-parallel fixpoint).
    *
    * Output: (vertex, degree) for every k-core member, degree measured
    * IN the core.
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 128): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Each round is eagerly localCheckpoint'd: the peel REFERENCES the
    // previous round three times (twice in the degree union, once in the
    // semi filter), so a persist-only loop still grows the LOGICAL plan
    // 3× per round — on a sparse graph whose peel runs tens of rounds the
    // 3^rounds tree OOM'd the driver in plan stringification before any
    // data moved. Checkpointing truncates lineage to the materialized
    // blocks (plan size constant per round); superseded rounds become
    // unreachable after `e = next` and the ContextCleaner reclaims them.
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
      .localCheckpoint(true)
    def degrees(ed: DataFrame): DataFrame = ed
      .select(col("u").as("x")).unionByName(ed.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    var converged = false
    var round = 0
    var prevCount = e.count()
    while (!converged && round < maxRounds) {
      val keep = degrees(e).where(col("d") >= k).select("x")
      val next = e
        .join(keep.select(col("x").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("x").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(true)
      val nextCount = next.count()
      converged = nextCount == prevCount
      e = next
      prevCount = nextCount
      round += 1
    }
    require(converged, s"kCore did not converge in $maxRounds rounds")
    // The final checkpoint backs the returned frame. The core itself
    // stays DISTRIBUTED — on a web graph it is most of the graph.
    degrees(e).select(col("x").as("vertex"), col("d").as("degree"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) made
    * deterministic: each round every vertex adopts the label occurring
    * most often among its neighbors, ties breaking to the SMALLEST
    * label — the choice that makes fixed-round LPA a pure function of
    * the edge set (GraphX's LPA breaks frequency ties by hash-map
    * iteration order and is not replayable). Runs exactly `rounds`
    * synchronous sweeps: per-round determinism plus a fixed budget is
    * the standard guard against LPA's 2-cycle oscillation, and it is
    * what lets an oracle unroll the recursion.
    *
    * Scale shape: the undirected edge set expands BOTH directions once
    * into a persisted (x, nbr) adjacency table, so each round is ONE
    * nbr-keyed join (message rows are two longs) plus two map-side-
    * combined aggregations — (vertex, label) counts and the per-vertex
    * argmax in its aggregate form max(struct(cnt, −label)) (never a
    * window over the message table). Each round persists its |V|-row
    * label table, materializes it, and unpersists the previous one, so
    * at most two label snapshots exist and the plan stays
    * constant-size.
    *
    * @return (vertex, label) for every vertex in `edges`; vertices
    *         sharing a label form one community.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
    val adj = e.select(col("u").as("x"), col("v").as("nbr"))
      .unionByName(e.select(col("v").as("x"), col("u").as("nbr")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = adj.select(col("x"))
      .distinct()
      .select(col("x"), col("x").as("lab"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    (1 to rounds).foreach { _ =>
      val msgs = adj
        .join(labels.select(col("x").as("nbr"), col("lab")), Seq("nbr"))
        .select(col("x"), col("lab"))
      val next = msgs
        .groupBy(col("x"), col("lab")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("x"))
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
        .select(col("x"), (-col("m.nl")).as("lab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      labels.unpersist(blocking = false)
      labels = next
    }
    adj.unpersist(blocking = false)
    // The final persist backs the returned frame; the ContextCleaner
    // reclaims it when the caller's result becomes unreachable (the
    // kCore convention).
    labels.select(col("x").as("vertex"), col("lab").as("label"))
  }

  def triangleCount(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e0.select(col("u").as("x"))
      .unionByName(e0.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val oriented = e0
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b")))
          .as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"))
    val tri = oriented.as("ab")
      .join(oriented.as("bc"), col("ab.b") === col("bc.a"))
      .join(oriented.as("ac"),
        col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .count()
    val Array(nv, ne) = Array(
      deg.count(),
      e0.count())
    e0.unpersist(blocking = false)
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nv, ne, tri)).toDF("n_vertices", "n_edges", "n_triangles")
  }
}
