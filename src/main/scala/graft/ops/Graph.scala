package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph helpers for dedup clustering: the pair-finding
  * operators ([[Dedup.dupePairs]], [[Dedup.minhashDupePairs]], …) emit
  * EDGES; turning them into keep/drop decisions needs the connected
  * components (each component = one duplicate cluster, canonical doc = min
  * id — or any policy applied per component).
  */
object Graph {

  /** Default |V| gate for [[withTinyFrameConf]] / the hits broadcast path:
    * 16 B/row score tables stay ≤ ~64 MB below it.
    */
  val TinyFrameMaxNodes: Long = 4000000L

  /** Small-graph fast path for an EAGER iterative loop: per-round frames
    * are |V| rows, but every materialization job otherwise runs the
    * session's shuffle-partition count of reduce tasks plus an AQE replan
    * per stage — pure scheduling latency at that size (measured ~250 ms
    * per 1.2k-row round at 32 partitions in [[hits]]; the fixed-latency
    * jobs dominated the operator, not the data). While `body` runs with
    * `enabled`, shuffle partitions pin to 2 and AQE is off; the session
    * conf is RESTORED before any lazy output plan compiles, so callers
    * and the big-graph path see unchanged settings. Driver-synchronous by
    * contract (the loops are driver loops); not safe under concurrent
    * query builds on the SAME session, which this library never does.
    */
  /** Loop width used by [[withTinyFrameConf]] and [[rightSized]]. */
  private[ops] val TinyFramePartitions = 2

  private[ops] def withTinyFrameConf[T](
      spark: org.apache.spark.sql.SparkSession, enabled: Boolean)(body: => T): T =
    if (!enabled) body
    else {
      val sp = spark.conf.getOption("spark.sql.shuffle.partitions")
      val aqe = spark.conf.getOption("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.shuffle.partitions",
        TinyFramePartitions.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try body
      finally {
        sp.foreach(spark.conf.set("spark.sql.shuffle.partitions", _))
        aqe.foreach(spark.conf.set("spark.sql.adaptive.enabled", _))
      }
    }

  /** Narrow a small-graph SETUP frame to the loop width. `persist` and
    * `localCheckpoint` materialize at the partitioning of the moment —
    * AQE partition coalescing applies to NEITHER — so a frame built
    * before the scoped conf (typically through the caller's `.distinct()`
    * at the session's raw shuffle-partition count) pins that many
    * near-empty partitions, and every loop stage over it schedules that
    * many tasks per round (measured: q_hits ran 374 tasks for a |V|=100
    * graph, 32 of them per half-step map stage). The coalesce is narrow
    * (no shuffle) and applies ONLY when the tiny-frame gate fired — big
    * graphs keep their natural partitioning, so the scale path is
    * untouched.
    */
  private[ops] def rightSized(df: DataFrame, small: Boolean): DataFrame =
    if (small) df.coalesce(TinyFramePartitions) else df

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
    * on ids only — no payload). Each round's labels are re-seated on an
    * eager `localCheckpoint` (the [[kCore]]/[[hits]] lifecycle): the
    * DataFrame becomes a LEAF plan, so the logical tree stays
    * constant-size across rounds (`labels` feeds two branches per round —
    * offers + next — and an unbroken plan would double every iteration,
    * blowing up planning around round 10), and superseded rounds become
    * unreachable for the ContextCleaner to reclaim. The lineage trade is
    * deliberate: an executor loss mid-loop fails the job and the caller
    * retries (the kCore contract) — measured, the Row↔InternalRow
    * round-trip of the `createDataFrame(df.rdd)` alternative cost more
    * per round than a rare whole-job retry ever amortizes. The fixpoint
    * check is FUSED into the label update: the update select also emits a
    * per-row `chg` flag (did this node's label shrink?), so observing
    * convergence is a trivial scan of the freshly checkpointed |V|-row
    * leaf — no join against the previous labels, no second shuffle. For
    * graphs with genuinely large diameters switch to the O(log n)-round
    * alternating-star algorithm (Kiveris et al. 2014) — duplicate
    * clustering never needs it.
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
      strict: Boolean = true,
      broadcastMaxNodes: Long = TinyFrameMaxNodes / 4): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
    val adj = sym.distinct().persist()
    var labels = adj.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
      .withColumn("chg", lit(1))
      .localCheckpoint(true)
    // Gate by ROW WIDTH, not the generic 16 B/row TinyFrameMaxNodes: the
    // labels side here is 3 columns (id, comp, chg) ≈ 24 B/row plus the
    // broadcast hash-relation overhead rebuilt every round, so the /4
    // default keeps the worst-case relation near the same ~64 MB budget
    // the 2-column operators size against. Callers can override.
    val small = labels.count() <= broadcastMaxNodes
    def side(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val adjW = rightSized(adj, small)
    labels = rightSized(labels, small)
    var converged = false
    withTinyFrameConf(spark, small) {
      var it = 0
      while (!converged && it < maxIter) {
        // Each neighbor offers its current label; a node keeps the min of
        // its own and all offers. The same select computes the round's
        // `chg` flag (label strictly shrank), so convergence is observable
        // from the new snapshot alone. The eager localCheckpoint is the
        // round's one materialization (leaf plan, constant plan size,
        // superseded rounds reclaimed by the ContextCleaner); the
        // convergence total is then a trivial scan of the |V|-row leaf.
        val offers = adjW.join(side(labels), adjW("v") === labels("id"))
          .select(col("u").as("id"), col("comp").as("offer"))
          .groupBy("id").agg(min(col("offer")).as("offer"))
        labels = labels.join(side(offers), Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("offer"), col("comp"))).as("comp"),
            (coalesce(col("offer"), col("comp")) < col("comp"))
              .cast("int").as("chg"))
          .localCheckpoint(true)
        // coalesce: sum over zero rows is SQL NULL — an empty edge set (no
        // duplicate pairs at all) must converge cleanly, not NPE.
        val changed =
          labels.agg(coalesce(sum(col("chg")), lit(0L))).first().getLong(0)
        converged = changed == 0L
        it += 1
      }
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
    // The first-round fixpoint test needed this count anyway (see below);
    // paying it up front additionally gates the tiny-frame loop conf, so
    // a small graph's alternation rounds run at the loop width instead of
    // the session's raw shuffle-partition count (the [[connectedComponents]]
    // machinery rationale — `.rdd` materialization bypasses AQE).
    var curCnt = curRdd.count()
    val small = curCnt <= TinyFrameMaxNodes / 4
    var converged = false
    withTinyFrameConf(spark, small) {
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
    * Scale shape: out-degrees join the edge set ONCE into a checkpointed
    * (src, dst, outdeg) table (same storage footprint as caching the raw
    * edges — it replaces it); each iteration is then one edge-keyed join
    * plus one map-side-combined sum by destination, whose |V|-row MASS
    * aggregate is the round's single eager `localCheckpoint` (leaf plan,
    * constant plan size, superseded rounds reclaimed by the
    * ContextCleaner — the [[hits]] lifecycle). The rank update itself is
    * a lazy projection over two leaves; nothing else materializes. Below
    * [[TinyFrameMaxNodes]] the rank/mass side of every join broadcasts
    * and the loop runs under [[withTinyFrameConf]] — the fixed job
    * latency, not the data, is the cost of a small iterative graph.
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
    val base = 1L << qBits
    val tele = ((dampDen - dampNum) * base) / dampDen
    prLoop(edges, srcCol, dstCol, iters, dampNum, dampDen, qBits,
      init = lit(base), teleOf = lit(tele))
  }

  /** Personalized PageRank (Haveliwala, WWW 2002) — the seed-expansion
    * primitive for curation: rank every node by proximity to a TRUSTED
    * seed set ("find pages/documents like these"), the standard way a
    * small vetted list bootstraps a domain allowlist or a topic slice.
    * Identical integer fixed-point discipline to [[pageRank]]; the only
    * change is WHERE teleport mass lands — on the seeds, not uniformly:
    *
    *   r₀(v)  = 2^qBits · 1[v ∈ S]
    *   r'(v)  = tele · 1[v ∈ S] + (dampNum · Σ_{u→v} r(u) DIV od(u)) DIV dampDen
    *
    * so rank mass drains everywhere except the seed wells and the
    * steady state concentrates around them. Seeds are a DRIVER literal
    * (the classic usage is a handful of trusted ids), so the indicator
    * compiles to an `isin` predicate inside the rank projection — no
    * join, no broadcast, nothing new on the wire; the scale shape is
    * exactly [[pageRank]]'s.
    *
    * @return (id, rank) for every node in `edges`; non-seed nodes
    *         unreachable from any seed rank 0.
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: Seq[Long],
      iters: Int = 3,
      dampNum: Long = 17L,
      dampDen: Long = 20L,
      qBits: Int = 20): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    require(seeds.length <= 10000,
      s"seeds are a driver-literal set - got ${seeds.length}, cap is 10000")
    val base = 1L << qBits
    val tele = ((dampDen - dampNum) * base) / dampDen
    val isSeed = col("id").isin(seeds: _*)
    prLoop(edges, srcCol, dstCol, iters, dampNum, dampDen, qBits,
      init = when(isSeed, lit(base)).otherwise(lit(0L)),
      teleOf = when(isSeed, lit(tele)).otherwise(lit(0L)))
  }

  /** Shared fixed-point power-iteration loop behind [[pageRank]] /
    * [[personalizedPageRank]]: `init` and `teleOf` are expressions over
    * the node-id column `id` giving the starting rank and the per-node
    * teleport term.
    */
  private def prLoop(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampNum: Long,
      dampDen: Long,
      qBits: Int,
      init: Column,
      teleOf: Column,
      weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    require(qBits >= 1 && qBits <= 30, s"qBits must be in [1, 30], got $qBits")
    val spark = edges.sparkSession
    // Weighted variant: mass from u splits ∝ w(u→v) / Σw(u→·) — the
    // integer send lifts rank·w to DECIMAL(38,0) before the floor divide
    // (rank ≤ |V|·2^qBits already flirts with int64 when multiplied by a
    // user weight; decimal removes the cliff, and the cost exists only on
    // the weighted path). Non-positive weights are dropped: a zero edge
    // carries no mass and a negative one has no PageRank semantics.
    val e = edges
      .select(Seq(col(srcCol).as("src"), col(dstCol).as("dst")) ++
        weightCol.map(c => col(c).cast("long").as("__w")): _*)
      .where(weightCol.map(_ => col("__w") > 0L).getOrElse(lit(true)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val small = nodes.count() <= TinyFrameMaxNodes
    def score(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val eW = rightSized(e, small)
    val nodesW = rightSized(nodes, small)
    withTinyFrameConf(spark, small) {
      val outdeg = weightCol match {
        // DECIMAL sum: a hub with 1e7 weighted out-edges (byte counts as
        // weights) overflows a plain long Σw silently; the rank·w
        // numerator one line below was already DECIMAL-lifted for the
        // same class, and DECIMAL DIV DECIMAL stays exact integer math.
        case Some(_) => eW.groupBy("src")
          .agg(sum(col("__w").cast("decimal(38,0)")).as("__od"))
        case None => eW.groupBy("src").agg(count(lit(1)).as("__od"))
      }
      val eDeg = eW.join(score(outdeg), Seq("src"))
        .select(Seq(col("src"), col("dst"), col("__od")) ++
          weightCol.map(_ => col("__w")): _*)
        .localCheckpoint(true)
      e.unpersist(blocking = false)
      val sendExpr =
        if (weightCol.isDefined)
          expr("CAST((CAST(rank AS DECIMAL(38,0)) * __w) DIV __od AS BIGINT)")
        else expr("rank DIV __od")
      var ranks = nodesW.select(col("id"), init.as("rank"))
      var it = 0
      while (it < iters) {
        val mass = eDeg
          .join(score(ranks.select(col("id").as("src"), col("rank"))), Seq("src"))
          .select(col("dst").as("id"), sendExpr.as("__send"))
          .groupBy("id").agg(sum(col("__send")).as("__m"))
          .localCheckpoint(true)
        ranks = nodesW
          .join(score(mass), Seq("id"), "left")
          .select(col("id"),
            (teleOf + expr(s"($dampNum * coalesce(__m, 0L)) DIV $dampDen"))
              .as("rank"))
        it += 1
      }
      ranks
    }
  }

  /** Edge-weighted PageRank: mass from a node splits across its
    * out-edges proportionally to the edge weight (⌊rank·w / Σw⌋ in
    * exact integer/decimal arithmetic) instead of uniformly — link
    * strength, click counts, or citation multiplicity as the vote. The
    * [[pageRank]] fixed-point discipline otherwise verbatim; weights
    * must be positive integers (non-positive edges are dropped).
    */
  def weightedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iters: Int = 3,
      dampNum: Long = 17L,
      dampDen: Long = 20L,
      qBits: Int = 20): DataFrame = {
    val base = 1L << qBits
    val tele = ((dampDen - dampNum) * base) / dampDen
    prLoop(edges, srcCol, dstCol, iters, dampNum, dampDen, qBits,
      init = lit(base), teleOf = lit(tele), weightCol = Some(weightCol))
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
    * combined sum — id-and-score rows only, the [[pageRank]] wire
    * discipline — whose |V|-row aggregate is eagerly `localCheckpoint`ed
    * (the [[kCore]] lifecycle: leaf plan, constant size across rounds,
    * superseded snapshots reclaimed by the ContextCleaner). Checkpointing
    * the AGGREGATE, not the normalized output, is the latency law this
    * operator taught: the max and the normalize both reference the
    * aggregate, and a lazy aggregate re-executes its whole upstream chain
    * per reference — with two half-steps per round that compounded to 4×
    * recompute of every prior stage (the round-10 shape: 6+ s of pure
    * replayed DAG at a fixed 100-node graph). The max then reads off the
    * checkpointed leaf as a driver LITERAL (1-row first() — no crossJoin,
    * no broadcast subquery, no second execution), and the normalize is a
    * pure projection. When |V| ≤ `broadcastMaxNodes` the score side of
    * every join is broadcast — a checkpointed leaf carries no size stats,
    * so the planner would otherwise shuffle BOTH sides; HITS classically
    * runs on a focused root-set subgraph (Kleinberg's formulation is
    * query-time over thousands of pages), so the broadcast path is the
    * production norm and the shuffle path the billion-node escape hatch.
    *
    * @param broadcastMaxNodes broadcast the |V|-row score tables into the
    *        edge joins when |V| is at or below this (16 B/row → default
    *        caps the broadcast at ~64 MB); above it, shuffle joins.
    * @return (id, hub, auth) for every node in `edges`, both in 2^qBits
    *         fixed-point scale.
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      qBits: Int = 20,
      broadcastMaxNodes: Long = TinyFrameMaxNodes): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1, 16], got $iters")
    require(qBits >= 1 && qBits <= 30, s"qBits must be in [1, 30], got $qBits")
    val spark = edges.sparkSession
    val dec = "decimal(38,0)"
    val base = 1L << qBits
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    // The one count also materializes e; |V| picks the join strategy for
    // every subsequent round (deterministic per dataset — the result is
    // identical either way, only the physical plan changes).
    val small = nodes.count() <= broadcastMaxNodes
    def score(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val eW = rightSized(e, small)
    val nodesW = rightSized(nodes, small)

    def withLoopConf[T](body: => T): T =
      Graph.withTinyFrameConf(spark, small)(body)

    // One normalized half-step: raw(id) = Σ over `joinKey`-matched edges of
    // the counterpart score, then (raw · base) DIV max(raw), 0 for absent.
    // The aggregate is the ONLY materialization (one checkpoint job per
    // half-step); max reads off the leaf as a driver literal and the
    // normalize is a lazy projection over two leaves — referencing the
    // result twice downstream re-runs a broadcast join, never a shuffle.
    // Score tables are SPARSE mid-loop: a node absent from `scores` has
    // score 0 and contributes nothing to any sum, so the zero rows are
    // never carried — each normalize is a pure projection over the
    // checkpointed aggregate (no per-half-step node join at all); the
    // final output restores every node with coalesce-0 once.
    def halfStep(scores: DataFrame, scoreName: String,
        edgeKeyIn: String, edgeKeyOut: String, outName: String): DataFrame = {
      val raw = eW
        .join(score(scores.select(col("id").as(edgeKeyIn), col(scoreName))),
          Seq(edgeKeyIn))
        .groupBy(col(edgeKeyOut).as("id"))
        .agg(sum(col(scoreName)).as("__raw"))
        .localCheckpoint(true)
      // coalesce: an edgeless round (cannot happen for src≠dst input, but
      // cheap to guard) normalizes by 1 instead of dividing by null.
      val mx = raw.agg(coalesce(max(col("__raw")), lit(1L))).first().getLong(0)
      raw.select(col("id"),
        expr(s"(CAST(__raw AS $dec) * CAST($base AS $dec)) " +
          s"DIV CAST($mx AS $dec)").cast("long").as(outName))
    }

    // Initial hubs are uniform — a lazy constant projection over the
    // checkpointed node leaf; no materialization needed.
    var hubs = nodesW.withColumn("hub", lit(base))
    var auths: DataFrame = null
    withLoopConf {
      var it = 0
      while (it < iters) {
        val nextA = halfStep(hubs, "hub", "src", "dst", "auth")
        val nextH = halfStep(nextA, "auth", "dst", "src", "hub")
        hubs = nextH
        auths = nextA
        it += 1
      }
    }
    val out = nodesW
      .join(score(hubs), Seq("id"), "left")
      .join(score(auths), Seq("id"), "left")
      .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
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
    // The count that seeds the fixpoint test also gates the tiny-frame
    // loop machinery (the [[connectedComponents]] rationale — checkpoint
    // materialization bypasses AQE, so without the gate every peel round
    // schedules the session's raw shuffle-partition count of tasks).
    val small = prevCount <= TinyFrameMaxNodes
    e = rightSized(e, small)
    withTinyFrameConf(edges.sparkSession, small) {
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
    * window over the message table). Each round's |V|-row label table is
    * the round's single eager `localCheckpoint` (leaf plan, constant plan
    * size, superseded rounds reclaimed by the ContextCleaner — the
    * [[hits]] lifecycle); below [[TinyFrameMaxNodes]] the label side of
    * the join broadcasts and the loop runs under [[withTinyFrameConf]].
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
    val spark = edges.sparkSession
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
      .localCheckpoint(true)
    val small = labels.count() <= TinyFrameMaxNodes
    def side(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val adjW = rightSized(adj, small)
    labels = rightSized(labels, small)
    withTinyFrameConf(spark, small) {
      (1 to rounds).foreach { _ =>
        val msgs = adjW
          .join(side(labels.select(col("x").as("nbr"), col("lab"))), Seq("nbr"))
          .select(col("x"), col("lab"))
        labels = msgs
          .groupBy(col("x"), col("lab")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("x"))
          .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
          .select(col("x"), (-col("m.nl")).as("lab"))
          .localCheckpoint(true)
      }
    }
    adj.unpersist(blocking = false)
    // The final checkpoint backs the returned frame; the ContextCleaner
    // reclaims it when the caller's result becomes unreachable (the
    // kCore convention).
    labels.select(col("x").as("vertex"), col("lab").as("label"))
  }

  /** Newman modularity (Newman & Girvan 2004) of a community assignment
    * over an undirected graph — the "did the clustering find real
    * structure" audit run after [[labelPropagation]] / [[kCore]]: the
    * fraction of edges falling inside communities minus the fraction
    * expected if edges were wired at random preserving degrees,
    *
    *   Q = Σ_c [ e_c/m − (d_c / 2m)² ]
    *     = (4m·Σ_c e_c − Σ_c d_c²) / 4m²
    *
    * with m canonical undirected edges, e_c intra-community edges and
    * d_c the community's degree mass. Q ≈ 0 means no better than random
    * (LPA collapsed or the graph has no blocks); Q ≳ 0.3 is conventional
    * "real community structure". Reported exactly: `q_ppm` is the
    * sign-factored integer ⌊10⁶·|num|⌋ DIV den with the sign restored
    * (the cohenKappa convention — replayable division both ways), all
    * products in DECIMAL(38,0) (4m·Σe_c passes int64 at ~10⁹ edges).
    *
    * Scale shape: canonicalize edges (one distinct), per-vertex degrees
    * (one map-side-combined count), label both endpoints (two id-keyed
    * joins shipping (id, label) longs), then everything collapses to
    * per-LABEL aggregates — bounded by |communities|, never |E| — and a
    * 1-row combine. Output (one row): n_vertices, n_edges,
    * n_communities, intra_edges, q_ppm.
    *
    * @param labels (vertexCol, labelCol) — one row per vertex. Edges
    *        with an unlabeled endpoint drop out of the census (inner
    *        join) and `n_edges` counts only labeled edges, so a partial
    *        labeling is VISIBLE in the output counts rather than
    *        silently skewing Q.
    */
  def modularity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      labels: DataFrame,
      vertexCol: String,
      labelCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    // EAGER leaves, not lazy persists: totals/perC/nV below are broadcast
    // builds that run as CONCURRENT jobs and race past an unpopulated
    // cache, re-executing the whole upstream per consumer (the marginMine
    // lesson). e and labeled are id/label longs — cheap to snapshot.
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val lab = labels.select(col(vertexCol).cast("long").as("x"),
      col(labelCol).cast("long").as("lab"))
    val labeled = e
      .join(lab.select(col("x").as("u"), col("lab").as("lu")), Seq("u"))
      .join(lab.select(col("x").as("v"), col("lab").as("lv")), Seq("v"))
      .localCheckpoint(true)
    // Per-community degree mass from the labeled edge list directly:
    // every canonical edge contributes 1 to each endpoint's community
    // (loop-free by construction), so d_c = Σ over edge-endpoint rows.
    val degMass = labeled
      .select(explode(array(col("lu"), col("lv"))).as("lab"))
      .groupBy("lab").agg(count(lit(1)).as("d"))
    val perC = degMass.agg(
      count(lit(1)).as("n_communities"),
      sum(col("d").cast(dec) * col("d").cast(dec)).as("__dd"))
    // coalesce: sum over zero labeled edges is SQL NULL — the counts
    // contract ("the counts expose why") promises 0, not null.
    val totals = labeled.agg(
      count(lit(1)).as("n_edges"),
      coalesce(sum((col("lu") === col("lv")).cast("long")), lit(0L))
        .as("intra_edges"))
    val nV = lab.join(
      e.select(col("u").as("x")).unionByName(e.select(col("v").as("x")))
        .distinct(), Seq("x"), "left_semi")
      .agg(count(lit(1)).as("n_vertices"))
    val out = nV.crossJoin(broadcast(totals)).crossJoin(broadcast(perC))
      .select(col("n_vertices"), col("n_edges"), col("n_communities"),
        col("intra_edges"),
        expr(s"""CAST(CASE WHEN n_edges = 0 THEN 0 ELSE
          (CASE WHEN 4 * CAST(n_edges AS $dec) * intra_edges >= __dd
                THEN 1 ELSE -1 END) *
          ((abs(4 * CAST(n_edges AS $dec) * intra_edges - __dd) * 1000000)
            DIV (4 * CAST(n_edges AS $dec) * n_edges)) END AS BIGINT)""")
          .as("q_ppm"))
    // checkpointed leaves are reclaimed by the ContextCleaner when `out`
    // becomes unreachable (the kCore convention) — no unpersist needed.
    out
  }

  /** k-truss (Cohen 2008): the maximal subgraph whose every edge closes
    * at least k−2 triangles WITHIN the subgraph — the cohesion notion one
    * tier above [[kCore]] (every k-truss lives inside a (k−1)-core, but
    * the truss also drops "bridge" edges whose endpoints are individually
    * well-connected). Synchronous peeling: each round recomputes every
    * edge's triangle support via the degree-oriented wedge join (each
    * triangle exactly one (low, mid, high) realization — the
    * [[triangleCount]] DAG, O(m^1.5) wedge mass) and drops ALL
    * under-supported edges together, so the result is a pure function of
    * the edge set (sequential lowest-support-first peeling is
    * order-dependent and not replayable).
    *
    * Scale shape: per round, one degree census + the id-only wedge join +
    * a map-side-combined per-edge support count; rounds are eagerly
    * localCheckpoint'd (the [[kCore]] lineage rationale). Returns the
    * surviving undirected edges with their fixpoint support:
    * (u, v, support), u < v.
    */
  def kTruss(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 64): DataFrame = {
    require(k >= 3, s"k must be >= 3 for a non-trivial truss, got $k")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
      .localCheckpoint(true)
    def support(ed: DataFrame): DataFrame = {
      val deg = ed.select(col("u").as("x"))
        .unionByName(ed.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val oriented = ed
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
        .select(col("ab.a").as("x"), col("ab.b").as("y"),
          col("bc.b").as("z"))
      tri.select(explode(array(
          struct(least(col("x"), col("y")).as("u"),
            greatest(col("x"), col("y")).as("v")),
          struct(least(col("y"), col("z")).as("u"),
            greatest(col("y"), col("z")).as("v")),
          struct(least(col("x"), col("z")).as("u"),
            greatest(col("x"), col("z")).as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
    }
    var converged = false
    var round = 0
    var prevCount = e.count()
    // The converging round's support table IS the fixpoint support
    // (next == e means nothing dropped), so it is carried out of the
    // loop instead of paying one extra O(m^1.5) wedge pass to recompute.
    var sup = support(e).localCheckpoint(true)
    while (!converged && round < maxRounds) {
      val next = e
        .join(sup.where(col("support") >= k - 2),
          Seq("u", "v"), "left_semi")
        .localCheckpoint(true)
      val nextCount = next.count()
      converged = nextCount == prevCount
      e = next
      prevCount = nextCount
      if (!converged) sup = support(e).localCheckpoint(true)
      round += 1
    }
    require(converged, s"kTruss did not converge in $maxRounds rounds")
    e.join(sup, Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))
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
      // The wedge join reads `oriented` THREE times (ab/bc/ac); without a
      // materialization each alias re-runs the two degree joins and the
      // degree aggregation from scratch — 3× the setup work before a
      // single wedge is probed. One persist makes the triple self-join
      // read the oriented edge list back from block storage.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tri = oriented.as("ab")
      .join(oriented.as("bc"), col("ab.b") === col("bc.a"))
      .join(oriented.as("ac"),
        col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .count()
    val Array(nv, ne) = Array(
      deg.count(),
      e0.count())
    oriented.unpersist(blocking = false)
    e0.unpersist(blocking = false)
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nv, ne, tri)).toDF("n_vertices", "n_edges", "n_triangles")
  }

  /** Adamic–Adar link prediction — "which NON-edges look most like edges":
    * for every non-adjacent pair (u, v), score Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w)
    * (Adamic & Adar 2003), the standard common-neighbor predictor where a
    * shared RARE neighbor counts more than a shared hub. In the curation
    * graph family this ranks candidate merges between near-dup clusters
    * and suggests crawl frontier links the co-citation pattern implies.
    *
    * Determinism: per-center weight is the integer
    * round(10⁶ / ln(deg_w)) (the [[walkCooccurrence]] round(1e6·ln)
    * convention — any engine replays the IEEE ln + half-up round), summed
    * exactly in int64; ordering is (aa_ppm desc, u, v). Degree-1 centers
    * produce no wedge by construction (they have no neighbor PAIR).
    *
    * Scale shape: wedge mass is Σ_w deg(w)·(deg(w)−1)/2 — super-linear in
    * hubs, so centers with deg > `maxDegree` are dropped (the published
    * hub cap: their per-pair weight 1/ln(deg) is the SMALLEST in the
    * graph, so the cap removes the most mass at the least score — same
    * attitude as the triangle family's degree orientation). All joins are
    * id-keyed, two longs wide; existing edges leave via one anti-join;
    * output is k-bounded TakeOrdered.
    *
    * @return (u, v, n_common, aa_ppm) — top-K predicted links.
    */
  def adamicAdar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      topK: Int = 100,
      maxDegree: Int = 10000): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adj = e0.select(col("u").as("w"), col("v").as("nb"))
      .unionByName(e0.select(col("v").as("w"), col("u").as("nb")))
    val ctr = adj.groupBy("w").agg(count(lit(1)).as("d"))
      .where(col("d") >= 2 && col("d") <= maxDegree)
      .select(col("w"),
        round(lit(1e6) / log(col("d").cast("double")))
          .cast("long").as("__aaw"))
    // The hub cap must bind BEFORE the self-join: joining ctr afterwards
    // materializes the hub's deg² wedge rows first and only then drops
    // them — the exact blow-up the cap exists to prevent. Restricting the
    // adjacency to capped centers keeps wedge mass ≤ Σ_capped d(w)².
    val cappedAdj = adj.join(ctr.select("w"), Seq("w"), "left_semi")
    val wedges = cappedAdj.toDF("w", "a")
      .join(cappedAdj.toDF("w", "b"), Seq("w"))
      .where(col("a") < col("b"))
      .join(ctr, Seq("w"))
    val out = wedges.groupBy(col("a").as("u"), col("b").as("v"))
      .agg(count(lit(1)).as("n_common"), sum("__aaw").as("aa_ppm"))
      .join(e0, Seq("u", "v"), "left_anti")
      .orderBy(desc("aa_ppm"), col("u"), col("v"))
      .limit(topK)
    out.persist(StorageLevel.MEMORY_AND_DISK).count()
    e0.unpersist(blocking = false)
    out
  }

  /** Degree assortativity — "do hubs link to hubs?": the Pearson
    * correlation of endpoint degrees over every directed edge instance
    * (each undirected edge counted both ways — Newman 2002's r). Positive
    * on social-style graphs, negative on web/crawl graphs; in curation it
    * is the one-number diagnostic that a synthetic or scraped link graph
    * has the wrong mixing pattern before PageRank-family scores are
    * trusted.
    *
    * Numerics are [[Stats.pearsonCorr]] verbatim (exact DECIMAL(38,0)
    * moments, min-centered, one fixed IEEE final chain) over the
    * (deg u, deg v) pairs, so the output convention is the signed ppm r²
    * that family already ships. Scale shape: one degree census, two
    * id-keyed joins to decorate endpoints (2|E| rows of two longs), one
    * map-side-combined moment aggregation; single-row output.
    *
    * @return (n_endpoints, assort_r2_ppm) — n_endpoints = 2·|E|.
    */
  def degreeAssortativity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
    val adj = e0.select(col("u").as("x"), col("v").as("y"))
      .unionByName(e0.select(col("v").as("x"), col("u").as("y")))
    val deg = adj.groupBy(col("x").as("id")).agg(count(lit(1)).as("d"))
    val pairs = adj
      .join(deg.select(col("id").as("x"), col("d").as("__dx")), Seq("x"))
      .join(deg.select(col("id").as("y"), col("d").as("__dy")), Seq("y"))
      .withColumn("__g", lit(0L))
    Stats.pearsonCorr(pairs, "__g", col("__dx"), col("__dy"))
      .select(col("n").as("n_endpoints"),
        col("r2_ppm").as("assort_r2_ppm"))
  }

  /** Multi-source BFS: minimum hop distance from a seed set, plus the
    * NEAREST SEED under min-id tie-break — the crawl-frontier primitive
    * (how many hops is each page from the vetted seed list, and which
    * seed claims it), and the seed-attribution complement to
    * [[personalizedPageRank]]'s soft proximity score.
    *
    * Per round h, only the PREVIOUS round's frontier (rows settled at
    * h−1) offers; a settled node never re-offers and never improves, so
    * total offer volume across the whole run is one row per (edge,
    * settling) — Σ rounds is bounded by |E|, not rounds·|E|. Offers
    * aggregate to min seed per node, anti-join against settled nodes,
    * and the union re-seats on an eager `localCheckpoint` (the
    * [[connectedComponents]] leaf lifecycle: constant plan size,
    * superseded rounds reclaimed). Termination: the round's addition
    * count hits zero (a scan of the fresh frontier leaf) or `maxHops`.
    *
    * Seed attribution is exact by induction: a node x settling at round h
    * receives offers exactly from the shortest-path neighbors n, all
    * settled at h−1 (had any settled earlier, x would have settled
    * before h); each carries seed(n) = min seed at distance h−1 from n,
    * so every offer is a seed at distance exactly h from x, and the true
    * minimum m arrives via x's shortest-path neighbor toward m (whose
    * own min seed is ≤ m yet at distance h from x, hence = m). The
    * min-aggregate therefore lands on m — no per-node seed SET ever
    * needs to ride the shuffle.
    *
    * @param directed when false (default), edges are symmetrized.
    * @return (id, dist, seed) for every node within `maxHops` of a seed —
    *         unreachable nodes are absent by construction.
    */
  def bfsDistances(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: Seq[Long],
      maxHops: Int = 6,
      directed: Boolean = false,
      broadcastMaxNodes: Long = TinyFrameMaxNodes / 4): DataFrame = {
    require(seeds.nonEmpty, "bfsDistances needs at least one seed")
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    val fwd = edges.select(col(srcCol).cast("long").as("v"),
      col(dstCol).cast("long").as("u"))
    val adj = (if (directed) fwd
      else fwd.unionByName(edges.select(col(dstCol).cast("long").as("v"),
        col(srcCol).cast("long").as("u"))))
      .where(col("u") =!= col("v"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // Seeds restricted to nodes that EXIST in the graph: a seed id with no
    // edges would report dist 0 for a node the edge set never mentions,
    // diverging from the "nodes appearing in edges" convention the other
    // operators share. BOTH endpoints — in the directed case a pure-source
    // seed appears only on the v side of the adjacency.
    val nodes = adj.select(col("u").as("id"))
      .unionByName(adj.select(col("v").as("id"))).distinct()
    var settled = nodes
      .join(seeds.toDF("id"), Seq("id"), "left_semi")
      .select(col("id"), lit(0L).as("dist"), col("id").as("seed"))
      .localCheckpoint(true)
    var frontier = settled
    val small = nodes.count() <= broadcastMaxNodes
    def side(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val adjW = rightSized(adj, small)
    settled = rightSized(settled, small)
    withTinyFrameConf(spark, small) {
      var h = 0
      var grew = frontier.limit(1).count() > 0
      while (grew && h < maxHops) {
        h += 1
        val fresh = adjW.join(side(frontier.select(col("id").as("v"),
              col("seed"))), Seq("v"))
          .groupBy(col("u").as("id")).agg(min(col("seed")).as("seed"))
          .join(side(settled.select("id")), Seq("id"), "left_anti")
          .select(col("id"), lit(h.toLong).as("dist"), col("seed"))
          .localCheckpoint(true)
        grew = fresh.limit(1).count() > 0
        if (grew) {
          // Union of checkpoint LEAVES — depth-1 lineage, no re-seat needed.
          settled = settled.unionByName(fresh)
          frontier = fresh
        }
      }
    }
    adj.unpersist(blocking = false)
    settled
  }

  /** Deterministic random-walk corpus (the DeepWalk / node2vec p=q=1
    * sentence generator — Perozzi et al. 2014): `walksPerNode` walks of
    * `walkLen` steps from every node, each step moving to the neighbor at
    * rank md5("start-walk-step-salt") mod degree(current) of the CURRENT
    * node's id-ordered adjacency list. Every transition is a pure
    * function of (start, walk, step, salt) — the [[Curation.hashUniform]]
    * policy: no RNG state, retries and independent engines reproduce the
    * walk table row for row, and a fresh salt gives a fresh epoch.
    *
    * NOTE the draw is indexed by the walk identity and step, NOT by the
    * current node — two walks meeting at a node diverge again (the usual
    * corpus-diversity requirement), while one (start, walk) pair replays
    * identically forever.
    *
    * Scale shape: the adjacency ranks once (one row_number window over
    * per-node neighbor lists — partition-bounded by max degree); each
    * step is ONE join of the walk-front (|V|·walksPerNode rows of four
    * longs) against the ranked adjacency, re-seated on an eager
    * `localCheckpoint` leaf (the [[connectedComponents]] lifecycle).
    * Directed walks stop early at sinks (the inner join drops them);
    * undirected walks always continue.
    *
    * @return (start, walk, step, node) — step 0 is the start node; a walk
    *         reaching a sink has no rows past its last reachable step.
    */
  def randomWalks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walksPerNode: Int = 1,
      walkLen: Int = 4,
      directed: Boolean = false,
      salt: String = "walk",
      broadcastMaxNodes: Long = TinyFrameMaxNodes / 4): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    require(walkLen >= 0, s"walkLen must be >= 0, got $walkLen")
    val spark = edges.sparkSession
    val fwd = edges.select(col(srcCol).cast("long").as("v"),
      col(dstCol).cast("long").as("u"))
    val adj = (if (directed) fwd
      else fwd.unionByName(edges.select(col(dstCol).cast("long").as("v"),
        col(srcCol).cast("long").as("u"))))
      .where(col("u") =!= col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // toDF: fresh attribute ids — front/ranked/deg all descend from adj
    // (and the checkpointed front keeps its ids), so shared names would
    // trip the ambiguous-self-join detector on the per-step joins.
    // Persisted: every walk STEP joins against both `ranked` and `deg`
    // (and broadcast rebuilds read them again), so without
    // materialization each of the walkLen steps re-runs the ranked-
    // adjacency window sort and the degree aggregation from the raw
    // edges — walkLen× the one-time indexing cost. Both are id-only
    // frames (3 and 2 longs wide); the ContextCleaner reclaims them when
    // the returned walks become unreachable (the [[connectedComponents]]
    // lifecycle).
    val ranked = adj.select(col("v"), col("u"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("v").orderBy("u")) - 1).cast("long").as("rk"))
      .toDF("rv", "ru", "rk")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = adj.groupBy("v").agg(count(lit(1)).as("deg"))
      .toDF("dv", "deg")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = (if (directed)
        adj.select(col("v").as("id"))
          .unionByName(adj.select(col("u").as("id")))
      else adj.select(col("v").as("id"))).distinct()
    var front = nodes
      .select(col("id").as("start"),
        explode(sequence(lit(0L), lit(walksPerNode - 1L))).as("walk"),
        col("id").as("cur"))
      .localCheckpoint(true)
    // Small-graph fast path (the hits/bfsDistances convention): broadcast
    // the adjacency sides and pin tiny-frame conf inside the step loop —
    // each step is otherwise two fixed-latency exchanges on a |V|·wpn-row
    // frame. The gate sizes the BROADCAST side: ranked is |E| rows of
    // 3 longs, so it reuses the /4 row-width budget.
    val small = adj.count() <= broadcastMaxNodes
    def side(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    front = rightSized(front, small)
    val out = Seq.newBuilder[DataFrame]
    out += front.select(col("start"), col("walk"),
      lit(0L).as("step"), col("cur").as("node"))
    withTinyFrameConf(spark, small) {
      var t = 1
      while (t <= walkLen) {
        val draw = conv(substring(md5(concat_ws("-",
            col("start"), col("walk"), lit(t), lit(salt)).cast("binary")),
          1, 13), 16, 10).cast("long") % col("deg")
        front = front
          .join(side(deg), col("cur") === col("dv"))
          .withColumn("__d", draw)
          .join(side(ranked),
            col("cur") === col("rv") && col("__d") === col("rk"))
          .select(col("start"), col("walk"), col("ru").as("cur"))
          .localCheckpoint(true)
        out += front.select(col("start"), col("walk"),
          lit(t.toLong).as("step"), col("cur").as("node"))
        t += 1
      }
    }
    adj.unpersist(blocking = false)
    out.result().reduce(_.unionByName(_))
  }

  /** Skip-gram co-occurrence statistics over the [[randomWalks]] corpus —
    * the counts a DeepWalk/node2vec embedding trains on, usable directly
    * as a node-affinity signal: for every ordered position pair within
    * `window` steps of the same walk, count (earlier, later) node pairs
    * and report the PMI against the pair-table marginals,
    *
    *   PMI(a, b) = ln( n_ab · N / (l_a · r_b) )
    *
    * integerized as round(10⁶·PMI) — the [[LanguageModel.pmiCollocations]]
    * determinism policy verbatim (exact int64 counts, factors exact as
    * doubles below 2⁵³, same ln on both engines). High-PMI pairs are
    * nodes that co-ride walks far above what their frequencies predict —
    * the random-walk notion of "same neighborhood".
    *
    * Scale shape: the pair table is walks·walkLen·window rows of two
    * longs (the self-join keys on (start, walk) — walk-bounded
    * partitions); three map-side-combined counts; the output is a
    * k-bounded TakeOrdered. Everything inherits [[randomWalks]]'
    * determinism — same salt, same pairs, same PMI, bit for bit.
    *
    * @return top-`topK` (a, b, n_ab, pmi_ppm) by (pmi desc, a, b) among
    *         pairs with n_ab ≥ `minCount`.
    */
  def walkCooccurrence(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walksPerNode: Int = 2,
      walkLen: Int = 4,
      window: Int = 2,
      minCount: Long = 2L,
      topK: Int = 200,
      salt: String = "walk"): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = randomWalks(edges, srcCol, dstCol, walksPerNode, walkLen,
      directed = false, salt = salt)
    val a = w.toDF("s", "k", "i", "a")
    val b = w.toDF("s", "k", "j", "b")
    val pairs = a.join(b, Seq("s", "k"))
      .where(col("j") > col("i") && col("j") <= col("i") + window)
      .select(col("a"), col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = pairs.count()
    val cnt = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val la = pairs.groupBy("a").agg(count(lit(1)).as("__la"))
    val rb = pairs.groupBy("b").agg(count(lit(1)).as("__rb"))
    val out = cnt.where(col("n_ab") >= minCount)
      .join(la, "a").join(rb, "b")
      .select(col("a"), col("b"), col("n_ab"),
        round(lit(1e6) * log((col("n_ab").cast("double") * n) /
          (col("__la").cast("double") * col("__rb"))))
          .cast("long").as("pmi_ppm"))
      .orderBy(desc("pmi_ppm"), col("a"), col("b"))
      .limit(topK)
    out.persist(StorageLevel.MEMORY_AND_DISK).count()
    pairs.unpersist(blocking = false)
    out
  }

  /** Strongly connected components of a DIRECTED graph — the coloring /
    * forward-backward algorithm (Orzan 2004; Hong et al. 2013): the
    * directed complement to [[connectedComponents]] (which symmetrizes).
    *
    * Each phase over the still-active subgraph:
    *   1. FORWARD min-label fixpoint: F(v) = min id that REACHES v
    *      (labels flow along edge direction, the CC loop without the
    *      symmetrize) — F partitions active nodes into color classes,
    *      and every SCC lies wholly inside one class (mutual
    *      reachability forces equal F).
    *   2. BACKWARD containment flag: within each class, mark the nodes
    *      that REACH their color's root c (F(c) = c): start from the
    *      roots, propagate along REVERSE edges that stay inside the
    *      class. Marked nodes are exactly SCC(c) — they reach c, and c
    *      reaches them by the definition of F.
    *   3. Settle the marked nodes with label c; drop them (and their
    *      edges) from the active subgraph; repeat.
    *
    * Both inner fixpoints are one id-only shuffle per round on eager
    * `localCheckpoint` leaves (the CC lifecycle), and every phase
    * removes at least each class's root. DAG-like regions settle one
    * root per class per phase, so a pathological single-chain graph
    * needs O(|V|) phases — `maxPhases` bounds that loudly (the CC
    * `strict` convention); web-shaped graphs with real cycle structure
    * settle in a handful of phases (the fixture converges in 2).
    *
    * @return (id, component) for every node appearing in `edges`;
    *         component = min id of the node's SCC.
    */
  def stronglyConnectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxPhases: Int = 20,
      maxIter: Int = 40,
      strict: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    var active = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .where(col("s") =!= col("d")).distinct()
      .localCheckpoint(true)
    var nodes = active.select(col("s").as("id"))
      .unionByName(active.select(col("d").as("id"))).distinct()
      .localCheckpoint(true)
    val settled = Seq.newBuilder[DataFrame]
    val small = nodes.count() <= TinyFrameMaxNodes / 4
    def side(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    active = rightSized(active, small)
    nodes = rightSized(nodes, small)
    withTinyFrameConf(spark, small) {
      var phase = 0
      var remaining = nodes.limit(1).count() > 0
      while (remaining && phase < maxPhases) {
        phase += 1
        // 0. TRIM (the FW-BW-Trim refinement, Hong et al. 2013): a node
        // with no in-edges or no out-edges in the ACTIVE subgraph can
        // belong to no cycle — it is a singleton SCC. Iterating the trim
        // peels whole DAG tails for the cost of two anti-joins per round,
        // which is what keeps the phase count governed by the CYCLE
        // structure instead of the DAG depth (a pure DAG settles entirely
        // in trim, phase count 1).
        var trimming = true
        while (trimming) {
          val trimmed = nodes
            .join(side(active.select(col("s").as("id"))), Seq("id"),
              "left_anti")
            .unionByName(nodes.join(
              side(active.select(col("d").as("id"))), Seq("id"),
              "left_anti"))
            .distinct()
            .localCheckpoint(true)
          trimming = trimmed.limit(1).count() > 0
          if (trimming) {
            settled += trimmed.select(col("id"), col("id").as("component"))
            nodes = nodes.join(side(trimmed.select("id")), Seq("id"),
              "left_anti").localCheckpoint(true)
            active = active
              .join(side(trimmed.select(col("id").as("s"))), Seq("s"),
                "left_anti")
              .join(side(trimmed.select(col("id").as("d"))), Seq("d"),
                "left_anti")
              .select("s", "d")
              .localCheckpoint(true)
          }
        }
        remaining = nodes.limit(1).count() > 0
        if (remaining) {
        // 1. Forward min-label fixpoint on the active subgraph.
        var labels = nodes.select(col("id"), col("id").as("f"), lit(1).as("chg"))
          .localCheckpoint(true)
        var it = 0
        var moving = true
        while (moving && it < maxIter) {
          it += 1
          val offers = active.join(side(labels), active("s") === labels("id"))
            .select(col("d").as("id"), col("f").as("offer"))
          val next = labels.select(col("id"), col("f"))
            .join(offers.groupBy("id").agg(min("offer").as("o")), Seq("id"), "left")
            .select(col("id"),
              least(col("f"), coalesce(col("o"), col("f"))).as("f"),
              (coalesce(col("o"), col("f")) < col("f")).cast("int").as("chg"))
            .localCheckpoint(true)
          labels = next
          moving = labels.agg(coalesce(sum(col("chg")), lit(0L)))
            .first().getLong(0) > 0L
        }
        require(!moving || !strict,
          s"stronglyConnectedComponents: forward fixpoint not reached in $maxIter rounds")
        // 2. Backward flag fixpoint within color classes, seeded at roots.
        // Edges restricted to same-color endpoints, REVERSED.
        val colored = labels.select(col("id"), col("f"))
          .localCheckpoint(true)
        val ce = active
          .join(side(colored.toDF("id1", "f1")), col("s") === col("id1"))
          .join(side(colored.toDF("id2", "f2")), col("d") === col("id2"))
          .where(col("f1") === col("f2"))
          .select(col("d").as("from"), col("s").as("to"))
          .localCheckpoint(true)
        var marked = colored.where(col("id") === col("f"))
          .select(col("id"), col("f"))
          .localCheckpoint(true)
        var frontier = marked
        var grew = true
        var bit = 0
        while (grew && bit < maxIter) {
          bit += 1
          val fresh = ce.join(side(frontier.select(col("id").as("from"),
                col("f"))), Seq("from"))
            .select(col("to").as("id"), col("f")).distinct()
            .join(side(marked.select("id")), Seq("id"), "left_anti")
            .localCheckpoint(true)
          grew = fresh.limit(1).count() > 0
          if (grew) {
            // Union of checkpoint LEAVES — depth-1 lineage, no re-seat.
            marked = marked.unionByName(fresh)
            frontier = fresh
          }
        }
        require(!grew || !strict,
          s"stronglyConnectedComponents: backward fixpoint not reached in $maxIter rounds")
        settled += marked.select(col("id"), col("f").as("component"))
        // 3. Shrink the active subgraph.
        nodes = nodes.join(side(marked.select("id")), Seq("id"), "left_anti")
          .localCheckpoint(true)
        active = active
          .join(side(marked.select(col("id").as("s"))), Seq("s"), "left_anti")
          .join(side(marked.select(col("id").as("d"))), Seq("d"), "left_anti")
          .select("s", "d")
          .localCheckpoint(true)
        remaining = nodes.limit(1).count() > 0
        }
      }
      require(!remaining || !strict,
        s"stronglyConnectedComponents: $maxPhases phases exhausted with nodes remaining " +
          "(pathological chain structure — raise maxPhases or pass strict = false)")
      if (remaining) System.err.println(
        "[graft] stronglyConnectedComponents: phase budget exhausted; remaining nodes " +
          "labeled as singletons")
      settled += nodes.select(col("id"), col("id").as("component"))
    }
    settled.result().reduce(_.unionByName(_))
  }
}
