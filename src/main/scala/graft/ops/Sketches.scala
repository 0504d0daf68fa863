package graft.ops

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch operators. A sketch is the scale answer when the exact
  * aggregate's key space is unbounded: the Count–Min structure is a few KB
  * per partition regardless of input size, partials merge associatively in
  * the ordinary aggregation tree, and the estimate error is a proven bound
  * (Cormode & Muthukrishnan 2005: est ∈ [true, true + ε·N] with
  * probability ≥ confidence, overestimates only).
  */
object Sketches {

  /** Exact heavy hitters AUDITED by a Count–Min sketch built in the same
    * job: emits the exact top-k tokens with `est_ok = 1` when the sketch
    * estimate honors the CMS contract (never below the true count, within
    * `4ε·N` above it — 4× the single-query bound, so k simultaneous checks
    * hold with margin; the seeded sketch is fully deterministic, so the
    * audit is reproducible, not flaky).
    *
    * Shape at scale: the sketch side is one aggregation to a few-KB buffer
    * (no key-space shuffle at all — this is what survives an unbounded
    * vocabulary); the exact side is the usual partial-agg + k-bounded
    * TakeOrdered. The sketch's own `totalCount` supplies N — no extra
    * counting pass. The driver holds one sketch and k rows, both bounded —
    * so the audit itself is k driver-side point lookups against the
    * already-local sketch (shipping the sketch back out in a UDF closure
    * to score k rows would be the only per-row black box in the repo).
    */
  def cmsAuditedTopTokens(
      df: DataFrame,
      textCol: String,
      k: Int = 50,
      eps: Double = 0.0005,
      confidence: Double = 0.999,
      seed: Int = 42): DataFrame = {
    // toks feeds the sketch job AND the exact top-k job (two actions):
    // persist so the corpus tokenizes once, not once per job.
    val toks = df.select(
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketchBytes = toks
      .agg(expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, $seed)"))
      .first().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))
    val slack = math.ceil(4 * eps * cms.totalCount()).toLong
    val top = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      .collect()
    val audited = top.toIndexedSeq.map { r =>
      val token = r.getString(0)
      val n = r.getLong(1)
      val est = cms.estimateCount(token.getBytes(StandardCharsets.UTF_8))
      (token, n, if (est >= n && est - n <= slack) 1 else 0)
    }
    toks.unpersist(blocking = false) // both actions done
    val spark = df.sparkSession
    import spark.implicits._
    audited.toDF("token", "n", "est_ok")
  }

  /** Per-key distinct counts via HLL sketches (Spark 4's built-in Apache
    * DataSketches surface), audited against the exact count — the same
    * audit-bit pattern as [[cmsAuditedTopTokens]]: emit the EXACT count
    * (oracle-able by any engine) plus a bit asserting the sketch estimate
    * landed within its error envelope.
    *
    * The sketch is the 100 TB artifact: per-key HLL buffers are MERGEABLE
    * (`hll_union_agg`), so per-partition / per-day sketches roll up to
    * global distinct counts without ever re-touching raw data — the thing
    * an exact `count(DISTINCT)` fundamentally cannot do incrementally.
    * lgConfigK = 12 gives ~1.6% relative standard error; the audit allows
    * 4σ (~6.5%).
    */
  /** Per-key quantile profile via Spark's mergeable `approx_percentile`
    * (Greenwald–Khanna) sketch, audited against the EXACT rank in the same
    * job — the third member of the sketch family next to Count–Min and
    * HLL, and the one that answers "p99 latency per service over 100 TB":
    * per-partition GK buffers are bounded (O(accuracy·log n)) and merge
    * associatively, so the only full-data work is one narrow scan; an
    * exact per-key `percentile` would sort every group.
    *
    * The audit: each returned quantile v is a real element of the group,
    * and GK guarantees its rank is within n/accuracy of ⌈p·n⌉ —
    * DETERMINISTICALLY (worst-case bound, not probabilistic), so
    * `rank_ok` is a stable 1 regardless of partitioning. The rank check
    * joins the (keys × probabilities)-bounded quantile table back to the
    * values — broadcast, one counting pass. Output (key, probability, n,
    * rank_ok): exact-replayable by any engine, with the sketch VALUES
    * (implementation-specific merge artifacts) kept out of the contract —
    * the [[cmsAuditedTopTokens]] audit-bit pattern.
    */
  def quantileProfile(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      probabilities: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame = {
    require(probabilities.nonEmpty && probabilities.forall(p => p > 0 && p < 1),
      s"probabilities must be in (0,1): $probabilities")
    val probsSql = probabilities.mkString("array(", ", ", ")")
    // n counts NON-NULL values: approx_percentile and the rank recount
    // both skip nulls, so a count(*) target would fail the rank audit on
    // any null-bearing column even when the sketch met its guarantee.
    val apx = df.groupBy(col(keyCol))
      .agg(count(col(valueCol)).as("n"),
        expr(s"approx_percentile(`$valueCol`, $probsSql, $accuracy)").as("__vs"))
      .select(col(keyCol), col("n"),
        posexplode(col("__vs")).as(Seq("__pi", "__v")))
      .select(col(keyCol), col("n"), col("__pi"), col("__v"))
    val probOf = element_at(
      typedLit(probabilities.toIndexedSeq), col("__pi") + 1)
    df.select(col(keyCol), col(valueCol).as("__x"))
      .join(broadcast(apx), Seq(keyCol))
      .groupBy(col(keyCol), col("n"), col("__pi"))
      .agg(sum(when(col("__x") <= col("__v"), 1L).otherwise(0L)).as("__hi"),
        sum(when(col("__x") < col("__v"), 1L).otherwise(0L)).as("__lo0"))
      .select(col(keyCol), probOf.as("probability"), col("n"), {
        // The returned value OCCUPIES the whole rank run
        // [count(<v)+1, count(<=v)] — on duplicate-heavy columns the run
        // is wide, and testing only its top end flips the audit to 0
        // even when the sketch met its guarantee. Pass iff the target
        // rank comes within tolerance of ANY rank in the run.
        val target = ceil(probOf * col("n"))
        val tol = col("n").cast("double") / accuracy + 1
        (target <= col("__hi") + tol &&
          target >= col("__lo0") + 1 - tol).cast("int").as("rank_ok")
      })
  }

  /** KMV (k-minimum-values) distinct sketch per key (Bar-Yossef et al.
    * 2002): hash every value into [0, 2⁴⁸), keep the k SMALLEST distinct
    * hashes, estimate distinct = (k−1)·2⁴⁸ / h_k from the k-th smallest.
    * The fourth sketch next to Count–Min / HLL / GK — and the one whose
    * ESTIMATE is fully engine-portable: the hash is md5-derived, min-k is
    * order statistics, and the estimator is one exact integer floor
    * division, so a SQL oracle replays the whole sketch INCLUDING the
    * estimate bit-for-bit (HLL's register layout forces the weaker
    * audit-bit contract; KMV's contract is the estimate itself).
    *
    * Scale shape: the min-k set is the aggregation buffer
    * ([[graft.functions.TopKByScore]] on score = −hash with distinct ids),
    * so map-side partials hold ≤ k longs per key and the exchange is
    * k-bounded — an unbounded value space never shuffles. Min-k sets merge
    * associatively (union → min-k), so per-day / per-partition sketches
    * roll up without re-touching raw data, same as the HLL story. 48-bit
    * hashes keep every score exactly representable as a double (< 2⁵³);
    * a hash collision merges two values identically in ANY engine
    * replaying the md5 chain, so collisions cost estimate accuracy
    * (~n²/2⁴⁹), never determinism.
    *
    * Output per key: exact distinct (the verification column), the kept-set
    * size, the k-th hash (the mergeable sketch state), the KMV estimate,
    * and `est_ok` asserting |est − exact| ≤ 4σ (RSE = 1/√(k−2)). Groups
    * with fewer than k distinct hashes are exact by construction
    * (est = n_kept). The +1 on h_k guards the 2⁻⁴⁸ zero-hash corner
    * identically on both sides.
    */
  def kmvDistinct(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 3 && k <= 32768,
      s"k must be in [3, 32768] (the estimator's (k-1)<<48 must fit int64), got $k")
    val space = 1L << 48
    val h = conv(substring(md5(col(valueCol).cast("string").cast("binary")),
      1, 12), 16, 10).cast("long")
    val rse = 1.0 / math.sqrt((k - 2).toDouble)
    df.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(valueCol), h.as("__h"))
      .groupBy(col(keyCol))
      .agg(
        countDistinct(col(valueCol)).as("n_exact"),
        graft.functions.TopKByScore.topk_by_score(
          -col("__h").cast("double"), col("__h"), k, distinctIds = true)
          .as("__mins"))
      .select(col(keyCol), col("n_exact"),
        size(col("__mins")).as("n_kept"),
        element_at(col("__mins"), size(col("__mins")))
          .getField("id").as("kth_hash"))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept").cast("long"))
          .otherwise(expr(s"${(k - 1).toLong * space}L DIV (kth_hash + 1L)")))
      .withColumn("est_ok",
        (abs(col("est") - col("n_exact")) <=
          greatest(col("n_exact").cast("double") * (4 * rse), lit(4.0)))
          .cast("int"))
  }

  /** KMV set-INTERSECTION estimate across key pairs (Beyer et al. 2007):
    * min-k(A ∪ B) is computable from the two sketches alone
    * (min-k(A∪B) ⊆ K_A ∪ K_B), the fraction ρ of that union min-k
    * present in BOTH sketches estimates Jaccard, and
    * |A∩B| ≈ ρ · |A∪B|_KMV — so pairwise overlap across N corpus slices
    * costs N k-bounded sketches instead of N² distinct-joins. The whole
    * estimator is md5 order statistics + integer floor arithmetic
    * (including the 2^20-fixed-point tolerance), so a SQL oracle replays
    * every output bit including `est_ok`.
    *
    * Output per (src_a < src_b): exact intersection/union (the
    * verification tier, same contract as [[kmvDistinct]]'s n_exact),
    * kept-union size, k-th union hash, both estimates, and the 4σ-style
    * audit bit. Pairs whose union keeps < k hashes are hash-exact by
    * construction.
    */
  def kmvIntersect(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 3 && k <= 32768,
      s"k must be in [3, 32768] (the estimator's (k-1)<<48 must fit int64), got $k")
    val space = 1L << 48
    val tolFp = math.floor(4.0 / math.sqrt((k - 2).toDouble) * (1L << 20)).toLong
    // vals feeds BOTH the sketch aggregation and the exact-intersection
    // verification join: persist, or the scan + distinct shuffle run
    // once per consumer (the audit op would double its own corpus cost).
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("string").as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val h = conv(substring(md5(col("v").cast("binary")), 1, 12), 16, 10)
      .cast("long")
    val sk = vals.select(col("key"), col("v"), h.as("__h"))
      .groupBy(col("key"))
      .agg(
        graft.functions.TopKByScore.topk_by_score(
          -col("__h").cast("double"), col("__h"), k, distinctIds = true)
          .as("__mins"),
        count(lit(1)).as("n_distinct"))
      .select(col("key"),
        transform(col("__mins"), e => e.getField("id")).as("hs"),
        col("n_distinct"))
    val exInter = vals.as("x")
      .join(vals.as("y"),
        col("x.v") === col("y.v") && col("x.key") < col("y.key"))
      .groupBy(col("x.key").as("src_a"), col("y.key").as("src_b"))
      .agg(count(lit(1)).as("n_inter_exact"))
    val unionK = slice(array_sort(array_distinct(
      concat(col("a.hs"), col("b.hs")))), 1, k)
    val pairs = sk.as("a")
      .join(sk.as("b"), col("a.key") < col("b.key"))
      .select(col("a.key").as("src_a"), col("b.key").as("src_b"),
        col("a.n_distinct").as("__na"), col("b.n_distinct").as("__nb"),
        unionK.as("__u"),
        array_intersect(col("a.hs"), col("b.hs")).as("__both"))
      .select(col("src_a"), col("src_b"), col("__na"), col("__nb"),
        size(col("__u")).as("n_kept"),
        element_at(col("__u"), size(col("__u"))).as("kth_hash"),
        size(array_intersect(col("__u"), col("__both"))).as("__ik"))
    pairs.join(exInter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"),
        (col("__na") + col("__nb") -
          coalesce(col("n_inter_exact"), lit(0L))).as("n_union_exact"),
        col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept").cast("long"))
          .otherwise(expr(s"${(k - 1).toLong * space}L DIV (kth_hash + 1L)"))
          .as("est_union"),
        col("__ik"))
      .withColumn("est_inter",
        when(col("n_kept") < k, col("__ik").cast("long"))
          .otherwise(expr(s"(__ik * est_union) DIV $k")))
      .withColumn("est_ok",
        (abs(col("est_inter") - col("n_inter_exact")) <=
          greatest(lit(8L),
            expr(s"($tolFp * n_union_exact) DIV ${1L << 20}")))
          .cast("int"))
      .drop("__ik")
  }

  /** Rolling distinct-count over trailing day windows via MERGED daily KMV
    * sketches — "distinct users in the last `window` days, per day" without
    * ever re-scanning the window: each day keeps a k-min-hash sketch once,
    * and a trailing window's estimate merges the ≤ `window` sketches
    * (min-k(∪days) ⊆ ∪ per-day min-k, the Beyer et al. identity
    * [[kmvIntersect]] also leans on). This is THE shape that survives
    * 100 TB: the per-day sketch is the only state that outlives the day's
    * scan, windows reuse it, and re-keying a window fans out k-length hash
    * arrays only — raw values never ride the window replication.
    *
    * Output per observed day `window_end`: `n_days` (observed days in the
    * window), `n_exact` (the verification tier — its ×window (day, value)
    * fan-out is affordable at audit scale; drop the column in production
    * and the sketch path is all that remains), sketch state
    * (`n_kept`, `kth_hash`), `est`, and the fixed-point 4σ audit bit
    * `est_ok` (integer tolerance arithmetic, same contract as
    * [[kmvIntersect]] — a SQL oracle replays every bit).
    */
  def kmvRollingDistinct(
      df: DataFrame,
      dayCol: Column,
      valueCol: String,
      window: Int = 7,
      k: Int = 64): DataFrame = {
    require(k >= 3 && k <= 32768,
      s"k must be in [3, 32768] (the estimator's (k-1)<<48 must fit int64), got $k")
    require(window >= 1, s"window must be >= 1, got $window")
    val space = 1L << 48
    val tolFp = math.floor(4.0 / math.sqrt((k - 2).toDouble) * (1L << 20)).toLong
    // pairs feeds both the per-day sketch and the exact verification
    // side: persist, or the scan + distinct shuffle run per consumer.
    val pairs = df.where(col(valueCol).isNotNull)
      .select(dayCol.cast("long").as("d"), col(valueCol).cast("string").as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val h = conv(substring(md5(col("v").cast("binary")), 1, 12), 16, 10)
      .cast("long")
    val daily = pairs.select(col("d"), h.as("__h"))
      .groupBy(col("d"))
      .agg(graft.functions.TopKByScore.topk_by_score(
        -col("__h").cast("double"), col("__h"), k, distinctIds = true)
        .as("__mins"))
      .select(col("d"), transform(col("__mins"), e => e.getField("id")).as("hs"))
    val days = daily.select(col("d").as("w"))
    val merged = daily
      .select(explode(sequence(col("d"), col("d") + (window - 1))).as("w"),
        col("hs"))
      .join(days, Seq("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_days"),
        slice(array_sort(array_distinct(flatten(collect_list(col("hs"))))),
          1, k).as("__u"))
      .select(col("w"), col("n_days"), size(col("__u")).as("n_kept"),
        element_at(col("__u"), size(col("__u"))).as("kth_hash"))
    val exact = pairs
      .select(explode(sequence(col("d"), col("d") + (window - 1))).as("w"),
        col("v"))
      .join(days, Seq("w"))
      .groupBy(col("w"))
      .agg(countDistinct(col("v")).as("n_exact"))
    merged.join(exact, Seq("w"))
      .select(col("w").as("window_end"), col("n_days"), col("n_exact"),
        col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept").cast("long"))
          .otherwise(expr(s"${(k - 1).toLong * space}L DIV (kth_hash + 1L)"))
          .as("est"))
      .withColumn("est_ok",
        (abs(col("est") - col("n_exact")) <=
          greatest(lit(8L), expr(s"($tolFp * n_exact) DIV ${1L << 20}")))
          .cast("int"))
  }

  def hllAuditedDistinct(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      lgConfigK: Int = 12): DataFrame = {
    val rse = 1.04 / math.sqrt((1L << lgConfigK).toDouble)
    val tol = 4 * rse
    df.groupBy(col(keyCol))
      .agg(
        countDistinct(col(valueCol)).as("n_exact"),
        expr(s"hll_sketch_estimate(hll_sketch_agg(`$valueCol`, $lgConfigK))")
          .as("__est"))
      .select(col(keyCol), col("n_exact"),
        (abs(col("__est") - col("n_exact")) <=
          greatest(col("n_exact").cast("double") * tol, lit(4.0)))
          .cast("int").as("est_ok"))
  }
}
