package graft.streaming

import java.sql.Timestamp

import graft.engine.LogPredicate

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension: the reference is batch-only (ingest is
  * file drops + a cron maintenance loop — SURVEY.md §2.7), but its hourly
  * partitions and quiesce-before-merge protocol are exactly the tumbling-
  * window + watermark model, so streaming versions of the query surface come
  * almost for free on `spark.readStream.format("boom")`.
  */
object LogStream {

  /** One micro-batch's state telemetry for one streaming query — the
    * digest behind [[StateAudit]]. `stateRows`/`rowsRemoved`/`rowsUpdated`
    * sum across the query's state operators; `batchDurationMs` is the
    * trigger-execution wall time.
    */
  final case class StateBatch(
      queryName: String,
      batchId: Long,
      inputRows: Long,
      batchDurationMs: Long,
      stateRows: Long,
      rowsRemoved: Long,
      rowsUpdated: Long,
      stateMemoryBytes: Long)

  /** Streaming state telemetry as an API (the r15 eviction-decade
    * measurement, made first-class the way `auditRecall` did for ANN
    * recall): attach one of these to a session, run streaming queries,
    * and read per-batch state-operator digests — state rows held,
    * removed, updated, memory, batch wall time. The plateau law every
    * watermarked operator must obey (state flat at the window bound
    * while cumulative input grows; removals ≈ one batch's mass) becomes
    * a direct assertion over [[batchesFor]] instead of ad-hoc listener
    * scripts.
    *
    * Listener delivery is async; [[awaitBatches]] bounds the wait for a
    * known number of progress events. Always [[close]] (removes the
    * listener) — instances are cheap and session-scoped.
    */
  final class StateAudit private[LogStream] (spark: SparkSession)
      extends AutoCloseable {
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[StateBatch]()
    private val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val ops = p.stateOperators
          buf.add(StateBatch(
            Option(p.name).getOrElse(""),
            p.batchId,
            p.numInputRows,
            Option(p.durationMs.get("triggerExecution"))
              .map(_.longValue).getOrElse(-1L),
            ops.map(_.numRowsTotal).sum,
            ops.map(_.numRowsRemoved).sum,
            ops.map(_.numRowsUpdated).sum,
            ops.map(_.memoryUsedBytes).sum))
        }
      }
    spark.streams.addListener(listener)

    /** All batches observed so far, oldest first. */
    def batches: Seq[StateBatch] = {
      val it = buf.iterator()
      val out = scala.collection.mutable.ArrayBuffer.empty[StateBatch]
      while (it.hasNext) out += it.next()
      out.sortBy(b => (b.queryName, b.batchId)).toSeq
    }

    /** Batches of the query started with `.queryName(name)`. */
    def batchesFor(name: String): Seq[StateBatch] =
      batches.filter(_.queryName == name)

    /** Wait (bounded) until `n` progress events for `name` have been
      * DELIVERED — processAllAvailable() returns when data is processed,
      * not when the async listener bus has drained.
      */
    def awaitBatches(name: String, n: Int, timeoutMs: Long = 30000L): Seq[StateBatch] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (batchesFor(name).size < n && System.nanoTime() < deadline)
        Thread.sleep(20L)
      val got = batchesFor(name)
      require(got.size >= n,
        s"saw ${got.size}/$n progress events for '$name' in ${timeoutMs}ms")
      got
    }

    override def close(): Unit = spark.streams.removeListener(listener)
  }

  /** Attach a [[StateAudit]] to the session. Caller closes. */
  def stateAudit(spark: SparkSession): StateAudit = new StateAudit(spark)

  /** Streaming log-line source over append-only Boom directories. */
  def readBoom(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.format("boom")
    (if (maxFilesPerTrigger > 0) r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r)
      .load(path)
  }

  /** Event-time column (epoch-ms long → TimestampType) for watermarking. */
  def withEventTime(lines: DataFrame): DataFrame =
    lines.withColumn("event_time", timestamp_millis(col("timestamp")))

  /** Streaming grep/search: the same predicate surface as the batch tools,
    * applied continuously.
    */
  def matching(lines: DataFrame, predicate: LogPredicate): DataFrame =
    lines.where(predicate.toColumn(col("message")))

  /** Windowed line counts with a watermark — the streaming analogue of the
    * reference's hour-partition rollups (A1/A3): tumbling windows over event
    * time, late data bounded by the watermark the way the reference bounded
    * it with the 10-minute directory quiesce (admin/LogMaintenance.java:80).
    */
  def windowedCounts(
      lines: DataFrame,
      windowDuration: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    withEventTime(lines)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDuration))
      .agg(count(lit(1)).as("n_lines"))
      .select(col("window.start").as("window_start"), col("n_lines"))

  /** Per-key session aggregates via custom state (mapGroupsWithState):
    * sessions close after `gapMs` of event-time silence or on timeout.
    * Emits one row per closed session.
    */
  case class SessionInput(key: String, eventTimeMs: Long)
  /** Internal: SessionInput + the watermarked event-time column (must remain
    * in the plan for EventTimeTimeout to be allowed).
    */
  case class SessionEvent(key: String, eventTimeMs: Long, et: Timestamp)
  /** All of a key's TENTATIVE sessions (disjoint, gap-separated, sorted by
    * start) — a session is only final once the watermark passes
    * `last + gap`, so every one inside the horizon must stay amendable.
    */
  case class SessionState(sessions: Seq[(Long, Long, Long)])
  case class SessionOutput(key: String, startMs: Long, endMs: Long, n: Long)

  def sessionize(
      events: Dataset[SessionInput],
      gapMs: Long = 30L * 60 * 1000,
      watermark: String = "10 minutes"): Dataset[SessionOutput] = {
    val spark = events.sparkSession
    import spark.implicits._
    // Event-time timeouts: a session also closes when the watermark passes
    // its last event + gap, so quiet keys don't hold state forever.
    val withWm = events.toDF()
      .withColumn("et", timestamp_millis(col("eventTimeMs")))
      .withWatermark("et", watermark)
      .as[SessionEvent]
    withWm
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOutput](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[SessionState]) =>
          // WATERMARK-FINAL emission (the session_window contract): a
          // gap-closed session is only a CANDIDATE until the watermark
          // passes last + gap — emitting it the moment a later event
          // opens the next session would lose out-of-order events that
          // are still inside the watermark (they belong to the emitted
          // session, but it's gone; worse, a negative-gap compare against
          // the newest session would merge them across the real gap).
          // State therefore holds EVERY in-horizon candidate session;
          // each batch folds new events in by sort-and-merge and flushes
          // exactly the sessions the watermark has made immutable.
          val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val incoming =
            if (state.hasTimedOut) Seq.empty
            else rows.map(e => (e.eventTimeMs, e.eventTimeMs, 1L)).toSeq
          val merged = (existing ++ incoming).sortBy(_._1)
            .foldLeft(List.empty[(Long, Long, Long)]) { (acc, s) =>
              acc match {
                case h :: tl if s._1 - h._2 <= gapMs =>
                  (h._1, math.max(h._2, s._2), h._3 + s._3) :: tl
                case _ => s :: acc
              }
            }.reverse
          val wm = state.getCurrentWatermarkMs()
          val (done, pending) = merged.partition(_._2 + gapMs <= wm)
          if (pending.nonEmpty) {
            state.update(SessionState(pending))
            // Earliest candidate's finality instant; > wm by construction.
            state.setTimeoutTimestamp(pending.map(_._2).min + gapMs)
          } else state.remove()
          done.iterator.map(d => SessionOutput(key, d._1, d._2, d._3))
      }
  }

  case class AnomalyInput(key: String, eventTimeMs: Long)
  /** Internal: AnomalyInput + the watermarked event-time column. */
  case class AnomalyEvent(key: String, eventTimeMs: Long, et: Timestamp)
  /** Per-key state: counts of still-open buckets + integer moments
    * (n, Σx, Σx²) of every bucket closed so far.
    */
  case class AnomalyMoments(open: Map[Long, Long], n: Long, s: Long, q: Long)
  case class AnomalyOutput(key: String, bucket: Long, cnt: Long, isAnomaly: Boolean)

  /** Online volume-anomaly detection — the continuous form of
    * [[graft.ops.Stats.volumeAnomalies]]: per key, count events into
    * fixed-width event-time buckets; when the watermark passes a bucket's
    * end the bucket is FINAL and is emitted with a verdict against the
    * key's history so far, then folded into the running moments.
    *
    * The verdict is the same pure-int64 inequality as the batch operator
    * ((n·x − S)² > z²(nQ − S²), see Stats.volumeAnomalies for the overflow
    * envelope), so replaying the same stream is fully deterministic — no
    * floating-point divergence across runs. The BASELINE differs from the
    * batch operator by design: each bucket here is judged ONLINE against
    * only the buckets closed before it (the information available at emit
    * time), while batch [[graft.ops.Stats.volumeAnomalies]] judges every
    * bucket against the full history including itself — so flags near the
    * start of a stream or around regime changes can legitimately differ
    * between the two. Buckets close in event-time order per key (closable
    * buckets are processed ascending), so the judging moments are exactly
    * the buckets before it. No verdict until `minHistory` buckets
    * have closed (early history flags everything — with one prior bucket,
    * σ = 0 and any change is "anomalous").
    *
    * State is one (map of open buckets + 3 longs) per key: open buckets are
    * bounded by the watermark horizon / bucketMs; the moments persist for
    * the key's lifetime — that long baseline is the point of the operator,
    * and state is bounded by key cardinality, not stream length. Events
    * later than the watermark (their bucket already closed) are dropped,
    * mirroring append-mode windowed aggregation.
    */
  def bucketAnomalies(
      events: Dataset[AnomalyInput],
      bucketMs: Long = 3600000L,
      z: Int = 2,
      minHistory: Int = 5,
      watermark: String = "10 minutes"): Dataset[AnomalyOutput] = {
    val spark = events.sparkSession
    import spark.implicits._
    val withWm = events.toDF()
      .withColumn("et", timestamp_millis(col("eventTimeMs")))
      .withWatermark("et", watermark)
      .as[AnomalyEvent]
    withWm
      .groupByKey(_.key)
      .flatMapGroupsWithState[AnomalyMoments, AnomalyOutput](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[AnomalyMoments]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(AnomalyMoments(Map.empty, 0L, 0L, 0L))
          // Fold this batch's events into open-bucket counts, dropping
          // too-late events whose bucket is already final.
          val open = rows.foldLeft(st0.open) { (m, e) =>
            val b = Math.floorDiv(e.eventTimeMs, bucketMs)
            if ((b + 1) * bucketMs <= wm) m
            else m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          val (closable, still) = open.partition { case (b, _) =>
            (b + 1) * bucketMs <= wm
          }
          var (n, s, q) = (st0.n, st0.s, st0.q)
          val out = closable.toSeq.sortBy(_._1).map { case (b, cnt) =>
            // BigInt verdict: unlike the batch operator, whose moments are
            // bounded by the dataset, this state accumulates for the key's
            // LIFETIME — on a long-running high-rate stream dev², s² and
            // n·q exceed int64 (s ≈ 3e9 after months at 1e6/bucket) and
            // plain Long verdicts would silently invert. Per closed
            // bucket, so the cost is noise.
            val dev = BigInt(n) * cnt - s
            val anom = n >= minHistory &&
              dev * dev > BigInt(z.toLong * z) * (BigInt(n) * q - BigInt(s) * s)
            n += 1; s += cnt; q += cnt * cnt
            AnomalyOutput(key, b, cnt, anom)
          }
          state.update(AnomalyMoments(still, n, s, q))
          // Wake up when the watermark can close the next open bucket, so a
          // key that goes quiet still flushes its pending buckets.
          if (still.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (still.keys.min + 1) * bucketMs, wm + 1))
          out.iterator
      }
  }

  private[streaming] case class EwmaState(
      open: Map[Long, Long], mFp: Long, vFp: Long, n: Long)
  case class EwmaOutput(key: String, bucket: Long, cnt: Long,
      ewmaFp: Long, ewvarFp: Long, isAnomaly: Boolean)

  /** Streaming EWMA rate monitor — the RECENT-REGIME member of the anomaly
    * pair: where [[bucketAnomalies]] judges each closed bucket against its
    * key's FULL history (a regime change poisons the baseline forever),
    * this keeps exponentially-weighted mean/variance with α = 2^-`alphaShift`
    * so the baseline tracks the last ~2^alphaShift buckets and recovers
    * after level shifts. All-integer fixed point (values carry 20
    * fractional bits; the smoothing step is a signed arithmetic shift, the
    * variance compare runs in BigInt so nothing overflows) — replaying the
    * same stream is bit-deterministic, kill/resume included.
    *
    * Bucket lifecycle is identical to [[bucketAnomalies]] (open buckets
    * bounded by the watermark horizon, closed in event-time order, judged
    * ONLINE against only the state before them, no verdict until
    * `minHistory` buckets closed); state per key is the open-bucket map
    * plus three longs — bounded by key cardinality, not stream length.
    */
  def ewmaAnomaliesStream(
      events: Dataset[AnomalyInput],
      bucketMs: Long = 3600000L,
      alphaShift: Int = 3,
      z: Int = 3,
      minHistory: Int = 5,
      watermark: String = "10 minutes"): Dataset[EwmaOutput] = {
    require(alphaShift >= 1 && alphaShift <= 16,
      s"alphaShift must be in [1, 16], got $alphaShift")
    val spark = events.sparkSession
    import spark.implicits._
    val withWm = events.toDF()
      .withColumn("et", timestamp_millis(col("eventTimeMs")))
      .withWatermark("et", watermark)
      .as[AnomalyEvent]
    withWm
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaOutput](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[EwmaState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(EwmaState(Map.empty, 0L, 0L, 0L))
          val open = rows.foldLeft(st0.open) { (m, e) =>
            val b = Math.floorDiv(e.eventTimeMs, bucketMs)
            if ((b + 1) * bucketMs <= wm) m
            else m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          val (closable, still) = open.partition { case (b, _) =>
            (b + 1) * bucketMs <= wm
          }
          var (mFp, vFp, n) = (st0.mFp, st0.vFp, st0.n)
          val out = closable.toSeq.sortBy(_._1).map { case (b, cnt) =>
            val xFp = cnt << 20
            val anom = if (n == 0L) {
              mFp = xFp; false
            } else {
              val devFp = xFp - mFp
              val flag = n >= minHistory &&
                BigInt(devFp) * devFp > BigInt(z.toLong * z) * (BigInt(vFp) << 20)
              mFp += devFp >> alphaShift
              // SATURATE the squared deviation: .toLong would wrap
              // negative once |dev| exceeds ~3e6 buckets-worth (one big
              // spike), driving vFp negative and flagging every later
              // bucket forever. A capped dev² keeps the EWMA variance
              // huge-but-sane and the state self-heals as it decays.
              val dev2Big = (BigInt(devFp) * devFp) >> 20
              val dev2Fp =
                if (dev2Big > Long.MaxValue) Long.MaxValue else dev2Big.toLong
              vFp += (dev2Fp - vFp) >> alphaShift
              flag
            }
            n += 1
            EwmaOutput(key, b, cnt, mFp, vFp, anom)
          }
          state.update(EwmaState(still, mFp, vFp, n))
          if (still.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (still.keys.min + 1) * bucketMs, wm + 1))
          out.iterator
      }
  }

  /** Streaming exact dedup: drop rows whose content hash was already seen
    * within the watermark horizon — the continuous form of
    * [[graft.ops.Dedup.exactDedup]] for ingest-time dedup of a document
    * stream. State is bounded by the watermark (Spark evicts seen-hash state
    * older than it), which is the correctness/memory trade every streaming
    * dedup makes: duplicates farther apart than `watermark` pass through and
    * are caught by the batch dedup that compacts the corpus anyway.
    *
    * @param df stream with an event-time column `eventTimeCol`
    *           (TimestampType) and the content column to dedup on
    */
  def dedupedStream(
      df: DataFrame,
      contentCol: String,
      eventTimeCol: String,
      watermark: String = "10 minutes"): DataFrame =
    df.withColumn("__h", md5(col(contentCol).cast("binary")))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Input contract for [[nearDupPairsStream]]. */
  case class NearDupInput(id: Long, text: String, eventTimeMs: Long)
  /** Internal: one row per (SimHash 16-bit block, doc). */
  private[streaming] case class NearDupEvent(
      bucket: Long, id: Long, sim: Long, eventTimeMs: Long, et: Timestamp)
  /** Per-bucket state: (id, simhash, eventTimeMs) of in-horizon members. */
  private[streaming] case class NearDupBucket(entries: List[(Long, Long, Long)])
  /** Emitted candidate pair (id_a arrived no later than id_b). */
  case class NearDupPair(id_a: Long, id_b: Long, hamming: Int, et: Timestamp)

  /** Streaming NEAR-duplicate pair detection — the continuous form of
    * [[graft.ops.Dedup.simhashDupePairs]], same LSH family: a 64-bit
    * SimHash per document, blocked into four 16-bit bands; docs sharing a
    * band bucket are compared by Hamming distance (≤ maxHamming needs the
    * shared-band pigeonhole, exactly the batch blocking guarantee for
    * distance ≤ 3).
    *
    * Each doc joins its four bucket groups; per-bucket state holds the
    * in-horizon members, bounded BOTH by the watermark (entries older than
    * it are pruned; an idle bucket's state dies by event-time timeout) and
    * by `maxBucketSize` (newest-kept cap — the streaming analogue of the
    * batch capped-bucket policy; an overfull bucket is boilerplate-shaped
    * and its oldest entries are the least likely future matches). A pair
    * sharing several bands is emitted once per shared band: Spark's
    * global-watermark correctness check (rightly) refuses a second
    * stateful dedup chained after flatMapGroupsWithState, so collapse the
    * multiplicity at the sink — an idempotent upsert keyed on
    * (id_a, id_b), or a batch `distinct` over the landed pairs (the batch
    * operator's own `distinct`, deferred).
    *
    * Duplicates farther apart than the watermark pass undetected and are
    * caught by the batch dedup that compacts the corpus — the identical
    * trade [[dedupedStream]] documents.
    */
  def nearDupPairsStream(
      docs: Dataset[NearDupInput],
      maxHamming: Int = 3,
      maxBucketSize: Int = 64,
      watermark: String = "10 minutes"): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Null text guard: simhash64(null) is null and fails the non-null
    // Long decode in NearDupEvent — poison pill, see kmvDistinctStream.
    val events = docs.filter((d: NearDupInput) => d.text != null).toDF()
      .withColumn("sim",
        graft.functions.TextFunctions.simhash64(
          graft.functions.TextFunctions.tokenize(col("text"))))
      .select(col("id"), col("sim"), col("eventTimeMs"),
        explode(expr(
          "transform(sequence(0, 3), i -> shiftleft(CAST(i AS BIGINT), 16)" +
            " + (shiftrightunsigned(sim, 16 * i) & 65535))")).as("bucket"))
      .withColumn("et", timestamp_millis(col("eventTimeMs")))
      .withWatermark("et", watermark)
      .as[NearDupEvent]
    events
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[NearDupBucket, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[NearDupBucket]) =>
          val wm = state.getCurrentWatermarkMs()
          // Horizon-prune surviving members first (watermark-bounded state).
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
            .filter(_._3 >= wm)
          val out = List.newBuilder[NearDupPair]
          // Deterministic processing order inside the micro-batch.
          rows.toSeq.sortBy(e => (e.eventTimeMs, e.id)).foreach { e =>
            if (e.eventTimeMs >= wm) {
              entries.foreach { case (pid, psim, pts) =>
                if (pid != e.id) {
                  val d = java.lang.Long.bitCount(psim ^ e.sim)
                  if (d <= maxHamming) {
                    // Earlier arrival (ts, then id) is id_a.
                    val aFirst = pts < e.eventTimeMs ||
                      (pts == e.eventTimeMs && pid < e.id)
                    out += (if (aFirst) NearDupPair(pid, e.id, d, e.et)
                      else NearDupPair(e.id, pid, d, e.et))
                  }
                }
              }
              entries = ((e.id, e.sim, e.eventTimeMs) :: entries)
                .sortBy(x => (-x._3, -x._1)).take(maxBucketSize)
            }
          }
          if (entries.isEmpty) state.remove()
          else {
            state.update(NearDupBucket(entries))
            // Die when the newest member ages out of the horizon.
            state.setTimeoutTimestamp(math.max(
              entries.map(_._3).max + 1, wm + 1))
          }
          out.result().iterator
      }
  }

  /** Input contract for [[budgetAdmission]]. */
  case class BudgetInput(source: String, id: Long, nTokens: Long, eventTimeMs: Long)
  /** Per-source running token spend. */
  private[streaming] case class BudgetState(used: Long)
  /** Admission verdict; `used_after` is the source's spend including this
    * document iff admitted.
    */
  case class BudgetVerdict(source: String, id: Long, nTokens: Long,
      admitted: Boolean, used_after: Long)

  /** Streaming token-budget admission — the continuous form of budgeted
    * sampling ([[graft.ops.Curation]]'s budget/mix family): each source
    * (domain, crawl, language) holds a running token spend in keyed state
    * and admits arriving documents until its `budgetPerSource` is
    * exhausted; later arrivals are emitted with `admitted = false` (audit
    * row, the mixCorpus emit-the-verdict convention) rather than silently
    * dropped. Admission order inside a micro-batch is deterministic —
    * (eventTimeMs, id) — so replays and restarts admit the same set; state
    * is one long per source, checkpoint-recoverable. A document larger
    * than the remaining budget is rejected and the budget stays intact
    * (no partial admission — training sequences need whole documents).
    */
  def budgetAdmission(
      docs: Dataset[BudgetInput],
      budgetPerSource: Long): Dataset[BudgetVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[BudgetState, BudgetVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[BudgetState]) =>
          var used = state.getOption.map(_.used).getOrElse(0L)
          val out = rows.toSeq.sortBy(r => (r.eventTimeMs, r.id)).map { d =>
            val fits = used + d.nTokens <= budgetPerSource
            if (fits) used += d.nTokens
            BudgetVerdict(source, d.id, d.nTokens, fits, used)
          }
          state.update(BudgetState(used))
          out.iterator
      }
  }

  /** Input contract for [[kmvDistinctStream]]. */
  case class DistinctInput(key: String, value: String, eventTimeMs: Long)
  /** Per-key KMV state: the ≤ k smallest distinct 48-bit hashes, ascending. */
  private[streaming] case class KmvState(mins: List[Long])
  /** Running distinct estimate for one key after a micro-batch. */
  case class DistinctEstimate(key: String, n_kept: Int, kth_hash: Long,
      est: Long)

  /** Streaming distinct-count estimation with BOUNDED state — the
    * continuous form of [[graft.ops.Sketches.kmvDistinct]], under the
    * IDENTICAL hash/estimator policy (first 48 bits of md5; est =
    * (k−1)·2⁴⁸/(h_k+1); exact below k), so the running estimate after any
    * prefix of the stream equals the batch sketch over the same rows —
    * the replayable contract an exact `count(DISTINCT)` cannot offer a
    * stream at all (its state is the value set itself, unbounded).
    * State per key is ≤ k longs, checkpoint-recoverable; each micro-batch
    * emits the key's updated estimate (Update-mode audit row).
    */
  def kmvDistinctStream(
      rows: Dataset[DistinctInput],
      k: Int = 64): Dataset[DistinctEstimate] = {
    require(k >= 3 && k <= 32768,
      s"k must be in [3, 32768] (the estimator's (k-1)<<48 must fit int64), got $k")
    val spark = rows.sparkSession
    import spark.implicits._
    // Null values are dropped like the batch op (Sketches.kmvDistinct's
    // isNotNull): a null reaching kmvHash48 would NPE inside the state
    // function — an UNRECOVERABLE poison pill, since restart replays the
    // same checkpointed batch and dies again.
    rows.filter((r: DistinctInput) => r.value != null).groupByKey(_.key)
      .mapGroupsWithState[KmvState, DistinctEstimate](
        GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[KmvState]) =>
          var mins = state.getOption.map(_.mins).getOrElse(Nil)
          it.foreach { r =>
            val h = kmvHash48(r.value)
            if (!mins.contains(h) &&
                (mins.size < k || h < mins.last)) {
              mins = (h :: mins).sorted.take(k)
            }
          }
          state.update(KmvState(mins))
          val nk = mins.size
          val kth = if (nk == 0) 0L else mins.last
          val est =
            if (nk < k) nk.toLong else ((k - 1).toLong << 48) / (kth + 1)
          DistinctEstimate(key, nk, kth, est)
      }
  }

  /** Internal: [[DistinctInput]] + the watermarked event-time column. */
  private[streaming] case class DistinctEvent(key: String, value: String,
      eventTimeMs: Long, et: Timestamp)
  /** Min-k hash state + the key's latest event time (the TTL anchor). */
  private[streaming] case class KmvTtlState(mins: List[Long], lastMs: Long)
  /** Per-batch running estimate; `expired = true` marks the FINAL report
    * emitted when the watermark passes lastMs + ttl and state is evicted.
    */
  case class DistinctWindowReport(key: String, n_kept: Int, kth_hash: Long,
      est: Long, expired: Boolean)

  /** [[kmvDistinctStream]] with EVENT-TIME TTL eviction — the shape that
    * survives an UNBOUNDED key space: per-key state is ≤ k longs AND its
    * lifetime is bounded (the watermark passing `last event + ttlMs`
    * emits the key's final estimate and removes the state), so total
    * state is O(k · active keys) rather than O(k · all keys ever seen) —
    * on a 100 TB/day stream the difference between a checkpoint that
    * grows forever and one that tracks the active set. A key seen again
    * after eviction starts a FRESH window (sketches merge, so a batch
    * job can still union per-window reports into lifetime estimates —
    * the min-k merge law).
    */
  def kmvDistinctStreamTtl(
      rows: Dataset[DistinctInput],
      k: Int = 64,
      ttlMs: Long = 3600000L,
      watermark: String = "10 minutes"): Dataset[DistinctWindowReport] = {
    require(k >= 3 && k <= 32768,
      s"k must be in [3, 32768] (the estimator's (k-1)<<48 must fit int64), got $k")
    require(ttlMs > 0, s"ttlMs must be > 0, got $ttlMs")
    val spark = rows.sparkSession
    import spark.implicits._
    // Null guard: same poison-pill rationale as kmvDistinctStream.
    val withWm = rows.filter((r: DistinctInput) => r.value != null).toDF()
      .withColumn("et", timestamp_millis(col("eventTimeMs")))
      .withWatermark("et", watermark)
      .as[DistinctEvent]
    def report(key: String, s: KmvTtlState, expired: Boolean)
        : DistinctWindowReport = {
      val nk = s.mins.size
      val kth = if (nk == 0) 0L else s.mins.last
      val est = if (nk < k) nk.toLong else ((k - 1).toLong << 48) / (kth + 1)
      DistinctWindowReport(key, nk, kth, est, expired)
    }
    withWm
      .groupByKey(_.key)
      .flatMapGroupsWithState[KmvTtlState, DistinctWindowReport](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state: GroupState[KmvTtlState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => report(key, s, expired = true))
            state.remove()
            out.iterator
          } else {
            var s = state.getOption.getOrElse(KmvTtlState(Nil, 0L))
            it.foreach { r =>
              val h = kmvHash48(r.value)
              if (!s.mins.contains(h) &&
                  (s.mins.size < k || h < s.mins.last)) {
                s = s.copy(mins = (h :: s.mins).sorted.take(k))
              }
              if (r.eventTimeMs > s.lastMs) s = s.copy(lastMs = r.eventTimeMs)
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs + ttlMs)
            Iterator.single(report(key, s, expired = false))
          }
      }
  }

  /** Per-key HLL state: the serialized updatable sketch. */
  private[streaming] case class HllState(sketch: Array[Byte])
  /** Per-batch running HLL estimate for a key. */
  case class HllDistinctReport(key: String, est: Long)

  /** Streaming distinct-count estimation via the SAME DataSketches HLL
    * family as the batch `hll_sketch_agg` behind
    * [[graft.ops.Sketches.hllAuditedDistinct]] — the third streaming
    * sketch next to KMV and CMS, for cardinalities far past KMV's
    * k-bounded sweet spot. Update policy matches Spark's batch string
    * path byte-for-byte (UTF-8 bytes; empty strings skipped). State per
    * key is the serialized sketch — ~2^lgConfigK bytes + header, 4.1 KB
    * at the default lgK = 12 / HLL_8 — independent of stream length and
    * value-space size; serialization round-trips the estimator state
    * exactly, so kill/resume is bit-equivalent (specced).
    *
    * Estimator note (measured; it matters when auditing against batch):
    * DataSketches HLL carries a HIP accumulator that sequential updates
    * maintain but sketch UNION cannot, so the batch `hll_sketch_agg`
    * estimate varies with partitioning (4915 vs 4865 over the same
    * 5000 values at lgK 12, 1 vs 13 partitions). This stream's per-key
    * updates are sequential, so its estimate equals the batch aggregate
    * over a single-partition frame bit-for-bit, and sits within the
    * family's error guarantee of any partitioned batch run.
    */
  def hllDistinctStream(
      rows: Dataset[DistinctInput],
      lgConfigK: Int = 12): Dataset[HllDistinctReport] = {
    require(lgConfigK >= 4 && lgConfigK <= 21,
      s"lgConfigK must be in [4, 21], got $lgConfigK")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.key)
      .mapGroupsWithState[HllState, HllDistinctReport](
        GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[HllState]) =>
          val sk = state.getOption
            .map(s => org.apache.datasketches.hll.HllSketch.heapify(s.sketch))
            .getOrElse(new org.apache.datasketches.hll.HllSketch(
              lgConfigK, org.apache.datasketches.hll.TgtHllType.HLL_8))
          it.foreach { r =>
            if (r.value != null && r.value.nonEmpty) {
              sk.update(r.value.getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
            }
          }
          state.update(HllState(sk.toUpdatableByteArray))
          HllDistinctReport(key, Math.round(sk.getEstimate))
      }
  }

  /** Input contract for [[quantilesStream]]: a per-key numeric metric. */
  case class ValueInput(key: String, value: Double, eventTimeMs: Long)
  /** Per-key GK summary state, flattened to encoder-friendly arrays. */
  private[streaming] case class GkState(
      vals: Array[Double], gs: Array[Long], deltas: Array[Long], count: Long)
  /** One quantile estimate for a key after a micro-batch. */
  case class QuantileReport(key: String, quantile: Double, est: Double,
      n: Long)

  /** Streaming quantiles with BOUNDED state — the rank member of the
    * streaming sketch family (frequency = CMS, cardinality = KMV/HLL,
    * rank = this), using the SAME Greenwald–Khanna summary Spark's batch
    * `approx_percentile` builds (so
    * [[graft.ops.Sketches.quantileProfile]]/`quartilesAudited`'s rank
    * guarantee carries over verbatim: SOME rank within ε·n of q·n).
    * State per key is the GK sampled tuples — O((1/ε)·log(ε·n))
    * (value, g, Δ) triples, a few KB at ε = 0.01 — independent of the
    * value-space size and checkpoint-recoverable.
    *
    * Determinism: GK is insertion-order-sensitive and a shuffled
    * micro-batch arrives in nondeterministic order, so each batch's
    * values are SORTED before insertion — per-key state becomes a pure
    * function of (previous state, batch multiset), which is what makes
    * the kill/resume spec an equality check rather than a tolerance
    * check. Each micro-batch emits the key's current estimates for every
    * requested quantile (Update-mode audit rows).
    */
  def quantilesStream(
      rows: Dataset[ValueInput],
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
      relativeError: Double = 0.01): Dataset[QuantileReport] = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q < 1),
      s"quantiles must be in (0, 1): $quantiles")
    require(relativeError > 0 && relativeError < 0.5,
      s"relativeError must be in (0, 0.5), got $relativeError")
    val spark = rows.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[GkState, QuantileReport](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[GkState]) =>
          var s = state.getOption
            .map { g =>
              new QuantileSummaries(
                QuantileSummaries.defaultCompressThreshold, relativeError,
                Array.tabulate(g.vals.length)(i =>
                  QuantileSummaries.Stats(g.vals(i), g.gs(i), g.deltas(i))),
                g.count, true)
            }
            .getOrElse(new QuantileSummaries(
              QuantileSummaries.defaultCompressThreshold, relativeError))
          it.toArray.map(_.value).sorted.foreach(v => s = s.insert(v))
          s = s.compress()
          state.update(GkState(s.sampled.map(_.value), s.sampled.map(_.g),
            s.sampled.map(_.delta), s.count))
          val n = s.count
          quantiles.iterator.map(q =>
            QuantileReport(key, q, s.query(q).getOrElse(Double.NaN), n))
      }
  }

  /** First 48 bits of md5 as a non-negative long — byte-for-byte the value
    * [[graft.ops.Sketches.kmvDistinct]]'s `substr(md5hex, 1, 12)` parses.
    */
  private[streaming] def kmvHash48(v: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) |
      ((d(2) & 0xFFL) << 24) | ((d(3) & 0xFFL) << 16) |
      ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
  }

  /** Input contract for [[driftStream]]: one observation of class `cls`
    * under monitoring key `key`.
    */
  case class DriftInput(key: String, cls: String)
  /** Per-key state: observed class counts. Bounded by the CLASS space
    * (the reference profile's key set — observations outside it count
    * into a single "other" bucket), not by stream length.
    */
  private[streaming] case class DriftState(counts: Map[String, Long])
  /** One per-batch drift report: χ²-style statistic in ppm against the
    * reference profile, over `n_obs` observations so far.
    */
  case class DriftReport(key: String, n_obs: Long, chi2_ppm: Long,
      drifted: Int)

  /** Streaming distribution-drift monitor — the observability op a
    * production ingest runs continuously (is today's crawl suddenly 40%
    * one language? did a source's event mix shift?): per key, observed
    * class counts against a BROADCAST reference profile, emitting the
    * integer-exact Pearson statistic
    *
    *   χ²·10⁶ ≈ Σ_c 10⁶·(o_c·R − O·r_c)² // (O·r_c·R)
    *
    * each micro-batch (computed in BigInt so no intermediate overflows;
    * the RESULT is a bounded ppm long). State per key is one count per
    * reference class (+ "other") — independent of stream length — and a
    * pure function of the observed multiset, so kill/resume is equality
    * and the statistic after any prefix equals the batch computation
    * over the same rows. Classes never seen in the reference fold into
    * "other" with a pseudo-reference of `otherRef` (0 disables — then
    * any unseen class drifts maximally via its own observed mass).
    */
  def driftStream(
      rows: Dataset[DriftInput],
      reference: Map[String, Long],
      driftThresholdPpm: Long,
      otherRef: Long = 1L): Dataset[DriftReport] = {
    require(reference.nonEmpty && reference.values.forall(_ > 0),
      "reference profile must be non-empty with positive counts")
    require(otherRef >= 0, s"otherRef must be >= 0, got $otherRef")
    val spark = rows.sparkSession
    import spark.implicits._
    val ref = reference // stable closure copy
    rows.groupByKey(_.key)
      .mapGroupsWithState[DriftState, DriftReport](
        GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[DriftState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
          it.foreach { r =>
            val c = if (ref.contains(r.cls)) r.cls else "__other"
            counts = counts.updated(c, counts.getOrElse(c, 0L) + 1L)
          }
          state.update(DriftState(counts))
          val o = counts.values.sum
          val withOther =
            if (counts.contains("__other") && otherRef > 0)
              ref.updated("__other", otherRef)
            else ref
          val r = withOther.values.sum
          val chi2 =
            if (o == 0) 0L
            else withOther.toSeq.sortBy(_._1).map { case (c, rc) =>
              val oc = BigInt(counts.getOrElse(c, 0L))
              val d = oc * r - BigInt(o) * rc
              // Terms grow ~linearly with n_obs and can pass Long range
              // under extreme drift (all-unseen classes at 10^7+ obs);
              // BigInt.toLong would WRAP NEGATIVE and report drifted=0 at
              // maximal drift. Saturate instead — past Long.MaxValue ppm
              // the only honest verdict is "drifted".
              (BigInt(1000000) * d * d / (BigInt(o) * rc * r))
                .min(BigInt(Long.MaxValue)).toLong
            }.reduceOption((a, b) =>
              if (a > Long.MaxValue - b) Long.MaxValue else a + b)
              .getOrElse(0L)
          DriftReport(key, o, chi2,
            if (chi2 > driftThresholdPpm) 1 else 0)
      }
  }

  /** Input contract for [[reservoirSampleStream]]. */
  case class SampleInput(key: String, id: Long)
  /** Per-key state: up to k (draw, id) pairs, ascending (draw, id). */
  private[streaming] case class ReservoirState(
      entries: List[(Long, Long)], nSeen: Long)
  /** A key's current sample after a micro-batch: ids in ascending
    * (draw, id) order — rank r of the batch operator's output is
    * `ids(r-1)`.
    */
  /** `n_seen` counts physical ROWS (duplicates/replays included — the
    * at-least-once delivery tally); the `ids` slate itself is
    * duplicate-proof via the (draw, id) pair dedup, so the SAMPLE matches
    * the batch operator while n_seen deliberately reports delivered rows,
    * not distinct ids.
    */
  case class ReservoirReport(key: String, n_seen: Long, ids: Seq[Long])

  /** Streaming per-key deterministic k-sample — the continuous form of
    * [[graft.ops.Curation.stratifiedSample]]: each stratum keeps the k
    * ids with the SMALLEST salted md5 draws (ties to the lower id),
    * which is a bottom-k ORDER STATISTIC, not RNG state — so after ANY
    * prefix of the stream the sample equals the batch operator's over
    * the same rows, batch boundaries and partitioning can't change it,
    * and kill/resume is pure equality (state is a function of the seen
    * row multiset). This is how a 100 TB/day pipeline maintains a
    * standing eval panel per language/domain without re-scanning
    * history: state per key is ≤ k (draw, id) pairs.
    */
  def reservoirSampleStream(
      rows: Dataset[SampleInput],
      k: Int,
      salt: String = "graft"): Dataset[ReservoirReport] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.key)
      .mapGroupsWithState[ReservoirState, ReservoirReport](
        GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[ReservoirState]) =>
          var e = state.getOption.map(_.entries).getOrElse(Nil)
          var seen = state.getOption.map(_.nSeen).getOrElse(0L)
          it.foreach { r =>
            seen += 1
            val d = kmvHash48(s"${r.id}-$salt")
            val pair = (d, r.id)
            // A repeated id re-derives the identical (draw, id) pair —
            // one slot, never two (the batch operator sees unique ids).
            if (!e.contains(pair) &&
                (e.size < k || implicitly[Ordering[(Long, Long)]]
                  .lt(pair, e.last))) {
              e = (pair :: e).sorted.take(k)
            }
          }
          state.update(ReservoirState(e, seen))
          ReservoirReport(key, seen, e.map(_._2))
      }
  }

  /** Input contract for [[cmsHeavyHittersStream]]. */
  case class TokenInput(key: String, token: String, eventTimeMs: Long)
  /** Per-key state: the serialized Count–Min sketch + the ≤ k current
    * heavy-hitter candidates (token, estimate).
    */
  private[streaming] case class CmsHhState(
      sketch: Array[Byte], cand: List[(String, Long)])
  /** One ranked heavy hitter for a key after a micro-batch. */
  case class HeavyHitterReport(key: String, token: String, est: Long,
      rank: Int)

  /** Streaming heavy hitters with BOUNDED state — the continuous form of
    * [[graft.ops.Sketches.cmsAuditedTopTokens]]: per key, a Count–Min
    * sketch (seeded, deterministic — the SAME structure Spark's batch
    * `count_min_sketch` aggregate builds, so after any prefix of the
    * stream the per-token estimate equals the batch sketch's over the
    * same rows; adds commute, so batch boundaries can't change it) plus
    * a ≤ k candidate list refreshed each batch as top-k by (estimate
    * desc, token asc) over (previous candidates ∪ this batch's tokens) —
    * the classic sketch+heap construction (Cormode & Muthukrishnan
    * 2005§4): a true heavy hitter is re-estimated on every arrival, so
    * it enters the list the batch its count qualifies.
    *
    * State per key is depth × width counter longs (depth =
    * ⌈ln(1/(1−confidence))⌉, width = ⌈2/eps⌉ — a few KB at the defaults)
    * + k candidate entries: independent of stream length AND vocabulary
    * size, checkpoint-recoverable (kill/resume equivalence is specced
    * like the KMV/near-dup streams). Each micro-batch emits the key's
    * full current top-k (Update-mode audit rows). CMS estimates only
    * ever OVER-count, so a displaced candidate was never under-ranked:
    * the list converges on the true heavy set as mass accumulates.
    */
  def cmsHeavyHittersStream(
      rows: Dataset[TokenInput],
      k: Int = 10,
      eps: Double = 0.01,
      confidence: Double = 0.99,
      seed: Int = 42): Dataset[HeavyHitterReport] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = rows.sparkSession
    import spark.implicits._
    // Null token guard: token.getBytes in the state fn would NPE (poison
    // pill); the batch op's tokenizer never emits null tokens.
    rows.filter((r: TokenInput) => r.token != null).groupByKey(_.key)
      .flatMapGroupsWithState[CmsHhState, HeavyHitterReport](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[CmsHhState]) =>
          val cms = state.getOption
            .map(s => org.apache.spark.util.sketch.CountMinSketch
              .readFrom(new java.io.ByteArrayInputStream(s.sketch)))
            .getOrElse(org.apache.spark.util.sketch.CountMinSketch
              .create(eps, confidence, seed))
          val batchTokens =
            scala.collection.mutable.LinkedHashSet.empty[String]
          it.foreach { r =>
            cms.add(r.token.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            batchTokens += r.token
          }
          val prev = state.getOption.map(_.cand.map(_._1)).getOrElse(Nil)
          val cand = (prev ++ batchTokens).distinct
            .map(t => t -> cms.estimateCount(t.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)))
            .sortBy { case (t, e) => (-e, t) }
            .take(k)
          val bos = new java.io.ByteArrayOutputStream()
          cms.writeTo(bos)
          state.update(CmsHhState(bos.toByteArray, cand))
          cand.iterator.zipWithIndex.map { case ((t, e), i) =>
            HeavyHitterReport(key, t, e, i + 1)
          }
      }
  }

  /** Per-key SpaceSaving state: exactly ≤ m (token, count, err) counters. */
  private[streaming] case class SsState(entries: List[(String, Long, Long)])
  /** One ranked SpaceSaving entry: `est` over-counts the true frequency by
    * at most `err` (est − err ≤ true ≤ est — a per-token certificate).
    */
  case class SpaceSavingReport(key: String, token: String, est: Long,
      err: Long, rank: Int)

  /** Streaming top-k via SpaceSaving (Metwally et al. 2005) — the
    * DETERMINISTIC-guarantee complement of [[cmsHeavyHittersStream]]:
    * where CMS gives probabilistic over-counts and a candidate list that
    * can transiently admit noise, SpaceSaving maintains EXACTLY m counters
    * and certifies, per reported token, est − err ≤ true count ≤ est —
    * and every token with true frequency > N/m is guaranteed tracked
    * (the summary is deterministic, no seed, no failure probability).
    * An untracked arrival evicts the minimum-count entry (tie: largest
    * token) and inherits its count as `err` — the classic
    * replace-the-minimum step.
    *
    * SpaceSaving does NOT commute, so order is pinned two ways: within a
    * micro-batch rows fold in (eventTimeMs, token) order (the partition
    * iterator order never reaches the fold — a batch is a deterministic
    * function of its row multiset), and across batches in arrival order —
    * replaying the same micro-batch sequence (kill/resume included)
    * reproduces every counter bit-for-bit. State per key is m entries —
    * independent of stream length and vocabulary; each batch emits the
    * key's current top-k by (count desc, token asc).
    */
  def spaceSavingStream(
      rows: Dataset[TokenInput],
      m: Int = 16,
      k: Int = 10): Dataset[SpaceSavingReport] = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(k >= 1 && k <= m, s"k must be in [1, m=$m], got $k")
    val spark = rows.sparkSession
    import spark.implicits._
    // Null token guard: the in-batch sortBy on token would NPE (poison
    // pill) — same rationale as cmsHeavyHittersStream.
    rows.filter((r: TokenInput) => r.token != null).groupByKey(_.key)
      .flatMapGroupsWithState[SsState, SpaceSavingReport](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[SsState]) =>
          val entries =
            scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
          state.getOption.foreach(_.entries.foreach {
            case (t, c, e) => entries(t) = (c, e)
          })
          it.toSeq.sortBy(r => (r.eventTimeMs, r.token)).foreach { r =>
            entries.get(r.token) match {
              case Some((c, e)) => entries(r.token) = (c + 1, e)
              case None if entries.size < m => entries(r.token) = (1L, 0L)
              case None =>
                val victim = entries.iterator.reduceLeft { (a, b) =>
                  if (b._2._1 < a._2._1 ||
                    (b._2._1 == a._2._1 && b._1 > a._1)) b else a
                }
                val vc = victim._2._1
                entries.remove(victim._1)
                entries(r.token) = (vc + 1, vc)
            }
          }
          state.update(SsState(entries.iterator.map {
            case (t, (c, e)) => (t, c, e)
          }.toList))
          entries.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k)
            .iterator.zipWithIndex.map { case ((t, (c, e)), i) =>
              SpaceSavingReport(key, t, c, e, i + 1)
            }
      }
  }

  /** One impression event (the left/earlier side of [[attributionJoin]]). */
  case class ImpressionInput(impId: Long, key: String, eventTimeMs: Long)
  /** One click event (the right/later side of [[attributionJoin]]). */
  case class ClickInput(clickId: Long, key: String, eventTimeMs: Long)

  /** Watermarked stream–stream attribution join — the canonical
    * two-stream pipeline (impression ⋈ click within an attribution
    * window), and the one Structured Streaming capability the rest of
    * this file's single-stream operators don't exercise: each click
    * matches impressions of the same key whose time t satisfies
    * t ≤ click < t + windowMs.
    *
    * State boundedness is the whole design: BOTH sides carry watermarks
    * and the join condition bounds click time relative to impression
    * time, so Spark derives state-eviction watermarks for each side —
    * buffered impressions are dropped once no future click can match
    * them (watermark past t + windowMs), buffered clicks once no
    * buffered impression can still claim them. Without the time bound
    * the join would buffer both streams FOREVER; with it, state is
    * O(events per attribution window), the difference between a
    * checkpoint that tracks the active window and one that holds the
    * whole day at 100 TB/day.
    *
    * `joinType` "inner" emits matches as they arrive; "left_outer" ALSO
    * emits each unclicked impression exactly once — with null click
    * columns — when the watermark proves no match can come (the
    * conversion-funnel "no-convert" row). Output: (key, imp_id, imp_ms,
    * click_id, click_ms, lag_ms).
    */
  def attributionJoin(
      impressions: Dataset[ImpressionInput],
      clicks: Dataset[ClickInput],
      windowMs: Long = 3600000L,
      watermark: String = "10 seconds",
      joinType: String = "inner"): DataFrame = {
    require(windowMs > 0, s"windowMs must be > 0, got $windowMs")
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val imp = impressions.toDF()
      .withColumn("__impTime", timestamp_millis(col("eventTimeMs")))
      .withWatermark("__impTime", watermark)
      .select(col("impId"), col("key").as("__impKey"),
        col("__impTime"), col("eventTimeMs").as("__impMs"))
    val clk = clicks.toDF()
      .withColumn("__clickTime", timestamp_millis(col("eventTimeMs")))
      .withWatermark("__clickTime", watermark)
      .select(col("clickId"), col("key").as("__clickKey"),
        col("__clickTime"), col("eventTimeMs").as("__clickMs"))
    imp.join(clk,
        col("__impKey") === col("__clickKey") &&
          col("__clickTime") >= col("__impTime") &&
          col("__clickTime") <
            col("__impTime") + expr(s"INTERVAL '$windowMs' MILLISECOND"),
        joinType)
      .select(col("__impKey").as("key"), col("impId").as("imp_id"),
        col("__impMs").as("imp_ms"), col("clickId").as("click_id"),
        col("__clickMs").as("click_ms"),
        (col("__clickMs") - col("__impMs")).as("lag_ms"))
  }

  /** Continuous ingest: text file stream → parsed log lines → Boom files.
    * (`foreachBatch` + the batch writer — the standard file-sink pattern for
    * a custom format.)
    *
    * EXACTLY-ONCE on replay: foreachBatch is at-least-once (a crash after
    * the batch write's job commit but before the streaming commit log
    * records the batch re-executes it on restart), and the batch writer
    * mints fresh UUID file names — so a naive write would duplicate the
    * whole replayed batch. Output is therefore keyed by batchId: each
    * batch writes to a hidden staging dir, any previous attempt's
    * `batch-<id>-*` files are removed, and the staged files promote under
    * batch-prefixed names — a replay converges on the same file set.
    * (Readers never see staging: `.`-prefixed dirs are filtered by
    * BoomDataSource.listFiles.)
    */
  def textToBoomStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val lines = spark.readStream.text(inputDir).as[String]
    graft.engine.Ingest.parse(lines)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[graft.core.LogLine], id: Long) =>
        val out = new org.apache.hadoop.fs.Path(outputDir)
        val fs = out.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        val stage = new org.apache.hadoop.fs.Path(out, s".batch-$id.stage")
        fs.delete(stage, true)
        graft.engine.Ingest.write(batch.toDF(), stage.toString)
        fs.mkdirs(out)
        // Remove a lost earlier attempt's promoted files, then promote.
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(out,
          s"batch-$id-*"))).foreach(_.foreach(s =>
          fs.delete(s.getPath, false)))
        fs.listStatus(stage).foreach { s =>
          val n = s.getPath.getName
          if (!n.startsWith("_") && !n.startsWith(".")) {
            if (!fs.rename(s.getPath, new org.apache.hadoop.fs.Path(out,
                s"batch-$id-$n")))
              throw new java.io.IOException(s"cannot promote ${s.getPath}")
          }
        }
        fs.delete(stage, true)
        ()
      }
      .start()
  }
}
