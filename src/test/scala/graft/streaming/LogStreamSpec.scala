package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.core.LogLine
import graft.engine.{Ingest, Search}
import graft.ops.Sketches

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class LogStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatch(dir: String, baseTs: Long, n: Int, tag: String): Unit =
    Ingest.write(
      (0 until n).map(i => LogLine(baseTs + i * 1000L, s"$tag line $i", 0, baseTs, 0L, i + 1L))
        .toDF().coalesce(1),
      dir)

  test("streaming exact dedup drops in-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("ts_ms", "text")
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
    val deduped = LogStream.dedupedStream(df, "text", "event_time")
    val q = deduped.writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      input.addData((1000L, "alpha"), (2000L, "beta"), (3000L, "alpha"))
      q.processAllAvailable()
      input.addData((4000L, "alpha"), (5000L, "gamma"))
      q.processAllAvailable()
      val got = spark.table("dedupstream").select("text").as[String].collect().sorted
      assert(got === Array("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("streaming near-dup pairs: simhash bands, dedup of band multiplicity") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "morning sun rises slowly over the quiet green valley below"
    val input = MemoryStream[LogStream.NearDupInput]
    val pairs = LogStream.nearDupPairsStream(input.toDS(), maxHamming = 3)
    val q = pairs.writeStream.format("memory").queryName("neardups")
      .outputMode("append").start()
    try {
      input.addData(
        LogStream.NearDupInput(1L, base, 1000L),
        LogStream.NearDupInput(2L, "completely different text about engines", 2000L))
      q.processAllAvailable()
      input.addData(
        LogStream.NearDupInput(3L, base, 3000L),                             // exact dup of 1
        LogStream.NearDupInput(4L, base.replace("jumps", "leaps"), 4000L))   // near dup
      q.processAllAvailable()
      val got = spark.table("neardups")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 3L)), s"exact dup must pair: $got")
      assert(got.exists(p => p._2 == 4L && (p._1 == 1L || p._1 == 3L)),
        s"near dup must pair: $got")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L),
        s"distinct doc must not pair: $got")
      // Identical docs share all 4 bands → multiplicity is bounded by 4
      // and collapses under the sink-side distinct (`got` above is a Set).
      val raw = spark.table("neardups").select("id_a", "id_b")
        .as[(Long, Long)].collect().toSeq
      val m = raw.groupBy(identity).map(_._2.size).max
      assert(m <= 4, s"per-pair multiplicity must be ≤ bands: $raw")
    } finally q.stop()
  }

  test("budgetAdmission enforces per-source token budgets across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogStream.BudgetInput]
    val verdicts = LogStream.budgetAdmission(input.toDS(), budgetPerSource = 10L)
    val q = verdicts.writeStream.format("memory").queryName("budget")
      .outputMode("append").start()
    try {
      input.addData(
        LogStream.BudgetInput("a", 1L, 4L, 1000L),
        LogStream.BudgetInput("a", 2L, 5L, 2000L),
        LogStream.BudgetInput("b", 3L, 9L, 1000L))
      q.processAllAvailable()
      input.addData(
        LogStream.BudgetInput("a", 4L, 2L, 3000L),  // 9 + 2 > 10 -> reject
        LogStream.BudgetInput("a", 5L, 1L, 4000L),  // 9 + 1 = 10 -> admit
        LogStream.BudgetInput("b", 6L, 1L, 2000L))  // 9 + 1 = 10 -> admit
      q.processAllAvailable()
      val got = spark.table("budget")
        .select("id", "admitted", "used_after")
        .as[(Long, Boolean, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
      assert(got(1L) === ((true, 4L)) && got(2L) === ((true, 9L)))
      assert(got(3L) === ((true, 9L)))
      assert(got(4L) === ((false, 9L)), "doc over remaining budget rejected, budget intact")
      assert(got(5L) === ((true, 10L)), "smaller later doc still admitted")
      assert(got(6L) === ((true, 10L)))
    } finally q.stop()
  }

  test("kmvDistinctStream: running estimate equals the batch sketch on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogStream.DistinctInput]
    val est = LogStream.kmvDistinctStream(input.toDS(), k = 8)
    val q = est.writeStream.format("memory").queryName("kmv")
      .outputMode("update").start()
    try {
      // Batch 1: 5 distinct values (below k → exact) + a duplicate.
      input.addData((1 to 5).map(i =>
        LogStream.DistinctInput("a", s"v$i", i * 1000L)) :+
        LogStream.DistinctInput("a", "v1", 6000L): _*)
      q.processAllAvailable()
      // Batch 2: push key a above k; key b stays tiny.
      input.addData(((6 to 40).map(i =>
        LogStream.DistinctInput("a", s"v$i", i * 1000L)) ++
        Seq(LogStream.DistinctInput("b", "x", 1000L),
          LogStream.DistinctInput("b", "x", 2000L))): _*)
      q.processAllAvailable()
      // Latest state per key: n_kept is monotone nondecreasing and each
      // batch here lands a distinct n_kept, so max-by-n_kept is the final.
      val last = spark.table("kmv")
        .groupBy("key").agg(max(struct(
          col("n_kept"), col("kth_hash"), col("est"))).as("s"))
        .select("key", "s.n_kept", "s.kth_hash", "s.est")
        .as[(String, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
      // Mid-stream row for key a after batch 1 was exact (n_kept 5, est 5).
      val aRows = spark.table("kmv").where(col("key") === "a")
        .select("n_kept", "est").as[(Int, Long)].collect().toSet
      assert(aRows.contains((5, 5L)))
      // Final states equal the BATCH sketch over the union of all rows.
      val batch = Sketches.kmvDistinct(
        ((1 to 5).map(i => ("a", s"v$i")) ++ Seq(("a", "v1")) ++
          (6 to 40).map(i => ("a", s"v$i")) ++ Seq(("b", "x"), ("b", "x")))
          .toDF("k", "v"), "k", "v", k = 8)
        .select("k", "n_kept", "kth_hash", "est")
        .as[(String, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
      assert(last("a")._2 === batch("a")._2)
      assert(last("a")._3 === batch("a")._3, "identical 48-bit md5 min-k")
      assert(last("a")._4 === batch("a")._4, "identical integer estimator")
      assert(last("b") === (("b", batch("b")._2, batch("b")._3, batch("b")._4)))
    } finally q.stop()
  }

  test("kmvDistinctStreamTtl: watermark evicts idle keys with a final report; reappearance starts fresh") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogStream.DistinctInput]
    val est = LogStream.kmvDistinctStreamTtl(input.toDS(), k = 8,
      ttlMs = 60000L, watermark = "0 seconds")
    val q = est.writeStream.format("memory").queryName("kmvttl")
      .outputMode("append").start()
    try {
      input.addData((1 to 5).map(i =>
        LogStream.DistinctInput("a", s"v$i", i * 1000L)): _*)
      q.processAllAvailable()
      // Advance the watermark far past a's last event (5000) + ttl via an
      // unrelated key; the timeout itself fires in the batch AFTER the
      // watermark moves.
      input.addData(LogStream.DistinctInput("w", "x", 200000L))
      q.processAllAvailable()
      input.addData(LogStream.DistinctInput("w", "x2", 201000L))
      q.processAllAvailable()
      val rows = spark.table("kmvttl")
        .as[LogStream.DistinctWindowReport].collect()
      val aFinal = rows.filter(r => r.key == "a" && r.expired)
      assert(aFinal.length === 1)
      assert(aFinal.head.n_kept === 5 && aFinal.head.est === 5L)
      // The evicted key restarts with EMPTY state.
      input.addData(LogStream.DistinctInput("a", "brand-new", 202000L))
      q.processAllAvailable()
      val after = spark.table("kmvttl")
        .as[LogStream.DistinctWindowReport].collect()
        .filter(r => r.key == "a" && !r.expired)
      assert(after.exists(_.n_kept == 1), after.mkString(","))
    } finally q.stop()
  }

  test("curation quality filters run unchanged on a stream (stateless narrow ops)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // The same Column-composition operators used in batch (c4Filter rules,
    // gopher filter, normalization, token stats) apply verbatim to a
    // readStream DataFrame — they are stateless projections, so Structured
    // Streaming runs them per micro-batch with no state store.
    val filtered = graft.ops.Curation.c4Filter(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      badWords = Seq("zap"), minSentences = 1, minLineWords = 2)
    val q = filtered.writeStream.format("memory").queryName("curationstream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "a clean doc with sentences."),
        (2L, "this one mentions zap here."),
        (3L, "no terminal punctuation"))
      q.processAllAvailable()
      val got = spark.table("curationstream").select("doc_id", "keep")
        .as[(Long, Int)].collect().toMap
      assert(got === Map(1L -> 1, 2L -> 0, 3L -> 0))
    } finally q.stop()
  }

  test("bloom decontamination filters a stream on arrival (stateless sketch probe)") {
    implicit val sqlCtx = spark.sqlContext
    // The benchmark sketch is built ONCE from a batch table; the resulting
    // operator is a stateless narrow projection (literal sketch + fused
    // BloomHitCount), so it applies verbatim to a readStream DataFrame —
    // decontamination-on-arrival with no state store and no join.
    val bench = Seq((100L, "the quick brown fox jumps high"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val scored = graft.ops.Curation.bloomDecontaminate(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      bench, "text", k = 3)
    val q = scored.writeStream.format("memory").queryName("bloomstream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely unrelated text about spark partitions"))
      q.processAllAvailable()
      input.addData((3L, "more text then the quick brown fox appears"))
      q.processAllAvailable()
      val got = spark.table("bloomstream").select("doc_id", "clean")
        .as[(Long, Int)].collect().toMap
      assert(got === Map(1L -> 0, 2L -> 1, 3L -> 0))
    } finally q.stop()
  }

  test("streaming boom source picks up appended files across batches") {
    val dir = Files.createTempDirectory("stream-boom").toString
    writeBatch(dir, 1700000000000L, 5, "first")

    val stream = LogStream.readBoom(spark, dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("boomstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("boomstream").count() === 5)

      writeBatch(dir, 1700000100000L, 3, "second")
      q.processAllAvailable()
      assert(spark.table("boomstream").count() === 8)
      assert(spark.table("boomstream")
        .where(col("message").startsWith("second")).count() === 3)
    } finally q.stop()
  }

  test("streaming predicate + windowed counts with watermark") {
    val dir = Files.createTempDirectory("stream-win").toString
    // two hour-windows of data: 10:00 and 11:00 on some day
    writeBatch(dir, 1700002800000L, 4, "needle")
    writeBatch(dir, 1700006400000L, 2, "needle")
    writeBatch(dir, 1700006400000L, 2, "hay")

    val counts = LogStream.windowedCounts(
      LogStream.matching(LogStream.readBoom(spark, dir), Search("needle")),
      windowDuration = "1 hour", watermark = "10 minutes")
    val q = counts.writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select(col("window_start").cast("long"), col("n_lines"))
        .as[(Long, Long)].collect().toMap
      assert(rows(1700002800L) === 4L)
      assert(rows(1700006400L) === 2L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap, " +
      "watermark-final, out-of-order safe") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogStream.SessionInput]
    val sessions = LogStream.sessionize(input.toDS(), gapMs = 60000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user A: two events close together, then a 5-minute gap, then one
      // more — but the first session must NOT emit before the watermark
      // (default 10 min) proves no late event can still join it.
      input.addData(
        LogStream.SessionInput("a", 1000L),
        LogStream.SessionInput("a", 30000L))
      q.processAllAvailable()
      input.addData(LogStream.SessionInput("a", 330000L))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0,
        "a candidate session is not final until the watermark passes")
      // A LATE out-of-order event (inside the watermark) extends the
      // FIRST session — the pre-fix code had already emitted it and
      // would have merged this event across the 5-minute silent gap.
      input.addData(LogStream.SessionInput("a", 45000L))
      q.processAllAvailable()
      // Advance the watermark far past everything: both sessions final.
      input.addData(LogStream.SessionInput("z", 10000000L))
      q.processAllAvailable()
      input.addData(LogStream.SessionInput("z", 20000000L))
      q.processAllAvailable()
      val out = spark.table("sessions")
        .as[LogStream.SessionOutput].collect().filter(_.key == "a")
        .sortBy(_.startMs)
      assert(out.toSeq === Seq(
        LogStream.SessionOutput("a", 1000L, 45000L, 3),
        LogStream.SessionOutput("a", 330000L, 330000L, 1)))
    } finally q.stop()
  }

  test("bucketAnomalies flags a spike online with the integer verdict") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogStream.AnomalyInput]
    val anomalies = LogStream.bucketAnomalies(input.toDS(),
      bucketMs = 1000L, z = 2, minHistory = 3, watermark = "0 seconds")
    val q = anomalies.writeStream.format("memory").queryName("anomalies")
      .outputMode("append").start()
    def feed(pairs: (String, Long)*): Unit = {
      input.addData(pairs.map { case (k, t) => LogStream.AnomalyInput(k, t) }: _*)
      q.processAllAvailable()
    }
    try {
      // Steady history: buckets 0..4 carry 2 events each for key "a".
      for (b <- 0L to 4L) feed(("a", b * 1000 + 10), ("a", b * 1000 + 500))
      // Spike: bucket 5 carries 20 events.
      feed((0 until 20).map(i => ("a", 5000L + i)): _*)
      // Post-spike normal bucket, then a far-future event to push the
      // watermark past everything pending.
      feed(("a", 6010L), ("a", 6500L))
      feed(("a", 100000L))
      val out = spark.table("anomalies").as[LogStream.AnomalyOutput]
        .collect().sortBy(_.bucket)
      val byBucket = out.map(o => o.bucket -> o).toMap
      // Buckets 0..4 and 6 are steady (cnt 2); only the spike is flagged,
      // and only after minHistory buckets closed (0..2 judged with n < 3).
      assert(out.map(o => (o.bucket, o.cnt)).toSeq ===
        (0L to 6L).map(b => (b, if (b == 5) 20L else 2L)))
      assert(byBucket(5L).isAnomaly)
      assert(out.filter(_.bucket != 5L).forall(!_.isAnomaly))
    } finally q.stop()
  }

  test("ewmaAnomaliesStream: spike flagged once, baseline adapts to a regime shift") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogStream.AnomalyInput]
    val out = LogStream.ewmaAnomaliesStream(input.toDS(),
      bucketMs = 1000L, alphaShift = 1, z = 3, minHistory = 3,
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("ewma")
      .outputMode("append").start()
    def feed(pairs: (String, Long)*): Unit = {
      input.addData(pairs.map { case (k, t) => LogStream.AnomalyInput(k, t) }: _*)
      q.processAllAvailable()
    }
    try {
      // Steady 2/bucket (0..4), spike 20 (5), new regime 10/bucket (6..12).
      for (b <- 0L to 4L) feed(("a", b * 1000 + 10), ("a", b * 1000 + 500))
      feed((0 until 20).map(i => ("a", 5000L + i)): _*)
      for (b <- 6L to 12L)
        feed((0 until 10).map(i => ("a", b * 1000 + i)): _*)
      feed(("a", 1000000L))
      val got = spark.table("ewma").as[LogStream.EwmaOutput]
        .collect().sortBy(_.bucket)
      val counts = (0L to 12L).map(b => if (b == 5) 20L else if (b >= 6) 10L else 2L)
      assert(got.map(o => (o.bucket, o.cnt)) === counts.zipWithIndex
        .map { case (c, b) => (b.toLong, c) })
      // exact replay of the integer recurrence
      var (m, v, n) = (0L, 0L, 0L)
      val exp = counts.map { x =>
        val xFp = x << 20
        val flag =
          if (n == 0L) { m = xFp; false }
          else {
            val dev = xFp - m
            val f = n >= 3 &&
              BigInt(dev) * dev > BigInt(9L) * (BigInt(v) << 20)
            m += dev >> 1
            val dev2 = ((BigInt(dev) * dev) >> 20).toLong
            v += (dev2 - v) >> 1
            f
          }
        n += 1
        (m, v, flag)
      }
      assert(got.map(o => (o.ewmaFp, o.ewvarFp, o.isAnomaly)).toSeq === exp)
      // only the spike is flagged — the EWMA baseline absorbs the regime
      // shift instead of flagging the new level forever
      assert(got.filter(_.isAnomaly).map(_.bucket).toSeq === Seq(5L))
    } finally q.stop()
  }

  test("nearDupPairsStream survives a restart: bucket state recovers from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("neardup-ckpt").toString
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "morning sun rises slowly over the quiet green valley below"
    val input = MemoryStream[LogStream.NearDupInput]
    val pairs = LogStream.nearDupPairsStream(input.toDS(), maxHamming = 3)
    // The memory sink refuses checkpoint recovery; foreachBatch (the
    // production sink shape for custom writers) supports it.
    def start(buf: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]) =
      pairs.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[LogStream.NearDupPair], _: Long) =>
            batch.collect().foreach(p => buf.add((p.id_a, p.id_b)))
        }.start()

    // Phase 1: two distinct docs — no pairs — then KILL the query.
    val buf1 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q1 = start(buf1)
    try {
      input.addData(
        LogStream.NearDupInput(1L, base, 1000L),
        LogStream.NearDupInput(2L, "completely different text about engines", 2000L))
      q1.processAllAvailable()
      assert(buf1.isEmpty)
    } finally q1.stop()

    // Phase 2: resume from the checkpoint; the new docs must pair against
    // PRE-restart bucket members (doc 1), proving state recovery — a lost
    // state store would emit nothing for (1, 3).
    val buf2 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q2 = start(buf2)
    try {
      input.addData(
        LogStream.NearDupInput(3L, base, 3000L),
        LogStream.NearDupInput(4L, base.replace("jumps", "leaps"), 4000L))
      q2.processAllAvailable()
      val got = scala.jdk.CollectionConverters
        .CollectionHasAsScala(buf2).asScala.toSet
      assert(got.contains((1L, 3L)), s"pre-restart member must pair: $got")
      assert(got.exists(p => p._2 == 4L && (p._1 == 1L || p._1 == 3L)),
        s"near dup must pair post-restart: $got")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L), s"no false pairs: $got")

      // Replay determinism: an uninterrupted run over the same four docs
      // emits exactly the same pair set (restart adds/loses nothing).
      val ref = MemoryStream[LogStream.NearDupInput]
      val qr = LogStream.nearDupPairsStream(ref.toDS(), maxHamming = 3)
        .writeStream.format("memory").queryName("neardup_ref")
        .outputMode("append").start()
      try {
        ref.addData(
          LogStream.NearDupInput(1L, base, 1000L),
          LogStream.NearDupInput(2L, "completely different text about engines", 2000L))
        qr.processAllAvailable()
        ref.addData(
          LogStream.NearDupInput(3L, base, 3000L),
          LogStream.NearDupInput(4L, base.replace("jumps", "leaps"), 4000L))
        qr.processAllAvailable()
        val refSet = spark.table("neardup_ref")
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        assert(got === refSet,
          s"restarted pair set must equal uninterrupted run: $got vs $refSet")
      } finally qr.stop()
    } finally q2.stop()
  }

  test("bucketAnomalies survives a restart: moments recover from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("anom-ckpt").toString
    val input = MemoryStream[LogStream.AnomalyInput]
    val anomalies = LogStream.bucketAnomalies(input.toDS(),
      bucketMs = 1000L, z = 2, minHistory = 3, watermark = "0 seconds")
    def start(buf: java.util.concurrent.ConcurrentLinkedQueue[LogStream.AnomalyOutput]) =
      anomalies.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[LogStream.AnomalyOutput], _: Long) =>
            batch.collect().foreach(buf.add)
        }.start()

    // Phase 1: five steady buckets (one event each) close; kill the query.
    val buf1 = new java.util.concurrent.ConcurrentLinkedQueue[LogStream.AnomalyOutput]()
    val q1 = start(buf1)
    try {
      input.addData((0L to 4L).map(b => LogStream.AnomalyInput("k", b * 1000 + 10)): _*)
      input.addData(LogStream.AnomalyInput("k", 6010L)) // wm → 6010 closes 0..4
      q1.processAllAvailable()
      val closed = scala.jdk.CollectionConverters
        .CollectionHasAsScala(buf1).asScala.toArray
      assert(closed.map(_.bucket).sorted === (0L to 4L).toArray)
      assert(closed.forall(!_.isAnomaly)) // steady history, early n < minHistory
    } finally q1.stop()

    // Phase 2: resume; a spike bucket closes post-restart and must be
    // judged against the PRE-restart moments (n=5 steady buckets). Lost
    // state would judge it with n < minHistory and stay silent.
    val buf2 = new java.util.concurrent.ConcurrentLinkedQueue[LogStream.AnomalyOutput]()
    val q2 = start(buf2)
    try {
      input.addData((0 until 10).map(i => LogStream.AnomalyInput("k", 7000L + i)): _*)
      input.addData(LogStream.AnomalyInput("k", 100000L)) // close 6 and 7
      q2.processAllAvailable()
      val out = scala.jdk.CollectionConverters
        .CollectionHasAsScala(buf2).asScala.toArray.sortBy(_.bucket)
      val byBucket = out.map(o => o.bucket -> o).toMap
      assert(byBucket(6L).cnt === 1L && !byBucket(6L).isAnomaly)
      assert(byBucket(7L).cnt === 10L && byBucket(7L).isAnomaly,
        s"spike must be judged against recovered moments: $out")
    } finally q2.stop()
  }

  test("cmsHeavyHittersStream: estimates equal the batch sketch; top-k finds the heavy set") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogStream.TokenInput]
    val hh = LogStream.cmsHeavyHittersStream(input.toDS(), k = 3,
      eps = 0.01, confidence = 0.99, seed = 42)
    val q = hh.writeStream.format("memory").queryName("cms_hh")
      .outputMode("update").start()
    // Token stream: "big" 30x, "mid" 12x, "low" 5x, singles as noise.
    val batch1 = (1 to 20).map(i => LogStream.TokenInput("a", "big", i * 100L)) ++
      (1 to 5).map(i => LogStream.TokenInput("a", "mid", i * 100L)) ++
      Seq(LogStream.TokenInput("a", "n1", 1L), LogStream.TokenInput("a", "n2", 2L))
    val batch2 = (1 to 10).map(i => LogStream.TokenInput("a", "big", i * 100L)) ++
      (1 to 7).map(i => LogStream.TokenInput("a", "mid", i * 100L)) ++
      (1 to 5).map(i => LogStream.TokenInput("a", "low", i * 100L)) ++
      Seq(LogStream.TokenInput("a", "n3", 3L))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // Final batch's ranked list: ranks re-emit per batch, so the final
      // estimate per (key, token) is the max (CMS estimates are monotone).
      val fin = spark.table("cms_hh")
        .groupBy("token").agg(max("est").as("est"))
        .as[(String, Long)].collect().toMap
      assert(fin.keySet.contains("big") && fin.keySet.contains("mid") &&
        fin.keySet.contains("low"))
      // Estimates equal Spark's BATCH count_min_sketch over the union of
      // all rows (same eps/confidence/seed — adds commute).
      val allTokens = (batch1 ++ batch2).map(_.token)
      val bytes = allTokens.toDF("token")
        .agg(expr("count_min_sketch(token, 0.01d, 0.99d, 42)"))
        .first().getAs[Array[Byte]](0)
      val batchCms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      val exact = allTokens.groupBy(identity).view.mapValues(_.size.toLong)
      for ((t, est) <- fin) {
        val b = batchCms.estimateCount(
          t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        assert(est === b, s"stream est for $t must equal batch sketch")
        assert(est >= exact(t), s"CMS never under-counts ($t)")
      }
      // The true heavy set occupies the top ranks of the LAST emission.
      val lastTop = spark.table("cms_hh")
        .groupBy("rank").agg(max(struct(col("est"), col("token"))).as("s"))
        .select(col("rank"), col("s.token"))
        .as[(Int, String)].collect().toMap
      assert(lastTop(1) === "big" && lastTop(2) === "mid" && lastTop(3) === "low")
    } finally q.stop()
  }

  test("hllDistinctStream: sequential estimate equals 1-partition batch agg; kill/resume bit-equivalent") {
    implicit val sqlCtx = spark.sqlContext
    val vals = (1 to 3000).map(i => s"v$i")
    val ckpt = Files.createTempDirectory("hll-ckpt").toString
    val input = MemoryStream[LogStream.DistinctInput]
    val est = LogStream.hllDistinctStream(input.toDS(), lgConfigK = 12)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def start() = est.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[LogStream.HllDistinctReport],
            _: Long) =>
          batch.collect().foreach(r => buf.add((r.key, r.est)))
      }.start()
    // Phase 1: first 1500 values (plus dups and an empty string Spark's
    // batch path also skips) — then KILL.
    val q1 = start()
    try {
      input.addData(vals.take(1500).map(v =>
        LogStream.DistinctInput("a", v, 1L)) ++
        Seq(LogStream.DistinctInput("a", "v1", 2L),
          LogStream.DistinctInput("a", "", 3L)): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // Phase 2: resume from checkpoint, stream the rest.
    val q2 = start()
    try {
      input.addData(vals.drop(1500).map(v =>
        LogStream.DistinctInput("a", v, 4L)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val streamFinal = scala.jdk.CollectionConverters
      .CollectionHasAsScala(buf).asScala.toList.last._2
    // The sequential-update (HIP) estimate equals the batch agg over a
    // SINGLE-partition frame — the partitioning-invariant formulation.
    val batchEst = vals.toDF("v").coalesce(1)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 12))"))
      .as[Long].head()
    assert(streamFinal === batchEst,
      s"stream $streamFinal vs 1-partition batch $batchEst")
    // And it is a real estimate: within the lgK=12 guarantee of truth.
    assert(math.abs(streamFinal - 3000L) <= math.ceil(3000 * 4 * 1.04 / 64),
      s"estimate $streamFinal outside HLL guarantee of 3000")
  }

  test("driftStream: hand-computed chi2, matching profile near zero; kill/resume equality") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ref = Map("a" -> 50L, "b" -> 50L)
    val ckpt = Files.createTempDirectory("drift-ckpt").toString
    val input = MemoryStream[LogStream.DriftInput]
    val est = LogStream.driftStream(input.toDS(), ref,
      driftThresholdPpm = 500000L)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Int)]()
    def start() = est.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[LogStream.DriftReport],
            _: Long) =>
          batch.collect().foreach(r =>
            buf.add((r.key, r.n_obs, r.chi2_ppm, r.drifted)))
      }.start()
    // key "ok": 10 a + 10 b (matches 50/50 → chi2 0). key "skew": first
    // batch 10 a only — then KILL mid-stream.
    val q1 = start()
    try {
      input.addData(
        Seq.fill(10)(LogStream.DriftInput("ok", "a")) ++
        Seq.fill(10)(LogStream.DriftInput("ok", "b")) ++
        Seq.fill(10)(LogStream.DriftInput("skew", "a")): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // Resume: 2 more a's + an unseen class for "skew".
    val q2 = start()
    try {
      input.addData(Seq.fill(2)(LogStream.DriftInput("skew", "a")) ++
        Seq(LogStream.DriftInput("skew", "zz")): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val finals = scala.jdk.CollectionConverters
      .CollectionHasAsScala(buf).asScala.toList
      .groupBy(_._1).map { case (k, xs) => k -> xs.last }
    assert(finals("ok")._3 === 0L && finals("ok")._4 === 0)
    // skew after resume: counts a=12, __other=1, O=13; ref {a:50, b:50,
    // __other:1}, R=101. Per class: 1e6·(oc·R − O·rc)² // (O·rc·R).
    val o = 13L; val r = 101L
    def term(oc: Long, rc: Long): Long =
      (BigInt(1000000) * BigInt(oc * r - o * rc) * BigInt(oc * r - o * rc) /
        (BigInt(o) * rc * r)).toLong
    val exp = term(12, 50) + term(0, 50) + term(1, 1)
    assert(finals("skew")._2 === 13L && finals("skew")._3 === exp)
    assert(finals("skew")._4 === 1, "a one-class stream must flag drifted")
  }

  test("reservoirSampleStream: final sample equals batch stratifiedSample; kill/resume equality") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ids = (1L to 500L)
    val ckpt = Files.createTempDirectory("res-ckpt").toString
    val input = MemoryStream[LogStream.SampleInput]
    val est = LogStream.reservoirSampleStream(input.toDS(), k = 7)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Seq[Long])]()
    def start() = est.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[LogStream.ReservoirReport],
            _: Long) =>
          batch.collect().foreach(r => buf.add((r.key, r.n_seen, r.ids)))
      }.start()
    // Phase 1: odd ids to stratum a, first 100 evens to b (plus a
    // repeated id, which must not occupy two slots) — then KILL.
    val q1 = start()
    try {
      input.addData(ids.filter(_ % 2 == 1).map(i =>
        LogStream.SampleInput("a", i)) ++
        ids.filter(_ % 2 == 0).take(100).map(i =>
          LogStream.SampleInput("b", i)) ++
        Seq(LogStream.SampleInput("a", 1L)): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // Phase 2: resume; the remaining evens.
    val q2 = start()
    try {
      input.addData(ids.filter(_ % 2 == 0).drop(100).map(i =>
        LogStream.SampleInput("b", i)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val finals = scala.jdk.CollectionConverters
      .CollectionHasAsScala(buf).asScala.toList
      .groupBy(_._1).map { case (k, xs) => k -> xs.last }
    // Batch truth: stratifiedSample over the SAME logical rows — rank r
    // is ids(r-1) in the stream report.
    val batch = graft.ops.Curation.stratifiedSample(
        ids.map(i => (i, if (i % 2 == 1) "a" else "b")).toDF("id", "s"),
        "id", "s", nPerStratum = 7)
      .orderBy("stratum", "rank")
      .as[(String, Long, Int)].collect().toSeq
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) }
    assert(finals("a")._3 === batch("a") && finals("b")._3 === batch("b"))
    assert(finals("a")._2 === 251L, "n_seen counts rows, including the dup")
    assert(finals("b")._2 === 250L)
  }

  test("attributionJoin: in-window clicks match; left_outer emits unclicked after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[LogStream.ImpressionInput]
    val clks = MemoryStream[LogStream.ClickInput]
    val joined = LogStream.attributionJoin(imps.toDS(), clks.toDS(),
      windowMs = 60000L, watermark = "0 seconds", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      imps.addData(LogStream.ImpressionInput(1L, "a", 10000L),
        LogStream.ImpressionInput(2L, "a", 20000L),
        LogStream.ImpressionInput(3L, "b", 10000L))
      clks.addData(LogStream.ClickInput(100L, "a", 15000L), // imp 1 only
        LogStream.ClickInput(101L, "a", 65000L), // imps 1 AND 2
        LogStream.ClickInput(102L, "b", 200000L)) // outside b's window
      q.processAllAvailable()
      // Advance BOTH watermarks well past 10000 + 60000 so imp 3's
      // no-match verdict becomes provable; the second advancing batch
      // flushes the outer row.
      imps.addData(LogStream.ImpressionInput(9L, "z", 500000L))
      clks.addData(LogStream.ClickInput(999L, "z", 500000L))
      q.processAllAvailable()
      imps.addData(LogStream.ImpressionInput(10L, "z", 900000L))
      clks.addData(LogStream.ClickInput(1000L, "z", 900000L))
      q.processAllAvailable()
      val rows = spark.table("attr").collect()
      val matched = rows.filter(!_.isNullAt(3))
        .map(r => (r.getLong(1), r.getLong(3), r.getLong(5))).toSet
      assert(matched.contains((1L, 100L, 5000L)))
      assert(matched.contains((1L, 101L, 55000L)),
        "a click attributes to EVERY in-window impression")
      assert(matched.contains((2L, 101L, 45000L)))
      assert(matched.contains((9L, 999L, 0L)))
      assert(!matched.exists(_._2 == 102L), "out-of-window click never matches")
      // imp 3 surfaces exactly once as an unclicked left-outer row.
      val unclicked = rows.filter(_.isNullAt(3)).map(_.getLong(1)).toSeq
      assert(unclicked === Seq(3L), s"rows: ${rows.mkString(";")}")
    } finally q.stop()
  }

  test("stateAudit: attributionJoin state plateaus at the window bound while input grows") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[LogStream.ImpressionInput]
    val clks = MemoryStream[LogStream.ClickInput]
    val joined = LogStream.attributionJoin(imps.toDS(), clks.toDS(),
      windowMs = 60000L, watermark = "10 seconds", joinType = "inner")
    val audit = LogStream.stateAudit(spark)
    val q = joined.writeStream.format("memory").queryName("attr_audit")
      .outputMode("append").start()
    try {
      val keys = (0 until 16).map(k => s"k$k")
      val rounds = 8
      val perKey = 10
      (0 until rounds).foreach { b =>
        val base = 1000000L + b * 30000L
        imps.addData(keys.flatMap(k => (0 until perKey).map(i =>
          LogStream.ImpressionInput(b * 100000L + i, k,
            base + i * 1000L))): _*)
        clks.addData(keys.flatMap(k => (0 until perKey).map(i =>
          LogStream.ClickInput(b * 100000L + i, k,
            base + i * 1000L + 500L))): _*)
        q.processAllAvailable()
      }
      // Each feed round yields ≥1 progress event; wait for the async
      // listener bus to deliver them all.
      val all = audit.awaitBatches("attr_audit", rounds)
      val data = all.filter(_.inputRows > 0)
      assert(data.size >= rounds - 1, s"data batches: ${data.size}")
      // Plateau law: once the window fills (~2 rounds = 60 s span), state
      // rows go FLAT while cumulative input keeps growing, and evictions
      // run at a constant per-round mass — the watermark, not the feed,
      // bounds the checkpoint.
      val tail = data.takeRight(3)
      assert(tail.map(_.stateRows).distinct.size === 1,
        s"state not flat: ${data.map(b => b.batchId -> b.stateRows)}")
      // Evictions happen in the NO-DATA batches Spark runs after a data
      // batch advances the watermark — find them there, and require the
      // per-round eviction mass to settle to a constant.
      val evicting = all.filter(_.rowsRemoved > 0)
      assert(evicting.size >= 3,
        s"too few eviction batches: ${all.map(b =>
          (b.batchId, b.inputRows, b.rowsRemoved))}")
      assert(evicting.takeRight(3).map(_.rowsRemoved).distinct.size === 1,
        s"evictions not constant: ${evicting.map(_.rowsRemoved)}")
      val cumulative = data.map(_.inputRows).sum
      assert(tail.last.stateRows < cumulative,
        "state must be bounded below cumulative input")
      assert(tail.forall(_.batchDurationMs >= 0))
      assert(tail.forall(_.stateMemoryBytes > 0))
    } finally { q.stop(); audit.close() }
  }

  test("quantilesStream: GK rank guarantee holds; kill/resume equals uninterrupted") {
    implicit val sqlCtx = spark.sqlContext
    // Deterministic value stream: a scrambled permutation of 1..2000.
    val vals = (1 to 2000).map(i => ((i * 997) % 2000 + 1).toDouble)
    val (p1, p2) = vals.splitAt(1200)
    val eps = 0.01

    def run(restart: Boolean): Map[Double, (Double, Long)] = {
      val ckpt = Files.createTempDirectory("gk-ckpt").toString
      val input = MemoryStream[LogStream.ValueInput]
      val est = LogStream.quantilesStream(input.toDS(),
        quantiles = Seq(0.25, 0.5, 0.75), relativeError = eps)
      val buf =
        new java.util.concurrent.ConcurrentLinkedQueue[(Double, Double, Long)]()
      def start() = est.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[LogStream.QuantileReport],
              _: Long) =>
            batch.collect().foreach(r => buf.add((r.quantile, r.est, r.n)))
        }.start()
      val q1 = start()
      try {
        input.addData(p1.map(v => LogStream.ValueInput("a", v, 1L)): _*)
        q1.processAllAvailable()
        if (!restart) {
          input.addData(p2.map(v => LogStream.ValueInput("a", v, 2L)): _*)
          q1.processAllAvailable()
        }
      } finally q1.stop()
      if (restart) {
        val q2 = start()
        try {
          input.addData(p2.map(v => LogStream.ValueInput("a", v, 2L)): _*)
          q2.processAllAvailable()
        } finally q2.stop()
      }
      // Final report per quantile = the n=2000 rows.
      scala.jdk.CollectionConverters.CollectionHasAsScala(buf).asScala
        .filter(_._3 == 2000L).map(r => r._1 -> (r._2, r._3)).toMap
    }

    val straight = run(restart = false)
    assert(straight.keySet === Set(0.25, 0.5, 0.75))
    // GK rank guarantee against the exact distribution 1..2000.
    straight.foreach { case (q, (est, n)) =>
      val rank = est // values ARE their ranks here
      assert(math.abs(rank - q * n) <= eps * n + 1,
        s"q=$q est=$est outside GK guarantee for n=$n")
    }
    // Kill/resume bit-equivalence (sorted-batch insertion makes state a
    // pure function of (prev state, batch multiset)).
    val resumed = run(restart = true)
    assert(resumed === straight)
  }

  test("cmsHeavyHittersStream survives a restart: sketch recovers from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("cms-ckpt").toString
    val input = MemoryStream[LogStream.TokenInput]
    val hh = LogStream.cmsHeavyHittersStream(input.toDS(), k = 2,
      eps = 0.01, confidence = 0.99, seed = 42)
    type Report = (Long, String, String, Long, Int)
    def start(buf: java.util.concurrent.ConcurrentLinkedQueue[Report]) =
      hh.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[LogStream.HeavyHitterReport],
              id: Long) =>
            batch.collect().foreach(r =>
              buf.add((id, r.key, r.token, r.est, r.rank)))
        }.start()

    // Phase 1: "big" dominates — then KILL the query.
    val buf1 = new java.util.concurrent.ConcurrentLinkedQueue[Report]()
    val q1 = start(buf1)
    try {
      input.addData((1 to 10).map(i =>
        LogStream.TokenInput("a", "big", i * 100L)) :+
        LogStream.TokenInput("a", "mid", 1L): _*)
      q1.processAllAvailable()
    } finally q1.stop()

    // Phase 2: resume; "mid" gains 5 more — its estimate must include the
    // PRE-restart occurrence (6, not 5), proving sketch recovery.
    val buf2 = new java.util.concurrent.ConcurrentLinkedQueue[Report]()
    val q2 = start(buf2)
    try {
      input.addData((1 to 5).map(i =>
        LogStream.TokenInput("a", "mid", i * 100L)): _*)
      q2.processAllAvailable()
      val got = scala.jdk.CollectionConverters
        .CollectionHasAsScala(buf2).asScala.toList
      val mid = got.filter(_._3 == "mid").map(r => (r._4, r._5)).toSet
      assert(mid === Set((6L, 2)),
        s"mid must carry its pre-restart count at rank 2: $got")

      // Replay determinism: an uninterrupted run over the same batches
      // ends with the identical final ranking and estimates.
      val ref = MemoryStream[LogStream.TokenInput]
      val qr = LogStream.cmsHeavyHittersStream(ref.toDS(), k = 2,
          eps = 0.01, confidence = 0.99, seed = 42)
        .writeStream.format("memory").queryName("cms_hh_ref")
        .outputMode("update").start()
      try {
        ref.addData((1 to 10).map(i =>
          LogStream.TokenInput("a", "big", i * 100L)) :+
          LogStream.TokenInput("a", "mid", 1L): _*)
        qr.processAllAvailable()
        ref.addData((1 to 5).map(i =>
          LogStream.TokenInput("a", "mid", i * 100L)): _*)
        qr.processAllAvailable()
        val refFinal = spark.table("cms_hh_ref")
          .groupBy("token").agg(max("est").as("est"))
          .as[(String, Long)].collect().toSet
        // Final estimate per token across both phases (CMS monotone).
        val gotFinal =
          (scala.jdk.CollectionConverters.CollectionHasAsScala(buf1).asScala ++
            scala.jdk.CollectionConverters.CollectionHasAsScala(buf2).asScala)
            .groupBy(_._3).map { case (t, rs) => (t, rs.map(_._4).max) }.toSet
        assert(gotFinal === refFinal,
          s"restarted run must match uninterrupted: $gotFinal vs $refFinal")
      } finally qr.stop()
    } finally q2.stop()
  }

  test("streaming text-to-boom ingest") {
    val in = Files.createTempDirectory("stream-in").toString
    val out = Files.createTempDirectory("stream-out").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    Files.writeString(java.nio.file.Paths.get(s"$in/batch1.log"),
      "2024-01-01T00:00:01Z hello\n2024-01-01T00:00:02Z world\n")
    val q = LogStream.textToBoomStream(spark, in, out, ckpt)
    try {
      q.processAllAvailable()
      val back = spark.read.format("boom").load(out)
      assert(back.count() === 2)
      assert(back.select("message").as[String].collect().toSet === Set("hello", "world"))
    } finally q.stop()
  }

  test("streaming text-to-boom ingest: batch replay converges (exactly-once)") {
    val in = Files.createTempDirectory("replay-in").toString
    val out = Files.createTempDirectory("replay-out").toString
    Files.writeString(java.nio.file.Paths.get(s"$in/batch1.log"),
      "2024-01-01T00:00:01Z hello\n2024-01-01T00:00:02Z world\n")
    val q1 = LogStream.textToBoomStream(spark, in, out,
      Files.createTempDirectory("replay-ckpt1").toString)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.format("boom").load(out).count() === 2)
    // A FRESH checkpoint re-delivers the same input as batch 0 — the
    // crash-before-streaming-commit replay shape. The batchId-keyed
    // promotion must replace batch 0's files, not append next to them.
    val q2 = LogStream.textToBoomStream(spark, in, out,
      Files.createTempDirectory("replay-ckpt2").toString)
    try q2.processAllAvailable() finally q2.stop()
    val back = spark.read.format("boom").load(out)
    assert(back.count() === 2)
    assert(back.select("message").as[String].collect().toSet ===
      Set("hello", "world"))
  }

  test("spaceSavingStream: hand eviction trace with m = 2") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a, a, b, c in time order: c evicts b (min count, err inherited) →
    // entries a(2,0), c(2,1); ranks by (count desc, token asc).
    val input = MemoryStream[LogStream.TokenInput]
    val ss = LogStream.spaceSavingStream(input.toDS(), m = 2, k = 2)
    val q = ss.writeStream.format("memory").queryName("ss_hand")
      .outputMode("update").start()
    try {
      input.addData(
        LogStream.TokenInput("a", "a", 1L), LogStream.TokenInput("a", "a", 2L),
        LogStream.TokenInput("a", "b", 3L), LogStream.TokenInput("a", "c", 4L))
      q.processAllAvailable()
      val got = spark.table("ss_hand").as[LogStream.SpaceSavingReport]
        .collect().map(r => (r.rank, r.token, r.est, r.err)).toSet
      assert(got === Set((1, "a", 2L, 0L), (2, "c", 2L, 1L)))
    } finally q.stop()
  }

  test("spaceSavingStream: certificates hold, heavy set tracked, kill/resume equality") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    var t = 0L
    def rows(spec: Seq[(String, Int)]): Seq[LogStream.TokenInput] =
      spec.flatMap { case (tok, n) => (1 to n).map { _ =>
        t += 1; LogStream.TokenInput("a", tok, t)
      } }
    val phaseA = rows(Seq("h1" -> 15, "h2" -> 10) ++
      (1 to 10).map(i => s"s$i" -> 1))
    val phaseB = rows(Seq("h1" -> 15, "h2" -> 10, "mid" -> 8) ++
      (11 to 20).map(i => s"s$i" -> 1))
    val truth = (phaseA ++ phaseB).groupBy(_.token)
      .view.mapValues(_.size.toLong).toMap
    def drive(restart: Boolean): Seq[(String, Long, Long, Int)] = {
      val ckpt = Files.createTempDirectory("ss-ckpt").toString
      val input = MemoryStream[LogStream.TokenInput]
      val ss = LogStream.spaceSavingStream(input.toDS(), m = 8, k = 8)
      @volatile var last: Seq[(String, Long, Long, Int)] = Nil
      def start() = ss.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[LogStream.SpaceSavingReport],
              _: Long) =>
            val rows = b.collect().map(r => (r.token, r.est, r.err, r.rank))
            if (rows.nonEmpty) last = rows.toSeq.sortBy(_._4)
        }.start()
      val q1 = start()
      input.addData(phaseA: _*); q1.processAllAvailable()
      val q2 = if (restart) { q1.stop(); start() } else q1
      try { input.addData(phaseB: _*); q2.processAllAvailable() }
      finally q2.stop()
      last
    }
    val resumed = drive(restart = true)
    val straight = drive(restart = false)
    assert(resumed === straight, "checkpoint restart must not change state")
    // Per-token certificate: est − err ≤ true ≤ est.
    resumed.foreach { case (tok, est, err, _) =>
      val tr = truth(tok)
      assert(tr <= est && tr >= est - err, s"$tok: true $tr vs ($est, $err)")
    }
    // Every token with frequency > N/m is guaranteed tracked, in order.
    assert(resumed.take(3).map(_._1) === Seq("h1", "h2", "mid"))
    assert(resumed.head._2 >= 30L)
  }
}
