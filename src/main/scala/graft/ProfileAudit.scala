package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round tool: per-query execution-shape profile. For each
  * named registered query, runs the plan once (noop sink) and reports
  * wall seconds, Spark job count, stage count, task count, summed task
  * time, and shuffle bytes — the numbers that separate machinery-bound
  * queries (many tiny jobs/stages, task time << wall) from compute-bound
  * ones (task time ~ wall × cores). Emits one JSON line per query.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 runMain graft.ProfileAudit <sfDir> q_a q_b …`
  */
object ProfileAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileAudit <sfDir> <query> [query ...]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY_BYTES", "1m"))
      // Let AQE coalesce the materialization of persisted frames too
      // (default false keeps cached output partitioning fixed for reuse;
      // nothing here relies on cached partitioning, and without it every
      // persist site materializes at the raw shuffle-partition count).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED_PLAN", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_PROFILE_JOBS=1 → one stderr line per job (submit time,
    // wall, description) so inter-job DRIVER gaps are visible.
    val jobDetail = sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")
    object L extends SparkListener {
      @volatile var jobs = 0
      @volatile var stages = 0
      @volatile var tasks = 0
      @volatile var taskMs = 0L
      @volatile var shufWrite = 0L
      @volatile var shufRead = 0L
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (jobDetail) jobStart.put(j.jobId, (j.time,
          Option(j.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))).getOrElse("")))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (jobDetail) {
          Option(jobStart.remove(e.jobId)).foreach { case (t0, d) =>
            System.err.println(f"[job] id=${e.jobId} start=$t0 wall=${(e.time - t0) / 1e3}%.3fs $d")
          }
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val m = s.stageInfo.taskMetrics
        if (m != null && s.stageInfo.failureReason.isEmpty) {
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          shufRead += m.shuffleReadMetrics.totalBytesRead
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
      def snap() = (jobs, stages, tasks, taskMs, shufWrite, shufRead)
    }
    spark.sparkContext.addSparkListener(L)
    def drain(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus); ()
      } catch { case _: Throwable => Thread.sleep(500) }

    // Warmup pass (codegen + listing) so the profile isn't first-run noise.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[profile] warmup $n: $e") }
    }
    names.foreach { name =>
      drain()
      val (j0, s0, t0, tm0, w0, r0) = L.snap()
      val start = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[profile] $name: $e") }
      val wall = (System.nanoTime() - start) / 1e9
      drain()
      val (j1, s1, t1, tm1, w1, r1) = L.snap()
      println(f"""{"q":"$name","wall_s":$wall%.3f,"jobs":${j1 - j0},"stages":${s1 - s0},"tasks":${t1 - t0},"task_s":${(tm1 - tm0) / 1e3}%.3f,"shuf_write_mb":${(w1 - w0) / 1e6}%.1f,"shuf_read_mb":${(r1 - r0) / 1e6}%.1f}""")
    }
    spark.stop()
  }
}
