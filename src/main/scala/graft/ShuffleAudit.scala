package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Harness tool: measure the actual SHUFFLE VOLUME of registered queries —
  * the empirical check behind every "only (id, hash) rides the wire" claim
  * in the operator docs. For each named query it runs the plan once and
  * reports total shuffle bytes written/read across its stages (captured by
  * a SparkListener; the async bus is drained via waitUntilEmpty — with a
  * sleep fallback — before each snapshot is read, so late stage events
  * cannot leak into the next query's delta). Emits ONE JSON line:
  * `{"sf":..., "queries":{"name":{"write_mb":..,"read_mb":..},...}}`.
  *
  * Usage: `SPARK_GRAFT_CPUS=8 runMain graft.ShuffleAudit <sfDir> q_a q_b …`
  * SCALING.md records sf0.1-vs-sf1 shuffle growth for the heavy queries —
  * linear byte growth is the scale evidence wall-clock alone can't give
  * (time conflates scan, CPU, and exchange; bytes isolate the exchange).
  */
object ShuffleAudit {

  /** Run `body` once and return the (shuffle bytes written, read) its
    * stages produced on this session — the engine behind both the CLI
    * audit and PlanAuditSpec's shuffle-budget regression net. A listener
    * is attached for the duration and the async bus is drained before
    * each snapshot so earlier jobs' late events don't pollute the delta.
    */
  def measure(spark: SparkSession)(body: => Unit): (Long, Long) = {
    object L extends SparkListener {
      @volatile var write = 0L
      @volatile var read = 0L
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null && s.stageInfo.failureReason.isEmpty) {
          write += m.shuffleWriteMetrics.bytesWritten
          read += m.shuffleReadMetrics.totalBytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(L)
    try {
      drainBus(spark)
      val (w0, r0) = (L.write, L.read)
      body
      drainBus(spark)
      (L.write - w0, L.read - r0)
    } finally spark.sparkContext.removeSparkListener(L)
  }

  // listenerBus.waitUntilEmpty is private[spark]; reflection with a
  // bounded-sleep fallback keeps the snapshot boundaries exact without
  // depending on a fixed 500 ms being enough under GC/backlog.
  private def drainBus(spark: SparkSession): Unit = {
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      val waited =
        try { bus.getClass.getMethod("waitUntilEmpty").invoke(bus); true }
        catch {
          case _: NoSuchMethodException =>
            try {
              bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
                .invoke(bus, java.lang.Long.valueOf(30000L))
              true
            } catch { case _: NoSuchMethodException => false }
        }
      if (!waited) Thread.sleep(500)
    } catch { case _: Throwable => Thread.sleep(500) }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShuffleAudit <sfDir> <query> [query ...]")
    val sfDir = args.head
    val names = args.tail
    // Fail loudly on a typo'd name — flatMap-over-get would print a
    // successful-looking JSON that silently measured nothing.
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def mb(v: Long): String =
      String.format(java.util.Locale.ROOT, "%.1f",
        java.lang.Double.valueOf(v / 1e6))
    def q(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      val (w, r) = measure(spark) {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
      }
      s"""${q(name)}:{"write_mb":${mb(w)},"read_mb":${mb(r)}}"""
    }
    println(s"""{"sf":${q(sfDir)},"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
