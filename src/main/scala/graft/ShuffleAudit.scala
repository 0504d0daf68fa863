package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Harness tool: measure the actual SHUFFLE VOLUME of registered queries —
  * the empirical check behind every "only (id, hash) rides the wire" claim
  * in the operator docs. For each named query it runs the plan once and
  * reports total shuffle bytes written/read across its stages (captured by
  * a SparkListener; a short drain pause lets the async bus flush before
  * the snapshot is read). Emits ONE JSON line:
  * `{"sf":..., "queries":{"name":{"write_mb":..,"read_mb":..},...}}`.
  *
  * Usage: `SPARK_GRAFT_CPUS=8 runMain graft.ShuffleAudit <sfDir> q_a q_b …`
  * SCALING.md records sf0.1-vs-sf1 shuffle growth for the heavy queries —
  * linear byte growth is the scale evidence wall-clock alone can't give
  * (time conflates scan, CPU, and exchange; bytes isolate the exchange).
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShuffleAudit <sfDir> <query> [query ...]")
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    object L extends SparkListener {
      @volatile var write = 0L
      @volatile var read = 0L
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          write += m.shuffleWriteMetrics.bytesWritten
          read += m.shuffleReadMetrics.totalBytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(L)

    def drained[T](body: => T): (Long, Long) = {
      Thread.sleep(300) // drain any prior async events
      val (w0, r0) = (L.write, L.read)
      body
      Thread.sleep(500) // listener bus is async; let the last stages land
      (L.write - w0, L.read - r0)
    }

    val rows = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val (w, r) = drained {
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
        }
        f"""\"$name\":{\"write_mb\":${w / 1e6}%.1f,\"read_mb\":${r / 1e6}%.1f}"""
      }
    }
    println(s"""{"sf":"$sfDir","queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
