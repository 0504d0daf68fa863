package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query end-to-end at
  * SPARK_GRAFT_SF_DIR. Each query executes against the `noop` sink — a real
  * write of every result row — so Catalyst cannot optimize away sorts or
  * column projections the way it can under `count()` (which prunes to zero
  * columns and drops top-level ordering). The one-line JSON result goes to
  * stdout AND to bench_result.json (override with SPARK_GRAFT_BENCH_JSON) so
  * harnesses don't have to fish it out of build-tool log prefixes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up session machinery (parquet reader init, codegen compiler, JIT)
    // so the first timed query doesn't absorb one-time costs.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // One untimed run per query first (codegen compile, file-listing and
    // shuffle-file warmup), then MEDIAN of `reps` timed runs — a single
    // timed execution leaves sub-second queries ±30% noisy (cold-cache and
    // host-load spikes dominated round-over-round comparisons), and the
    // median is robust to a one-off straggler where the mean is not. The
    // per-query minimum is reported alongside as the load-independent floor.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Local-iteration filter: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just
    // those queries. Unset (the driver's invocation) → the full set.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def run(): Unit = fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      try run() catch { case _: Throwable => () }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try run()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> ((times(times.length / 2), times.head))
    }
    // The stdout line must stay SHORT: the harness keeps only the last 2000
    // characters of output, so a line carrying two full per-query maps at
    // 9-decimal precision gets truncated mid-line and fails to parse. Emit
    // millisecond precision and the median map only; the per-query minima and
    // full precision go to the JSON file instead.
    def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def toJson(sel: ((Double, Double)) => Double, f: Double => String): String =
      results.map { case (k, v) => s"\"" + k + "\":" + f(sel(v)) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${toJson(_._1, fmt)},"sf":"$sfDir"}"""
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","queries":${toJson(_._1, _.toString)},"queries_min":${toJson(_._2, _.toString)},"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_JSON", "bench_result.json")
    Files.writeString(Paths.get(outPath), fullJson + "\n")
    println(json)
    spark.stop()
  }
}
