package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tool: split a query's wall time into driver phases —
  * DataFrame construction (the registered builder), analysis+optimization
  * (`optimizedPlan`), physical planning (`executedPlan`), and execution
  * (noop write) — run twice so warm-cache behavior is visible. Separates
  * "Catalyst re-plans this 200-node tree every run" from "the job is slow".
  *
  * Usage: `SPARK_GRAFT_CPUS=32 runMain graft.PhaseAudit <sfDir> q_a q_b …`
  */
object PhaseAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PhaseAudit <sfDir> <query> [query ...]")
    val sfDir = args.head
    val names = args.tail.toSeq
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
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    names.foreach { name =>
      (1 to 3).foreach { rep =>
        val (df, cons) = t(SparkEntry.queries(name)(spark, sfDir))
        val (_, opt) = t(df.queryExecution.optimizedPlan)
        val (_, phys) = t(df.queryExecution.executedPlan)
        val (_, exec) = t(df.write.format("noop").mode("overwrite").save())
        println(f"$name rep$rep construct=$cons%.3f optimize=$opt%.3f plan=$phys%.3f execute=$exec%.3f")
      }
    }
    spark.stop()
  }
}
