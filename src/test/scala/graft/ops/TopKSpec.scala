package graft.ops

import graft.SparkTestBase
import graft.functions.TopKByScore.topk_by_score

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  // Deterministic pseudo-random scores with ties (v % 97) across many groups.
  private lazy val scored = spark.range(0, 5000).repartition(13)
    .select((col("id") % 7).as("query_id"), col("id").as("neighbor_id"),
      ((col("id") * 2654435761L) % 97).cast("double").as("cos"))

  test("topk aggregate equals the window formulation") {
    val viaAgg = scored.groupBy("query_id")
      .agg(topk_by_score(col("cos"), col("neighbor_id"), 5).as("t"))
      .select(col("query_id"), posexplode(col("t")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
    assert(viaAgg.collect().toSet === viaWindow.collect().toSet)
  }

  test("distinctIds keeps max score per id") {
    val df = Seq(
      (1L, 10L, 0.5), (1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.1))
      .toDF("query_id", "neighbor_id", "cos").repartition(3)
    val got = df.groupBy("query_id")
      .agg(topk_by_score(col("cos"), col("neighbor_id"), 2, distinctIds = true).as("t"))
      .select(posexplode(col("t")))
      .select(col("col.id"), col("col.score")).as[(Long, Double)].collect().toList
    assert(got === List((10L, 0.9), (11L, 0.7)))
  }

  test("fewer rows than k returns all, ordered") {
    val df = Seq((1L, 5L, 0.1), (1L, 6L, 0.3)).toDF("query_id", "neighbor_id", "cos")
    val got = df.groupBy("query_id")
      .agg(topk_by_score(col("cos"), col("neighbor_id"), 10).as("t"))
      .select(posexplode(col("t"))).select(col("col.id")).as[Long].collect().toList
    assert(got === List(6L, 5L))
  }

  test("bruteForceTopK plan has no Window exchange") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val plan = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      vecs.where($"vec_id" === 0), "vec_id", "embedding", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    // Partial (map-side) aggregation of the k-bounded buffers is present.
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
  }
}
