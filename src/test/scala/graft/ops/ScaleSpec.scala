package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without exchanges on either side") {
    val a = (0 until 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Scale.writeBucketed(a, "bucketed_a", Seq("k"), 4, sortCols = Seq("k"))
    Scale.writeBucketed(b, "bucketed_b", Seq("k"), 4, sortCols = Seq("k"))
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Disable broadcast so the join must co-locate — at fact×fact scale
      // (where bucketing matters) broadcast isn't an option anyway.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      // compatible bucketing: sort-merge join with no shuffle exchange
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("ShuffleExchange"), s"expected shuffle-free join, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("salted aggregation equals direct aggregation") {
    // One hot key (90% of rows) + a long tail.
    val rows = (0 until 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"key${i % 97}"
      (k, i.toDouble, i.toLong)
    }.toDF("k", "x", "y")

    val direct = rows.groupBy("k")
      .agg(sum($"x").as("sum_x"), count(lit(1)).as("cnt"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .orderBy("k").collect()
    val salted = Scale.saltedAggregate(rows, Seq("k"),
      sums = Seq("x"), count = true, mins = Seq("y"), maxs = Seq("y"))
      .orderBy("k").collect()
    assert(salted.length === direct.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) === s.getString(0))
      assert(math.abs(d.getDouble(1) - s.getDouble(1)) < 1e-6)
      assert(d.getLong(2) === s.getLong(2))
      assert(d.getLong(3) === s.getLong(3))
      assert(d.getLong(4) === s.getLong(4))
    }
  }
}
