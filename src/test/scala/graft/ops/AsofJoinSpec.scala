package graft.ops

import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val trades = Seq(
    ("A", 100L, "t1"), ("A", 200L, "t2"), ("B", 150L, "t3"), ("A", 50L, "t0"))
    .toDF("sym", "t", "trade")
  private lazy val quotes = Seq(
    ("A", 90L, 1.0), ("A", 150L, 2.0), ("B", 150L, 3.0), ("C", 1L, 9.0))
    .toDF("sym", "t", "px")

  test("matches most recent right row at or before left time, per key") {
    val out = AsofJoin.asofJoin(trades, quotes, "t", "t", Seq("sym"))
      .select($"trade", $"asof_px").as[(String, Double)].collect().toMap
    assert(out === Map(
      "t1" -> 1.0,  // A@100 ← quote A@90
      "t2" -> 2.0,  // A@200 ← quote A@150
      "t3" -> 3.0)) // B@150 ← quote B@150 (equal time matches)
    // t0 (A@50, before any quote) dropped under inner semantics
  }

  test("left outer keeps unmatched with nulls") {
    val out = AsofJoin.asofJoin(trades, quotes, "t", "t", Seq("sym"), leftOuter = true)
    assert(out.count() === 4)
    assert(out.where($"trade" === "t0" && $"asof_px".isNull).count() === 1)
  }

  test("tolerance bounds the lookback") {
    val out = AsofJoin.asofJoin(trades, quotes, "t", "t", Seq("sym"), tolerance = 20L)
      .select($"trade").as[String].collect().toSet
    // t1: 100-90=10 ✓; t2: 200-150=50 ✗; t3: 0 ✓
    assert(out === Set("t1", "t3"))
  }

  test("asofJoinWithin: Duration tolerance on timestamp columns, " +
      "sub-second precision kept") {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val lt = trades.withColumn("ts", timestamp_millis(col("t") * 1000L))
    val rt = quotes.withColumn("ts", timestamp_millis(col("t") * 1000L))
    val out = AsofJoin.asofJoinWithin(lt, rt, "ts", "ts", Seq("sym"),
        tolerance = java.time.Duration.ofSeconds(20))
      .select($"trade").as[String].collect().toSet
    // Same gaps as the Long test, now in wall-clock: 10 s ✓, 50 s ✗, 0 s ✓
    assert(out === Set("t1", "t3"))
    // 10.5 s cuts t1 off only if micros were collapsed to seconds; it
    // must still pass (10 s ≤ 10.5 s) — guards the micro conversion.
    val out2 = AsofJoin.asofJoinWithin(lt, rt, "ts", "ts", Seq("sym"),
        tolerance = java.time.Duration.ofMillis(10500))
      .select($"trade").as[String].collect().toSet
    assert(out2 === Set("t1", "t3"))
  }

  test("asofJoinWithin refuses numeric time columns") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoinWithin(trades, quotes, "t", "t", Seq("sym"),
        tolerance = java.time.Duration.ofSeconds(1))
    }
  }
}
