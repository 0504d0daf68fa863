package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval analytics: point-in-interval (range) joins re-expressed as
  * bounded equi-joins Spark can shuffle-partition, instead of the
  * cartesian-product-plus-filter a naive non-equi join plans to.
  *
  * The trick is standard bin fragmentation: each interval is exploded to the
  * fixed-width time bins it overlaps, each point hashes to its single bin,
  * and the exact range predicate filters within the bin. Shuffle volume is
  * linear — an interval appears in `len/binWidth + 1` bins — and per-task
  * work is bounded by the number of intervals overlapping one bin span, so
  * the plan survives a 100× scale-up as long as `binWidth` is chosen near
  * the typical interval length. A pathological pile-up of intervals in one
  * hot span is ordinary join skew (AQE splits it, or salt the bin key).
  */
object Intervals {

  /** Join `points` to every interval containing them ([start, end], both
    * inclusive). `tCol`/`startCol`/`endCol` must be INTEGRAL columns on the
    * same numeric axis (epoch days, millis, nanos — callers convert
    * timestamps first). Binning is exact integer floor division over the
    * full int64 range: a double `floor(c / w)` would misplace values past
    * 2^53 (epoch NANOS are ~1.7e18 — with a small bin width the rounded
    * quotient lands whole bins away and the join silently drops matches).
    * Degenerate intervals with `end < start` match nothing. Output: all
    * point columns plus all interval columns.
    */
  def pointIntervalJoin(
      points: DataFrame,
      tCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // floorDiv in exact int64: subtract the (non-negative) pmod, then the
    // SQL integer-division operator DIV — every step stays integral (the
    // DataFrame `/` operator is DOUBLE division and would reintroduce the
    // 2^53 rounding this guards against).
    def bin(name: String): Column =
      expr(s"CAST((`$name` - pmod(`$name`, ${binWidth}L)) DIV ${binWidth}L AS BIGINT)")
    val iv = intervals
      .where(col(endCol) >= col(startCol))
      .withColumn("__bin", explode(sequence(bin(startCol), bin(endCol))))
    val pt = points.withColumn("__bin", bin(tCol))
    pt.join(iv, "__bin")
      .where(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bin")
  }

  /** Per-point count of covering intervals (e.g. "shipments in transit on
    * each date"), zero-preserving: points covered by nothing come back with
    * `n = 0` rather than dropping out of the result.
    */
  def coverageCounts(
      points: DataFrame,
      tCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    val matched = pointIntervalJoin(
        points.select(col(tCol)).distinct(), tCol,
        intervals.select(col(startCol), col(endCol)), startCol, endCol, binWidth)
      .groupBy(col(tCol)).agg(count(lit(1)).as("n"))
    points.join(matched, Seq(tCol), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }
}
