package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: bucketed tables for co-located joins and salting for
  * skewed aggregations — the two knobs the DataFrame API doesn't apply
  * automatically.
  */
object Scale {

  /** Persist as a bucketed+sorted table: repeated equi-joins/aggregations on
    * `bucketCols` then read the table back and join WITHOUT a shuffle on
    * either side (Catalyst recognizes compatible bucketing and drops the
    * Exchange). The standard pre-partitioning for fact tables reused across
    * many queries — pay one shuffle at write, never again.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** Two-phase salted aggregation for skewed keys: aggregate by
    * (key, random-salt) first — spreading one hot key over `saltFactor`
    * reducers — then merge the partials by key. Only associative aggregates
    * compose this way; the common ones are provided.
    *
    * `sums`/`counts`/`mins`/`maxs` name input columns; outputs are
    * `sum_<col>` / `cnt` / `min_<col>` / `max_<col>`.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[String] = Nil,
      count: Boolean = true,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil,
      saltFactor: Int = 16): DataFrame = {
    require(sums.nonEmpty || count || mins.nonEmpty || maxs.nonEmpty, "no aggregates requested")

    val partialAggs: Seq[Column] =
      sums.map(c => sum(col(c)).as(s"sum_$c")) ++
        (if (count) Seq(org.apache.spark.sql.functions.count(lit(1)).as("cnt")) else Nil) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxs.map(c => max(col(c)).as(s"max_$c"))
    val mergeAggs: Seq[Column] =
      sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        (if (count) Seq(sum(col("cnt")).as("cnt")) else Nil) ++
        mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxs.map(c => max(col(s"max_$c")).as(s"max_$c"))

    df.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }
}
