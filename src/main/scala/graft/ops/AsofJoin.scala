package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the most recent right row with
  * `rightTime <= leftTime` in the same key group. The canonical log-analytics
  * join (event ↔ latest config/session/deploy before it) that Spark has no
  * built-in operator for.
  *
  * Implemented as the union-window composition rather than a custom
  * `SparkPlan`: both sides are tagged and unioned, ONE shuffle sorts each key
  * group by time (right rows before left on ties, giving `<=` semantics), and
  * a running `last(right, ignoreNulls)` carries the latest right payload to
  * each left row. Equivalent plan shape to a custom sort-merge as-of operator
  * — same single exchange + sort — without leaving Catalyst's optimizer.
  *
  * @param tolerance  max allowed `leftTime - rightTime` in the same units
  *                   (0 = unlimited)
  * @return left rows (original columns) + the matched right row's columns
  *         prefixed with `rightPrefix`; inner semantics (unmatched left rows
  *         are dropped; use `leftOuter = true` to keep them with nulls)
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      by: Seq[String],
      rightPrefix: String = "asof_",
      tolerance: Long = 0L,
      leftOuter: Boolean = false): DataFrame = {
    require(by.nonEmpty, "as-of join needs at least one key column")

    val rightPayload = right.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)))
    val r = right
      .withColumn("__t", col(rightTime).cast("long"))
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(rightPayload.map(col): _*))
      .select(by.map(col) ++ Seq(col("__t"), col("__side"), col("__r")): _*)

    // Align schemas: left keeps its own columns; right contributes only key +
    // carrier columns (left columns null on right rows).
    val leftCols = left.columns.toSeq
    val lAligned = l.select(
      (by.map(col) ++ Seq(col("__t"), col("__side"), col("__r")) ++
        leftCols.filterNot(by.contains).map(col)): _*)
    val rAligned = leftCols.filterNot(by.contains).foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lAligned.columns.toIndexedSeq.map(col): _*)

    val unioned = lAligned.unionByName(rAligned)
    // Right rows sort before left rows at equal time → `<=` match semantics.
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val withinTolerance =
      if (tolerance > 0L)
        matched.withColumn("__m",
          when(col("__t") - col("__m").getField(rightTime).cast("long") <= tolerance,
            col("__m")))
      else matched

    val filtered =
      if (leftOuter) withinTolerance
      else withinTolerance.where(col("__m").isNotNull)

    val rightOut = rightPayload.map(c =>
      col("__m").getField(c).as(rightPrefix + c))
    filtered.select(by.map(col) ++
      leftCols.filterNot(by.contains).map(col) ++ rightOut: _*)
  }
}
