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
  * @param tolerance  max allowed `leftTime - rightTime` in the time
  *                    columns' units (MICROSECONDS when they are
  *                    timestamp-typed — sub-second precision is kept)
  *                   (0 = unlimited).
  *                   UNIT CHANGE NOTE: before the sub-second fix,
  *                   timestamp-typed columns were normalized with
  *                   `cast("long")`, i.e. SECONDS — a caller carrying a
  *                   seconds-scale tolerance over from that era gets
  *                   effectively zero tolerance now. Pass the scale the
  *                   normalized key actually uses, or use
  *                   [[asofJoinWithin]] with an explicit
  *                   `java.time.Duration` to make the unit unambiguous.
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

    // Time normalization: TimestampType must keep SUB-SECOND precision —
    // cast("long") truncates to whole seconds, and a right row 800 ms
    // AFTER the left event in the same second would then tie-break into
    // being its "as-of" match, violating rightTime <= leftTime. Micros
    // for timestamps, plain long cast for numeric columns (unchanged).
    def timeKey(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(col(c).cast("timestamp"))
        case _ => col(c).cast("long")
      }

    val rightPayload = right.columns.toSeq
    val l = left
      .withColumn("__t", timeKey(left, leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)))
    val r = right
      .withColumn("__t", timeKey(right, rightTime))
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

    // The tolerance probe must use the SAME normalization as __t: the
    // carried struct holds the original right column, and a bare long
    // cast of a timestamp is seconds while __t is micros.
    def carriedTimeKey(f: Column): Column =
      right.schema(rightTime).dataType match {
        case _: org.apache.spark.sql.types.TimestampType => unix_micros(f)
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(f.cast("timestamp"))
        case _ => f.cast("long")
      }
    val withinTolerance =
      if (tolerance > 0L)
        matched.withColumn("__m",
          when(col("__t") - carriedTimeKey(col("__m").getField(rightTime))
              <= tolerance,
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

  /** [[asofJoin]] with the tolerance as an explicit wall-clock
    * `java.time.Duration` — immune to the native-unit ambiguity (the Long
    * form is microseconds for timestamp-typed columns, raw column units
    * otherwise). Only valid when BOTH time columns are timestamp-typed;
    * a bare numeric time column's unit is caller-defined, so a Duration
    * cannot be converted for it — use the Long form in native units there.
    */
  def asofJoinWithin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      by: Seq[String],
      tolerance: java.time.Duration,
      rightPrefix: String = "asof_",
      leftOuter: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def isTs(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
      case _: TimestampType => true
      case TimestampNTZType => true
      case _ => false
    }
    require(isTs(left, leftTime) && isTs(right, rightTime),
      "asofJoinWithin needs timestamp-typed time columns on both sides; " +
        "for numeric time columns pass the Long tolerance in the columns' " +
        "own units")
    val micros = math.multiplyExact(tolerance.getSeconds, 1000000L) +
      tolerance.getNano / 1000L
    // A duration that floors to 0 µs would silently become the Long API's
    // `0 = unlimited` — the opposite of a tiny/exact tolerance. Refuse.
    require(micros >= 1,
      s"tolerance must be >= 1 microsecond, got $tolerance (for unlimited " +
        "lookback use asofJoin with tolerance = 0)")
    asofJoin(left, right, leftTime, rightTime, by, rightPrefix,
      tolerance = micros, leftOuter = leftOuter)
  }
}
