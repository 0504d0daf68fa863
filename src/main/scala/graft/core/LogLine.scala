package graft.core

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** The engine's single logical record: one log line.
  *
  * Mirrors the reference's 6-column record materialized by its Boom readers
  * (reference: src/com/blackberry/logdriver/mapreduce/boom/BoomRecordReader.java:160-180,
  * boom/LogLineData.java:26-31).
  *
  * @param timestamp   epoch millis (= second*1000 + ms)
  * @param message     raw log line (timestamp prefix stripped at ingest)
  * @param eventId     event-type tag (0 in practice)
  * @param createTime  epoch millis when the containing block was written
  * @param blockNumber monotone per writer file
  * @param lineNumber  1-based position within the block (synthesized at read)
  */
case class LogLine(
    timestamp: Long,
    message: String,
    eventId: Int,
    createTime: Long,
    blockNumber: Long,
    lineNumber: Long)

object LogLine {
  /** Flat schema of the log-line table ("boom" data source output). */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("message", StringType, nullable = true),
    StructField("eventId", IntegerType, nullable = false),
    StructField("createTime", LongType, nullable = false),
    StructField("blockNumber", LongType, nullable = false),
    StructField("lineNumber", LongType, nullable = false)))

  /** Canonical total order — the engine's global sort key
    * (reference: boom/LogLineData.java:156-162).
    */
  val sortKey: Seq[Column] =
    Seq(col("timestamp"), col("createTime"), col("blockNumber"), col("lineNumber"))

  def sorted[T](ds: Dataset[T]): Dataset[T] = ds.orderBy(sortKey: _*)
}
