package graft.engine

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's metadata/reporting tools (IndexLogs, QueryIndex, LogStats —
  * util/IndexLogs.java, QueryIndex.java, LogStats.java) rebuilt as DataFrame
  * jobs over a file-metadata listing.
  *
  * The reference walked HDFS recursively on the driver and aggregated into
  * nested maps; here the walk produces a DataFrame once and every report is a
  * groupBy over it — the listing can also be persisted and queried with SQL.
  */
object Reporting {

  /** Recursive file listing under `<root>/service/` parsed into partition
    * coordinates. Matches the reference's walk pattern
    * `/service/<dc>/<service>/<type>/<yyyyMMdd>/<hh>/<component>/<branch>/...`
    * (IndexLogs.java:44-46: branch ∈ data|incoming|archive).
    */
  def fileListing(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val serviceRoot = new Path(root, "service")
    val fs = serviceRoot.getFileSystem(conf)
    val rows = ArrayBuffer[(String, Long, Long)]()
    def walk(p: Path): Unit = {
      val it = fs.listStatusIterator(p)
      while (it.hasNext) {
        val s = it.next()
        if (s.isDirectory) walk(s.getPath)
        else rows += ((s.getPath.toString, s.getLen, s.getModificationTime))
      }
    }
    if (fs.exists(serviceRoot)) walk(serviceRoot)
    val re = ".*/service/([^/]+)/([^/]+)/([^/]+)/(\\d{8})/(\\d{2})/([^/]+)/(data|incoming|archive|working)(?:/.*)?/[^/]*$"
    rows.toSeq.toDF("path", "size", "mtime")
      .withColumn("dc", regexp_extract(col("path"), re, 1))
      .withColumn("service", regexp_extract(col("path"), re, 2))
      .withColumn("log_type", regexp_extract(col("path"), re, 3))
      .withColumn("date", regexp_extract(col("path"), re, 4))
      .withColumn("hour", regexp_extract(col("path"), re, 5))
      .withColumn("component", regexp_extract(col("path"), re, 6))
      .withColumn("branch", regexp_extract(col("path"), re, 7))
      .where(col("dc") =!= "")
  }

  /** IndexLogs (A1): per (dc, service, log_type, component) rollup — date
    * range, newest archived date, and per-branch sizes. Column set mirrors the
    * reference's CSV header (IndexLogs.java:223-249).
    */
  def indexLogs(listing: DataFrame): DataFrame =
    listing
      .groupBy(col("dc"), col("service"), col("log_type"), col("component"))
      .agg(
        min(col("date")).as("start_date"),
        max(col("date")).as("end_date"),
        max(when(col("branch") === "archive", col("date"))).as("archive_date"),
        sum(col("size")).as("total_size"),
        sum(when(col("branch") === "data", col("size")).otherwise(0L)).as("data_size"),
        sum(when(col("branch") === "incoming", col("size")).otherwise(0L)).as("incoming_size"),
        sum(when(col("branch") === "archive", col("size")).otherwise(0L)).as("archive_size"))
      .orderBy("dc", "service", "log_type", "component")

  /** Unmerged-directories report: hour partitions with incoming data but no
    * data-branch output yet (the reference flagged dirs without `_READY` —
    * IndexLogs.java:141-147).
    */
  def unmerged(listing: DataFrame): DataFrame = {
    val perHour = listing
      .groupBy(col("dc"), col("service"), col("log_type"), col("component"),
        col("date"), col("hour"))
      .agg(
        sum(when(col("branch") === "incoming", 1).otherwise(0)).as("n_incoming"),
        sum(when(col("branch") === "data", 1).otherwise(0)).as("n_data"))
    perHour.where(col("n_incoming") > 0 && col("n_data") === 0)
      .select("dc", "service", "log_type", "component", "date", "hour")
      .orderBy("dc", "service", "log_type", "component", "date", "hour")
  }

  /** QueryIndex (A2): regex-filter the index on every coordinate, restrict to
    * date-range overlap, and add the per-component ingest rate
    * (dataSize/days — QueryIndex.java:220-234).
    */
  def queryIndex(
      index: DataFrame,
      dcRegex: String = ".*",
      serviceRegex: String = ".*",
      typeRegex: String = ".*",
      componentRegex: String = ".*",
      startDate: String = "00000000",
      endDate: String = "99999999"): DataFrame =
    index
      .where(col("dc").rlike(dcRegex) && col("service").rlike(serviceRegex) &&
        col("log_type").rlike(typeRegex) && col("component").rlike(componentRegex))
      .where(col("start_date") <= endDate && col("end_date") >= startDate)
      .withColumn("days",
        datediff(to_date(col("end_date"), "yyyyMMdd"), to_date(col("start_date"), "yyyyMMdd")) + 1)
      .withColumn("bytes_per_day", (col("data_size") / col("days")).cast("long"))

  /** LogStats (A3): ingest volume over time — per (date, hour) total bytes for
    * one dc/service/component (LogStats.java:83-116). Chart rendering stays
    * driver-side, as in the reference.
    */
  def logStats(
      listing: DataFrame,
      dc: String,
      service: String,
      component: String): DataFrame =
    listing
      .where(col("dc") === dc && col("service") === service && col("component") === component)
      .groupBy(col("date"), col("hour"))
      .agg(sum(col("size")).as("bytes"), count(lit(1)).as("n_files"))
      .orderBy("date", "hour")

  /** ASCII bar chart of logStats output (the reference's printStats,
    * LogStats.java:118-226) — driver-side convenience.
    */
  def renderStats(stats: DataFrame, width: Int = 60): String = {
    val rows = stats.collect()
    if (rows.isEmpty) return "(no data)"
    val maxBytes = rows.map(_.getAs[Long]("bytes")).max.toDouble
    val sb = new StringBuilder
    rows.foreach { r =>
      val bytes = r.getAs[Long]("bytes")
      val bar = "#" * math.max(1, (bytes / maxBytes * width).toInt)
      sb.append(f"${r.getAs[String]("date")}/${r.getAs[String]("hour")} $bytes%12d $bar%n")
    }
    sb.toString
  }
}
