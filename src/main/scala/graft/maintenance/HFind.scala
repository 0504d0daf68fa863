package graft.maintenance

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** find(1) for Hadoop paths — the reference's HFind (admin/HFind.java:45-393)
  * re-expressed as a file-metadata DataFrame plus `Column` predicates, so
  * every find expression is a `where` clause and actions are plain
  * DataFrame/driver operations.
  */
object HFind {

  /** Recursive metadata listing: (path, name, is_dir, size, mtime, atime, depth). */
  def listing(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val rootDepth = rootPath.toUri.getPath.count(_ == '/')
    val rows = ArrayBuffer[(String, String, Boolean, Long, Long, Long, Int)]()
    def walk(p: Path): Unit = {
      val it = fs.listStatusIterator(p)
      while (it.hasNext) {
        val s = it.next()
        val depth = s.getPath.toUri.getPath.count(_ == '/') - rootDepth
        rows += ((s.getPath.toString, s.getPath.getName, s.isDirectory,
          s.getLen, s.getModificationTime, s.getAccessTime, depth))
        if (s.isDirectory) walk(s.getPath)
      }
    }
    if (fs.exists(rootPath)) walk(rootPath)
    rows.toSeq.toDF("path", "name", "is_dir", "size", "mtime", "atime", "depth")
  }

  /** `-mtime ±N` / `-amin ±N` semantics (HFind.java:100-316): GNU-find-style
    * signed day/minute offsets — `+N` strictly older than N units, `-N`
    * younger than N units, bare `N` within the Nth unit.
    */
  def timeTest(timeCol: String, spec: String, unitMs: Long,
      nowMs: Long = System.currentTimeMillis()): org.apache.spark.sql.Column = {
    val age = lit(nowMs) - col(timeCol)
    spec match {
      // ">=": the reference tests (now - mtime)/unit > N with integer
      // division (HFind.java), which accepts age == (N+1)*unit exactly.
      case s if s.startsWith("+") => age >= (s.drop(1).toLong + 1) * unitMs
      case s if s.startsWith("-") => age < s.drop(1).toLong * unitMs
      case s => age >= s.toLong * unitMs && age < (s.toLong + 1) * unitMs
    }
  }

  def mtime(spec: String, nowMs: Long = System.currentTimeMillis()) =
    timeTest("mtime", spec, 24L * 3600 * 1000, nowMs)
  def mmin(spec: String, nowMs: Long = System.currentTimeMillis()) =
    timeTest("mtime", spec, 60L * 1000, nowMs)
  def atime(spec: String, nowMs: Long = System.currentTimeMillis()) =
    timeTest("atime", spec, 24L * 3600 * 1000, nowMs)
  def amin(spec: String, nowMs: Long = System.currentTimeMillis()) =
    timeTest("atime", spec, 60L * 1000, nowMs)

  /** `-regex` (matches the full path, like the reference). */
  def pathRegex(regex: String) = col("path").rlike(regex)

  /** `-delete` action over a filtered listing (deepest-first, dirs last). */
  def delete(spark: SparkSession, matched: DataFrame): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val paths = matched.select("path", "is_dir", "depth")
      .collect()
      .sortBy(r => (-r.getAs[Int]("depth"), r.getAs[Boolean]("is_dir")))
    var n = 0L
    paths.foreach { r =>
      val p = new Path(r.getAs[String]("path"))
      val fs: FileSystem = p.getFileSystem(conf)
      if (fs.delete(p, r.getAs[Boolean]("is_dir"))) n += 1
    }
    n
  }
}
