package graft.maintenance

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, ZoneOffset}

import graft.engine.Ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's maintenance subsystem (admin/LogMaintenance.java) rebuilt
  * on Spark jobs + atomic renames.
  *
  * Lifecycle per hour/component partition: `incoming/` (raw small files) →
  * [[merge]] → `data/` (compacted `.bm`) → [[filterArchive]] → `archive/`
  * (filtered `.bm`) → [[retentionDelete]].
  *
  * The reference coordinated cross-process access with ZooKeeper read/write
  * locks (locks/LockUtil.java) because MapReduce jobs rewrote directories in
  * place. Here every job writes to a fresh `working/<id>/` directory and
  * promotes results with atomic renames, with `*.tmp` outputs invisible to
  * readers — so queries never see partial state and the lock service is
  * unnecessary (SURVEY.md §2.8 M7).
  */
object LogMaintenance {

  /** Compaction (M1): read all incoming branches of a partition dir, rewrite
    * into `data/` as `.bm` files of roughly `targetFileSize` raw bytes,
    * preserving block metadata, then remove the merged inputs.
    *
    * Reference: LogMaintenance.java:968-1186 (move → MR merge → promote →
    * `_READY`). The reference merged raw Avro blocks without decoding
    * (AvroBlockWriterMapper); Spark decodes + re-encodes, which additionally
    * re-packs under-filled blocks.
    */
  def merge(
      spark: SparkSession,
      partitionDir: String,
      targetFileSize: Long = 512L * 1024 * 1024): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(partitionDir)
    val fs = dir.getFileSystem(conf)
    val incoming = new Path(dir, "incoming")
    if (!fs.exists(incoming)) return

    val inputBytes = fs.getContentSummary(incoming).getLength
    if (inputBytes == 0) return
    val parts = math.max(1, (inputBytes * 8 / targetFileSize).toInt) // ~deflate inflation

    val working = new Path(dir, s"working/merge-${System.nanoTime()}")
    val staged = new Path(working, "incoming")
    fs.mkdirs(working.getParent)
    if (!fs.rename(incoming, staged)) {
      throw new java.io.IOException(s"cannot stage $incoming")
    }
    try {
      val df = spark.read.format("boom").load(staged.toString)
        .repartition(parts)
      Ingest.reboom(df, new Path(dir, "data").toString, SaveMode.Append)
      fs.create(new Path(dir, "data/_READY"), true).close()
      fs.delete(working, true)
    } catch {
      case e: Throwable =>
        // Orphan recovery (M5): put staged data back for the next run.
        fs.mkdirs(incoming.getParent)
        fs.rename(staged, incoming)
        fs.delete(working, true)
        throw e
    }
  }

  /** Filter/archive (M3): apply the component's YAML filter chain to `data/`
    * and write survivors to `archive/`, then delete `data/`.
    *
    * Fast paths as in the reference: a keep-all chain renames files without
    * rewriting (LogMaintenance.java:503-530), a drop-all chain just deletes
    * (:531-550).
    */
  def filterArchive(
      spark: SparkSession,
      partitionDir: String,
      componentName: String,
      filterYaml: String): Unit = {
    val chain = FilterConfig.loadFilters(componentName, filterYaml)
    require(chain.filters.nonEmpty, s"no filters matched component $componentName")
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(partitionDir)
    val fs = dir.getFileSystem(conf)
    val data = new Path(dir, "data")
    val archive = new Path(dir, "archive")
    if (!fs.exists(data)) return

    if (chain.dropsAll) {
      fs.delete(data, true)
      return
    }
    if (chain.keepsAll) {
      fs.mkdirs(archive)
      fs.listStatus(data).foreach { s =>
        if (!s.getPath.getName.startsWith("_")) {
          fs.rename(s.getPath, new Path(archive, s.getPath.getName))
        }
      }
      fs.delete(data, true)
      return
    }

    val df = spark.read.format("boom").load(data.toString)
      .where(chain.toColumn(col("message")))
    Ingest.reboom(df, archive.toString, SaveMode.Append)
    fs.delete(data, true)
  }

  private val dateFmt = DateTimeFormatter.ofPattern("yyyyMMdd").withZone(ZoneOffset.UTC)

  /** Retention (M4): delete date partitions older than `daysToKeep`.
    * Directory names are authoritative (same as the reference's date-dir
    * pattern match, LogMaintenance.java:395-398, 462-466, 567-578).
    */
  def retentionDelete(
      fs: FileSystem,
      serviceLogsDir: String,
      daysToKeep: Int,
      nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    val cutoff = LocalDate.parse(
      dateFmt.format(Instant.ofEpochMilli(nowMs)),
      DateTimeFormatter.ofPattern("yyyyMMdd")).minusDays(daysToKeep.toLong)
    val root = new Path(serviceLogsDir)
    if (!fs.exists(root)) return Seq.empty
    val deleted = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .filter(s => s.getPath.getName.matches("\\d{8}"))
      .filter { s =>
        LocalDate.parse(s.getPath.getName, DateTimeFormatter.ofPattern("yyyyMMdd"))
          .isBefore(cutoff)
      }
    deleted.foreach(s => fs.delete(s.getPath, true))
    deleted.map(_.getPath.toString)
  }

  /** Orphan recovery (M5): move `working/<id>/incoming` of dead runs back to
    * the partition's `incoming/` (LogMaintenance.java:580-632).
    */
  def resetOrphanedJobs(fs: FileSystem, partitionDir: String): Unit = {
    val working = new Path(partitionDir, "working")
    if (!fs.exists(working)) return
    fs.listStatus(working).foreach { job =>
      val staged = new Path(job.getPath, "incoming")
      if (fs.exists(staged)) {
        val incoming = new Path(partitionDir, "incoming")
        fs.mkdirs(incoming)
        fs.listStatus(staged).foreach { f =>
          fs.rename(f.getPath, new Path(incoming, f.getPath.getName))
        }
      }
      fs.delete(job.getPath, true)
    }
  }
}
