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

  /** Raw block-level compaction (M2): merge `incoming/` into `data/` by
    * COPYING compressed Avro blocks verbatim — no record decode, no
    * deflate round-trip — the reference's AvroBlockWriterMapper trick
    * (mapreduce/avro/AvroBlockWriterMapper.java:38-90, which streams raw
    * block bytes into a container under the writer's own sync marker).
    * Avro's public `DataFileWriter.appendAllFrom(in, recompress = false)`
    * is exactly that operation when input and output codecs match (Boom
    * is always deflate); a foreign-codec file degrades to block-level
    * recompression, still never deserializing records.
    *
    * vs [[merge]]: ~zero CPU per byte (the 100 TB compaction-pass win)
    * and block metadata byte-identical, but under-filled blocks are NOT
    * re-packed and files are bin-packed whole (no splitting), so output
    * sizes are approximate. Same staging/commit protocol as [[merge]]:
    * stage incoming → working, write `.tmp`, atomic-rename into `data/`,
    * `_READY`, orphan recovery on failure.
    *
    * Distribution: one Spark task per output bin (first-fit by compressed
    * size) — compaction parallelism is bin count, the same shape as the
    * reference's one-mapper-per-output MR stage.
    */
  def rawMerge(
      spark: SparkSession,
      partitionDir: String,
      targetFileSize: Long = 512L * 1024 * 1024): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(partitionDir)
    val fs = dir.getFileSystem(conf)
    val incoming = new Path(dir, "incoming")
    if (!fs.exists(incoming)) return

    val working = new Path(dir, s"working/rawmerge-${System.nanoTime()}")
    val staged = new Path(working, "incoming")
    fs.mkdirs(working.getParent)
    if (!fs.rename(incoming, staged)) {
      throw new java.io.IOException(s"cannot stage $incoming")
    }
    try {
      val files = listBoomFiles(fs, staged)
      if (files.nonEmpty) {
        // First-fit-decreasing by compressed size: raw copy means output
        // bytes ≈ Σ input bytes, so the bin sum IS the output file size.
        val bins = scala.collection.mutable.ArrayBuffer
          .empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
        files.sortBy(-_._2).foreach { case (p, sz) =>
          bins.indexWhere(_._2 + sz <= targetFileSize) match {
            case -1 =>
              bins += ((scala.collection.mutable.ArrayBuffer(p), sz))
            case i =>
              bins(i)._1 += p
              bins(i) = (bins(i)._1, bins(i)._2 + sz)
          }
        }
        val dataDir = new Path(dir, "data")
        fs.mkdirs(dataDir)
        val hconf = new org.apache.spark.util.SerializableConfiguration(conf)
        val out = dataDir.toString
        spark.sparkContext
          .parallelize(bins.map(_._1.toSeq).toSeq, bins.size)
          .foreach(bin => rawMergeBin(bin, out, hconf.value))
      }
      fs.create(new Path(dir, "data/_READY"), true).close()
      fs.delete(working, true)
    } catch {
      case e: Throwable =>
        fs.mkdirs(incoming.getParent)
        fs.rename(staged, incoming)
        fs.delete(working, true)
        throw e
    }
  }

  private def listBoomFiles(fs: FileSystem, root: Path): Seq[(String, Long)] = {
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".bm"))
        buf += ((s.getPath.toString, s.getLen))
    }
    buf.sortBy(_._1).toSeq
  }

  /** Executor side: one output container per bin, blocks copied verbatim. */
  private def rawMergeBin(paths: Seq[String], outDir: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    val schema = graft.boom.BoomSchemas.logBlockSchema
    val fs = new Path(outDir).getFileSystem(conf)
    val name =
      s"raw-${java.util.UUID.randomUUID().toString.take(16)}.bm"
    val tmp = new Path(outDir, name + ".tmp")
    val fin = new Path(outDir, name)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(graft.boom.BoomSchemas.DeflateLevel))
    w.create(schema, fs.create(tmp, true))
    try {
      paths.foreach { p =>
        val in = new DataFileStream[GenericRecord](fs.open(new Path(p)),
          new GenericDatumReader[GenericRecord]())
        try {
          require(in.getSchema == schema,
            s"$p is not a Boom container (schema mismatch)")
          val codec = Option(in.getMetaString("avro.codec")).getOrElse("null")
          w.appendAllFrom(in, /* recompress = */ codec != "deflate")
        } finally in.close()
      }
      w.close()
      if (!fs.rename(tmp, fin))
        throw new java.io.IOException(s"cannot promote $tmp")
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: Exception => () }
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
