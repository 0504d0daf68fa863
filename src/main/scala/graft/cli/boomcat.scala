package graft.cli

import java.io.FileInputStream

import graft.boom.{BoomFileIterator, BoomPushdown}

/** Local Boom-file dump to TSV — no Spark job, plain Avro iteration, like the
  * reference's ReadBoom (util/ReadBoom.java:33-89): one line per log line,
  * `timestamp \t message \t eventId \t createTime \t blockNumber \t lineNumber`.
  *
  * Usage: `boomcat file.bm [file2.bm ...]` (or no args → stdin).
  */
object boomcat {
  def main(args: Array[String]): Unit = {
    val out = new java.io.PrintStream(System.out, false, "UTF-8")
    def dump(in: java.io.InputStream): Unit = {
      val it = new BoomFileIterator(in, BoomPushdown())
      try {
        while (it.hasNext) {
          val l = it.next()
          out.println(
            s"${l.timestamp}\t${l.message}\t${l.eventId}\t${l.createTime}\t${l.blockNumber}\t${l.lineNumber}")
        }
      } finally it.close()
    }
    try {
      if (args.isEmpty) dump(System.in)
      else args.foreach(f => dump(new FileInputStream(f)))
    } catch {
      case e: Exception =>
        System.err.println(s"boomcat: ${e.getMessage}")
        sys.exit(1)
    }
    out.flush()
  }
}
