package graft.cli

import graft.engine.Reporting

/** CLI front-ends for the reporting/metadata tools (the reference's
  * IndexLogs, QueryIndex and LogStats drivers — util/IndexLogs.java:377-394,
  * QueryIndex.java:58-439, LogStats.java:35-227).
  *
  * {{{
  *   logindex  --root=/data                      # index CSV to stdout
  *   logindex  --root=/data --unmerged           # unmerged-dirs report
  *   queryindex --root=/data -dc=99 -svc='web.*' [-type=..] [-comp=..] [-start=yyyyMMdd] [-end=yyyyMMdd]
  *   logstats  --root=/data -dc=99 -svc=websvc -comp=app
  * }}}
  */
object ReportingCli {
  def opt(argv: Array[String], key: String, default: String = null): String =
    argv.collectFirst { case s if s.startsWith(key + "=") => s.drop(key.length + 1) }
      .getOrElse(default)

  def csv(df: org.apache.spark.sql.DataFrame): Unit = {
    println(df.columns.mkString(","))
    df.collect().foreach(r =>
      println((0 until r.length).map(i => Option(r.get(i)).map(_.toString).getOrElse(""))
        .mkString(",")))
  }
}

object logindex {
  def main(argv: Array[String]): Unit = {
    val root = ReportingCli.opt(argv, "--root", sys.env.getOrElse("GRAFT_LOG_ROOT", ""))
    val spark = LogToolCli.session()
    try {
      val listing = Reporting.fileListing(spark, root)
      if (argv.contains("--unmerged")) ReportingCli.csv(Reporting.unmerged(listing))
      else ReportingCli.csv(Reporting.indexLogs(listing))
    } finally spark.stop()
  }
}

object queryindex {
  def main(argv: Array[String]): Unit = {
    val root = ReportingCli.opt(argv, "--root", sys.env.getOrElse("GRAFT_LOG_ROOT", ""))
    val spark = LogToolCli.session()
    try {
      val idx = Reporting.indexLogs(Reporting.fileListing(spark, root))
      ReportingCli.csv(Reporting.queryIndex(idx,
        dcRegex = ReportingCli.opt(argv, "-dc", ".*"),
        serviceRegex = ReportingCli.opt(argv, "-svc", ".*"),
        typeRegex = ReportingCli.opt(argv, "-type", ".*"),
        componentRegex = ReportingCli.opt(argv, "-comp", ".*"),
        startDate = ReportingCli.opt(argv, "-start", "00000000"),
        endDate = ReportingCli.opt(argv, "-end", "99999999")))
    } finally spark.stop()
  }
}

object logstats {
  def main(argv: Array[String]): Unit = {
    val root = ReportingCli.opt(argv, "--root", sys.env.getOrElse("GRAFT_LOG_ROOT", ""))
    val dc = ReportingCli.opt(argv, "-dc")
    val svc = ReportingCli.opt(argv, "-svc")
    val comp = ReportingCli.opt(argv, "-comp")
    if (dc == null || svc == null || comp == null) {
      System.err.println(";logstats: -dc, -svc and -comp are required")
      sys.exit(1)
    }
    val spark = LogToolCli.session()
    try {
      val stats = Reporting.logStats(Reporting.fileListing(spark, root), dc, svc, comp)
      print(Reporting.renderStats(stats))
    } finally spark.stop()
  }
}
