package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content predicates of the four query tools, as Catalyst `Column` factories
  * over the `message` column. Declarative on purpose: plain `contains` calls
  * translate to `StringContains` filters that the boom source pushes into its
  * decode loop, and everything stays inside whole-stage codegen.
  */
sealed trait LogPredicate extends Serializable {
  def toColumn(message: Column): Column
}

/** `logcat` — no content filter (util/Cat.java:83-84: time range only). */
case object MatchAll extends LogPredicate {
  override def toColumn(message: Column): Column = lit(true)
}

/** `loggrep` — `Pattern.find()` semantics; `--i` = CASE_INSENSITIVE flag
  * (util/Grep.java:76-84, 99-100). Spark's `rlike` is the same
  * `java.util.regex` find(), and `(?i)` is the same flag.
  */
case class Grep(regex: String, caseInsensitive: Boolean = false) extends LogPredicate {
  override def toColumn(message: Column): Column = {
    val r = if (caseInsensitive) "(?i)" + regex else regex
    message.rlike(r)
  }
}

/** `logsearch` — literal substring; `--i` = upper-contains-upper, the
  * line-level semantics of FastSearch's two-phase scan
  * (util/FastSearch.java:215-224 case-sensitive; :233-255 case-insensitive).
  */
case class Search(literal: String, caseInsensitive: Boolean = false) extends LogPredicate {
  override def toColumn(message: Column): Column =
    if (caseInsensitive) upper(message).contains(upper(lit(literal)))
    else message.contains(literal)
}

/** `logmultisearch` — N terms, OR = any term present, AND (`--a`) = all terms
  * present, per line (util/MultiSearch.java:165-198; AND flag
  * logtools/logmultisearch.java:109).
  */
case class MultiSearch(
    terms: Seq[String],
    matchAll: Boolean = false,
    caseInsensitive: Boolean = false) extends LogPredicate {
  require(terms.nonEmpty, "multisearch requires at least one term")

  override def toColumn(message: Column): Column = {
    val per = terms.map { t =>
      if (caseInsensitive) upper(message).contains(upper(lit(t)))
      else message.contains(t)
    }
    if (matchAll) per.reduce(_ && _) else per.reduce(_ || _)
  }
}

object LogPredicate {
  /** Parse a multisearch strings file: one term per line, CRLF tolerated,
    * blank lines dropped (logtools/LogTools.java:576-586 dos2unix).
    */
  def termsFromText(content: String): Seq[String] =
    content.replace("\r\n", "\n").split('\n').toSeq.filter(_.nonEmpty)
}
