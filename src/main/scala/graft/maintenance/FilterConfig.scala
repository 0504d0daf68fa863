package graft.maintenance

import java.io.InputStream

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.yaml.snakeyaml.Yaml

/** The retention-filter chain of the reference's filter/archive job, as a
  * declarative `Column` predicate instead of a stateful mapper.
  *
  * Reference: mapreduce/boom/BoomFilterMapper.java:44-102 (YAML load + chain
  * selection), 124-155 (match loop), 169-270 (filter impls). Semantics
  * replicated exactly:
  *   - the FIRST conf set whose component-regex `matches()` the component
  *     name is used, later sets are ignored (loadFilters `break FILTERS`);
  *   - a line is KEPT iff ANY filter in the chain accepts it — `regex` is
  *     `Pattern.find()`, `stringmatch` is `contains`, `keepall` accepts all,
  *     `dropall` accepts none;
  *   - the reference's move-to-front self-reordering is a scan-order
  *     optimization with no semantic effect — Catalyst's boolean
  *     short-circuit makes it unnecessary.
  */
sealed trait LineFilter {
  def toColumn(message: Column): Column
  /** Fast-path marker: Some(true) = accepts everything, Some(false) = nothing. */
  def constant: Option[Boolean] = None
}
case class RegexFilter(pattern: String) extends LineFilter {
  override def toColumn(message: Column): Column = message.rlike(pattern)
}
case class StringMatchFilter(pattern: String) extends LineFilter {
  override def toColumn(message: Column): Column = message.contains(pattern)
}
case object KeepAllFilter extends LineFilter {
  override def toColumn(message: Column): Column = lit(true)
  override def constant: Option[Boolean] = Some(true)
}
case object DropAllFilter extends LineFilter {
  override def toColumn(message: Column): Column = lit(false)
  override def constant: Option[Boolean] = Some(false)
}

case class FilterChain(filters: Seq[LineFilter]) {
  /** OR of the chain (first-accepting-filter ≡ any-filter-accepts). */
  def toColumn(message: Column): Column =
    if (filters.isEmpty) lit(false)
    else filters.map(_.toColumn(message)).reduce(_ || _)

  /** keepall anywhere in the chain ⇒ everything survives (reference fast-path
    * renames instead of rewriting — LogMaintenance.java:503-530).
    */
  def keepsAll: Boolean = filters.exists(_.constant.contains(true))

  /** Chain of only dropalls ⇒ nothing survives (delete fast-path,
    * LogMaintenance.java:531-550).
    */
  def dropsAll: Boolean =
    filters.nonEmpty && filters.forall(_.constant.contains(false))
}

object FilterConfig {

  /** Load the chain for a component from the reference's YAML format:
    * {{{
    * filters:
    *   - "component-regex":
    *     - { type: regex,       pattern: "ERROR.*" }
    *     - { type: stringmatch, pattern: "WARN" }
    *     - { type: keepall }
    * }}}
    * Unknown/incomplete items are skipped with the same tolerance as the
    * reference (warn-and-continue).
    */
  def loadFilters(componentName: String, in: InputStream): FilterChain = {
    val yaml = new Yaml()
    val root = yaml.load[java.util.Map[AnyRef, AnyRef]](in)
    val confSets = root.get("filters") match {
      case l: java.util.List[_] => l.asScala.toSeq
      case _ => Seq.empty
    }
    confSets.foreach {
      case confSet: java.util.Map[_, _] =>
        confSet.asScala.foreach { case (k, v) =>
          if (componentName.matches(k.toString)) {
            val items = v match {
              case l: java.util.List[_] => l.asScala.toSeq
              case _ => Seq.empty
            }
            val filters = items.flatMap {
              case item: java.util.Map[_, _] =>
                val m = item.asScala.map { case (ik, iv) =>
                  ik.toString -> Option(iv).map(_.toString).orNull
                }.toMap
                (m.get("type").map(_.toLowerCase), m.get("pattern")) match {
                  case (Some("regex"), Some(p)) if p != null => Some(RegexFilter(p))
                  case (Some("stringmatch"), Some(p)) if p != null => Some(StringMatchFilter(p))
                  case (Some("keepall"), _) => Some(KeepAllFilter)
                  case (Some("dropall"), _) => Some(DropAllFilter)
                  case _ => None
                }
              case _ => None
            }
            return FilterChain(filters)
          }
        }
      case _ => ()
    }
    FilterChain(Seq.empty)
  }

  def loadFilters(componentName: String, yamlText: String): FilterChain =
    loadFilters(componentName,
      new java.io.ByteArrayInputStream(yamlText.getBytes("UTF-8")))
}
