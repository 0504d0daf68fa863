package graft

/** Whole-surface plan audit: every registered driver query must plan
  * without a CartesianProduct — the one join shape that cannot survive a
  * corpus-sized input. (Bounded cross joins in the suite are one-row
  * broadcast totals → BroadcastNestedLoopJoin, which is allowed.) This is
  * the regression net for the 100 TB story: a future edit that silently
  * degrades a join to a cartesian fails here, not in a cluster.
  */
class PlanAuditSpec extends SparkTestBase {

  test("no registered query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning cartesian products: ${offenders.mkString(", ")}")
  }
}
