package graft

import org.scalatest.funsuite.AnyFunSuite

/** Standing plan-shape regression net: EVERY registered query's physical
  * plan, built against the sf0.001 slice, must be free of the node types
  * that cannot survive 100 TB — an unconditioned cross product (the
  * intended broadcast-a-1-row-stats joins plan as
  * BroadcastNestedLoopJoin, which stays legal) and any Python/RDD eval
  * bridge (the repo's no-UDF rule, enforced rather than asserted in
  * prose). A regression that drops a join condition or sneaks a UDF into
  * a hot path fails HERE by name, before any benchmark notices.
  */
class PlanInvariantsSpec extends SparkTestBase {

  private val Forbidden = Seq(
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython")

  test("no registered query plans a cartesian product or a Python eval node") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch {
          case e: Throwable =>
            bad += s"$name: failed to plan: ${e.getMessage}"
            ""
        }
      Forbidden.filter(plan.contains).foreach { node =>
        bad += s"$name: $node"
      }
    }
    assert(bad.isEmpty, s"plan invariants violated:\n${bad.mkString("\n")}")
  }

  // Round-11 shipped two queries whose doc comments CLAIMED oracles that
  // were never written — the driver's correctness sweep reports such rows
  // as `err`, and nothing in-repo caught the drift. This makes the
  // contract structural: every registered query has an oracle, and no
  // oracle is orphaned from a query.
  test("queries and oracleSql register exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with NO oracleSql entry: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracleSql entries with NO query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }
}
