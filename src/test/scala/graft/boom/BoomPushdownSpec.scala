package graft.boom

import java.nio.file.Files

import graft.SparkTestBase
import graft.engine.Ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Asserts the V2 predicate translation actually reaches the boom scan for
  * every search shape the CLI tools emit — the scan description prints the
  * parsed `BoomPushdown`, so a regression in `pushPredicates` (or in
  * Catalyst's translation of the filter shapes we rely on) fails here
  * instead of silently degrading to post-scan filtering.
  */
class BoomPushdownSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("pushdown").toString
    val lines = (0 until 100).map(i =>
      graft.core.LogLine(1000000L + i, s"msg $i alpha", 0, 0L, 0L, 1L))
    Ingest.reboom(lines.toDF().coalesce(1), d)
    d
  }

  private def pushdownOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("pushdown=BoomPushdown"))
      .getOrElse(fail("no boom scan in plan"))

  private def bm = spark.read.format("boom").load(dir)

  test("contains pushes one clause") {
    val p = pushdownOf(bm.where(col("message").contains("alpha")))
    assert(p.contains("BoomTerm(alpha,false)"))
  }

  test("OR of contains pushes one multi-term clause") {
    val p = pushdownOf(bm.where(
      col("message").contains("alpha") || col("message").contains("beta")))
    assert(p.contains("BoomTerm(alpha,false)") && p.contains("BoomTerm(beta,false)"))
    // one clause (OR), not two (AND)
    assert("List\\(".r.findAllIn(p).length === 1)
  }

  test("AND of contains pushes two clauses") {
    val p = pushdownOf(bm.where(
      col("message").contains("alpha") && col("message").contains("msg")))
    assert("List\\(".r.findAllIn(p).length === 2)
  }

  test("upper-contains pushes an onUpper term") {
    val p = pushdownOf(bm.where(upper(col("message")).contains("ALPHA")))
    assert(p.contains("BoomTerm(ALPHA,true)"))
  }

  test("timestamp bounds push in either operand order") {
    val p1 = pushdownOf(bm.where(col("timestamp") >= 1000010L && col("timestamp") < 1000020L))
    assert(p1.contains("BoomPushdown(1000010,1000020"))
    val p2 = pushdownOf(bm.where(lit(1000020L) > col("timestamp") && lit(1000010L) <= col("timestamp")))
    assert(p2.contains("BoomPushdown(1000010,1000020"))
  }

  test("pushed filters stay residual: results identical with pushdown engaged") {
    val got = bm.where(upper(col("message")).contains("MSG 1 ") ||
      col("message").contains("msg 2 "))
      .select("message").as[String].collect().toSet
    assert(got === Set("msg 1 alpha", "msg 2 alpha"))
  }
}
