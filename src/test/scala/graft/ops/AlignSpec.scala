package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AlignSpec extends SparkTestBase {
  import spark.implicits._

  private def run(a: Seq[String], b: Seq[String], maxS: Int = 10) =
    Align.galeChurchArrays(
      Seq(Tuple1(1L)).toDF("id"), "id",
      typedLit(a), typedLit(b), maxS)
      .select("n_a", "n_b", "total_cost", "n_segments", "ops")
      .as[(Int, Int, Long, Int, String)].head()

  test("galeChurch: identity aligns 1-1 everywhere at zero cost") {
    val s = Seq("Hello there.", "Short.", "A much longer sentence here.")
    assert(run(s, s) === ((3, 3, 0L, 3, "1-1,1-1,1-1")))
  }

  test("galeChurch: dropped middle sentence elects the cheapest merge") {
    // A lens (12, 6, 28), B = A without the middle: candidate paths are
    //  1-1,1-0,1-1 → 450 + 15·36//7 = 527
    //  2-1,1-1     → 230 + 15·36//31 = 247
    //  1-1,2-1     → 230 + 15·36//63 = 238  ← unique argmin
    val a = Seq("Hello there.", "Short.", "A much longer sentence here.")
    val b = Seq("Hello there.", "A much longer sentence here.")
    assert(run(a, b) === ((3, 2, 238L, 2, "1-1,2-1")))
    // Symmetric case: the mirrored path on the B side.
    assert(run(b, a) === ((2, 3, 238L, 2, "1-1,1-2")))
  }

  test("galeChurch: pure insertion/deletion paths and empty sides") {
    val a = Seq("One two three.")
    assert(run(a, Nil) ===
      ((1, 0, 450L + 15L * 14 * 14 / 15, 1, "1-0")))
    assert(run(Nil, a) ===
      ((0, 1, 450L + 15L * 14 * 14 / 15, 1, "0-1")))
    assert(run(Nil, Nil) === ((0, 0, 0L, 0, "")))
  }

  test("galeChurch: maxSentences truncates both sides") {
    val s = (1 to 12).map(i => s"Sentence number $i.")
    val r = run(s, s, maxS = 10)
    assert(r._1 === 10 && r._2 === 10 && r._3 === 0L)
    assert(r._5 === Seq.fill(10)("1-1").mkString(","))
  }

  test("galeChurch on text columns: splitter feeds the DP") {
    val df = Seq((7L, "First one. Second bit! Third?", "First one. Third?"))
      .toDF("id", "ta", "tb")
    val got = Align.galeChurch(df, "id", "ta", "tb")
      .select("n_a", "n_b", "n_segments").as[(Int, Int, Int)].head()
    assert(got._1 === 3 && got._2 === 2 && got._3 >= 2)
  }
}
