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

  test("token_lcs matches brute-force LCS on random token pairs; truncation") {
    def bruteLcs(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) =
          if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rnd = new scala.util.Random(7)
    val cases = (0 until 40).map { _ =>
      val n = rnd.nextInt(12)
      val m = rnd.nextInt(12)
      (Seq.fill(n)(s"w${rnd.nextInt(5)}"), Seq.fill(m)(s"w${rnd.nextInt(5)}"))
    } ++ Seq(
      (Nil, Nil), (Seq("a"), Nil), (Nil, Seq("a")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")))
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
    val got = df.select($"id",
        graft.functions.AlignFunctions.token_lcs($"a", $"b", 16).as("l"))
      .select($"id", $"l.n_a", $"l.n_b", $"l.lcs")
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    for (((a, b), i) <- cases.zipWithIndex) {
      val (_, na, nb, l) = got(i.toLong)
      assert(na === math.min(a.length, 16) && nb === math.min(b.length, 16))
      assert(l === bruteLcs(a.take(16), b.take(16)),
        s"case $i: a=$a b=$b")
    }
    // truncation: identical 20-token sides cap at 16
    val long = (1 to 20).map(i => s"t$i")
    val t = Seq((0L, long, long)).toDF("id", "a", "b")
      .select(graft.functions.AlignFunctions.token_lcs($"a", $"b", 16).as("l"))
      .select($"l.n_a", $"l.lcs").as[(Int, Int)].head()
    assert(t === ((16, 16)))
  }

  test("rougeLContamination: blocking, hot-gram cap, exact ppm scores") {
    // bench doc 100 shares the trigram "x y z" with train docs 1 and 2;
    // train doc 3 shares nothing; the "hot hot hot" gram appears in many
    // train docs with cap exceeded — blocked, so doc 4 pairs with nothing.
    val docs = Seq(
      (100L, true, "x y z q r"),
      (101L, true, "hot hot hot hot only"),
      (1L, false, "a b x y z c"),
      (2L, false, "x y z"),
      (3L, false, "nothing shared here at all")) ++
      (10L to 15L).map(i => (i, false, s"hot hot hot filler$i"))
    val df = docs.toDF("doc_id", "bench", "text")
    val got = Align.rougeLContamination(df, "doc_id", "text", $"bench",
        shingleK = 3, maxDocsPerGram = 5L, maxTokens = 16)
      .as[(Long, Long, Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet === Set((1L, 100L), (2L, 100L)))
    // pair (1, 100): a = [a b x y z c], b = [x y z q r] → lcs = 3,
    // rouge = 2·3·1e6 // 11 = 545454
    assert(got((1L, 100L)) === ((1L, 100L, 6, 5, 3L, 545454L)))
    // pair (2, 100): a = [x y z] → lcs = 3, rouge = 6e6 // 8 = 750000
    assert(got((2L, 100L)) === ((2L, 100L, 3, 5, 3L, 750000L)))
  }
}
