package graft.ops

import graft.SparkTestBase

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  private def lnPpm(num: Double, den: Double): Long =
    math.round(1e6 * math.log(num / den))

  test("train: dense add-one likelihoods and priors, integer-exact") {
    val docs = Seq(
      (1L, "a", "x x y"), (2L, "a", "x z"), (3L, "b", "y y z"))
      .toDF("doc_id", "lab", "text")
    val m = NaiveBayes.train(docs, "lab", "text", Seq("x", "y", "z"))
    val pri = m.priors.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pri("a") === ((2L, lnPpm(2, 3))))
    assert(pri("b") === ((1L, lnPpm(1, 3))))
    val lik = m.likelihood.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // class a: x=3 y=1 z=1, T=5, V=3 → (c+1)/(5+3)
    assert(lik(("a", "x")) === ((3L, lnPpm(4, 8))))
    assert(lik(("a", "y")) === ((1L, lnPpm(2, 8))))
    assert(lik(("a", "z")) === ((1L, lnPpm(2, 8))))
    // class b: x=0 (dense row present — the smoothing floor) y=2 z=1, T=3
    assert(lik(("b", "x")) === ((0L, lnPpm(1, 6))))
    assert(lik(("b", "y")) === ((2L, lnPpm(3, 6))))
    assert(lik(("b", "z")) === ((1L, lnPpm(2, 6))))
    assert(lik.size === 6) // dense: 2 labels × 3 vocab
  }

  test("classify: prior + occurrence sums, oov ignored, prior fallback, tie to larger label") {
    val docs = Seq(
      (1L, "a", "x x y"), (2L, "a", "x z"), (3L, "b", "y y z"))
      .toDF("doc_id", "lab", "text")
    val m = NaiveBayes.train(docs, "lab", "text", Seq("x", "y", "z"))
    val test = Seq(
      (10L, "x x qqq"),      // x-heavy → a; oov token ignored
      (11L, "y y"),          // y-heavy → b
      (12L, "qqq zzz www"))  // zero in-vocab tokens → priors only → a
      .toDF("doc_id", "text")
    val got = NaiveBayes.classify(test, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(10L)._1 === "a")
    assert(got(10L)._2 === lnPpm(2, 3) + 2 * lnPpm(4, 8))
    assert(got(11L)._1 === "b")
    assert(got(11L)._2 === lnPpm(1, 3) + 2 * lnPpm(3, 6))
    assert(got(12L) === (("a", lnPpm(2, 3))))
    // Exact symmetric tie: identical classes → the lexicographically
    // larger label wins (the max-struct convention).
    val sym = Seq((1L, "a", "x y"), (2L, "b", "x y")).toDF("doc_id", "lab", "text")
    val ms = NaiveBayes.train(sym, "lab", "text", Seq("x", "y"))
    val t = NaiveBayes.classify(Seq((9L, "x")).toDF("doc_id", "text"),
      "doc_id", "text", ms).collect().head
    assert(t.getString(1) === "b")
  }

  test("dupGramFraction: exact census on a hand corpus") {
    // Shingles (k=2): doc1 {a b, b c}, doc2 {a b, b d}, doc3 {e f, f g}.
    // df: "a b"=2 (dup), others 1.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "e f g")).toDF("doc_id", "text")
    val got = Dedup.dupGramFraction(docs, "doc_id", "text", shingleK = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(got(0) === ((1L, 2L, 1L, 500000L)))
    assert(got(1) === ((2L, 2L, 1L, 500000L)))
    assert(got(2) === ((3L, 2L, 0L, 0L)))
  }
}
