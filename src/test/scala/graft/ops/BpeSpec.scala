package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Pins the BPE merge loop against the Sennrich et al. 2016 worked example
  * (low / lower / newest / widest) — the iterative argmax is what the SQL
  * oracle cannot express (q_bpe_merges' documented no_oracle; q_bpe_pairs
  * oracles the step-0 argmax input exactly).
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // Word frequencies of the paper's example, flattened to documents.
  private lazy val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest") match {
    case words => words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("wordSymbolCounts splits to code points plus the terminal") {
    val m = Bpe.wordSymbolCounts(corpus, "text")
      .as[(Seq[String], Long)].collect().toMap
    assert(m(Seq("l", "o", "w", "</w>")) === 5L)
    assert(m(Seq("n", "e", "w", "e", "s", "t", "</w>")) === 6L)
    assert(m.size === 4)
  }

  test("step-0 pair counts match the worked example") {
    val pc = Bpe.pairCounts(Bpe.wordSymbolCounts(corpus, "text"))
      .as[(String, String, Long)].collect()
      .map { case (l, r, n) => (l, r) -> n }.toMap
    assert(pc(("e", "s")) === 9L)
    assert(pc(("s", "t")) === 9L)
    assert(pc(("t", "</w>")) === 9L)
    assert(pc(("w", "e")) === 8L)
    assert(pc(("l", "o")) === 7L)
  }

  test("learnMerges reproduces the deterministic merge sequence") {
    // Max count 9 is shared by (e,s), (s,t), (t,</w>); lexicographic
    // tiebreak picks (e,s), then the fused symbols keep winning: (es,t),
    // (est,</w>); step 3 falls to the count-7 tie won by (l,o).
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 4)
      .orderBy("step")
      .as[(Int, String, String, Long)].collect()
    assert(merges === Array(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "est", "</w>", 9L),
      (3, "l", "o", 7L)))
  }

  test("applyMerge fuses left-to-right without overlap") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("x", "a", "a", "y"), "a", "a") === Seq("x", "aa", "y"))
    assert(Bpe.applyMerge(Seq("a", "b"), "b", "a") === Seq("a", "b"))
  }

  test("encodeTokenCounts segments the corpus under the learned merges") {
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 4)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // After (e,s), (es,t), (est,</w>), (l,o):
    //   low    → [lo, w, </w>]         ×5
    //   lower  → [lo, w, e, r, </w>]   ×2
    //   newest → [n, e, w, est</w>]    ×6
    //   widest → [w, i, d, est</w>]    ×3
    val counts = Bpe.encodeTokenCounts(corpus, "text", merges)
      .as[(String, Long)].collect().toMap
    assert(counts("est</w>") === 9L)
    assert(counts("lo") === 7L)
    assert(counts("w") === 5L + 2L + 6L + 3L)
    assert(counts("</w>") === 7L) // low + lower only; others fused into est</w>
    assert(counts("e") === 2L + 6L)
    assert(counts.get("est") === None)   // fully fused with </w>
    assert(counts.get("l") === None)     // fully fused into lo
    // applyMerges is order-respecting: the chain builds est</w> stepwise.
    assert(Bpe.applyMerges(Seq("n", "e", "w", "e", "s", "t", "</w>"), merges)
      === Seq("n", "e", "w", "est</w>"))
  }

  test("merge loop stops early when no pairs remain") {
    val tiny = Seq((1L, "a")).toDF("doc_id", "text") // [a </w>]: one pair
    val merges = Bpe.learnMerges(tiny, "text", numMerges = 10)
      .as[(Int, String, String, Long)].collect()
    assert(merges.length === 1)
    assert(merges.head === ((0, "a", "</w>", 1L)))
  }
}
