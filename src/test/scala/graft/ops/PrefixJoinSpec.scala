package graft.ops

import graft.SparkTestBase

class PrefixJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** The engine's shingle-set semantics replayed on strings: lowercase
    * whitespace tokens; < k tokens → one whole-text shingle; else distinct
    * k-gram strings. String sets and 64-bit hash sets have identical
    * |∩|/|∪| absent hash collisions (impossible to matter at this scale).
    */
  private def shingleSet(text: String, k: Int = 3): Set[String] = {
    val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (t.length < k) Set(t.mkString(" "))
    else t.sliding(k).map(_.mkString(" ")).toSet
  }

  private def brutePairs(
      docs: Seq[(Long, String)], tPpm: Long): Set[(Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, tx) => id -> shingleSet(tx) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      un = sa.size + sb.size - inter
      if inter * 1000000L >= tPpm * un
    } yield (ia, ib, inter, un, inter * 1000000L / un)).toSet
  }

  test("prefix-filtered join equals exhaustive all-pairs on a randomized corpus") {
    // Seeded corpus engineered to straddle the threshold: 12 base docs of
    // 15 pool tokens each, plus mutated copies with 0–4 substitutions —
    // Jaccard lands on both sides of 0.6, exercising prefix lengths > 1,
    // the length-ratio filter, and the positional bound.
    val rnd = new scala.util.Random(42)
    val pool = (1 to 60).map(i => s"tok$i")
    val bases = (0 until 12).map { i =>
      (i.toLong, rnd.shuffle(pool).take(15).mkString(" "))
    }
    val mutated = bases.zipWithIndex.map { case ((id, tx), i) =>
      val toks = tx.split(" ")
      val nMut = i % 5
      val mut = toks.zipWithIndex.map { case (t, j) =>
        if (j < nMut) s"mut${i}x$j" else t
      }
      (id + 100L, mut.mkString(" "))
    }
    val docs = bases ++ mutated
    val got = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.6)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = brutePairs(docs, 600000L)
    assert(want.nonEmpty, "fixture must produce qualifying pairs")
    assert(want.exists(_._5 < 1000000L), "fixture must produce NON-exact pairs")
    assert(got === want)
  }

  test("recall 1.0 at a high threshold: exact duplicates always collide") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words in this one here"))
    val got = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.99)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L)))
    assert(got.head._5 === 1000000L)
  }

  test("bucket cap is the one exactness trade: capped hot key drops its pairs") {
    // 8 identical docs share every (rare) prefix token; cap 3 drops the
    // whole bucket -> zero pairs, exactly the documented behavior. Cap 0
    // (uncapped) restores the full 28-pair clique.
    val docs = (1 to 8).map(i => (i.toLong, "same exact text in every document body"))
    val capped = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.9, maxBucketSize = 3).count()
    assert(capped === 0L)
    val full = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.9, maxBucketSize = 0).count()
    assert(full === 28L)
  }
}
