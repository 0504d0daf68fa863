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

  test("prefixContainmentPairs equals exhaustive |∩|/min on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val pool = (1 to 50).map(i => s"w$i")
    // Hosts, embedded quotes (prefix/suffix context), and unrelated docs.
    val docs = (0 until 8).flatMap { i =>
      val host = rnd.shuffle(pool).take(20)
      Seq((i.toLong, host.mkString(" ")),
        (i + 100L, host.slice(3, 15).mkString(" ")), // quoted slice
        // Partial containment: a 10-token run of the host plus three
        // foreign tokens -> 8 of 11 shingles shared (ppm 727272).
        (i + 300L, (host.slice(0, 10) ++
          Seq(s"x$i", s"y$i", s"z$i")).mkString(" ")),
        (i + 200L, rnd.shuffle(pool).take(12).mkString(" ")))
    }
    val got = Dedup.prefixContainmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.7)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val sets = docs.map { case (id, tx) => id -> shingleSet(tx) }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      mn = math.min(sa.size, sb.size).toLong
      if inter * 1000000L >= 700000L * mn
    } yield (ia, ib, inter, mn, inter * 1000000L / mn)).toSet
    assert(want.nonEmpty && want.exists(_._5 < 1000000L))
    assert(got === want)
    // The quoted slices themselves must all be caught (containment 1.0
    // where symmetric jaccard scores ~12/28 and misses).
    (0 until 8).foreach(i => assert(got.exists(p =>
      p._1 == i.toLong && p._2 == i + 100L && p._5 == 1000000L)))
  }

  test("prefixContainmentPairs: the df cap is the documented boilerplate trade") {
    val phrase = (1 to 12).map(i => s"c$i").mkString(" ")
    val docs = (1 to 8).map(i =>
      (i.toLong, s"$phrase filler${i}a filler${i}b filler${i}c"))
      .toDF("doc_id", "text")
    // Every cross-host shared shingle is the phrase's (df = 8): a cap of 5
    // blocks them all; the generous default finds the full clique.
    val capped = Dedup.prefixContainmentPairs(docs, "doc_id", "text",
      threshold = 0.7, maxTokenDf = 5).count()
    assert(capped === 0L)
    val full = Dedup.prefixContainmentPairs(docs, "doc_id", "text",
      threshold = 0.7).count()
    assert(full === 28L)
  }

  test("prefixContainmentAudit: df census is exact and candidates shrink under the cap") {
    val phrase = (1 to 12).map(i => s"c$i").mkString(" ")
    val docs = (1 to 8).map(i =>
      (i.toLong, s"$phrase filler${i}a filler${i}b filler${i}c"))
      .toDF("doc_id", "text")
    // Boilerplate phrase shingles have df = 8; per-doc filler shingles df=1.
    // Each doc: 12 phrase tokens + 3 fillers = 15 tokens -> 13 shingles,
    // 10 of them the shared phrase's, 3 involving fillers (unique per doc).
    val uncapped = Dedup.prefixContainmentAudit(docs, "doc_id", "text",
      threshold = 0.7, maxTokenDf = 0).collect().head
    assert(uncapped.getAs[Long]("n_docs") === 8L)
    assert(uncapped.getAs[Long]("n_hot_tokens") === 0L)
    assert(uncapped.getAs[Long]("hot_df_mass") === 0L)
    assert(uncapped.getAs[Long]("n_tokens") === 10L + 8L * 3L)
    val capped = Dedup.prefixContainmentAudit(docs, "doc_id", "text",
      threshold = 0.7, maxTokenDf = 5).collect().head
    // The 10 shared-phrase shingles are the hot universe: df 8 each.
    assert(capped.getAs[Long]("n_hot_tokens") === 10L)
    assert(capped.getAs[Long]("hot_df_mass") === 80L)
    // Candidate mass: the cap excises every cross-doc collision (the spec
    // above shows the join finds 0 pairs); uncapped the clique candidates
    // survive. The audit's candidate column is the join's own stage.
    assert(capped.getAs[Long]("n_candidates") === 0L)
    assert(uncapped.getAs[Long]("n_candidates") === 28L)
  }

  test("derivedTokenDfCap: the df band scales with the corpus, floored at 50") {
    // The sf10 measurement's linear point: 500,020 docs -> cap 100
    // (= n_docs / 5000); below 250k docs the floor of 50 holds so tiny
    // corpora never over-cap (SCALING.md "the maxTokenDf valve, measured").
    assert(Dedup.derivedTokenDfCap(8L) === 50)
    assert(Dedup.derivedTokenDfCap(249999L) === 50)
    assert(Dedup.derivedTokenDfCap(500020L) === 100)
    assert(Dedup.derivedTokenDfCap(5000000L) === 1000)
    assert(Dedup.derivedTokenDfCap(50000000L) === 10000)
  }

  test("prefixContainmentPairs DEFAULT cap binds: boilerplate over the derived band is excised") {
    // 60 docs all sharing one 12-token boilerplate phrase: phrase-shingle
    // df = 60 > derivedTokenDfCap(60) = 50, so the DEFAULT (no cap
    // argument) excises the boilerplate blocking tokens and the
    // all-boilerplate clique disappears — the valve binding with no
    // operator action, which is the point of deriving it. maxTokenDf = 0
    // (the oracle's exact mode) still finds the full C(60,2) clique.
    val phrase = (1 to 12).map(i => s"c$i").mkString(" ")
    val docs = (1 to 60).map(i =>
      (i.toLong, s"$phrase filler${i}a filler${i}b filler${i}c"))
      .toDF("doc_id", "text")
    val derived = Dedup.prefixContainmentPairs(docs, "doc_id", "text",
      threshold = 0.7).count()
    assert(derived === 0L)
    val exact = Dedup.prefixContainmentPairs(docs, "doc_id", "text",
      threshold = 0.7, maxTokenDf = 0).count()
    assert(exact === 60L * 59L / 2L)
    // The audit prices the same default: 10 phrase shingles, df 60 each.
    val audit = Dedup.prefixContainmentAudit(docs, "doc_id", "text",
      threshold = 0.7).collect().head
    assert(audit.getAs[Long]("n_docs") === 60L)
    assert(audit.getAs[Long]("n_hot_tokens") === 10L)
    assert(audit.getAs[Long]("hot_df_mass") === 600L)
    assert(audit.getAs[Long]("n_candidates") === 0L)
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
