package graft.ops

import graft.SparkTestBase

class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("viterbi picks the maximum-likelihood path, not greedy longest match") {
    // vocab scores (ppm log-probs, higher = likelier):
    //   "ab" -> -1_000_000, "abc" -> -5_000_000, "c" -> -2_000_000,
    //   "a" -> -4_000_000, "b" -> -4_000_000
    // "abc": greedy longest-match takes "abc" (-5M); Viterbi takes
    // "ab|c" (-3M) because it scores higher.
    val vocab = Map("ab" -> -1000000L, "abc" -> -5000000L,
      "c" -> -2000000L, "a" -> -4000000L, "b" -> -4000000L)
    val (p, s) = UnigramLm.viterbi("abc", vocab, 6, 16, -30000000L)
    assert(p === Seq("ab", "c"))
    assert(s === -3000000L)
  }

  test("viterbi ties: fewer pieces wins, then the longer final piece") {
    // "aa" with a/aa equal-cost paths: "aa" (1 piece, -2M) vs "a|a"
    // (2 pieces, -2M) -> fewer pieces.
    val v1 = Map("a" -> -1000000L, "aa" -> -2000000L)
    assert(UnigramLm.viterbi("aa", v1, 6, 16, -30000000L)._1 === Seq("aa"))
    // "abc" with ab|c and a|bc both -2M, both 2 pieces: the longer FINAL
    // piece (split point 1, piece "bc") wins.
    val v2 = Map("ab" -> -1000000L, "c" -> -1000000L,
      "a" -> -1000000L, "bc" -> -1000000L)
    assert(UnigramLm.viterbi("abc", v2, 6, 16, -30000000L)._1 ===
      Seq("a", "bc"))
  }

  test("viterbi: unknown chars fall back, long words route whole") {
    val vocab = Map("a" -> -1000000L)
    // "axa": x is not in vocab -> unk single-char fallback.
    val (p, s) = UnigramLm.viterbi("axa", vocab, 6, 16, -7000000L)
    assert(p === Seq("a", "x", "a"))
    assert(s === -9000000L)
    // Past maxWordLen the word routes whole at the unknown score.
    val long = "x" * 17
    assert(UnigramLm.viterbi(long, vocab, 6, 16, -7000000L) ===
      ((Seq(long), -7000000L)))
  }

  test("fitVocab keeps all chars plus top multi-pieces; scores normalize over kept") {
    // Corpus: "ab ab b" -> words ab(2), b(1).
    // Pieces (maxPieceLen 2): from ab×2: a:2, b:2, ab:2; from b×1: b:1.
    // -> a:2, b:3, ab:2. vocabSize 3 keeps chars {a:2, b:3} + top-1
    // multi {ab:2}; total = 7.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val got = UnigramLm.fitVocab(docs, "text", vocabSize = 3,
        maxPieceLen = 2)
      .orderBy("piece").as[(String, Long, Long)].collect().toSeq
    def sc(n: Long) = math.round(1e6 * math.log(n.toDouble / 7))
    assert(got === Seq(("a", 2L, sc(2)), ("ab", 2L, sc(2)),
      ("b", 3L, sc(3))))
    // vocabSize 2 = #chars -> no multi-char pieces survive.
    val charsOnly = UnigramLm.fitVocab(docs, "text", vocabSize = 2,
      maxPieceLen = 2).select("piece").as[String].collect().toSet
    assert(charsOnly === Set("a", "b"))
  }

  test("refitVocab: hard-EM round prunes unused pieces, floors chars, rescores") {
    // Corpus "abab ab": fit at vocabSize 8, maxPieceLen 2 keeps chars
    // {a, b} and multi {ab, ba} (and "abab" is too long at k=2). Viterbi
    // then segments both words purely as "ab" pieces: usage ab = 2·1 + 1·1
    // = 3 (word "abab" count 1 -> 2 pieces... weighted by word count),
    // chars a, b unused -> floored to 1; "ba" unused -> pruned.
    val docs = Seq((1L, "abab ab")).toDF("doc_id", "text")
    val vocab = UnigramLm.fitVocab(docs, "text", vocabSize = 8,
        maxPieceLen = 2)
      .select("piece", "score_ppm").as[(String, Long)].collect().toSeq
    assert(vocab.map(_._1).toSet === Set("a", "b", "ab", "ba"))
    val got = UnigramLm.refitVocab(docs, "text", vocab, maxPieceLen = 2)
      .orderBy("piece").as[(String, Long, Long)].collect().toSeq
    // usage: abab -> ab|ab (2 per occurrence, count 1), ab -> ab (1).
    val total = 1L + 1L + 3L
    def sc(n: Long) = math.round(1e6 * math.log(n.toDouble / total))
    assert(got === Seq(("a", 1L, sc(1)), ("ab", 3L, sc(3)),
      ("b", 1L, sc(1))))
  }

  test("encodeWords segments the distinct-word table under a fitted vocab") {
    val docs = Seq((1L, "abab ab cc"), (2L, "abab cc cc")).toDF("doc_id", "text")
    val vocab = UnigramLm.fitVocab(docs, "text", vocabSize = 10,
        maxPieceLen = 3)
      .select("piece", "score_ppm").as[(String, Long)].collect().toSeq
    val got = UnigramLm.encodeWords(docs, "text", vocab)
      .orderBy("word").as[(String, Long, String, Long, Long)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2)) ===
      Seq(("ab", 1L), ("abab", 2L), ("cc", 3L)))
    // Every word reconstructs from its pieces.
    got.foreach(r => assert(r._3.split('|').mkString === r._1))
    // The Viterbi score of a known single-piece word equals its vocab score.
    val vmap = vocab.toMap
    val ab = got.find(_._1 == "ab").get
    assert(ab._3 === "ab" && ab._5 === vmap("ab"))
  }
}
