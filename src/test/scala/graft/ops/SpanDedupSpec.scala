package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("sentences: terminator runs, trimming, trailing fragment") {
    val out = Seq("One two. Three four! Five six? trailing bit")
      .toDF("text")
      .select(Dedup.sentences(col("text")).as("s"))
      .as[Seq[String]].head()
    assert(out === Seq("One two.", "Three four!", "Five six?", "trailing bit"))
  }

  test("dedupSentenceSpans keeps the first occurrence, cleans the rest") {
    // Docs 1 and 2 share the identical 3-sentence span A. B. C. —
    // doc 1 (lower id) keeps it, doc 2 loses those three sentences.
    val docs = Seq(
      (1L, "A one. B two. C three. Unique tail one."),
      (2L, "Different head two. A one. B two. C three."),
      (3L, "Totally unrelated. Nothing shared here. At all."))
      .toDF("doc_id", "text")
    val m = Dedup.dedupSentenceSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(3) === 0L) // n_dup_spans
    assert(m(1L).getString(4) === "A one. B two. C three. Unique tail one.")
    assert(m(2L).getLong(3) === 1L)
    assert(m(2L).getString(4) === "Different head two.")
    assert(m(3L).getLong(3) === 0L)
    assert(m(3L).getString(4) === "Totally unrelated. Nothing shared here. At all.")
  }

  test("repeated span inside ONE document dedups against itself") {
    val docs = Seq(
      (7L, "X a. Y b. Z c. Filler mid. X a. Y b. Z c."))
      .toDF("doc_id", "text")
    val r = Dedup.dedupSentenceSpans(docs, "doc_id", "text").collect().head
    assert(r.getLong(1) === 7L) // n_sentences
    assert(r.getLong(2) === 5L) // n_spans
    // Span at idx 4 (second X a. Y b. Z c.) is a dup of idx 0.
    assert(r.getLong(3) === 1L)
    assert(r.getString(4) === "X a. Y b. Z c. Filler mid.")
  }

  test("null text degrades to zero sentences, empty cleaned text") {
    val docs = Seq((1L, "Real one. Real two. Real three."), (2L, null))
      .toDF("doc_id", "text")
    val m = Dedup.dedupSentenceSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(2L).getLong(1) === 0L)
    assert(m(2L).getLong(2) === 0L)
    assert(m(2L).getLong(3) === 0L)
    assert(m(2L).getString(4) === "")
    assert(m(1L).getLong(1) === 3L)
  }

  test("documents shorter than the span pass through") {
    val docs = Seq((1L, "Short one. Short two."), (2L, "Short one. Short two."))
      .toDF("doc_id", "text")
    val rows = Dedup.dedupSentenceSpans(docs, "doc_id", "text").collect()
    assert(rows.forall(_.getLong(2) === 0L))
    assert(rows.forall(_.getString(4) === "Short one. Short two."))
  }

  test("sliceOverlap counts shared distinct grams with the ubiquity cap") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),   // grams: abc bcd(ish)
      (2L, "alpha beta gamma epsilon", "s2"), // shares 'alpha beta gamma' with s1
      (3L, "alpha beta gamma zeta", "s3"),    // ubiquitous gram: in all 3
      (4L, "unique little sentence here", "s1"))
      .toDF("doc_id", "text", "source")
    // cap 2: 'alpha beta gamma' appears in 3 slices → excluded everywhere.
    val m = Curation.sliceOverlap(docs, "source", "text", k = 3, maxSlices = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // Surviving grams: s1 {beta gamma delta, unique little sentence,
    // little sentence here}, s2 {beta gamma epsilon}, s3 {beta gamma zeta}
    // — no shared grams remain, so the matrix is empty.
    assert(m.isEmpty)
    // Without the cap the shared gram appears in every pair.
    val full = Curation.sliceOverlap(docs, "source", "text", k = 3,
        maxSlices = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(full(("s1", "s2")) === ((1L, 4L, 2L)))
    assert(full(("s1", "s3")) === ((1L, 4L, 2L)))
    assert(full(("s2", "s3")) === ((1L, 2L, 2L)))
    val j = Curation.sliceOverlap(docs, "source", "text", k = 3,
        maxSlices = 100)
      .where(col("src_a") === "s2" && col("src_b") === "s3")
      .select("jaccard", "overlap").as[(Double, Double)].head()
    assert(j === ((1.0 / 3.0, 0.5)))
  }

  test("property: matches a brute-force sequential reference on random corpora") {
    // Reference implementation: walk docs in id order, collect seen spans,
    // mark non-first occurrences, rebuild — the single-machine C4 loop the
    // distributed operator must agree with exactly.
    def reference(docs: Seq[(Long, String)], span: Int)
        : Map[Long, (Long, Long, Long, String)] = {
      def sent(t: String): Seq[String] =
        "[^.!?]+[.!?]*".r.findAllIn(t).map(_.trim).filter(_.nonEmpty).toSeq
      val first = scala.collection.mutable.Map.empty[String, (Long, Int)]
      for ((id, t) <- docs.sortBy(_._1); s = sent(t);
           i <- 0 to s.length - span) {
        val g = s.slice(i, i + span).mkString(" ")
        if (!first.contains(g)) first(g) = (id, i)
      }
      docs.map { case (id, t) =>
        val s = sent(t)
        val dup = (0 to s.length - span).filter { i =>
          first(s.slice(i, i + span).mkString(" ")) != ((id, i))
        }
        val keptSents = s.indices.filterNot(j =>
          dup.exists(i => j >= i && j < i + span)).map(s)
        id -> ((s.length.toLong, math.max(s.length - span + 1, 0).toLong,
          dup.length.toLong, keptSents.mkString(" ")))
      }.toMap
    }
    // Random corpora from a tiny sentence alphabet → heavy span collisions.
    val rng = new scala.util.Random(42)
    for (round <- 0 until 5) {
      val sents = (0 until 6).map(i => s"s$i.")
      val docs = (0L until 30L).map { id =>
        val n = rng.nextInt(8)
        (id, Seq.fill(n)(sents(rng.nextInt(sents.length))).mkString(" "))
      }
      val got = Dedup.dedupSentenceSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
      assert(got === reference(docs, 3), s"round $round")
    }
  }

  test("span-dedup shuffles span hashes, never sentence text") {
    val docs = (0L until 200L)
      .map(i => (i, s"Alpha $i one. Beta $i two. Gamma $i three. Delta four."))
      .toDF("doc_id", "text")
    val plan = Dedup.dedupSentenceSpans(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // Every hash exchange must carry only (h, id, idx)-shaped rows — the
    // sentence array stays on the narrow pre-shuffle side.
    val exchangeKeys = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchangeKeys.nonEmpty)
    assert(!exchangeKeys.exists(_.contains("__s")),
      s"sentence array must not be a shuffle key:\n$plan")
  }

  test("sliceOverlap plan: text never rides a shuffle, grams do") {
    val docs = (0L until 200L)
      .map(i => (i, s"tok$i alpha beta gamma ${i % 7}", s"s${i % 5}"))
      .toDF("doc_id", "text", "source")
    val out = Curation.sliceOverlap(docs, "source", "text", k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\([^)]*text".r.findFirstIn(plan).isEmpty,
      s"raw text must not be shuffled:\n$plan")
    assert(out.count() > 0)
  }

  test("duplicateSubstringSpans finds maximal cross-doc token spans") {
    // Docs 1 and 2 share a 10-token run; with minLen = 4 the span must be
    // reported at FULL extent in both docs (maximal, not per-seed), at the
    // right token offsets. Doc 3 shares nothing 4 tokens long.
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),
      (2L, s"head1 head2 head3 $shared"),
      (3L, "alpha beta solo delta epsilon apart eta theta lone kappa"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSubstringSpans(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSet === Set((1L, 0L, 9L, 10L), (2L, 3L, 12L, 10L)),
      spans.toSeq.toString)
  }

  test("duplicateSubstringSpans merges runs and splits on gaps") {
    // One doc repeats a 4-gram twice with a unique token between: two
    // DISJOINT spans, each of exactly minLen tokens, both from
    // SELF-repetition (no second doc needed).
    val docs = Seq((5L, "p q r s gapword p q r s othertail"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSubstringSpans(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSet === Set((0L, 3L, 4L), (5L, 8L, 4L)), spans.toSeq.toString)
  }

  test("seed gap below minLen merges into ONE span (no overlap, frac <= 1)") {
    // Doc 10's 4-grams at pos 0 and pos 2 are each duplicated (against
    // DIFFERENT docs); the gram at pos 1 is unique. The two seeds cover
    // token ranges [0,3] and [2,5] — overlapping — so they must merge
    // into a single span [0,5]. A naive pos-minus-row_number island
    // grouping splits them into two overlapping spans and
    // duplicateTokenRatio then reports 8 dup tokens in a 6-token doc
    // (dup_frac 1.33 > 1).
    val docs = Seq(
      (10L, "w1 w2 w3 w4 w5 w6"),
      (11L, "w1 w2 w3 w4 xx yy zz"),   // shares only the pos-0 gram
      (12L, "pp qq w3 w4 w5 w6"))      // shares only the pos-2 gram
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSubstringSpans(docs, "doc_id", "text", minLen = 4)
      .where(col("doc_id") === 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSet === Set((0L, 5L, 6L)), spans.toSeq.toString)
    val m = Dedup.duplicateTokenRatio(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m(10L) === ((6L, 1L, 6L, 1.0)), m.toString)
    assert(m.values.forall(_._4 <= 1.0), m.toString)
  }

  test("duplicateSubstringSpansExact requires the WHOLE span to repeat") {
    // Doc 20 has every 3-gram duplicated SOMEWHERE (alternating against
    // docs 21/22) but the full 6-token string repeats nowhere: the relaxed
    // operator reports one 6-token span; the exact one must report only
    // the two genuinely repeating 4-token matches, merged into [0,5] by
    // coverage union — and doc 23, sharing nothing, reports nothing.
    val docs = Seq(
      (20L, "a b c d e f"),
      (21L, "a b c d x1 x2"),    // matches [0,3] of 20
      (22L, "y1 y2 c d e f"),    // matches [2,5] of 20
      (23L, "p q r s t u"))
      .toDF("doc_id", "text")
    val exact = Dedup.duplicateSubstringSpansExact(docs, "doc_id", "text",
        minLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact === Set((20L, 0L, 5L), (21L, 0L, 3L), (22L, 2L, 5L)),
      exact.toString)
  }

  test("duplicateSubstringSpansExact vs relaxed: extension must verify") {
    // The discriminating corpus: doc 30's grams at pos 0 and pos 2 are
    // duplicated against DIFFERENT partners with a unique middle gram.
    // The relaxed operator merges seeds [0] and [2] into one [0,5] span
    // for doc 30 — but no 5+-token substring of doc 30 repeats anywhere,
    // so the exact operator reports the two 4-token matches separately
    // ONLY where they truly repeat. (Coverage union still merges the
    // overlapping [0,3] and [2,5] into [0,5] for doc 30 — both intervals
    // are genuine repeats; what changes is doc 31/32's sides.)
    val docs = Seq(
      (30L, "w1 w2 w3 w4 w5 w6"),
      (31L, "w1 w2 w3 w4 aa bb cc"),
      (32L, "pp qq w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val exact = Dedup.duplicateSubstringSpansExact(docs, "doc_id", "text",
        minLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact === Set((30L, 0L, 5L), (31L, 0L, 3L), (32L, 2L, 5L)),
      exact.toString)
  }

  test("duplicateSubstringSpansExact equals a quadratic diagonal-scan oracle (property)") {
    // Ground truth by definition: for every ordered doc pair and every
    // diagonal, token-equality runs of length >= minLen cover their
    // interval; per-doc coverage union (overlap-or-adjacent) is the
    // answer. Small alphabet forces dense repeats, self-matches included.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def tokensOf(s: String): Array[String] =
      s.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def brute(pool: Seq[(Long, String)], minLen: Int): Set[(Long, Long, Long, Long)] = {
      val toks = pool.map { case (id, s) => id -> tokensOf(s) }.toMap
      val cover = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[(Int, Int)]]
      def addRun(id: Long, s: Int, e: Int): Unit =
        cover.getOrElseUpdate(id, scala.collection.mutable.Set.empty) += ((s, e))
      for ((ida, ta) <- toks; (idb, tb) <- toks if ida <= idb) {
        val diags =
          if (ida == idb) (1 until ta.length).map(d => (d, true))
          else (-(tb.length - 1) until ta.length).map(d => (d, false))
        for ((d, self) <- diags) {
          // positions p in a, p - d in b; runs of equality.
          var p = math.max(0, d)
          var runStart = -1
          def flush(end: Int): Unit = {
            if (runStart >= 0 && end - runStart >= minLen) {
              addRun(ida, runStart, end - 1)
              addRun(idb, runStart - d, end - 1 - d)
            }
            runStart = -1
          }
          while (p < ta.length && p - d < tb.length) {
            if (p - d >= 0 && ta(p) == tb(p - d) && !(self && d == 0)) {
              if (runStart < 0) runStart = p
            } else flush(p)
            p += 1
          }
          flush(p)
        }
      }
      cover.flatMap { case (id, ivs) =>
        val sorted = ivs.toSeq.sorted
        val merged = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
        for ((s, e) <- sorted) {
          if (merged.nonEmpty && s <= merged.last._2 + 1)
            merged(merged.length - 1) =
              (merged.last._1, math.max(merged.last._2, e))
          else merged += ((s, e))
        }
        merged.map { case (s, e) =>
          (id, s.toLong, e.toLong, (e - s + 1).toLong) }
      }.toSet
    }
    val word = Gen.oneOf("a", "b", "c", "d")
    val gen = Gen.listOfN(8, for {
      len <- Gen.choose(0, 18)
      ws <- Gen.listOfN(len, word)
    } yield ws.mkString(" "))
    for (i <- 0 until 5) {
      val minLen = 2 + (i % 2)
      val pool = gen(Gen.Parameters.default, Seed(31L + i)).get
        .zipWithIndex.map { case (s, id) => (id.toLong, s) }
      val got = Dedup.duplicateSubstringSpansExact(
          pool.toDF("doc_id", "text"), "doc_id", "text", minLen = minLen)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = brute(pool, minLen)
      assert(got === want,
        s"seed=${31 + i} minLen=$minLen missing=${want -- got} extra=${got -- want}")
    }
  }

  test("removeDuplicateSpans keeps the first occurrence, cuts the rest") {
    val shared = "a1 a2 a3 a4 a5 a6"
    val docs = Seq(
      (1L, s"$shared tail one here"),   // first occurrence — untouched
      (2L, s"front bit $shared"),       // later occurrence — loses the run
      (3L, "nothing shared at all in this document text"))
      .toDF("doc_id", "text")
    val m = Dedup.removeDuplicateSpans(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(m(1L) === ((9L, 0L, "a1 a2 a3 a4 a5 a6 tail one here")))
    assert(m(2L) === ((8L, 6L, "front bit")))
    assert(m(3L)._2 === 0L)
    // An exact duplicate of doc 1 collapses entirely.
    val withCopy = docs.union(Seq((9L, s"$shared tail one here")).toDF("doc_id", "text"))
    val c = Dedup.removeDuplicateSpans(withCopy, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(c(9L) === "")
    assert(c(1L) === "a1 a2 a3 a4 a5 a6 tail one here")
  }

  test("removeReferenceSpans scrubs reference runs, keeps everything else") {
    val refRun = "r1 r2 r3 r4 r5 r6"
    val ref = Seq((100L, s"some head $refRun some tail")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"keep one $refRun keep two"),    // interior run scrubbed
      (2L, "nothing from the reference here at all"),
      (3L, refRun))                          // exact run → empty
      .toDF("doc_id", "text")
    val m = Dedup.removeReferenceSpans(train, "doc_id", "text", ref, "text",
        minLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(m(1L) === ((10L, 6L, "keep one keep two")))
    assert(m(2L)._2 === 0L)
    assert(m(3L) === ((6L, 6L, "")))
    // Gap-of-one: grams at pos 0 and 2 in the ref set, pos 1 not — one
    // merged span, n_removed never exceeds the doc length.
    val ref2 = Seq((101L, "w1 w2 w3 w4 xx"), (102L, "pp w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val t2 = Seq((9L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val g = Dedup.removeReferenceSpans(t2, "doc_id", "text", ref2, "text",
        minLen = 4)
      .collect().head
    assert(g.getLong(1) === 6L && g.getLong(2) === 6L && g.getString(3) === "")
  }

  test("cdcChunks: chunks tile the doc; identical docs fully co-occur") {
    val text = (1 to 60).map(i => s"w${i * 7 % 53}").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val rows = Dedup.cdcChunks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // Chunks tile [0, 60) without gaps or overlaps.
    assert(d1.head._2 === 0L && d1.map(c => c._2 + c._3).max === 60L)
    assert(d1.sliding(2).forall {
      case Array(a, b) => a._2 + a._3 === b._2; case _ => true })
    assert(d1.length > 2, s"expected several chunks, got ${d1.length}")
    // Every chunk of the identical twin co-occurs (n_occurrences = 2).
    assert(rows.forall(_._4 === 2L), rows.mkString(","))
  }

  test("cdc dedup is shift-robust where fixed windows are not") {
    val base = (1 to 80).map(i => s"tok${i * 11 % 71}").mkString(" ")
    val docs = Seq((1L, base), (2L, "zzz qqq " + base)).toDF("doc_id", "text")
    val stats = Dedup.cdcDedupStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4)))
      .toMap
    // The shifted copy still dedups most of its mass: all chunks after
    // the first boundary re-align on content.
    assert(stats(2L)._3 > 0.5, stats.toString)
    assert(stats(1L)._3 > 0.5, stats.toString)
    // A chunkless (empty) doc reports zeros.
    val z = Dedup.cdcDedupStats(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(z.getLong(1) === 0L && z.getDouble(4) === 0.0)
  }

  test("duplicateTokenRatio reports exact duplicated-token mass") {
    val docs = Seq(
      (1L, "a b c d e f g h"),   // full-doc dup of doc 2
      (2L, "a b c d e f g h"),
      (3L, "none of these eight words repeat anywhere today"))
      .toDF("doc_id", "text")
    val m = Dedup.duplicateTokenRatio(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m(1L) === ((8L, 1L, 8L, 1.0)))
    assert(m(2L) === ((8L, 1L, 8L, 1.0)))
    assert(m(3L) === ((8L, 0L, 0L, 0.0)))
    // Shuffles carry only (id, pos, hash) — never the document text.
    val plan = Dedup.duplicateTokenRatio(docs, "doc_id", "text", minLen = 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\([^)]*text".r.findFirstIn(plan).isEmpty,
      s"raw text must not be shuffled:\n$plan")
  }
}
