package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Pins the Stupid-Backoff math (Brants et al. 2007) against hand-computed
  * fixtures — the transcendental `log10_ppl` column is verified here because
  * the cross-engine oracle can only bit-compare the exact-integer columns
  * (see q_lm_score's note in SparkEntry).
  */
class LanguageModelSpec extends SparkTestBase {
  import spark.implicits._

  // Train corpus token stream: doc A = [a b a b c], doc B = [a b].
  // Unigrams: a=3 b=3 c=1, N=7. Bigrams: (a,b)=3, (b,a)=1, (b,c)=1.
  private lazy val train = Seq(
    (1L, "a b a b c"),
    (2L, "a b"))
    .toDF("doc_id", "text")

  private lazy val lm = LanguageModel.trainBigram(train, "text")

  test("trainBigram counts unigrams, bigrams, and the token total") {
    val uni = lm.unigrams.as[(String, Long)].collect().toMap
    assert(uni === Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
    val bg = lm.bigrams.as[(String, String, Long)].collect()
      .map { case (w1, w2, c) => (w1, w2) -> c }.toMap
    assert(bg === Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    assert(lm.totals.as[Long].head() === 7L)
  }

  private def scoreMap(docs: Seq[(Long, String)]) =
    LanguageModel.scoreDocs(docs.toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("seen bigrams score c2/c1; ppl is the negated mean log10") {
    // Doc [a b a b c]: grams (a,b) (b,a) (a,b) (b,c); all hits.
    // S = 3/3, 1/3, 3/3, 1/3 → −mean log10 = (2·log10 3)/4.
    val r = scoreMap(Seq((10L, "a b a b c")))(10L)
    assert(r.getLong(1) === 4L) // n_grams
    assert(r.getLong(2) === 4L) // n_hit
    assert(r.getLong(3) === 0L) // n_backoff
    assert(r.getDouble(4) === 1.0)
    assert(math.abs(r.getDouble(5) - 2 * math.log10(3.0) / 4) < 1e-12)
  }

  test("unseen bigram with seen w2 backs off to alpha*c(w2)/N") {
    // Gram (c, c): not in the bigram table, c(c)=1 → S = 0.4·1/7.
    val r = scoreMap(Seq((11L, "c c")))(11L)
    assert(r.getLong(2) === 0L && r.getLong(3) === 1L)
    assert(math.abs(r.getDouble(5) - -math.log10(0.4 * 1.0 / 7.0)) < 1e-12)
  }

  test("OOV w2 backs off to alpha/N") {
    val r = scoreMap(Seq((12L, "a zebra")))(12L)
    assert(r.getLong(3) === 1L)
    assert(math.abs(r.getDouble(5) - -math.log10(0.4 / 7.0)) < 1e-12)
  }

  test("mixed hit/backoff doc sums both branches") {
    // [a b c]: (a,b) hit 3/3; (b,c) hit 1/3 → ppl = (0 + log10 3)/2.
    val r = scoreMap(Seq((13L, "a b c")))(13L)
    assert(r.getLong(2) === 2L && r.getLong(3) === 0L)
    assert(math.abs(r.getDouble(5) - math.log10(3.0) / 2) < 1e-12)
  }

  test("documents with fewer than two tokens score zero grams, null ppl") {
    val m = scoreMap(Seq((14L, "solo"), (15L, ""), (16L, "   ")))
    for (id <- Seq(14L, 15L, 16L)) {
      assert(m(id).getLong(1) === 0L)
      assert(m(id).getDouble(4) === 0.0)
      assert(m(id).isNullAt(5), s"doc $id ppl should be null")
    }
  }

  test("perfectly-predicted docs score 0.0, not IEEE -0.0") {
    // [a b]: gram (a,b) scores 3/3 = 1.0 → sum_log 0.0 → ppl must be +0.0.
    val r = scoreMap(Seq((18L, "a b")))(18L)
    assert(java.lang.Double.compare(r.getDouble(5), 0.0) === 0,
      s"got ${r.getDouble(5)}")
  }

  test("alpha parameter scales the backoff branch only") {
    val docs = Seq((17L, "c c")).toDF("doc_id", "text")
    val r = LanguageModel.scoreDocs(docs, "doc_id", "text", lm, alpha = 0.1)
      .collect().head
    assert(math.abs(r.getDouble(5) - -math.log10(0.1 / 7.0)) < 1e-12)
  }

  test("property: matches a sequential reference on random corpora") {
    val rng = new scala.util.Random(7)
    for (round <- 0 until 3) {
      val vocab = (0 until 8).map(i => s"w$i")
      val docs = (0L until 40L).map { id =>
        val n = rng.nextInt(12)
        (id, Seq.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" "))
      }
      val trainDocs = docs.filter(_._1 < 20L)
      // Sequential reference: counts + stupid backoff, straight loops.
      def toks(t: String): Seq[String] =
        t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
      val uni = scala.collection.mutable.Map.empty[String, Long]
      val bi = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, t) <- trainDocs; ts = toks(t)) {
        ts.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
        ts.sliding(2).filter(_.length == 2)
          .foreach(p => bi((p(0), p(1))) = bi.getOrElse((p(0), p(1)), 0L) + 1)
      }
      val nTot = uni.values.sum
      val expect = docs.map { case (id, t) =>
        val gs = toks(t).sliding(2).filter(_.length == 2).toSeq
        val logs = gs.map { p =>
          bi.get((p(0), p(1))) match {
            case Some(c2) => math.log10(c2.toDouble / uni(p(0)))
            case None => math.log10(
              0.4 * uni.getOrElse(p(1), 1L).toDouble / nTot)
          }
        }
        id -> ((gs.length.toLong, gs.count(p => bi.contains((p(0), p(1)))).toLong,
          if (gs.isEmpty) None else Some(-logs.sum / gs.length)))
      }.toMap
      val lm = LanguageModel.trainBigram(trainDocs.toDF("doc_id", "text"), "text")
      val got = LanguageModel.scoreDocs(docs.toDF("doc_id", "text"),
        "doc_id", "text", lm).collect()
      assert(got.length === 40, s"round $round")
      got.foreach { r =>
        val (en, eh, eppl) = expect(r.getLong(0))
        assert(r.getLong(1) === en, s"round $round doc ${r.getLong(0)} n_grams")
        assert(r.getLong(2) === eh, s"round $round doc ${r.getLong(0)} n_hit")
        (eppl, if (r.isNullAt(5)) None else Some(r.getDouble(5))) match {
          case (Some(e), Some(g)) =>
            assert(math.abs(e - g) < 1e-9, s"round $round doc ${r.getLong(0)}")
          case (a, b) => assert(a.isEmpty === b.isEmpty)
        }
      }
    }
  }

  test("scoring plan has no driver-side actions and one gram shuffle chain") {
    // Guard the scale shape: scoreDocs must not collect; train+score on a
    // larger synthetic corpus stays a pure join/agg plan.
    val corpus = spark.range(2000)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("tok"), (col("id") % 50).cast("string"),
          lit("tok"), ((col("id") + 7) % 50).cast("string")).as("text"))
    val out = LanguageModel.perplexityScores(corpus, "doc_id", "text", corpus)
    assert(out.count() === 2000L)
    val hits = out.agg(sum("n_hit")).as[Long].head()
    assert(hits > 0L)
    // The only nested-loop join allowed is the one-row totals broadcast;
    // raw text must never be a shuffle key.
    val plan = out.queryExecution.executedPlan.toString
    val nested = "CartesianProduct".r.findAllIn(plan).length
    assert(nested === 0, s"no cartesian product allowed:\n$plan")
    assert("Exchange hashpartitioning\\([^)]*text".r.findFirstIn(plan).isEmpty,
      s"raw text must not be shuffled:\n$plan")
  }

  test("pmiCollocations: hand-computed integerized PMI, min-count floor, ties") {
    // Corpus "x y x y z w" ×3 docs: unigrams x=6 y=6 z=3 w=3, N=18.
    // Bigrams: (x,y)=6, (y,x)=3, (y,z)=3, (z,w)=3.
    // PMI(x,y) = ln(6·18/(6·6)) = ln 3; PMI(z,w) = ln(3·18/(3·3)) = ln 6;
    // PMI(y,z) = ln(3·18/(6·3)) = ln 3; PMI(y,x) = ln 3·18/(6·6) = ln 1.5.
    val docs = Seq((1L, "x y x y z w"), (2L, "x y x y z w"), (3L, "x y x y z w"))
      .toDF("doc_id", "text")
    val got = LanguageModel.pmiCollocations(docs, "text", minCount = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def s(v: Double): Long = math.round(1e6 * math.log(v))
    assert(got.toSeq === Seq(
      ("z", "w", 3L, s(6.0)),
      ("x", "y", 6L, s(3.0)),
      ("y", "z", 3L, s(3.0)),   // tie with (x,y) on PMI — (w1,w2) order
      ("y", "x", 3L, s(1.5))))
    // minCount floor prunes before scoring.
    val floored = LanguageModel.pmiCollocations(docs, "text", minCount = 4, topK = 10)
      .collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("x", "y")))
  }

  test("kneserNeyScore: exact rational D=3/4 smoothing, hand-checked") {
    // Model (from `train`): bigrams (a,b)=3 (b,a)=1 (b,c)=1, T=3 types;
    // N1+(a.)=1, N1+(b.)=2; N1+(.a)=1, N1+(.b)=1, N1+(.c)=1; c(a)=c(b)=3.
    val score = LanguageModel.kneserNeyScore(
      Seq((10L, "a b a b c"), (11L, "c z b"), (12L, "x"))
        .toDF("doc_id", "text"), "doc_id", "text", lm)
      .orderBy("doc_id").collect()
    // Doc 10 grams: (a,b) num=9*3+3*1*1=30 den=36; (b,a) num=3+3*2*1=9
    // den=36; (a,b); (b,c) num=3+3*2*1=9 den=36.
    assert(score(0).getLong(1) === 4L && score(0).getLong(2) === 4L)
    assert(score(0).getLong(3) === 0L)
    assert(score(0).getLong(4) === 78L && score(0).getLong(5) === 144L)
    assert(math.abs(score(0).getDouble(6) -
      (2 * math.log(30.0 / 36) + 2 * math.log(9.0 / 36))) < 1e-12)
    // Doc 11: (c,z): seen history c (c1=1), c2=0, n1f(c)=0, n1r(z)=0 ->
    // floored num=1, den=12; (z,b): unseen history -> continuation
    // num=4*N1+(.b)=4, den=12.
    assert(score(1).getLong(1) === 2L && score(1).getLong(2) === 0L)
    assert(score(1).getLong(3) === 1L)
    assert(score(1).getLong(4) === 5L && score(1).getLong(5) === 24L)
    // Doc 12: single token -> no grams, zeroed counters, null logprob.
    assert(score(2).getLong(1) === 0L && score(2).isNullAt(6))
  }

  test("greedyContinuation: argmax chain, tie-break, dead-end stop") {
    // Corpus: "a b" ×3, "a c" ×3 (tie → min w2 = "b"), "b d", "d" ends
    // a chain (no successor).
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"),
      (5L, "a c"), (6L, "a c"), (7L, "b d")).toDF("doc_id", "text")
    val docs = Seq((10L, "x a"), (11L, "z d"), (12L, "q unknownword"))
      .toDF("doc_id", "text")
    val got = LanguageModel.greedyContinuation(docs, "doc_id", "text",
        corpus, steps = 4)
      .orderBy("doc_id")
      .as[(Long, String, String, Long)].collect().toSeq
    // a → b (tie b<c) → d → dead end: 2 generated.
    assert(got(0) === ((10L, "a", "b d", 2L)))
    // d: immediate dead end.
    assert(got(1) === ((11L, "d", "", 0L)))
    // unknown seed: dead end too.
    assert(got(2) === ((12L, "unknownword", "", 0L)))
    // Plan-depth cap: each step deepens one unbroken join lineage, so
    // steps is bounded — a 100-step call must fail fast, not build a
    // 100-join plan.
    val e = intercept[IllegalArgumentException] {
      LanguageModel.greedyContinuation(docs, "doc_id", "text", corpus,
        steps = 100)
    }
    assert(e.getMessage.contains("plan depth"))
  }

  test("perplexityBuckets: per-language tiers, untrained lang floors to tail") {
    // Language "en": reference slice (src0) trains on "a b a b"; six docs
    // to bucket — the two that repeat the trained bigrams must out-rank
    // the ones made of unseen tokens. Language "xx" has NO src0 rows, so
    // its docs all score the unseen floor and tier by doc_id.
    val docs = Seq(
      (1L, "a b a b", "en", "src0"),  // trained + scored, pure hits
      (2L, "a b a b", "en", "src1"),  // duplicate text → identical score
      (3L, "q r s t", "en", "src1"),  // all-unseen → worst
      (4L, "a b q r", "en", "src1"),  // mixed
      (5L, "u v w", "en", "src1"),
      (6L, "a b a", "en", "src1"),
      (7L, "m n o", "xx", "src1"),    // untrained language
      (8L, "p q r", "xx", "src1"),
      (9L, "s t", "xx", "src1")
    ).toDF("doc_id", "text", "lang", "source")
    val got = LanguageModel.perplexityBuckets(docs, "doc_id", "text", "lang",
        $"source" === "src0", nBuckets = 3)
      .orderBy("doc_id")
      .select("doc_id", "lang", "bucket", "tier")
      .as[(Long, String, Long, String)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    // en ranking: docs 1,2 tie at the top (duplicate text, id breaks the
    // tie) → head gets both (6 docs / 3 buckets = 2 each).
    assert(byId(1L)._4 === "head" && byId(2L)._4 === "head")
    assert(byId(3L)._4 === "tail", got.toString)
    // Untrained lang: deterministic tiers purely by doc_id.
    assert(Seq(7L, 8L, 9L).map(byId(_)._4) === Seq("head", "middle", "tail"))
    // Buckets are longs in [1, 3] and tier is a pure function of bucket.
    assert(got.forall(r => r._3 >= 1L && r._3 <= 3L))
    // Repartition-invariant (the determinism contract).
    val again = LanguageModel.perplexityBuckets(docs.repartition(5),
        "doc_id", "text", "lang", $"source" === "src0", nBuckets = 3)
      .orderBy("doc_id").select("doc_id", "lang", "bucket", "tier")
      .as[(Long, String, Long, String)].collect().toSeq
    assert(again === got)
  }

  test("negativeSamples: tempered-unigram draws, deterministic and ladder-replayable") {
    // 'zzz' dominates the counts 100:1 — sqrt-tempering keeps it the most
    // frequent draw, while rare terms still appear (the flattening point).
    val docs = ((1L to 50L).map(i => (i, "zzz " * 20 + s"rare$i")) ++
      Seq((99L, "alpha beta"))).toDF("doc_id", "text")
    val got = LanguageModel.negativeSamples(docs, "doc_id", "text",
        vocabSize = 30, k = 4)
      .as[(Long, Int, String)].collect()
    assert(got.length === 51 * 4)
    assert(got.forall(r => r._2 >= 1 && r._2 <= 4))
    val freq = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(freq.keySet.contains("zzz"))
    assert(freq("zzz") === freq.values.max, freq.toString)
    assert(freq.size > 1, "tempering must leave tail terms reachable")
    // Pure function of (id, slot, salt): re-run and repartition identical.
    val again = LanguageModel.negativeSamples(docs.repartition(7), "doc_id",
        "text", vocabSize = 30, k = 4)
      .as[(Long, Int, String)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq ===
      got.sortBy(r => (r._1, r._2)).toSeq)
  }
}
