package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("filterCascade: first-fail attribution tiles the corpus exactly") {
    val df = Seq(
      (1L, 10, 5),  // fails stage 1 (v < 20) — never reaches stage 2
      (2L, 30, 0),  // passes 1, fails 2 (w < 1)
      (3L, 25, 2),  // survivor
      (4L, 5, 0),   // fails stage 1 (also would fail 2 — charged to 1)
      (5L, 40, 3)). // survivor
      toDF("id", "v", "w")
    val got = Curation.filterCascade(df, "id", Seq(
        "v_min" -> (col("v") >= 20),
        "w_min" -> (col("w") >= 1)))
      .orderBy("stage_idx")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "v_min", 5L, 2L, 3L),
      (2L, "w_min", 3L, 1L, 2L)))
    // Tiling invariant: survivors + Σ dropped = total.
    assert(got.map(_._4).sum + got.last._5 === 5L)
  }

  test("chatAssembly: turns order by (ts, tie); maxTurns caps, n_events audits") {
    val ev = Seq(
      (7L, 30L, 3L, "assistant", "hi there"),
      (7L, 10L, 1L, "user", "hello"),
      (7L, 30L, 2L, "system", "ctx"), // same ts as turn 3 → tie decides
      (9L, 5L, 1L, "user", "a"),
      (9L, 6L, 2L, "assistant", "b"),
      (9L, 7L, 3L, "user", "c"))
      .toDF("conv", "ts", "eid", "role", "txt")
    val got = Curation.chatAssembly(ev, "conv", "ts", "eid", "role", "txt")
      .orderBy("conv").as[(Long, Long, Long, String)].collect().toSeq
    assert(got(0) === ((7L, 3L, 3L,
      "user: hello\nsystem: ctx\nassistant: hi there")))
    assert(got(1) === ((9L, 3L, 3L, "user: a\nassistant: b\nuser: c")))
    // Cap keeps the EARLIEST turns; n_events still reports the truth.
    val capped = Curation.chatAssembly(ev.repartition(5), "conv", "ts",
        "eid", "role", "txt", maxTurns = 2)
      .orderBy("conv").as[(Long, Long, Long, String)].collect().toSeq
    assert(capped(0) === ((7L, 3L, 2L, "user: hello\nsystem: ctx")))
    assert(capped(1)._3 === 2L)
  }

  test("augmentTokens: deterministic mask/drop, rates in range, accounting exact") {
    val docs = (1L to 60L).map(i =>
      (i, (1 to 50).map(j => s"w$j").mkString(" "))).toDF("doc_id", "text")
    val got = Curation.augmentTokens(docs, "doc_id", "text",
      pMask = 0.1, pDrop = 0.1, salt = "aug")
    val rows = got.orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // Accounting: output token count = n_tokens − n_dropped; every mask
    // shows up literally.
    rows.foreach { case (_, n, m, d, text) =>
      assert(n === 50L)
      val outToks = if (text.isEmpty) Array.empty[String] else text.split(" ")
      assert(outToks.length === (n - d).toInt)
      assert(outToks.count(_ == "<mask>") === m.toInt)
    }
    // 3000 draws at 10%/10%: both corruption kinds land well inside
    // [5%, 15%] in aggregate.
    val totM = rows.map(_._3).sum.toDouble / 3000
    val totD = rows.map(_._4).sum.toDouble / 3000
    assert(totM > 0.05 && totM < 0.15, s"mask rate $totM")
    assert(totD > 0.05 && totD < 0.15, s"drop rate $totD")
    // Pure function of (id, pos, salt): repartitioned re-run identical;
    // a different salt corrupts differently.
    val again = Curation.augmentTokens(docs.repartition(7), "doc_id",
        "text", pMask = 0.1, pDrop = 0.1, salt = "aug")
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(again === rows)
    val other = Curation.augmentTokens(docs, "doc_id", "text",
        pMask = 0.1, pDrop = 0.1, salt = "epoch2")
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(other.map(_._5) !== rows.map(_._5))
  }

  test("doremiWeights: hand-computed Hedge rounds, ordering, smoothing floor") {
    // Two domains, mean excess +100 and −100 → factors 2^20 ± 20000.
    val df = Seq(("a", 100L), ("a", 100L), ("b", -100L))
      .toDF("domain", "excess")
    val got = Curation.doremiWeights(df, "domain", "excess",
        rounds = 2, etaNum = 200L, etaDen = 1L, smoothingFp = 1049L)
      .orderBy("domain")
      .as[(String, Long, Long, Long)].collect().toSeq
    // Independent replay of the integer algebra.
    val S = 1L << 20
    val fac = Map("a" -> (S + 20000L), "b" -> (S - 20000L))
    var al = Map("a" -> S, "b" -> S)
    (1 to 2).foreach { _ =>
      val m = al.map { case (k, v) => k -> v * fac(k) / S }
      val s = m.values.sum
      al = m.map { case (k, v) =>
        k -> (((S - 1049L) * (v * S * 2 / s)) + 1049L * S) / S
      }
    }
    assert(got === Seq(("a", 2L, 100L, al("a")), ("b", 1L, -100L, al("b"))))
    // The high-excess domain ends strictly heavier; smoothing keeps every
    // weight at least c · uniform.
    assert(al("a") > al("b") && al("b") > 1049L)
    // Zero excess everywhere is a fixpoint at uniform.
    val unif = Curation.doremiWeights(
        Seq(("x", 0L), ("y", 0L)).toDF("domain", "excess"),
        "domain", "excess", rounds = 3)
      .select("weight").as[Long].collect().toSeq
    assert(unif === Seq(S, S))
  }

  test("weightedSample matches an independent replication of the A-ES keys") {
    // Replicate key = u^(1/w) off-Spark: salted md5 → first 13 hex digits →
    // /2^52 → pow. The operator's top-k must equal this exactly.
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id-graft-ws".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      math.pow(java.lang.Long.parseLong(hex, 16) / 4503599627370496.0, 1.0 / w)
    }
    // Weight 9 for ids 0..49, weight 1 for ids 50..99.
    val df = (0L until 100L).map(i => (i, if (i < 50) 9.0 else 1.0))
      .toDF("id", "w")
    val got = Curation.weightedSample(df, "id", col("w"), k = 20)
      .select("id").as[Long].collect().toSet
    val expect = (0L until 100L)
      .sortBy(i => (-key(i, if (i < 50) 9.0 else 1.0), i)).take(20).toSet
    assert(got === expect)
    // Determinism across runs and partitionings.
    val again = Curation.weightedSample(df.repartition(7), "id", col("w"), k = 20)
      .select("id").as[Long].collect().toSet
    assert(again === got)
    // The stratified form equals an independent per-group replication and
    // its plan is the k-bounded aggregate, not a window.
    val grouped = (0L until 100L).map(i => (i, s"g${i % 3}", 1.0 + (i % 5)))
      .toDF("id", "grp", "w")
    val perGroup = Curation.weightedSamplePerGroup(grouped, "grp", "id",
      col("w"), k = 5)
    val gotG = perGroup.as[(String, Long)].collect().toSet
    val expectG = (0L until 100L).groupBy(i => s"g${i % 3}").toSeq.flatMap {
      case (g, ids) =>
        ids.sortBy(i => (-key(i, 1.0 + (i % 5)), i)).take(5).map(g -> _)
    }.toSet
    assert(gotG === expectG)
    val plan = perGroup.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"must use the k-bounded aggregate:\n$plan")
    assert(plan.contains("topk_by_score"), plan)
    // Weighted bias: the weight-9 class dominates the sample.
    assert(got.count(_ < 50L) > 12, s"high-weight ids in sample: ${got.count(_ < 50L)}")
  }

  test("budgetSample fills each stratum to the token budget deterministically") {
    def key(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id-graft-ws".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      java.lang.Long.parseLong(hex, 16) / 4503599627370496.0
    }
    // Each doc is 10 tokens; budget 25 → per group: 2 full docs kept, the
    // third starts at offset 20 < 25 → kept (straddle rule), 4th+ dropped.
    val docs = (0L until 12L)
      .map(i => (i, s"g${i % 2}", Seq.fill(10)(s"t$i").mkString(" ")))
      .toDF("id", "grp", "text")
    val got = Curation.budgetSample(docs, "grp", "id", "text",
        tokenBudget = 25L)
      .collect()
      .map(r => r.getLong(1) -> ((r.getString(0), r.getLong(2), r.getLong(3),
        r.getInt(4)))).toMap
    assert(got.size === 12)
    for (g <- Seq("g0", "g1")) {
      val members = got.filter(_._2._1 == g).toSeq
      val keptIds = members.filter(_._2._4 == 1).map(_._1)
      assert(keptIds.size === 3, s"$g: $members")
      // Kept = the 3 highest A-ES keys of the group.
      val expect = members.map(_._1).sortBy(i => (-key(i), i)).take(3)
      assert(keptIds.toSet === expect.toSet)
      // Offsets are multiples of the uniform doc length.
      assert(members.map(_._2._3).sorted === (0 until 6).map(_ * 10L))
    }
    // Determinism across partitionings.
    val again = Curation.budgetSample(docs.repartition(7), "grp", "id",
        "text", tokenBudget = 25L)
      .collect().map(r => r.getLong(1) -> r.getInt(4)).toMap
    assert(again === got.map { case (id, v) => id -> v._4 })
  }

  test("corpusDiff classifies added/removed/modified/unchanged by content hash") {
    val v1 = Seq((1L, "same"), (2L, "will change"), (3L, "gone"))
      .toDF("id", "text")
    val v2 = Seq((1L, "same"), (2L, "changed"), (4L, "fresh"))
      .toDF("id", "text")
    val got = Curation.corpusDiff(v1, v2, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "modified",
      3L -> "removed", 4L -> "added"))
  }

  test("stratifiedSample: exact quota per stratum, draw-ordered, window-free") {
    val df = (0L until 200L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val got = Curation.stratifiedSample(df, "id", "g", nPerStratum = 7)
      .as[(String, Long, Int)].collect()
    val byG = got.groupBy(_._1)
    assert(byG.keySet === Set("g0", "g1", "g2"))
    assert(byG.values.forall(_.length === 7))
    // Selection replays the independent md5-order definition.
    def draw(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id-graft".getBytes("UTF-8"))
      d.take(6).map(b => f"${b & 0xFF}%02x").mkString
    }
    byG.foreach { case (g, rows) =>
      val want = (0L until 200L).filter(i => s"g${i % 3}" == g)
        .sortBy(i => (draw(i), i)).take(7)
      assert(rows.sortBy(_._3).map(_._2).toSeq === want,
        s"stratum $g selection mismatch")
    }
    // A stratum smaller than the quota returns whole, ranked.
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val t = Curation.stratifiedSample(tiny, "id", "g", nPerStratum = 5)
      .as[(String, Long, Int)].collect()
    assert(t.count(_._1 == "a") === 2 && t.count(_._1 == "b") === 1)
  }

  test("qualityPacedMix: histogram tiers, tie coherence, ramped admission") {
    // Scores are the id scaled to [0,1): ids 0..99 → q = id*100, so tier
    // boundaries land exactly every 10 ids. Ids 200..204 share one score
    // (tie block) and must share one tier.
    val base = (0L until 100L).map(i => (i, i / 100.0)) ++
      (200L to 204L).map(i => (i, 0.555))
    val df = base.toDF("id", "s")
    val got = Curation.qualityPacedMix(df, "id", col("s"), buckets = 5,
        qScale = 1000)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))).toMap
    // 105 rows, 5 tiers → boundary at every ceil(i*105/5)=21i-th row.
    assert(got.size === 105)
    assert(got(0L)._2 === 0)
    assert(got(99L)._2 === 4)
    // The tie block sits wholly in one tier.
    assert((200L to 204L).map(got(_)._2).toSet.size === 1)
    // Tier is monotone in score.
    assert(got(10L)._2 <= got(50L)._2 && got(50L)._2 <= got(90L)._2)
    // Admission: tier 4 keeps everything (rate 1.0 → 'g' threshold).
    assert((95L to 99L).forall(got(_)._4 === 1))
    // keep bit replays draw < threshold exactly.
    val rates = (0 until 5).map(b => Curation.hexThreshold((b + 1) / 5.0))
    got.foreach { case (_, (_, b, draw, keep)) =>
      assert(keep === (if (draw < rates(b)) 1 else 0))
    }
    // Deterministic under repartition (histogram + literals, no rank).
    val re = Curation.qualityPacedMix(df.repartition(13), "id", col("s"),
        buckets = 5, qScale = 1000)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))).toMap
    assert(re === got)
  }

  test("corpusProfile: one-pass integer-exact dataset card") {
    val docs = Seq(
      (1L, "a b c", "s1", "en"),
      (2L, "a b c", "s1", "en"),     // exact dup of 1
      (3L, "d e", "s1", "de"),
      (4L, "x", "s2", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val m = Curation.corpusProfile(docs, "text", "source", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("s1").getLong(1) === 3L) // n_docs
    assert(m("s1").getLong(2) === 1L) // n_dup_docs
    assert(m("s1").getLong(3) === 8L) // n_tokens
    assert(m("s1").getLong(5) === 2L) // n_langs
    assert(m("s2").getLong(2) === 0L)
    // Two null-text docs are NOT duplicates of each other.
    val withNulls = docs.union(Seq(
      (5L, null: String, "s3", "en"),
      (6L, null: String, "s3", "en")).toDF("doc_id", "text", "source", "lang"))
    val s3 = Curation.corpusProfile(withNulls, "text", "source", "lang")
      .collect().map(r => r.getString(0) -> r).toMap.apply("s3")
    assert(s3.getLong(1) === 2L)
    assert(s3.getLong(2) === 0L)
  }

  test("decontaminate counts shared distinct k-grams and applies the floor") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about spark partitions"),
      (3L, "the quick brown fox appears here too")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high")).toDF("doc_id", "text")

    val rows = Curation.decontaminate(train, "doc_id", "text",
        bench, "doc_id", "text", k = 3, minShared = 2)
      .select("doc_id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet

    // doc 1 shares "the quick brown", "quick brown fox", "brown fox jumps";
    // doc 3 shares the first two; doc 2 shares none.
    assert(rows === Set((1L, 100L, 3L), (3L, 100L, 2L)))

    // Raising the floor drops doc 3.
    val strict = Curation.decontaminate(train, "doc_id", "text",
        bench, "doc_id", "text", k = 3, minShared = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(strict === Set(1L))
  }

  test("bloomDecontaminate: no false negatives vs the exact join; counts line up") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about spark partitions"),
      (3L, "the quick brown fox appears here too"),
      (4L, "another clean document with nothing shared at all")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val bd = Curation.bloomDecontaminate(train, "doc_id", "text", bench, "text", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    // Doc 1: 7 grams, 3 hit the bench sketch; doc 3: the 2 shared grams.
    // One-sided error: every exactly-contaminated doc MUST be flagged.
    assert(bd(1L)._2 >= 3L && bd(1L)._3 === 0)
    assert(bd(3L)._2 >= 2L && bd(3L)._3 === 0)
    // n_grams is the distinct-shingle count (doc 1 has 9 tokens → 7 grams).
    assert(bd(1L)._1 === 7L)
    // At fpp 1e-4 over a handful of grams the clean docs stay clean
    // (6 tokens → 4 distinct trigram shingles).
    assert(bd(2L) === ((4L, 0L, 1)))
    assert(bd(4L)._3 === 1)
    // Exact-flag parity on a larger random corpus: bloom ⊇ exact, always.
    val rnd = new scala.util.Random(11)
    val words = (0 until 40).map(i => s"w$i")
    val big = (0L until 120L).map { id =>
      (id, Seq.fill(12)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val bigBench = big.where($"doc_id" >= 110)
    val bigTrain = big.where($"doc_id" < 110)
    val flaggedBloom = Curation.bloomDecontaminate(
        bigTrain, "doc_id", "text", bigBench, "text", k = 3)
      .where($"clean" === 0).select("doc_id").as[Long].collect().toSet
    val flaggedExact = Curation.decontaminate(bigTrain, "doc_id", "text",
        bigBench, "doc_id", "text", k = 3, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(flaggedExact.subsetOf(flaggedBloom),
      s"false negatives: ${flaggedExact -- flaggedBloom}")
    // An EMPTY benchmark (no grams at all) flags nothing — and must not
    // NPE on the null aggregate result (the empty-edge-set CC lesson).
    val emptyBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noFlags = Curation.bloomDecontaminate(
      train, "doc_id", "text", emptyBench, "text", k = 3)
      .collect()
    assert(noFlags.length === 4 &&
      noFlags.forall(r => r.getLong(2) === 0L && r.getInt(3) === 1))
    val nullBench = Seq((9L, null: String)).toDF("doc_id", "text")
    assert(Curation.bloomDecontaminate(
        train, "doc_id", "text", nullBench, "text", k = 3)
      .collect().forall(_.getInt(3) === 1))
    // Null TRAIN text: zero grams, clean — no null columns in the output.
    val nt = Curation.bloomDecontaminate(
        train.unionByName(Seq((50L, null: String)).toDF("doc_id", "text")),
        "doc_id", "text", bench, "text", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(nt(50L) === ((0L, 0L, 1)))
  }

  test("c4Filter line retention and document drop rules") {
    val docs = Seq(
      // 3 lines: kept (terminal . and 5 words), dropped (no terminal),
      // dropped (terminal but short).
      (1L, "this line has five words.\nno terminal punctuation here at all\nshort line."),
      (2L, "lorem ipsum dolor sit amet sentence one. two more words follow here. and a third sentence closes."),
      (3L, "function f() { return 1; } this has a brace. and it has sentences. three of them even."),
      (4L, "a clean document with five words. another proper sentence sits here. and one final closing sentence.")
    ).toDF("doc_id", "text")

    val got = Curation.c4Filter(docs, "doc_id", "text",
        badWords = Seq("badword1"), minSentences = 3, minLineWords = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept_lines", "has_lorem", "has_brace", "keep")
      .as[(Long, Long, Long, Int, Int, Int)].collect().toSeq

    assert(got(0) === ((1L, 3L, 1L, 0, 0, 0)))  // only 2 sentences → dropped
    assert(got(1) === ((2L, 1L, 1L, 1, 0, 0)))  // lorem ipsum → dropped
    assert(got(2) === ((3L, 1L, 1L, 0, 1, 0)))  // brace → dropped
    assert(got(3) === ((4L, 1L, 1L, 0, 0, 1)))  // clean → kept
  }

  test("c4Filter bad-word rule is token-exact, not substring") {
    val docs = Seq(
      (1L, "this mentions badword1 once. second sentence here now. third sentence closes it out."),
      (2L, "notbadword1ish is a different token. second sentence here now. third sentence closes it out.")
    ).toDF("doc_id", "text")
    val got = Curation.c4Filter(docs, "doc_id", "text",
        badWords = Seq("badword1"), minSentences = 3, minLineWords = 5)
      .orderBy("doc_id").select("has_badword", "keep")
      .as[(Int, Int)].collect().toSeq
    assert(got === Seq((1, 0), (0, 1)))
  }

  test("chunkTokens window/stride layout and edge cases") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"),  // 7 tokens
      (2L, "a b c"),                 // shorter than one chunk
      (3L, "")                       // empty → no chunks
    ).toDF("doc_id", "text")

    val got = Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 4, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect().toSeq

    assert(got === Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t2 t3 t4 t5"),
      (1L, 2L, 3L, "t4 t5 t6"),     // final short chunk
      (2L, 0L, 3L, "a b c")))

    // Every token position is covered by at least one chunk; with
    // stride < chunkSize interior positions are covered by two.
    val cover = Curation.chunkTokens(docs.where($"doc_id" === 1L), "doc_id", "text",
        chunkSize = 4, stride = 2)
      .select(explode(split($"chunk_text", " ")).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    assert(cover.keySet === Set("t0", "t1", "t2", "t3", "t4", "t5", "t6"))
    assert(cover("t2") === 2L && cover("t4") === 2L)
  }

  test("packStream bins, offsets, and straddle detection per shard") {
    // One shard, one sub-shard (ids all ≡ 0 mod 1): token counts 3,4,5 with
    // budget 8 → offsets 0,3,7; doc 30 (start 7, end 11) straddles bin 0→1.
    val docs = Seq(
      (10L, "s", "a b c"),
      (20L, "s", "a b c d"),
      (30L, "s", "a b c d e")).toDF("doc_id", "source", "text")

    val got = Curation.packStream(docs, "doc_id", "text", "source",
        budget = 8, subShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_off", "bin", "straddles")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq

    assert(got === Seq(
      (10L, 3L, 0L, 0L, 0),   // tokens 0..2, all in bin 0
      (20L, 4L, 3L, 0L, 0),   // tokens 3..6, still bin 0
      (30L, 5L, 7L, 0L, 1)))  // tokens 7..11 cross the 8-token boundary
  }

  test("hexThreshold endpoints and midpoints") {
    assert(Curation.hexThreshold(0.0) === "00000000")
    assert(Curation.hexThreshold(0.25) === "40000000")
    assert(Curation.hexThreshold(0.5) === "80000000")
    assert(Curation.hexThreshold(1.0) === "g")
  }

  test("deterministicSample is reproducible, salt-sensitive, and ~frac-sized") {
    val ids = (0L until 2000L).toDF("id")
    val a = Curation.deterministicSample(ids, "id", 0.25, "s1")
      .as[Long].collect().toSet
    val b = Curation.deterministicSample(ids, "id", 0.25, "s1")
      .as[Long].collect().toSet
    val c = Curation.deterministicSample(ids, "id", 0.25, "s2")
      .as[Long].collect().toSet
    assert(a === b)                                  // pure function of (id, salt)
    assert(a !== c)                                  // salt changes the draw
    assert(math.abs(a.size - 500) < 100)             // ~Binomial(2000, .25)
    // Nesting: a smaller fraction with the same salt is a SUBSET (thresholds
    // are cumulative on the same draw).
    val tight = Curation.deterministicSample(ids, "id", 0.1, "s1")
      .as[Long].collect().toSet
    assert(tight.subsetOf(a))
  }

  test("splitCorpus covers every row exactly once with stable assignment") {
    val ids = (0L until 1000L).toDF("id")
    val split = Curation.splitCorpus(ids, "id",
      Seq("test" -> 0.1, "valid" -> 0.1, "train" -> 0.8))
    val byLabel = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.values.sum === 1000L)
    assert(byLabel("train") > 700L && byLabel("test") < 200L && byLabel("valid") < 200L)
    // Growing the corpus never reassigns existing rows.
    val bigger = Curation.splitCorpus((0L until 2000L).toDF("id"), "id",
      Seq("test" -> 0.1, "valid" -> 0.1, "train" -> 0.8))
      .where($"id" < 1000L)
    val orig = split.select("id", "split").as[(Long, String)].collect().toSet
    val again = bigger.select("id", "split").as[(Long, String)].collect().toSet
    assert(orig === again)
  }

  test("mixCorpus applies per-shard keep probabilities") {
    val docs = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val mixed = Curation.mixCorpus(docs, "id", "source",
      Map("src0" -> 0.0, "src1" -> 0.5), default = 1.0)
    val kept = mixed.where($"keep" === 1).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(!kept.contains("src0"))                   // weight 0 → all dropped
    assert(math.abs(kept("src1") - 500L) < 100L)     // ~half kept
    assert(kept("src2") === 1000L)                   // default 1.0 → all kept
  }

  test("temperatureMix matches an independent replay of its policy") {
    val docs = (0L until 400L)
      .map(i => (i, if (i < 320) "big" else "small")).toDF("id", "dom")
    val out = Curation.temperatureMix(docs, "id", "dom", budget = 100,
        temperature = 2.0)
      .select("id", "shard", "draw", "keep")
      .as[(Long, String, String, Int)].collect()
    // Independent reimplementation: integerized sqrt weights, exact int64
    // normalizer, md5 draws, hexThreshold verdicts.
    val counts = Map("big" -> 320L, "small" -> 80L)
    val w = counts.map { case (s, c) =>
      s -> math.floor(math.sqrt(c.toDouble) * 65536).toLong }
    val sw = w.values.sum
    val rate = counts.map { case (s, c) =>
      s -> math.min(1.0, (100L * w(s)).toDouble / (sw * c).toDouble) }
    val thr = rate.map { case (s, r) => s -> Curation.hexThreshold(r) }
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { case (id, shard, draw, keep) =>
      val hex = md.digest(s"$id-graft".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      assert(draw === hex)
      assert(keep === (if (hex < thr(shard)) 1 else 0), s"id=$id")
    }
    // T=2 flattening: the small domain's keep rate is 2x the big one's
    // (sqrt(320):sqrt(80) picks over 4:1 sizes), within integerization.
    assert(math.abs(rate("small") / rate("big") - 2.0) < 1e-3)
    // T=1 degenerates to a uniform keep probability across domains.
    val r1 = Curation.temperatureMix(docs, "id", "dom", budget = 100,
      temperature = 1.0).select("shard", "draw").distinct()
    assert(r1.count() > 0)
  }

  test("unimaxMix: epoch-capped water-filling allocation and partial admission") {
    // Token masses: a = 10, b = 20, c = 100 (5-token docs). Budget 60,
    // maxEpochs 2 → caps 20/40/200 ascending (a, b, c). Hand replay:
    //   a: min(20, 60/3=20) = 20 → 2 FULL epochs, no partial
    //   b: min(40, 40/2=20) = 20 → 1 full epoch, rpart 0
    //   c: min(200, 20/1)  = 20 → 0 full, partial pass of 20 tokens = 4 docs
    def mk(lang: String, n: Int, base: Int) =
      (0 until n).map(i => ((base + i).toLong, lang, "t1 t2 t3 t4 t5"))
    val docs = (mk("a", 2, 0) ++ mk("b", 4, 100) ++ mk("c", 20, 200))
      .toDF("id", "lang", "text")
    val out = Curation.unimaxMix(docs, "id", "lang", "text",
        tokenBudget = 60L, maxEpochs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4),
        r.getInt(5)))
    val byLang = out.groupBy(_._2)
    assert(byLang("a").forall(r => r._3 === 20L && r._4 === 2L && r._5 === 0))
    assert(byLang("b").forall(r => r._3 === 20L && r._4 === 1L && r._5 === 0))
    assert(byLang("c").forall(r => r._3 === 20L && r._4 === 0L))
    assert(byLang("c").count(_._5 === 1) === 4)
    // Budget conservation: allocated quota never exceeds the budget.
    assert(out.map(r => (r._2, r._3)).distinct.map(_._2).sum <= 60L)
  }

  test("temperatureMix casts non-string shards and rejects null shards") {
    // Int shard column: compared as strings throughout, so the cast must
    // happen up front — the rate table and threshold CASE then agree.
    val intShards = (0L until 100L).map(i => (i, (i % 3).toInt)).toDF("id", "dom")
    val out = Curation.temperatureMix(intShards, "id", "dom", budget = 30)
      .select("shard").distinct().as[String].collect().toSet
    assert(out === Set("0", "1", "2"))
    // A null shard has no defined sampling rate: reject loudly instead of
    // letting it fall through every threshold branch.
    val withNull = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "dom")
    val ex = intercept[IllegalArgumentException] {
      Curation.temperatureMix(withNull, "id", "dom", budget = 2)
    }
    assert(ex.getMessage.contains("null"))
  }

  test("qualityPacedMix clamps out-of-range scores and drops null scores") {
    // Scores outside [0, 1] would make the driver-collected histogram
    // unbounded; they clamp to the edge tiers instead. Null scores have
    // no tier and are dropped.
    val docs = Seq(
      (1L, Some(-3.7)), (2L, Some(0.2)), (3L, Some(0.8)),
      (4L, Some(99.0)), (5L, None), (6L, Some(0.5)))
      .toDF("id", "score")
    val out = Curation.qualityPacedMix(docs, "id", col("score"), buckets = 2)
      .select("id", "q").as[(Long, Int)].collect().toMap
    assert(!out.contains(5L))
    assert(out(1L) === 0)       // clamped to 0.0
    assert(out(4L) === 10000)   // clamped to 1.0 * qScale
    assert(out(2L) === 2000 && out(3L) === 8000 && out(6L) === 5000)
  }

  test("epochShuffle: deterministic bucketed permutation, epochs independent") {
    val docs = (0L until 500L).toDF("id")
    val e1 = Curation.epochShuffle(docs, "id", epoch = 1)
      .select("id", "draw", "bucket", "pos")
      .as[(Long, String, Int, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    e1.foreach { case (id, draw, bucket, _) =>
      val hex = md.digest(s"$id-graft-e1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      assert(draw === hex)
      assert(bucket === Integer.parseInt(hex.substring(0, 2), 16))
    }
    // Within each bucket, pos is 1..n in draw order — a valid permutation.
    e1.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      assert(sorted.map(_._4).toSeq === (1L to rows.length).toSeq)
    }
    // A different epoch reshuffles (some doc changes bucket).
    val e2 = Curation.epochShuffle(docs, "id", epoch = 2)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(e1.exists { case (id, _, b, _) => e2(id) != b })
  }

  test("decontaminate plan broadcasts the bench side (no train-side shuffle of shingles)") {
    val train = (0L until 500L).map(i => (i, s"tok$i a b c d e f g")).toDF("doc_id", "text")
    val bench = Seq((1000L, "a b c d e")).toDF("doc_id", "text")
    val plan = Curation.decontaminate(train, "doc_id", "text",
        bench, "doc_id", "text", k = 3, minShared = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"bench side must broadcast:\n$plan")
    // The only shuffle is the final count aggregation — the train-side
    // shingle explode must meet the broadcast map-side.
    val exchanges = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges <= 2, s"expected ≤2 hash exchanges (partial+final agg):\n$plan")
  }

  test("packStream plan has exactly one shuffle (the per-shard window)") {
    val docs = (0L until 200L).map(i => (i, s"src${i % 4}", "a b c"))
      .toDF("doc_id", "source", "text")
    val plan = Curation.packStream(docs, "doc_id", "text", "source",
        budget = 64, subShards = 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly 1 exchange:\n$plan")
    // And the window key includes the sub-shard, not just the shard.
    assert(plan.contains("sub_shard"), s"window must partition by sub_shard:\n$plan")
  }

  test("packStream shards are independent streams") {
    val docs = Seq(
      (1L, "x", "a b"), (3L, "x", "c d"),
      (2L, "y", "e f"), (4L, "y", "g h")).toDF("doc_id", "source", "text")
    val got = Curation.packStream(docs, "doc_id", "text", "source",
        budget = 3, subShards = 1)
      .orderBy("source", "doc_id")
      .select("source", "doc_id", "start_off")
      .as[(String, Long, Long)].collect().toSeq
    // Each shard's offsets restart at 0.
    assert(got === Seq(("x", 1L, 0L), ("x", 3L, 2L), ("y", 2L, 0L), ("y", 4L, 2L)))
  }

  test("dsirScore ranks target-like documents above off-domain ones") {
    // Target speaks "physics"; raw doc 1 mimics it, doc 2 is off-domain,
    // doc 3 mixes. DSIR must order 1 > 3 > 2. Repetition amplifies the
    // gram mass so the smoothed ratios separate cleanly.
    val target = Seq(
      (100L, "quantum field theory energy momentum"),
      (101L, "energy momentum quantum field lagrangian"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "quantum field energy momentum quantum field"),
      (2L, "recipe butter sugar flour oven recipe butter"),
      (3L, "quantum recipe energy butter field sugar"))
      .toDF("doc_id", "text")
    val got = Curation.dsirScore(raw, target, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    // tokens + bigrams: 6+5 for docs 1 and 3, 7+6 for doc 2.
    assert(got(1L)._1 === 11L && got(2L)._1 === 13L && got(3L)._1 === 11L,
      got.toString)
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2, got.toString)
    // Deterministic integer policy: identical across runs.
    val again = Curation.dsirScore(raw, target, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === again)
    // Gramless raw docs survive with zero score.
    val withEmpty = raw.union(Seq((9L, "")).toDF("doc_id", "text"))
    val z = Curation.dsirScore(withEmpty, target, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(z(9L) === ((0L, 0L)))
  }

  test("noveltyScore: exact copies score 0, fresh text 1, mixtures between") {
    val ref = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("rid", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // exact copy: novelty 0
      (2L, "totally fresh words never seen anywhere"), // novelty 1
      (3L, "alpha beta gamma nine ten eleven twelve")) // head known
      .toDF("doc_id", "text")
    val m = Curation.noveltyScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m(1L)._3 === 0.0, m.toString)
    assert(m(2L)._3 === 1.0, m.toString)
    // Doc 3: 5 shingles, exactly one ('alpha beta gamma') in the ref.
    assert(m(3L) === ((5L, 1L, 0.8)), m.toString)
  }

  test("leakageFreeSplit co-locates duplicate groups; splitLeakage audits") {
    // 40 dup pairs (i, i+1000) plus unique docs: the per-document split
    // must leak SOME pair across splits, the representative split none.
    val docs = (0L until 200L).map(i => (i, s"content number ${i % 40}"))
      .toDF("doc_id", "text")
    val fr = Seq("test" -> 0.25, "train" -> 0.75)
    val leak = Curation.splitLeakage(docs, "doc_id", "text", fr)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(leak.keys.exists { case (a, b) => a != b },
      s"hash split should scatter some dup group: $leak")
    // The leak-free split: every doc gets its group representative's
    // split, so re-auditing with the SAME pair logic is diagonal-only.
    val lf = Curation.leakageFreeSplit(docs, "doc_id", "text", fr)
    val byDoc = lf.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byDoc.size === 200)
    // Same content ⇒ same representative ⇒ same split.
    (0L until 200L).groupBy(_ % 40).values.foreach { g =>
      val splits = g.map(byDoc(_)).toSet
      assert(splits.size === 1, s"group split apart: $g -> $splits")
    }
    // Representative is the group minimum.
    assert(byDoc(47L)._1 === 7L && byDoc(7L)._1 === 7L)
  }

  test("linearProbe separates classes with deterministic integer training") {
    // Two vocabularies; after 2 GD iterations every positive doc must
    // outscore every negative doc (margin on TRAINING data — the probe
    // contract), bit-identically across runs.
    val docs = Seq(
      (1L, "good clean prose with structure and meaning here", true),
      (2L, "good structure meaning clean prose and more here", true),
      (3L, "spam spam buy now click here spam now buy", false),
      (4L, "click buy spam now now spam click buy spam", false))
      .toDF("doc_id", "text", "is_good")
    val got = Curation.linearProbe(docs, "doc_id", "text", "is_good")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 === 1L && got(3L)._1 === -1L)
    val posMin = Seq(got(1L)._2, got(2L)._2).min
    val negMax = Seq(got(3L)._2, got(4L)._2).max
    assert(posMin > negMax, got.toString)
    assert(posMin > 0 && negMax < 0, got.toString)
    val again = Curation.linearProbe(docs, "doc_id", "text", "is_good")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === again)
  }

  test("shardPlan: serpentine ranks, tie order, perfect balance on 16/4") {
    // Doc i has 17−i tokens (i = 1..16): ranks are 0..15 in doc order, and
    // serpentine dealing onto 4 shards balances totals exactly (34 each).
    val docs = (1 to 16).map(i => (i.toLong, Seq.fill(17 - i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Curation.shardPlan(docs, "doc_id", "text", nShards = 4)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq === (0L to 15L))
    val expShard = Seq(0, 1, 2, 3, 3, 2, 1, 0, 0, 1, 2, 3, 3, 2, 1, 0)
    assert(got.map(_._4).toSeq === expShard)
    val totals = got.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    assert(totals.values.toSet === Set(34L))
    // ties: equal counts rank by ascending id
    val tied = Seq((5L, "a b"), (3L, "c d"), (9L, "e f"), (1L, "g")).toDF("doc_id", "text")
    val r2 = Curation.shardPlan(tied, "doc_id", "text", nShards = 2)
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r._3).toMap
    assert(r2 === Map(3L -> 0L, 5L -> 1L, 9L -> 2L, 1L -> 3L))
  }

  test("lengthBucketPlan: ceilings, tail slack, oversize routing") {
    // width 4, batch 8; lengths 3, 4 → ceiling 4 (capacity 2, one batch,
    // waste (8−7)/8); 5 → ceiling 8 (capacity 1, waste 3/8); 9 → ceiling 12
    // > batch → oversize, zeroed plan.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b c d e"),
      (4L, "a b c d e f g h i")).toDF("doc_id", "text")
    val got = Curation.lengthBucketPlan(docs, "doc_id", "text",
        bucketWidth = 4, batchTokens = 8)
      .as[(Long, Long, Long, Long, Long, Int, Long)].collect().toSeq
    assert(got === Seq(
      (4L, 2L, 7L, 2L, 1L, 0, 125000L),
      (8L, 1L, 5L, 1L, 1L, 0, 375000L),
      (12L, 1L, 9L, 0L, 0L, 1, 0L)))
  }

  test("kAnonymityProfile: hand census, singleton and below-k accounting") {
    // groups: (a,x)->3 rows, (a,y)->2, (b,x)->1  at k=3:
    //  below-k rows = 2 + 1 = 3, below-k groups = 2, singletons = 1,
    //  risk = floor(3e6 / 6) = 500000.
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
      ("b", "x")).toDF("u", "v")
    val got = Curation.kAnonymityProfile(df, Seq(col("u"), col("v")), k = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((6L, 3L, 1L, 3L, 2L, 1L, 500000L)))
    // fully k-anonymous input: zero exposure, risk 0 (not null).
    val ok = Curation.kAnonymityProfile(
      Seq("a", "a", "a", "b", "b", "b").toDF("u"), Seq(col("u")), k = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(ok === ((6L, 2L, 3L, 0L, 0L, 0L, 0L)))
  }

  test("lDiversityProfile: distinct-sensitive census, below-l accounting") {
    // quasi groups (by u): a -> sensitive {x, y, z} (3 distinct, 4 rows),
    // b -> {x, x} (1 distinct, 2 rows), c -> {x, y} (2 distinct, 2 rows).
    // At l = 3: below-l groups = {b, c} = 2, rows = 4,
    // risk = floor(4e6 / 8) = 500000; min distinct = 1.
    val df = Seq(("a", "x"), ("a", "y"), ("a", "z"), ("a", "x"),
      ("b", "x"), ("b", "x"), ("c", "x"), ("c", "y")).toDF("u", "s")
    val got = Curation.lDiversityProfile(df, Seq(col("u")), col("s"), l = 3)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((8L, 3L, 1L, 2L, 4L, 500000L)))
    // Fully l-diverse: zero exposure. A k-anonymous-but-uniform group is
    // exactly what this catches that kAnonymityProfile cannot.
    val ok = Curation.lDiversityProfile(
      Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("u", "s"),
      Seq(col("u")), col("s"), l = 2)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(ok === ((4L, 2L, 2L, 0L, 0L, 0L)))
  }

  test("tClosenessProfile: hand EMD, balanced groups pass, single value degenerate") {
    // Perfectly polarized: group a owns value 1, b owns value 2.
    // Each group's EMD vs the 50/50 corpus = 0.5 → t = 500000 ppm,
    // both violate the default 200000 threshold.
    val df = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L)).toDF("u", "s")
    val got = Curation.tClosenessProfile(df, Seq(col("u")), col("s"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((4L, 2L, 2L, 500000L, 2L, 4L, 1000000L)))
    // Every group mirrors the corpus distribution exactly: t = 0.
    val bal = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("u", "s")
    val ok = Curation.tClosenessProfile(bal, Seq(col("u")), col("s"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(ok === ((4L, 2L, 2L, 0L, 0L, 0L, 0L)))
    // One sensitive value in the whole corpus: nothing can skew — 0.
    val one = Curation.tClosenessProfile(
      Seq(("a", 5L), ("b", 5L)).toDF("u", "s"), Seq(col("u")), col("s"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(one === ((2L, 2L, 1L, 0L, 0L, 0L, 0L)))
    // Knee path: coarsened sensitive values — the EMD of the bucketed
    // attribute still flags the polarized pair.
    val knee = Curation.tClosenessProfile(
      (0 until 40).map(i => (if (i < 20) "a" else "b",
        if (i < 20) i.toLong else (1000 + i).toLong)).toDF("u", "s"),
      Seq(col("u")), col("s"), maxHistBins = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(knee._4 > 200000L && knee._5 === 2L)
  }

  test("quantileNormalize properties on random data: within-group " +
      "monotone, image inside the pooled value set, min maps to min") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(60, for {
      g <- Gen.oneOf("s0", "s1", "s2")
      v <- Gen.choose(-50L, 50L)
    } yield (g, v))
    for (i <- 0 until 3) {
      val rows = gen(Gen.Parameters.default, Seed(11L + i)).get
        .zipWithIndex.map { case ((g, v), id) => (id.toLong, g, v) }
      val df = rows.toDF("doc", "src", "s")
      val out = Curation.quantileNormalize(df, "doc", "src", col("s"))
        .as[(Long, String, Long, Long)].collect().toSeq
      val pooledVals = rows.map(_._3).toSet
      assert(out.forall(r => pooledVals.contains(r._4)),
        "normalized values must come from the pooled score set")
      out.groupBy(_._2).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._3)
        assert(sorted.map(_._4) === sorted.map(_._4).sorted,
          "normalization must be monotone within a group")
        assert(sorted.head._4 === rows.map(_._3).min,
          "each group's minimum lands on the pooled minimum (rank 0)")
      }
    }
  }

  test("shuffleQualityAudit: key-sorted order has exactly n_keys runs " +
      "(property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(40, Gen.oneOf("a", "b", "c", "d"))
    for (i <- 0 until 3) {
      val keys = gen(Gen.Parameters.default, Seed(23L + i)).get
      // serving order = sorted by key: every key is one contiguous run.
      val rows = keys.sorted.zipWithIndex.map { case (k, o) => ("S", o.toLong, k) }
      val got = Curation.shuffleQualityAudit(rows.toDF("sh", "o", "k"),
          "sh", col("o"), col("k"))
        .as[(String, Long, Long, Long, Long)].head()
      assert(got._3 === keys.distinct.size.toLong &&
        got._4 === keys.distinct.size.toLong,
        s"sorted layout must have runs == n_keys, got $got")
      assert(got._5 <= 1000000L || keys.distinct.size == keys.size)
    }
  }

  test("shuffleQualityAudit: clumped below 1e6, alternating above, " +
      "single-key shard reports 1e6") {
    // shard A ordered keys a,a,b,b: runs 2, cc = 2+2 = 4, denom 16−4=12 →
    //   ratio = 2·4·1e6 DIV 12 = 666666 (clumped).
    // shard B ordered a,b,a,b: runs 4 → 1333333 (better than random).
    // shard C all one key: runs 1, denom n → 1e6 by the algebra itself.
    val df = Seq(
      ("A", 1L, "a"), ("A", 2L, "a"), ("A", 3L, "b"), ("A", 4L, "b"),
      ("B", 1L, "a"), ("B", 2L, "b"), ("B", 3L, "a"), ("B", 4L, "b"),
      ("C", 1L, "z"), ("C", 2L, "z"), ("C", 3L, "z")).toDF("sh", "o", "k")
    val got = Curation.shuffleQualityAudit(df, "sh", col("o"), col("k"))
      .orderBy("shard").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("A", 4L, 2L, 2L, 666666L),
      ("B", 4L, 2L, 4L, 1333333L), ("C", 3L, 1L, 1L, 1000000L)))
  }

  test("quantileNormalize: within-group quantiles map onto pooled values, " +
      "floor interpolation, min always matches") {
    // pooled scores: 10,20,30,40 each once (n=4): pooled ranks 0, 333333,
    // 666666, 1000000.
    // g1 = {10, 20}: ranks 0, 1e6 → norm 10, 40.
    // g2 = {30, 40}: ranks 0, 1e6 → norm 10, 40 — the point of the op:
    //   g2's LOW score normalizes to the pooled LOW value.
    val df = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L),
      (4L, "g2", 40L)).toDF("doc", "src", "s")
    val got = Curation.quantileNormalize(df, "doc", "src", col("s"))
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq((1L, "g1", 10L, 10L), (2L, "g1", 20L, 40L),
      (3L, "g2", 30L, 10L), (4L, "g2", 40L, 40L)))
    // floor interpolation: a 3-row group's middle rank (500000) has no
    // exact pooled match — it takes the LARGEST pooled rank below it.
    // pooled = {1,2,3,4,5,6} ranks 0,200000,...,1e6; g's mid rank 500000
    // → pooled 400000 → value 3.
    val df2 = ((1L to 6L).map(v => (v, "p", v)) ++
      Seq((10L, "g", 100L), (11L, "g", 200L), (12L, "g", 300L)))
      .toDF("doc", "src", "s")
    val got2 = Curation.quantileNormalize(df2, "doc", "src", col("s"))
      .where(col("grp") === "g").orderBy("id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // pooled here = {1..6, 100, 200, 300} (9 values, ranks k/8): g's mid
    // rank 500000 → largest pooled rank ≤ 500000 is 4/8 = 500000 → the
    // 5th pooled value = 5.
    assert(got2.map(_._4) === Seq(1L, 5L, 300L))
  }

  test("perGroupScoreRank: ties share a rank, min is 0, unique max is 1e6, " +
      "single-row group is 0") {
    // group g1 scores: 10, 20, 20, 30 (n=4):
    //   10 -> lt 0 -> 0; 20 -> lt 1 -> 333333 (both); 30 -> lt 3 -> 1e6.
    // group g2: one row -> 0.
    val df = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g1", 20L),
      (4L, "g1", 30L), (5L, "g2", 99L)).toDF("doc", "src", "s")
    val got = Curation.perGroupScoreRank(df, "doc", "src", col("s"))
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "g1", 10L, 0L), (2L, "g1", 20L, 333333L), (3L, "g1", 20L, 333333L),
      (4L, "g1", 30L, 1000000L), (5L, "g2", 99L, 0L)))
  }
}
