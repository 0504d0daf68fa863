package graft.ops

import graft.SparkTestBase

class TextSearchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "cat sat"),
    (2L, "cat cat runs fast"),
    (3L, "dog barks"),
    (4L, "the cat and the dog ran")).toDF("doc_id", "text")

  test("bm25 scores match the hand-computed formula") {
    val got = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap

    // N=4, dl=(2,4,2,6), avgdl=14/4, df(cat)=3.
    val n = 4.0; val avgdl = 14.0 / 4
    val idf = math.log((n - 3.0 + 0.5) / (3.0 + 0.5) + 1.0)
    def s(tf: Double, dl: Double) =
      idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    assert(got.keySet === Set(1L, 2L, 4L))   // doc 3 has no hit → filtered
    assert(got(1L) === s(1, 2))
    assert(got(2L) === s(2, 4))
    assert(got(4L) === s(1, 6))
  }

  test("ranking: higher tf wins, shorter doc wins at equal tf, rare term outweighs") {
    val ranked = TextSearch.bm25RankedTopK(docs, "doc_id", "text", Seq("cat"), k = 10)
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    // tf=2 beats tf=1; among tf=1 the shorter doc (dl=2) beats dl=6.
    assert(ranked === Seq((1L, 2L), (2L, 1L), (3L, 4L)))

    // "barks" (df=1) contributes more than "cat" (df=3) at equal tf/dl.
    val two = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("cat", "barks"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(two(3L) > two(1L))
  }

  test("multi-term scores are additive and the plan is k-bounded") {
    val one = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val dog = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("dog"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val both = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("cat", "dog"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(both(4L) === one(4L) + dog(4L))

    // Global top-k must be a TakeOrderedAndProject (k-bounded merge), never
    // a full Sort + Exchange of the corpus. Use a parquet source: on an
    // in-memory LocalRelation with known maxRows <= k, EliminateLimits
    // removes the limit and the plan legitimately degenerates. AQE finalizes
    // the plan on execution, so collect() first.
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    docs.write.mode("overwrite").parquet(dir)
    val q = TextSearch.bm25TopK(spark.read.parquet(dir), "doc_id", "text",
      Seq("cat"), k = 10)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // And the scan must tokenize once per row — no constraint-inferred
    // null-check filters re-deriving tokenize at the scan.
    assert(!plan.contains("isnotnull(size(filter(tokenize"), plan)
  }

  test("hybridTopK: lexical candidates, cosine order, candidate gate") {
    val docs = Seq(
      (1L, "cat cat cat feline"),      // strong lexical match
      (2L, "cat dog"),                 // weaker lexical match
      (3L, "cat mouse bird"),          // lexical match
      (4L, "nothing relevant here"))   // no term hit → never a candidate
      .toDF("doc_id", "text")
    val embs = Seq(
      (1L, Seq(0f, 1f, 0f)),   // orthogonal to query
      (2L, Seq(1f, 0f, 0f)),   // identical to query
      (3L, Seq(0.7f, 0.7f, 0f)),
      (4L, Seq(1f, 0f, 0f)))   // identical to query but gated out by BM25
      .toDF("vec_id", "embedding")
    val got = TextSearch.hybridTopK(docs, "doc_id", "text", embs, "vec_id",
        "embedding", Seq("cat"), Array(1f, 0f, 0f), nCandidates = 3, k = 3)
      .as[(Long, Long)].collect()
    // Cosine order among BM25 candidates {1,2,3}: 2 (1.0), 3 (~0.7), 1 (0).
    assert(got === Array((1L, 2L), (2L, 3L), (3L, 1L)))
  }

  test("oracle SQL escapes single quotes in query terms") {
    val sql = TextSearch.bm25RankOracleSql("documents", "doc_id",
      "string_split(text, ' ')", Seq("o'brien", "cat"))
    assert(sql.contains("x = 'o''brien'"), sql)
    assert(!sql.contains("x = 'o'brien'"), sql)
  }

  test("tfidfTopTerms: hand-computed scores, term-asc ties, rank density") {
    // 4 docs. "rare" appears only in doc 1 (idf = ln 4), "mid" in docs 1+2
    // (idf = ln 2), "common" in all 4 (idf = ln 1 = 0 → score 0).
    val docs = Seq(
      (1L, "rare mid common common"),
      (2L, "mid mid common"),
      (3L, "common common solo3"),
      (4L, "common")).toDF("doc_id", "text")
    val got = TextSearch.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def s(v: Double): Long = math.round(1e6 * math.log(v))
    assert(got((1L, 1)) === (("rare", 1L, s(4.0), s(4.0))))
    assert(got((1L, 2)) === (("mid", 1L, s(2.0), s(2.0))))
    assert(got((2L, 1)) === (("mid", 2L, s(2.0), 2 * s(2.0))))
    // Doc 2's rank 2 is "common" at score 0 (idf ln1 = 0).
    assert(got((2L, 2)) === (("common", 1L, 0L, 0L)))
    // Doc 4 has one term → exactly one row; zero-score ties break by term.
    assert(got((4L, 1))._1 === "common")
    assert(!got.contains((4L, 2)))
    // Ties at equal score order term-ascending: doc 3's common(0) vs
    // solo3(ln 4): solo3 first, common second.
    assert(got((3L, 1))._1 === "solo3" && got((3L, 2))._1 === "common")
  }

  test("rrfFusion: integer-scaled reciprocal ranks, both-lists boost, single-list survival") {
    // Lexical ranking by 'cat' tf: doc2 (#1), doc4 (#2), doc1 (#3); doc3
    // has no 'cat'. Dense ranking vs query [1,0]: doc3 (#1, cos 1), then
    // doc1 (#2) ... doc2/doc4 orthogonal rank lower.
    val body = Seq(
      (1L, "cat sat"), (2L, "cat cat cat runs"), (3L, "dog barks"),
      (4L, "cat cat naps here")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(0.9f, 0.44f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(0.1f, 0.99f)))
      .toDF("vec_id", "embedding")
    val got = TextSearch.rrfFusion(body, "doc_id", "text", emb, "vec_id",
        "embedding", Seq("cat"), Array(1.0f, 0.0f), nCandidates = 4, k = 4)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    val byId = got.map(r => r._2 -> r).toMap
    // Every doc appears in both 4-deep lists here; spot-check the exact
    // integer fusion for doc1: lex #3 + dense #2 → s/(63) + s/(62).
    val s = 1000000000000L
    assert(byId(1L)._3 === s / 63 + s / 62)
    // doc1 (strong in both) outranks doc3 (dense #1 but lexical last).
    assert(byId(1L)._1 < byId(3L)._1, got.mkString(","))
    // Ranks are dense 1..4 and ordering matches rrf desc.
    assert(got.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    val sorted = got.sortBy(_._1)
    assert(sorted.sliding(2).forall { case Array(a, b) => a._3 >= b._3 })
  }

  test("trigram index: distinct grams per doc; search funnel finds matches and keeps false positives visible") {
    val body = Seq(
      (1L, "merge group by"),      // true match for "ge gr"
      (2L, "page one e gate a grid"), // all grams of "ge gr" present ("ge ",
                                      // "e g", " gr"), never contiguously
      (3L, "nothing here"),        // missing grams → not a candidate
      (4L, "aaaa")).toDF("doc_id", "text")
    val idx = TextSearch.buildTrigramIndex(body, "doc_id", "text")
    // "aaaa" has grams aaa (x2, deduped) → exactly 2 positions, 1 distinct.
    assert(idx.where($"id" === 4L).count() === 1L)
    assert(idx.where($"id" === 1L && $"gram" === "mer").count() === 1L)
    val got = TextSearch.trigramSearch(idx, body, "doc_id", "text", "ge gr")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 1), (2L, 0)))
    // Short patterns fall back to a verified scan.
    val short = TextSearch.trigramSearch(idx, body, "doc_id", "text", "aa")
      .as[(Long, Int)].collect().toSeq
    assert(short === Seq((4L, 1)))
  }

  test("persisted trigram index: bucket pruning reaches the scan; results unchanged") {
    val body = Seq(
      (1L, "merge group by"),
      (2L, "page one e gate a grid"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val idx = TextSearch.buildTrigramIndex(body, "doc_id", "text")
    val table = "trigram_idx_spec"
    try {
      TextSearch.writeTrigramIndex(idx, table, buckets = 16)
      val stored = spark.table(table)
      val got = TextSearch.trigramSearch(stored, body, "doc_id", "text",
          "ge gr")
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(got === Seq((1L, 1), (2L, 0)))
      // The gram IN (...) predicate must prune buckets at the scan: the
      // plan reports fewer selected buckets than the table has.
      val plan = TextSearch.trigramSearch(stored, body, "doc_id", "text",
        "ge gr").queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"no bucket pruning in plan:\n$plan")
      assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"expected pruned buckets, got ${sel.get.matched}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("appendToTrigramIndex: incremental postings, pruning intact, equals a rebuild") {
    val oldDocs = Seq(
      (1L, "merge group by"),
      (2L, "nothing shared here")).toDF("doc_id", "text")
    val newDocs = Seq(
      (3L, "mermaid ergo large ge gap"), // every "merge g" trigram, not contiguous
      (4L, "still unrelated words")).toDF("doc_id", "text")
    val table = "trigram_idx_append_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table)
    loc.getFileSystem(spark.sessionState.newHadoopConf()).delete(loc, true)
    try {
      TextSearch.writeTrigramIndex(
        TextSearch.buildTrigramIndex(oldDocs, "doc_id", "text"), table,
        buckets = 16)
      TextSearch.appendToTrigramIndex(newDocs, "doc_id", "text", table,
        buckets = 16)
      val all = oldDocs.unionByName(newDocs)
      val stored = spark.table(table)
      val got = TextSearch.trigramSearch(stored, all, "doc_id", "text",
          "merge g")
        .as[(Long, Int)].collect().toSet
      // Doc 1 (old) and doc 3 (appended): "merge g" is contiguous in 1,
      // trigram-covered but NOT contiguous in 3 (false positive, verified
      // to 0). The appended side must be visible without a rebuild.
      assert(got === Set((1L, 1), (3L, 0)))
      // Equality with a from-scratch index over old + new.
      val rebuilt = TextSearch.trigramSearch(
          TextSearch.buildTrigramIndex(all, "doc_id", "text"), all,
          "doc_id", "text", "merge g")
        .as[(Long, Int)].collect().toSet
      assert(got === rebuilt)
      // Bucket pruning survives the append.
      val plan = TextSearch.trigramSearch(stored, all, "doc_id", "text",
        "merge g").queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"expected pruned buckets post-append:\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("postingsStats: delta + LEB128 varint sizes, hand-checked") {
    val docs = Seq((0L, "x x y"), (5L, "x"), (300L, "x z"))
      .toDF("doc_id", "text")
    val got = TextSearch.postingsStats(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // x: postings [0,5,300], deltas [1,5,295] -> 1+1+2 bytes; tf 2+1+1.
    assert(got("x") === ((3L, 4L, 0L, 300L, 4L, 24L)))
    // y: [0], delta 1 -> 1 byte. z: [300], delta 301 -> 2 bytes.
    assert(got("y") === ((1L, 1L, 0L, 0L, 1L, 8L)))
    assert(got("z") === ((1L, 1L, 300L, 300L, 2L, 8L)))
  }

  test("varintBytes thresholds are exact at 7-bit group boundaries") {
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, (1L << 21) - 1,
      1L << 21, 1L << 56, Long.MaxValue).toDF("v")
    val got = vals.select(TextSearch.varintBytes($"v")).as[Long].collect().toSeq
    assert(got === Seq(1L, 1L, 1L, 2L, 2L, 3L, 3L, 4L, 9L, 9L))
  }

  test("dirichletQlTopK: hand-computed integerized scores, OOV floor, k cap") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry")).toDF("doc_id", "text")
    // C = 8, cf(apple) = 2, cf(durian) = 0 → floored to 1, mu = 10.
    def term(tf: Long, cf: Long, dl: Long): Long =
      math.round(1e6 * math.log(
        (tf * 8L + 10L * math.max(cf, 1L)).toDouble / ((dl + 10L) * 8L)))
    val exp = Map(
      1L -> (3L, term(2, 2, 3) + term(0, 0, 3)),
      2L -> (2L, term(0, 2, 2) + term(0, 0, 2)),
      3L -> (3L, term(0, 2, 3) + term(0, 0, 3)))
    val got = TextSearch.dirichletQlTopK(docs, "doc_id", "text",
        Seq("apple", "durian"), k = 10, mu = 10L)
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap === exp)
    // ordering: d1 (term hit) first, then d2 (shorter) over d3
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val capped = TextSearch.dirichletQlTopK(docs, "doc_id", "text",
      Seq("apple"), k = 2, mu = 10L).count()
    assert(capped === 2L)
  }

  test("prfExpansionTerms: feedback election, query-term exclusion, weights") {
    // mu = 10, C = 6, cf(apple) = 2: d2 (dl 2) outranks d1 (dl 3) outranks
    // d3 (no hit) → fbDocs = 2 keeps {d2, d1}. Expansion mass:
    // banana: (2·10⁶)//3 = 666666 from d1; cherry: 10⁶//2 = 500000 from d2;
    // "apple" itself excluded; d3's durian never enters.
    val docs = Seq(
      (1L, "apple banana banana"), (2L, "apple cherry"), (3L, "durian"))
      .toDF("doc_id", "text")
    val got = TextSearch.prfExpansionTerms(docs, "doc_id", "text",
        Seq("apple"), fbDocs = 2, fbTerms = 5, mu = 10L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("banana", 666666L, 1L), ("cherry", 500000L, 1L)))
  }

  test("retrievalEval: hand nDCG/MRR/recall, one-sided queries, rank cap") {
    // k = 3: D = [1e9, 630929754, 5e8], SD = [0, 1e9, 1630929754, 2130929754].
    // q1: qrels A=2 B=1 C=0 D=1; run C,A,B (+rank-4 row that must be cut)
    //   → DCG = 2·D₂ + D₃ = 1761859508; hist (0,1,3) →
    //     IDCG = 2·1e9 + (2130929754 − 1e9) = 3130929754;
    //     ndcg = 562727, mrr = 500000 (first hit at rank 2), recall = 2/3.
    // q2: run-only docs, all grade 0 → everything 0 with idcg 0.
    // q3: qrels-only (one grade-3 doc) → idcg = 3e9, run metrics 0.
    val run = Seq(
      ("q1", 30L, 1), ("q1", 10L, 2), ("q1", 20L, 3), ("q1", 40L, 4),
      ("q2", 50L, 1), ("q2", 60L, 2))
      .toDF("query", "doc_id", "rank")
    val qrels = Seq(
      ("q1", 10L, 2L), ("q1", 20L, 1L), ("q1", 30L, 0L), ("q1", 40L, 1L),
      ("q2", 50L, 0L),
      ("q3", 70L, 3L))
      .toDF("query", "doc_id", "grade")
    val got = TextSearch.retrievalEval(run, qrels, k = 3)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq(
      ("q1", 3L, 2L, 1761859508L, 3130929754L, 562727L, 500000L, 666666L),
      ("q2", 0L, 0L, 0L, 0L, 0L, 0L, 0L),
      ("q3", 1L, 0L, 0L, 3000000000L, 0L, 0L, 0L)))
  }
}
