package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked full-text search over a document corpus — the reference's search
  * domain (logtools Search/FastSearch find lines; a training-data pipeline
  * additionally needs to RANK documents) expressed as one declarative plan.
  *
  * BM25 (Robertson-Spärck Jones, the standard probabilistic ranking
  * function) with the usual k1/b parameterization and the Lucene-style
  * non-negative idf `ln(1 + (N - df + 0.5)/(df + 0.5))`.
  *
  * Scale shape: for a bounded query-term list no inverted index is needed —
  * per-document term frequencies are narrow `filter` counts over the staged
  * token array (one codegen'd pass per term), corpus statistics (N, Σdl,
  * per-term df) are ONE tiny aggregate broadcast back onto the scan, and
  * the final top-k is a TakeOrderedAndProject (k-bounded per partition,
  * k-bounded merge at the driver — never a global sort). Two passes over
  * the corpus, zero wide shuffles.
  *
  * Double-precision note: every non-transcendental operation is order-fixed
  * IEEE arithmetic and reproduces bit-exactly in an independent engine, but
  * `ln` does NOT — `java.lang.Math.log` and DuckDB's `ln` were observed to
  * differ by 1 ulp on some idf arguments (measured: both agree on most
  * inputs, diverge at e.g. 0x3FF451C3A672DBFC). Cross-engine comparison
  * therefore checks the RANKING (rank, id, dl — exact integers; see
  * [[bm25RankOracleSql]]), which 1-ulp score jitter cannot flip unless two
  * distinct (tf, dl) profiles score within ~1e-15 relative of each other —
  * and identical profiles tie exactly in both engines, broken by id.
  */
object TextSearch {

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty 2004)
    * — the language-modeling counterpart of [[bm25TopK]]:
    *
    *   score(q, d) = Σ_w ln( (tf_{w,d} + μ·p(w|C)) / (|d| + μ) )
    *
    * with p(w|C) = cf_w / |C|, evaluated as the all-integer rational
    * (tf·|C| + μ·cf') / ((|d| + μ)·|C|), cf' = max(cf, 1) (a query term
    * absent from the whole corpus would put ln(0) in the sum; the floor
    * is the standard OOV guard and is engine-replayable). Each term's
    * contribution is integerized round(10⁶·ln·) BEFORE the sum (the PMI /
    * docEntropy determinism policy: every product of exact int64 counts is
    * exact below 2⁵³, both engines hand ln the identical double, and the
    * summed int64 score is order-independent) — so unlike BM25's
    * double-sum score, the Dirichlet score itself is hash-comparable
    * cross-engine.
    *
    * Shape: one corpus pass for (dl, per-term tf), a 1-row broadcast of
    * (|C|, cf), a narrow fused scoring projection, k-bounded TakeOrdered.
    */
  def dirichletQlTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
      mu: Long = 2000L): DataFrame = {
    require(queryTerms.nonEmpty, "dirichletQlTopK needs at least one query term")
    require(mu >= 1, s"mu must be >= 1, got $mu")
    val terms = queryTerms.map(_.toLowerCase)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("__t"), x => x === lit(t))).cast("long").as(s"tf_$i")
    }
    val staged = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(Seq(col("id"), size(col("__t")).cast("long").as("dl")) ++ tfCols: _*)
    val cfCols = terms.indices.map(i => sum(col(s"tf_$i")).as(s"cf_$i"))
    val stats = staged.agg(sum(col("dl")).as("c_total"), cfCols: _*)
    val score = terms.indices.map { i =>
      // Operands to double BEFORE multiplying: tf*c_total in int64
      // overflows at corpus scale (c_total ~ 1e13 x a long doc's dl) —
      // ANSI mode would kill the job on one big document, non-ANSI would
      // corrupt the ranking. Doubles are exact for products < 2^53 (every
      // test SF), and round-once beyond that instead of wrapping.
      val num = col(s"tf_$i").cast("double") * col("c_total").cast("double") +
        lit(mu.toDouble) * greatest(col(s"cf_$i"), lit(1L)).cast("double")
      val den = (col("dl") + lit(mu)).cast("double") *
        col("c_total").cast("double")
      round(lit(1e6) * log(num / den)).cast("long")
    }.reduce(_ + _)
    staged.crossJoin(broadcast(stats))
      .select(col("id").as(idCol), col("dl"), score.as("score_scaled"))
      .orderBy(col("score_scaled").desc, col(idCol))
      .limit(k)
  }

  /** Top-k documents by BM25 score for `queryTerms` (terms are matched
    * against the engine tokenization — lowercased whitespace words).
    * Output: (idCol, dl, score), score desc, ties by id.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val terms = queryTerms.map(_.toLowerCase)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("__t"), x => x === lit(t))).cast("long").as(s"tf_$i")
    }
    val staged = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(Seq(col("id"), size(col("__t")).cast("long").as("dl")) ++ tfCols: _*)
    val dfCols = terms.indices.map(i =>
      sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val stats = staged.agg(
      count(lit(1)).as("n_docs"),
      (Seq(sum(col("dl")).as("sum_dl")) ++ dfCols): _*)

    val joined = staged.crossJoin(broadcast(stats))
    val n = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val dfT = col(s"df_$i").cast("double")
      val idf = log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)

    // The no-hit filter runs ABOVE the top-k, not below: zero-score rows
    // sort after every positive score, so top-k-then-filter selects the
    // identical set — and a filter below would make Catalyst infer isnotnull
    // constraints whose pushdown re-derives tokenize(text) per null-check at
    // the scan (4 extra token passes per row).
    joined
      .select(col("id").as(idCol), col("dl"), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .where(col("score") > 0.0)
  }

  /** The ranked result with the score projected away: (rank, id, dl) —
    * exact integers, safe to hash-compare across engines (see class doc).
    * The window ranks a result already bounded to k rows, so it is not a
    * scale concern.
    */
  def bm25RankedTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bm25TopK(df, idCol, textCol, queryTerms, k, k1, b)
      .select(row_number().over(
          Window.orderBy(col("score").desc, col(idCol))).cast("long").as("rank"),
        col(idCol), col("dl"))
      .orderBy("rank")
  }

  /** Two-stage hybrid retrieval — the standard RAG/search-stack shape:
    * BM25 selects `nCandidates` lexical candidates (cheap, full-corpus,
    * index-friendly), exact embedding cosine against the query vector
    * re-ranks them, top `k` win. The re-rank window is BOUNDED by
    * `nCandidates` (never corpus-sized), so the final ordering is a
    * driver-light single-partition sort of ≤ nCandidates rows; the only
    * corpus-wide work is BM25's two passes. Output (rank, id) — integer
    * columns only, so last-ulp score differences cannot flip a
    * cross-engine hash (the q_knn_assign convention).
    */
  def hybridTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      embeddings: DataFrame,
      embIdCol: String,
      vecCol: String,
      queryTerms: Seq[String],
      queryVec: Array[Float],
      nCandidates: Int = 100,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nCandidates >= k, s"nCandidates ($nCandidates) must be >= k ($k)")
    val cands = bm25RankedTopK(docs, idCol, textCol, queryTerms,
      nCandidates, k1, b).select(col(idCol))
    val qv = typedLit(queryVec.toSeq)
    cands
      .join(embeddings.select(col(embIdCol).as(idCol), col(vecCol).as("__v")),
        Seq(idCol))
      .select(col(idCol), Similarity.cosine(col("__v"), qv).as("__cos"))
      .select(row_number().over(
          Window.orderBy(col("__cos").desc, col(idCol))).cast("long").as("rank"),
        col(idCol))
      .orderBy("rank").limit(k)
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of a
    * lexical (BM25) and a dense (cosine) candidate list — the score-free
    * hybrid fusion RAG stacks default to when the two scorers'
    * magnitudes aren't comparable: each list contributes `1/(c + rank)`
    * per document, summed. Where [[hybridTopK]] GATES by lexical
    * candidates then re-ranks dense, RRF treats the rankers as equals —
    * a doc ranked #1 densely but missed by BM25 still surfaces.
    *
    * Determinism: contributions are INTEGER-scaled —
    * `floor(scale / (c + rank))` — so the fusion sum is exact int64
    * (order-independent; a double Σ of reciprocals would be
    * partitioning-sensitive in its low bits) and the fused ranking
    * hash-matches any engine. Shape: both candidate lists are k-bounded
    * TakeOrdered results (≤ nCandidates rows each), the fusion join and
    * final sort touch only those. Output:
    * (rank, id, rrf_scaled, lex_rank, dense_rank) — ranks null when a
    * doc appears in only one list.
    */
  def rrfFusion(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      embeddings: DataFrame,
      embIdCol: String,
      vecCol: String,
      queryTerms: Seq[String],
      queryVec: Array[Float],
      nCandidates: Int = 100,
      k: Int = 10,
      c: Int = 60,
      scale: Long = 1000000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nCandidates >= k, s"nCandidates ($nCandidates) must be >= k ($k)")
    val lex = bm25RankedTopK(docs, idCol, textCol, queryTerms, nCandidates)
      .select(col(idCol), col("rank").as("lex_rank"))
    val dense = embeddings
      .select(col(embIdCol).as(idCol),
        Similarity.cosine(col(vecCol), typedLit(queryVec.toIndexedSeq))
          .as("__cos"))
      .orderBy(desc("__cos"), col(idCol)).limit(nCandidates)
      .select(col(idCol), row_number().over(
          Window.orderBy(desc("__cos"), col(idCol))).cast("long")
        .as("dense_rank"))
    val fused = lex.join(dense, Seq(idCol), "full_outer")
      .select(col(idCol), col("lex_rank"), col("dense_rank"),
        (coalesce(expr(s"$scale DIV ($c + lex_rank)"), lit(0L)) +
          coalesce(expr(s"$scale DIV ($c + dense_rank)"), lit(0L)))
          .as("rrf_scaled"))
    fused
      .orderBy(desc("rrf_scaled"), col(idCol)).limit(k)
      .select(row_number().over(
          Window.orderBy(desc("rrf_scaled"), col(idCol))).cast("long")
        .as("rank"),
        col(idCol), col("rrf_scaled"), col("lex_rank"), col("dense_rank"))
  }

  /** The SAME ranking as ANSI SQL over a `documents`-shaped table, generated
    * from the identical term list and parameters so operator and oracle
    * cannot drift. `tokensSql` is the engine-tokenizer fragment (a list
    * expression over a column named `text`). All numeric literals are cast
    * to DOUBLE (DuckDB parses bare decimals as DECIMAL, whose arithmetic
    * would diverge from IEEE). Emits (rank, id, dl) matching
    * [[bm25RankedTopK]].
    */
  def bm25RankOracleSql(
      table: String,
      idCol: String,
      tokensSql: String,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): String = {
    val terms = queryTerms.map(_.toLowerCase)
    val tfSelects = terms.zipWithIndex.map { case (t, i) =>
      // SQL-escape the term literal: an unescaped single quote would produce
      // invalid (or silently wrong) oracle SQL and diverge the check.
      s"len(list_filter(t, x -> x = '${t.replace("'", "''")}')) AS tf_$i"
    }.mkString(", ")
    val dfSelects = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$i")
      .mkString(", ")
    def d(v: Double) = s"CAST($v AS DOUBLE)"
    val scoreExpr = terms.indices.map { i =>
      s"ln((g.n - g.df_$i + ${d(0.5)}) / (g.df_$i + ${d(0.5)}) + ${d(1.0)})" +
        s" * (CAST(s.tf_$i AS DOUBLE) * ${d(k1 + 1.0)})" +
        s" / (CAST(s.tf_$i AS DOUBLE) + ${d(k1)} * (${d(1.0)} - ${d(b)}" +
        s" + ${d(b)} * CAST(s.dl AS DOUBLE) / g.avgdl))"
    }.mkString(" + ")
    s"""WITH d AS (SELECT $idCol, $tokensSql AS t FROM $table),
       | s AS (SELECT $idCol, len(t) AS dl, $tfSelects FROM d),
       | g AS (SELECT count(*)::DOUBLE AS n,
       |     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, $dfSelects FROM s)
       | SELECT row_number() OVER (ORDER BY score DESC, $idCol) AS rank,
       |     $idCol, dl
       | FROM (SELECT s.$idCol, s.dl, $scoreExpr AS score FROM s, g)
       | WHERE score > 0 ORDER BY rank LIMIT $k""".stripMargin
  }

  /** Per-document top-`k` TF-IDF terms — the keyword/topic-signal
    * extraction pass (document tagging, cluster labeling, boilerplate
    * spotting by inverse specificity). Scoring is INTEGERIZED for
    * cross-engine replay: idf_scaled = round(`scale` · ln(N / df_t)) is one
    * integer PER DISTINCT TERM (the λ-table discipline — one `ln` per term,
    * not per row, and N/df is a ratio of exact int64 counts), and
    * score = tf · idf_scaled is exact int64 from there. Ties break by term
    * ascending.
    *
    * Scale shape: one explode→(id, term) count aggregation (map-side
    * combined) feeds BOTH tf and — re-aggregated by term only — df, so the
    * corpus is tokenized once; the (term, idf) table joins back gram-keyed
    * (AQE broadcasts it when the vocabulary fits); the per-document top-k
    * is a bounded array sort over that document's OWN distinct terms (a
    * narrow projection after one grouped collect — per-group state is the
    * document's distinct-term set, which its own length already bounds; no
    * window, no global sort).
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      scale: Double = 1e6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("id"), explode(col("__t")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val nDocs = df.select(col(idCol)).count()
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        round(lit(scale) * log(lit(nDocs.toDouble) / col("df")))
          .cast("long").as("idf_scaled"))
    tf.join(idf, Seq("term"))
      .select(col("id"),
        struct((col("tf") * col("idf_scaled")).as("score"),
          col("term"), col("tf"), col("idf_scaled")).as("__e"))
      .groupBy("id")
      .agg(collect_list(col("__e")).as("__es"))
      .select(col("id"), posexplode(expr(
        // sort by (score desc, term asc): negate the score for the
        // ascending array_sort of (neg score, term) structs.
        s"slice(array_sort(transform(__es, e -> struct(-e.score AS ns, e.term AS term, e.tf AS tf, e.idf_scaled AS idf_scaled))), 1, $k)"))
        .as(Seq("__r", "__e")))
      .select(col("id").as(idCol), col("__e.term").as("term"),
        col("__e.tf").as("tf"), col("__e.idf_scaled").as("idf_scaled"),
        (-col("__e.ns")).as("score_scaled"),
        (col("__r") + 1).cast("int").as("rank"))
  }

  /** LEB128 varint byte count of a non-negative long: 1 byte per started
    * 7-bit group — pure integer threshold comparisons, engine-replayable.
    * Groups stop at 2^56: a non-negative int64 is at most 63 value bits =
    * 9 groups (the 2^63 threshold is not representable as a positive
    * long).
    */
  def varintBytes(v: Column): Column =
    (1 to 8).map(g => (v >= (1L << (7 * g))).cast("long"))
      .foldLeft(lit(1L))(_ + _)

  /** Inverted-index postings statistics: per term, document frequency,
    * total term frequency, posting-list span, and the size the sorted
    * doc-id list compresses to under delta + LEB128-varint coding (vs
    * 8·df raw) — what an index-build pipeline reads to budget shard sizes
    * and pick stopword cutoffs before actually materializing an index.
    *
    * Scale shape: (term, doc) term frequencies are one map-side-combined
    * aggregate; deltas come from `lag` over a per-TERM window — the
    * partition axis IS the index shard axis (a posting list is sequential
    * by construction in any engine; ultra-common terms make long
    * partitions, which is why the df/bytes budget this operator computes
    * is what decides their stopword cutoff) — and the per-term rollup is a
    * second map-side-combined aggregate. Delta convention: Δ₀ = id₀ + 1,
    * Δᵢ = idᵢ − idᵢ₋₁ (every delta ≥ 1 on distinct sorted ids).
    */
  /** Character-trigram posting index for SUBSTRING search (the Cox
    * codesearch design, public: every document lists its distinct char
    * 3-grams; a substring query must match every trigram of the pattern,
    * so ANDing the pattern's posting lists prunes the corpus to a
    * candidate set orders of magnitude smaller than a full scan, and one
    * exact `contains` verify per candidate finishes the job). This is the
    * index a log-search tier builds once and queries many times —
    * substring queries (unlike tokens) have no word boundary to invert on,
    * which is exactly what makes grep-over-100 TB otherwise a full scan.
    *
    * Build shape: one narrow explode (length(t)−2 grams per doc) + a
    * distinct on (gram, id) — map-side combined, the only shuffle. Write
    * the result bucketed (or partitioned) by `gram` and a query's
    * `isin(grams)` prunes to exactly the pattern's posting lists at scan
    * time.
    */
  def buildTrigramIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= 3)
      .select(col("id"), explode(expr(
        "transform(sequence(1, length(__t) - 2), i -> substring(__t, i, 3))"))
        .as("gram"))
      .distinct()

  /** Persist a [[buildTrigramIndex]] posting set as a gram-bucketed table —
    * the build-once artifact of the substring tier. Bucketing by `gram`
    * means a query's `gram IN (...)` predicate prunes to exactly the
    * pattern's buckets at scan time (Spark bucket pruning:
    * `SelectedBucketsCount` in the scan node — asserted in
    * TextSearchSpec), so a search touches |pattern| buckets of a 100 TB
    * index, never the index scan. Sorted within buckets so posting reads
    * are sequential per gram.
    */
  def writeTrigramIndex(index: DataFrame, table: String,
      buckets: Int = 64): Unit =
    index.write.mode("overwrite")
      .bucketBy(buckets, "gram").sortBy("gram")
      .saveAsTable(table)

  /** Append a NEW batch's postings to a persisted [[writeTrigramIndex]]
    * table — the incremental-crawl shape ([[graft.ops.Similarity.appendToIvf]]'s
    * contract for the substring tier): the batch grams bucket-hash into
    * the SAME layout (Spark validates the bucket spec on append), so the
    * existing index is never rewritten, reshuffled, or even read; a later
    * [[trigramSearch]] over `spark.table(table)` sees old + new documents
    * with bucket pruning intact. Caller contract: append each document id
    * at most once ([[trigramSearch]]'s candidate AND uses countDistinct,
    * so accidental re-appends cost bytes, not correctness).
    */
  def appendToTrigramIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 64): Unit =
    buildTrigramIndex(docs, idCol, textCol)
      .write.mode("append")
      .bucketBy(buckets, "gram").sortBy("gram")
      .saveAsTable(table)

  /** Substring query against a [[buildTrigramIndex]] posting set: candidates
    * are the docs whose index rows cover ALL the pattern's distinct
    * trigrams (an AND of posting lists — a groupBy over only those lists'
    * rows, never the corpus), then ONE exact `contains` verification per
    * candidate against the doc body. Emits every candidate with its
    * verification bit — the false-positive rows (all trigrams present but
    * never contiguously) are themselves deterministic, so the whole
    * two-stage funnel is oracle-able, and their count is the index's
    * measured selectivity. Patterns shorter than 3 chars have no trigram
    * and fall back to the verified full scan (documented contract).
    */
  def trigramSearch(
      index: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pattern: String): DataFrame = {
    val body = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__t"))
    // Pattern grams by code POINT (matching the index's Spark substring
    // semantics) — String.sliding walks UTF-16 units and would mint
    // surrogate-split grams for astral characters that can never equal an
    // indexed gram (silent false negatives on emoji/rare-CJK patterns).
    val cps = pattern.codePoints().toArray
    if (cps.length < 3) {
      return body.where(col("__t").contains(pattern))
        .select(col("id").as(idCol), lit(1).as("is_match"))
    }
    val grams = (0 to cps.length - 3).map(i => new String(cps, i, 3)).distinct
    val cand = index.where(col("gram").isin(grams: _*))
      .groupBy("id").agg(countDistinct(col("gram")).as("__g"))
      .where(col("__g") === grams.size)
      .select("id")
    cand.join(body, "id")
      .select(col("id").as(idCol),
        col("__t").contains(pattern).cast("int").as("is_match"))
  }

  def postingsStats(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("id")
    docs.select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term", "id").agg(count(lit(1)).as("tf"))
      .withColumn("delta", col("id") - coalesce(lag("id", 1).over(w), lit(-1L)))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        min(col("id")).as("first_doc"),
        max(col("id")).as("last_doc"),
        sum(varintBytes(col("delta"))).as("varint_bytes"),
        (count(lit(1)) * 8L).as("raw_bytes"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): rank the
    * corpus vocabulary by PageRank over the word co-occurrence graph —
    * the graph-centrality keyword signal that beats raw frequency
    * because a word matters when it co-occurs with OTHER central words,
    * not merely often. Edges are distinct adjacent-token pairs
    * (window 2, the published default), expanded both directions so the
    * directed integer PageRank ([[Graph.pageRank]] — fixed-point, every
    * step int64 floor arithmetic) behaves undirected; output is the
    * top-`topK` (rank desc, word) vocabulary rows.
    *
    * Scale shape: the edge set is DISTINCT word pairs — vocabulary-
    * bounded, not corpus-bounded — so the iteration cost is fixed by
    * the vocabulary graph no matter the corpus size; the only
    * corpus-mass pass is the one bigram distinct. Fully
    * oracle-replayable (unrolled integer PageRank iterations).
    */
  def textRankKeywords(
      df: DataFrame,
      textCol: String,
      topK: Int = 30,
      iters: Int = 3): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df.select(
      graft.functions.TextFunctions.tokenize(col(textCol)).as("__t"))
    val pairs = toks
      .select(explode(when(size(col("__t")) < 2,
        array().cast("array<struct<a:string,b:string>>"))
        .otherwise(transform(sequence(lit(0), size(col("__t")) - 2),
          i => struct(
            least(element_at(col("__t"), i + 1),
              element_at(col("__t"), i + 2)).as("a"),
            greatest(element_at(col("__t"), i + 1),
              element_at(col("__t"), i + 2)).as("b"))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val bidir = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    Graph.pageRank(bidir, "src", "dst", iters = iters)
      .select(col("id").as("word"), col("rank"))
      .orderBy(desc("rank"), col("word"))
      .limit(topK)
  }

  /** KWIC (keyword-in-context) concordance — the snippet generator of a
    * search result page, and the oldest text-analysis view there is: one
    * row per OCCURRENCE of `term` with up to `window` tokens of left and
    * right context rendered around it. Matching is on the engine's
    * standard lowercased tokens, so hits agree exactly with
    * [[bm25TopK]]/postings counts.
    *
    * Shape: a narrow staged pass (tokens once per row — the no-CSE
    * staging), occurrence positions from one indexed filter, then one
    * explode; context windows are `slice`s of the already-materialized
    * token array, so each occurrence costs O(window), not a re-scan.
    * Output rows are (id, pos, left_ctx, hit, right_ctx) with pos
    * 0-based.
    */
  def kwic(
      df: DataFrame,
      idCol: String,
      textCol: String,
      term: String,
      window: Int = 5): DataFrame = {
    require(window >= 0, s"window must be >= 0, got $window")
    require(term.nonEmpty, "term must be non-empty")
    val staged = df.select(col(idCol),
      graft.functions.TextFunctions.tokenize(col(textCol)).as("__t"))
    // tokenize() lowercases, so the probe must too — a verbatim compare
    // returned zero rows for any query with an uppercase letter, silently
    // diverging from bm25TopK/postings (which lowercase their terms).
    val probe = term.toLowerCase
    val hits = staged.select(col(idCol), col("__t"),
      explode(filter(
        transform(col("__t"), (tk, i) => when(tk === probe, i).otherwise(-1)),
        p => p >= 0)).as("__p"))
    hits.select(col(idCol), col("__p").cast("long").as("pos"),
      array_join(slice(col("__t"),
        greatest(col("__p") - window + 1, lit(1)),
        least(col("__p"), lit(window))), " ").as("left_ctx"),
      lit(probe).as("hit"),
      array_join(slice(col("__t"), col("__p") + 2, lit(window)), " ")
        .as("right_ctx"))
  }

  /** Pseudo-relevance-feedback expansion terms — the RM1 relevance-model
    * estimator behind RM3 (Lavrenko & Croft 2001): run the query once
    * ([[dirichletQlTopK]]), treat the top `fbDocs` documents as
    * pseudo-relevant, and elect the `fbTerms` terms that concentrate in
    * them, weighted by length-normalized feedback mass
    *
    *   w(t) = Σ_{d ∈ FB} (tf_{t,d} · 10⁶) DIV dl_d
    *
    * (each addend an exact integer, so the sum is order-free and
    * SQL-replayable; original query terms are excluded — the output IS
    * the expansion candidate list an RM3 interpolation would mix back).
    *
    * Scale shape: the first stage is the k-bounded QL ranking; the
    * second touches ONLY the ≤ fbDocs feedback documents — the corpus is
    * broadcast-semi-filtered on their ids and token arrays derive for
    * members alone (the dupeEvidence law: never carry heavy payloads to
    * a small join, bring the small key set to the corpus), then one
    * (fbDocs-bounded) term aggregation and a k-bounded TakeOrdered.
    * Output: (term, weight_scaled, df_fb) by (weight desc, term).
    */
  def prfExpansionTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      fbDocs: Int = 10,
      fbTerms: Int = 10,
      mu: Long = 2000L): DataFrame = {
    require(fbDocs >= 1, s"fbDocs must be >= 1, got $fbDocs")
    require(fbTerms >= 1, s"fbTerms must be >= 1, got $fbTerms")
    val terms = queryTerms.map(_.toLowerCase)
    val fb = dirichletQlTopK(df, idCol, textCol, terms, k = fbDocs, mu = mu)
      .select(col(idCol))
    df.join(broadcast(fb), Seq(idCol))
      .select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("id"), size(col("__t")).cast("long").as("__dl"),
        explode(col("__t")).as("term"))
      .where(col("__dl") > 0 && !col("term").isInCollection(terms))
      .groupBy("id", "term", "__dl").agg(count(lit(1)).as("__tf"))
      .groupBy("term").agg(
        sum(expr("(__tf * 1000000) DIV __dl")).as("weight_scaled"),
        count(lit(1)).as("df_fb"))
      .orderBy(desc("weight_scaled"), col("term"))
      .limit(fbTerms)
  }

  /** Ranked-retrieval quality evaluation — nDCG@k, MRR, and recall@k per
    * query, the scorecard every retrieval stack in this file ([[bm25TopK]],
    * [[dirichletQlTopK]], hybrid/RRF fusion) is tuned against. Inputs are
    * the standard TREC shapes: `run` = (query, doc_id, rank) with rank
    * 1-based within query, `qrels` = (query, doc_id, grade) with grades
    * clamped to 0..3 (0 = non-relevant; relevant means grade > 0).
    *
    * All-integer evaluation: rank discounts D(r) = round(10⁹/log₂(r+1))
    * are k driver-computed literals shared verbatim with any SQL replay,
    * so DCG = Σ grade·D(rank) is an exact int64 sum. The IDEAL DCG never
    * sorts the qrels: with grades bounded 0..3, a per-query grade
    * HISTOGRAM (n₃, n₂, n₁) determines the ideal prefix in closed form
    * via the prefix-sum literal SD — IDCG = Σ_g g·(SD(min(k, cum_g)) −
    * SD(min(k, cum_{g+1}))) — one element_at per grade level.
    * `ndcg_ppm` = (DCG·10⁶) DIV IDCG, `mrr_ppm` = 10⁶ DIV first-relevant
    * rank, `recall_ppm` = (hits·10⁶) DIV n_rel; queries missing from
    * either side report the metric their side supports and 0 elsewhere.
    *
    * Scale shape: the run side is |Q|·k rows BY CONTRACT (it came out of
    * a k-bounded top-k); the qrels side can be corpus-sized, but it only
    * ever feeds two map-side-combined aggregations keyed by query (the
    * histogram and the run join, which is run-sized after the equi-join).
    * No windows, no sorts beyond the |Q|-row presentation.
    */
  def retrievalEval(run: DataFrame, qrels: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1, 100], got $k")
    val ln2 = math.log(2.0)
    val disc: Seq[Long] = (1 to k).map(r =>
      math.round(1e9 / (math.log(r + 1.0) / ln2)))
    val sd: Seq[Long] = disc.scanLeft(0L)(_ + _)
    val discLit = array(disc.map(lit): _*)
    val sdLit = array(sd.map(lit): _*)
    def clamp(c: Column): Column =
      least(greatest(c.cast("long"), lit(0L)), lit(3L))

    val graded = run.where(col("rank") >= 1 && col("rank") <= k)
      .select(col("query"), col("doc_id"), col("rank").cast("int").as("__r"))
      .join(qrels.select(col("query"), col("doc_id"), col("grade")),
        Seq("query", "doc_id"), "left")
      .select(col("query"), col("__r"),
        clamp(coalesce(col("grade"), lit(0L))).as("__g"))
    val runAgg = graded.groupBy("query").agg(
      sum(col("__g") * element_at(discLit, col("__r"))).as("dcg_s"),
      sum((col("__g") > 0).cast("long")).as("hits"),
      min(when(col("__g") > 0, col("__r"))).as("__fr"))

    val hist = qrels
      .select(col("query"), clamp(col("grade")).as("__g"))
      .groupBy("query").agg(
        sum((col("__g") === 3).cast("long")).as("__n3"),
        sum((col("__g") >= 2).cast("long")).as("__n32"),
        sum((col("__g") >= 1).cast("long")).as("n_rel"))
    def sdAt(c: Column): Column =
      element_at(sdLit, (least(lit(k.toLong), c) + 1).cast("int"))
    val ideal = hist.select(col("query"), col("n_rel"),
      (lit(3L) * sdAt(col("__n3")) +
        lit(2L) * (sdAt(col("__n32")) - sdAt(col("__n3"))) +
        (sdAt(col("n_rel")) - sdAt(col("__n32")))).as("idcg_s"))

    ideal.join(runAgg, Seq("query"), "full_outer")
      .select(col("query"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("dcg_s"), lit(0L)).as("dcg_s"),
        coalesce(col("idcg_s"), lit(0L)).as("idcg_s"),
        col("__fr"))
      .select(col("query"), col("n_rel"), col("hits"), col("dcg_s"),
        col("idcg_s"),
        when(col("idcg_s") > 0, expr("(dcg_s * 1000000) DIV idcg_s"))
          .otherwise(lit(0L)).as("ndcg_ppm"),
        coalesce(expr("1000000 DIV __fr").cast("long"), lit(0L)).as("mrr_ppm"),
        when(col("n_rel") > 0, expr("(hits * 1000000) DIV n_rel"))
          .otherwise(lit(0L)).as("recall_ppm"))
      .orderBy("query")
  }
}
