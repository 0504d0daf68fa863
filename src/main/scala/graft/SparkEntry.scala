package graft

import graft.functions.TextFunctions.simhash64
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per operator of SURVEY.md §2 (mapped
  * onto the synthetic testdata tables) plus the LLM-data-pipeline operators,
  * with DuckDB oracle SQL for every SQL-expressible one.
  *
  * Oracle-parity rules (the driver hash-compares values):
  *   - `events.ts` is nanosecond parquet; Spark reads it as epoch-nanos long
  *     (`spark.sql.legacy.parquet.nanosAsLong`), DuckDB as TIMESTAMP_NS —
  *     both sides project `epoch_ms`.
  *   - doubles are rounded only at the data's own decimal granularity (sums
  *     of 2-decimal values → round 2), where both engines snap to the same
  *     exact value; `avg()` is avoided (tie-rounding differs between
  *     engines); ratios of exact integers are emitted unrounded (identical
  *     IEEE division on both sides).
  *   - every oracled query has a deterministic total ORDER BY on both sides.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with ts as epoch millis (see class doc). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events").withColumn("ts_ms", expr("ts DIV 1000000"))
  }

  /** Time-range filter on the RAW nanosecond column, not the derived ts_ms:
    * a predicate on `ts DIV 1000000` can never reach the scan, while one on
    * `ts` is at least eligible. (With this testdata it still doesn't push —
    * Spark's ParquetFilters has no conversion for TIMESTAMP(NANOS) columns
    * read via nanosAsLong — but on any sane layout the time range prunes via
    * the date/hour partition directories, as LogCatalog does for the log
    * tables; this keeps the predicate in pushable form.)
    */
  private def eventsInRange(s: SparkSession, dir: String, fromMs: Long, untilMs: Long): DataFrame =
    events(s, dir)
      .where(col("ts") >= fromMs * 1000000L && col("ts") < untilMs * 1000000L)

  /** documents augmented with known duplicates (first 20 docs re-inserted
    * under offset ids) so dedup operators have guaranteed positives at every
    * scale factor.
    */
  private def docsWithDupes(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.unionByName(d.where(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  private val docsWithDupesSql =
    """(SELECT * FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
      | FROM documents WHERE doc_id < 20) AS dd""".stripMargin

  // 2024-01-02T00:00:00Z .. 2024-01-05T00:00:00Z
  private val rangeStartMs = 1704153600000L
  private val rangeEndMs = 1704412800000L

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The logsearch
    * pipeline shape over the events table: partition-prunable time filter →
    * content predicate → rollup → ordered output.
    */
  def entry(spark: SparkSession): DataFrame = {
    eventsInRange(spark, "/root/testdata/sf0.001", 1704067200000L, 1704412800000L)
      .where(col("event_type").rlike("^(error|purchase)$"))
      .groupBy((col("ts_ms") / 3600000L).cast("long").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("hour_bucket", "event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- reference query surface (SURVEY §2.3-2.6) -----

    // F1 logcat: time-range-only scan
    "q_cat_timerange" -> ((s, dir) =>
      eventsInRange(s, dir, rangeStartMs, rangeEndMs)
        .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
        .orderBy("event_id")),

    // F2 loggrep: regex find() on content
    "q_grep_regex" -> ((s, dir) =>
      events(s, dir)
        .where(col("props").rlike("\"k\": 4[0-9]"))
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy("event_id")),

    // F2 --i: case-insensitive regex
    "q_grep_regex_ci" -> ((s, dir) =>
      events(s, dir)
        .where(col("event_type").rlike("(?i)^ERROR$"))
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id")),

    // F3 logsearch: literal substring
    "q_search_contains" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(col("text").contains("join"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")),

    // F4 logsearch --i: upper-contains-upper
    "q_search_contains_ci" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(upper(col("text")).contains("JOIN"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")),

    // F5 logmultisearch OR
    "q_multisearch_or" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(Seq("join", "window", "stream").map(col("text").contains(_): Column)
          .reduce(_ || _))
        .select(col("doc_id"))
        .orderBy("doc_id")),

    // F5 logmultisearch AND (--a)
    "q_multisearch_and" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(Seq("join", "filter").map(col("text").contains(_): Column)
          .reduce(_ && _))
        .select(col("doc_id"))
        .orderBy("doc_id")),

    // O1 global sort (Pig ORDER BY analogue)
    "q_sort_global" -> ((s, dir) =>
      eventsInRange(s, dir, rangeStartMs, rangeEndMs)
        .select(col("event_id"), col("value"))
        .orderBy(col("value").desc, col("event_id"))),

    // P2 DateFormatter projection
    "q_dateformat" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          date_format(timestamp_micros(expr("ts DIV 1000")), "yyyy-MM-dd HH:mm:ss")
            .as("ts_str"))
        .orderBy("event_id")),

    // A4 result count
    "q_count_range" -> ((s, dir) =>
      eventsInRange(s, dir, rangeStartMs, rangeEndMs)
        .agg(count(lit(1)).as("n"))),

    // A1 IndexLogs-style rollup
    "q_index_rollup" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(min(col("ts_ms")).as("min_ts_ms"), max(col("ts_ms")).as("max_ts_ms"),
          count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("event_type")),

    // A3 LogStats ingest-over-time (hourly buckets)
    "q_stats_hourly" -> ((s, dir) =>
      events(s, dir)
        .groupBy(expr("ts_ms DIV 3600000").as("hour_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("hour_bucket")),

    // A2 QueryIndex: regex-filtered rollup
    "q_query_index" -> ((s, dir) =>
      events(s, dir)
        .where(col("event_type").rlike("^(err|sign)"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "user_id")),

    // TPC-H Q1 shape: wide aggregation
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Multi-way join with broadcast dims: revenue by nation
    "q_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("n_name")
    }),

    // Window: top-3 events per type by value
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
      events(s, dir)
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select(col("event_type"), col("rank"), col("event_id"), col("value"))
        .orderBy("event_type", "rank")
    }),

    // Sessionization (30-minute gap), lag window + aggregation
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts_ms"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > 1800000L, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // As-of join: each error event matched to the user's most recent prior
    // signup (the operator Spark lacks; composed as union + running window —
    // see graft.ops.AsofJoin; DuckDB oracles it with native ASOF JOIN)
    "q_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
      val err = e.where(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts_ms"))
      val sgn = e.where(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts_ms"))
      graft.ops.AsofJoin.asofJoin(err, sgn, "ts_ms", "ts_ms", Seq("user_id"))
        .select(col("user_id"), col("event_id"),
          col("asof_event_id").as("signup_event_id"),
          (col("ts_ms") - col("asof_ts_ms")).as("ms_since_signup"))
        .orderBy("event_id")
    }),

    // ----- LLM-data-pipeline operators -----

    // Exact dedup via content hash (keep-first + copy counts)
    "q_dedup_exact" -> ((s, dir) =>
      docsWithDupes(s, dir)
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("content_hash")),

    // Exact duplicate pairs (self-join on content hash)
    "q_dupe_pairs_exact" -> ((s, dir) => {
      val d = docsWithDupes(s, dir)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      val a = d.select(col("h"), col("doc_id").as("id_a"))
      val b = d.select(col("h"), col("doc_id").as("id_b"))
      a.join(b, "h").where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),

    // Token counting
    "q_token_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens_raw"),
          size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tokens"))
        .orderBy("doc_id")),

    // Quality metrics (integer counts + exact-integer ratio)
    "q_quality" -> ((s, dir) => {
      val toks = filter(split(col("text"), " "), x => x =!= "")
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len_chars"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_uniq"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"))
        .orderBy("doc_id")
    }),

    // Language stats: labeled language vs a content signal
    "q_lang_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("text").contains("the"), 1).otherwise(0)).as("n_with_the"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
        .orderBy("lang")),

    // Document fingerprinting (hash prefix bucket)
    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          substring(md5(col("text").cast("binary")), 1, 8).as("fp"))
        .orderBy("doc_id")),

    // Language-ID heuristic (stopword-profile argmax) — not SQL-oracled
    "q_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          TextAnalysis.langId(col("text")).as("guessed_lang"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")),

    // Quality score + fingerprint via the ops module — not SQL-oracled
    "q_text_analysis" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.fingerprint(col("text")).as("fp64"),
          TextAnalysis.subwordCountApprox(col("text")).as("n_subwords"))
        .orderBy("doc_id")),

    // MinHash+LSH near-dup pairs — not SQL-oracled (seeded xxhash pipeline)
    "q_minhash_dupes" -> ((s, dir) =>
      Dedup.minhashDupePairs(docsWithDupes(s, dir), "doc_id", "text",
        shingleK = 3, numHashes = 64, bands = 16, threshold = 0.7)
        .orderBy("id_a", "id_b")),

    // SimHash near-dup pairs (custom simhash64 expression)
    "q_simhash_dupes" -> ((s, dir) =>
      Dedup.simhashDupePairs(docsWithDupes(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // Exact n-gram Jaccard on LSH candidates
    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docsWithDupes(s, dir), "doc_id", "text",
        shingleK = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // Brute-force cosine top-k (queries = first 10 vectors, broadcast)
    "q_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN (the scale path)
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(
        emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, planes = 8, probes = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy("query_id", "rank")
    }),

    // IVF ANN: coarse k-means cells + nprobe search (the FAISS-style scale path)
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(
        emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy("query_id", "rank")
    }),

    // Embedding near-dup pairs (augmented with exact copies)
    "q_embed_dupes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val aug = emb.unionByName(emb.where(col("vec_id") < 10)
        .withColumn("vec_id", col("vec_id") + 1000000L))
      Dedup.embeddingDupePairs(aug, "vec_id", "embedding", threshold = 0.99,
        bands = 8, planesPerBand = 8)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),

    // Multimodal plumbing: binary payload → batched feature extraction (stub decode)
    "q_multimodal" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, 200)
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("mime"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f0"))
        .orderBy("media_id")
    }),

    // SimHash signatures themselves (operator output, deterministic)
    "q_simhash_signatures" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), simhash64(TextAnalysis.tokens(col("text"))).as("simhash"))
        .orderBy("doc_id")),

    // The boom container itself under the oracle: events → .bm files →
    // boom scan → rollup must equal DuckDB's direct computation over the
    // original parquet (validates writer+reader byte fidelity end-to-end).
    "q_boom_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("boom-oracle").toString
      events(s, dir)
        .select(col("ts_ms").as("timestamp"),
          concat(col("event_type"), lit(" "), col("props")).as("message"),
          lit(0).as("eventId"),
          col("user_id").as("createTime"),
          col("event_id").as("blockNumber"),
          lit(1L).as("lineNumber"))
        .write.format("boom").mode("append").save(out)
      s.read.format("boom").load(out)
        .agg(count(lit(1)).as("n"),
          min(col("timestamp")).as("min_ts_ms"),
          max(col("timestamp")).as("max_ts_ms"),
          sum(length(col("message"))).cast("long").as("sum_msg_len"),
          sum(col("blockNumber")).as("sum_event_id"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q_cat_timerange" ->
      s"""SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, value FROM events
         | WHERE epoch_ms(ts) >= $rangeStartMs AND epoch_ms(ts) < $rangeEndMs
         | ORDER BY event_id""".stripMargin,
    "q_grep_regex" ->
      """SELECT event_id, event_type, props FROM events
        | WHERE regexp_matches(props, '"k": 4[0-9]') ORDER BY event_id""".stripMargin,
    "q_grep_regex_ci" ->
      """SELECT event_id, event_type FROM events
        | WHERE regexp_matches(event_type, '(?i)^ERROR$') ORDER BY event_id""".stripMargin,
    "q_search_contains" ->
      """SELECT doc_id, lang, n_chars FROM documents
        | WHERE contains(text, 'join') ORDER BY doc_id""".stripMargin,
    "q_search_contains_ci" ->
      """SELECT doc_id, lang FROM documents
        | WHERE contains(upper(text), 'JOIN') ORDER BY doc_id""".stripMargin,
    "q_multisearch_or" ->
      """SELECT doc_id FROM documents
        | WHERE contains(text, 'join') OR contains(text, 'window') OR contains(text, 'stream')
        | ORDER BY doc_id""".stripMargin,
    "q_multisearch_and" ->
      """SELECT doc_id FROM documents
        | WHERE contains(text, 'join') AND contains(text, 'filter')
        | ORDER BY doc_id""".stripMargin,
    "q_sort_global" ->
      s"""SELECT event_id, value FROM events
         | WHERE epoch_ms(ts) >= $rangeStartMs AND epoch_ms(ts) < $rangeEndMs
         | ORDER BY value DESC, event_id""".stripMargin,
    "q_dateformat" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str FROM events
        | ORDER BY event_id""".stripMargin,
    "q_count_range" ->
      s"""SELECT count(*) AS n FROM events
         | WHERE epoch_ms(ts) >= $rangeStartMs AND epoch_ms(ts) < $rangeEndMs""".stripMargin,
    "q_index_rollup" ->
      """SELECT event_type, min(epoch_ms(ts)) AS min_ts_ms, max(epoch_ms(ts)) AS max_ts_ms,
        |   count(*) AS n, round(sum(value), 2) AS sum_value
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stats_hourly" ->
      """SELECT epoch_ms(ts) // 3600000 AS hour_bucket, count(*) AS n,
        |   round(sum(value), 2) AS sum_value
        | FROM events GROUP BY 1 ORDER BY hour_bucket""".stripMargin,
    "q_query_index" ->
      """SELECT event_type, user_id, count(*) AS n FROM events
        | WHERE regexp_matches(event_type, '^(err|sign)')
        | GROUP BY event_type, user_id ORDER BY event_type, user_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |   round(sum(l_quantity), 2) AS sum_qty,
        |   round(sum(l_extendedprice), 2) AS sum_base_price,
        |   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |   count(*) AS count_order
        | FROM lineitem
        | WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        | GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_revenue" ->
      """SELECT n_name,
        |   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |   count(*) AS n_lines
        | FROM lineitem
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_window_topk" ->
      """SELECT event_type, rank, event_id, value FROM (
        |   SELECT event_type, event_id, value,
        |     row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
        |   FROM events)
        | WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        |   SELECT user_id,
        |     CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000 THEN 1 ELSE 0 END AS new_session
        |   FROM (
        |     SELECT user_id, epoch_ms(ts) AS ts_ms,
        |       lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ts
        |     FROM events))
        | GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
         | FROM $docsWithDupesSql GROUP BY md5(text) ORDER BY content_hash""".stripMargin,
    "q_dupe_pairs_exact" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS h FROM $docsWithDupesSql)
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b
         | FROM d a JOIN d b ON a.h = b.h AND a.doc_id < b.doc_id
         | ORDER BY id_a, id_b""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens_raw,
        |   len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        | FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality" ->
      """SELECT doc_id, length(text) AS len_chars,
        |   len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
        |   len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_uniq,
        |   len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))::DOUBLE
        |     / len(list_filter(string_split(text, ' '), x -> x <> '')) AS ttr
        | FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |   CAST(sum(CASE WHEN contains(text, 'the') THEN 1 ELSE 0 END) AS BIGINT) AS n_with_the,
        |   min(n_chars) AS min_chars, max(n_chars) AS max_chars
        | FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, substr(md5(text), 1, 8) AS fp FROM documents
        | ORDER BY doc_id""".stripMargin,
    "q_asof_join" ->
      """WITH err AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events WHERE event_type = 'error'),
        |      sgn AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events WHERE event_type = 'signup')
        | SELECT err.user_id, err.event_id, sgn.event_id AS signup_event_id,
        |   err.ts_ms - sgn.ts_ms AS ms_since_signup
        | FROM err ASOF JOIN sgn ON err.user_id = sgn.user_id AND err.ts_ms >= sgn.ts_ms
        | ORDER BY err.event_id""".stripMargin,
    "q_boom_roundtrip" ->
      """SELECT count(*) AS n, min(epoch_ms(ts)) AS min_ts_ms, max(epoch_ms(ts)) AS max_ts_ms,
        |   CAST(sum(length(event_type || ' ' || props)) AS BIGINT) AS sum_msg_len,
        |   CAST(sum(event_id) AS BIGINT) AS sum_event_id
        | FROM events""".stripMargin)
}
