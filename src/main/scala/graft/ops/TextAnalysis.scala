package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, language
  * ID, quality scoring, fingerprinting. All pure `Column` compositions
  * (codegen'd, shuffle-free, scale-independent) — each runs as a narrow
  * map over the documents table no matter the data size.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased, empties dropped. Fused native expression
    * ([[graft.functions.Tokenize]]) — identical output to
    * `filter(split(lower(text), "\\s+"), _ != "")` without running the regex
    * engine per row; this stage feeds every shingle/minhash/langid pipeline.
    */
  def tokens(text: Column): Column =
    graft.functions.TextFunctions.tokenize(text)

  /** Simple whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Vocabulary growth curve (Heaps' law audit): distinct-type count and
    * token volume, cumulative over the corpus in `bucketSize`-document
    * buckets of ascending doc id. The NAIVE formulation — "for each
    * prefix, count distinct tokens" — rescans the corpus per checkpoint;
    * this one is two linear aggregations total: a type first APPEARS at
    * min(doc id) over its occurrences, so per-bucket new-type counts are a
    * groupBy over the (token → min id) table, and the cumulative curve is
    * a running sum over the BUCKET table only (corpus_size/bucketSize
    * rows — the unpartitioned window runs on the already-aggregated tiny
    * table, never on corpus rows). Output: (bucket, n_docs, n_tokens,
    * new_types, cum_tokens, cum_types) — cum_types vs cum_tokens is the
    * Heaps curve V(n) ≈ K·n^β; a corpus whose curve flattens abnormally
    * fast is duplicate-heavy (type exhaustion), one that stays linear is
    * noise/UUID-heavy. Both diagnostics read off this table.
    */
  def vocabGrowth(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bucketSize: Long = 100L): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    val toks = docs.select(col(idCol).cast("long").as("id"),
      tokens(col(textCol)).as("__t"))
    val perDoc = toks.select(col("id"), explode(col("__t")).as("tok"))
    val firstSeen = perDoc.groupBy("tok").agg(min("id").as("first_id"))
    val newTypes = firstSeen
      .groupBy(expr(s"first_id DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val volume = toks
      .groupBy(expr(s"id DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(size(col("__t"))).as("n_tokens"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    volume.join(newTypes, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("cum_types", sum("new_types").over(w))
  }

  /** BPE-ish subword count approximation: maximal letter runs, digit runs,
    * and other-non-space runs each count as one pretoken (the GPT-2-style
    * pretoken split approximated as run extraction). Run-extraction (rather
    * than lookaround splitting) keeps the pattern expressible in every
    * linear-time regex engine (RE2 et al.), which also makes the operator
    * SQL-oracle-able.
    */
  def subwordCountApprox(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]+"), lit(0)))

  /** Stopword profiles for the language-ID heuristic (top function words;
    * public-knowledge lists).
    */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "un", "una", "para", "en"),
    "ru" -> Seq("и", "в", "не", "на", "что", "это", "с", "по", "как", "из"))

  /** Per-language stopword-hit score columns. */
  def langScores(text: Column): Map[String, Column] = {
    val toks = tokens(text)
    StopwordProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
  }

  /** Function-word seed lists for the character-trigram language profiles —
    * the most frequent function words of each language (public knowledge;
    * supersets of [[StopwordProfiles]]). The TRIGRAMS of these words are
    * the model: trigram weight = its occurrence count across the padded
    * word list, so morphology ("einer" carries "ein"), clitics, and
    * punctuation-attached forms still score where whole-token matching
    * misses. Lists are data, not code — extend per deployment.
    */
  val NgramProfileWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that", "for",
      "was", "on", "are", "as", "with", "they", "this", "have", "from",
      "not", "what", "all", "were", "when", "your", "which", "their",
      "there", "said"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "einer", "einem", "mit", "für", "auf", "sie", "wir", "ich", "sind",
      "von", "dem", "den", "des", "zu", "aber", "auch", "nach", "bei",
      "über", "wenn", "durch", "werden"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "pour",
      "dans", "que", "qui", "sur", "avec", "ne", "se", "ce", "il", "elle",
      "nous", "vous", "ils", "sont", "aux", "du", "des", "plus", "mais",
      "comme", "tout"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "no", "un", "una",
      "para", "en", "de", "que", "se", "por", "con", "su", "al", "lo",
      "como", "pero", "sus", "esta", "entre", "cuando", "hasta", "sobre",
      "desde", "porque"),
    "ru" -> Seq("и", "в", "не", "на", "что", "это", "с", "по", "как", "из",
      "у", "за", "от", "так", "же", "он", "она", "мы", "вы", "они", "был",
      "была", "для", "или", "при", "его", "чтобы", "только", "есть",
      "вот"))

  /** Trigram derivation shared by the profile tables: each word padded
    * as `_word_`, every 3-codepoint window collected, weight = window
    * occurrence count within the list.
    */
  def trigramProfileFromWords(words: Seq[String]): Seq[(String, Int)] = {
    val grams = words.flatMap { w =>
      val p = s"_${w}_"
      val cps = p.codePoints().toArray
      (0 to cps.length - 3).map(i => new String(cps, i, 3))
    }
    grams.groupBy(identity).view
      .map { case (g, gs) => (g, gs.size) }.toSeq.sortBy(_._1)
  }

  /** Corpus-level trigram extensions (r14): the most-frequent character
    * trigrams of each language's GENERAL text — inflectional suffixes,
    * characteristic clusters, orthographic signatures — the public
    * knowledge a Wikipedia-scale frequency table encodes, beyond the
    * function words [[NgramProfileWords]] covers. This is what carries
    * short or content-word-only texts ("programming languages",
    * "schönen Häusern") that contain no function word at all; it also
    * adds the `zh` profile the function-word approach structurally
    * cannot express (no spaces, no inflected function words — the
    * signal is frequent character SEQUENCES). Weights are rank-coded
    * small ints with per-language totals balanced (≈ 23–24) so no
    * language buys argmax mass from sheer list size; '_' is the
    * normalized-whitespace marker, as everywhere in this model.
    */
  val NgramProfileExtras: Map[String, Seq[(String, Int)]] = Map(
    "en" -> Seq("ing" -> 3, "ion" -> 2, "tio" -> 2, "ati" -> 2,
      "ed_" -> 2, "ly_" -> 2, "th_" -> 2, "ere" -> 2, "her" -> 2,
      "igh" -> 1, "ght" -> 1, "ous" -> 1, "sh_" -> 1, "ck_" -> 1),
    "de" -> Seq("sch" -> 3, "ich" -> 3, "cht" -> 2, "ung" -> 2,
      "eit" -> 2, "gen" -> 2, "ern" -> 2, "den" -> 2, "ben" -> 1,
      "ver" -> 1, "äch" -> 1, "üch" -> 1, "ße_" -> 1),
    "fr" -> Seq("ent" -> 2, "ait" -> 2, "ais" -> 2, "eur" -> 2,
      "oir" -> 2, "eau" -> 2, "aux" -> 2, "eux" -> 2, "ée_" -> 2,
      "té_" -> 2, "çon" -> 1, "ça_" -> 1, "été" -> 1, "és_" -> 1,
      "ouv" -> 1),
    "es" -> Seq("ció" -> 3, "ión" -> 3, "ado" -> 2, "ida" -> 2,
      "aci" -> 2, "nte" -> 2, "est" -> 2, "ien" -> 2, "mos" -> 2,
      "ña_" -> 1, "ño_" -> 1, "eña" -> 1, "año" -> 1),
    "ru" -> Seq("ого" -> 3, "ние" -> 3, "его" -> 2, "ать" -> 2,
      "ств" -> 2, "ост" -> 2, "ть_" -> 2, "ый_" -> 2, "ова" -> 2,
      "ция" -> 1, "ая_" -> 1, "про" -> 1, "ени" -> 1),
    "zh" -> Seq("的时候" -> 3, "我们的" -> 3, "是一个" -> 2, "这样的" -> 2,
      "有一个" -> 2, "在这里" -> 2, "不知道" -> 2, "的一个" -> 2,
      "一个人" -> 2, "中国人" -> 2, "也不会" -> 1, "就是说" -> 1))

  /** Character-trigram profiles: the function-word derivation
    * ([[trigramProfileFromWords]] over [[NgramProfileWords]]) MERGED
    * with the corpus-frequency extensions ([[NgramProfileExtras]]) —
    * weights sum where a gram appears in both. Sorted for a stable
    * literal order — the oracle SQL interpolates exactly these
    * (gram, lang, weight) rows as a VALUES table, so both engines score
    * from the identical model and a profile change can never desync
    * them.
    */
  val NgramProfiles: Map[String, Seq[(String, Int)]] = {
    val base = NgramProfileWords.view
      .mapValues(trigramProfileFromWords).toMap
    (base.keySet ++ NgramProfileExtras.keySet).map { lang =>
      val merged = (base.getOrElse(lang, Nil) ++
        NgramProfileExtras.getOrElse(lang, Nil))
        .groupBy(_._1).view
        .map { case (g, ws) => (g, ws.map(_._2).sum) }.toSeq.sortBy(_._1)
      lang -> merged
    }.toMap
  }

  /** Heuristic language guess, character-trigram model (the cld2/fastText
    * public technique): argmax over integer trigram-weight dot products,
    * `und` (undetermined) on zero score, ties to the lexicographically
    * LARGER language code — the same argmax convention the stopword
    * variant used, so oracles keep their shape. One fused native pass
    * ([[graft.functions.NgramLangIdExpression]]): normalize (lowercase,
    * whitespace→'_', padded), slide a 3-codepoint window, accumulate
    * matched weights. Beats [[langIdStopwords]] on short texts, inflected
    * function words, and punctuation-attached tokens (specced deltas).
    */
  def langId(text: Column): Column =
    graft.functions.LangIdFunctions.ngram_lang_id(text, NgramProfiles)

  /** The legacy whole-token stopword-argmax guess (round ≤ 12 semantics):
    * one token pass updates per-profile seen-masks, argmax distinct hits.
    * Kept for callers whose pipelines calibrated against it; [[langId]]
    * (trigram model) supersedes it everywhere else.
    */
  def langIdStopwords(text: Column): Column =
    graft.functions.LangIdFunctions.lang_id(tokens(text), StopwordProfiles)

  /** Dictionary tags occurring in `text` (distinct, sorted) — one-pass
    * Aho-Corasick multi-pattern substring match (taxonomy/badword/topic
    * tagging with large phrase dictionaries), exactly equivalent to — but
    * one text scan instead of |dict| scans of — the composed
    * `filter(dict, t -> contains(text, t))` form. See
    * [[graft.functions.AhoCorasickOps]].
    */
  def tagKeywords(text: Column, terms: Seq[String]): Column =
    graft.functions.KeywordTagFunctions.keyword_tags(text, terms)

  /** Quality metrics struct: character/token counts, type-token ratio,
    * alpha/punct/digit character fractions, mean token length, stopword
    * fraction — the usual cheap pre-training quality filters.
    */
  def qualityMetrics(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nTokens = size(toks)
    val nAlpha = length(regexp_replace(text, "[^\\p{L}]", ""))
    val nDigit = length(regexp_replace(text, "[^0-9]", ""))
    val nPunct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    val nUniq = size(array_distinct(toks))
    val enStops = array(StopwordProfiles("en").map(lit): _*)
    val nStop = size(array_intersect(toks, enStops))
    struct(
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      nUniq.as("n_uniq_tokens"),
      round(nUniq.cast("double") / greatest(nTokens, lit(1)), 4).as("type_token_ratio"),
      round(nAlpha.cast("double") / greatest(nChars, lit(1)), 4).as("alpha_frac"),
      round(nDigit.cast("double") / greatest(nChars, lit(1)), 4).as("digit_frac"),
      round(nPunct.cast("double") / greatest(nChars, lit(1)), 4).as("punct_frac"),
      round(nChars.cast("double") / greatest(nTokens, lit(1)), 2).as("mean_token_len"),
      (nStop > 0).as("has_en_stopwords"))
  }

  /** Overall [0,1] quality score (weights are heuristic). Deliberately
    * UNROUNDED: every term is a ratio of exact integers and every operation
    * is IEEE double arithmetic, so the value is bit-identical in any engine —
    * whereas decimal-rounding a non-decimal double is engine-specific at
    * ties (BigDecimal-of-shortest-string vs exact-binary rounding).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val alphaFrac = length(regexp_replace(text, "[^\\p{L}]", "")).cast("double") /
      greatest(length(text), lit(1))
    val ttr = size(array_distinct(toks)).cast("double") / greatest(size(toks), lit(1))
    val enStops = array(StopwordProfiles("en").map(lit): _*)
    least(lit(1.0), alphaFrac * 0.5 + ttr * 0.3 +
      when(size(array_intersect(toks, enStops)) > 0, 0.2).otherwise(0.0))
  }

  /** Text normalization: Unicode NFC (custom codegen'd expression with an
    * ASCII no-copy fast path — [[graft.functions.NfcNormalize]]), control
    * characters stripped (explicit byte ranges, so the identical pattern
    * runs in any linear-time regex engine), space/tab runs collapsed, ends
    * trimmed. The standard cleanup before hashing/dedup: byte-different
    * encodings of the same visible text otherwise defeat exact-hash and
    * shingle dedup. Narrow, shuffle-free.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        graft.functions.TextFunctions.nfc_normalize(text),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[ \\t]+", " "))

  /** PII scrubbing patterns (applied in order — emails before digit runs so
    * user123@x.com doesn't half-redact). Deliberately lookaround-free so the
    * exact same patterns run in any linear-time regex engine (RE2 et al.),
    * which keeps the operator SQL-oracle-able.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\b\\d{9,}\\b", "<NUM>"))

  /** Redact common PII shapes (emails, IPv4s, long digit runs) — the
    * standard pre-training scrub pass; pure narrow `Column` work.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Corpus token frequencies — vocabulary statistics for training-data
    * curation (stopword discovery, boilerplate detection, tokenizer QA).
    * One explode + one count aggregation; partial aggregation absorbs the
    * per-document token fan-out map-side, so the shuffle carries one row per
    * distinct token per task.
    */
  def tokenFrequencies(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))

  /** Word n-grams, NON-distinct, empty when fewer than n tokens (unlike
    * [[shinglesFromTokens]], which degrades to the whole text — repetition
    * statistics need the raw occurrence list, not a set).
    */
  def ngramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Gopher-style repetition signals per document: duplicate-token fraction
    * and the occurrence count/fraction of the most frequent word n-gram
    * (Rae et al. 2021 §A1.1's "repetition" filters — high values mark
    * degenerate/boilerplate text that poisons training data).
    *
    * Narrow, shuffle-free: the most-frequent-gram count is the longest run
    * in the SORTED gram array, computed with one `aggregate` fold instead of
    * an explode + two aggregations — per-document work stays inside
    * whole-stage codegen no matter the corpus size.
    */
  def repetitionMetrics(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): org.apache.spark.sql.DataFrame = {
    // Grams are 64-bit occurrence hashes (fused NgramHashes — no gram
    // strings are built), so the sort and the run fold work on longs; the
    // string form benched ~3× slower and counts are identical modulo
    // ~1e-10 hash collisions.
    val staged = df
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        graft.functions.TextFunctions.ngram_hashes(col("__t"), n).as("__g"))
    val maxRun: Column = aggregate(
      array_sort(col("__g")),
      struct(lit(Long.MinValue).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    // The sort+fold and array_distinct are the per-row hot path: stage each
    // ONCE and derive the fractions from the staged columns — `aggregate` is
    // a non-codegen higher-order function, so referencing `maxRun` twice in
    // one projection would genuinely run the O(g log g) work twice (subexpr
    // elimination only dedupes inside codegen'd projections).
    staged
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        (size(col("__t")) - size(array_distinct(col("__t"))))
          .cast("long").as("n_dup_tokens"),
        size(col("__g")).cast("long").as("n_grams"),
        maxRun.as("max_gram_count"))
      .select(col(idCol), col("n_tokens"), col("n_dup_tokens"),
        (col("n_dup_tokens").cast("double") /
          greatest(col("n_tokens"), lit(1L))).as("dup_token_frac"),
        col("n_grams"), col("max_gram_count"),
        (col("max_gram_count").cast("double") /
          greatest(col("n_grams"), lit(1L))).as("top_gram_frac"))
  }

  /** Corpus-level n-gram diversity (distinct-n, Li et al. 2016's
    * diversity metric at corpus scope): for each n, total n-gram
    * occurrences, distinct n-grams, and their exact integer ratio — the
    * mode-collapse gauge a SYNTHETIC-data pipeline tracks per generation
    * batch (falling distinct-n across batches = the generator repeating
    * itself, invisible to per-document quality filters because each
    * document looks fine alone).
    *
    * Scale shape: ONE corpus scan for every n at once — each row's token
    * array fans out to an inlined (n, gram-hash) pair stream (grams are
    * 64-bit hashes, the [[repetitionMetrics]] kernel — no gram strings),
    * and one two-phase aggregation keyed (n, hash) computes totals
    * map-side and distincts after the only shuffle, which carries two
    * longs per gram occurrence. No persist, no re-scan per n. Ratios are
    * exact integer divisions of the emitted counts, so any engine
    * replays them bit-for-bit (gram-hash vs gram-string distinct differs
    * only by ~1e-10 collision mass — the q_dup_spans convention).
    *
    * Output: one row per n — (n, total_grams, distinct_grams,
    * distinct_ratio).
    */
  def diversityProfile(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3)): org.apache.spark.sql.DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be >= 1: $ns")
    require(ns.distinct == ns,
      s"duplicate n would double-count its gram stream: $ns")
    df.select(tokens(col(textCol)).as("__t"))
      .select(inline(array(ns.map { n =>
        struct(lit(n).as("n"),
          graft.functions.TextFunctions.ngram_hashes(col("__t"), n)
            .as("ghs"))
      }: _*)))
      .select(col("n"), explode(col("ghs")).as("gh"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("total_grams"),
        countDistinct(col("gh")).as("distinct_grams"))
      .select(col("n"), col("total_grams"), col("distinct_grams"),
        (col("distinct_grams").cast("double") /
          greatest(col("total_grams"), lit(1L))).as("distinct_ratio"))
  }

  /** Per-document Unicode script-mix audit (see
    * [[graft.functions.ScriptProfileOps]] for the range contract): char
    * mass per script class, the letter-script count, and the mixed bit —
    * the homoglyph-spam / wrong-language-boilerplate signal langid alone
    * misses (a Latin document with 40 Cyrillic confusables still scores
    * "en"). One fused codegen pass, shuffle-free.
    */
  def scriptProfile(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val p = graft.functions.TextFunctions.script_profile(col(textCol))
    df.select(col(idCol), p.as("__s"))
      .select(col(idCol) +:
        Seq("n_chars", "latin", "cyrillic", "greek", "cjk", "arabic",
          "digit", "other", "n_scripts", "mixed")
          .map(f => col("__s").getField(f).as(f)): _*)
  }

  /** Self-BLEU diversity probe (Zhu et al. 2018, the Texygen metric):
    * for each PANEL document, BLEU modified n-gram precision against the
    * REST of the corpus as references —
    *
    *   p_n(d) = Σ_g min(c_d(g), max_{d'≠d} c_{d'}(g)) / Σ_g c_d(g)
    *
    * — high self-BLEU = the corpus repeats itself (mode collapse in
    * synthetic data), invisible to per-document filters because each
    * document looks fine alone. Precisions are emitted as exact ppm
    * integer ratios (clipped·10⁶ // total), one row per (doc, n), so any
    * engine replays them bit-for-bit; the geometric-mean/BP combination
    * is left to the reader (it needs exp/ln, which is not in the
    * replayable contract).
    *
    * Scale shape: gram counts per (n, gram, doc) aggregate map-side; the
    * leave-one-out reference max uses the (max1, count-at-max, max2)
    * decomposition — max_{d'≠d} c_{d'} = max2 iff d is the UNIQUE argmax
    * — so no per-(panel-doc × gram) re-scan exists, just one stats table
    * keyed by gram joined to the panel's own gram counts. Gram strings
    * ride the shuffle once; the panel side is bounded by the panel.
    */
  def selfBleu(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      panel: Column,
      ns: Seq[Int] = Seq(1, 2)): org.apache.spark.sql.DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1) && ns.distinct == ns,
      s"ns must be distinct and >= 1: $ns")
    val toks = df.select(col(idCol).cast("long").as("id"), panel.as("__p"),
      tokens(col(textCol)).as("__t"))
    val grams = toks.select(col("id"), col("__p"),
        inline(array(ns.map { n =>
          struct(lit(n).as("n"),
            (if (n == 1) col("__t")
             else when(size(col("__t")) >= n,
               transform(sequence(lit(0), size(col("__t")) - n),
                 i => array_join(slice(col("__t"), i + 1, lit(n)), " ")))
               .otherwise(array().cast("array<string>")))
              .as("gs"))
        }: _*)))
      .where(size(col("gs")) > 0)
      .select(col("id"), col("__p"), col("n"), explode(col("gs")).as("g"))
    val gc = grams.groupBy(col("n"), col("g"), col("id"), col("__p"))
      .agg(count(lit(1)).as("c"))
    val m1 = gc.groupBy(col("n"), col("g")).agg(max(col("c")).as("max1"))
    val stats = gc.join(m1, Seq("n", "g"))
      .groupBy(col("n"), col("g"), col("max1"))
      .agg(sum((col("c") === col("max1")).cast("long")).as("n_at_max"),
        max(when(col("c") < col("max1"), col("c"))).as("max2"))
    gc.where(col("__p"))
      .join(stats, Seq("n", "g"))
      .select(col("id"), col("n"), col("c"),
        least(col("c"),
          when(col("c") === col("max1") && col("n_at_max") === 1,
            coalesce(col("max2"), lit(0L)))
            .otherwise(col("max1"))).as("__clip"))
      .groupBy(col("id").as("doc_id"), col("n"))
      .agg(sum(col("c")).as("total"), sum(col("__clip")).as("clipped"))
      .select(col("doc_id"), col("n"), col("total"), col("clipped"),
        expr("(clipped * 1000000) DIV total").as("p_ppm"))
  }

  /** Gopher's character-level repetition table (Rae et al. 2021 §A1.1,
    * rows "top n-gram chars" / "duplicated n-gram chars"): for each n in
    * `topNs` the char-mass fraction of the dominant repeated n-gram, for
    * each n in `dupNs` the fraction of characters inside ≥2-occurring
    * n-grams. One fused O(m) kernel per n
    * ([[graft.functions.RepetitionProfile]]) over ONE staged token array —
    * narrow, shuffle-free, integer-exact ratios (see the kernel doc for
    * the count-tie variant). Complements [[repetitionMetrics]]' count-level
    * signals with Gopher's char-level ones.
    */
  def repetitionProfile(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 10)): org.apache.spark.sql.DataFrame = {
    require(topNs.nonEmpty || dupNs.nonEmpty, "need at least one n")
    val ns = (topNs ++ dupNs).distinct.sorted
    val staged = df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol) +: ns.map(n =>
        graft.functions.TextFunctions.repetition_profile(col("__t"), n)
          .as(s"__p$n")): _*)
    val total = col(s"__p${ns.head}.total_chars")
    val denom = greatest(total, lit(1L))
    staged.select(
      col(idCol) +: total.cast("long").as("total_chars") +:
        (topNs.sorted.map(n =>
          (col(s"__p$n.top_mass").cast("double") / denom)
            .as(s"top_${n}gram_char_frac")) ++
          dupNs.sorted.map(n =>
            (col(s"__p$n.dup_cover_chars").cast("double") / denom)
              .as(s"dup_${n}gram_char_frac"))): _*)
  }

  /** Gopher-style document quality filter (Rae et al. 2021 §A1.1): word
    * count bounds, mean word length bounds, minimum fraction of words with
    * an alphabetic character, minimum distinct-stopword hits. Emits the
    * per-rule measurements plus the final `keep` verdict so a pipeline can
    * audit WHY a document was dropped. Pure narrow column work.
    */
  def gopherFilter(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): org.apache.spark.sql.DataFrame = {
    val staged = df.select(col(idCol), tokens(col(textCol)).as("__t"))
    val n = size(col("__t"))
    val meanLen = aggregate(col("__t"), lit(0L), (a, x) => a + length(x))
      .cast("double") / greatest(n, lit(1))
    val alphaFrac = size(filter(col("__t"), x => x.rlike("\\p{L}")))
      .cast("double") / greatest(n, lit(1))
    val stopHits = size(array_intersect(col("__t"),
      array(StopwordProfiles("en").map(lit): _*)))
    staged.select(col(idCol),
      n.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.cast("long").as("stop_hits"),
      (n >= minWords && n <= maxWords &&
        meanLen >= minMeanLen && meanLen <= maxMeanLen &&
        alphaFrac >= minAlphaFrac && stopHits >= minStopHits).as("keep"))
  }

  /** StarCoder-style code-quality filter (Li et al. 2023 §3.1 /
    * SantaCoder data prep, Allal et al. 2023): the line-geometry and
    * character-class rules that catch minified bundles, auto-generated
    * files, and embedded data blobs masquerading as code — the code
    * corpus's analogue of [[gopherFilter]]. Emits per-rule measurements
    * plus the `keep` verdict so a pipeline can audit WHY a file dropped:
    *
    *  - `avg_line_len` ≤ maxAvgLineLen and `max_line_len` ≤ maxMaxLineLen
    *    (minified/one-line bundles),
    *  - `alnum_frac` ≥ minAlnumFrac (binary/art/data blobs),
    *  - `hex_token_frac` ≤ maxHexFrac (hex dumps, packed assets: the
    *    fraction of whitespace tokens that are ≥ 8-char pure-hex runs),
    *  - no auto-generation marker ("auto-generated", "do not edit", …).
    *
    * Determinism: every measurement is exact int64 arithmetic (the line
    * mass is length − (n_lines − 1), no per-line re-sum; alnum count via
    * an ASCII-class regexp strip) divided once as IEEE doubles — any
    * engine replays the verdicts bit-for-bit. Pure narrow column work,
    * codegen'd end to end except the single bounded `filter` HOF over
    * the token array.
    */
  def codeFilter(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      maxAvgLineLen: Double = 100.0,
      maxMaxLineLen: Int = 1000,
      minAlnumFrac: Double = 0.25,
      maxHexFrac: Double = 0.4): org.apache.spark.sql.DataFrame = {
    val staged = df.select(col(idCol), col(textCol),
      tokens(col(textCol)).as("__t"),
      split(col(textCol), "\n").as("__lines"))
    val nChars = length(col(textCol)).cast("long")
    val nLines = size(col("__lines")).cast("long")
    val lineMass = nChars - (nLines - 1L)
    val avgLine = lineMass.cast("double") /
      greatest(nLines, lit(1L)).cast("double")
    val maxLine = coalesce(
      array_max(transform(col("__lines"), x => length(x))), lit(0))
      .cast("long")
    val alnum = length(
      regexp_replace(col(textCol), "[^A-Za-z0-9]", "")).cast("long")
    val alnumFrac = alnum.cast("double") /
      greatest(nChars, lit(1L)).cast("double")
    val nTokens = size(col("__t")).cast("long")
    val hexTokens = size(filter(col("__t"),
      x => x.rlike("^[0-9a-f]{8,}$"))).cast("long")
    val hexFrac = hexTokens.cast("double") /
      greatest(nTokens, lit(1L)).cast("double")
    val lowered = lower(col(textCol))
    val autogen = (lowered.contains("auto-generated") ||
      lowered.contains("autogenerated") ||
      lowered.contains("do not edit") ||
      lowered.contains("generated by"))
    staged.select(col(idCol),
      nLines.as("n_lines"),
      avgLine.as("avg_line_len"),
      maxLine.as("max_line_len"),
      alnumFrac.as("alnum_frac"),
      hexFrac.as("hex_token_frac"),
      autogen.cast("int").as("autogen"),
      (avgLine <= maxAvgLineLen && maxLine <= maxMaxLineLen &&
        alnumFrac >= minAlnumFrac && hexFrac <= maxHexFrac && !autogen)
        .cast("int").as("keep"))
  }

  /** Feature-hash (hashing-trick) bag-of-words: each token lands in
    * `dim` buckets via a salted-free md5 slot with a ±1 sign bit
    * (Weinberger et al. 2009 — the sign unbiases collisions), producing a
    * signed count per (doc, slot). Long form `(id, idx, count)`, zero
    * slots dropped — integer-exact, so an independent engine reproduces
    * it bit-for-bit (md5 is byte-identical everywhere, the
    * [[Curation.hashUniform]] precedent).
    *
    * This is the model-free text→vector bridge: feed
    * [[featureHashVectors]]' dense form to [[Similarity.knnGraph]],
    * [[SemDedup]], or the ANN family when no learned embeddings exist.
    * Pure explode + one map-side-combined aggregation; no UDF, no fused
    * kernel needed — the md5/conv/substring chain is all built-ins.
    */
  def featureHashCounts(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64): org.apache.spark.sql.DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val w = col("__w")
    val hex = md5(w.cast("binary"))
    df.select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .select(col(idCol),
        (conv(substring(hex, 1, 13), 16, 10).cast("long") % dim).as("idx"),
        when(conv(substring(hex, 14, 1), 16, 10).cast("long") % 2 === 0, 1L)
          .otherwise(-1L).as("__s"))
      .groupBy(col(idCol), col("idx"))
      .agg(sum(col("__s")).as("count"))
      .where(col("count") =!= 0L)
  }

  /** Dense form of [[featureHashCounts]]: `(id, vec array<double>)` with
    * zero-filled slots, L2-normalized when `normalize` (division and sqrt
    * are exactly-rounded IEEE ops, so even the normalized form is
    * engine-reproducible). Documents with no surviving slots (empty or
    * fully-cancelled) emit the zero vector.
    */
  def featureHashVectors(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64,
      normalize: Boolean = true): org.apache.spark.sql.DataFrame = {
    val dense = featureHashCounts(df, idCol, textCol, dim)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("count"))))
        .as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double"))
          .as("vec"))
    val withAll = df.select(col(idCol)).distinct()
      .join(dense, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("vec"),
          array_repeat(lit(0.0), dim)).as("vec"))
    if (!normalize) withAll
    else {
      val norm = sqrt(aggregate(col("vec"), lit(0.0), (a, x) => a + x * x))
      withAll.select(col(idCol),
        when(norm > 0.0, transform(col("vec"), x => x / norm))
          .otherwise(col("vec")).as("vec"))
    }
  }

  /** Word k-shingles over an already-materialized token-array column.
    *
    * IMPORTANT staging note: pass an *attribute* (a selected column), not the
    * `tokens(text)` expression — inlining a non-trivial expression here makes
    * every shingle re-derive it (Catalyst doesn't CSE inside higher-order
    * lambdas). See [[Dedup.minhashDupePairs]] for the staged pattern.
    */
  def shinglesFromTokens(toks: Column, k: Int = 3): Column =
    // 0 tokens → 0 shingles (mirrors ShingleOps.shingleHashes: empty docs
    // must not share a phantom gram); 1..k-1 tokens → the whole sequence
    // as one shingle.
    when(size(toks) === 0, array().cast("array<string>"))
      .when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** Word k-shingles of the text (small-expression convenience; for hot paths
    * stage via [[shinglesFromTokens]]).
    */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesFromTokens(tokens(text), k)

  /** Distinct 64-bit shingle hashes — the input to minhash. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    array_distinct(transform(shingles(text, k), s => xxhash64(s)))

  /** Distinct shingle hashes from a materialized shingle-strings column. */
  def shingleHashesFromShingles(shingleStrs: Column): Column =
    array_distinct(transform(shingleStrs, s => xxhash64(s)))

  /** Rolling-content fingerprint: stable 64-bit hash of the token stream
    * (whitespace-normalization-invariant, unlike hashing the raw text).
    */
  def fingerprint(text: Column): Column = xxhash64(concat_ws(" ", tokens(text)))

  /** Winnowing fingerprint SET (rolling k-gram hashes → sliding-window
    * minima, Schleimer et al. 2003): any shared run of ≥ w + k − 1 tokens
    * between two documents guarantees a shared fingerprint, so containment /
    * partial-overlap detection works where whole-document hashing can't.
    * Compare sets with [[graft.functions.TextFunctions.jaccard_sets]].
    */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    graft.functions.TextFunctions.winnow_fingerprints(tokens(text), k, w)

  /** Per-document unigram entropy (a classic quality/diversity signal:
    * low entropy ⇒ repetitive or templated text; pairs with
    * [[repetitionMetrics]]'s n-gram view). INTEGERIZED per the
    * [[graft.functions.EntropyOps]] policy — per-term contributions round
    * to int64 BEFORE the sum, so the result is order-independent and
    * engine-replayable; entropy_scaled = 10⁶ × Shannon entropy in nats.
    * One fused hash-count pass per row (native expression, codegen'd):
    * ZERO shuffles — the explode→groupBy(doc, term)→groupBy(doc)
    * formulation shuffles the corpus twice for the same answer.
    *
    * Output: (id, n_tokens, n_distinct, entropy_scaled); empty/null text
    * reports zeros.
    */
  def docEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__t"))
      .select(col("id"),
        graft.functions.EntropyFunctions.token_entropy(col("__t")).as("__e"))
      .select(col("id").as(idCol),
        coalesce(col("__e.n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("__e.n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("__e.entropy_scaled"), lit(0L)).as("entropy_scaled"))

  /** Per-slice CONDITIONAL entropy rate H(wₙ | wₙ₋₁) — the compressibility
    * proxy [[docEntropy]]'s unigram view structurally misses: alternating
    * boilerplate ("a b a b …") has MAXIMAL unigram entropy but zero
    * conditional entropy (every context determines its successor), which
    * is exactly the templated-text signal a curation pipeline wants
    * (low H(Y|X) at high H(Y) ⇒ machine-generated / boilerplate slices).
    * Identity used: H(Y|X) = (Σ_x c_x ln c_x − Σ_xy c_xy ln c_xy) / N
    * over bigram counts c_xy and context totals c_x = Σ_y c_xy, N = Σ c_xy.
    *
    * Integerization per the [[docEntropy]] policy: each ln term rounds to
    * ⌊10⁶·c·ln c⌉ BEFORE summation, so the sums are order-independent
    * integers and any engine replays them; the output is
    * `cond_entropy_scaled = (S₀ − S₁) DIV N` — 10⁶ × nats (floored).
    *
    * Scale shape: one token pass explodes (slice, w1, w2) bigrams into a
    * map-side-combined count shuffle, then the aggregates CHAIN as three
    * strictly narrowing groupBys — (slice,w1,w2) → (slice,w1) → slice —
    * because every bigram term of S₁ belongs to exactly one context, so
    * its partial sum folds into the context row. One lineage, no
    * persist(), no join, no second scan of the bigram-type table: the r15
    * formulation cached the full bigram table (corpus-scale at sf100) and
    * scanned it twice for s1/s0, and that cache's fit-or-thrash behavior
    * was exactly the 40-77 s run-to-run band in SCALING's fourth-decade
    * row. Slices with < 1 bigram emit nothing.
    *
    * @return (slice, n_bigrams, n_bigram_types, n_contexts,
    *         cond_entropy_scaled).
    */
  def conditionalEntropyRate(
      df: DataFrame,
      sliceCol: Column,
      textCol: Column): DataFrame = {
    val staged = df.select(sliceCol.as("slice"), tokens(textCol).as("__t"))
      .where(size(col("__t")) >= 2)
    val bi = staged.select(col("slice"),
        explode(transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2")))).as("__b"))
      .groupBy(col("slice"), col("__b.w1").as("w1"),
        col("__b.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val ctx = bi.groupBy(col("slice"), col("w1"))
      .agg(sum(col("c")).as("cx"),
        count(lit(1)).as("n_types"),
        sum(expr("CAST(round(1000000.0 * c * ln(c)) AS BIGINT)")).as("__s1p"))
    ctx.groupBy("slice")
      .agg(sum(col("cx")).as("n_bigrams"),
        sum(col("n_types")).as("n_bigram_types"),
        count(lit(1)).as("n_contexts"),
        sum(col("__s1p")).as("__s1"),
        sum(expr("CAST(round(1000000.0 * cx * ln(cx)) AS BIGINT)"))
          .as("__s0"))
      .select(col("slice"), col("n_bigrams"), col("n_bigram_types"),
        col("n_contexts"),
        expr("(__s0 - __s1) DIV n_bigrams").as("cond_entropy_scaled"))
  }

  /** Sentence-level language mix (code-switching profile): run [[langId]]
    * per SENTENCE and report, per document, the sentence count, the
    * dominant language (most sentences; ties to the lexicographically
    * smaller tag), how many sentences it covers, and an `is_mixed` bit —
    * the signal that separates genuinely multilingual documents from
    * mislabeled ones, which document-level language ID averages away
    * (one English paragraph in a German page flips neither the doc-level
    * vote nor any stopword ratio, but curation pipelines routing by
    * language need to know).
    *
    * Shape: sentence split and per-sentence language ID are one narrow
    * fused pass ([[graft.functions.LangIdExpression]] per exploded
    * sentence); the only exchanges carry (id, lang-tag) pairs — never
    * text. The per-doc argmax is `min(struct(−count, lang))` — no window.
    * Documents with no sentences (empty text) emit nothing. Every output
    * column is a count or a deterministic vote, so the whole profile is
    * SQL-replayable.
    */
  def sentenceLangMix(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol).as("__id"),
        explode(Dedup.sentences(col(textCol))).as("__s"))
      .select(col("__id"), langId(col("__s")).as("__sl"))
      .groupBy("__id", "__sl").agg(count(lit(1)).as("__c"))
    counts.groupBy("__id")
      .agg(sum(col("__c")).as("n_sentences"),
        min(struct((-col("__c")).as("nc"), col("__sl").as("sl"))).as("__top"))
      .select(col("__id").as(idCol), col("n_sentences"),
        col("__top.sl").as("dominant_lang"),
        (-col("__top.nc")).as("n_dominant"),
        ((-col("__top.nc")) < col("n_sentences")).cast("int").as("is_mixed"))
  }

  /** Readability profile: Flesch reading ease + Flesch–Kincaid grade from
    * three EXACT integer counts — whitespace words, sentence-punctuation
    * runs (min 1: an unpunctuated doc is one sentence), and the classic
    * vowel-group syllable heuristic (maximal `[aeiouy]+` runs over the
    * lowercased text; word boundaries never merge runs, so one regexp
    * count over the whole document equals the per-word sum). The curation
    * use: grade-level mixing targets and too-simple/too-noisy cutoffs,
    * next to [[gopherFilter]]'s structural rules.
    *
    * Determinism: the counts are integers, and both scores apply the
    * published coefficients in ONE fixed expression shape over exact
    * int64 ratios — IEEE double division/multiply/subtract of identical
    * operands is correctly rounded, so any engine replaying the same tree
    * matches bit-for-bit (the [[graft.ops.Curation.temperatureMix]]
    * argument). Empty/whitespace-only docs report zero counts and null
    * scores. Narrow, shuffle-free, codegen'd — three regexp passes per
    * row, no UDF.
    */
  def readabilityScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // Whitespace words, as documented: a single-space split undercounted
    // every multi-line document ("sat.\nThe" was one word), skewing both
    // ratios. \s+ matches the oracle's regexp split.
    val words = size(filter(split(t, "\\s+"), x => x =!= "")).cast("long")
    val sentRuns = regexp_count(t, lit("[.!?]+")).cast("long")
    val syl = regexp_count(lower(t), lit("[aeiouy]+")).cast("long")
    df.select(col(idCol), words.as("n_words"), sentRuns.as("__sr"),
        syl.as("n_syllables"))
      .select(col(idCol), col("n_words"),
        when(col("n_words") > 0, greatest(col("__sr"), lit(1L)))
          .otherwise(lit(0L)).as("n_sentences"),
        col("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words"))))
      .withColumn("fk_grade",
        when(col("n_words") > 0,
          lit(0.39) * (col("n_words").cast("double") / col("n_sentences"))
            + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
            - lit(15.59)))
  }

  /** χ² term–label association — the classic feature-selection pass for
    * building a lexical quality/domain classifier (which terms separate
    * label-positive documents from the rest). For every term with document
    * frequency ≥ `minDf`, the 2×2 presence contingency
    *
    *   a = docs with term, label     b = docs with term, ¬label
    *   c = docs w/o term, label      d = docs w/o term, ¬label
    *
    * scores χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)), reported as
    * `chi2_ppm` ≈ ⌊10⁶·χ²⌋ computed ENTIRELY in decimal integer
    * arithmetic via the φ²-bounded order (see the in-body comment): the
    * single-numerator form overflowed DECIMAL(38,0) past ~10⁷ docs; the
    * staged form holds at any corpus, truncating divides stay floor
    * (operands non-negative), and DuckDB's HUGEINT `//` replays every
    * stage exactly. Degenerate margins (a+c = 0 or b+d = 0) score 0 by
    * convention.
    *
    * Scale shape: presence rows are (doc, DISTINCT term) — the label bit
    * rides the projection, so the contingency is ONE map-side-combined
    * aggregation with vocab-bounded output; the corpus totals are a
    * broadcast 1-row frame; `minDf` prunes before the χ² projection; the
    * final top-`topK` is a k-bounded TakeOrdered, never a window.
    */
  def chiSquareTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      minDf: Long = 5L,
      topK: Int = 50): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val pres = docs
      .select(col(idCol), label.cast("int").as("__y"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
    val ct = pres.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("__y")).cast("long").as("a"))
      .where(col("df") >= minDf)
    val totals = docs.agg(count(lit(1)).as("__n"),
      sum(label.cast("int")).cast("long").as("__np"))
    val dec = "decimal(38,0)"
    val a = col("a").cast(dec)
    val b = (col("df") - col("a")).cast(dec)
    val c = (col("__np") - col("a")).cast(dec)
    val d = (col("__n") - col("__np") - col("df") + col("a")).cast(dec)
    val diff = a * d - b * c
    // φ²-bounded evaluation order (the centroidDrift lesson): χ² =
    // N·φ²·10⁶ with φ² = diff²/((a+b)(c+d)(a+c)(b+d)) ≤ 1 computed as
    // ⌊⌊|diff|·10⁶ DIV (a+b)(c+d)⌋·|diff| DIV (a+c)(b+d)⌋ — every
    // intermediate ≤ 10⁶·N², then one long multiply by N (≤ 10⁶·N). The
    // old single-numerator 10⁶·N·diff² overflowed DECIMAL(38,0) past
    // ~10⁷ docs; this form holds to any corpus. Exact 2×2 tables (the
    // spec fixtures) floor identically; general tables shift by ≤ N
    // µ-units — relative error ≤ 1 ppm, and the oracle replays the same
    // recipe bit-for-bit.
    ct.crossJoin(broadcast(totals))
      .select(col("term"), col("df"), col("a").as("n_label"),
        abs(diff).as("__ad"),
        ((a + b) * (c + d)).as("__m1"),
        ((a + c) * (b + d)).as("__m2"),
        col("__n"))
      .select(col("term"), col("df"), col("n_label"),
        when(col("__m1") === 0 || col("__m2") === 0, lit(0L))
          .otherwise(
            expr("(((__ad * 1000000) DIV __m1) * __ad DIV __m2) * __n"))
          .cast("long").as("chi2_ppm"))
      .orderBy(desc("chi2_ppm"), col("term"))
      .limit(topK)
  }

  /** RAKE keyphrase extraction (Rose et al. 2010) — corpus-level keyword
    * phrases without any model: candidate phrases are maximal stopword-free
    * token runs, each scored by the sum of its members' degree/frequency
    * ratios (degree = Σ length of phrases containing the word — words that
    * co-occur inside long content phrases outrank isolated frequent words).
    * Integerized per word as `wscore_ppm = (deg·10⁶) DIV freq` BEFORE the
    * phrase sum, so phrase scores are order-free int64 and SQL-replayable.
    * Phrases longer than `maxPhraseLen` are dropped (the boundedness cap a
    * corpus-scale run needs; RAKE's original corpora rarely exceed 3–4).
    *
    * Scale shape: the phrase-id pass is a per-DOCUMENT running count
    * (windows partition by doc — the sessionize convention, bounded per
    * row group); phrase assembly is one (doc, phrase-id) aggregation;
    * word stats are vocab-bounded; the score join keys members to the
    * vocab-bounded word table; output is a k-bounded TakeOrdered over
    * distinct phrase strings.
    */
  def rakeKeyphrases(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      maxPhraseLen: Int = 4,
      topK: Int = 30): DataFrame = {
    require(stopwords.nonEmpty, "rake needs a stopword list")
    require(maxPhraseLen >= 1 && topK >= 1, "maxPhraseLen/topK must be >= 1")
    val tok = docs
      .select(col(idCol).as("id"), posexplode(tokens(col(textCol))))
      .select(col("id"), col("pos"), col("col").as("w"),
        col("col").isInCollection(stopwords).cast("int").as("__s"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val members = tok
      .withColumn("__pid", sum(col("__s")).over(w))
      .where(col("__s") === 0)
    val phrases = members.groupBy(col("id"), col("__pid"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("w")))),
        e => e.getField("w")), " ").as("phrase"),
        count(lit(1)).as("n_words"))
      .where(col("n_words") <= maxPhraseLen)
    val wordStats = members
      .join(phrases.select(col("id"), col("__pid"), col("n_words")),
        Seq("id", "__pid"))
      .groupBy("w")
      .agg(count(lit(1)).as("__freq"), sum(col("n_words")).as("__deg"))
      .select(col("w"), expr("(__deg * 1000000) DIV __freq").as("__ws"))
    members
      .join(phrases, Seq("id", "__pid"))
      .join(wordStats, Seq("w"))
      .groupBy(col("id"), col("__pid"), col("phrase"), col("n_words"))
      .agg(sum(col("__ws")).as("__score"))
      .groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("__score")).as("score_ppm"))
      .orderBy(desc("score_ppm"), col("phrase"))
      .limit(topK)
  }

  /** Luhn checksum validation (ISO/IEC 7812) of an all-digit string — the
    * mod-10 double-every-second-digit test every real payment-card number
    * passes. The discriminator that turns a 13–19-digit REGEX hit into a
    * credible card detection: phone numbers, timestamps, and ids fail it
    * 90% of the time, so a PII pipeline that Luhn-gates its card redactions
    * keeps recall while dropping an order of magnitude of false positives.
    * Pure Column algebra over the reversed digit string — exact, and
    * replayable in any engine with per-char codepoints.
    */
  def luhnValid(num: Column): Column = {
    val digits = transform(split(reverse(num), ""), (ch, i) => {
      val d = ascii(ch) - lit(48)
      when(i % 2 === 0, d)
        .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
    })
    aggregate(digits, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Per-document card-number scan: candidate tokens (all-digit, 13–19
    * chars, via the engine tokenization) and how many pass [[luhnValid]].
    * Narrow and shuffle-free; the HOF runs over the (few) CANDIDATES per
    * row, never per token, so the interpreted-projection tax is bounded
    * by hit count.
    */
  def cardScan(text: Column): Column = {
    val cands = filter(tokens(text), t => t.rlike("^[0-9]{13,19}$"))
    struct(size(cands).cast("long").as("n_candidates"),
      size(filter(cands, c => luhnValid(c))).cast("long").as("n_valid"))
  }

  /** Vocabulary coverage cutoffs — "how many types cover X% of the token
    * mass": the tokenizer/stopword-sizing dual of [[vocabGrowth]] (Heaps
    * growth says how fast types ARRIVE; this says how few you NEED).
    * For each target in ppm, the smallest vocabulary size V such that the
    * V most frequent types cover ≥ target of all tokens, with ties inside
    * a frequency class interpolated exactly: after whole classes of
    * count c cover mass M with V' types, the cutoff needs
    * r = ⌈(T − M)/c⌉ more types (T = ⌈target·total/10⁶⌉ the integer
    * mass threshold), so `vocab_size` = V' + r and `covered_tokens` =
    * M + r·c — every quantity an exact int64, SQL-replayable.
    *
    * Scale shape: the vocab table never sees a window — type counts
    * collapse to a COUNT HISTOGRAM (one row per distinct frequency,
    * ≤ O(√tokens) rows by sum bound), the running sums order that
    * histogram only (the vocabGrowth convention), and targets join it as
    * a broadcast literal frame. Two map-side-combined aggregations total.
    */
  def vocabCoverage(
      docs: DataFrame,
      textCol: String,
      targetsPpm: Seq[Long] = Seq(900000L, 950000L, 990000L)): DataFrame = {
    require(targetsPpm.nonEmpty && targetsPpm.forall(t => t >= 1 && t <= 1000000),
      s"targets must be ppm in [1, 1000000], got $targetsPpm")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__c"))
    val hist = counts.groupBy("__c").agg(count(lit(1)).as("__nterms"))
    val w = Window.orderBy(col("__c").desc)
    val cum = hist.select(col("__c"), col("__nterms"),
      sum(col("__c") * col("__nterms")).over(w).as("__cum_mass"),
      sum(col("__nterms")).over(w).as("__cum_terms"))
    val totals = counts.agg(sum("__c").as("__total"),
      count(lit(1)).as("__vocab_full"))
    val targets = targetsPpm.toDF("target_ppm")
    // Threshold comparisons in DECIMAL(38,0): target_ppm·total and
    // cum_mass·10⁶ pass 2⁶³ around 10¹³ tokens — decimal removes the cliff.
    cum.crossJoin(broadcast(totals)).join(broadcast(targets),
        expr("""CAST(__cum_mass AS DECIMAL(38,0)) * 1000000
                  >= CAST(target_ppm AS DECIMAL(38,0)) * __total AND
                CAST(__cum_mass - __c * __nterms AS DECIMAL(38,0)) * 1000000
                  < CAST(target_ppm AS DECIMAL(38,0)) * __total"""))
      .select(col("target_ppm"), col("__total").as("total_tokens"),
        col("__vocab_full").as("vocab_full"),
        expr("""CAST((CAST(target_ppm AS DECIMAL(38,0)) * __total + 999999)
                DIV 1000000 AS BIGINT)""").as("__t"),
        col("__c"), col("__nterms"), col("__cum_mass"), col("__cum_terms"))
      .select(col("target_ppm"), col("total_tokens"), col("vocab_full"),
        (col("__cum_terms") - col("__nterms") +
          expr("(__t - (__cum_mass - __c * __nterms) + __c - 1) DIV __c"))
          .as("vocab_size"),
        (col("__cum_mass") - col("__c") * col("__nterms") +
          expr("(__t - (__cum_mass - __c * __nterms) + __c - 1) DIV __c")
            * col("__c")).as("covered_tokens"))
      .select(col("target_ppm"), col("total_tokens"), col("vocab_full"),
        col("vocab_size"), col("covered_tokens"),
        expr("""CAST((CAST(covered_tokens AS DECIMAL(38,0)) * 1000000)
                DIV total_tokens AS BIGINT)""").as("covered_ppm"))
      .orderBy("target_ppm")
  }

  /** Term burstiness — the Church & Gale (1995) index of dispersion
    * (variance-to-mean ratio of per-document counts, zeros included):
    * function words arrive ~Poisson (VMR ≈ 1), content/topical words are
    * "contagious" (VMR ≫ 1 — when they appear at all, they appear in
    * bursts). The signal that separates a stopword cutoff from a topic
    * vocabulary, and the term-level dual of [[repetitionProfile]]'s
    * document view. With N docs, per-term occurrence sums Σc and Σc²
    * (zero-count docs contribute nothing to either), reported as
    *
    *   `vmr_ppm` = ⌊10⁶ · (N·Σc² − (Σc)²) / (N·Σc)⌋
    *
    * in DECIMAL(38,0) integer arithmetic — (Σc)² overflows int64 for
    * corpus-scale common words; the numerator is non-negative (N·Σc² ≥
    * (Σc)² by Cauchy–Schwarz over the N-doc vector), so the truncating
    * DIV is floor and matches DuckDB's HUGEINT `//` exactly.
    *
    * Scale shape: per-(doc, term) counts collapse in the FIRST map-side
    * combine (each doc's tokens live in one row, so the wire carries
    * (doc, DISTINCT term, c) triples — the chi2Terms presence mass, not
    * token mass); the per-term moment aggregation is vocab-bounded; N is
    * a broadcast 1-row frame; `minDf` prunes before the VMR projection;
    * top-`topK` is a k-bounded TakeOrdered.
    */
  def burstiness(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 5L,
      topK: Int = 50): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val perDoc = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__c"))
    val byTerm = perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(col("__c")).as("c_total"),
        sum(col("__c") * col("__c")).as("__c2"))
      .where(col("df") >= minDf)
    val totals = docs.agg(count(lit(1)).as("__n"))
    val dec = "decimal(38,0)"
    byTerm.crossJoin(broadcast(totals))
      .select(col("term"), col("df"), col("c_total"),
        (lit(1000000L).cast(dec) *
          (col("__n").cast(dec) * col("__c2").cast(dec) -
            col("c_total").cast(dec) * col("c_total").cast(dec))).as("__num"),
        (col("__n").cast(dec) * col("c_total").cast(dec)).as("__den"))
      .select(col("term"), col("df"), col("c_total"),
        expr("__num DIV __den").cast("long").as("vmr_ppm"))
      .orderBy(desc("vmr_ppm"), col("term"))
      .limit(topK)
  }

  /** Per-slice unigram KL divergence against the whole corpus — "how far
    * does each source's word distribution sit from the mix": KL(P_s ‖ P)
    * = (1/c_s)·Σ_w c_sw·ln(c_sw·C / (c_s·c_w)), the drift audit a mixture
    * designer reads before trusting per-source sampling weights (the
    * batch counterpart of the streaming drift monitor, and the
    * distributional summary [[graft.ops.Curation.corpusDiff]]'s id-level
    * diff can't give). Every ln argument is an exact int64 ratio
    * (c_sw·C and c_s·c_w both < 2⁵³ through sf10-scale corpora — the
    * bound is documented, not assumed), integerized round(10⁶·ln·) per
    * term BEFORE the sum (the PMI / Dirichlet determinism policy), the
    * weighted sum carried in DECIMAL(38,0), and the final divide
    * sign-factored (|Σ| DIV c_s, sign restored) because integerization
    * can leave a near-zero sum slightly negative where true KL ≈ 0 —
    * truncation of the ABSOLUTE quotient is floor, engine-independent.
    *
    * Scale shape: the one token-mass shuffle is the (source, term) count
    * aggregation, map-side combined to |sources|×vocab output rows;
    * corpus term counts DERIVE from that table (vocab-bounded input, no
    * second corpus pass); per-source totals and the corpus grand total
    * are broadcast; the scoring join is vocab-keyed, never token-keyed.
    */
  def sliceKlDivergence(
      docs: DataFrame,
      sliceCol: String,
      textCol: String): DataFrame = {
    val sc = docs
      .select(col(sliceCol).as("slice"), explode(tokens(col(textCol))).as("term"))
      .groupBy("slice", "term")
      .agg(count(lit(1)).as("c_sw"))
    val cw = sc.groupBy("term").agg(sum("c_sw").as("c_w"))
    val cs = sc.groupBy("slice")
      .agg(sum("c_sw").as("c_s"), count(lit(1)).as("n_terms"))
    val tot = cw.agg(sum("c_w").as("__ct"))
    val dec = "decimal(38,0)"
    val lnTerm = round(lit(1e6) *
      log((col("c_sw") * col("__ct")).cast("double") /
        (col("c_s") * col("c_w")).cast("double"))).cast("long")
    sc.join(cw, Seq("term"))
      .join(broadcast(cs), Seq("slice"))
      .crossJoin(broadcast(tot))
      .select(col("slice"), col("c_s"), col("n_terms"),
        (col("c_sw").cast(dec) * lnTerm.cast(dec)).as("__wl"))
      .groupBy(col("slice"), col("c_s").as("n_tokens"), col("n_terms"))
      .agg(sum(col("__wl")).as("__sum"))
      .select(col("slice"), col("n_tokens"), col("n_terms"),
        (when(col("__sum") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("(abs(__sum) DIV n_tokens)").cast("long")).as("kl_ppm"))
      .orderBy("slice")
  }

  /** Per-slice Jensen–Shannon divergence against the REST of the corpus —
    * the symmetric, √-metrizable, [0, ln 2]-bounded member of the
    * distributional drift family next to [[sliceKlDivergence]] (KL is
    * asymmetric and unbounded when the slice has mass the mix lacks; JSD
    * is the score DoReMi-style mixture tuning and domain-similarity
    * weighting publish against). JSD(P_s ‖ P_rest) with M = ½(P+Q).
    *
    * Exactness: every ln argument is an exact int64 ratio — p/m =
    * 2·c_sw·c_r / (c_sw·c_r + c_rw·c_s) (same documented < 2⁵³ envelope
    * as KL's c_sw·C through sf10-scale corpora) — integerized
    * round(10⁶·ln·) per term BEFORE the sum (the PMI determinism
    * policy), weighted sums carried in DECIMAL(38,0), each of the two
    * KL halves floor-divided by its own 2·mass with the sign factored
    * out. The CLOSED-FORM absent-term mass: every term the slice lacks
    * has q/m = 2 exactly, so Σ_{w∉s} c_rw·ln(q/m) = (c_r − Σ_{w∈s}
    * c_rw)·ln 2 — no |slices|×|vocab| cross materializes, the scan
    * stays on the slice's own vocab rows. A slice owning the whole
    * corpus (c_r = 0) reports 0 (P = M).
    *
    * Scale shape: identical to [[sliceKlDivergence]] — one map-side-
    * combined (slice, term) count shuffle, everything after is
    * vocab-bounded; per-slice totals broadcast; output |slices| rows.
    */
  def sliceJsDivergence(
      docs: DataFrame,
      sliceCol: String,
      textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val ln2Ppm = 693147L // round(1e6·ln 2), the absent-term constant
    val sc = docs
      .select(col(sliceCol).as("slice"), explode(tokens(col(textCol))).as("term"))
      .groupBy("slice", "term")
      .agg(count(lit(1)).as("c_sw"))
    val cw = sc.groupBy("term").agg(sum("c_sw").as("c_w"))
    val cs = sc.groupBy("slice").agg(sum("c_sw").as("c_s"))
    val tot = cw.agg(sum("c_w").as("__ct"))
    val j = sc.join(cw, Seq("term"))
      .join(broadcast(cs), Seq("slice"))
      .crossJoin(broadcast(tot))
      .select(col("slice"), col("c_s"), (col("__ct") - col("c_s")).as("c_r"),
        col("c_sw"), (col("c_w") - col("c_sw")).as("c_rw"))
      .withColumn("__den",
        col("c_sw") * col("c_r") + col("c_rw") * col("c_s"))
    val pTerm = round(lit(1e6) *
      log((lit(2L) * col("c_sw") * col("c_r")).cast("double") /
        col("__den").cast("double"))).cast("long")
    val qTerm = round(lit(1e6) *
      log((lit(2L) * col("c_rw") * col("c_s")).cast("double") /
        col("__den").cast("double"))).cast("long")
    j.select(col("slice"), col("c_s"), col("c_r"),
        when(col("c_r") > 0, col("c_sw").cast(dec) * pTerm.cast(dec))
          .otherwise(lit(0L).cast(dec)).as("__p"),
        when(col("c_r") > 0 && col("c_rw") > 0,
          col("c_rw").cast(dec) * qTerm.cast(dec))
          .otherwise(lit(0L).cast(dec)).as("__q"),
        col("c_rw").cast(dec).as("__crw"))
      .groupBy(col("slice"), col("c_s").as("n_tokens"),
        col("c_r").as("n_rest_tokens"))
      .agg(sum("__p").as("__sp"),
        (sum("__q") +
          (col("c_r").cast(dec) - sum("__crw")) * ln2Ppm)
          .as("__sq"))
      .select(col("slice"), col("n_tokens"), col("n_rest_tokens"),
        expr(s"""CAST(CASE WHEN n_rest_tokens = 0 THEN 0 ELSE
          (CASE WHEN __sp < 0 THEN -1 ELSE 1 END) *
            (abs(__sp) DIV (2 * CAST(n_tokens AS $dec))) +
          (CASE WHEN __sq < 0 THEN -1 ELSE 1 END) *
            (abs(__sq) DIV (2 * CAST(n_rest_tokens AS $dec)))
          END AS BIGINT)""").as("jsd_ppm"))
      .orderBy("slice")
  }

  /** Vocabulary richness and sample-coverage estimate — "will more data
    * still add vocabulary?", the question a 100 TB ingest answers BEFORE
    * paying for the next decade of crawl: Good–Turing coverage
    * C = 1 − F₁/N (Good 1953 — the probability the next token is an
    * already-seen type) and the bias-corrected Chao1 richness floor
    * V + F₁(F₁−1)/(2(F₂+1)) (Chao 1984; Colwell & Coddington 1994 form,
    * defined even at F₂ = 0), both from the frequency-of-frequencies
    * histogram. F₁ high / coverage low ⇒ the type inventory is still
    * growing and dedup/vocab builds sized to V will under-provision.
    *
    * Exactness: all five outputs are exact integers — token mass N in
    * DECIMAL(38,0), the Chao1 correction a single floor divide, coverage
    * 10⁶ − F₁·10⁶ DIV N. Degenerate empty corpus reports zeros.
    *
    * Scale shape: ONE token-mass shuffle (term counts, map-side
    * combined), then the count-of-counts table — bounded by the number
    * of DISTINCT frequencies ≤ O(√N) — carries everything; single-row
    * output.
    */
  def vocabRichness(docs: DataFrame, textCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val tc = docs.select(explode(tokens(textCol)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__c"))
    val ff = tc.groupBy("__c").agg(count(lit(1)).as("__f"))
    ff.agg(
        coalesce(sum(col("__c").cast(dec) * col("__f")), lit(0L).cast(dec))
          .as("__n"),
        coalesce(sum("__f"), lit(0L)).as("v_observed"),
        coalesce(sum(when(col("__c") === 1, col("__f"))), lit(0L)).as("f1"),
        coalesce(sum(when(col("__c") === 2, col("__f"))), lit(0L)).as("f2"))
      .select(col("__n").cast("long").as("n_tokens"), col("v_observed"),
        col("f1"), col("f2"),
        expr(s"""v_observed + CAST(f1 AS $dec) * (f1 - 1)
          DIV (2 * (f2 + 1))""").cast("long").as("chao1_est"),
        expr(s"""CAST(CASE WHEN __n = 0 THEN 0
          ELSE 1000000 - (CAST(f1 AS $dec) * 1000000) DIV __n
          END AS BIGINT)""").as("coverage_ppm"))
  }
}
