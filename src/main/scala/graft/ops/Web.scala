package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation operators — the provenance-side filters of a web
  * corpus pipeline (CCNet, C4, RefinedWeb all key their quality and
  * dedup decisions on normalized URLs and registered domains before any
  * text is read). Everything here is a narrow codegen'd Column
  * composition over the URL string; the only shuffle in the family is
  * [[domainStats]]' aggregation on the (tiny) registered-domain key.
  */
object Web {

  /** Multi-label public suffixes this engine recognizes beyond plain TLDs
    * (a compact, documented subset of the public-suffix list — the
    * registered domain is the label before the matched suffix).
    */
  val MultiPartSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "org.uk", "co.jp", "com.au")

  /** Query parameters stripped during normalization (tracking noise that
    * fragments URL-level dedup; the CCNet convention): any `utm_*`
    * parameter plus these exact names.
    */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "ref")

  private def hostOf(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  /** Registered domain (eTLD+1) of a lowercased host: the last two labels,
    * or three when the trailing two match a multi-part public suffix.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, n - 1, lit(2)))
    when(n <= 2, host)
      .when(last2.isin(MultiPartSuffixes: _*),
        concat_ws(".", slice(labels, n - 2, lit(3))))
      .otherwise(last2)
  }

  /** Query string minus tracking parameters, parameter order preserved. */
  def cleanQuery(query: Column): Column = {
    val keep = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") +:
        TrackingParams.map(t => p === t || p.startsWith(t + "=")))
        .reduce(_ || _))
    concat_ws("&", keep)
  }

  /** Parse + normalize one URL column into the fact row URL-level curation
    * keys on: lowercased host, registered domain, trailing-slash-free
    * path, tracking-stripped query, path depth, and the canonical
    * normalized URL (scheme://host path ?query — fragment dropped).
    * Malformed URLs (no scheme/host) degrade to null facts, not errors.
    */
  /** Explicit port of the URL ("" when absent): parse_url HOST silently
    * drops it, and a canonical key without the port would collapse
    * port-distinct resources (dev servers, mirrors) into one document.
    */
  private def portOf(url: Column): Column =
    regexp_extract(
      coalesce(try_parse_url(url, lit("AUTHORITY")), lit("")), ":(\\d+)$", 1)

  def urlFacts(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    val host = hostOf(u)
    val rawPath = coalesce(try_parse_url(u, lit("PATH")), lit(""))
    val path = regexp_replace(rawPath, "/$", "")
    val query = cleanQuery(coalesce(try_parse_url(u, lit("QUERY")), lit("")))
    df.select(col(idCol), u.as("url"),
        scheme.as("scheme"), host.as("host"), portOf(u).as("__port"),
        path.as("path"), query.as("query"))
      .select(col(idCol), col("url"), col("scheme"), col("host"),
        registeredDomain(col("host")).as("domain"),
        col("path"),
        size(filter(split(col("path"), "/"), s => s =!= "")).cast("long")
          .as("depth"),
        col("query"),
        when(col("scheme").isNull || col("host").isNull, lit(null))
          .otherwise(concat(col("scheme"), lit("://"), col("host"),
            when(col("__port") === "", "")
              .otherwise(concat(lit(":"), col("__port"))),
            col("path"),
            when(col("query") === "", "").otherwise(concat(lit("?"), col("query")))))
          .as("url_norm"))
  }

  /** Per-registered-domain corpus stats: document count, distinct hosts,
    * distinct normalized URLs — the table a domain-level quality prior or
    * crawl-budget policy reads. One aggregation on the domain key (tiny
    * cardinality next to the corpus; partial aggregation collapses it
    * map-side).
    */
  def domainStats(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    urlFacts(df, idCol, urlCol)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("url_norm")).as("n_urls"))

  /** SURT key (Sort-friendly URI Reordering Transform — the Internet
    * Archive / Common Crawl canonical URL ordering): reversed comma-joined
    * host labels, `)`, the normalized path, and the SORTED
    * tracking-stripped query — e.g.
    * `org,example,www)/p/3?a=1&b=2`. Reversing the host makes every URL
    * of a site (and of its subdomains) a lexicographic NEIGHBOR, so
    * sorting / range-partitioning a 100 TB crawl by this one key gives
    * per-site locality (site-level scans become range scans, per-site
    * stats become near-local aggregations); sorting the query parameters
    * collapses the param-order permutations that fragment URL dedup.
    * Malformed URLs yield a null key, mirroring [[urlFacts]].
    */
  def surtKey(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val facts = urlFacts(df, idCol, urlCol)
    val sortedQuery = array_join(
      sort_array(filter(split(col("query"), "&"), p => p =!= "")), "&")
    // `host:port)` like the canonical SURT form — port-distinct resources
    // must not collapse into one dedup group.
    val port = portOf(col("url"))
    facts.select(col(idCol), col("url"),
      when(col("host").isNull, lit(null)).otherwise(
        concat(array_join(reverse(split(col("host"), "\\.")), ","),
          when(port === "", "").otherwise(concat(lit(":"), port)),
          lit(")"), col("path"),
          when(col("query") === "", "")
            .otherwise(concat(lit("?"), sortedQuery))))
        .as("surt"))
  }

  /** URL-level dedup on the SURT key (keep-first + copy counts) — the
    * fetch-avoidance pass a crawl pipeline runs BEFORE any text exists:
    * scheme/case/trailing-slash/tracking-param/param-order variants of
    * one resource collapse to one canonical row. Same shuffle shape as
    * [[Dedup.exactByText]]: one groupBy on the compact key. Malformed
    * URLs (null SURT) are NOT a duplicate group — collapsing them to one
    * keep_id would silently drop every malformed-URL document but one —
    * so each passes through as its own single-member row (surt null,
    * keep_id = its id, n_copies 1); the groupBy sees only non-null keys.
    */
  def surtDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keyed = surtKey(df, idCol, urlCol)
    // min over the id's own type (the Dedup.exactByText convention) —
    // cast("long") turned string/UUID ids into NULL keep_ids and a
    // downstream keep-join dropped the whole corpus.
    keyed.where(col("surt").isNotNull)
      .groupBy(col("surt"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .unionByName(keyed.where(col("surt").isNull)
        .select(col("surt"), col(idCol).as("keep_id"),
          lit(1L).as("n_copies")))
  }

  /** jusText-style main-content extraction from raw HTML (Pomikálek 2011;
    * the segment-and-classify idea behind trafilatura/jusText that C4,
    * CCNet and RefinedWeb all run before any text filter): strip
    * script/style/comment subtrees, segment on block-level tags, then
    * classify each block by LENGTH and LINK DENSITY — short blocks and
    * link-dominated blocks (navigation, footers, related-links rails) are
    * boilerplate; long low-link blocks are content. This is the
    * deterministic two-feature core of the published classifier (no
    * stopword model), which makes every decision replayable cross-engine:
    *
    *  - link density = (chars of `<a …>…</a>` markup+text) / block chars,
    *    measured on the RAW block before tag stripping;
    *  - a block is content iff its tag-stripped, whitespace-collapsed
    *    text has ≥ `minBlockChars` chars AND link density ≤
    *    `maxLinkDensity`.
    *
    * Output per document: `n_blocks` (blocks with any text),
    * `n_good_blocks`, and `content` (good blocks joined with newlines).
    *
    * Scale shape: a pure narrow map — regex strips + one split + one
    * bounded per-row array pass; no shuffle, no UDF. The regexes are
    * RE2-compatible (no backreferences), so DuckDB replays extraction
    * byte-for-byte.
    */
  def htmlExtract(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      minBlockChars: Int = 30,
      maxLinkDensity: Double = 0.5): DataFrame = {
    require(minBlockChars >= 1, s"minBlockChars must be >= 1: $minBlockChars")
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      s"maxLinkDensity must be in [0, 1]: $maxLinkDensity")
    val stripped = regexp_replace(regexp_replace(regexp_replace(col(htmlCol),
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val blocks = split(stripped,
      "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|article|section" +
        "|header|footer|nav|blockquote|br)\\b[^>]*>")
    def clean(b: Column): Column =
      trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "), "\\s+", " "))
    def linkDensity(b: Column): Column =
      (length(b) - length(regexp_replace(b,
        "(?is)<a(?:\\s[^>]*)?>.*?</a>", ""))).cast("double") /
        greatest(length(b), lit(1)).cast("double")
    // Two-stage on purpose: the struct array is built in its OWN
    // projection and the second select references `__st` three times —
    // CollapseProject refuses to inline a non-cheap multi-referenced
    // producer, so the regex chain runs ONCE per row instead of once per
    // reference (interpreted HOF projections have no CSE — measured 3×:
    // 9.7 → 3.3 s at sf1). `clean` is likewise computed once per block;
    // downstream predicates re-measure only the materialized string.
    val stats = transform(blocks, b =>
      struct(clean(b).as("txt"), linkDensity(b).as("ld")))
    val staged = df.select(col(idCol), stats.as("__st"))
    def isGood(s: Column): Column =
      length(s.getField("txt")) >= minBlockChars &&
        s.getField("ld") <= maxLinkDensity
    staged.select(col(idCol),
      size(filter(col("__st"), s => length(s.getField("txt")) > 0))
        .cast("long").as("n_blocks"),
      size(filter(col("__st"), isGood(_))).cast("long").as("n_good_blocks"),
      array_join(transform(filter(col("__st"), isGood(_)),
        s => s.getField("txt")), "\n").as("content"))
  }

  /** Empirical-Bayes per-domain quality prior — the shrinkage a
    * domain-level filter needs because small domains' raw means are
    * noise (a 3-document domain of perfect scores must not outrank a
    * 10k-document domain at 0.9):
    *
    *   shrunk(d) = (Σq_d + k·ḡ) / (n_d + k)
    *
    * with ḡ the corpus mean and `k` the prior strength (the score a
    * domain must "earn past" k average documents to move). Determinism:
    * per-document scores are integerized ONCE (round(1e6·q) — per-row,
    * order-independent), so group sums are int64-exact and every
    * derived double is one IEEE division/multiply chain over identical
    * integers — bit-replayable cross-engine, no summation-order terms.
    *
    * Scale shape: one domain-keyed map-side-combined aggregation over
    * (domain, int score) rows; the corpus totals ride a one-row
    * broadcast. Output per domain: (domain, n_docs, mean_q, shrunk_q) —
    * scores on the 1e-6 lattice.
    */
  def domainQualityPrior(
      docs: DataFrame,
      idCol: String,
      domainCol: String,
      scoreCol: String,
      k: Double = 20.0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val qi = round(col(scoreCol) * 1e6).cast("long")
    val grouped = docs
      .select(col(domainCol).as("domain"), qi.as("__qi"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__qi")).as("__sq"))
    val totals = grouped.agg(sum(col("n_docs")).as("__tn"),
      sum(col("__sq")).as("__ts"))
    grouped.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_docs"),
        (col("__sq").cast("double") / col("n_docs").cast("double") / 1e6)
          .as("mean_q"),
        ((col("__sq").cast("double") +
          lit(k) * (col("__ts").cast("double") / col("__tn").cast("double"))) /
          (col("n_docs").cast("double") + lit(k)) / 1e6).as("shrunk_q"))
  }

  /** Drop rows whose registered domain is blocklisted (the broadcast-set
    * filter every web pipeline runs first). The blocklist is a literal —
    * no join, no shuffle. Returns the CALLER'S rows (all columns intact):
    * the domain is derived inline from the url column, never by replacing
    * the row with the urlFacts projection — a pipeline running this first
    * must not lose its text/metadata columns.
    */
  def blocklistFilter(df: DataFrame, idCol: String, urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    val domain = registeredDomain(hostOf(col(urlCol)))
    df.where(!coalesce(domain.isin(blockedDomains: _*), lit(false)))
  }
}
