package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class WebSpec extends SparkTestBase {
  import spark.implicits._

  private def facts(url: String) =
    Web.urlFacts(Seq((1L, url)).toDF("id", "url"), "id", "url")
      .collect().head

  test("urlFacts normalizes case, trailing slash, tracking params, fragment") {
    val r = facts("https://WWW.Site3.ORG/p/12/?utm_source=a&id=5&ref=x#frag")
    assert(r.getString(2) === "https")            // scheme
    assert(r.getString(3) === "www.site3.org")    // host
    assert(r.getString(4) === "site3.org")        // domain
    assert(r.getString(5) === "/p/12")            // path (slash stripped)
    assert(r.getLong(6) === 2L)                   // depth
    assert(r.getString(7) === "id=5")             // query (tracking stripped)
    assert(r.getString(8) === "https://www.site3.org/p/12?id=5")
  }

  test("registered domain honors multi-part public suffixes") {
    assert(facts("http://blog.example.co.uk/a").getString(4) === "example.co.uk")
    assert(facts("http://example.co.uk/a").getString(4) === "example.co.uk")
    assert(facts("http://deep.sub.example.com/a").getString(4) === "example.com")
    assert(facts("http://example.io/a").getString(4) === "example.io")
  }

  test("root path, empty query, malformed URLs degrade gracefully") {
    val root = facts("https://example.com/")
    assert(root.getString(5) === "" && root.getLong(6) === 0L)
    assert(root.getString(8) === "https://example.com")
    val noq = facts("https://example.com/x?utm_campaign=only")
    assert(noq.getString(7) === "")
    assert(noq.getString(8) === "https://example.com/x")
    val bad = facts("not a url at all")
    assert(bad.isNullAt(3) && bad.isNullAt(8)) // host, url_norm null
  }

  test("domainStats aggregates docs, hosts, urls per registered domain") {
    val df = Seq(
      (1L, "https://www.shop.com/a"), (2L, "https://blog.shop.com/b"),
      (3L, "https://www.shop.com/a"), (4L, "http://news.org/x"))
      .toDF("id", "url")
    val m = Web.domainStats(df, "id", "url").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m("shop.com") === ((3L, 2L, 2L)))
    assert(m("news.org") === ((1L, 1L, 1L)))
  }

  test("surtKey reverses host labels, sorts params, drops tracking noise") {
    val k = Web.surtKey(
      Seq((1L, "https://WWW.Example.ORG/p/3/?b=2&utm_source=x&a=1#f"))
        .toDF("id", "url"), "id", "url")
      .collect().head.getString(2)
    assert(k === "org,example,www)/p/3?a=1&b=2")
    val bad = Web.surtKey(Seq((1L, "nope")).toDF("id", "url"), "id", "url")
      .collect().head
    assert(bad.isNullAt(2))
  }

  test("surtDedup collapses scheme/case/slash/param-order variants") {
    val df = Seq(
      (1L, "https://www.shop.com/a/?x=1&y=2"),
      (2L, "http://WWW.Shop.COM/a?y=2&x=1&utm_medium=m"),
      (3L, "https://www.shop.com/b"))
      .toDF("id", "url")
    val m = Web.surtDedup(df, "id", "url").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("com,shop,www)/a?x=1&y=2") === ((1L, 2L)))
    assert(m("com,shop,www)/b") === ((3L, 1L)))
    assert(m.size === 2)
  }

  test("surtDedup passes malformed (null-SURT) rows through as singletons") {
    // Malformed URLs must NOT collapse into one null-key "duplicate"
    // group — a consumer keeping only keep_id would silently drop all
    // but one malformed document.
    val df = Seq(
      (1L, "https://www.shop.com/a"),
      (2L, "definitely not a url"),
      (3L, "also :: broken"),
      (4L, "http://www.shop.com/a/"))
      .toDF("id", "url")
    val rows = Web.surtDedup(df, "id", "url").collect()
    val nullRows = rows.filter(_.isNullAt(0))
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(nullRows === Set((2L, 1L), (3L, 1L)))
    val good = rows.filter(!_.isNullAt(0))
    assert(good.length === 1 && good.head.getLong(1) === 1L &&
      good.head.getLong(2) === 2L)
  }

  test("htmlExtract: keeps content blocks, drops nav/footer/script/style") {
    val para = "This paragraph has plenty of real prose content in it, " +
      "well past the minimum block length."
    val html = "<html><head><style>.a{}</style>" +
      "<script>if (x < 3) { alert('<p>not a block</p>'); }</script></head>" +
      "<body><nav><a href=\"/\">Home</a> <a href=\"/x\">Docs</a></nav>" +
      s"<p>$para</p>" +
      "<div>Short.</div>" + // non-empty but under minBlockChars
      "<!-- <p>commented out</p> --></body></html>"
    val got = Web.htmlExtract(Seq((1L, html)).toDF("id", "html"),
        "id", "html")
      .select("n_blocks", "n_good_blocks", "content")
      .as[(Long, Long, String)].head()
    assert(got._2 === 1L, s"exactly the paragraph survives: $got")
    assert(got._3 === para)
    // nav (link-dominated), paragraph, and "Short." all carry text.
    assert(got._1 === 3L, got.toString)
    // Link density: a page whose only long block is pure links drops it.
    val linky = "<div>" + (1 to 10).map(i =>
      s"""<a href="/$i">Interesting link number $i here</a>""").mkString(" ") +
      "</div>"
    val got2 = Web.htmlExtract(Seq((1L, linky)).toDF("id", "html"),
        "id", "html")
      .select("n_good_blocks").as[Long].head()
    assert(got2 === 0L)
  }

  test("domainQualityPrior: shrinkage pulls small domains toward the corpus mean") {
    // big.com: 20 docs at 0.9; tiny.com: 1 doc at 1.0. Corpus mean ḡ =
    // (18 + 1)/21. With k = 20: tiny's shrunk = (1 + 20ḡ)/21 ≈ 0.909 —
    // BELOW big's shrunk ≈ 0.9002 + pull... compute exactly in-test.
    val docs = ((1 to 20).map(i => (i.toLong, "big.com", 0.9)) :+
      (99L, "tiny.com", 1.0)).toDF("id", "domain", "q")
    val got = Web.domainQualityPrior(docs, "id", "domain", "q", k = 20.0)
      .orderBy("domain")
      .as[(String, Long, Double, Double)].collect().toSeq
    val g = (20 * 900000L + 1000000L).toDouble / 21
    val bigShrunk = (20 * 900000L + 20.0 * g) / 40.0 / 1e6
    val tinyShrunk = (1000000L + 20.0 * g) / 21.0 / 1e6
    assert(got(0) === (("big.com", 20L, 0.9, bigShrunk)))
    assert(got(1) === (("tiny.com", 1L, 1.0, tinyShrunk)))
    // The raw means rank tiny first; the priors must NOT.
    assert(tinyShrunk < 0.95 && bigShrunk < tinyShrunk,
      s"one perfect doc may nudge, not dominate: $bigShrunk vs $tinyShrunk")
  }

  test("blocklistFilter drops exactly the blocked registered domains") {
    val df = Seq(
      (1L, "https://www.bad.com/a"), (2L, "https://sub.bad.com/b"),
      (3L, "https://good.com/c"))
      .toDF("id", "url")
    val kept = Web.blocklistFilter(df, "id", "url", Seq("bad.com"))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(3L))
  }
}
