package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Drives every SQL function registered by [[GraftExtensions]] through
  * `spark.sql` on a dedicated extended session (the shared test session has
  * no extensions, so this is the only coverage of the injection path).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** A fresh SparkSession over the shared SparkContext with the extensions
    * applied. `getOrCreate` returns any existing active/default session (and
    * silently skips extensions), so both are cleared first and restored in
    * [[withExtendedSession]] — other suites keep their cached session.
    */
  private def withExtendedSession(f: SparkSession => Unit): Unit = {
    val base = SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("every registered SQL function evaluates") { withExtendedSession { spark =>
    val row = spark.sql(
      """SELECT
        |  format_log_date(1330423200000, 'RFC5424') AS d,
        |  tokenize('The quick  Fox') AS toks,
        |  size(shingle_hashes(tokenize('a b c d'), 3)) AS n_sh,
        |  size(ngram_hashes(tokenize('a b a b'), 2)) AS n_ng,
        |  size(minhash_signature(shingle_hashes(tokenize('a b c d'), 3), 16)) AS n_mh,
        |  simhash64(tokenize('a b c')) AS sh64,
        |  cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
        |  jaccard_sets(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS jac,
        |  size(winnow_fingerprints(tokenize('a b c d e f g h'), 3, 2)) AS n_wf,
        |  lang_id('the cat and the dog') AS lang,
        |  nfc_normalize('café') AS nfc,
        |  keyword_tags('a stable system', array('tab', 'table', 'sys')) AS tags,
        |  repetition_profile(tokenize('a b a b a b'), 2) AS rep
        |""".stripMargin).head()

    assert(row.getAs[String]("d").nonEmpty)
    assert(row.getAs[Seq[String]]("toks") === Seq("the", "quick", "fox"))
    assert(row.getAs[Int]("n_sh") === 2)
    assert(row.getAs[Int]("n_ng") === 3)     // non-distinct occurrences
    assert(row.getAs[Int]("n_mh") === 16)
    assert(row.getAs[Double]("cos") === 1.0)
    assert(row.getAs[Double]("jac") === 0.5)
    assert(row.getAs[Int]("n_wf") > 0)
    assert(row.getAs[String]("lang") === "en")
    assert(row.getAs[String]("nfc") === "café")
    assert(row.getAs[Seq[String]]("tags") === Seq("sys", "tab", "table"))
    val rep = row.getAs[org.apache.spark.sql.Row]("rep")
    assert(rep.getLong(0) === 6L && rep.getLong(1) === 6L && rep.getLong(2) === 6L)

    val row2 = spark.sql(
      """SELECT
        |  token_entropy(tokenize('a a b b')) AS ent,
        |  size(cdc_chunk_structs(tokenize('a b c d e f'), 3, 2)) AS n_cdc,
        |  maxmatch_pieces(tokenize('sparker x!'),
        |    array('spark', 'er', 'x', 's', 'p', 'a', 'r', 'k', 'e')) AS mm,
        |  hilbert_index(1L, 1L, 1) AS hil,
        |  hilbert_index(CAST(1 AS INT), CAST(1 AS INT), 1) AS hil_int
        |""".stripMargin).head()
    val ent = row2.getAs[org.apache.spark.sql.Row]("ent")
    assert(ent.getLong(0) === 4L && ent.getLong(1) === 2L)
    assert(ent.getLong(2) === math.floor(1e6 * math.log(2.0) + 0.5).toLong)
    assert(row2.getAs[Int]("n_cdc") >= 1)
    assert(row2.getAs[Seq[String]]("mm") === Seq("spark", "er", "x", "[UNK]"))
    assert(row2.getAs[Long]("hil") === 2L)
    // ExpectsInputTypes inserts the LONG cast for integral inputs, so the
    // interpreted and codegen paths agree (the raw asInstanceOf[Long]
    // used to CCE on INT columns only when codegen fell back).
    assert(row2.getAs[Long]("hil_int") === 2L)

    // The aggregate path: top-2 scores per group via topk_by_score.
    import spark.implicits._
    Seq((1, 1.0, 10L), (1, 3.0, 11L), (1, 2.0, 12L), (2, 5.0, 20L))
      .toDF("g", "score", "id").createOrReplaceTempView("tk")
    val agg = spark.sql(
      "SELECT g, topk_by_score(score, id, 2) AS top FROM tk GROUP BY g ORDER BY g")
      .collect()
    assert(agg.length === 2)
    val top1 = agg(0).getSeq[org.apache.spark.sql.Row](1).map(r => r.getLong(1))
    assert(top1 === Seq(11L, 12L))

    // Round-10 additions.
    val row3 = spark.sql(
      """SELECT
        |  script_profile('aб1 中!') AS sp,
        |  portable_simhash(tokenize('spark')) AS psh,
        |  md5_pair_draw(3L, 7L, 'graft-ring-cap') AS draw,
        |  augment_tokens('7', tokenize('a b c d e'), 0.1D, 0.1D) AS aug,
        |  gale_church_align(array('Hello there.', 'Short.'),
        |    array('Hello there.', 'Short.')) AS al
        |""".stripMargin).head()
    val sp = row3.getAs[org.apache.spark.sql.Row]("sp")
    assert(sp.getLong(0) === 5L && sp.getInt(9) === 1) // n_chars, mixed
    val psh = row3.getAs[org.apache.spark.sql.Row]("psh")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("spark".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(psh.getLong(0) === java.lang.Long.parseLong(hex.take(8), 16))
    assert(row3.getAs[Long]("draw") ===
      graft.functions.Md5PairDrawOps.draw(3L, 7L, "graft-ring-cap"))
    val aug = row3.getAs[org.apache.spark.sql.Row]("aug")
    assert(aug.getLong(0) === 5L) // n_tokens

    // r15: plain SQL decimal literals (0.1 parses as DecimalType, not
    // DOUBLE) must be accepted and agree with the 0.1D form; INT
    // score/id columns must cast cleanly into topk_by_score; and
    // md5_pair_draw accepts INT args.
    val decAug = spark.sql(
      "SELECT augment_tokens('7', tokenize('a b c d e'), 0.1, 0.1) AS a")
      .head().getAs[org.apache.spark.sql.Row]("a")
    assert(decAug === aug)
    val intTop = spark.sql(
      """SELECT topk_by_score(s, i, 1) AS t FROM
        |  (SELECT 5 AS s, 7 AS i UNION ALL SELECT 3, 9)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(intTop.map(_.getLong(1)) === Seq(7L))
    assert(spark.sql("SELECT md5_pair_draw(3, 7, 'graft-ring-cap') AS d")
      .head().getAs[Long]("d") ===
      graft.functions.Md5PairDrawOps.draw(3L, 7L, "graft-ring-cap"))
    // Wrong arity surfaces as the usage message, not an index error.
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0))").collect()
    }
    assert(err.getMessage.contains("cosine_similarity(a, b)"))
    val al = row3.getAs[org.apache.spark.sql.Row]("al")
    assert(al.getLong(2) === 0L && al.getString(4) === "1-1,1-1")

    // token_lcs: in-order subsequence, truncation arg respected.
    val lc = spark.sql(
      """SELECT token_lcs(tokenize('a b x y z c'), tokenize('x y z q r')) AS l,
        |  token_lcs(tokenize('a b c d'), tokenize('a b c d'), 2) AS lt
        |""".stripMargin).head()
    val l = lc.getAs[org.apache.spark.sql.Row]("l")
    assert((l.getInt(0), l.getInt(1), l.getInt(2)) === ((6, 5, 3)))
    val lt = lc.getAs[org.apache.spark.sql.Row]("lt")
    assert((lt.getInt(0), lt.getInt(1), lt.getInt(2)) === ((2, 2, 2)))

    // The payload aggregate: smallest-score-last ordering carries payloads.
    val agg2 = spark.sql(
      "SELECT g, topk_by_score_payload(score, id, score * 10, 2) AS top " +
      "FROM tk GROUP BY g ORDER BY g").collect()
    val p1 = agg2(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(p1 === Seq((11L, 30.0), (12L, 20.0)))
  }}
}
