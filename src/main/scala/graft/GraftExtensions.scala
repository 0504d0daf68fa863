package graft

import graft.functions.{BloomHitCount, CdcChunkStructs, CosineSimilarity, FormatLogDate, JaccardSets, KeywordTags, LangIdExpression, MinHashSignature, NfcNormalize, NgramHashes, RepetitionProfile, ShingleHashes, SimHash64, TokenEntropy, Tokenize, TopKByScore, WinnowFingerprints}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the engine's native expressions for SQL use:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions()(_))
  *   SELECT format_log_date(timestamp, 'RFC5424') FROM logs
  *   SELECT simhash64(tokens), minhash_signature(hashes, 64) FROM docs
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def str(e: Expression, what: String): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  private def int(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** Fractional literal: plain SQL `0.1` parses as DecimalType, not
    * DOUBLE — the builder must accept both (and integer literals), or the
    * registration's own usage string is rejected.
    */
  private def dbl(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** String-array literal (array('a', ...) or a folded array literal). */
  private def strArrayLit(e: Expression, what: String): Seq[String] = e match {
    case ca: org.apache.spark.sql.catalyst.expressions.CreateArray =>
      ca.children.map(c => str(c, what))
    case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _)) =>
      data.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$what must be a string-array literal, got $other")
  }

  /** Exact-arity guards: `args.head`/`args(1)` would silently IGNORE
    * extra arguments and surface missing ones as raw index exceptions
    * instead of the usage message every other registration gives.
    */
  private def arity1(args: Seq[Expression], usage: String): Expression =
    args match {
      case Seq(a) => a
      case _ => throw new IllegalArgumentException(usage)
    }
  private def arity2(args: Seq[Expression], usage: String): (Expression, Expression) =
    args match {
      case Seq(a, b) => (a, b)
      case _ => throw new IllegalArgumentException(usage)
    }

  private def asLongCast(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.LongType)
  private def asDoubleCast(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DoubleType)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("format_log_date"),
      new ExpressionInfo(classOf[FormatLogDate].getName, "format_log_date"),
      (args: Seq[Expression]) => args match {
        case Seq(child, fmt) => FormatLogDate(child, str(fmt, "format"), "UTC")
        case Seq(child, fmt, zone) => FormatLogDate(child, str(fmt, "format"), str(zone, "zone"))
        case _ => throw new IllegalArgumentException(
          "format_log_date(epochMs, format[, zone])")
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(arity1(args, "simhash64(arg)"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(child) => MinHashSignature(child, 64)
        case Seq(child, n) => MinHashSignature(child, int(n, "numHashes"))
        case _ => throw new IllegalArgumentException("minhash_signature(hashes[, numHashes])")
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        val (a, b) = arity2(args, "cosine_similarity(a, b)")
        CosineSimilarity(a, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sets"),
      new ExpressionInfo(classOf[JaccardSets].getName, "jaccard_sets"),
      (args: Seq[Expression]) => {
        val (a, b) = arity2(args, "jaccard_sets(a, b)")
        JaccardSets(a, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(toks) => ShingleHashes(toks, 3)
        case Seq(toks, k) => ShingleHashes(toks, int(k, "k"))
        case _ => throw new IllegalArgumentException("shingle_hashes(tokens[, k])")
      }))
    ext.injectFunction((
      FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(toks) => NgramHashes(toks, 2)
        case Seq(toks, k) => NgramHashes(toks, int(k, "k"))
        case _ => throw new IllegalArgumentException("ngram_hashes(tokens[, k])")
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(arity1(args, "nfc_normalize(arg)"))))
    ext.injectFunction((
      FunctionIdentifier("tokenize"),
      new ExpressionInfo(classOf[Tokenize].getName, "tokenize"),
      (args: Seq[Expression]) => Tokenize(arity1(args, "tokenize(arg)"))))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdExpression].getName, "lang_id"),
      // NOTE the SQL surface takes RAW TEXT (tokenized here), while the
      // Scala LangIdFunctions.lang_id takes a token array — the SQL form
      // exists for ad-hoc queries over text columns.
      (args: Seq[Expression]) =>
        LangIdExpression(Tokenize(arity1(args, "lang_id(text)")),
          graft.ops.TextAnalysis.StopwordProfiles)))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => args match {
        case Seq(toks) => WinnowFingerprints(toks, 3, 4)
        case Seq(toks, k, w) => WinnowFingerprints(toks, int(k, "k"), int(w, "w"))
        case _ => throw new IllegalArgumentException("winnow_fingerprints(tokens[, k, w])")
      }))
    ext.injectFunction((
      FunctionIdentifier("repetition_profile"),
      new ExpressionInfo(classOf[RepetitionProfile].getName, "repetition_profile"),
      (args: Seq[Expression]) => args match {
        case Seq(toks) => RepetitionProfile(toks, 2)
        case Seq(toks, n) => RepetitionProfile(toks, int(n, "n"))
        case _ => throw new IllegalArgumentException("repetition_profile(tokens[, n])")
      }))
    ext.injectFunction((
      FunctionIdentifier("token_entropy"),
      new ExpressionInfo(classOf[TokenEntropy].getName, "token_entropy"),
      (args: Seq[Expression]) => TokenEntropy(arity1(args, "token_entropy(arg)"))))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunk_structs"),
      new ExpressionInfo(classOf[CdcChunkStructs].getName, "cdc_chunk_structs"),
      (args: Seq[Expression]) => args match {
        case Seq(toks) => CdcChunkStructs(toks, 3, 8)
        case Seq(toks, k, m) => CdcChunkStructs(toks, int(k, "k"), int(m, "modulus"))
        case _ => throw new IllegalArgumentException(
          "cdc_chunk_structs(tokens[, k, modulus])")
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_hit_count"),
      new ExpressionInfo(classOf[BloomHitCount].getName, "bloom_hit_count"),
      (args: Seq[Expression]) => args match {
        case Seq(hashes, Literal(bytes: Array[Byte], _)) =>
          BloomHitCount(hashes, bytes)
        case _ => throw new IllegalArgumentException(
          "bloom_hit_count(hashes, <binary literal sketch>)")
      }))
    ext.injectFunction((
      FunctionIdentifier("keyword_tags"),
      new ExpressionInfo(classOf[KeywordTags].getName, "keyword_tags"),
      (args: Seq[Expression]) => args match {
        case Seq(text, terms) =>
          KeywordTags(text, strArrayLit(terms, "keyword_tags dictionary"))
        case _ => throw new IllegalArgumentException(
          "keyword_tags(text, array('term', ...))")
      }))
    ext.injectFunction((
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[graft.functions.HilbertIndex].getName,
        "hilbert_index"),
      (args: Seq[Expression]) => {
        // Cast integral inputs up to LONG here (the Scala builder does the
        // same), so interpreted and codegen paths agree on INT columns.
        def asLong(e: Expression): Expression =
          org.apache.spark.sql.catalyst.expressions.Cast(
            e, org.apache.spark.sql.types.LongType)
        args match {
          case Seq(a, b) => graft.functions.HilbertIndex(asLong(a), asLong(b), 21)
          case Seq(a, b, bits) =>
            graft.functions.HilbertIndex(asLong(a), asLong(b), int(bits, "bits"))
          case _ => throw new IllegalArgumentException(
            "hilbert_index(a, b[, bits])")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("maxmatch_pieces"),
      new ExpressionInfo(classOf[graft.functions.MaxMatchPieces].getName,
        "maxmatch_pieces"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, vocab) =>
          graft.functions.MaxMatchPieces(toks,
            strArrayLit(vocab, "maxmatch_pieces vocabulary"))
        case _ => throw new IllegalArgumentException(
          "maxmatch_pieces(tokens, array('piece', ...))")
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (args: Seq[Expression]) => args match {
        // Cast to the aggregate's (DOUBLE, BIGINT) contract — without it
        // an INT score/id passes analysis and then ClassCastExceptions
        // mid-task (the hilbert_index lesson).
        case Seq(score, id, k) =>
          TopKByScore(asDoubleCast(score), asLongCast(id), int(k, "k"))
        case Seq(score, id, k, Literal(d: Boolean, _)) =>
          TopKByScore(asDoubleCast(score), asLongCast(id), int(k, "k"), d)
        case _ => throw new IllegalArgumentException(
          "topk_by_score(score, id, k[, distinctIds]) — aggregate")
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score_payload"),
      new ExpressionInfo(
        classOf[graft.functions.TopKByScorePayload].getName,
        "topk_by_score_payload"),
      (args: Seq[Expression]) => args match {
        case Seq(score, id, payload, k) =>
          graft.functions.TopKByScorePayload(asDoubleCast(score),
            asLongCast(id), asDoubleCast(payload), int(k, "k"))
        case _ => throw new IllegalArgumentException(
          "topk_by_score_payload(score, id, payload, k) — aggregate")
      }))
    ext.injectFunction((
      FunctionIdentifier("script_profile"),
      new ExpressionInfo(classOf[graft.functions.ScriptProfile].getName,
        "script_profile"),
      (args: Seq[Expression]) => graft.functions.ScriptProfile(arity1(args, "script_profile(arg)"))))
    ext.injectFunction((
      FunctionIdentifier("portable_simhash"),
      new ExpressionInfo(classOf[graft.functions.PortableSimHash].getName,
        "portable_simhash"),
      (args: Seq[Expression]) => graft.functions.PortableSimHash(arity1(args, "portable_simhash(arg)"))))
    ext.injectFunction((
      FunctionIdentifier("md5_pair_draw"),
      new ExpressionInfo(classOf[graft.functions.Md5PairDraw].getName,
        "md5_pair_draw"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b, salt) =>
          graft.functions.Md5PairDraw(asLongCast(a), asLongCast(b),
            str(salt, "salt"))
        case _ => throw new IllegalArgumentException(
          "md5_pair_draw(a, b, 'salt')")
      }))
    ext.injectFunction((
      FunctionIdentifier("augment_tokens"),
      new ExpressionInfo(classOf[graft.functions.AugmentTokensExpr].getName,
        "augment_tokens"),
      (args: Seq[Expression]) => args match {
        case Seq(id, toks, pm, pd) =>
          graft.functions.AugmentTokensExpr(id, toks, dbl(pm, "pMask"),
            dbl(pd, "pDrop"), "aug")
        case Seq(id, toks, pm, pd, salt) =>
          graft.functions.AugmentTokensExpr(id, toks, dbl(pm, "pMask"),
            dbl(pd, "pDrop"), str(salt, "salt"))
        case _ => throw new IllegalArgumentException(
          "augment_tokens(idString, tokens, pMask, pDrop[, 'salt'])")
      }))
    ext.injectFunction((
      FunctionIdentifier("gale_church_align"),
      new ExpressionInfo(classOf[graft.functions.GaleChurchAlign].getName,
        "gale_church_align"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.GaleChurchAlign(a, b, 10)
        case Seq(a, b, m) =>
          graft.functions.GaleChurchAlign(a, b, int(m, "maxSentences"))
        case _ => throw new IllegalArgumentException(
          "gale_church_align(sentsA, sentsB[, maxSentences])")
      }))
    ext.injectFunction((
      FunctionIdentifier("token_lcs"),
      new ExpressionInfo(classOf[graft.functions.TokenLcs].getName,
        "token_lcs"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.TokenLcs(a, b, 16)
        case Seq(a, b, m) =>
          graft.functions.TokenLcs(a, b, int(m, "maxTokens"))
        case _ => throw new IllegalArgumentException(
          "token_lcs(toksA, toksB[, maxTokens])")
      }))
  }
}
