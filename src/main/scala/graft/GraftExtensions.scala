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
      (args: Seq[Expression]) => SimHash64(args.head)))
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
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sets"),
      new ExpressionInfo(classOf[JaccardSets].getName, "jaccard_sets"),
      (args: Seq[Expression]) => JaccardSets(args(0), args(1))))
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
      (args: Seq[Expression]) => NfcNormalize(args.head)))
    ext.injectFunction((
      FunctionIdentifier("tokenize"),
      new ExpressionInfo(classOf[Tokenize].getName, "tokenize"),
      (args: Seq[Expression]) => Tokenize(args.head)))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdExpression].getName, "lang_id"),
      (args: Seq[Expression]) =>
        LangIdExpression(Tokenize(args.head), graft.ops.TextAnalysis.StopwordProfiles)))
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
      (args: Seq[Expression]) => TokenEntropy(args.head)))
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
          val dict = terms match {
            case ca: org.apache.spark.sql.catalyst.expressions.CreateArray =>
              ca.children.map(c => str(c, "keyword term"))
            case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData,
                org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.StringType, _)) =>
              data.toObjectArray(org.apache.spark.sql.types.StringType)
                .map(_.toString).toSeq
            case other => throw new IllegalArgumentException(
              s"keyword_tags dictionary must be a string-array literal, got $other")
          }
          KeywordTags(text, dict)
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
          val pieces = vocab match {
            case ca: org.apache.spark.sql.catalyst.expressions.CreateArray =>
              ca.children.map(c => str(c, "vocabulary piece"))
            case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData,
                org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.StringType, _)) =>
              data.toObjectArray(org.apache.spark.sql.types.StringType)
                .map(_.toString).toSeq
            case other => throw new IllegalArgumentException(
              s"maxmatch_pieces vocabulary must be a string-array literal, got $other")
          }
          graft.functions.MaxMatchPieces(toks, pieces)
        case _ => throw new IllegalArgumentException(
          "maxmatch_pieces(tokens, array('piece', ...))")
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (args: Seq[Expression]) => args match {
        case Seq(score, id, k) => TopKByScore(score, id, int(k, "k"))
        case Seq(score, id, k, Literal(d: Boolean, _)) =>
          TopKByScore(score, id, int(k, "k"), d)
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
          graft.functions.TopKByScorePayload(score, id, payload, int(k, "k"))
        case _ => throw new IllegalArgumentException(
          "topk_by_score_payload(score, id, payload, k) — aggregate")
      }))
    ext.injectFunction((
      FunctionIdentifier("script_profile"),
      new ExpressionInfo(classOf[graft.functions.ScriptProfile].getName,
        "script_profile"),
      (args: Seq[Expression]) => graft.functions.ScriptProfile(args.head)))
    ext.injectFunction((
      FunctionIdentifier("portable_simhash"),
      new ExpressionInfo(classOf[graft.functions.PortableSimHash].getName,
        "portable_simhash"),
      (args: Seq[Expression]) => graft.functions.PortableSimHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("md5_pair_draw"),
      new ExpressionInfo(classOf[graft.functions.Md5PairDraw].getName,
        "md5_pair_draw"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b, salt) =>
          graft.functions.Md5PairDraw(a, b, str(salt, "salt"))
        case _ => throw new IllegalArgumentException(
          "md5_pair_draw(a, b, 'salt')")
      }))
    ext.injectFunction((
      FunctionIdentifier("augment_tokens"),
      new ExpressionInfo(classOf[graft.functions.AugmentTokensExpr].getName,
        "augment_tokens"),
      (args: Seq[Expression]) => args match {
        case Seq(id, toks, Literal(pm: Double, _), Literal(pd: Double, _)) =>
          graft.functions.AugmentTokensExpr(id, toks, pm, pd, "aug")
        case Seq(id, toks, Literal(pm: Double, _), Literal(pd: Double, _),
            salt) =>
          graft.functions.AugmentTokensExpr(id, toks, pm, pd,
            str(salt, "salt"))
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
