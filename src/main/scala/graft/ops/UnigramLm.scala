package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece unigram model, Kudo
  * 2018) — the third member of the tokenizer family next to [[Bpe]] and
  * WordPiece: pieces are scored by corpus log-probability and a word's
  * segmentation is the VITERBI maximum-likelihood path over its
  * substrings, not a greedy longest-match or merge replay.
  *
  * Determinism contract (the [[Bpe.learnMerges]] policy): the vocabulary
  * is frequency-scored (no float EM — fixed-point selection by
  * (count desc, piece asc)), piece scores are round(10⁶·ln(n/total))
  * integer ppm (the PMI/DSIR ln convention), and Viterbi ties break by
  * (fewer pieces, then longest final piece) — every step replayable
  * bit-for-bit in SQL.
  *
  * Scale shape mirrors the BPE encoder: one corpus-sized token count
  * (map-side combined), then EVERYTHING runs on the distinct-word table —
  * substring candidates are |word|·maxPieceLen per DISTINCT word, the
  * vocabulary is a driver-bounded artifact (vocabSize rows), and the
  * Viterbi DP is O(|word|·maxPieceLen) per distinct word against a
  * broadcast piece map. The corpus text is scanned exactly once.
  */
object UnigramLm {

  /** Candidate piece counts: every substring of length 1..maxPieceLen of
    * every distinct word, weighted by the word's corpus occurrence count.
    *
    * `maxFitWordLen` is a junk-token cutoff, not a linguistic knob: the
    * substring census is |w|·maxPieceLen candidates per DISTINCT word, so
    * one unbroken megabyte token (minified JS, base64 — whitespace
    * tokenization keeps it whole) would materialize millions of strings
    * in a single row's array before the explode. No natural-language word
    * approaches 256 code points; the encoder routes over-long words whole
    * at the unknown score anyway.
    */
  def pieceCounts(
      df: DataFrame, textCol: String, maxPieceLen: Int,
      maxFitWordLen: Int = 256): DataFrame = {
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) <= maxFitWordLen)
      .groupBy("w").agg(count(lit(1)).as("wc"))
    words
      .select(col("wc"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - i + 1)),
          l => col("w").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum("wc").as("n"))
  }

  /** Fit the vocabulary: ALL single-character pieces (the coverage
    * guarantee — every word stays segmentable) plus the top
    * `vocabSize − #chars` multi-character pieces by (count desc, piece
    * asc). Scores are round(10⁶·ln(n / total)) with total = Σn over the
    * KEPT pieces — the within-vocab unigram normalization.
    *
    * @return (piece, n, score_ppm), vocabSize-bounded (or #chars if the
    *         character inventory alone exceeds vocabSize).
    */
  def fitVocab(
      df: DataFrame,
      textCol: String,
      vocabSize: Int = 300,
      maxPieceLen: Int = 6): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val pc = pieceCounts(df, textCol, maxPieceLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chars = pc.where(length(col("piece")) === 1)
    val nChars = chars.count()
    val keepMulti = math.max(0L, vocabSize - nChars).toInt
    val kept = chars.unionByName(
      pc.where(length(col("piece")) > 1)
        .orderBy(desc("n"), col("piece")).limit(keepMulti))
    val total = kept.agg(sum("n")).first().getLong(0)
    val out = kept.select(col("piece"), col("n"),
      round(lit(1e6) * log(col("n").cast("double") / total))
        .cast("long").as("score_ppm"))
    out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .count() // materialize before the candidate table unpersists
    pc.unpersist(blocking = false)
    out
  }

  /** Viterbi maximum-likelihood segmentation of one word. Ties break to
    * FEWER pieces, then to the LONGEST final piece (smaller split point —
    * enforced by ascending split iteration with strictly-better updates).
    * Words longer than `maxWordLen` return whole at the unknown score
    * (the byte-fallback route production tokenizers take); characters
    * outside the vocabulary score `unkScorePpm`.
    */
  private[ops] def viterbi(
      w: String,
      vocab: Map[String, Long],
      maxPieceLen: Int,
      maxWordLen: Int,
      unkScorePpm: Long): (Seq[String], Long) = {
    // Code POINTS, not UTF-16 units: fitVocab's SQL substr enumerates
    // pieces by code point, so the DP must window the same way — a
    // unit-based walk would test broken half-surrogate substrings on
    // non-BMP text (emoji, rare CJK) and could never match a
    // supplementary-character vocab piece longer than maxPieceLen units.
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n > maxWordLen) return (Seq(w), unkScorePpm)
    def piece(i: Int, j: Int): String = new String(cps, i, j - i)
    val score = Array.fill(n + 1)(Long.MinValue)
    val np = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    score(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val s = vocab.getOrElse(piece(i, j),
          if (j - i == 1) unkScorePpm else Long.MinValue)
        if (s != Long.MinValue && score(i) != Long.MinValue) {
          val cs = score(i) + s
          val cn = np(i) + 1
          if (cs > score(j) || (cs == score(j) && cn < np(j))) {
            score(j) = cs; np(j) = cn; back(j) = i
          }
        }
        i += 1
      }
      j += 1
    }
    val stack = new scala.collection.mutable.ArrayBuffer[String](np(n))
    var k = n
    while (k > 0) { stack += piece(back(k), k); k = back(k) }
    (stack.reverse.toSeq, score(n))
  }

  /** One HARD-EM refit round (the SentencePiece training loop's E+M with
    * Viterbi hard assignments instead of lattice expectations — fully
    * deterministic): E-step = Viterbi-encode every distinct word under
    * the current vocabulary ([[encodeWords]]); M-step = piece usage
    * counts weighted by word frequency, single-character pieces floored
    * to usage 1 (the coverage guarantee survives the round), unused
    * multi-char pieces pruned, fresh round(10⁶·ln(n/total)) scores over
    * the kept usage mass. Usage is restricted to the CURRENT vocabulary
    * (unknown fallback pieces — unseen chars, over-long words routed
    * whole — never enter).
    *
    * @return (piece, n, score_ppm) — the next round's vocabulary, same
    *         shape as [[fitVocab]].
    */
  def refitVocab(
      df: DataFrame,
      textCol: String,
      vocab: Seq[(String, Long)],
      maxPieceLen: Int = 6,
      maxWordLen: Int = 16,
      unkScorePpm: Long = -30000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Piece usage from the ARRAY-typed Viterbi path — never the '|'-joined
    // presentation string, whose separator a pathological token in an
    // arbitrary text column could contain (the encode is over tokens()
    // output today, but this op must not depend on that invariant).
    val use = encodeWordPieces(df, textCol, vocab, maxPieceLen, maxWordLen,
        unkScorePpm)
      .select(explode(col("piece_arr")).as("piece"), col("n"))
      .groupBy("piece").agg(sum("n").as("u"))
    val kept = vocab.map(_._1).toDF("piece")
      .join(use, Seq("piece"), "left")
      .select(col("piece"),
        when(length(col("piece")) === 1,
          greatest(coalesce(col("u"), lit(0L)), lit(1L)))
          .otherwise(coalesce(col("u"), lit(0L))).as("n"))
      .where(col("n") >= 1L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = kept.agg(sum("n")).first().getLong(0)
    val out = kept.select(col("piece"), col("n"),
      round(lit(1e6) * log(col("n").cast("double") / total))
        .cast("long").as("score_ppm"))
    out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .count()
    kept.unpersist(blocking = false)
    out
  }

  /** Segment every distinct word of the corpus under a fitted vocabulary
    * (piece → score_ppm, the driver-bounded [[fitVocab]] artifact).
    *
    * @return (word, n, pieces, n_pieces, score_ppm) — `pieces` is the
    *         '|'-joined Viterbi path (presentation form; [[refitVocab]]
    *         consumes the array-typed path instead), `n` the word's
    *         occurrence count.
    */
  def encodeWords(
      df: DataFrame,
      textCol: String,
      vocab: Seq[(String, Long)],
      maxPieceLen: Int = 6,
      maxWordLen: Int = 16,
      unkScorePpm: Long = -30000000L): DataFrame =
    encodeWordPieces(df, textCol, vocab, maxPieceLen, maxWordLen,
      unkScorePpm)
      .select(col("word"), col("n"),
        array_join(col("piece_arr"), "|").as("pieces"),
        col("n_pieces"), col("score_ppm"))

  /** [[encodeWords]] with the Viterbi path as an ARRAY column
    * (word, n, piece_arr, n_pieces, score_ppm) — the form downstream
    * aggregation should consume: no separator convention to collide with
    * piece contents.
    */
  private[ops] def encodeWordPieces(
      df: DataFrame,
      textCol: String,
      vocab: Seq[(String, Long)],
      maxPieceLen: Int,
      maxWordLen: Int,
      unkScorePpm: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toMap)
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .as[(String, Long)]
      .map { case (w, wc) =>
        val (pieces, s) = viterbi(w, bc.value, maxPieceLen, maxWordLen,
          unkScorePpm)
        (w, wc, pieces, pieces.length.toLong, s)
      }
      .toDF("word", "n", "piece_arr", "n_pieces", "score_ppm")
  }
}
