package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence-level bitext alignment — the stage after [[Similarity.bitextMine]]
  * in a parallel-corpus pipeline: a mined DOCUMENT pair becomes aligned
  * sentence segments via the integerized Gale–Church DP
  * ([[graft.functions.GaleChurchOps]] — published op priors, first-order
  * length cost, exact int64 cells). One fused expression call per pair:
  * narrow, shuffle-free, embarrassingly parallel — the DP is
  * O(maxSentences²) per row with maxSentences capped (long documents are
  * chunked upstream, the production convention).
  */
object Align {

  /** Align two text columns sentence-by-sentence. Output per row:
    * (id, n_a, n_b, total_cost, n_segments, ops) with `ops` the unique
    * comma-joined "da-db" path.
    */
  def galeChurch(
      df: DataFrame,
      idCol: String,
      textACol: String,
      textBCol: String,
      maxSentences: Int = 10): DataFrame = {
    require(maxSentences >= 1 && maxSentences <= 64,
      s"maxSentences must be in [1, 64], got $maxSentences")
    df.select(col(idCol),
        graft.functions.AlignFunctions.gale_church_align(
          Dedup.sentences(col(textACol)), Dedup.sentences(col(textBCol)),
          maxSentences).as("__al"))
      .select(col(idCol) +:
        Seq("n_a", "n_b", "total_cost", "n_segments", "ops")
          .map(f => col("__al").getField(f).as(f)): _*)
  }

  /** ROUGE-L contamination scoring between a training corpus and a
    * benchmark slice — the *graded* complement of exact n-gram
    * decontamination ([[Curation]]'s 13-gram flag): how MUCH of a
    * benchmark item a training document covers as an in-order
    * subsequence, not just whether one n-gram leaks.
    *
    * Candidate pairs are blocked on shared word `shingleK`-grams with a
    * per-side hot-gram cap (`maxDocsPerGram` — grams in more documents
    * than the cap are dropped on BOTH sides, the Lee-et-al. common-shingle
    * convention, so pair mass per gram is ≤ cap² by construction); each
    * surviving (train, benchmark) pair is scored with the token-LCS DP
    * ([[graft.functions.TokenLcsOps]], both sides truncated to
    * `maxTokens` — the Gale–Church capping convention that also bounds
    * the oracle's wavefront unroll) and reported as
    * `rouge_l_ppm` = ⌊2·lcs·10⁶ / (n_a + n_b)⌋ — the ROUGE-L F with
    * β = 1 over the truncated prefixes.
    *
    * Scale shape: grams are (doc, DISTINCT gram) rows; the hot-gram table
    * is a broadcast anti-join; the pair set is bounded (cap² per gram)
    * and rides broadcasts into the two token-array joins, with arrays
    * pre-truncated so full documents never cross the wire; the DP is a
    * narrow fused expression per pair.
    */
  def rougeLContamination(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchCol: Column,
      shingleK: Int = 3,
      maxDocsPerGram: Long = 100L,
      maxTokens: Int = 16): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 64,
      s"maxTokens must be in [1, 64], got $maxTokens")
    // base is consumed by grams (both hot-gram sides) AND both token-slice
    // joins — without persist each consumer re-tokenizes the whole corpus
    // (the same multi-read Dedup.ngramJaccardPairs documents and fixes).
    // benchCol coalesces to FALSE (train side): a null flag would fall out
    // of BOTH where() sides of the pair join while still inflating the
    // hot-gram census as its own null group — rows would silently vanish
    // from contamination scoring and could knock real grams over the cap.
    val base = docs.select(col(idCol).as("__id"),
      coalesce(benchCol.cast("boolean"), lit(false)).as("__bench"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = base.select(col("__id"), col("__bench"),
      explode(array_distinct(
        TextAnalysis.shinglesFromTokens(col("__t"), shingleK))).as("__g"))
    val hot = grams.groupBy(col("__g"), col("__bench"))
      .agg(count(lit(1)).as("__c"))
      .where(col("__c") > maxDocsPerGram)
      .select(col("__g")).distinct()
    val ok = grams.join(broadcast(hot), Seq("__g"), "left_anti")
    val pairs = ok.where(not(col("__bench")))
      .select(col("__g"), col("__id").as("a_id"))
      .join(ok.where(col("__bench"))
        .select(col("__g"), col("__id").as("b_id")), Seq("__g"))
      .select("a_id", "b_id").distinct()
    val ta = base.select(col("__id").as("a_id"),
      slice(col("__t"), 1, maxTokens).as("__ta"))
    val tb = base.select(col("__id").as("b_id"),
      slice(col("__t"), 1, maxTokens).as("__tb"))
    pairs.join(ta, Seq("a_id")).join(tb, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.AlignFunctions.token_lcs(
          col("__ta"), col("__tb"), maxTokens).as("__l"))
      .select(col("a_id"), col("b_id"),
        col("__l").getField("n_a").as("n_a"),
        col("__l").getField("n_b").as("n_b"),
        col("__l").getField("lcs").cast("long").as("lcs"))
      .withColumn("rouge_l_ppm",
        when(col("n_a") + col("n_b") === 0, lit(0L))
          .otherwise(expr("(2 * lcs * 1000000) DIV (n_a + n_b)")))
  }

  /** Pre-split variant: the sentence arrays are already in hand. */
  def galeChurchArrays(
      df: DataFrame,
      idCol: String,
      sentsACol: Column,
      sentsBCol: Column,
      maxSentences: Int = 10): DataFrame =
    df.select(col(idCol),
        graft.functions.AlignFunctions.gale_church_align(
          sentsACol, sentsBCol, maxSentences).as("__al"))
      .select(col(idCol) +:
        Seq("n_a", "n_b", "total_cost", "n_segments", "ops")
          .map(f => col("__al").getField(f).as(f)): _*)
}
