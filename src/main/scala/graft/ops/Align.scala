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
