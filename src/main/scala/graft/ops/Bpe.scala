package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE (byte-pair-encoding) merge learning — tokenizer
  * induction from the corpus itself (Sennrich et al. 2016), the step a
  * training-data pipeline runs before token counting, chunking, and
  * packing can be meaningful.
  *
  * The classic trainer is a single-machine priority-queue loop; at corpus
  * scale the standard reformulation (the one Sennrich's own learner uses)
  * is WORD-COUNT space: tokenize once, aggregate to (word, count) —
  * vocabulary-sized, not corpus-sized — then iterate merges over that
  * compact table. Spark shape per merge step:
  *
  *   - pair counting: one explode of adjacent symbol pairs weighted by the
  *     word count, map-side-combined groupBy — a vocabulary-sized shuffle;
  *   - argmax: `orderBy(count desc, pair).limit(1)` — a k=1
  *     TakeOrderedAndProject, ONE row to the driver per step (bounded by
  *     construction, like the centroid collects);
  *   - merge application: a narrow mapPartitions over the word table
  *     rewriting symbol arrays left-to-right (non-overlapping, the BPE
  *     contract).
  *
  * Each step persists the rewritten word table and unpersists the
  * previous one, so N merges are N bounded jobs over a table that SHRINKS
  * as merges fuse symbols. For production vocab sizes batch several
  * non-overlapping merges per round (max-heap prefix whose pairs share no
  * symbol) — the round count drops ~10×; this implementation keeps one
  * merge per round, which is exact and already corpus-size-independent
  * after the initial count.
  *
  * Correctness: the step-0 pair counts are SQL-oracle-able
  * (`q_bpe_pairs`); the iterative fixpoint is pinned by BpeSpec's
  * hand-computed merge sequences (the Sennrich "low/lower/newest/widest"
  * example), because each step's input tokenization depends on the
  * previous step's argmax — not expressible as one SQL query.
  */
object Bpe {

  /** End-of-word marker, appended as a separate terminal symbol so merges
    * distinguish "er" inside a word from "er" at the end (Sennrich §3.2).
    */
  val EndOfWord = "</w>"

  /** (word, count) table of the corpus under the engine-standard
    * tokenizer, with the symbol-array start state: one symbol per Unicode
    * code point plus the [[EndOfWord]] terminal.
    */
  def wordSymbolCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(
        concat(
          // split-by-empty yields code UNITS with a trailing "" under
          // Java's limit=-1 semantics — drop empties. (Astral-plane code
          // points split into surrogate halves; merges re-fuse them, so
          // learned tokens stay byte-valid for BMP + fused-astral text.)
          filter(split(col("w"), ""), c => c =!= ""),
          array(lit(EndOfWord))).as("syms"),
        col("cnt"))

  /** Adjacent-pair counts over a symbol table — one weighted explode +
    * one map-side-combined aggregation.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"),
        explode(when(size(col("syms")) < 2,
            array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(
            sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r"))))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("n"))

  /** Rewrite one word's symbols, fusing every non-overlapping left-to-right
    * occurrence of (l, r) — the BPE merge application.
    */
  private[ops] def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Apply a learned merge sequence to one word's symbols, in learning
    * order. Sequential application equals the canonical rank-priority
    * encoder: a step-k merge can only create a symbol first formed at
    * step k, and every earlier pair's symbols already existed at that
    * earlier step — so merging step k can never create a new occurrence
    * of a step-j (j < k) pair, and one ordered pass per merge suffices.
    */
  def applyMerges(syms: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(syms) { case (s, (l, r)) => applyMerge(s, l, r) }

  /** Corpus token counts under a learned BPE vocabulary — the ENCODE side
    * of the trainer (what turns "how many tokens is this corpus" from a
    * whitespace guess into the real tokenizer's answer). Scale shape: the
    * merge application runs over the VOCABULARY-sized (word, count) table,
    * never the corpus — after the initial word count (one corpus-sized
    * map-side-combined aggregation, shared with [[learnMerges]]), every
    * stage is bounded by distinct-word cardinality.
    */
  def encodeTokenCounts(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ms = merges.toIndexedSeq
    wordSymbolCounts(df, textCol)
      .as[(Seq[String], Long)]
      .map { case (syms, cnt) => (applyMerges(syms, ms), cnt) }
      .toDF("syms", "cnt")
      .select(explode(col("syms")).as("token"), col("cnt"))
      .groupBy("token").agg(sum("cnt").as("n"))
  }

  /** Learn the first `numMerges` BPE merges. Returns the merge table
    * (step, left, right, pair_count) in learning order — ties in the pair
    * count break lexicographically on (left, right), so the sequence is
    * deterministic and engine-independent.
    */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = wordSymbolCounts(df, textCol)
      .as[(Seq[String], Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The previous round's word table: unpersisted only AFTER the argmax
    // job has materialized the current round's persist (so an executor
    // loss mid-job recovers from the parent snapshot, not a full corpus
    // re-scan) — at most two snapshots are ever live, and no separate
    // materialize-count job runs per step (the next round's pair count IS
    // the materializer; fusing it saves one full-table job per merge).
    var prev: Option[Dataset[(Seq[String], Long)]] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val top = pairCounts(words.toDF("syms", "cnt"))
        .orderBy(desc("n"), col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      top.headOption match {
        case None => exhausted = true
        case Some((l, r, n)) =>
          merges += ((step, l, r, n))
          val next = words
            .map { case (syms, cnt) => (applyMerge(syms, l, r), cnt) }
            .persist(StorageLevel.MEMORY_AND_DISK)
          prev = Some(words)
          words = next
          step += 1
      }
    }
    words.unpersist()
    prev.foreach(_.unpersist(blocking = false))
    merges.result()
      .toDF("step", "left", "right", "pair_count")
      .select(col("step").cast("int").as("step"), col("left"), col("right"),
        col("pair_count"))
  }
}
