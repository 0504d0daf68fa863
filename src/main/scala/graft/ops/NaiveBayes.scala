package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the classic linear
  * text classifier (quality/domain/spam filtering with labeled seed sets:
  * the role the public curation stacks fill with a cheap linear model
  * before anything neural). Everything is the repo's deterministic
  * integer-ppm discipline:
  *
  *   - vocabulary = top-`vocabSize` corpus tokens by (count desc, token
  *     asc) — [[LanguageModel.electVocab]]'s election, a driver-bounded
  *     artifact;
  *   - likelihood = round(10⁶·ln((c(l,t) + 1) / (T_l + |V|))) per (label,
  *     vocab token), add-one smoothed over the DENSE label × vocab cross
  *     (an unseen pair scores the smoothing floor, never silently skips);
  *   - prior = round(10⁶·ln(n_l / n));
  *   - document score = prior + Σ_occurrences likelihood over IN-VOCAB
  *     token occurrences (out-of-vocab tokens are ignored — the standard
  *     restricted-vocabulary multinomial NB); argmax ties to the
  *     lexicographically LARGER label (the [[TextAnalysis.langId]]
  *     max-struct convention).
  *
  * Scale shape: the model is |labels|·|V| rows (bounded, broadcast); the
  * scoring pass explodes tokens once, semi-joins the vocab, joins the
  * broadcast model, and map-side-combines per (doc, label) — one narrow
  * scan plus label-fan-out partial sums; no row-scale state anywhere.
  * All ln/round calls follow the established round(10⁶·ln) shared
  * convention, so a replaying engine matches bit for bit.
  */
object NaiveBayes {

  /** Trained model: bounded DataFrames (never row-scale).
    *
    * @param priors     (label, n_docs, prior_ppm)
    * @param likelihood (label, token, n, logp_ppm) — dense over
    *                   label × vocab
    */
  case class NbModel(priors: DataFrame, likelihood: DataFrame)

  def train(
      df: DataFrame,
      labelCol: String,
      textCol: String,
      vocab: Seq[String]): NbModel = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val v = vocab.size
    val vocDf = vocab.toDF("token")
    // Null labels are REJECTED from training, loudly documented: a
    // null-label row would otherwise mint a phantom class whose
    // occurrence partials never join back (SQL null ≠ null in the USING
    // join), so its score stays prior-only and wins the argmax for
    // nearly every document — silent predicted = null across the corpus.
    val base = df.select(col(labelCol).cast("string").as("label"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(col("label").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lab = base.groupBy("label").agg(count(lit(1)).as("n_docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // n from the cached label table (not a second raw-corpus count), and
    // labeled rows only — the prior denominator must tile the numerators.
    val n = lab.agg(sum("n_docs")).head().getLong(0)
    require(n > 0, "train: no labeled rows")
    val priors = lab.select(col("label"), col("n_docs"),
      round(lit(1e6) * log(col("n_docs").cast("double") / n))
        .cast("long").as("prior_ppm"))
    val cnt = base
      .select(col("label"), explode(col("__toks")).as("token"))
      .join(broadcast(vocDf), Seq("token"), "left_semi")
      .groupBy("label", "token").agg(count(lit(1)).as("__c"))
    val dense = lab.select("label").crossJoin(broadcast(vocDf))
      .join(cnt, Seq("label", "token"), "left")
      .select(col("label"), col("token"),
        coalesce(col("__c"), lit(0L)).as("n"))
    val tot = dense.groupBy("label").agg(sum("n").as("__t"))
    val likelihood = dense.join(broadcast(tot), "label")
      .select(col("label"), col("token"), col("n"),
        round(lit(1e6) * log((col("n") + 1L).cast("double") /
          (col("__t") + v.toLong))).cast("long").as("logp_ppm"))
      // Materialize the bounded model table BEFORE dropping the corpus
      // cache — unpersisting first deregistered the plan and every later
      // model evaluation re-tokenized the corpus 3+ times.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    likelihood.count()
    base.unpersist(blocking = false)
    NbModel(priors, likelihood)
  }

  /** Score + classify each document under a trained model.
    *
    * @return (id, predicted, score_ppm) — score is the winning label's
    *         prior + Σ in-vocab occurrence likelihoods; docs with zero
    *         in-vocab tokens classify on priors alone.
    */
  def classify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: NbModel): DataFrame = {
    val occ = df.select(col(idCol).as("__id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .join(broadcast(model.likelihood), Seq("token"))
      .groupBy("__id", "label").agg(sum("logp_ppm").as("__s"))
    val scored = df.select(col(idCol).as("__id"))
      .crossJoin(broadcast(model.priors.select("label", "prior_ppm")))
      .join(occ, Seq("__id", "label"), "left")
      .select(col("__id"),
        struct((col("prior_ppm") + coalesce(col("__s"), lit(0L)))
          .as("score_ppm"), col("label")).as("__sl"))
    scored.groupBy("__id")
      .agg(max(col("__sl")).as("__best"))
      .select(col("__id").as(idCol), col("__best.label").as("predicted"),
        col("__best.score_ppm").as("score_ppm"))
  }
}
