package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: benchmark
  * decontamination, C4-style document cleaning, context-window chunking, and
  * stream packing. Like [[TextAnalysis]], everything that can be a narrow
  * `Column` composition is one (codegen'd, shuffle-free); the two operators
  * that need data movement (`decontaminate`'s candidate join, `packStream`'s
  * per-shard ordering) are shaped so the moved bytes stay small and bounded
  * no matter the corpus size.
  */
object Curation {

  /** Guard for operators that `cast("long")` their id internally: a
    * string/UUID id would cast to NULL and rows would silently VANISH
    * from samples (TopK aggregates skip null ids) or misjoin — fail
    * loudly instead. Callers with non-numeric ids should first mint a
    * distinct long (e.g. `xxhash64(id)` + collision check, or
    * `monotonically_increasing_id`).
    */
  private[ops] def requireIntegralId(df: DataFrame, idCol: String,
      op: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"$op needs an integral id column; '$idCol' is $dt — cast or hash " +
          "the id to a distinct long first")
    }
  }

  /** Benchmark decontamination: count distinct word k-grams each training
    * document shares with each benchmark/eval document, keeping pairs with
    * at least `minShared` overlaps (the n-gram-collision test-set filter of
    * Brown et al. 2020 App. C / Gao et al. 2020 §4).
    *
    * Scale shape: eval sets are SMALL by nature (thousands of docs), so the
    * benchmark side's exploded (shingle-hash, bench-id) table is broadcast;
    * the 100 TB training side is a narrow scan whose per-doc shingle
    * fan-out meets the broadcast map-side. The only exchange is the final
    * (train-id, bench-id) count aggregation — partial aggregation collapses
    * it to one row per surviving pair per task, no text or shingle payload.
    * Both sides emit DISTINCT shingles, so `count(*)` after the join is
    * exactly |shared distinct k-grams|.
    */
  def decontaminate(
      train: DataFrame,
      trainId: String,
      trainText: String,
      bench: DataFrame,
      benchId: String,
      benchText: String,
      k: Int = 3,
      minShared: Int = 2): DataFrame = {
    // Staged tokens + the fused ShingleHashes kernel (no shingle strings are
    // ever built — the string path benched ~3× slower on the train side).
    val trainSh = train
      .select(col(trainId).as("doc_id"),
        graft.functions.TextFunctions.tokenize(col(trainText)).as("__t"))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingle_hashes(col("__t"), k))
          .as("__sh"))
    val benchSh = bench
      .select(col(benchId).as("bench_id"),
        graft.functions.TextFunctions.tokenize(col(benchText)).as("__t"))
      .select(col("bench_id"),
        explode(graft.functions.TextFunctions.shingle_hashes(col("__t"), k))
          .as("__sh"))
    trainSh.join(broadcast(benchSh), "__sh")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Line predicate for [[c4Filter]]: a line survives when it ends in
    * terminal punctuation and carries at least `minWords` space-separated
    * words (Raffel et al. 2020 §2.2's sentence-terminal and short-line
    * rules). Space-split (not [[TextAnalysis.tokens]]) on purpose — line
    * hygiene is about the raw text, and the simple split keeps the rule
    * byte-identical in any SQL engine.
    */
  private def lineKept(line: Column, minWords: Int): Column = {
    val t = rtrim(line)
    (t.endsWith(".") || t.endsWith("!") || t.endsWith("?") || t.endsWith("\"")) &&
      size(filter(split(line, " "), w => w =!= "")) >= minWords
  }

  /** C4-style cleaning audit (Raffel et al. 2020 §2.2): per-document line
    * retention counts plus the document-level drop rules (minimum sentence
    * count, "lorem ipsum", curly braces ≈ code, bad-word hits) and the
    * final `keep` verdict. Emits measurements rather than silently dropping
    * so a pipeline can report WHY each document fell. Pure narrow column
    * work — shuffle-free at any corpus size.
    */
  def c4Filter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      badWords: Seq[String] = Seq("badword1", "badword2"),
      minSentences: Int = 3,
      minLineWords: Int = 5): DataFrame = {
    val text = col(textCol)
    val lines = split(text, "\n")
    val kept = filter(lines, l => lineKept(l, minLineWords))
    val nSentences = size(regexp_extract_all(text, lit("[.!?]"), lit(0)))
    val lower = graft.functions.TextFunctions.tokenize(text)
    val hasLorem = contains(lcase(text), lit("lorem ipsum"))
    val hasBrace = contains(text, lit("{"))
    val hasBad = size(array_intersect(lower, array(badWords.map(lit): _*))) > 0
    df.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      nSentences.cast("long").as("n_sentences"),
      hasLorem.cast("int").as("has_lorem"),
      hasBrace.cast("int").as("has_brace"),
      hasBad.cast("int").as("has_badword"),
      (size(kept) > 0 && nSentences >= minSentences &&
        !hasLorem && !hasBrace && !hasBad).cast("int").as("keep"))
  }

  /** Context-window chunking: split each document's token stream into
    * windows of `chunkSize` tokens advancing by `stride` (overlapping when
    * `stride < chunkSize` — the standard sliding-window prep for embedding
    * or training-sequence generation). A document emits
    * `1 + ceil(max(0, n - chunkSize) / stride)` chunks (the final one may be
    * short); empty documents emit none. Narrow per-row fan-out — the
    * explode multiplies rows but never shuffles.
    */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 32,
      stride: Int = 16): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val staged = df.select(col(idCol),
      graft.functions.TextFunctions.tokenize(col(textCol)).as("__t"))
    val n = size(col("__t"))
    val nChunks =
      lit(1) + floor((greatest(n - chunkSize, lit(0)) + stride - 1)
        / lit(stride.toDouble)).cast("int")
    val chunks = when(n === 0, array().cast("array<array<string>>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => slice(col("__t"), i * stride + 1, lit(chunkSize))))
    staged
      .select(col(idCol), col("__t"), posexplode(chunks))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Stable per-row uniform draw for reproducible sampling: the first 8 hex
    * chars of `md5(id-salt)`, compared LEXICOGRAPHICALLY against hex
    * thresholds from [[hexThreshold]]. Hash-based rather than `rand()` so
    * the decision is a pure function of (id, salt) — re-runs, retries, and
    * different engines all agree row by row, which is what makes a 100 TB
    * train/test split auditable (and lets an independent SQL engine verify
    * it exactly).
    */
  def hashDraw(id: Column, salt: String): Column =
    substring(md5(concat(id.cast("string"), lit("-" + salt)).cast("binary")), 1, 8)

  /** 8-hex-digit threshold with P(draw < threshold) = frac (draw uniform on
    * 2^32 values). `frac = 1` returns `"g"` — lexicographically above every
    * hex string, so ALL rows pass (an 8-hex threshold could never admit the
    * top draw).
    */
  def hexThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0,1]")
    val v = math.round(frac * 4294967296.0)
    if (v >= 4294967296L) "g" else f"$v%08x"
  }

  /** Deterministic Bernoulli sample: keeps rows whose [[hashDraw]] falls
    * under `frac`'s threshold. Narrow, shuffle-free, reproducible.
    */
  def deterministicSample(df: DataFrame, idCol: String, frac: Double,
      salt: String = "graft"): DataFrame =
    df.where(hashDraw(col(idCol), salt) < hexThreshold(frac))

  /** Hash-derived uniform u ∈ [0, 1): the first 13 hex digits (52 bits) of
    * the salted md5, so the value is EXACTLY representable as a double and
    * any engine parsing the same hex gets the bit-identical u.
    */
  def hashUniform(id: Column, salt: String): Column =
    (conv(substring(md5(concat(id.cast("string"), lit("-" + salt))
        .cast("binary")), 1, 13), 16, 10).cast("double")
      / lit(4503599627370496.0)) // 2^52

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006, A-ES): each row gets key = u^(1/w) with u a
    * hash-derived uniform ([[hashUniform]]) and w its weight; the k largest
    * keys are the sample, distributed per-item exactly as sequential
    * weighted sampling without replacement. No RNG state: the sample is a
    * pure function of (id, salt, weights) — identical across retries,
    * partitionings, and engines, which is what makes a 100 TB sampling job
    * auditable and resumable. One narrow pass + a k-bounded TakeOrdered —
    * the full corpus is never sorted or materialized.
    *
    * Ordering is on the key DOUBLE (ties broken by id); the key itself is
    * a `pow` whose last ulp may differ across libm implementations, so
    * cross-engine checks should compare the SELECTED ROWS, not the key
    * values (rank flips need near-tied keys — measure-zero for hash-derived
    * uniforms).
    */
  /** Deterministic token-level corruption (the mask/dropout augmentation
    * a denoising or contrastive pipeline applies per epoch): per
    * (document, position) one md5 uniform decides
    * mask (u < pMask) / drop (pMask ≤ u < pMask + pDrop) / keep, so the
    * corrupted corpus is a PURE FUNCTION of (id, position, salt) — the
    * [[hashUniform]] policy: re-runs, retries, and independent engines
    * corrupt token-for-token identically, and an epoch-specific salt
    * gives each epoch a fresh corruption with zero RNG state to
    * checkpoint. Output: (id, n_tokens, n_masked, n_dropped, aug_text).
    *
    * Scale shape: one narrow pass. The per-token draw, decision counts,
    * and corrupted text are all computed by ONE fused codegen expression
    * ([[graft.functions.AugmentOps]]) staged in its own projection — the
    * earlier composed HOF form re-evaluated the interpreted per-token md5
    * once per consumer (the thrice-measured no-CSE price, sf1 ratio
    * 6.7×). No shuffle, no RNG, no UDF.
    */
  def augmentTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      pMask: Double = 0.1,
      pDrop: Double = 0.1,
      salt: String = "aug"): DataFrame = {
    require(pMask >= 0 && pDrop >= 0 && pMask + pDrop <= 1,
      s"need pMask, pDrop >= 0 and pMask + pDrop <= 1: $pMask, $pDrop")
    df.select(col(idCol),
        graft.functions.TextFunctions.augment_tokens(
          col(idCol).cast("string"), TextAnalysis.tokens(col(textCol)),
          pMask, pDrop, salt).as("__a"))
      .select(col(idCol),
        col("__a").getField("n_tokens").as("n_tokens"),
        col("__a").getField("n_masked").as("n_masked"),
        col("__a").getField("n_dropped").as("n_dropped"),
        col("__a").getField("aug_text").as("aug_text"))
  }

  /** Assemble per-conversation transcripts from an event stream — the
    * dialogue-data prep stage (chat fine-tuning corpora are built by
    * exactly this regroup: scattered turn events → one ordered
    * transcript per conversation). Turns order by (ts, tie) — `tieCol`
    * must be unique per conversation, making the order TOTAL and the
    * transcript a deterministic pure function of the event multiset
    * (collect_list's arrival order never shows: sort_array re-sorts).
    *
    * Scale shape: ONE map-side-combined groupBy on the conversation key;
    * the aggregation buffer holds one conversation's turns — chat
    * conversations are bounded by construction, and `maxTurns` caps the
    * transcript (earliest kept) so a runaway key cannot blow the buffer
    * while `n_events` still reports the true size for auditing.
    *
    * Output: (conv, n_events, n_turns, transcript) with turns rendered
    * "role: text" and joined by newlines.
    */
  def chatAssembly(
      df: DataFrame,
      convCol: String,
      tsCol: String,
      tieCol: String,
      roleCol: String,
      textCol: String,
      maxTurns: Int = 1000): DataFrame = {
    require(maxTurns >= 1, s"maxTurns must be >= 1, got $maxTurns")
    // The cap is applied BEFORE the collect (rank over the full sort key,
    // so the cut is deterministic even with duplicate timestamps): a
    // slice-after-collect_list would still buffer a runaway key's every
    // event in one aggregation buffer before trimming — the window
    // operator is sort-based and streams, so memory stays O(maxTurns)
    // per key. Both windows share the conv partitioning: one exchange.
    import org.apache.spark.sql.expressions.Window
    val turn = struct(
      col(tsCol).as("ts"), col(tieCol).as("tie"),
      // Null role/text coalesce to '' BEFORE aggregation: array_join
      // silently skips null elements, which would drop turns from the
      // transcript while n_turns still counted them.
      coalesce(col(roleCol).cast("string"), lit("")).as("role"),
      coalesce(col(textCol).cast("string"), lit("")).as("txt"))
    df.select(col(convCol), turn.as("__turn"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(convCol)).orderBy(col("__turn"))))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col(convCol))))
      .where(col("__rn") <= maxTurns)
      .groupBy(col(convCol))
      .agg(max(col("__n")).as("n_events"),
        sort_array(collect_list(col("__turn"))).as("__t"))
      .select(col(convCol), col("n_events"),
        size(col("__t")).cast("long").as("n_turns"),
        array_join(transform(col("__t"),
          s => concat(s.getField("role"), lit(": "), s.getField("txt"))),
          "\n").as("transcript"))
  }

  /** Filter-cascade attrition report — the per-stage funnel every
    * curation pipeline publishes (how many documents each rule dropped,
    * in order): documents are charged to their FIRST failing stage, so
    * the stage counts tile the corpus exactly (Σ dropped + survivors =
    * total) and re-ordering stages changes the attribution, exactly as
    * it does in the real pipeline.
    *
    * Scale shape: ONE corpus pass — every stage predicate is computed
    * once into its own staged column, the first-failing-stage index is a
    * when-chain over those materialized booleans, and one map-side-
    * combined groupBy yields ≤ stages+1 rows; the driver only touches
    * that bounded table to unroll the cumulative funnel. Output one row
    * per stage: (stage_idx, stage, n_in, n_dropped, n_out).
    */
  def filterCascade(
      df: DataFrame,
      idCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val spark = df.sparkSession
    val staged = df.select(col(idCol) +:
      stages.zipWithIndex.map { case ((_, c), i) => c.as(s"__s$i") }: _*)
    val firstFail = stages.indices.reverse.foldLeft(lit(0)) { (rest, i) =>
      // NULL predicate = FAIL at this stage, matching what df.where(pred)
      // does in the real pipeline (null-valued predicates drop the row);
      // a bare !col would pass null through to the survivor branch.
      when(!coalesce(col(s"__s$i"), lit(false)), lit(i + 1)).otherwise(rest)
    }
    val counts = staged.select(firstFail.as("__ff"))
      .groupBy(col("__ff")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    var reached = total
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      val dropped = counts.getOrElse(i + 1, 0L)
      val row = ((i + 1).toLong, name, reached, dropped, reached - dropped)
      reached -= dropped
      row
    }
    import spark.implicits._
    rows.toDF("stage_idx", "stage", "n_in", "n_dropped", "n_out")
  }

  def weightedSample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String = "graft-ws"): DataFrame =
    df.withColumn("__wsk",
        when(weight > 0,
          pow(hashUniform(col(idCol), salt), lit(1.0) / weight))
          .otherwise(raise_error(concat(
            lit("A-ES sampling: weight must be > 0 (got null/<=0) for id "),
            col(idCol).cast("string")))))
      .orderBy(col("__wsk").desc, col(idCol))
      .limit(k)
      .drop("__wsk")

  /** Stratified [[weightedSample]]: the A-ES top-k PER GROUP (per language,
    * source, quality bucket — the shape corpus subsampling actually runs).
    * Same determinism contract as the global form. The per-group top-k is
    * the k-bounded [[graft.functions.TopKByScore.topk_by_score]]
    * aggregate, so the exchange carries ≤ tasks × groups × k rows — NOT a
    * per-group `row_number()` window, whose exchange would be corpus-sized
    * and collapse on few-group strata. Emits (group, id).
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String = "graft-ws"): DataFrame = {
    requireIntegralId(df, idCol, "weightedSamplePerGroup")
    df.select(col(groupCol), col(idCol).cast("long").as(idCol),
        when(weight > 0,
          pow(hashUniform(col(idCol), salt), lit(1.0) / weight))
          .otherwise(raise_error(concat(
            lit("A-ES sampling: weight must be > 0 (got null/<=0) for id "),
            col(idCol).cast("string")))).as("__wsk"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKByScore.topk_by_score(
        col("__wsk"), col(idCol), k).as("__top"))
      .select(col(groupCol), explode(col("__top")).as("__e"))
      .select(col(groupCol), col("__e.id").as(idCol))
  }

  /** Reproducible train/valid/test split: `splits` are (label, fraction)
    * with fractions summing to ≤ 1 (remainder → last label). Assignment is
    * by cumulative threshold on the row's [[hashDraw]] — adding rows never
    * reassigns existing ones. Emits (id, draw, split).
    */
  def splitCorpus(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val draw = hashDraw(col(idCol), salt)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((label, _), hi), rest) =>
      when(draw < hexThreshold(hi), label).otherwise(rest)
    }
    df.select(col(idCol), draw.as("draw"), assigned.as("split"))
  }

  /** N-gram novelty against a reference corpus: for every candidate
    * document, the fraction of its distinct word k-grams NOT present
    * anywhere in `ref` — the memorization/overlap analysis a pipeline
    * runs before adding a new crawl to an existing corpus (novelty ≈ 0 ⇒
    * rehash of what is already held; ≈ 1 ⇒ genuinely new text). The
    * complement of [[decontaminate]]'s pair view: scored per candidate,
    * against the reference set as a whole.
    *
    * Scale shape: both sides reduce to (key, gram-hash) rows via the
    * fused ShingleHashes kernel (distinct per doc, no gram strings); the
    * reference set is globally distinct'd and met with a HASH-KEYED
    * join — at 100 TB the reference gram set is itself huge, so unlike
    * the eval-sized decontaminate build side it is NOT broadcast; both
    * shuffles carry hashes only. Final per-doc aggregation is
    * map-side-combined counts; novelty is an integer-ratio double
    * (bit-exact cross-engine).
    */
  def noveltyScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ref: DataFrame,
      refTextCol: String,
      k: Int = 3): DataFrame = {
    val docG = df
      .select(col(idCol).as("id"),
        graft.functions.TextFunctions.tokenize(col(textCol)).as("__t"))
      .select(col("id"),
        explode(graft.functions.TextFunctions.shingle_hashes(col("__t"), k))
          .as("gh"))
    val refG = ref
      .select(graft.functions.TextFunctions.tokenize(col(refTextCol)).as("__t"))
      .select(explode(
        graft.functions.TextFunctions.shingle_hashes(col("__t"), k)).as("gh"))
      .distinct()
      .withColumn("__known", lit(1L))
    val per = docG.join(refG, Seq("gh"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__known"), lit(0L))).as("n_known"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        (lit(1.0) - coalesce(col("n_known"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)))
          .as("novelty"))
  }

  /** Eval-integrity audit: how many DUPLICATE pairs does a hash split put
    * on opposite sides of a split boundary? Exact-duplicate pairs (same
    * md5 of text) that land in different splits of [[splitCorpus]] are
    * train/test leakage — the thing a per-document hash split cannot see.
    * Returns one row per unordered split pair (split_a ≤ split_b) with
    * the duplicate-pair count; off-diagonal rows are the leak.
    *
    * Scale shape: pair counts are computed COMBINATORIALLY from per-
    * (hash, split) group sizes — n_a·n_b across splits, C(n,2) within —
    * never by materializing id pairs: an id-level self-join would emit a
    * quadratic row count for one large duplicate group (10⁶ identical
    * boilerplate docs ⇒ ~5·10¹¹ join rows in a single task). One groupBy
    * on the 128-bit content hash, a bounded |splits|²-fan-out join on the
    * hash, then a tiny split-pair aggregation — identical counts.
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    val assigned = splitCorpus(df, idCol, splits, salt)
      .select(col(idCol).as("id"), col("split"))
    val perSplit = df.select(col(idCol).as("id"),
        md5(col(textCol).cast("binary")).as("h"))
      .join(assigned, Seq("id"))
      .groupBy(col("h"), col("split"))
      .agg(count(lit(1)).as("n"))
    perSplit.as("a")
      .join(perSplit.as("b"),
        col("a.h") === col("b.h") && col("a.split") <= col("b.split"))
      .select(col("a.split").as("split_a"), col("b.split").as("split_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      // Integer DIV, not Column `/` (double): group counts stay exact.
      .select(col("split_a"), col("split_b"),
        when(col("split_a") === col("split_b"),
          expr("na * (na - 1) DIV 2")).otherwise(expr("na * nb")).as("__p"))
      .groupBy("split_a", "split_b")
      .agg(sum(col("__p")).cast("long").as("n_dup_pairs"))
      .where(col("n_dup_pairs") > 0)
  }

  /** Leakage-FREE split: assign every document the split of its exact-dup
    * cluster REPRESENTATIVE (the minimum id sharing its content hash), so
    * duplicate groups land on one side by construction —
    * [[splitLeakage]] over the result is diagonal-only. One content-hash
    * aggregation (ids only) + a broadcast-friendly hash-keyed join; the
    * same recipe extends to near-dup clusters via
    * [[graft.ops.Graph.dedupClusters]] labels as the key.
    */
  def leakageFreeSplit(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      md5(col(textCol).cast("binary")).as("h"))
    val reps = hashed.groupBy("h").agg(min(col("id")).as("rep"))
    val byRep = hashed.join(reps, Seq("h"))
    val repSplit = splitCorpus(
      byRep.select(col("rep")).distinct().withColumnRenamed("rep", "id"),
      "id", splits, salt)
      .select(col("id").as("rep"), col("split"))
    byRep.join(repSplit, Seq("rep"))
      .select(col("id").as(idCol), col("rep"), col("split"))
  }

  /** Corpus mixing: per-shard keep probabilities (domain re-weighting for
    * training mixtures — keep `weights(shard)` of each source, `default`
    * elsewhere). Emits the draw and verdict rather than silently dropping.
    * Narrow and reproducible like [[deterministicSample]].
    */
  def mixCorpus(df: DataFrame, idCol: String, shardCol: String,
      weights: Map[String, Double], default: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val draw = hashDraw(col(idCol), salt)
    val thresh = weights.toSeq.sortBy(_._1).foldRight(
      lit(hexThreshold(default)): Column) { case ((shard, w), rest) =>
      when(col(shardCol) === shard, hexThreshold(w)).otherwise(rest)
    }
    df.select(col(idCol), col(shardCol), draw.as("draw"),
      (draw < thresh).cast("int").as("keep"))
  }

  /** Deterministic epoch shuffle: a reproducible pseudo-random training
    * order as (bucket, draw, id) — bucket is the first byte pair of the
    * epoch-salted md5 (256 buckets), the within-bucket position sorts by
    * the full draw. The concatenation of buckets 0..255 IS the epoch's
    * permutation, materialized WITHOUT a global sort: each bucket is an
    * independent hash partition sorted within (the window partitions on
    * bucket — 256 balanced groups, no single-partition collapse), so a
    * 100 TB corpus shuffles as 256+ parallel sorted streams concatenated
    * by bucket number. Different `epoch` values give independent
    * permutations; everything is a pure function of (id, epoch), so the
    * order is identical across retries, partitionings, and engines.
    */
  def epochShuffle(
      df: DataFrame,
      idCol: String,
      epoch: Int,
      salt: String = "graft"): DataFrame = {
    val draw = hashDraw(col(idCol), s"$salt-e$epoch")
    val bucket = conv(substring(draw, 1, 2), 16, 10).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("draw", idCol)
    df.select(col(idCol), draw.as("draw"))
      .withColumn("bucket", bucket)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Temperature-scaled domain mixing (the multilingual/multi-domain
    * rebalancing rule of mBERT/XLM-R and data-mixture training: sampling
    * weight ∝ count^(1/T), T > 1 flattens the domain distribution toward
    * uniform without discarding the head): computes per-shard keep RATES
    * that hit a `budget`-document expected total under temperature
    * weights, then applies the [[mixCorpus]]-style deterministic verdict
    * (md5 draw < per-shard threshold).
    *
    * Engine-independence: weights are INTEGERIZED — w = floor(count^(1/T)
    * · 2^16) — so the normalizing sum is an exact int64 sum (float sums
    * are order-dependent; an integer sum is not), and each rate is ONE
    * double division of exact int64 products. For T = 2 (the common
    * setting) count^(1/2) is `sqrt`, which IEEE 754 requires to be
    * correctly rounded — bit-identical in any engine; other T go through
    * `pow`, whose last ulp is libm-specific (the [[weightedSample]]
    * caveat), which at worst flips one 2^-32 threshold step.
    *
    * Shard count is bounded (domains/languages), so the count pass is one
    * map-side-combined aggregate and a driver-held rate table. Emits
    * (id, shard, draw, keep) — audit-friendly, like [[mixCorpus]].
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      shardCol: String,
      budget: Long,
      temperature: Double = 2.0,
      weightScale: Long = 65536L,
      salt: String = "graft"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    // Shard ids are compared as STRINGS throughout (rate table keys and the
    // threshold CASE below), so cast non-string shard columns up front; a
    // null shard has no defined sampling rate — reject it rather than let
    // it silently fall through every threshold branch.
    val shard = col(shardCol).cast("string")
    val counts = df.groupBy(shard.as("__shard")).agg(count(lit(1)).as("c"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"temperatureMix: null value in shard column '$shardCol'")
        (r.getString(0), r.getLong(1))
      }
    require(counts.nonEmpty, "temperatureMix: empty corpus")
    val ws = counts.map { case (sh, c) =>
      val root = if (temperature == 2.0) math.sqrt(c.toDouble)
        else math.pow(c.toDouble, 1.0 / temperature)
      (sh, c, math.floor(root * weightScale).toLong)
    }
    val sw = ws.map(_._3).sum
    val rates = ws.map { case (sh, c, w) =>
      // BigInt products: budget·w and sw·c overflow int64 past ~2.7e9
      // docs/shard at the default weightScale — driver-side on a
      // shard-count-sized table, so exactness costs nothing.
      sh -> math.min(1.0,
        (BigDecimal(BigInt(budget) * BigInt(w)) /
          BigDecimal(BigInt(sw) * BigInt(c))).toDouble)
    }.sortBy(_._1)
    val draw = hashDraw(col(idCol), salt)
    val thresh = rates.foldRight(lit(hexThreshold(0.0)): Column) {
      case ((sh, r), rest) =>
        when(shard === sh, hexThreshold(r)).otherwise(rest)
    }
    df.select(col(idCol), shard.as("shard"), draw.as("draw"),
      (draw < thresh).cast("int").as("keep"))
  }

  /** DoReMi domain reweighting (Xie et al. 2023): the data-mixture
    * optimizer that upweights domains where the proxy model's EXCESS loss
    * over a reference model is largest — multiplicative-weights rounds
    *
    *   α_t ∝ α_{t−1} · (1 + η · excess)   (the Hedge linear update),
    *   then renormalize and smooth toward uniform with mass c,
    *
    * over the per-domain mean excess. Everything is int64 fixed-point
    * (weights in units of 2^20, floor divisions with EXPLICIT floor
    * semantics on negatives — the kMeans oracle trick), so every round
    * replays bit-for-bit in any engine; exp(η·L) is deliberately replaced
    * by its first-order Hedge form because libm exp is not correctly
    * rounded.
    *
    * Scale shape: ONE map-side-combined aggregation computes every
    * domain's (count, mean excess); the T rounds run driver-side on the
    * |domains|-row table (domains are bounded — the unimax/temperatureMix
    * precedent) and the result is a |domains|-row frame. Output:
    * (domain, n_docs, mean_excess, weight) with Σ weight ≈ 2^20·|domains|.
    */
  def doremiWeights(
      df: DataFrame,
      domainCol: String,
      excessCol: String,
      rounds: Int = 5,
      etaNum: Long = 200L,
      etaDen: Long = 1L,
      smoothingFp: Long = 1049L, // ≈ 1e-3 · 2^20, the DoReMi default c
      scale: Long = 1L << 20): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1, 64], got $rounds")
    require(etaDen > 0 && scale > 0 && smoothingFp >= 0 && smoothingFp < scale,
      s"bad etaDen/scale/smoothing: $etaDen/$scale/$smoothingFp")
    val spark = df.sparkSession
    val agg = df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(excessCol).cast("long")).as("s"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0), s"doremiWeights: null in '$domainCol'")
        (r.getString(0), r.getLong(1), Math.floorDiv(r.getLong(2), r.getLong(1)))
      }
      .sortBy(_._1)
    require(agg.nonEmpty, "doremiWeights: empty corpus")
    val d = agg.length
    val factors = agg.map { case (_, _, l) =>
      val f = scale + Math.floorDiv(etaNum * l, etaDen)
      require(f > 0,
        s"doremiWeights: non-positive update factor $f for mean excess $l " +
          "- reduce etaNum/etaDen")
      f
    }
    // Round arithmetic in BigInt: every operand is non-negative, so BigInt
    // truncating division == the Long floor division it replaces — values
    // are bit-identical in the no-overflow regime, and a caller-scaled mean
    // excess large enough to push alpha·factor past 2^63 (factor ≳ 2^31 at
    // the 2^20 scale) now computes exactly instead of silently wrapping.
    // Driver-side over |domains| rows × ≤64 rounds — cost is nil.
    val bScale = BigInt(scale)
    var alpha = Array.fill(d)(bScale)
    (1 to rounds).foreach { _ =>
      val m = alpha.indices.map(i => alpha(i) * factors(i) / bScale)
      val s = m.sum
      alpha = m.map(x => (BigInt(scale - smoothingFp) * (x * bScale * d / s) +
        BigInt(smoothingFp) * bScale) / bScale).toArray
    }
    import spark.implicits._
    // Post-smoothing weights sum to ~scale·d — always back inside int64.
    agg.indices.map { i =>
      (agg(i)._1, agg(i)._2, agg(i)._3, alpha(i).toLong)
    }.toDF("domain", "n_docs", "mean_excess", "weight")
  }

  /** Snapshot diff between two corpus versions — the audit an incremental
    * refresh pipeline emits before replacing a training slice: which ids
    * were ADDED, REMOVED, MODIFIED (content hash changed), or UNCHANGED.
    * The ONLY payload that moves is (id, 16-byte md5): both sides hash
    * narrow, the full-outer join is on the id key, and text never rides
    * the shuffle — at 100 TB the diff costs two scans plus an id-keyed
    * exchange. Output: (id, status) for every id in either snapshot;
    * feed `status != 'unchanged'` into [[Dedup.dedupAgainstIndex]]-style
    * incremental reprocessing so the refresh pays only the delta.
    */
  def corpusDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    requireIntegralId(oldDf, idCol, "corpusDiff")
    requireIntegralId(newDf, idCol, "corpusDiff")
    def hashed(df: DataFrame, side: String) =
      df.select(col(idCol).cast("long").as("id"),
        md5(col(textCol).cast("binary")).as(s"__h_$side"))
    hashed(oldDf, "old").join(hashed(newDf, "new"), Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("modified").as("status"))
  }

  /** EXACT-n-per-stratum deterministic sample: each stratum keeps its
    * `nPerStratum` rows with the SMALLEST salted hash draws (ties to the
    * lower id) — the fixed-quota companion of [[deterministicSample]]
    * (Bernoulli) and [[budgetSample]] (token budgets): eval panels and
    * per-language audits need "exactly 30 per stratum", not a rate.
    *
    * Scale shape: the per-stratum selection is the k-bounded
    * [[graft.functions.TopKByScore]] aggregate on score = −draw — partial
    * buffers hold ≤ n entries, the exchange ships ≤ tasks × strata × n
    * rows. The obvious `row_number().over(partitionBy(stratum))` sorts an
    * ENTIRE stratum in one partition — a 100 TB stratum collapses; the
    * bounded aggregate never materializes more than the quota.
    *
    * Determinism / oracle-ability: the 48-bit draw is the md5 prefix
    * ([[hashDraw]]'s policy, numeric form — fixed-width hex order ≡
    * numeric order), so any engine replays the selection with
    * `row_number() OVER (ORDER BY md5-prefix, id)`. Output:
    * (stratum, id, rank 1..n) in ascending draw order.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      nPerStratum: Int,
      salt: String = "graft"): DataFrame = {
    require(nPerStratum >= 1, s"nPerStratum must be >= 1, got $nPerStratum")
    requireIntegralId(df, idCol, "stratifiedSample")
    val draw = conv(substring(md5(concat(col(idCol).cast("string"),
      lit("-" + salt)).cast("binary")), 1, 12), 16, 10).cast("long")
    df.select(col(stratumCol).as("stratum"),
        col(idCol).cast("long").as("__id"), draw.as("__d"))
      .groupBy("stratum")
      .agg(graft.functions.TopKByScore.topk_by_score(
        -col("__d").cast("double"), col("__id"), nPerStratum,
        distinctIds = false).as("__top"))
      .select(col("stratum"), posexplode(col("__top")))
      .select(col("stratum"), col("col.id").as(idCol),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Quality-paced admission (quality pacing / density mixing): bucket the
    * corpus into `buckets` quality tiers and keep a LINEARLY increasing
    * fraction of each (tier b admits (b+1)/buckets) — the curation move
    * that biases a mixture toward high-quality documents without a hard
    * cutoff (hard thresholds amputate diversity; paced admission keeps a
    * deterministic trickle of every tier).
    *
    * Scale shape — NO global sort: the score quantizes to an integer key
    * (`floor(score · qScale)`, ≤ qScale+1 distinct values), tier
    * boundaries come from ONE bounded histogram aggregation plus a
    * driver-side cumulative scan (the [[linearProbe]] bounded-driver
    * contract), and assignment + admission are narrow column algebra
    * (thresholds are plan literals; the draw is [[hashDraw]]). An
    * `ntile()` window would sort the full corpus in one partition — the
    * classic collapse; the histogram route costs one map-side-combined
    * agg regardless of corpus size.
    *
    * Determinism / oracle-ability: the quantized score is the same IEEE
    * double tree in any engine; boundary election uses EXACT integer
    * ceilings ((i·n + buckets−1) div buckets); rows sharing a quantized
    * score share a tier BY CONSTRUCTION (ties never straddle a boundary —
    * the honest semantics at scale, where per-row rank tie-breaks are
    * partitioning-dependent); admission replays the [[mixCorpus]] hex
    * threshold policy. Scores clamp to [0, 1] (the histogram the driver
    * collects is bounded only by that range) and null-score rows are
    * dropped — score upstream or coalesce a default before calling.
    * Output: (id, q, bucket, draw, keep).
    */
  def qualityPacedMix(
      df: DataFrame,
      idCol: String,
      score: Column,
      buckets: Int = 10,
      qScale: Int = 10000,
      salt: String = "graft"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(qScale >= buckets, s"qScale must be >= buckets, got $qScale")
    // The histogram collected below is bounded ONLY because q has at most
    // qScale+1 distinct values — enforce the [0, 1] score contract with a
    // clamp (an out-of-range caller-supplied score would otherwise make
    // the driver collect unbounded) and drop null-score rows (a null has
    // no quality tier; it would NPE the cumulative scan).
    val clamped = least(lit(1.0), greatest(lit(0.0), score.cast("double")))
    val scored = df.where(score.isNotNull)
      .select(col(idCol), floor(clamped * qScale).cast("int").as("q"))
    val hist = scored.groupBy("q").agg(count(lit(1)).as("c"))
      .orderBy("q").collect()
    require(hist.nonEmpty, "qualityPacedMix: empty corpus")
    val n = hist.map(_.getLong(1)).sum
    var cum = 0L
    val cumArr = hist.map { r => cum += r.getLong(1); (r.getInt(0), cum) }
    val th = (1 until buckets).map { i =>
      val need = (i.toLong * n + buckets - 1) / buckets
      cumArr.find(_._2 >= need).get._1
    }
    val tier = th.foldLeft(lit(0)) { (acc, t) =>
      acc + (col("q") >= t).cast("int")
    }
    val rates = (0 until buckets)
      .map(b => hexThreshold((b + 1).toDouble / buckets)).toIndexedSeq
    val draw = hashDraw(col(idCol), salt)
    scored
      .withColumn("bucket", tier)
      .withColumn("draw", draw)
      .withColumn("keep",
        (col("draw") < element_at(typedLit(rates), col("bucket") + 1))
          .cast("int"))
  }

  /** Stream packing layout: concatenate each shard's documents (in id order)
    * into one token stream and cut it every `budget` tokens — the
    * pack-then-split batching used to build fixed-length training sequences.
    * Emits each document's offset in its shard stream, the bin (sequence
    * index) its first token lands in, and whether it straddles a bin
    * boundary (= will be split across two training sequences).
    *
    * Scale shape: packing is inherently sequential, so it runs per shard —
    * the window partitions on (`shardCol`, id mod `subShards`), giving
    * `|shards| × subShards` independent streams that each fit a task no
    * matter the corpus size (the 100×-collapse a bare low-cardinality
    * window would hit is designed out; raise `subShards` to match the
    * cluster). The shuffle carries (id, token-count) pairs only.
    */
  def packStream(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      budget: Int = 512,
      subShards: Int = 8): DataFrame = {
    require(budget > 0 && subShards > 0, "budget and subShards must be positive")
    val dl = size(graft.functions.TextFunctions.tokenize(col(textCol)))
    val staged = df.select(col(shardCol), col(idCol),
      dl.cast("long").as("n_tokens"),
      (col(idCol) % subShards).as("sub_shard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol), col("sub_shard"))
      .orderBy(col(idCol))
    val cum = sum(col("n_tokens")).over(w)
    val startOff = cum - col("n_tokens")
    val bin = floor(startOff / budget.toDouble).cast("long")
    val endBin = floor((cum - 1) / budget.toDouble).cast("long")
    staged.select(col(shardCol), col("sub_shard").cast("long").as("sub_shard"),
      col(idCol), col("n_tokens"),
      startOff.as("start_off"), bin.as("bin"),
      (col("n_tokens") > 0 && bin =!= endBin).cast("int").as("straddles"))
  }

  /** Deterministic token-budget sampling per stratum: rank each group's
    * documents by their A-ES weighted-sampling key (weight 1 → uniform
    * priority, any weight column → importance priority) and keep documents
    * while the group's cumulative token count stays within `tokenBudget` —
    * "fill 1 B tokens per source, reproducibly" — the mixture-recipe step
    * after [[corpusProfile]] tells you what's available. A document that
    * straddles the boundary is kept iff its START offset is inside the
    * budget (the packing convention of [[packStream]]).
    *
    * Determinism contract as [[weightedSample]]: a pure function of
    * (id, salt, weight), stable under retries, partitionings, and engines.
    * Scale shape: ONE window shuffle partitioned by the group column —
    * appropriate when strata are numerous (sources, domains, language ×
    * quality buckets); for few huge strata, pre-shard the group key the
    * way [[packStream]]'s sub-shards do and give each shard a
    * proportional budget slice.
    *
    * Emits (group, id, n_tokens, start_off, kept) — the audit columns,
    * not just survivors, so a mixture report can show WHY a doc missed.
    */
  def budgetSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      tokenBudget: Long,
      weight: Column = lit(1.0),
      salt: String = "graft-ws"): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val staged = df.select(col(groupCol), col(idCol),
      size(graft.functions.TextFunctions.tokenize(col(textCol)))
        .cast("long").as("n_tokens"),
      when(weight > 0,
          pow(hashUniform(col(idCol), salt), lit(1.0) / weight))
          .otherwise(raise_error(concat(
            lit("A-ES sampling: weight must be > 0 (got null/<=0) for id "),
            col(idCol).cast("string")))).as("__wsk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__wsk").desc, col(idCol))
    val cum = sum(col("n_tokens")).over(w)
    staged.select(col(groupCol), col(idCol), col("n_tokens"),
      (cum - col("n_tokens")).as("start_off"),
      (cum - col("n_tokens") < tokenBudget).cast("int").as("kept"))
  }

  /** UniMax language sampling (Chung et al. 2023, ICLR — "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): allocate a total token budget across languages by
    * ascending-capacity water-filling under a per-language EPOCH CAP —
    * low-resource languages get up to `maxEpochs` full passes, never
    * more (the over-sampling cliff temperature mixes fall off), and the
    * freed budget flows to higher-resource languages. The allocation
    * loop is Algorithm 1 restated: languages ascend by capacity
    * n_l·maxEpochs (lang-name tiebreak); each takes
    * min(capacity, ⌊remaining budget / remaining languages⌋).
    *
    * All arithmetic is INTEGER (token counts, floor division), so the
    * quota table — and the per-document admission below it — replays
    * bit-exactly in any engine: a language's quota q splits into
    * e = ⌊q / n⌋ full epochs over every document plus a partial pass of
    * q − e·n tokens admitted in the [[hashUniform]] draw order with the
    * [[budgetSample]] start-offset convention.
    *
    * Scale shape: one map-side-combined per-language count, a driver
    * loop over the (bounded) language list, a broadcast quota join, and
    * ONE lang-partitioned window for the partial-epoch offsets — for a
    * handful of huge languages, pre-shard the window the way
    * [[budgetSample]]'s scaladoc prescribes (sub-shard key + proportional
    * quota slices; the draws stay pure functions of id). Output per
    * document: (id, lang, n_tokens, n_full_epochs, kept_partial) —
    * total copies of a doc in the mix = n_full_epochs + kept_partial.
    */
  def unimaxMix(
      df: DataFrame,
      idCol: String,
      langCol: String,
      textCol: String,
      tokenBudget: Long,
      maxEpochs: Int = 4,
      salt: String = "graft-ws"): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val staged = df.select(col(langCol).cast("string").as("lang"),
      col(idCol),
      size(graft.functions.TextFunctions.tokenize(col(textCol)))
        .cast("long").as("n_tokens"),
      hashUniform(col(idCol), salt).as("__k"))
    val sizes = staged.groupBy("lang").agg(sum(col("n_tokens")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, n) => (n * maxEpochs, l) }
    require(sizes.nonEmpty, "unimaxMix: empty corpus")
    var b = tokenBudget
    var rem = sizes.length
    val quotas = sizes.map { case (l, n) =>
      val cap = n * maxEpochs
      val q = math.min(cap, b / rem)
      b -= q
      rem -= 1
      (l, n, q)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val quotaDf = quotas.toIndexedSeq
      .map { case (l, n, q) =>
        (l, q, if (n == 0) 0L else q / n, if (n == 0) 0L else q % n) }
      .toDF("lang", "lang_quota", "n_full_epochs", "__rpart")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("__k").desc, col(idCol))
    val cum = sum(col("n_tokens")).over(w)
    staged.join(broadcast(quotaDf), "lang")
      .select(col(idCol), col("lang"), col("n_tokens"),
        col("lang_quota"), col("n_full_epochs"),
        ((cum - col("n_tokens")) < col("__rpart")).cast("int")
          .as("kept_partial"))
  }

  /** Per-slice "dataset card" profile — the one-pass corpus summary a
    * mixture designer reads first: document/token/char volumes, language
    * spread, and the exact-duplicate count (docs minus distinct content
    * hashes). ONE aggregation (map-side combined; the distinct counts ride
    * the same shuffle), integer-exact outputs, no second pass over 100 TB.
    */
  def corpusProfile(
      df: DataFrame,
      textCol: String,
      sliceCol: String,
      langCol: String): DataFrame =
    df.select(col(sliceCol).as("slice"), col(langCol).as("__lang"),
        size(graft.functions.TextFunctions.tokenize(col(textCol)))
          .cast("long").as("__ntok"),
        length(col(textCol)).cast("long").as("__nch"),
        md5(col(textCol).cast("binary")).as("__h"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_docs"),
        // count(__h), not count(*): null texts hash to null and must not
        // register as duplicates of each other.
        (count(col("__h")) - countDistinct(col("__h"))).as("n_dup_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nch")).as("n_chars"),
        countDistinct(col("__lang")).as("n_langs"))

  /** Cross-slice n-gram overlap matrix — the corpus-composition leakage
    * audit: for every pair of slices (sources, dumps, snapshots), how many
    * distinct word k-grams they share, as raw counts plus Jaccard and
    * overlap coefficient. [[decontaminate]] answers "which TRAINING DOCS
    * overlap this benchmark"; this answers "which SLICES overlap each
    * other" — the first question a mixture designer asks before weighting.
    *
    * Grams present in more than `maxSlices` slices are excluded everywhere
    * (numerators AND denominators — the matrix is consistently "over
    * non-ubiquitous grams"): corpus-wide boilerplate otherwise dominates
    * every cell, and a gram shared by s slices would emit s² pair rows.
    * The cap bounds that blow-up deterministically, the same policy as the
    * capped LSH buckets.
    *
    * Scale shape: distinct (slice, gram-hash) rows shuffle once on the
    * gram; the pair join reuses that key and emits ≤ maxSlices² rows per
    * gram; totals and the final pair aggregation are map-side-combined
    * counts. No text ever rides a shuffle, and no driver-side state.
    * The gram table feeds three consumers (totals + both pair sides) in
    * ONE plan, so AQE's exchange reuse materializes its shuffle once —
    * verified at runtime (5 ReusedExchange nodes), no manual persist
    * needed.
    * Output: (src_a, src_b, n_shared, n_a, n_b, jaccard, overlap) for
    * pairs sharing ≥ 1 surviving gram, src_a < src_b.
    */
  def sliceOverlap(
      df: DataFrame,
      sliceCol: String,
      textCol: String,
      k: Int = 3,
      maxSlices: Int = 100): DataFrame = {
    val grams = df
      .select(col(sliceCol).as("src"),
        graft.functions.TextFunctions.tokenize(col(textCol)).as("__t"))
      .select(col("src"),
        explode(graft.functions.TextFunctions.shingle_hashes(col("__t"), k))
          .as("g"))
      .distinct()
    val surviving = grams.groupBy("g")
      .agg(count(lit(1)).as("__ns"))
      .where(col("__ns") <= maxSlices)
      .select("g")
    val kept = grams.join(surviving, Seq("g"))
    val totals = kept.groupBy("src").agg(count(lit(1)).as("n"))
    val pairs = kept.select(col("g"), col("src").as("src_a"))
      .join(kept.select(col("g"), col("src").as("src_b")), Seq("g"))
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(totals.select(col("src").as("src_a"), col("n").as("n_a")), Seq("src_a"))
      .join(totals.select(col("src").as("src_b"), col("n").as("n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"), col("n_b"),
        (col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"),
        (col("n_shared").cast("double") /
          least(col("n_a"), col("n_b"))).as("overlap"))
  }

  /** DSIR importance scores (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling", arXiv:2302.03169): score every raw
    * document by how much its hashed n-gram distribution looks like a
    * TARGET corpus rather than the raw pool — the standard recipe for
    * selecting in-domain pretraining data against a quality exemplar set.
    * Features are unigrams + bigrams hashed into `buckets` slots (md5
    * prefix, the engine's cross-engine hash policy); both corpora fit
    * add-one-smoothed multinomials over the slots, and a document's score
    * is the sum over its gram occurrences of the per-slot log importance
    * ratio ln(p_target(b) / p_raw(b)).
    *
    * Determinism policy: the per-slot ratio's numerator and denominator,
    * (t_b+1)·(R+B) and (r_b+1)·(T+B), multiply as DOUBLES — each factor
    * converts exactly (counts ≪ 2⁵³) and IEEE multiplication rounds the
    * product correctly at any magnitude, so there is no int64 wrap at
    * 1e9–1e10 gram totals and both engines hand `ln` the bit-identical
    * double (while the product is < 2⁵³ — every test corpus — it is the
    * exact integer); λ_b = round(10⁶·ln(·)) is then an INTEGER per slot, and doc
    * scores are integer sums — order-independent, hash-matchable. A λ flip
    * would need libm implementations differing by ≥ the value's distance
    * to a half-integer boundary; margins on real data sit ~10⁶ ulps above
    * that (and ratio = 1 hits the boundary at exactly 0.0, which rounds
    * to 0 in any engine).
    *
    * Scale shape: gram rows carry (doc-id, bucket) only; the two
    * slot-count aggregations partially combine map-side into ≤ tasks × B
    * rows; the λ table is B rows — BROADCAST to the scoring join; the
    * final per-doc sum is one narrow aggregation. Document text never
    * rides a shuffle.
    *
    * Output: every raw document as (id, n_grams, dsir_score); gramless
    * docs score 0. Rank by score (desc) and keep top-N — or feed the
    * scores to [[weightedSample]] — to complete the resampling step.
    */
  def dsirScore(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1024,
      scale: Double = 1e6): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = raw.sparkSession

    def gramBuckets(df: DataFrame): DataFrame = {
      val t = TextAnalysis.tokens(col(textCol))
      val bigrams = zip_with(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      df.select(col(idCol).as("id"),
          explode(concat(t, bigrams)).as("g"))
        .select(col("id"),
          pmod(conv(substring(md5(col("g").cast("binary")), 1, 13), 16, 10)
            .cast("long"), lit(buckets.toLong)).as("bk"))
    }

    // The raw corpus is tokenized + hashed ONCE and reused by both its
    // consumers — the slot-count aggregation and the scoring join — the
    // same (id, bucket)-longs persist discipline as [[linearProbe]]'s
    // feature table (one less full-corpus scan; the cache is reclaimed by
    // the ContextCleaner once the returned DataFrame goes unreachable).
    val rawGrams = gramBuckets(raw)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgtGrams = gramBuckets(target)
    // Slot counts are ≤ `buckets` rows after map-side partial aggregation —
    // collect them (the codebook-sized driver materialization this repo
    // allows) so the totals and the λ table need NO extra corpus scans:
    // one pass per corpus for counts, one more over raw for scoring.
    def slotCounts(grams: DataFrame): Map[Long, Long] =
      grams.groupBy("bk").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tCounts = slotCounts(tgtGrams)
    val rCounts = slotCounts(rawGrams)
    val tTot = tCounts.valuesIterator.sum
    val rTot = rCounts.valuesIterator.sum
    // λ table: B rows built driver-side, one ln each (rint =
    // round-half-away-from-zero for positive x via copySign, matching SQL
    // ROUND on both engines) — broadcast to the scoring join. The ratio
    // terms multiply as DOUBLES, not int64: each factor converts exactly
    // (counts are far below 2^53) and the product is then correctly
    // rounded at any magnitude, where an int64 product would silently
    // wrap for corpus gram totals around 1e9-1e10 per side.
    import spark.implicits._
    val lam = (0L until buckets.toLong).map { bk =>
      val num = (tCounts.getOrElse(bk, 0L) + 1L).toDouble * (rTot + buckets)
      val den = (rCounts.getOrElse(bk, 0L) + 1L).toDouble * (tTot + buckets)
      val v = scale * math.log(num / den)
      bk -> (math.signum(v) * math.floor(math.abs(v) + 0.5)).toLong
    }.toDF("bk", "lam")
    val scores = rawGrams
      .join(broadcast(lam), Seq("bk"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), sum(col("lam")).as("dsir_score"))
    raw.select(col(idCol).as("id")).join(scores, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_score"), lit(0L)).as("dsir_score"))
  }

  /** Trainable linear quality probe: full-batch gradient descent on a
    * linear scorer over hashed BINARY gram features (the fasttext-style
    * quality-classifier shape every modern curation stack trains to
    * extrapolate a small labeled set over the corpus), run entirely in
    * FIXED-POINT integer arithmetic so training is deterministic and
    * engine-replayable — the [[graft.ops.Similarity.kMeansQuantized]]
    * discipline applied to learning. Features: the distinct
    * unigram+bigram md5 buckets of each document (binary presence);
    * model: squared loss against labels ±2^qBits; update per iteration:
    * w_b += floor(Σ_d x_db·r_d / (n·2^etaLog2)) with r_d the exact
    * integer residual — every quantity is int64, floor-division uses the
    * pmod-corrected numerator, so any engine replaying the policy
    * reproduces weights and scores bit-for-bit (the oracle unrolls the
    * training loop into per-iteration CTE blocks).
    *
    * Scale shape: each iteration is ONE per-document aggregation
    * (predict: feature rows join a broadcast B-row weight table) and ONE
    * per-bucket aggregation (gradient), both map-side partially
    * combined; the only driver materialization is the B-row weight
    * vector per round. Feature rows are (id, label, bucket) longs.
    * Overflow headroom: |g_b| ≤ n·(2^qBits + |p|max) — int64-safe past
    * 10¹⁰ documents at the defaults.
    *
    * Output: (id, y ±1, score) — the final-round integer prediction in
    * 2^qBits scale. The score is a RANKING signal (measured AUC ≈ 0.83
    * on the planted-label demo after 4 iterations): select the top X%
    * by score, the way quality-classifier pipelines consume it; the raw
    * 0-threshold is NOT calibrated for imbalanced labels at small iter
    * counts.
    */
  def linearProbe(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String, // boolean or 0/1 — positive class ⇒ y = +1
      buckets: Int = 1024,
      iters: Int = 4,
      etaLog2: Int = 6,
      qBits: Int = 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val t = TextAnalysis.tokens(col(textCol))
    val bigrams = zip_with(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(-1L)
    val labeled = df.select(col(idCol).as("id"), y.as("y"), col(textCol))
    // Features are materialized ONCE and reused by every iteration's two
    // aggregations and the final scoring pass — (id, y, bk) longs, a tiny
    // fraction of the text bytes. The cache stays until the returned
    // DataFrame becomes unreachable; the ContextCleaner then reclaims it
    // (the [[Graph.connectedComponents]] lifecycle).
    // Grouped per doc: (id, y, bks) — each document's distinct feature
    // buckets as ONE array row. Every iteration then needs NO join at all:
    // the per-doc prediction p = Σ w[bk] is a narrow codegen'd pass over
    // `bks` ([[graft.functions.BucketWeightSum]] — the weight vector rides
    // as a plan REFERENCE OBJECT, so every round re-runs the same compiled
    // plan; a B-long typedLit here made each round a structurally new
    // ~B-node literal tree with fresh analysis + codegen), and the gradient
    // is the single B-row-bounded groupBy(bk) over the exploded residuals —
    // iterations cost O(data), not O(data + plan compile).
    val feats = labeled
      .select(col("id"), col("y"), explode(concat(t, bigrams)).as("g"))
      .select(col("id"), col("y"),
        pmod(conv(substring(md5(col("g").cast("binary")), 1, 13), 16, 10)
          .cast("long"), lit(buckets.toLong)).as("bk"))
      .distinct()
      .groupBy("id", "y").agg(collect_list(col("bk")).as("bks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = df.count()
    val d = n << etaLog2 // divisor: n·2^eta (η/n folded into one floor div)
    val w = new Array[Long](buckets)

    // Snapshot per use: plan references serialize at job submission, but a
    // cloned array makes each round's (and the returned, LAZY, scoring
    // plan's) weights explicit rather than racing the mutation below.
    def pCol(): org.apache.spark.sql.Column =
      graft.functions.functions.bucket_weight_sum(col("bks"), w.clone())

    var it = 0
    while (it < iters) {
      val grad = feats
        .select(col("bks"),
          ((col("y") * (1L << qBits)) - pCol()).as("r"))
        .select(explode(col("bks")).as("bk"), col("r"))
        .groupBy("bk").agg(sum(col("r")).as("g"))
        .withColumn("dw", expr(s"(g - pmod(g, ${d}L)) DIV ${d}L"))
        .collect()
      grad.foreach(r => w(r.getLong(0).toInt) += r.getLong(2))
      it += 1
    }
    labeled.select(col("id"), col("y"))
      .join(feats.select(col("id"), pCol().as("p")), Seq("id"), "left")
      .select(col("id").as(idCol), col("y"),
        coalesce(col("p"), lit(0L)).as("score"))
  }

  /** Bloom-filter benchmark decontamination — the 100 TB scale path for
    * [[decontaminate]]: instead of joining every training shingle against
    * the benchmark shingle table, the benchmark side aggregates ONCE into
    * a bounded Bloom sketch (Spark's own `BloomFilterAggregate`, the
    * engine's runtime-join-filter machinery driven directly), and the
    * training side becomes a NARROW scan — each document's distinct
    * shingle-hash array is filtered against the sketch inside one
    * codegen'd projection. Zero shuffles touch the training corpus: no
    * explode, no join, no aggregation; the only distributed work on the
    * big side is the scan itself. (The exact join's per-pair output also
    * becomes a per-document summary here — Bloom membership cannot name
    * WHICH benchmark doc collided, only that some shingle is
    * benchmark-contaminated.)
    *
    * One-sided error, the property that makes the sketch sound for
    * decontamination: `might_contain` has NO false negatives, so every
    * document the exact k-gram test would flag is flagged here too —
    * false positives (rate `fpp` PER GRAM) only over-discard, never leak
    * eval data into training. A document compounds per-gram FPs (P ≈
    * 1−(1−fpp)^grams), so the default fpp is 1e-4 — ~1% doc-level FP at
    * 100 grams — not the sketch-conventional 0.01. The sketch binary is
    * collected to the driver (a BOUNDED, benchmark-sized materialization —
    * eval sets are small by nature; ~2.4 MB per million shingles at 1e-4)
    * and embedded as a literal, so tasks get it with the plan broadcast.
    *
    * Output: one row per training document — (id, n_grams,
    * n_flagged grams hitting the sketch, clean = n_flagged == 0).
    */
  def bloomDecontaminate(
      train: DataFrame,
      trainId: String,
      trainText: String,
      bench: DataFrame,
      benchText: String,
      k: Int = 3,
      fpp: Double = 1e-4,
      maxExpectedItems: Long = 100000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.ColumnBridge
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val benchSh = bench
      .select(graft.functions.TextFunctions.tokenize(col(benchText)).as("__t"))
      .select(explode(
        graft.functions.TextFunctions.shingle_hashes(col("__t"), k)).as("__sh"))
    // Size the sketch from the actual benchmark gram count (a count over
    // the SMALL side): m = -n ln p / (ln 2)², the standard Bloom sizing.
    val nItems = math.min(maxExpectedItems,
      math.max(1L, benchSh.count()))
    val numBits = math.max(64L,
      math.ceil(-nItems.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // Spark SILENTLY clamps both sizing literals against session confs
    // (BloomFilterAggregate.numBits = min(requested, runtime.bloomFilter.
    // maxNumBits, default 64M bits; items likewise at 4M)) — a large
    // benchmark would get a sketch with a far higher FP rate than the
    // requested fpp and flag nearly every training doc. Raise the caps to
    // the computed sizes for the build, restore after.
    val spark = train.sparkSession
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val prevBits = spark.conf.getOption(bitsKey)
    val prevItems = spark.conf.getOption(itemsKey)
    // A benchmark with zero grams (empty/null texts, empty table) makes
    // the aggregate return SQL NULL — the sketch must then flag nothing,
    // not NPE on deserialization (the empty-edge-set CC lesson).
    val bloomBytes = try {
      spark.conf.set(bitsKey, math.max(numBits, 67108864L).toString)
      spark.conf.set(itemsKey, math.max(nItems, 4000000L).toString)
      benchSh
        .select(ColumnBridge.column(
          new BloomFilterAggregate(
            ColumnBridge.expression(col("__sh")),
            Literal(nItems), Literal(numBits)).toAggregateExpression()).as("bf"))
        .head().getAs[Array[Byte]](0)
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v match { case Some(x) => spark.conf.set(k, x)
                  case None => spark.conf.unset(k) }
      restore(bitsKey, prevBits)
      restore(itemsKey, prevItems)
    }
    if (bloomBytes == null) {
      return train
        .select(col(trainId).as("id"),
          graft.functions.TextFunctions.tokenize(col(trainText)).as("__t"))
        .select(col("id"),
          graft.functions.TextFunctions.shingle_hashes(col("__t"), k).as("__sh"))
        .select(col("id").as(trainId),
          size(col("__sh")).cast("long").as("n_grams"),
          lit(0L).as("n_flagged"), lit(1).as("clean"))
    }
    // Membership via the fused BloomHitCount expression, NOT
    // size(filter(..., might_contain)): higher-order functions never enter
    // whole-stage codegen, so the HOF form drops the entire scan
    // projection to interpreted eval (measured: 0 WholeStageCodegen spans
    // in the plan). The fused kernel keeps the probe loop generated.
    train
      .select(col(trainId).as("id"),
        graft.functions.TextFunctions.tokenize(col(trainText)).as("__t"))
      .select(col("id"),
        graft.functions.TextFunctions.shingle_hashes(col("__t"), k).as("__sh"))
      .select(col("id"),
        // null text → null token array: such docs have zero grams and are
        // clean by definition, not null-columned.
        coalesce(size(col("__sh")), lit(0)).cast("long").as("n_grams"),
        coalesce(graft.functions.BloomFunctions
          .bloom_hit_count(col("__sh"), bloomBytes), lit(0L)).as("n_flagged"))
      .select(col("id").as(trainId), col("n_grams"), col("n_flagged"),
        (col("n_flagged") === 0L).cast("int").as("clean"))
  }

  /** Balanced training-shard planning: assign every document to one of
    * `nShards` output shards so per-shard token totals stay level — the
    * writer-planning step before dumping training shards. Deterministic
    * serpentine-by-size assignment (the parallel-schedulers' LPT shape):
    * rank documents by (token count DESC, id), deal rank r to shard
    * r mod n, reversing direction every round — each round hands every
    * shard one similarly-sized document and the alternation cancels the
    * within-round bias, so imbalance is bounded by one round's size spread.
    *
    * The global rank is computed WITHOUT a global window: per-count
    * occupancy is a (distinct token-count)-bounded histogram, running
    * offsets are a window over that histogram table ONLY (the vocabGrowth
    * convention), and the within-count row_number partitions BY COUNT —
    * distributed across the count domain, never funneling the corpus
    * into one task. Output per document: (id, n_tokens, rank, shard);
    * a pure function of the corpus multiset — stable under retries and
    * partitionings, SQL-replayable.
    */
  def shardPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val staged = df.select(col(idCol),
      size(graft.functions.TextFunctions.tokenize(col(textCol)))
        .cast("long").as("n_tokens"))
    val hist = staged.groupBy(col("n_tokens")).agg(count(lit(1)).as("__c"))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("n_tokens"), col("__off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_tokens")).orderBy(col(idCol))
    staged.join(broadcast(offsets), Seq("n_tokens"))
      .withColumn("rank",
        col("__off") + row_number().over(wIn).cast("long") - 1L)
      .withColumn("shard",
        when(expr(s"(rank DIV $nShards) % 2 = 0"),
          col("rank") % nShards)
          .otherwise(lit((nShards - 1).toLong) - col("rank") % nShards)
          .cast("int"))
      .select(col(idCol), col("n_tokens"), col("rank"), col("shard"))
  }

  /** Length-bucketed batching plan with a padding-waste audit — the
    * dynamic-batching precursor to [[packStream]]: instead of packing
    * documents into contiguous streams (which destroys example
    * boundaries), bucket them by length, pad every document in a bucket
    * to the bucket ceiling, and batch `batchTokens`-token batches per
    * bucket — the standard variable-length training layout. This op
    * emits the PLAN and its exact cost: per bucket of width
    * `bucketWidth` (ceiling = ⌈max_len/width⌉·width),
    *
    *   capacity   = batchTokens DIV ceiling        (docs per batch)
    *   n_batches  = ⌈n_docs / capacity⌉
    *   waste_ppm  = (n_batches·capacity·ceiling − Σ tokens)·10⁶
    *                  DIV (n_batches·capacity·ceiling)
    *
    * — padding waste plus tail-batch slack in one exact ppm number, the
    * audit that decides the bucket width before anyone burns cluster
    * time. Documents longer than `batchTokens` land in buckets with
    * capacity 0 and are reported with n_batches = 0 and waste_ppm = 0 —
    * the `oversize` flag routes them to a chunking pass ([[chunkTokens]])
    * instead of silently dropping them.
    *
    * Scale shape: one narrow token-count projection collapses to a
    * bucket histogram in the first map-side combine (output rows =
    * distinct buckets); all plan algebra runs on the histogram.
    */
  def lengthBucketPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bucketWidth: Int = 64,
      batchTokens: Int = 4096): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchTokens >= bucketWidth,
      s"batchTokens ($batchTokens) must be >= bucketWidth ($bucketWidth)")
    val staged = df.select(
      size(graft.functions.TextFunctions.tokenize(col(textCol)))
        .cast("long").as("__n"))
      .where(col("__n") > 0)
    val buckets = staged
      .select(expr(s"((__n - 1) DIV $bucketWidth + 1) * $bucketWidth")
        .cast("long").as("bucket_ceiling"), col("__n"))
      .groupBy("bucket_ceiling")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("sum_tokens"))
    buckets
      .select(col("bucket_ceiling"), col("n_docs"), col("sum_tokens"),
        expr(s"$batchTokens DIV bucket_ceiling").as("capacity"))
      .select(col("bucket_ceiling"), col("n_docs"), col("sum_tokens"),
        col("capacity"),
        when(col("capacity") === 0, lit(0L))
          .otherwise(expr("(n_docs + capacity - 1) DIV capacity"))
          .as("n_batches"),
        (col("capacity") === 0).cast("int").as("oversize"))
      .select(col("bucket_ceiling"), col("n_docs"), col("sum_tokens"),
        col("capacity"), col("n_batches"), col("oversize"),
        when(col("capacity") === 0, lit(0L))
          .otherwise(expr("""((n_batches * capacity * bucket_ceiling
                              - sum_tokens) * 1000000)
                            DIV (n_batches * capacity * bucket_ceiling)"""))
          .as("waste_ppm"))
      .orderBy("bucket_ceiling")
  }

  /** k-anonymity audit over a quasi-identifier column set — the re-
    * identification risk report run before a corpus (or its metadata
    * table) ships: every row whose quasi-identifier combination is shared
    * by fewer than k rows is individually distinguishable by those
    * attributes (Sweeney 2002). One row out:
    *
    *   n_rows, n_groups, min_group_size,
    *   rows_below_k   — rows failing k-anonymity (the exposure mass),
    *   groups_below_k — distinct failing combinations,
    *   singletons     — combinations unique to ONE row (worst case),
    *   risk_ppm       — ⌊10⁶ · rows_below_k / n_rows⌋.
    *
    * Pure integer arithmetic end to end. Scale shape: ONE map-side-
    * combined count per combination (keys + one long on the wire — no
    * row ids, no payload), then a 1-row aggregate over the group table;
    * nothing is ever collected. The group table is bounded by the
    * combination cardinality, which for sane quasi-identifier choices
    * (demographic-style attributes, coarse buckets) is ≪ n; a caller
    * auditing a near-unique column set gets the honest answer (most rows
    * singleton) at one shuffle of (key, count) rows.
    */
  def kAnonymityProfile(
      df: DataFrame,
      quasiCols: Seq[Column],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityProfile needs at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("__c"))
      .agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__c")).as("min_group_size"),
        coalesce(sum(when(col("__c") < k, col("__c"))), lit(0L))
          .as("rows_below_k"),
        coalesce(sum(when(col("__c") < k, 1L)), lit(0L))
          .as("groups_below_k"),
        coalesce(sum(when(col("__c") === 1, 1L)), lit(0L))
          .as("singletons"))
      .select(col("n_rows"), col("n_groups"), col("min_group_size"),
        col("rows_below_k"), col("groups_below_k"), col("singletons"),
        expr("CASE WHEN n_rows > 0 THEN (rows_below_k * 1000000) DIV n_rows ELSE 0 END")
          .as("risk_ppm"))
  }

  /** l-diversity audit — [[kAnonymityProfile]]'s attribute-disclosure
    * sibling (Machanavajjhala et al. 2007): a group can be k-anonymous
    * yet leak an attribute completely if every member SHARES the
    * sensitive value, so the risk unit is the number of DISTINCT
    * sensitive values per quasi-identifier group. Reports the census a
    * release decision reads: group count, worst-group diversity, rows in
    * groups below `l`, and the exact ppm row-risk.
    *
    * Pure integer arithmetic. Scale shape: one map-side-combined count
    * per (quasi..., sensitive) cell, one regroup to quasi groups (both
    * tables bounded by combination cardinality, never row-scale), one
    * 1-row census — the kAnonymityProfile shape with one extra bounded
    * exchange.
    *
    * @return one row: (n_rows, n_groups, min_distinct_sensitive,
    *         groups_below_l, rows_below_l, risk_ppm).
    */
  def lDiversityProfile(
      df: DataFrame,
      quasiCols: Seq[Column],
      sensitiveCol: Column,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityProfile needs at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    val qNames = quasiCols.indices.map(i => s"__q$i")
    val named = df.select(
      quasiCols.zip(qNames).map { case (c, n) => c.as(n) } :+
        sensitiveCol.as("__sv"): _*)
    val cells = named
      .groupBy(qNames.map(col) :+ col("__sv"): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = cells.groupBy(qNames.map(col): _*)
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("__d"))
    groups.agg(
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("__d")).as("min_distinct_sensitive"),
      coalesce(sum(when(col("__d") < l, 1L)), lit(0L))
        .as("groups_below_l"),
      coalesce(sum(when(col("__d") < l, col("__n"))), lit(0L))
        .as("rows_below_l"))
      .select(col("n_rows"), col("n_groups"),
        col("min_distinct_sensitive"), col("groups_below_l"),
        col("rows_below_l"),
        expr("CASE WHEN n_rows > 0 THEN (rows_below_l * 1000000) DIV n_rows ELSE 0 END")
          .as("risk_ppm"))
  }

  /** t-closeness audit (Li et al. 2007) — the third rung of the
    * disclosure ladder after [[kAnonymityProfile]] (group size) and
    * [[lDiversityProfile]] (distinct sensitive values): a group can be
    * k-anonymous AND l-diverse yet still leak when its sensitive
    * DISTRIBUTION skews far from the corpus (90% of one group in the top
    * salary decile). For an ORDERED sensitive attribute the published
    * distance is the equal-ground-distance EMD
    *
    *   t_g = (1/(m−1)) · Σ_v |cumP_g(v) − cumQ(v)|
    *
    * (m = distinct sensitive values); a group violates at t_g > t.
    *
    * Exactness: each per-value term is the cross-multiplied integer
    * |cum_g(v)·N − cumQ(v)·n_g| (the [[Stats.ksTest]] trick — no
    * rationals ever materialize), summed in DECIMAL(38,0), reported as
    * t_ppm = Σ·10⁶ DIV ((m−1)·n_g·N). m = 1 reports 0 (one value ⇒
    * nothing to skew). Distinct-value knee ([[Stats.kneeBucketExpr]]):
    * near-unique sensitive values coarsen to ≤ maxHistBins buckets —
    * the result is the exact t-closeness of the BUCKETED attribute
    * (EMD between coarsened distributions), the histogram family's
    * standing contract.
    *
    * Scale shape: one (quasi…, value) cell count (map-side combined);
    * the scan frame is |groups|·m rows — the group×distribution table
    * the published algorithm inherently reads, BOUNDED by quasi-combo
    * cardinality × the (knee-capped) value domain, never by corpus
    * rows; per-group cums are windows over that bounded frame; output
    * is one audit row.
    *
    * @return (n_rows, n_groups, n_values, max_t_ppm, groups_above_t,
    *         rows_above_t, risk_ppm) — risk = share of rows in violating
    *         groups.
    */
  def tClosenessProfile(
      df: DataFrame,
      quasiCols: Seq[Column],
      sensitiveCol: Column,
      tPpm: Long = 200000L,
      maxHistBins: Int = 1 << 12,
      knownBinsAtMostMax: Boolean = false): DataFrame = {
    require(quasiCols.nonEmpty, "tClosenessProfile needs at least one quasi-identifier column")
    require(tPpm >= 0, s"tPpm must be >= 0, got $tPpm")
    val dec = "decimal(38,0)"
    val qNames = quasiCols.indices.map(i => s"__q$i")
    val named = df.select(
      quasiCols.zip(qNames).map { case (c, n) => c.as(n) } :+
        sensitiveCol.cast("long").as("__sv"): _*)
    val svEx = Stats.kneeBucketExpr(named, "__sv", maxHistBins,
      knownBinsAtMostMax)
    val cells = named
      .groupBy(qNames.map(col) :+ svEx.as("__sv"): _*)
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wGlob = Window.orderBy("__sv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val glob = cells.groupBy("__sv").agg(sum("__c").as("__cv"))
      .select(col("__sv"), sum(col("__cv")).over(wGlob).as("__cumq"))
    val groups = cells.groupBy(qNames.map(col): _*)
      .agg(sum(col("__c")).as("__ng"))
    val tot = cells.agg(sum(col("__c")).as("__nn"),
      count(lit(1)).as("__ignored"))
      .select(col("__nn"))
    val nValues = glob.select(col("__sv"))
    // glob is ≤ maxHistBins rows by the knee — pin the broadcast so the
    // group×value expansion plans BroadcastNestedLoopJoin at ANY scale
    // (never a CartesianProduct exchange).
    val crossed = groups.crossJoin(broadcast(glob))
      .join(cells, qNames :+ "__sv", "left")
      .na.fill(0L, Seq("__c"))
    val wGrp = Window.partitionBy(qNames.map(col): _*).orderBy("__sv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perGroup = crossed
      .select(qNames.map(col) :+ col("__ng") :+ col("__cumq") :+
        sum(col("__c")).over(wGrp).as("__cumg"): _*)
      .crossJoin(broadcast(tot))
      .groupBy((qNames.map(col) :+ col("__ng")): _*)
      .agg(count(lit(1)).as("__m"), first(col("__nn")).as("__n"),
        sum(abs(col("__cumg").cast(dec) * col("__nn") -
          col("__cumq").cast(dec) * col("__ng"))).as("__emd"))
      .select(col("__ng"),
        expr(s"""CAST(CASE WHEN __m < 2 THEN 0 ELSE
          (__emd * 1000000) DIV ((__m - 1) * CAST(__ng AS $dec) * __n)
          END AS BIGINT)""").as("__t"))
    val out = perGroup.agg(
        sum(col("__ng")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        max(col("__t")).as("max_t_ppm"),
        coalesce(sum(when(col("__t") > tPpm, 1L)), lit(0L))
          .as("groups_above_t"),
        coalesce(sum(when(col("__t") > tPpm, col("__ng"))), lit(0L))
          .as("rows_above_t"))
      .crossJoin(broadcast(nValues.agg(count(lit(1)).as("n_values"))))
      .select(col("n_rows"), col("n_groups"), col("n_values"),
        col("max_t_ppm"), col("groups_above_t"), col("rows_above_t"),
        expr("""CASE WHEN n_rows > 0
          THEN (rows_above_t * 1000000) DIV n_rows ELSE 0 END""")
          .as("risk_ppm"))
    out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .count()
    cells.unpersist(blocking = false)
    out
  }

  /** Shuffle-quality audit of a training-data layout — "is this epoch
    * actually shuffled?": per shard, the number of RUNS of consecutive
    * same-key rows (key = source/domain/language) in the serving order,
    * against the expectation under a uniform random permutation of the
    * same shard. Long same-source runs starve batch diversity; a
    * run-count far below expectation is the signature of a sort that
    * leaked into the layout. With per-key counts c_k and n rows,
    * E[runs] = n − Σc_k(c_k−1)/n, reported exactly as
    *
    *   ratio_ppm = ⌊10⁶ · runs · n  DIV  (n² − Σc_k(c_k−1))⌋
    *
    * (≈10⁶ = random-quality mixing, « 10⁶ = clumped, single-key shards
    * report 10⁶ by convention — nothing to mix). Pure integer.
    *
    * Scale shape: ONE lag comparison per row windowed BY SHARD — shards
    * are this library's bounded parallel unit ([[epochShuffle]]/
    * [[packStream]] size them), so the per-partition sort is bounded by
    * construction, the same contract those operators already carry. The
    * run count and the key histogram then collapse map-side; output is
    * one row per shard.
    */
  def shuffleQualityAudit(
      df: DataFrame,
      shardCol: String,
      orderCol: Column,
      keyCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val staged = df.select(col(shardCol).as("shard"), orderCol.as("__o"),
      keyCol.cast("string").as("__k"))
    val w = Window.partitionBy("shard").orderBy("__o")
    val runs = staged
      .select(col("shard"),
        (lag(col("__k"), 1).over(w).isNull ||
          lag(col("__k"), 1).over(w) =!= col("__k")).cast("long").as("__brk"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), sum(col("__brk")).as("runs"))
    val mass = staged.groupBy("shard", "__k").agg(count(lit(1)).as("__c"))
      .groupBy("shard")
      .agg(sum(col("__c") * (col("__c") - 1)).as("__cc"),
        count(lit(1)).as("n_keys"))
    runs.join(mass, "shard")
      .select(col("shard"), col("n"), col("n_keys"), col("runs"),
        expr(s"""CAST(CASE WHEN n * CAST(n AS $dec) - __cc <= 0 THEN 1000000
          ELSE (CAST(runs AS $dec) * n * 1000000)
            DIV (n * CAST(n AS $dec) - __cc) END AS BIGINT)""")
          .as("ratio_ppm"))
  }

  /** Cross-source QUANTILE NORMALIZATION of a score column — the full
    * version of [[perGroupScoreRank]]'s calibration: each row's score is
    * replaced by the POOLED distribution's value at the row's
    * within-group quantile, so thresholds and mixtures computed on the
    * normalized score treat every source identically regardless of its
    * raw score distribution (the quantile-mapping move from
    * bioinformatics batch correction, applied to corpus quality scores).
    * Exact integer semantics: ranks are [[perGroupScoreRank]]'s
    * ⌊10⁶·lt/(n−1)⌋; the mapped value is the pooled score at the LARGEST
    * pooled rank ≤ the row's rank (floor interpolation — the pooled
    * minimum has rank 0, so a match always exists).
    *
    * Scale shape: both rank tables live on (group, score) HISTOGRAMS
    * (value-bounded), the floor-match is one merge-window over the
    * union of the two bounded tables (single partition BY DESIGN — it
    * holds distinct scores, never rows; the vocabCoverage convention),
    * and rows join the finished mapping back on (group, score). Output:
    * (id, grp, score, norm_score).
    */
  def quantileNormalize(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val staged = df.select(col(idCol).as("id"),
      col(groupCol).cast("string").as("grp"),
      scoreCol.cast("long").as("score"))
    val hist = staged.groupBy("grp", "score").agg(count(lit(1)).as("__c"))
    val wg = Window.partitionBy("grp").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist.select(col("grp"), col("score"),
      coalesce(sum(col("__c")).over(wg), lit(0L)).as("__lt"),
      sum(col("__c")).over(Window.partitionBy("grp")).as("__n"))
      .select(col("grp"), col("score"),
        expr("CASE WHEN __n > 1 THEN (__lt * 1000000) DIV (__n - 1) ELSE 0 END")
          .as("__ppm"))
    val pooledHist = staged.groupBy("score").agg(count(lit(1)).as("__c"))
    val wp = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pooled = pooledHist.select(col("score").as("__pscore"),
      coalesce(sum(col("__c")).over(wp), lit(0L)).as("__lt"),
      sum(col("__c")).over().as("__n"))
      .select(col("__pscore"),
        expr("CASE WHEN __n > 1 THEN (__lt * 1000000) DIV (__n - 1) ELSE 0 END")
          .as("__ppm"))
    // Floor-match on the union: pooled boundaries sort BEFORE group
    // entries at equal ppm (side 0 < 1), so last(ignoreNulls) is the
    // largest pooled rank ≤ the entry's rank.
    val merged = ranked
      .select(col("grp"), col("score"), col("__ppm"), lit(1).as("__side"),
        lit(null).cast("long").as("__pscore"))
      .unionByName(pooled.select(lit(null).cast("string").as("grp"),
        lit(null).cast("long").as("score"), col("__ppm"),
        lit(0).as("__side"), col("__pscore")))
    val wm = Window.orderBy(col("__ppm"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mapping = merged
      .select(col("grp"), col("score"), col("__side"),
        last(col("__pscore"), ignoreNulls = true).over(wm).as("norm_score"))
      .where(col("__side") === 1)
      .select(col("grp"), col("score"), col("norm_score"))
    staged.join(mapping, Seq("grp", "score"))
      .select(col("id"), col("grp"), col("score"), col("norm_score"))
  }

  /** Per-group exact percentile rank of a score column — the score-
    * calibration step before cross-source threshold cuts: raw quality
    * scores are not comparable across sources (different length/ratio
    * distributions), so curation pipelines (CCNet's per-language
    * perplexity buckets are the canonical case) normalize each score to
    * its rank WITHIN the source and cut on the rank. Exact integer
    * definition, tie-stable across engines:
    *
    *   rank_ppm = ⌊10⁶ · |{rows in group with score < s}| / (n_g − 1)⌋
    *
    * (percent_rank's formula with the float division integerized; ties
    * share a rank, the group minimum is 0, a unique maximum is 10⁶;
    * single-row groups report 0 by convention).
    *
    * Scale shape — the histogram-window convention: the corpus collapses
    * to a per-(group, score) count histogram in one map-side combine; the
    * running sum that turns counts into strictly-less mass windows over
    * that VALUE-BOUNDED histogram, never the rows; rows then join the
    * bounded rank table back on (group, score). No row ever enters a
    * window sort, so a billion-document source costs one combine + one
    * histogram pass + one key-value join.
    */
  def perGroupScoreRank(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val staged = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
      scoreCol.cast("long").as("score"))
    val hist = staged.groupBy("grp", "score").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("grp").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist.select(col("grp"), col("score"),
      coalesce(sum(col("__c")).over(w), lit(0L)).as("__lt"),
      sum(col("__c")).over(Window.partitionBy("grp")).as("__n"))
    staged.join(ranked, Seq("grp", "score"))
      .select(col("id"), col("grp"), col("score"),
        expr("CASE WHEN __n > 1 THEN (__lt * 1000000) DIV (__n - 1) ELSE 0 END")
          .as("rank_ppm"))
  }
}
