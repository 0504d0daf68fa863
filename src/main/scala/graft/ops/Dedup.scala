package graft.ops

import graft.functions.TextFunctions.simhash64

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB-scale corpora. Every pipeline here is
  * shaped as: narrow per-row signature → ONE shuffle on a blocking key →
  * within-bucket candidate pairs → narrow verification. No cross join ever
  * touches the full corpus; the only quadratic work is inside hash buckets,
  * which stay small under any reasonable signature scheme, and skewed buckets
  * are handled by AQE.
  */
object Dedup {

  /** Exact text dedup via content hash: one groupBy on a 128-bit hash of the
    * text (hashing first keeps the shuffle narrow — 16 bytes/row instead of
    * the document body).
    */
  /** Dedup key: md5 of the text, with NULL text rows each keyed by their
    * own id — md5(null) is null, and both the window partition and the
    * groupBy treat null as ONE key, so without the guard every
    * fetch-failed/missing-body document except one would silently vanish
    * as a "duplicate" of nothing (the same trap [[Web.surtDedup]]
    * documents for null SURT keys).
    */
  private def contentKey(idCol: String, textCol: String): Column =
    when(col(textCol).isNull,
      concat(lit("__null__"), col(idCol).cast("string")))
      .otherwise(md5(col(textCol).cast("binary")))

  def exactByText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__h", contentKey(idCol, textCol))
      .groupBy(col("__h").as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Surviving rows after exact text dedup (keep-first-by-id). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(contentKey(idCol, textCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Corpus-level boilerplate span detection (the C4 preprocessing idea —
    * Raffel et al. 2020 §2.2 removes spans occurring repeatedly across the
    * corpus): per document, how many of its distinct word k-grams occur in
    * at least `minDocs` OTHER distinct documents. High `boiler_frac` marks
    * template/boilerplate text; the per-span output of the `boiler` stage
    * doubles as a removal list.
    *
    * Scale shape: explode distinct spans (linear rows, each carrying only
    * (span, id)); ONE shuffle on span to count document frequency map-side
    * partially; the surviving boilerplate spans are a tiny filtered set, so
    * AQE broadcasts the join back; final groupBy on id is linear. No
    * payload amplification anywhere.
    */
  def repeatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      minDocs: Int = 3): DataFrame = {
    // Spans are 64-bit hashes from the fused ShingleHashes kernel, never
    // strings — the string n-gram build dominated this operator's profile
    // (9.5 s → the hashed form benches ~6× faster at sf0.1; counts are
    // identical modulo ~1e-10 hash collisions, the same argument as
    // ngram-Jaccard). Wrapped to EMPTY for < k tokens (ShingleHashes'
    // whole-text fallback would count short docs as one span; the C4
    // semantics — and the oracle — give them none).
    val staged = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("id"),
        when(size(col("__t")) < shingleK, array().cast("array<long>"))
          .otherwise(graft.functions.TextFunctions.shingle_hashes(col("__t"), shingleK))
          .as("__g"))
    // Span rows carry (id, n_spans, hash) only; one count-aggregation per
    // side, then the tiny boilerplate set joins back (AQE broadcasts it).
    val spans = staged.select(col("id"), size(col("__g")).as("__ns"),
      explode(col("__g")).as("gh"))
    // (id, gh) is unique (ShingleHashes emits distinct), so count == docs.
    val boiler = spans.groupBy("gh").agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= minDocs).select(col("gh"), lit(1L).as("__b"))
    val perDoc = spans.join(boiler, Seq("gh"), "left")
      .groupBy("id")
      .agg(max(col("__ns")).cast("long").as("n_spans"),
        sum(coalesce(col("__b"), lit(0L))).as("n_boiler_spans"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_boiler_spans"), lit(0L)).as("n_boiler_spans"),
        (coalesce(col("n_boiler_spans"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_spans"), lit(0L)), lit(1))).as("boiler_frac"))
  }

  /** Boilerplate REMOVAL (the action [[repeatedSpans]] only measures): drop
    * every token covered by a word k-gram that occurs in ≥ `minDocs`
    * distinct documents, and rebuild the cleaned (lowercased, re-spaced)
    * text. The fused non-distinct [[graft.functions.NgramHashes]] is
    * position-indexed — gram j covers tokens [j, j+k−1] — so coverage is
    * exact without ever materializing gram strings.
    *
    * Scale shape: one span-hash count shuffle (distinct (id, hash) rows),
    * one coverage join whose build side is the tiny filtered boilerplate
    * set, one per-doc position aggregation; text bytes never ride a
    * shuffle amplified.
    */
  def removeBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      minDocs: Int = 3): DataFrame = {
    val staged = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("id"), col("__t"),
        graft.functions.TextFunctions.ngram_hashes(col("__t"), shingleK).as("__g"))
    val posSpans = staged
      .select(col("id"), posexplode(col("__g")))
      .select(col("id"), col("pos"), col("col").as("gh"))
    // Document frequency over DISTINCT (id, gh) — same count as
    // repeatedSpans' distinct-set form.
    val boiler = posSpans.select("id", "gh").distinct()
      .groupBy("gh").agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= minDocs).select("gh")
    val covered = posSpans.join(boiler, "gh")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (shingleK - 1))).as("cp"))
      .groupBy("id").agg(collect_set(col("cp")).as("__cov"))
    // The rebuild branch needs tokens only — re-derive them without the
    // (unused) gram-hash pass.
    df.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .join(covered, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        coalesce(size(col("__cov")), lit(0)).cast("long").as("n_removed"),
        concat_ws(" ",
          filter(col("__t"), (x, i) =>
            !array_contains(coalesce(col("__cov"), array().cast("array<int>")), i)))
          .as("cleaned_text"))
  }

  /** (id, sh) with sh = distinct shingle hashes. Staged: tokens materialize
    * first, then the fused ShingleHashes expression combines token hashes
    * positionally — no shingle strings are ever built (the string
    * concatenation dominated this pipeline's profile).
    */
  private[ops] def shingleHashSets(
      df: DataFrame, idCol: String, textCol: String, shingleK: Int): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        graft.functions.TextFunctions.shingle_hashes(col("toks"), shingleK).as("sh"))

  /** MinHash signature: `numHashes` permutation-minima over the distinct
    * shingle hashes, computed by the fused native expression
    * ([[graft.functions.MinHashSignature]] — one pass over the shingle array
    * for all positions; the composed `array_min(transform(...))`-per-seed
    * formulation re-walks the array per position and benched 10×+ slower).
    */
  def minhashSignature(shingleHashes: Column, numHashes: Int = 64): Column =
    graft.functions.TextFunctions.minhash_signature(shingleHashes, numHashes)

  /** LSH band keys: hash `rowsPerBand`-sized signature slices. Two documents
    * land in the same bucket for band b iff that band of their signatures
    * matches exactly — the standard banding construction. The slice longs
    * feed the variadic xxhash64 DIRECTLY (binary representation, fully
    * codegen'd): the earlier `concat_ws(",", slice(...))` form rendered
    * every long to a decimal string per band per row — an sf1 stage
    * profile measured the banding projection at 5.1 s of a 14 s operator,
    * almost all string formatting. Key collisions only ever ADD a
    * candidate pair (verification discards it), so the hash change cannot
    * alter any verified output.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r =>
          element_at(signature, b * rowsPerBand + r + 1)) :+ (lit(b): Column): _*)
          .as("key"))
    }: _*)

  /** Near-duplicate candidate pairs by MinHash + LSH.
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, est_jaccard =
    *         matching-signature-position fraction, filtered to ≥ `threshold`.
    */
  /** Cap on LSH bucket size: buckets larger than this are dropped entirely.
    * A degenerate key (empty documents, a boilerplate header, a zero vector)
    * otherwise creates a quadratic bucket that no AQE skew handling can save
    * at corpus scale — dropping it loses only pairs that are "similar to
    * everything", which exact dedup already catches. The standard guard in
    * production minhash pipelines.
    */
  val DefaultMaxBucketSize = 5000

  /** Sentinel default for [[prefixContainmentPairs]]/
    * [[prefixContainmentAudit]]'s `maxTokenDf`: derive the cap from the
    * corpus ([[derivedTokenDfCap]]) instead of trusting an absolute that
    * a 10× corpus silently outgrows. Any negative value selects this
    * mode; 0 is fully uncapped; positive is an absolute cap.
    */
  val DfCapDerived: Int = -1

  /** Corpus-derived blocking-token df cap: `max(50, n_docs / 5000)`.
    *
    * Why this band: SCALING.md's sf10 measurement (n_docs = 500,020)
    * found cap 100 = n_docs/5000 restores ~LINEAR candidate growth
    * (1.69M candidates ≈ 2.2× sf1's uncapped 766k for 10× the corpus,
    * vs 6.57M uncapped = 8.6×/decade), at a measured recall cost of
    * 2 / 25,622 pairs — both all-boilerplate, the documented MOSS
    * trade. Because max shingle df itself grows ~linearly with n_docs
    * on natural corpora (25 → 168 → 1,608 across three decades here), a
    * FRACTIONAL cap keeps excising the same "corpus-common boilerplate"
    * band at every decade, which is exactly what an absolute cap fails
    * to do. The floor of 50 keeps small corpora honest: below ~250k
    * docs the derived cap sits at 50, above the df band tiny fixtures
    * reach, so unit-scale joins stay effectively exact.
    */
  def derivedTokenDfCap(nDocs: Long): Int =
    math.max(50L, nDocs / 5000L).toInt

  /** Candidate pairs from banded rows via ONE shuffle: group each bucket,
    * cap its size (the skew guard, free here — it's just a filter on the
    * grouped list), and expand pairs intra-row with a double explode. The
    * alternative a⋈b self-join reads/computes the signature pipeline once
    * per side plus once for bucket counting — 3× the upstream work.
    */
  private[ops] def bucketPairs(
      banded: DataFrame,
      keyCols: Seq[String],
      payload: String,
      maxBucket: Int): DataFrame = {
    val buckets = banded
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(struct(col("id"), col(payload))).as("__members"))
      .where(size(col("__members")) >= 2 &&
        (if (maxBucket > 0) size(col("__members")) <= maxBucket else lit(true)))
    buckets
      .select(explode(col("__members")).as("__a"), col("__members"))
      .select(col("__a"), explode(col("__members")).as("__b"))
      .where(col("__a.id") < col("__b.id"))
      .select(col("__a.id").as("id_a"), col("__b.id").as("id_b"),
        col(s"__a.$payload").as(s"${payload}_a"), col(s"__b.$payload").as(s"${payload}_b"))
  }

  def minhashDupePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    // Declared resolution is a FLOOR ([[autoRowsPerBand]] — the knnGraph
    // law; the default r = 4 already holds at 0.7, so the auto only
    // engages for permissive caller-supplied band settings above the knee).
    val rowsPerBand = autoRowsPerBand(bandingCorpusCount(df), numHashes,
      numHashes / bands, threshold)
    val effBands = numHashes / rowsPerBand
    // Staged projections: tokens → shingles → shingle hashes → signature.
    // Each stage references the previous MATERIALIZED column, so the 64
    // signature positions share one shingle computation instead of each
    // re-deriving it (CollapseProject keeps non-cheap projections apart).
    val sigs = shingleHashSets(df, idCol, textCol, shingleK)
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    // Banding rows carry (band, key, id) only; the two signatures join back
    // per deduped candidate pair — shuffle bytes linear in corpus size, not
    // `bands`× the signature table (same shape as [[ngramJaccardPairs]]).
    val banded = sigs
      .select(col("id"),
        explode(lshBandKeys(col("sig"), effBands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    bucketPairsIds(banded, Seq("band", "key"), maxBucketSize)
      .dropDuplicates("id_a", "id_b")
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** Modulus of the portable minhash hash family: the Mersenne prime 2^31−1.
    * Small enough that a·h₁ + b·h₂ + c stays under 2^58 (no 64-bit overflow
    * on either engine), large enough that min-collisions are ~|shingles|²/2^31
    * — immaterial to the Jaccard estimate.
    */
  val PortableMinhashPrime: Long = graft.functions.PortableMinHash.Prime

  /** Deterministic (a, b, c) coefficient triples in [1, P−1] for the portable
    * minhash position hashes — the SINGLE source is
    * [[graft.functions.PortableMinHash.coeffsFor]] (the fused expression's
    * stream), re-shaped here for the DuckDB oracle generator so the two
    * sides can never drift.
    */
  def portableMinhashCoeffs(numHashes: Int): IndexedSeq[(Long, Long, Long)] = {
    val co = graft.functions.PortableMinHash.coeffsFor(numHashes)
    (0 until numHashes).map(p => (co(3 * p), co(3 * p + 1), co(3 * p + 2)))
  }

  /** [[minhashDupePairs]] under the PORTABLE cross-engine hash policy: one
    * md5 per shingle string (52-bit hex prefix, split into two 26-bit halves
    * h₁/h₂), then position hash p = (aₚ·h₁ + bₚ·h₂ + cₚ) mod (2^31−1) — a
    * standard 2-universal family. Every step is expressible in ANSI-ish SQL
    * (md5 + integer arithmetic), so an independent engine can replay the
    * whole signature → banding → bucket → estimate chain bit-exactly; band
    * bucket keys are the raw slice CONTENT (not a hash) for the same reason.
    * The XXH64-fused default above stays the production hot path (~an order
    * of magnitude cheaper per shingle); this variant is the verification
    * surface, sharing [[bucketPairsIds]] and the estimate/threshold logic
    * with it. Same contract: (id_a, id_b, est_jaccard ≥ threshold).
    */
  def minhashDupePairsPortable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Staged: tokens → fused shingle-join+md5-prefix hashes (byte-identical
    // digest inputs to DuckDB's md5(g); [[graft.functions.Md5ShingleOps]])
    // → fused one-pass position minima ([[graft.functions.PortableMinHash]]).
    val sigs = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        graft.functions.TextFunctions.md5_shingle_hashes(col("toks"), shingleK).as("hs"))
      .select(col("id"),
        graft.functions.TextFunctions.portable_minhash_signature(col("hs"), numHashes)
          .as("sig"))
    val banded = sigs
      .select(col("id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    bucketPairsIds(banded, Seq("band", "key"), maxBucketSize)
      .dropDuplicates("id_a", "id_b")
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup candidate pairs: 64-bit signatures, blocked on 4×16-bit
    * sub-signatures (any pair within Hamming distance 3 must agree on at least
    * one block — pigeonhole), verified by exact Hamming distance.
    */
  def simhashDupePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("id"),
        simhash64(TextAnalysis.tokens(col(textCol))).as("sig")),
      "id", "sig", maxHamming, maxBucketSize)

  /** All pairs of 64-bit signatures within Hamming distance `maxHamming`,
    * banded on the signature's four 16-bit blocks (pigeonhole: ≤ 3 flipped
    * bits leave at least one block untouched, so blocking is LOSSLESS for
    * maxHamming ≤ 3 up to the bucket cap). The shared kernel of
    * [[simhashDupePairs]] (text simhash) and
    * [[Multimodal.imageDupePairs]] (perceptual image hashes) — any 64-bit
    * fingerprint family dedups through the same one-shuffle shape.
    */
  def hammingPairs(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    // 4 blocks pigeonhole ≤ 3 flipped bits; beyond that the banding would
    // silently lose pairs, so the bound is a hard contract.
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0,3] for lossless 4-block banding, got $maxHamming")
    val base = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val blocked = base.select(col("id"), col("sig"),
      explode(array((0 until 4).map { blk =>
        struct(lit(blk).as("blk"),
          shiftright(col("sig"), blk * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.blk"), col("bk.key"))
    bucketPairs(blocked, Seq("blk", "key"), "sig", maxBucketSize)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard similarity pairs, LSH-blocked (the verification
    * stage of minhash dedup). The banding shuffle carries (band, key, id)
    * rows ONLY — never the shingle sets: candidate pairs are deduped across
    * bands while still just id pairs, then each side's set joins back from
    * the one-row-per-doc set table for the exact |∩|/|∪| check. Shuffle
    * bytes stay linear in Σ|sh| (the earlier formulation shipped every
    * document's full set once per band — a `bands`× amplification that at
    * corpus scale turns TBs of text into tens of TBs of exchange; the
    * narrow tokenize→shingle pipeline re-derives per join side instead,
    * and scans are cheap where shuffles are not).
    *
    * Defaults (64 hashes, 32 bands × 2 rows) make blocking effectively
    * exhaustive for the verification threshold: P(miss) = (1 − j²)^32 ≈ 6e-15
    * at j = 0.8, so the exact-Jaccard output matches an all-pairs oracle.
    *
    * Two-stage verification: 2-row bands are deliberately permissive (that
    * is what buys the e-15 recall), so MID-similarity mass floods the
    * candidate set — at j ≈ 0.25 a pair still collides in some band with
    * P ≈ 0.87, and an sf1 stress measured candidate volume growing 79× for
    * 10× data while true pairs grew 9.3× (SCALING.md round 8). Candidates
    * therefore verify against the 64-slot SIGNATURE first (64 longs/doc,
    * already computed for banding): est ≥ threshold − 0.3 keeps every true
    * pair with P(miss) ≈ 1e-9 per pair (6σ of the Binomial(64, j)
    * estimate) while j ≈ 0.25 mass passes at ~2e-6 — only survivors pay
    * the full shingle-set join, whose per-row payload is two orders
    * heavier than a signature.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 32,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    // The tokenize→shingle-hash pipeline is this operator's dominant cost
    // (an sf1 stage profile put ONE pass at ~40% of total runtime), and
    // the plan reads it three times: banding plus both verification join
    // sides. Persist the hashed sets — ~8 bytes/shingle, a fraction of the
    // text bytes, MEMORY_AND_DISK so corpus scale spills instead of
    // evicting — and the signature table derived from them (64 longs/doc,
    // also read three times). Neither is a shuffle: cached blocks stay
    // node-local. Reclaimed by the ContextCleaner when the result becomes
    // unreachable (the linearProbe lifecycle).
    val sets = shingleHashSets(df, idCol, textCol, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sets.select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Corpus size from the SOURCE via [[bandingCorpusCount]] (free below
    // the knee; a count on `sets` would run the whole tokenize+shingle
    // pipeline as a separate job, measured +0.4 s/query at sf0.1). The
    // knee is an order-of-magnitude switch, so the handful of
    // null/short-text rows the sets stage drops cannot move it.
    val rowsPerBand = autoRowsPerBand(bandingCorpusCount(df), numHashes,
      numHashes / bands, threshold)
    val effBands = numHashes / rowsPerBand
    val banded = sigs
      .select(col("id"),
        explode(lshBandKeys(col("sig"), effBands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val sigFloor = math.max(0.0, threshold - 0.3)
    bucketPairsIds(banded, Seq("band", "key"), maxBucketSize)
      .dropDuplicates("id_a", "id_b")
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .where(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
        b => b)).cast("double") / numHashes >= sigFloor)
      .select("id_a", "id_b")
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.TextFunctions.jaccard_sets(col("sh_a"), col("sh_b"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Corpus-size knee above which banding auto-raises rows-per-band. */
  private[ops] val AutoBandKnee: Long = 500000L

  /** Corpus row count for the banding knee — FREE below it: when the
    * optimized plan's sizeInBytes is under 32 MB the corpus cannot hold
    * 500k documents (≥ ~64 compressed source bytes each), so the floor
    * resolution is provably right and no count job runs (measured
    * +0.1–0.3 s/query at sf0.1 otherwise). Larger-or-unknown plans
    * (non-file sources default to huge sizeInBytes) pay one cheap count —
    * parquet pushes it to footer metadata.
    */
  private[ops] def bandingCorpusCount(df: DataFrame): Long =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(32L << 20)) 0L
    else df.count()

  /** Auto LSH band resolution — the [[Similarity.knnGraph]] fixed-resolution
    * law applied to minhash banding: a FIXED rows-per-band makes chance
    * band collisions from moderate-jaccard impostor pairs (j ≈ 0.2–0.3 —
    * e.g. same-source near-miss replicas) grow with n² · j^r, which the
    * sf10 stress measured as 16×-over-linear shuffle bytes at r = 2 on a
    * 5M-doc corpus. Above the [[AutoBandKnee]] the resolution doubles
    * (r → 2r, bands halve) while the banding S-curve
    * 1 − (1 − t^r)^bands keeps ≥ 0.95 recall at the operator's verify
    * threshold — candidate mass from j ≈ 0.25 impostors drops ~20× per
    * doubling, true-pair recall stays contractual, and below the knee
    * (every oracle scale) the resolution — hence every oracled result —
    * is bit-identical to the declared default.
    */
  private[ops] def autoRowsPerBand(
      n: Long, numHashes: Int, floorR: Int, threshold: Double): Int = {
    var r = floorR
    def recallAt(rr: Int): Double =
      1.0 - math.pow(1.0 - math.pow(threshold, rr), numHashes.toDouble / rr)
    while (n >= AutoBandKnee && r * 2 <= numHashes &&
        numHashes % (r * 2) == 0 && recallAt(r * 2) >= 0.95) {
      r *= 2
    }
    r
  }

  /** [[bucketPairs]] without payload: candidate id pairs only, one id-row
    * shuffle (for pipelines that verify by joining per-doc data back).
    */
  private[ops] def bucketPairsIds(
      banded: DataFrame,
      keyCols: Seq[String],
      maxBucket: Int): DataFrame = {
    val buckets = banded
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("id")).as("__members"))
      .where(size(col("__members")) >= 2 &&
        (if (maxBucket > 0) size(col("__members")) <= maxBucket else lit(true)))
    buckets
      .select(explode(col("__members")).as("id_a"), col("__members"))
      .select(col("id_a"), explode(col("__members")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** Containment pairs via winnowing fingerprints (the MOSS construction):
    * pairs where the smaller document's fingerprint set is ≥ `threshold`
    * contained in the larger's — the asymmetric-overlap case (a document
    * quoted inside a longer one) that symmetric Jaccard under-scores by
    * design (|∩|/|∪| shrinks with the length gap, |∩|/min does not).
    *
    * Blocking: each fingerprint IS a blocking key — winnowing guarantees any
    * shared token run of ≥ w + k − 1 tokens shares one. The fingerprint set
    * is duplicate-free, so |fp_a ∩ fp_b| equals the NUMBER of keys whose
    * bucket contains both ids — no set payload needs to ride the shuffle at
    * all. Rows carry only (key, id, |fp|): shuffle bytes are linear in
    * Σ|fp| (the previous formulation shipped the full set on every exploded
    * row — Σ|fp|² per doc, a ~100× amplification on long documents). The
    * per-key pair expansion is capped ([[DefaultMaxBucketSize]]); a
    * fingerprint shared by thousands of documents is boilerplate, and
    * excluding it from the intersection evidence is the MOSS guidance (such
    * grams identify the template, not the quote). Capped-out keys are
    * dropped from BOTH sides of the ratio: the per-doc denominator is the
    * count of the doc's fingerprints that SURVIVED the bucket cap, not its
    * raw fingerprint count — dropping boilerplate keys from the numerator
    * only would systematically underestimate containment for any document
    * sharing a corpus-common fingerprint (an exact duplicate pair must
    * score 1.0 regardless of how much boilerplate it carries).
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleK: Int = 3,
      window: Int = 4,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
      graft.functions.TextFunctions.winnow_fingerprints(
        TextAnalysis.tokens(col(textCol)), shingleK, window).as("fp"))
      .select(col("id"), explode(col("fp")).as("key"))
    // Buckets that survive the boilerplate cap — INCLUDING singletons, which
    // contribute no pairs but do count as non-shared evidence in the
    // denominator.
    val buckets = exploded
      .groupBy(col("key"))
      .agg(collect_list(col("id")).as("__members"))
      .where(if (maxBucketSize > 0) size(col("__members")) <= maxBucketSize
        else lit(true))
    val nEff = buckets
      .select(explode(col("__members")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n"))
    val shared = buckets
      .where(size(col("__members")) >= 2)
      .select(explode(col("__members")).as("id_a"), col("__members"))
      .select(col("id_a"), explode(col("__members")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("__shared"))
    shared
      .join(nEff.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(nEff.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("__shared").cast("double") / least(col("n_a"), col("n_b")))
          .as("containment"))
      .where(col("containment") >= threshold)
  }

  /** Embedding near-dup pairs: cosine ≥ threshold, blocked by banded
    * random-hyperplane LSH with capped buckets (see
    * [[Similarity.cosinePairsLsh]]).
    */
  def embeddingDupePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      bands: Int = 16,
      planesPerBand: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    Similarity.cosinePairsLsh(df, idCol, vecCol, threshold, bands, planesPerBand,
      seed, maxBucketSize)

  /** Sentence list of a text column: maximal runs of non-terminator
    * characters plus their trailing `.!?` punctuation, trimmed, empties
    * dropped. Lookaround-free (runs, not split points), so the identical
    * pattern executes in any linear-time regex engine — which keeps every
    * operator built on it SQL-oracle-able.
    */
  def sentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0)),
        s => trim(s)),
      s => s =!= "")

  /** C4's corpus-level exact span dedup (Raffel et al. 2020 §2.2: "we
    * discard all but one of any three-sentence span occurring more than
    * once in the data set"). The FIRST occurrence — lowest (id, position)
    * — survives; every other occurrence has its sentences removed, and the
    * cleaned text is rebuilt from the survivors. Documents shorter than
    * `span` sentences carry no spans and pass through unchanged.
    *
    * Output: (id, n_sentences, n_spans, n_dup_spans, cleaned_text).
    *
    * Scale shape: spans shuffle as (64-bit span hash, id, position) — the
    * sentence text never rides a shuffle. The first-occurrence election is
    * a min-struct aggregation (map-side partial) on the span hash; the
    * instance join that marks losers reuses the same key. Per-document
    * state is a bounded int list of duplicate span positions. Same
    * position-indexed rebuild as [[removeBoilerplate]], but keyed on
    * first-occurrence election rather than document frequency — C4 keeps
    * one copy of a repeated span, removeBoilerplate deletes ubiquitous
    * spans everywhere.
    */
  def dedupSentenceSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      span: Int = 3): DataFrame = {
    require(span >= 1, s"span must be >= 1, got $span")
    // Null text degrades to zero sentences (not null counts downstream).
    val staged = df.select(col(idCol).as("id"),
      coalesce(sentences(col(textCol)), array().cast("array<string>")).as("__s"))
    val spans = staged
      .select(col("id"),
        when(size(col("__s")) < span, array().cast("array<int>"))
          .otherwise(sequence(lit(0), size(col("__s")) - span)).as("__idx"),
        col("__s"))
      .select(col("id"), explode(col("__idx")).as("idx"),
        xxhash64(concat_ws(" ",
          slice(col("__s"), col("idx") + 1, lit(span)))).as("h"))
    val first = spans
      .groupBy("h")
      .agg(min(struct(col("id"), col("idx"))).as("__first"))
    val dups = spans.join(first, Seq("h"))
      .where(col("id") =!= col("__first.id") ||
        col("idx") =!= col("__first.idx"))
      .groupBy("id")
      .agg(sort_array(collect_list(col("idx"))).as("__dup"))
    staged.join(dups, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(col("__s")).cast("long").as("n_sentences"),
        greatest(size(col("__s")) - (span - 1), lit(0))
          .cast("long").as("n_spans"),
        coalesce(size(col("__dup")), lit(0)).cast("long").as("n_dup_spans"),
        concat_ws(" ",
          filter(col("__s"), (s, j) =>
            !exists(coalesce(col("__dup"), array().cast("array<int>")),
              i => j >= i && j < i + span)))
          .as("cleaned_text"))
  }

  /** Exact duplicate-substring spans, the suffix-array dedup of Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499) re-expressed Spark-first: for every document, the
    * maximal token spans in which EVERY `minLen`-gram occurs at least
    * twice in the corpus (in another document, or at another position of
    * the same one). A genuinely duplicated substring of M ≥ minLen tokens
    * is exactly a run of M − minLen + 1 consecutive corpus-duplicated
    * minLen-grams, so every true duplicate span is reported at full
    * extent; runs whose windows match at DIFFERENT other sites also
    * qualify (the standard seed-without-global-verify relaxation — for a
    * removal policy that is the conservative direction).
    *
    * The reference method builds one monolithic suffix array — inherently
    * single-machine. The distributed shape instead seeds with the fused
    * position-indexed [[graft.functions.NgramHashes]] kernel (gram j
    * covers tokens [j, j+minLen−1]) and merges ADJACENT duplicated seeds
    * per document: ONE count shuffle over compact (hash) keys, a join
    * back whose build side is only the duplicated-gram set (AQE
    * broadcasts it when small), one per-document window to rank
    * positions, and a gaps-and-islands aggregation — shuffle payloads are
    * (id, pos, hash) longs only; document text never rides a shuffle.
    *
    * Output: one row per maximal span — (id, start_tok, end_tok
    * inclusive, n_tokens) in token coordinates of the engine tokenizer.
    * Spans of one document never overlap (islands are disjoint), so
    * `sum(n_tokens)` per doc is the exact duplicated-token mass (see
    * [[duplicateTokenRatio]]).
    */
  def duplicateSubstringSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 8): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val seeds = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("id"),
        graft.functions.TextFunctions.ngram_hashes(col("__t"), minLen).as("__g"))
      .select(col("id"), posexplode(col("__g")).as(Seq("pos", "gh")))
    val dup = seeds.groupBy("gh").agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).select("gh")
    // Island break only when the gap to the previous duplicated seed is
    // >= minLen: a seed at p covers tokens [p, p+minLen-1], so seeds with
    // gap <= minLen-1 cover overlapping-or-adjacent token ranges and MUST
    // share a span (a pos-minus-row_number grouping would split them into
    // spans that overlap in token coordinates, breaking the
    // non-overlap invariant and letting dup_frac exceed 1.0).
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val ranked = seeds.join(dup, Seq("gh"))
      .withColumn("__nw",
        when(col("pos") - lag(col("pos"), 1).over(w) < minLen, 0)
          .otherwise(1))
      .withColumn("__grp", sum(col("__nw")).over(w))
    ranked.groupBy(col("id"), col("__grp"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + (minLen - 1)).cast("long").as("end_tok"))
      .select(col("id").as(idCol), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1L).as("n_tokens"))
  }

  /** [[duplicateSubstringSpans]] at suffix-array FIDELITY: maximal token
    * spans that occur — as a WHOLE, at one specific partner site — at
    * least twice in the corpus, for any match length ≥ `minLen`. The
    * relaxed operator above only requires each seed gram to be duplicated
    * SOMEWHERE; this one verifies the extension, so a span longer than
    * `minLen` is reported exactly when the full substring repeats
    * (Lee et al. 2022's suffix-array semantics, arXiv:2107.06499 §4).
    *
    * Method — k-gram anchored diagonal chaining, the distributed stand-in
    * for the suffix array's LCP extension: inside an exact repeat every
    * `minLen`-gram matches the partner at the SAME diagonal
    * (pos_a − pos_b), and consecutive seed positions chain; a break in
    * the chain is precisely a mismatching token, so a maximal run of
    * r consecutive matched seeds IS a maximal exact pairwise match of
    * r + minLen − 1 tokens. Per document, the pairwise match intervals
    * then union-merge (overlapping or adjacent) into the final covered
    * spans — the removal mask Lee et al. apply.
    *
    * Scale shape: one count-style shuffle on gram hashes into member
    * buckets; pair expansion is quadratic ONLY within a bucket and
    * buckets above `maxBucketSize` are dropped on BOTH sides (corpus-wide
    * boilerplate grams identify the template, not a quote — the
    * containmentPairs convention; capped grams can only split a chain,
    * never fabricate a match, so the output stays exact, possibly
    * fragmented, under the cap). Every shuffled row is (id, partner,
    * diag, pos) longs; document text never rides a shuffle.
    *
    * Output: one row per maximal merged span — (id, start_tok, end_tok
    * inclusive, n_tokens), disjoint per document; a strict subset of the
    * relaxed operator's coverage.
    */
  def duplicateSubstringSpansExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 8,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(maxBucketSize >= 2, s"maxBucketSize must be >= 2, got $maxBucketSize")
    val seeds = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("id"),
        graft.functions.TextFunctions.ngram_hashes(col("__t"), minLen).as("__g"))
      .select(col("id"), posexplode(col("__g")).as(Seq("pos", "gh")))
    val buckets = seeds
      .groupBy("gh")
      .agg(collect_list(struct(col("id"), col("pos"))).as("m"))
      .where(size(col("m")).between(2, maxBucketSize))
    // Occurrence pairs (lexicographic (id, pos) order), then one coverage
    // row per SIDE: the same match must mask tokens in both documents.
    val pairs = buckets
      .select(explode(col("m")).as("a"), col("m"))
      .select(col("a"), explode(col("m")).as("b"))
      .where(col("a.id") < col("b.id") ||
        (col("a.id") === col("b.id") && col("a.pos") < col("b.pos")))
    val cov = pairs
      .select(col("a.id").as("id"), col("b.id").as("partner"),
        (col("a.pos") - col("b.pos")).as("diag"), col("a.pos").as("pos"))
      .unionByName(pairs
        .select(col("b.id").as("id"), col("a.id").as("partner"),
          (col("b.pos") - col("a.pos")).as("diag"), col("b.pos").as("pos")))
    // Diagonal chaining: a gap of exactly 1 extends the exact match by one
    // token; any larger gap means an intermediate gram mismatched (inside
    // a true repeat EVERY gram matches, so seeds occur at every position).
    val wc = Window.partitionBy(col("id"), col("partner"), col("diag"))
      .orderBy(col("pos"))
    val matches = cov
      .withColumn("__nw",
        when(col("pos") - lag(col("pos"), 1).over(wc) <= 1, 0).otherwise(1))
      .withColumn("__grp", sum(col("__nw")).over(wc))
      .groupBy(col("id"), col("partner"), col("diag"), col("__grp"))
      .agg(min(col("pos")).as("s"),
        (max(col("pos")) + (minLen - 1)).as("e"))
    // Per-document union of pairwise intervals (overlap-or-adjacent merge)
    // — the standard running-max-end gaps-and-islands.
    val wm = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
    matches.select(col("id"), col("s"), col("e"))
      .withColumn("__pe", max(col("e")).over(
        wm.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__nw",
        when(col("__pe").isNull || col("s") > col("__pe") + 1, 1).otherwise(0))
      .withColumn("__grp2", sum(col("__nw")).over(wm))
      .groupBy(col("id"), col("__grp2"))
      .agg(min(col("s")).cast("long").as("start_tok"),
        max(col("e")).cast("long").as("end_tok"))
      .select(col("id").as(idCol), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1L).as("n_tokens"))
  }

  /** Content-defined chunking (CDC) dedup — the FastCDC/rsync idea at the
    * token level: a chunk boundary falls AFTER token j whenever the hash
    * of the k-gram ENDING at j is ≡ 0 (mod `modulus`), so boundaries
    * depend only on LOCAL content. Insert or delete a token and every
    * chunk except the one containing the edit re-aligns — the dedup
    * remains effective under shifts, where fixed-offset windows all move
    * and match nothing. Expected chunk length is `modulus` tokens.
    *
    * Returns one row per chunk: (id, start_tok, n_tokens, n_occurrences)
    * where n_occurrences counts the chunk's content across the whole
    * corpus (> 1 ⇒ duplicated). Cut decisions and chunk identity both
    * hash md5 OF THE TOKEN STRING (the engine's cross-engine policy), so
    * the full chunking + dedup is engine-replayable.
    *
    * Scale shape: chunking is a per-row array computation (no explode
    * until chunks exist); chunk rows shuffle as (id, start, len, hash) —
    * the chunk TEXT is hashed and dropped before any exchange; ONE count
    * aggregation on the hash and a hash-keyed join back. Short docs
    * (< k tokens) form a single whole-doc chunk.
    */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      modulus: Int = 8): DataFrame = {
    require(k >= 1 && modulus >= 2, s"need k >= 1, modulus >= 2: $k, $modulus")
    val staged = df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
    val n = size(col("__t"))
    // Cut decisions + chunk identity hashes in ONE fused pass
    // (graft.functions.CdcChunkStructs): the previous composed form ran
    // the per-position md5 cut test inside a higher-order `filter` lambda
    // — HOFs never enter whole-stage codegen, so every token position
    // paid an interpreted concat_ws + catalyst md5 tree. Hash policy
    // (md5 hex of space-joined tokens, first-13-hex-digits cut key) is
    // byte-identical, so the DuckDB oracles are unchanged.
    val chunks = staged
      .where(n > 0)
      .select(col("id"), explode(
        graft.functions.CdcFunctions.cdc_chunk_structs(col("__t"), k, modulus))
        .as("c"))
      .select(col("id"), col("c.st").cast("long").as("start_tok"),
        col("c.ln").cast("long").as("n_tokens"), col("c.h").as("h"))
    val counts = chunks.groupBy("h").agg(count(lit(1)).as("n_occurrences"))
    chunks.join(counts, Seq("h"))
      .select(col("id").as(idCol), col("start_tok"), col("n_tokens"),
        col("n_occurrences"))
  }

  /** Per-document CDC dedup stats from [[cdcChunks]]: chunk count, chunks
    * whose content appears elsewhere in the corpus, duplicated-token mass
    * and fraction. Chunkless (empty) docs report zeros.
    */
  def cdcDedupStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      modulus: Int = 8): DataFrame = {
    val per = cdcChunks(df, idCol, textCol, k, modulus)
      .groupBy(col(idCol).as("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum((col("n_occurrences") > 1).cast("long")).as("n_dup_chunks"),
        sum(when(col("n_occurrences") > 1, col("n_tokens"))
          .otherwise(0L)).as("dup_tokens"),
        sum(col("n_tokens")).as("n_tokens_doc"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_tokens_doc"), lit(0L)), lit(1L)))
          .as("dup_frac"))
  }

  /** Duplicate-substring REMOVAL (the action [[duplicateSubstringSpans]]
    * only measures) — Lee et al. 2022's policy: every duplicated
    * `minLen`-gram keeps its FIRST corpus occurrence (minimum (doc, pos))
    * and loses the rest; removable seed positions merge into maximal
    * token spans per document, those tokens are cut, and the cleaned
    * (lowercased, re-spaced) text is rebuilt. A document equal to an
    * earlier one therefore collapses to nothing; partial quotes lose
    * exactly the quoted run.
    *
    * Scale shape: the first-occurrence election is ONE min-aggregation on
    * the gram hash (struct of (doc, pos) — no text); removable seeds are
    * (id, pos) longs through one per-doc window; the span list per doc is
    * bounded by the doc's own length, joined back broadcast-style per
    * row. Text bytes never ride a shuffle.
    *
    * Output: (id, n_tokens, n_removed, cleaned_text).
    */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 8): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val staged = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__t"))
    val seeds = staged
      .select(col("id"),
        graft.functions.TextFunctions.ngram_hashes(col("__t"), minLen).as("__g"))
      .select(col("id"), posexplode(col("__g")).as(Seq("pos", "gh")))
    val first = seeds.groupBy("gh")
      .agg(min(struct(col("id"), col("pos"))).as("__first"),
        count(lit(1)).as("__n"))
      .where(col("__n") > 1)
    // Same gap-aware island merge as [[duplicateSubstringSpans]]: seeds
    // whose gap is <= minLen-1 cover overlapping token ranges and must
    // form one span.
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val removable = seeds.join(first, Seq("gh"))
      .where(col("id") =!= col("__first.id") ||
        col("pos") =!= col("__first.pos"))
      .withColumn("__nw",
        when(col("pos") - lag(col("pos"), 1).over(w) < minLen, 0)
          .otherwise(1))
      .withColumn("__grp", sum(col("__nw")).over(w))
    val spans = removable.groupBy(col("id"), col("__grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (minLen - 1)).as("e"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("__sp"))
    staged.join(spans, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        coalesce(size(filter(col("__t"), (_, j) =>
          exists(coalesce(col("__sp"),
              array().cast("array<struct<s:int,e:int>>")),
            sp => j >= sp.getField("s") && j <= sp.getField("e")))),
          lit(0)).cast("long").as("n_removed"),
        concat_ws(" ",
          filter(col("__t"), (_, j) =>
            !exists(coalesce(col("__sp"),
                array().cast("array<struct<s:int,e:int>>")),
              sp => j >= sp.getField("s") && j <= sp.getField("e"))))
          .as("cleaned_text"))
  }

  /** Span-level REFERENCE scrubbing — the surgical counterpart of
    * doc-level decontamination ([[graft.ops.Curation.decontaminate]]
    * flags whole documents; this CUTS the offending runs and keeps the
    * rest): every maximal train-document token span whose `minLen`-grams
    * all appear in the REFERENCE corpus (eval benchmarks, a copyright
    * blocklist, already-trained data) is removed and the cleaned text
    * rebuilt — the Lee et al. removal policy with the duplicate-gram set
    * replaced by the reference's gram set.
    *
    * Scale shape: the reference's DISTINCT gram hashes are one
    * aggregation (reference corpora are small by nature — AQE broadcasts
    * the join); train seeds shuffle as (id, pos, hash) longs through one
    * gram-keyed join, islands merge gap-aware per document (gap < minLen
    * ⇒ one span, the non-overlap invariant), and the cut is a narrow
    * array filter per row. Train text never rides a shuffle.
    *
    * Output: (id, n_tokens, n_removed, cleaned_text).
    */
  def removeReferenceSpans(
      train: DataFrame,
      trainId: String,
      trainText: String,
      ref: DataFrame,
      refText: String,
      minLen: Int = 8): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val staged = train
      .select(col(trainId).as("id"), TextAnalysis.tokens(col(trainText)).as("__t"))
    val seeds = staged
      .select(col("id"),
        graft.functions.TextFunctions.ngram_hashes(col("__t"), minLen).as("__g"))
      .select(col("id"), posexplode(col("__g")).as(Seq("pos", "gh")))
    val refGrams = ref
      .select(TextAnalysis.tokens(col(refText)).as("__t"))
      .select(explode(
        graft.functions.TextFunctions.ngram_hashes(col("__t"), minLen)).as("gh"))
      .distinct()
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val removable = seeds.join(refGrams, Seq("gh"))
      .withColumn("__nw",
        when(col("pos") - lag(col("pos"), 1).over(w) < minLen, 0)
          .otherwise(1))
      .withColumn("__grp", sum(col("__nw")).over(w))
    val spans = removable.groupBy(col("id"), col("__grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (minLen - 1)).as("e"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("__sp"))
    staged.join(spans, Seq("id"), "left")
      .select(col("id").as(trainId),
        size(col("__t")).cast("long").as("n_tokens"),
        coalesce(size(filter(col("__t"), (_, j) =>
          exists(coalesce(col("__sp"),
              array().cast("array<struct<s:int,e:int>>")),
            sp => j >= sp.getField("s") && j <= sp.getField("e")))),
          lit(0)).cast("long").as("n_removed"),
        concat_ws(" ",
          filter(col("__t"), (_, j) =>
            !exists(coalesce(col("__sp"),
                array().cast("array<struct<s:int,e:int>>")),
              sp => j >= sp.getField("s") && j <= sp.getField("e"))))
          .as("cleaned_text"))
  }

  /** Per-document duplicated-token mass from [[duplicateSubstringSpans]]:
    * (id, n_tokens total, dup_tokens, n_spans, dup_frac) — `dup_frac` is
    * the fraction of the document's tokens covered by corpus-duplicated
    * spans, the signal an exact-substring removal policy thresholds on.
    * Documents with no duplicated span report zeros (left join, not
    * dropped). Same scale shape as the span pass plus one id-keyed join
    * against the (id, token-count) projection.
    */
  def duplicateTokenRatio(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 8): DataFrame = {
    val totals = df.select(col(idCol).as("id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens_doc"))
    val perDoc = duplicateSubstringSpans(df, idCol, textCol, minLen)
      .groupBy(col(idCol).as("id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("n_tokens")).as("dup_tokens"))
    totals.join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens_doc"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          greatest(col("n_tokens_doc"), lit(1L))).as("dup_frac"))
  }

  /** Handle to a persisted incremental-dedup index ([[writeBandIndex]]). */
  final case class BandIndex(
      bandsTable: String,
      setsTable: String,
      shingleK: Int,
      numHashes: Int,
      bands: Int)

  /** Persist the MinHash-LSH index of a corpus as two BUCKETED tables so
    * later crawl batches dedup against it WITHOUT rescanning (or
    * reshuffling) the corpus — the incremental-crawl shape: at 100 TB the
    * existing corpus is orders bigger than a day's batch, and re-banding
    * it per batch is the cost this index amortizes to zero.
    *
    *   - `bandsTable` (bkey, id): one row per LSH band bucket membership,
    *     bucketed by bkey — batch candidates join it shuffle-free on the
    *     stored side ([[Scale.writeBucketed]] mechanics).
    *   - `setsTable` (id, sh): each document's distinct shingle-hash set,
    *     bucketed by id — candidate verification joins it shuffle-free.
    *
    * Band buckets larger than `maxBucketSize` are dropped AT BUILD TIME
    * (the [[bucketPairs]] cap policy, applied once instead of per batch):
    * an overfull bucket is boilerplate-shaped, and its join multiplicity
    * would otherwise explode every future batch.
    */
  def writeBandIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bandsTable: String,
      setsTable: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      numBuckets: Int = 32,
      maxBucketSize: Int = DefaultMaxBucketSize): BandIndex = {
    // Overwrite must survive a FRESH session over an old warehouse dir:
    // a new in-memory catalog has no table entry, but the managed
    // location on disk remains and saveAsTable refuses it — drop both.
    val spark = df.sparkSession
    Seq(bandsTable, setsTable).foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tbl.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val sets = shingleHashSets(df, idCol, textCol, shingleK)
    val banded = bandRows(sets, numHashes, bands)
    val keep = banded.groupBy("bkey").count()
      .where(col("count") <= maxBucketSize).select("bkey")
    banded.join(keep, "bkey")
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "bkey").sortBy("bkey").saveAsTable(bandsTable)
    sets.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "id").sortBy("id").saveAsTable(setsTable)
    BandIndex(bandsTable, setsTable, shingleK, numHashes, bands)
  }

  /** (id, sh) → (bkey, id) band-bucket rows; bkey folds (band, key) into
    * one join column via xxhash64 (band-salted so equal keys in different
    * bands stay distinct buckets; overflow-free under ANSI arithmetic).
    */
  private def bandRows(sets: DataFrame, numHashes: Int, bands: Int): DataFrame =
    sets.select(col("id"),
        minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("id"),
        explode(lshBandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
      .select(col("id"), xxhash64(col("bk.band"), col("bk.key")).as("bkey"))

  /** Dedup a new batch AGAINST a persisted [[BandIndex]]: band the batch,
    * join its band rows to the stored buckets (corpus side pre-bucketed —
    * no corpus shuffle), and exact-verify candidates by shingle-hash
    * Jaccard against the stored sets (again joining into the corpus-side
    * buckets). Only batch rows and candidates ever move. Returns
    * (new_id, old_id, jaccard ≥ threshold) — same verification semantics
    * as [[ngramJaccardPairs]] (Jaccard over the 64-bit shingle hashes ≡
    * Jaccard over shingle strings up to ~1e-10 collision mass), so a SQL
    * oracle recomputes it from the raw text of both tables.
    */
  def dedupAgainstIndex(
      newBatch: DataFrame,
      idCol: String,
      textCol: String,
      index: BandIndex,
      threshold: Double = 0.8): DataFrame = {
    val spark = newBatch.sparkSession
    val oldBands = spark.table(index.bandsTable)
      .select(col("bkey"), col("id").as("old_id"))
    val oldSets = spark.table(index.setsTable)
      .select(col("id").as("old_id"), col("sh").as("sh_old"))
    val newSets = shingleHashSets(newBatch, idCol, textCol, index.shingleK)
    val cand = bandRows(newSets, index.numHashes, index.bands)
      .withColumnRenamed("id", "new_id")
      .join(oldBands, "bkey")
      .select("new_id", "old_id")
      .dropDuplicates("new_id", "old_id")
    cand
      .join(newSets.select(col("id").as("new_id"), col("sh").as("sh_new")), "new_id")
      .join(oldSets, "old_id")
      .select(col("new_id"), col("old_id"),
        graft.functions.TextFunctions.jaccard_sets(col("sh_new"), col("sh_old"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Human-auditable EVIDENCE for near-dup pairs: each verified
    * [[ngramJaccardPairs]] pair annotated with its shared-shingle count
    * and the first `nSamples` shared shingles as text — what a curation
    * reviewer (or an appeals process) reads to see WHY two documents were
    * linked, instead of an opaque score. Scale shape: the evidence join
    * touches only the PAIR set — each side's shingle-string array rides
    * once per pair, bounded by verified pairs, never corpus², and the
    * heavy banding/verification work is [[ngramJaccardPairs]]' unchanged.
    */
  def dupeEvidence(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      nSamples: Int = 5): DataFrame = {
    graft.ops.Curation.requireIntegralId(df, idCol, "dupeEvidence")
    // Shingle-string ARRAYS are the heavy payload here, so derive them
    // ONLY for pair members: the pair ids (small by construction)
    // broadcast-filter the corpus — one narrow probe scan, no corpus
    // shuffle — and every later join moves member-bounded rows. The two
    // rejected shapes, both measured at sf1: an un-hinted sort-merge
    // join shuffles every document's shingle arrays (2× the ngram
    // pipeline's whole cost); broadcasting the array-carrying side
    // instead ships those arrays through the driver (worse still).
    val pairIds = ngramJaccardPairs(df, idCol, textCol, shingleK, threshold)
      .select("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val members = pairIds
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val sets = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__t"))
      .join(broadcast(members), "id")
      .select(col("id"),
        array_distinct(TextAnalysis.shingles(col("__t"), shingleK)).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairIds
      .join(sets.select(col("id").as("id_a"), col("s").as("sa")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        array_sort(array_intersect(col("sa"), col("sb"))).as("__sh"))
      .select(col("id_a"), col("id_b"),
        size(col("__sh")).cast("long").as("n_shared"),
        array_join(slice(col("__sh"), 1, nSamples), " | ").as("evidence"))
  }

  /** Edit-distance record linkage: every pair of records whose string field
    * is within Levenshtein distance `maxDist` — the fuzzy-key join used to
    * link near-identical titles / names / queries across sources. Candidate
    * generation is the segment-index scheme of PassJoin (Li, Deng & Feng,
    * ICDE 2011, simplified): chunk each record's string into d+1 contiguous
    * even chunks; if ed(a, b) ≤ d, at least one of a's d+1 chunks survives
    * the optimal edit script untouched, so it appears EXACTLY in b at a
    * position shifted by at most d. The index side emits its d+1 chunks
    * keyed by (length, chunk#, content); the probe side emits, for every
    * indexable length L' within ±d of its own, the substrings that chunk
    * (chunk#, L') could align to (≤ 2d+1 shifts). Candidates meet on the
    * exact key — LOSSLESS blocking (unlike MinHash banding there is no
    * recall parameter; every qualifying pair is generated) — then one
    * `levenshtein` verification per distinct candidate pair.
    *
    * Scale shape: exact-duplicate strings are collapsed FIRST (window-min
    * representative per distinct string), so the PassJoin runs over
    * DISTINCT strings only — N records sharing one string contribute one
    * index/probe row set, not N (the identical-string case would otherwise
    * make every shared (length, chunk#, content) bucket quadratic in the
    * duplicate count; measured 14× for 10× data on a dup-heavy corpus
    * before the collapse, SCALING.md). Per distinct string the index side
    * is d+1 rows and the probe side ≤ (2d+1)²·(d+1) rows of SHORT
    * substrings (75 for d = 2) — linear with a small constant; the only
    * shuffles are the (length, chunk#, content) equi-join, the pair dedup,
    * and the group expansion equi-joins. corpus² never materializes:
    * bucket membership requires an exact substring match at an aligned
    * position by DISTINCT strings, so residual bucket skew comes only from
    * near-identical (not equal) boilerplate, where verification stays
    * pair-exact and AQE splits the join. Group expansion is output-bound:
    * intra-group pairs (dist 0) and cross-group member products are
    * exactly the pairs the all-pairs answer contains.
    *
    * Strings shorter than d+1 characters cannot supply d+1 non-empty
    * chunks, so the pigeonhole argument needs both special cases kept:
    * such strings still PROBE (a short string links to a chunked longer
    * one), and pairs where BOTH sides are ≤ d characters — including the
    * EMPTY string, which contributes no probe rows — are within distance d
    * unconditionally (ed ≤ max of the lengths), so the short stratum
    * contributes all its pairs directly. Output: (id1 < id2, dist ≤
    * maxDist) — exactly the all-pairs answer over non-null strings, so a
    * SQL oracle is a quadratic `levenshtein` at test scale.
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 2): DataFrame = {
    graft.ops.Curation.requireIntegralId(df, idCol, "editDistancePairs")
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val d = maxDist
    val dp1 = d + 1
    // Collapse exact duplicates: gid = min id over each distinct string.
    // ONE shuffle on the string (these are short linkage fields, not
    // document bodies); everything downstream of the PassJoin core is
    // keyed by gid, so identical strings never meet in a blocking bucket.
    val mem = df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .where(col("s").isNotNull)
      .withColumn("gid", min(col("id")).over(Window.partitionBy(col("s"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The distinct-string (id, s, L) table feeds FIVE branches (index,
    // probe, two verify sides, shorts) — persist it so the window output
    // scans once (the ngramJaccardPairs persisted-sets convention).
    val recs = mem.where(col("id") === col("gid"))
      .select(col("id"), col("s"))
      .withColumn("L", length(col("s")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Index side: the d+1 even chunks of each record of length >= d+1.
    val idx = recs.where(col("L") >= dp1)
      .select(col("id").as("id_a"), col("s").as("s_a"), col("L").as("La"),
        explode(sequence(lit(0), lit(d))).as("i"))
      .withColumn("st", floor(col("i") * col("La") / dp1).cast("long"))
      .withColumn("ln",
        (floor((col("i") + 1) * col("La") / dp1) - col("st")).cast("long"))
      .where(col("ln") >= 1)
      .select(col("id_a"), col("La"), col("i"),
        expr("substring(s_a, CAST(st + 1 AS INT), CAST(ln AS INT))").as("chunk"))
    // Probe side: for every indexable length within +-d, the substrings each
    // chunk could align to (shift bounded by d).
    val probe = recs
      .select(col("id").as("id_b"), col("s").as("s_b"), col("L").as("Lb"),
        explode(sequence(greatest(col("L") - d, lit(dp1)), col("L") + d))
          .as("Lp"))
      .select(col("id_b"), col("s_b"), col("Lb"), col("Lp"),
        explode(sequence(lit(0), lit(d))).as("i"))
      .withColumn("st", floor(col("i") * col("Lp") / dp1).cast("long"))
      .withColumn("ln",
        (floor((col("i") + 1) * col("Lp") / dp1) - col("st")).cast("long"))
      .where(col("ln") >= 1)
      .select(col("id_b"), col("s_b"), col("Lb"), col("Lp"), col("i"),
        col("ln"),
        explode(sequence(col("st") - d, col("st") + d)).as("ps"))
      .where(col("ps") >= 0 && col("ps") + col("ln") <= col("Lb"))
      .select(col("id_b"), col("Lp").as("La"), col("i"),
        expr("substring(s_b, CAST(ps + 1 AS INT), CAST(ln AS INT))").as("chunk"))
      .dropDuplicates("id_b", "La", "i", "chunk")
    val cand = idx.join(probe, Seq("La", "i", "chunk"))
      .where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id1"),
        greatest(col("id_a"), col("id_b")).as("id2"))
      .dropDuplicates("id1", "id2")
    val byId = recs.select(col("id"), col("s"))
    val verified = cand
      .join(byId.withColumnsRenamed(Map("id" -> "id1", "s" -> "s1")), "id1")
      .join(byId.withColumnsRenamed(Map("id" -> "id2", "s" -> "s2")), "id2")
      .select(col("id1"), col("id2"),
        levenshtein(col("s1"), col("s2")).as("dist"))
      .where(col("dist") <= d)
    // Short stratum: both sides <= d chars => ed <= max(L) <= d, always in
    // (the empty string lives here: it can't chunk or probe, but every
    // pair it forms with a <= d-char string qualifies unconditionally).
    val shorts = recs.where(col("L") <= d).select(col("id"), col("s"))
    val shortPairs = shorts.as("x").join(shorts.as("y"),
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        levenshtein(col("x.s"), col("y.s")).as("dist"))
    // repPairs link DISTINCT strings (dist >= 1 by construction). Expand
    // back to record ids: intra-group pairs are dist 0 exactly; a rep pair
    // fans out to the member product of its two groups (same dist — the
    // members ARE those strings). Both joins are gid-keyed and output-
    // bound: they emit precisely the pairs the all-pairs answer contains.
    val repPairs = verified.unionByName(shortPairs)
    val intra = mem.as("x").join(mem.as("y"),
        col("x.gid") === col("y.gid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        lit(0).cast("int").as("dist"))
    val cross = repPairs
      .join(mem.select(col("gid").as("id1"), col("id").as("ida")), "id1")
      .join(mem.select(col("gid").as("id2"), col("id").as("idb")), "id2")
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), col("dist"))
    intra.unionByName(cross)
  }

  /** One comparison field of [[recordLinkage]]: agreement adds `agreeW`,
    * disagreement adds `disagreeW` (negative) — the caller supplies the
    * integerized log-likelihood weights (log2(m/u) and log2((1−m)/(1−u))
    * in centi-bans or any fixed unit; keeping them integer keeps the
    * score exact cross-engine, and the m/u ESTIMATION — EM over the
    * agreement patterns — is a separate concern the caller runs offline).
    */
  final case class LinkField(field: String, agreeW: Long, disagreeW: Long)

  /** Fellegi–Sunter record linkage (1969 — THE probabilistic entity-
    * resolution model): candidate pairs from equality BLOCKING on
    * `blockCol`, each pair scored by the sum of per-field agreement /
    * disagreement weights, classified match / possible / non-match by the
    * two thresholds. Nulls never agree (a missing field is evidence of
    * nothing — both agree and disagree weights are withheld, the standard
    * treatment).
    *
    * Scale shape: the block join is key-equality (shuffle on the blocking
    * key, the classic linkage blocking); `maxBlockSize` drops
    * pathological blocks on BOTH sides (the bucket-cap convention —
    * an over-full block is a degenerate key, not signal). Only ids +
    * compared fields ride the join. Output (id_a, id_b, score, n_agree,
    * verdict) for pairs scoring ≥ `lower`.
    */
  def recordLinkage(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      blockCol: String,
      fields: Seq[LinkField],
      upper: Long,
      lower: Long,
      maxBlockSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(fields.nonEmpty, "recordLinkage needs at least one field")
    require(upper >= lower, s"need upper >= lower, got $upper < $lower")
    graft.ops.Curation.requireIntegralId(left, leftId, "recordLinkage")
    graft.ops.Curation.requireIntegralId(right, rightId, "recordLinkage")
    def side(df: DataFrame, id: String, tag: String): DataFrame = {
      val base = df.select(
        (col(id).cast("long").as(s"id_$tag") +:
          col(blockCol).cast("string").as("__b") +:
          fields.map(f => col(f.field).cast("string").as(s"__${f.field}_$tag"))): _*)
      val capped = base.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBlockSize).select("__b")
      base.join(capped, "__b")
    }
    val l = side(left, leftId, "a")
    val r = side(right, rightId, "b")
    val score = fields.map { f =>
      val a = col(s"__${f.field}_a"); val b = col(s"__${f.field}_b")
      when(a.isNull || b.isNull, lit(0L))
        .when(a === b, lit(f.agreeW)).otherwise(lit(f.disagreeW))
    }.reduce(_ + _)
    val nAgree = fields.map { f =>
      val a = col(s"__${f.field}_a"); val b = col(s"__${f.field}_b")
      (a.isNotNull && b.isNotNull && a === b).cast("long")
    }.reduce(_ + _)
    l.join(r, "__b")
      .select(col("id_a"), col("id_b"), score.as("score"),
        nAgree.as("n_agree"))
      .where(col("score") >= lower)
      .withColumn("verdict",
        when(col("score") >= upper, "match").otherwise("possible"))
  }

  /** EXACT set-similarity self-join via prefix filtering (PPJoin — Xiao,
    * Wang, Lin & Yu 2008; Chaudhuri, Ganti & Kaushik 2006): every pair of
    * documents whose shingle-set Jaccard reaches `threshold`, with recall
    * 1.0 BY CONSTRUCTION — the deterministic counterpart to the banded
    * [[ngramJaccardPairs]] (whose e-15 miss probability is statistical).
    *
    * The completeness argument: order every set by ONE global total order
    * (document frequency ascending, hash ascending — rarest first, the
    * order that makes prefixes selective). A pair with Jaccard ≥ t has
    * overlap ≥ ⌈t/(1+t)·(|a|+|b|)⌉; if neither side's prefix of length
    * |s| − ⌈t·|s|⌉ + 1 contained a shared token, the shared mass would
    * have to fit entirely in both suffixes, which are too short to hold
    * the required overlap — so every qualifying pair collides on ≥ 1
    * prefix token under ANY consistent total order. Three filters run
    * before any set is touched: prefix collision, length ratio
    * (t·|a| ≤ |b| ≤ |a|/t), and the PPJoin positional bound
    * (1 + min(|a|−pa−1, |b|−pb−1) ≥ ⌈t/(1+t)·(|a|+|b|)⌉ for the
    * collision positions pa, pb — a pair matching only near both TAILS
    * cannot reach the overlap floor). Survivors verify with exact integer
    * arithmetic: |∩| from the hashed sets, |∪| = |a| + |b| − |∩| (shingle
    * hashes are duplicate-free), keep 10⁶·|∩| ≥ thresholdPpm·|∪|.
    *
    * Scale shape: the prefix shuffle carries (hash, id, size, pos) longs
    * only — Σ prefix lengths ≈ (1−t)·Σ|sh| rows, a fifth of the banding
    * volume at t = 0.8. Prefix tokens are each document's RAREST, so
    * bucket sizes concentrate near 1; the `maxBucketSize` cap is a
    * guardrail against adversarial corpora (thousands of near-identical
    * tiny documents sharing one rare shingle), and is the ONE switch that
    * trades the exactness contract for boundedness — a capped-out key
    * drops its bucket's candidates, so set it to 0 (uncapped) when the
    * recall-1.0 contract matters more than worst-case skew. The ordered
    * prefix derives from one (hash → df) aggregation plus one per-doc
    * array_sort — both linear; sets ride to the verify join exactly as in
    * [[ngramJaccardPairs]] (narrow re-derivation, never through a band
    * explosion).
    *
    * Output: (id_a, id_b, inter, un, jaccard_ppm) with
    * jaccard_ppm = ⌊10⁶·|∩|/|∪|⌋ — all longs, engine-independent.
    */
  def prefixJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val tPpm = math.round(threshold * 1e6)
    // Sets read three times (prefix derivation + both verify sides) — the
    // ngramJaccardPairs persistence rationale applies verbatim.
    val sets = shingleHashSets(df, idCol, textCol, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tok = sets.select(col("id"), explode(col("sh")).as("h"))
    val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
    // Per-doc (df, hash)-sorted array; struct ordering is field order, so
    // array_sort IS the (df asc, hash asc) global order restricted to the
    // doc. Prefix length p = s − ⌈t·s⌉ + 1 in pure integer math (DIV —
    // Column `/` is IEEE double division).
    val prefix = tok.join(dfreq, "h")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
      .select(col("id"), size(col("ord")).cast("long").as("s"), col("ord"))
      .withColumn("__p",
        expr(s"CAST(s - (s * $tPpm + 999999) DIV 1000000 + 1 AS INT)"))
      .select(col("id"), col("s"),
        posexplode(slice(col("ord"), lit(1), col("__p"))))
      .select(col("id"), struct(col("s"), col("pos").cast("long").as("p"),
        col("col.h").as("h")).as("sp"), col("col.h").as("__k"))
    // Overlap floor o = ⌈t/(1+t)·(sa+sb)⌉; positional upper bound
    // 1 + min(sa−pa−1, sb−pb−1). Both in longs — sizes are doc-bounded,
    // tPpm·(sa+sb) tops out near 2e12, far inside int64.
    val oFloor = expr(s"($tPpm * (sp_a.s + sp_b.s) + ${1000000L + tPpm - 1L})" +
      s" DIV ${1000000L + tPpm}")
    val uBound = lit(1L) + least(col("sp_a.s") - col("sp_a.p") - 1L,
      col("sp_b.s") - col("sp_b.p") - 1L)
    val candidates = bucketPairs(
      prefix.select(col("id"), col("__k"), col("sp")), Seq("__k"), "sp",
      maxBucketSize)
      .where(lit(tPpm) * col("sp_a.s") <= lit(1000000L) * col("sp_b.s") &&
        lit(tPpm) * col("sp_b.s") <= lit(1000000L) * col("sp_a.s"))
      .where(uBound >= oFloor)
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("__ss"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("__ss") - col("inter")).as("un"))
      .where(col("inter") * lit(1000000L) >= lit(tPpm) * col("un"))
      .select(col("id_a"), col("id_b"), col("inter"), col("un"),
        expr("(inter * 1000000) DIV un").as("jaccard_ppm"))
  }

  /** EXACT containment join: pairs where |∩| / min(|a|, |b|) ≥ threshold
    * — the deterministic complement to the winnowing-blocked
    * [[containmentPairs]] (whose fingerprint sampling is a locality
    * heuristic), for the asymmetric quoted-document case symmetric
    * Jaccard under-scores by design.
    *
    * Prefix filter, containment form: overlap ≥ ⌈t·min⌉ forces the
    * SMALLER set's rarest-first prefix of length min − ⌈t·min⌉ + 1 to
    * intersect the larger set SOMEWHERE (not merely its prefix — so the
    * index side is the full token table, and candidate mass is
    * Σ_prefix-token df(token) instead of PPJoin's prefix×prefix).
    * The one exactness trade is `maxTokenDf`: blocking tokens with
    * global document frequency above it are excluded from the join
    * (BOTH sides) — a pair whose every shared prefix token is
    * corpus-common boilerplate can slip through, which is the
    * [[containmentPairs]] MOSS rationale made explicit; recall is 1.0
    * whenever any shared prefix token stays under the cap, and the cap
    * is what bounds the hot-token candidate blowup at corpus scale.
    *
    * Cap contract: `maxTokenDf > 0` is an absolute df cap;
    * `maxTokenDf = 0` is fully uncapped (recall 1.0) — the mode the
    * oracled `q_prefix_containment` entry runs, so the exactness
    * contract the oracle verifies is the uncapped one and a capped run
    * can never silently masquerade as exact; any negative value (the
    * DEFAULT, [[DfCapDerived]]) derives the cap from the corpus via
    * [[derivedTokenDfCap]] — a df BAND that scales with n_docs, so the
    * valve binds by default at ANY decade instead of going inert the
    * way an absolute default does (max shingle df grows ~linearly with
    * the corpus: 25 at sf0.1 → 1,608 at sf10, so a fixed 5000 could
    * not bind before ~sf30 — SCALING.md "the maxTokenDf valve,
    * measured").
    *
    * Output: (id_a, id_b, inter, n_small, containment_ppm) with
    * id_a < id_b and containment_ppm = ⌊10⁶·|∩|/min⌋.
    */
  def prefixContainmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      maxTokenDf: Int = DfCapDerived): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val tPpm = math.round(threshold * 1e6)
    val sets = shingleHashSets(df, idCol, textCol, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap =
      if (maxTokenDf < 0) derivedTokenDfCap(sets.count()) else maxTokenDf
    val candidates = prefixContainmentCandidates(sets, tPpm, cap)
    candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("inter"),
        least(size(col("sh_a")), size(col("sh_b"))).cast("long")
          .as("n_small"))
      .where(col("inter") * lit(1000000L) >= lit(tPpm) * col("n_small"))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_small"),
        expr("(inter * 1000000) DIV n_small").as("containment_ppm"))
  }

  /** Candidate stage of [[prefixContainmentPairs]] — shared verbatim with
    * [[prefixContainmentAudit]] so the audit measures the EXACT candidate
    * mass the join would move, never a reimplementation's approximation.
    * Blocking token universe: under the df cap. Prefixes are still
    * measured against the FULL set size (the containment bound needs the
    * true min), ordered by the (df asc, hash asc) total order.
    */
  private[ops] def prefixContainmentCandidates(
      sets: DataFrame,
      tPpm: Long,
      maxTokenDf: Int): DataFrame = {
    val tok = sets.select(col("id"), explode(col("sh")).as("h"))
    val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
    val prefix = tok.join(dfreq, "h")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
      .select(col("id"), size(col("ord")).cast("long").as("s"), col("ord"))
      .withColumn("__p",
        expr(s"CAST(s - (s * $tPpm + 999999) DIV 1000000 + 1 AS INT)"))
      .select(col("id").as("pid"), col("s").as("ps"),
        explode(slice(col("ord"), lit(1), col("__p"))).as("pe"))
      .where(if (maxTokenDf > 0) col("pe.df") <= maxTokenDf else lit(true))
      .select(col("pid"), col("ps"), col("pe.h").as("h"))
    val full = tok.join(
      if (maxTokenDf > 0) dfreq.where(col("df") <= maxTokenDf) else dfreq,
      "h")
      .join(sets.select(col("id"), size(col("sh")).cast("long").as("fs")),
        Seq("id"))
      .select(col("h"), col("id").as("fid"), col("fs"))
    prefix.join(full, Seq("h"))
      .where(col("pid") =!= col("fid") &&
        (col("ps") < col("fs") ||
          (col("ps") === col("fs") && col("pid") < col("fid"))))
      .select(least(col("pid"), col("fid")).as("id_a"),
        greatest(col("pid"), col("fid")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Cross-document duplication diagnostic (the RefinedWeb/FineWeb-style
    * dedup health signal): per document, the fraction of its DISTINCT
    * shingles that occur in ≥ `minDf` documents — the number curation
    * owners read per source/snapshot to decide whether dedup is keeping
    * up (a rising corpus-wide dup fraction means near-dup mass is
    * outgrowing the pipeline) and to flag individual documents that are
    * mostly recycled boilerplate even when no single pair crosses a
    * near-dup threshold.
    *
    * Scale shape: one shingle-df aggregation + one join back — the same
    * two linear exchanges as the dedup candidate stages, nothing
    * quadratic; shingle hashes only on the wire. Exact integer output:
    * dup_frac_ppm = ⌊10⁶·n_dup/n⌋, engine-replayable over shingle
    * STRINGS (the standing 64-bit-hash-collision convention).
    *
    * @return (idCol, n_grams, n_dup_grams, dup_frac_ppm)
    */
  def dupGramFraction(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      minDf: Long = 2L): DataFrame = {
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    val sets = shingleHashSets(df, idCol, textCol, shingleK)
    val tok = sets.select(col("id"), explode(col("sh")).as("h"))
    val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
    tok.join(dfreq, "h")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum((col("df") >= minDf).cast("long")).as("n_dup_grams"))
      .select(col("id").as(idCol), col("n_grams"), col("n_dup_grams"),
        expr("(n_dup_grams * 1000000) DIV n_grams").as("dup_frac_ppm"))
  }

  /** Pre-flight cap telemetry for [[prefixContainmentPairs]] — the "will
    * `maxTokenDf` bind on MY corpus, and what would it drop" question a
    * 100 TB operator must answer BEFORE paying for the join (the
    * recall-telemetry convention: degradation must be measurable through
    * the API, not discovered in a post-mortem). One row:
    *
    *  - `n_docs`, `n_tokens` — corpus size and distinct-shingle census;
    *  - `n_hot_tokens`, `hot_df_mass` — blocking tokens OVER the cap and
    *    their total document frequency: the boilerplate universe the cap
    *    excises (0 / 0 ⇒ the cap does not bind; the capped join IS the
    *    exact join);
    *  - `n_candidates` — the deduped candidate-pair count the verify join
    *    would process UNDER the cap, measured from the exact candidate
    *    stage the join itself runs (shared code, not a model).
    *
    * The first four columns are engine-independent (pure df census —
    * `q_containment_cap_audit` replays them in SQL); `n_candidates`
    * depends on the (df, hash) prefix order's hash tie-break and is for
    * scale telemetry (SCALING.md's candidate-mass evidence), not oracle
    * comparison.
    */
  def prefixContainmentAudit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      maxTokenDf: Int = DfCapDerived): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val tPpm = math.round(threshold * 1e6)
    val sets = shingleHashSets(df, idCol, textCol, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap =
      if (maxTokenDf < 0) derivedTokenDfCap(sets.count()) else maxTokenDf
    val tok = sets.select(col("id"), explode(col("sh")).as("h"))
    val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
    val hot = if (cap > 0) dfreq.where(col("df") > cap)
      else dfreq.limit(0)
    val docs1 = sets.agg(count(lit(1)).as("n_docs"))
    val tok1 = dfreq.agg(count(lit(1)).as("n_tokens"))
    val hot1 = hot.agg(count(lit(1)).as("n_hot_tokens"),
      coalesce(sum("df"), lit(0L)).as("hot_df_mass"))
    val cand1 = prefixContainmentCandidates(sets, tPpm, cap)
      .agg(count(lit(1)).as("n_candidates"))
    docs1.crossJoin(broadcast(tok1)).crossJoin(broadcast(hot1))
      .crossJoin(broadcast(cand1))
  }
}
