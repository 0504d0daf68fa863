package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: bucketed tables for co-located joins and salting for
  * skewed aggregations — the two knobs the DataFrame API doesn't apply
  * automatically.
  */
object Scale {

  /** Per-row rendezvous weight for shard `s`: the first 48 bits of
    * md5(id + "#" + s + "-" + salt) — the kmv md5 convention, so any
    * engine replays the exact argmax.
    */
  private def hrwWeight(idCol: String, s: Int, salt: String): Column =
    conv(substring(md5(concat(col(idCol).cast("string"),
      lit(s"#$s-$salt")).cast("binary")), 1, 12), 16, 10).cast("long")

  private def hrwShardExpr(idCol: String, nShards: Int,
      salt: String): Column = {
    val arr = array((0 until nShards).map(hrwWeight(idCol, _, salt)): _*)
    // array_position returns the FIRST maximum — ties (vanishing at 48
    // bits) break to the lowest shard id, replayable as
    // ORDER BY weight DESC, shard.
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  /** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
    * 1998: shard(id) = argmax over s ∈ [0, nShards) of an id+shard hash.
    * THE property a 100 TB corpus layout wants from its doc → shard map:
    * growing n → n+1 reassigns ONLY the keys whose new shard wins the
    * argmax — expected moved fraction 1/(n+1) — where `hash(id) % n`
    * reassigns n/(n+1) of the corpus (a full rewrite on every re-scale).
    * One narrow codegen'd pass: the weight array is nShards md5 columns
    * per row, no shuffle, no state; a pure function of (id, n, salt), so
    * assignments are stable across runs, engines, and partitionings.
    *
    * For nShards beyond a few thousand the per-row expression fan-out
    * dominates — re-shard in two rendezvous tiers (shard groups, then
    * within-group) rather than widening the array; the require below is
    * that design boundary made explicit.
    *
    * @return (idCol, shard ∈ [0, nShards)).
    */
  def rendezvousShard(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "graft"): DataFrame = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards must be in [1, 4096], got $nShards — tier the hash for more")
    df.select(col(idCol),
      hrwShardExpr(idCol, nShards, salt).as("shard"))
  }

  /** Re-shard stability audit: both assignments in ONE pass plus the
    * moved bit — the number an operator reads before a shard-count
    * change (rendezvous ⇒ moved_ppm ≈ 10⁶·(1 − min/max); hash-mod would
    * read ≈ 10⁶·(1 − 1/max)). Output per id:
    * (idCol, shard_a, shard_b, moved).
    */
  def rendezvousMoveAudit(
      df: DataFrame,
      idCol: String,
      nFrom: Int,
      nTo: Int,
      salt: String = "graft"): DataFrame = {
    require(nFrom >= 1 && nFrom <= 4096 && nTo >= 1 && nTo <= 4096,
      s"shard counts must be in [1, 4096], got $nFrom, $nTo")
    df.select(col(idCol),
      hrwShardExpr(idCol, nFrom, salt).as("shard_a"),
      hrwShardExpr(idCol, nTo, salt).as("shard_b"))
      .withColumn("moved", (col("shard_a") =!= col("shard_b")).cast("int"))
  }

  /** Persist as a bucketed+sorted table: repeated equi-joins/aggregations on
    * `bucketCols` then read the table back and join WITHOUT a shuffle on
    * either side (Catalyst recognizes compatible bucketing and drops the
    * Exchange). The standard pre-partitioning for fact tables reused across
    * many queries — pay one shuffle at write, never again.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** Two-phase salted aggregation for skewed keys: aggregate by
    * (key, random-salt) first — spreading one hot key over `saltFactor`
    * reducers — then merge the partials by key. Only associative aggregates
    * compose this way; the common ones are provided.
    *
    * `sums`/`counts`/`mins`/`maxs` name input columns; outputs are
    * `sum_<col>` / `cnt` / `min_<col>` / `max_<col>`.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[String] = Nil,
      count: Boolean = true,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil,
      saltFactor: Int = 16): DataFrame = {
    require(sums.nonEmpty || count || mins.nonEmpty || maxs.nonEmpty, "no aggregates requested")

    val partialAggs: Seq[Column] =
      sums.map(c => sum(col(c)).as(s"sum_$c")) ++
        (if (count) Seq(org.apache.spark.sql.functions.count(lit(1)).as("cnt")) else Nil) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxs.map(c => max(col(c)).as(s"max_$c"))
    val mergeAggs: Seq[Column] =
      sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        (if (count) Seq(sum(col("cnt")).as("cnt")) else Nil) ++
        mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxs.map(c => max(col(s"max_$c")).as(s"max_$c"))

    df.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted equi-join for a skewed big side: replicate each small-side
    * row `saltFactor` times (one per salt value), give every big-side
    * row a uniform salt, and join on (keys + salt) — the one hot key's
    * rows spread over `saltFactor` reducers instead of one straggler
    * task. Result is row-identical to the plain join (each big row still
    * matches exactly its key's small rows, at exactly one salt).
    *
    * When to reach for it: AQE's skew-join handling already splits
    * oversized SORT-MERGE partitions at runtime, so most skew needs no
    * salting — this is for the cases AQE can't fix: a hot key whose rows
    * must ALSO co-group downstream (the join feeds a groupBy on the same
    * key, where AQE's split partitions re-collide), or a build side just
    * past the broadcast threshold. Costs: the small side materializes
    * `saltFactor`× (keep it small), and `big` may be scanned with an
    * extra projection. Only `inner` and `left_outer` (big side left)
    * survive replication with identical semantics — an unmatched
    * replicated small row would surface `saltFactor` times under
    * right/full joins, so those are rejected.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(saltFactor >= 2, s"saltFactor must be >= 2, got $saltFactor")
    require(Seq("inner", "left_outer").contains(joinType),
      s"only inner/left_outer keep replication-safe semantics: $joinType")
    val saltedBig = big.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Z-order (Morton) value of two non-negative integer keys: the low
    * `bits` bits of each interleave — `a`'s bit i lands at position 2i,
    * `b`'s at 2i+1. Sorting/range-partitioning by this single value keeps
    * rows close in BOTH dimensions close in the layout, so parquet
    * row-group min/max stats stay tight rectangles and predicates on
    * EITHER key skip files — the multi-dimensional clustering trick behind
    * Delta/Iceberg OPTIMIZE ZORDER, expressed as plain integer Column
    * algebra (one fold over literal powers of two; no UDF, codegen'd, and
    * replayable by any SQL engine). `bits` ≤ 31 keeps the z-value inside
    * int64.
    */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    // Constant-time Morton spread (the standard 5-step shift-mask
    // bit-twiddle): spread the low 32 bits of x into the even positions of
    // an int64. Equal, bit for bit, to the per-bit fold Σ bitᵢ(x)·4^i the
    // oracle replays — but a dozen static scalar ops per key instead of a
    // per-row sequence+aggregate lambda (measured 6x on the 600k-row
    // lineitem audit: the fold allocated a bits-length array per row).
    def spread(x: Column): Column = {
      val m = x.bitwiseAND(lit((1L << bits) - 1L))
      val s1 = m.bitwiseOR(shiftleft(m, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x3333333333333333L))
      s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a.cast("long")) + shiftleft(spread(b.cast("long")), 1)
  }

  /** Lay a DataFrame out in z-order: range-partition then sort by the
    * interleaved key. A parquet write of the result gives every file a
    * bounded rectangle in (a, b) space — the write-side half of
    * multi-dimensional file skipping.
    */
  /** Sorted-run write + ZONE-MAP manifest — the mini table-format layer
    * every lakehouse layout relies on: range-partition + sort the data on
    * the layout key, write parquet, then one metadata pass builds a
    * per-FILE (min_key, max_key, n_rows) manifest. The manifest is the
    * file-skipping index: a point/range scan consults it first and never
    * opens files whose key rectangle misses the predicate ([[zoneMapScan]]),
    * which at 100 TB is the difference between touching 3 files and
    * 30,000. Parquet footers carry row-group stats too — the EXPLICIT
    * manifest is what lets pruning happen without listing/opening any
    * data file (the Iceberg/Delta manifest role).
    */
  def writeWithManifest(
      df: DataFrame,
      path: String,
      sortCol: String,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
    // Eagerly materialized (localCheckpoint): the manifest is files-sized,
    // and a lazy plan here would re-scan the full parquet data on EVERY
    // evaluation — "one metadata pass" must mean exactly one.
    df.sparkSession.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(sortCol)).as("min_key"), max(col(sortCol)).as("max_key"),
        count(lit(1)).as("n_rows"))
      .localCheckpoint(true)
  }

  /** Manifest-pruned range scan: keep only files whose [min_key, max_key]
    * intersects [lo, hi], read just those, re-apply the predicate (zone
    * maps admit false positives, never false negatives). Returns the rows
    * plus (files_total, files_scanned) for the pruning audit. The
    * manifest is files-sized — bounded driver materialization.
    */
  def zoneMapScan(
      manifest: DataFrame,
      sortCol: String,
      lo: Long,
      hi: Long): (DataFrame, Long, Long) = {
    val spark = manifest.sparkSession
    val files = manifest
      .select(col("file"), col("min_key").cast("long"),
        col("max_key").cast("long"))
      .collect()
    require(files.nonEmpty,
      "zoneMapScan: empty manifest - write data with writeWithManifest first")
    // Null stats (a file whose rows all carry null sortCol) prune away:
    // null keys can't satisfy between(lo, hi), and getLong on the null
    // stat would NPE the whole scan.
    val keep = files.filter(r => !r.isNullAt(1) && !r.isNullAt(2) &&
        !(r.getLong(2) < lo || r.getLong(1) > hi))
      .map(_.getString(0))
    // All files pruned: read ONE file's footer for the schema, keep no rows
    // (the old all-files limit(0) opened every footer just to say "empty").
    val rows =
      if (keep.isEmpty) spark.read.parquet(files.head.getString(0)).limit(0)
      else spark.read.parquet(keep: _*)
    (rows.where(col(sortCol).between(lo, hi)),
      files.length.toLong, keep.length.toLong)
  }

  def zorderLayout(
      df: DataFrame,
      colA: String,
      colB: String,
      numPartitions: Int,
      bits: Int = 21): DataFrame = {
    val z = zValue(col(colA), col(colB), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Locality audit of the z-order layout: bucket rows by the top
    * `bucketBits` bits of the z-value (deterministic, engine-replayable —
    * unlike physical partition boundaries, which depend on range-sampler
    * internals) and report each bucket's row count and bounding rectangle.
    * On z-ordered data the rectangles are small and disjoint-ish; on a
    * single-key sort the non-sorted dimension spans its whole range —
    * the measurable difference file-skipping comes from.
    *
    * `bits` < 0 (default) auto-fits the z-space to the OCCUPIED key range:
    * the smallest k in [8, 30] with max(key) < 2^k, else 31 (zValue's
    * ceiling — keys above 2^31 truncate to their low 31 bits, which only
    * loosens bucket rectangles, never errors), by pure integer comparison
    * (a SQL engine replays the rule exactly; a float `ceil(log2(...))`
    * would be one libm ulp away from off-by-one at power-of-two
    * boundaries). A fixed oversized z-space leaves the top interleaved
    * bits all-zero and collapses every row into bucket 0. The max probe is
    * a one-row aggregate — bounded driver materialization.
    */
  /** Hilbert-curve layout: [[zorderLayout]] with the
    * [[graft.functions.HilbertIndex]] key instead of the Morton
    * interleave — same write-side mechanics, strictly tighter per-file
    * rectangles (the curve has no diagonal jumps).
    */
  def hilbertLayout(
      df: DataFrame,
      colA: String,
      colB: String,
      numPartitions: Int,
      bits: Int = 21): DataFrame = {
    val h = graft.functions.HilbertFunctions.hilbert_index(
      col(colA), col(colB), bits)
    df.withColumn("__h", h)
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }

  /** [[zorderStats]]' bucket-rectangle audit on the HILBERT key.
    * Comparing these rectangles against [[zorderStats]]' on the same data
    * measures the Hilbert locality advantage directly: same bucket count,
    * smaller bounding boxes. `bits` < 0 auto-fits to the occupied key
    * range with zorderStats' integer rule, capped at 21 (the oracle
    * unrolls one guarded CTE per bit level, so the ceiling must be
    * static; keys above 2^21 truncate to their low bits — rectangles
    * loosen, correctness holds, same caveat as zValue's 31-bit ceiling).
    */
  def hilbertStats(
      df: DataFrame,
      colA: String,
      colB: String,
      bits: Int = -1,
      bucketBits: Int = 6): DataFrame = {
    val keyed = df.select(col(colA).cast("long").as("a"),
      col(colB).cast("long").as("b"))
    val hBits =
      if (bits > 0) bits
      else {
        val mx = keyed.agg(max(greatest(col("a"), col("b")))).collect()
          .headOption.filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
        (8 to 20).find(k => mx < (1L << k)).getOrElse(21)
      }
    require(bucketBits >= 1 && bucketBits <= 2 * hBits,
      s"bucketBits must be in [1, ${2 * hBits}], got $bucketBits")
    keyed
      .withColumn("bucket",
        call_function("shiftright",
          graft.functions.HilbertFunctions.hilbert_index(
            col("a"), col("b"), hBits),
          lit(2 * hBits - bucketBits)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
  }

  def zorderStats(
      df: DataFrame,
      colA: String,
      colB: String,
      bits: Int = -1,
      bucketBits: Int = 8): DataFrame = {
    val keyed = df.select(col(colA).cast("long").as("a"),
      col(colB).cast("long").as("b"))
    val zBits =
      if (bits > 0) bits
      else {
        val mx = keyed.agg(max(greatest(col("a"), col("b")))).collect()
          .headOption.filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
        (8 to 30).find(k => mx < (1L << k)).getOrElse(31)
      }
    require(bucketBits >= 1 && bucketBits <= 2 * zBits,
      s"bucketBits must be in [1, ${2 * zBits}], got $bucketBits")
    keyed
      .withColumn("bucket",
        call_function("shiftright",
          zValue(col("a"), col("b"), zBits), lit(2 * zBits - bucketBits)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
  }
}
