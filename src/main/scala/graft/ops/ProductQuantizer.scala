package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization for embedding ANN at memory-bound scale (the FAISS
  * `PQx` pattern — Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", 2011): split each vector into `m` subvectors, k-means
  * each subspace to `ksub` centroids, store a vector as `m` byte codes.
  * At dim=64/m=8/ksub=16 a vector compresses 256 B → 8 B (+1 float for the
  * reconstructed norm), so a 100 TB float corpus becomes ~3 TB of codes —
  * the difference between spilling and searching in memory.
  *
  * Training is sample-bounded on the driver (the FAISS contract — quantizer
  * fit never scans the corpus): a per-partition bounded take, no counting
  * pass (same discipline as `Similarity.buildIvfIndex`). Encode is a narrow
  * mapPartitions; search is asymmetric distance computation (ADC) — per
  * query one m×ksub lookup table of partial dot products, scored against
  * codes with m table adds instead of dim multiplies, then the k-bounded
  * top-k aggregate. No shuffle ever carries a full vector.
  */
object ProductQuantizer {

  /** Flat codebook: centroid (j, c) occupies
    * `[(j*ksub + c) * dsub, ... + dsub)` of `centroids`.
    */
  case class PqCodebook(m: Int, ksub: Int, dsub: Int, centroids: Array[Float]) {
    def dim: Int = m * dsub
    def centroidOffset(j: Int, c: Int): Int = (j * ksub + c) * dsub
  }

  /** Fit the codebook on a bounded per-partition sample (deterministic for a
    * fixed seed and input layout). `ksub` ≤ 256 so codes fit one byte.
    */
  def train(
      corpus: DataFrame,
      vecCol: String,
      m: Int = 8,
      ksub: Int = 16,
      maxTrainRows: Int = 4096,
      iters: Int = 10,
      seed: Long = 42L): PqCodebook = {
    require(ksub >= 2 && ksub <= 256, "ksub must fit a byte")
    val feats = corpus.select(col(vecCol)).where(col(vecCol).isNotNull)
    val nPart = math.max(1, feats.rdd.getNumPartitions)
    val perPart = math.max(1, maxTrainRows / nPart)
    val sample: Array[Array[Float]] = feats.rdd
      .mapPartitions(_.take(perPart))
      .map(_.getSeq[Float](0).toArray)
      .collect()
    trainOnVectors(sample, m, ksub, iters, seed)
  }

  /** Driver-side codebook fit over an already-collected (bounded) sample —
    * the shared kernel of [[train]] (raw vectors) and
    * [[buildIvfPq]] (cell residuals).
    */
  def trainOnVectors(sample: Array[Array[Float]], m: Int, ksub: Int,
      iters: Int = 10, seed: Long = 42L): PqCodebook = {
    require(ksub >= 2 && ksub <= 256, "ksub must fit a byte")
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    val rnd = new scala.util.Random(seed)
    val centroids = new Array[Float](m * ksub * dsub)
    var j = 0
    while (j < m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val cs = lloyd(sub, math.min(ksub, sub.length), dsub, iters, rnd)
      var c = 0
      while (c < cs.length) {
        System.arraycopy(cs(c), 0, centroids, (j * ksub + c) * dsub, dsub)
        c += 1
      }
      // Fewer distinct points than ksub: remaining slots repeat the last
      // centroid (never the argmin winner, so codes stay valid).
      while (c < ksub) {
        System.arraycopy(cs(cs.length - 1), 0, centroids, (j * ksub + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    PqCodebook(m, ksub, dsub, centroids)
  }

  /** Driver-side Lloyd on the bounded sample: seeded shuffled init, ties and
    * empty clusters resolved deterministically (empty → keep previous).
    */
  private def lloyd(points: Array[Array[Float]], k: Int, dsub: Int, iters: Int,
      rnd: scala.util.Random): Array[Array[Float]] = {
    val init = rnd.shuffle(points.indices.toVector).take(k)
    val cents = init.map(i => points(i).clone).toArray
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < points.length) { assign(p) = nearest(points(p), cents); p += 1 }
      val sums = Array.fill(k)(new Array[Double](dsub))
      val counts = new Array[Int](k)
      p = 0
      while (p < points.length) {
        val a = assign(p); counts(a) += 1
        var d = 0
        while (d < dsub) { sums(a)(d) += points(p)(d); d += 1 }
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dsub) { cents(c)(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  private def nearest(p: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d2 = 0.0; var d = 0
      while (d < p.length) { val t = p(d) - cents(c)(d); d2 += t * t; d += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  private val codesSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("codes", BinaryType, nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))

  /** Encode the corpus: (id, codes: m bytes, rnorm: L2 norm of the
    * RECONSTRUCTED vector — the ADC cosine denominator). Narrow
    * mapPartitions; the codebook rides the closure (m·ksub·dsub floats).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebook): DataFrame = {
    val enc = RowEncoder.encoderFor(codesSchema)
    // Null vectors are skipped here exactly as `train` skips them — without
    // the filter a single null embedding row NPEs the encode job that the
    // training pass survived.
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .where(col(vecCol).isNotNull).mapPartitions { rows =>
      rows.map { r =>
        val v = r.getSeq[Float](1).toArray
        val codes = new Array[Byte](cb.m)
        var r2 = 0.0
        var j = 0
        while (j < cb.m) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cb.ksub) {
            val off = cb.centroidOffset(j, c)
            var d2 = 0.0; var d = 0
            while (d < cb.dsub) {
              val t = v(j * cb.dsub + d) - cb.centroids(off + d); d2 += t * t; d += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          codes(j) = best.toByte
          val off = cb.centroidOffset(j, best)
          var d = 0
          while (d < cb.dsub) {
            val x = cb.centroids(off + d); r2 += x * x; d += 1
          }
          j += 1
        }
        Row(r.getLong(0), codes, math.sqrt(r2))
      }
    }(enc)
  }

  /** ADC top-k: approximate cosine(query, corpus) from codes alone.
    * Queries are collected (bounded, same contract as `bruteForceTopK`'s
    * broadcast) and turned into per-query lookup tables on the driver; each
    * (query, code-row) score is m table adds. Output
    * (query_id, neighbor_id, cos, rank) like the other ANN operators.
    */
  def adcTopK(
      codes: DataFrame,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      cb: PqCodebook,
      k: Int = 10): DataFrame = {
    val spark = codes.sparkSession
    val qRows = queries.select(col(queryId).cast("long"), col(queryVec)).collect()
    val luts: Array[(Long, Array[Float], Double)] = qRows.map { r =>
      val q = r.getSeq[Float](1).toArray
      require(q.length == cb.dim, s"query dim ${q.length} != codebook dim ${cb.dim}")
      val lut = new Array[Float](cb.m * cb.ksub)
      var qn = 0.0
      var d = 0
      while (d < q.length) { qn += q(d).toDouble * q(d); d += 1 }
      var j = 0
      while (j < cb.m) {
        var c = 0
        while (c < cb.ksub) {
          val off = cb.centroidOffset(j, c)
          var dot = 0.0; var dd = 0
          while (dd < cb.dsub) { dot += q(j * cb.dsub + dd).toDouble * cb.centroids(off + dd); dd += 1 }
          lut(j * cb.ksub + c) = dot.toFloat
          c += 1
        }
        j += 1
      }
      (r.getLong(0), lut, math.sqrt(qn))
    }
    import spark.implicits._
    // The per-query LUT travels as an array<float> column on the broadcast
    // query side; scoring is the codegen'd pq_adc_score expression (one
    // table add per subspace), not a UDF — codes stay packed bytes.
    val qDf = luts.toIndexedSeq.map { case (qid, lut, qn) => (qid, lut.toSeq, qn) }
      .toDF("query_id", "__lut", "__qn")
    val denom = col("__qn") * col("rnorm")
    val scored = codes.crossJoin(broadcast(qDf))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        when(denom > 0,
          graft.functions.TextFunctions.pq_adc_score(
            col("codes"), col("__lut"), lit(0.0), cb.ksub) / denom)
          .otherwise(0.0).as("cos"))
    Similarity.topKPerQuery(scored, k, distinctIds = false)
  }

  // ------------------- IVF-PQ (the FAISS IndexIVFPQ shape) ------------------

  /** IVF-PQ index: coarse cells from [[Similarity.buildIvfIndex]] plus PQ
    * codes over CELL RESIDUALS (v − center(cell)) — residual magnitudes are
    * much smaller than raw coordinates, so the same `m`×`ksub` budget buys
    * far finer quantization (the reason FAISS encodes residuals). `codes`
    * carries (id, cell, codes, rnorm) where rnorm is the L2 norm of the full
    * reconstruction center + codeword — the ADC cosine denominator.
    *
    * At 100 TB this is the memory-resident ANN architecture: 8-byte codes
    * instead of 256-byte vectors (32×), and a query touches only its
    * `nprobe` cells' codes. Persist `codes` partitioned by cell (as
    * [[Similarity.IvfIndex.save]] does) to turn the cell filter into
    * partition pruning at scan time.
    */
  final case class IvfPqIndex(
      cb: PqCodebook,
      centers: Array[Array[Float]],
      codes: DataFrame) {

    /** Persist the index: codes partitioned by cell (a query's nprobe cells
      * prune to those directories at scan time — the same layout contract
      * as [[Similarity.IvfIndex.save]]), coarse centers and PQ codebook as
      * tiny side tables. Reload with [[loadIvfPq]].
      */
    def save(path: String): Unit = {
      codes.write.mode("overwrite").partitionBy("cell").parquet(path)
      val spark = codes.sparkSession
      import spark.implicits._
      centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "center")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
      writeCodebook(spark, cb, path)
    }
  }

  /** Reload an [[IvfPqIndex.save]]d index. The codes scan stays lazy (and
    * cell-partition-prunable); only the two tiny side tables are collected.
    */
  def loadIvfPq(spark: org.apache.spark.sql.SparkSession, path: String): IvfPqIndex = {
    val centers = spark.read.parquet(s"$path/_centroids")
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Float](1).toArray)
    IvfPqIndex(readCodebook(spark, path), centers, spark.read.parquet(path))
  }

  private def writeCodebook(spark: org.apache.spark.sql.SparkSession,
      cb: PqCodebook, path: String): Unit = {
    import spark.implicits._
    Seq((cb.m, cb.ksub, cb.dsub, cb.centroids.toSeq))
      .toDF("m", "ksub", "dsub", "centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_codebook")
  }

  private def readCodebook(spark: org.apache.spark.sql.SparkSession,
      path: String): PqCodebook = {
    val r = spark.read.parquet(s"$path/_codebook").collect().head
    PqCodebook(r.getInt(0), r.getInt(1), r.getInt(2), r.getSeq[Float](3).toArray)
  }

  /** Persist a plain-PQ index (codes + `_codebook` side table — the same
    * underscore-dir layout as [[IvfPqIndex.save]], which Spark's file
    * index skips when scanning the codes). The restart contract a 100 TB
    * pipeline needs: build once, then any later session [[loadPq]]s and
    * searches without re-training.
    */
  def savePq(path: String, cb: PqCodebook, codes: DataFrame): Unit = {
    codes.write.mode("overwrite").parquet(path)
    writeCodebook(codes.sparkSession, cb, path)
  }

  /** Reload a [[savePq]]d index; the codes scan stays lazy. */
  def loadPq(spark: org.apache.spark.sql.SparkSession,
      path: String): (PqCodebook, DataFrame) =
    (readCodebook(spark, path), spark.read.parquet(path))

  /** Persist an OPQ index: codes over the ROTATED space, `_codebook`, and
    * the `_rotation` matrix — the piece plain PQ doesn't need. A later
    * session re-rotates queries (and the refine corpus) with the LOADED
    * matrix via [[rotateWith]]; nothing is refit.
    */
  def saveOpq(path: String, cb: PqCodebook, codes: DataFrame,
      rotation: IndexedSeq[IndexedSeq[Double]]): Unit = {
    codes.write.mode("overwrite").parquet(path)
    val spark = codes.sparkSession
    writeCodebook(spark, cb, path)
    import spark.implicits._
    rotation.zipWithIndex.map { case (r, i) => (i, r) }.toDF("row", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_rotation")
  }

  /** Reload a [[saveOpq]]d index → (codebook, lazy codes, rotation). */
  def loadOpq(spark: org.apache.spark.sql.SparkSession, path: String)
      : (PqCodebook, DataFrame, IndexedSeq[IndexedSeq[Double]]) = {
    val rot = spark.read.parquet(s"$path/_rotation").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    (readCodebook(spark, path), spark.read.parquet(path), rot)
  }

  /** Build the IVF-PQ index: coarse k-means (sample-bounded, no counting
    * pass), residual codebook fit on a bounded driver-side sample, then one
    * narrow encode pass over the assigned corpus.
    */
  def buildIvfPq(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      nlist: Int = 8,
      m: Int = 8,
      ksub: Int = 16,
      maxTrainRows: Int = 4096,
      iters: Int = 10,
      seed: Long = 42L): IvfPqIndex = {
    val ivf = Similarity.buildIvfIndex(corpus, corpusId, corpusVec, nlist, seed = seed)
    val centers = ivf.centers
    val assigned = ivf.assigned // (neighbor_id, __cv, cell)
    val nPart = math.max(1, assigned.rdd.getNumPartitions)
    val perPart = math.max(1, maxTrainRows / nPart)
    val sample: Array[Array[Float]] = assigned.select(col("cell"), col("__cv")).rdd
      .mapPartitions(_.take(perPart))
      .map { r =>
        val c = centers(r.getInt(0))
        val v = r.getSeq[Float](1).toArray
        val out = new Array[Float](v.length)
        var i = 0
        while (i < v.length) { out(i) = v(i) - c(i); i += 1 }
        out
      }.collect()
    val cb = trainOnVectors(sample, m, ksub, iters, seed)
    IvfPqIndex(cb, centers, encodeResiduals(assigned, centers, cb))
  }

  private val ivfCodesSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", BinaryType, nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))

  /** Residual-encode the assigned corpus: per row, quantize v − center(cell)
    * and record the norm of the FULL reconstruction (center + codeword).
    * Narrow mapPartitions; centers + codebook ride the closure.
    */
  private def encodeResiduals(assigned: DataFrame, centers: Array[Array[Float]],
      cb: PqCodebook): DataFrame = {
    val enc = RowEncoder.encoderFor(ivfCodesSchema)
    assigned.select(col("neighbor_id").cast("long"), col("cell"), col("__cv"))
      .where(col("__cv").isNotNull)
      .mapPartitions { rows =>
        rows.map { r =>
          val cell = r.getInt(1)
          val c = centers(cell)
          val v = r.getSeq[Float](2).toArray
          val codes = new Array[Byte](cb.m)
          var r2 = 0.0
          var j = 0
          while (j < cb.m) {
            var best = 0; var bestD = Double.MaxValue
            var cc = 0
            while (cc < cb.ksub) {
              val off = cb.centroidOffset(j, cc)
              var d2 = 0.0; var d = 0
              while (d < cb.dsub) {
                val idx = j * cb.dsub + d
                val t = (v(idx) - c(idx)) - cb.centroids(off + d)
                d2 += t * t; d += 1
              }
              if (d2 < bestD) { bestD = d2; best = cc }
              cc += 1
            }
            codes(j) = best.toByte
            val off = cb.centroidOffset(j, best)
            var d = 0
            while (d < cb.dsub) {
              val idx = j * cb.dsub + d
              val x = c(idx) + cb.centroids(off + d)
              r2 += x * x; d += 1
            }
            j += 1
          }
          Row(r.getLong(0), cell, codes, math.sqrt(r2))
        }
      }(enc)
  }

  /** IVF-PQ search: each query probes its `nprobe` nearest cells; within
    * them, ADC over residual codes — per (query, cell) one lookup table of
    * residual-codeword dot products plus the scalar query·center term, so a
    * candidate costs m table adds. The (query, cell, table) routing set is
    * tiny and broadcast; corpus codes never shuffle. An exact re-rank of the
    * `k·refine` shortlist against the original vectors restores true order
    * (same rationale as [[pqTopK]]).
    */
  def ivfPqTopK(
      index: IvfPqIndex,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      nprobe: Int = 4,
      refine: Int = 8): DataFrame = {
    val spark = index.codes.sparkSession
    val cb = index.cb
    val centers = index.centers
    val qRows = queries.select(col(queryId).cast("long"), col(queryVec)).collect()
    val luts = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val dotQC = scala.collection.mutable.ArrayBuffer.empty[Double]
    val qNorm = scala.collection.mutable.ArrayBuffer.empty[Double]
    val routing = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    qRows.foreach { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Float](1).toArray
      require(q.length == cb.dim, s"query dim ${q.length} != codebook dim ${cb.dim}")
      var qn = 0.0
      var d = 0
      while (d < q.length) { qn += q(d).toDouble * q(d); d += 1 }
      val cells = centers.indices.map { ci =>
        val c = centers(ci)
        var l2 = 0.0; var i = 0
        while (i < c.length) { val t = c(i) - q(i); l2 += t * t; i += 1 }
        (l2, ci)
      }.sortBy(_._1).take(nprobe).map(_._2)
      cells.foreach { cell =>
        val c = centers(cell)
        var qc = 0.0
        var i = 0
        while (i < c.length) { qc += q(i).toDouble * c(i); i += 1 }
        val lut = new Array[Float](cb.m * cb.ksub)
        var j = 0
        while (j < cb.m) {
          var cc = 0
          while (cc < cb.ksub) {
            val off = cb.centroidOffset(j, cc)
            var dot = 0.0; var dd = 0
            while (dd < cb.dsub) {
              dot += q(j * cb.dsub + dd).toDouble * cb.centroids(off + dd); dd += 1
            }
            lut(j * cb.ksub + cc) = dot.toFloat
            cc += 1
          }
          j += 1
        }
        routing += ((qid, cell, luts.length))
        luts += lut
        dotQC += qc
        qNorm += math.sqrt(qn)
      }
    }
    import spark.implicits._
    // (query, probed-cell) routing rows carry their residual LUT, the
    // query·center base term, and the query norm as broadcast columns;
    // scoring is the codegen'd pq_adc_score expression, not a UDF.
    val qCells = routing.toIndexedSeq.map { case (qid, cell, li) =>
      (qid, cell, luts(li).toSeq, dotQC(li), qNorm(li))
    }.toDF("query_id", "cell", "__lut", "__qc", "__qn")
    val denom = col("__qn") * col("rnorm")
    val scored = index.codes.join(broadcast(qCells), "cell")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        when(denom > 0,
          graft.functions.TextFunctions.pq_adc_score(
            col("codes"), col("__lut"), col("__qc"), cb.ksub) / denom)
          .otherwise(0.0).as("cos"))
    val shortlist = Similarity.topKPerQuery(scored, k * refine, distinctIds = true)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = shortlist
      .join(corpus.select(col(corpusId).cast("long").as("neighbor_id"),
        col(corpusVec).as("__cv")), "neighbor_id")
      .join(broadcast(queries.select(col(queryId).cast("long").as("query_id"),
        col(queryVec).as("__qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__cv"), col("__qv")).as("cos"))
    Similarity.topKPerQuery(rescored, k, distinctIds = false)
  }

  /** The full FAISS-style PQ pipeline: ADC shortlist of `k·refine`
    * candidates from codes alone, then EXACT cosine re-rank of the
    * shortlist against the original vectors. Quantization collapses tight
    * neighborhoods to identical codes (ADC alone ranks them arbitrarily);
    * the refine pass restores exact order while touching only
    * |queries|·k·refine full vectors — the corpus itself is still scanned
    * as codes. Measured at sf0.01 (dim 64, m=8, ksub=16, refine=10):
    * ADC-only recall ≈ 0.12, refined ≈ 0.72 vs exact top-5.
    */
  /** OPQ rotation (Ge, He, Ke & Sun, CVPR 2013 — the parametric
    * "eigenvalue allocation" initialization): rotate every vector by the
    * deterministic PCA eigenbasis ([[Similarity.pcaFit]]'s Jacobi, used
    * WITHOUT centering — a pure rotation, so inner products, L2, and
    * cosine are all preserved and the exact ground truth is unchanged),
    * dealing the variance-ranked components round-robin across the m
    * subquantizer groups: output slot `g·dsub + t` carries component rank
    * `t·m + g`, so every group holds one component from each variance
    * tier. Plain PQ splits the RAW axes into m blocks — correlated,
    * variance-lopsided subspaces quantize badly; balancing the spectrum
    * across groups is where OPQ's recall gain comes from (the full OPQ
    * alternates R and codebook updates; the parametric init captures most
    * of the gain deterministically).
    *
    * Scale shape: the rotation matrix is ONE dim×dim literal
    * (plan-constant, a few KB) and each output component one
    * `zip_with`+`aggregate` fold inside a `transform` loop over it — the
    * compact-codegen form ([[Similarity]]'s probeCellsCol lesson: a
    * per-component unrolled expression tree would blow past JIT method
    * limits at dim = 64). Narrow, shuffle-free; output replaces `vecCol`
    * with the rotated float array, so the whole PQ pipeline
    * (train/encode/ADC/refine) runs unchanged on the rotated space.
    */
  def opqRotate(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      basis: Similarity.PcaBasis,
      m: Int): DataFrame =
    rotateWith(df, idCol, vecCol, opqMatrix(basis, m))

  /** The OPQ rotation MATRIX itself (row j = the PCA component assigned to
    * output position j under the eigenvalue-balancing permutation) — the
    * persistable half of the rotation: [[saveOpq]] writes it next to the
    * codebook so a later session can rotate queries identically without
    * refitting PCA.
    */
  def opqMatrix(
      basis: Similarity.PcaBasis, m: Int): IndexedSeq[IndexedSeq[Double]] = {
    val dim = basis.components.length
    require(dim >= 1 && basis.components.forall(_.length == dim),
      "opqRotate needs a FULL square basis (pcaFit with k = dim)")
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    (0 until dim).map { j =>
      basis.components((j % dsub) * m + (j / dsub)).toIndexedSeq
    }
  }

  /** Apply a rotation matrix (one plan-constant literal) to a vector
    * column — [[opqRotate]]'s apply half, reused when the matrix comes
    * from [[loadOpq]] instead of a fresh PCA fit.
    */
  def rotateWith(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      rows: IndexedSeq[IndexedSeq[Double]]): DataFrame = {
    val matLit = typedLit(rows)
    val rotated = transform(matLit, row =>
      aggregate(zip_with(col(vecCol), row, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, t) => acc + t))
      .cast("array<float>")
    df.select(col(idCol), rotated.as(vecCol))
  }

  def pqTopK(
      codes: DataFrame,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      cb: PqCodebook,
      k: Int = 10,
      refine: Int = 10): DataFrame = {
    val shortlist = adcTopK(codes, queries, queryId, queryVec, cb, k * refine)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = shortlist
      .join(corpus.select(col(corpusId).cast("long").as("neighbor_id"),
        col(corpusVec).as("__cv")), "neighbor_id")
      .join(broadcast(queries.select(col(queryId).cast("long").as("query_id"),
        col(queryVec).as("__qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__cv"), col("__qv")).as("cos"))
    Similarity.topKPerQuery(rescored, k, distinctIds = false)
  }
}
