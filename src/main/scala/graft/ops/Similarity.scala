package graft.ops

import scala.util.Random

import graft.functions.TextFunctions.cosine_similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, as a training-data pipeline needs:
  *   - [[bruteForceTopK]] — exact cosine top-k. The query side is broadcast,
  *     so the corpus streams once, shuffle-free until the final per-query
  *     top-k (which aggregates partial top-ks map-side).
  *   - [[lshTopK]] / [[cosinePairsLsh]] — random-hyperplane LSH: signature →
  *     bucket join → exact re-rank within buckets. The scale path: corpus²
  *     never materializes, the only shuffle is on bucket keys.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column = cosine_similarity(a, b)

  /** Deterministic random hyperplanes (unit-free; sign only matters). */
  private[ops] def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Sign-bit bucket key of a vector against the shared hyperplanes. */
  private[ops] def bucketKey(vec: Column, planes: Array[Array[Float]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(vec, lit(p), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * queries). Output: (query_id, neighbor_id, cos, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10): DataFrame = {
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .join(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__cv"), col("__qv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Approximate top-k via hyperplane LSH with multi-probe (queries join only
    * their own bucket; `probes` > 1 additionally probes buckets at Hamming
    * distance 1 to recover near-boundary neighbors).
    */
  def lshTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      planes: Int = 12,
      probes: Int = 4,
      seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(corpusVec))).first().getInt(0)
    val hp = hyperplanes(dim, planes, seed)

    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      bucketKey(col(corpusVec), hp).as("bucket"))
    val qBase = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"),
      bucketKey(col(queryVec), hp).as("__b0"))
    // Multi-probe: own bucket + (probes-1) single-bit flips.
    val probeKeys = array((0 until math.min(probes, planes + 1)).map {
      case 0 => col("__b0")
      case i => col("__b0").bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val q = qBase.select(col("query_id"), col("__qv"),
      explode(probeKeys).as("bucket"))

    val scored = c.join(q, "bucket")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__cv"), col("__qv")).as("cos"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF-style ANN (the FAISS IVF-Flat construction on DataFrames): a coarse
    * k-means quantizer assigns every corpus vector to a centroid cell; each
    * query probes its `nprobe` nearest cells and exact-reranks only those.
    *
    * Scale shape: the quantizer fits on a SAMPLE (constant-size work), cell
    * assignment is one narrow pass, the centroid table stays driver-side
    * (nlist × dim floats), and the only shuffle is the query↔cell join —
    * corpus² never materializes. Versus [[lshTopK]]: data-adaptive cells give
    * better recall on clustered embeddings at the same probe budget.
    */
  def ivfTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4,
      trainFraction: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val vecCol = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      array_to_vector(col(corpusVec).cast("array<double>")).as("__features"))
    val train = (if (trainFraction < 1.0) vecCol.sample(trainFraction, seed) else vecCol)
      .select(col("__features").as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features").fit(train)

    val assigned = model.setPredictionCol("cell").setFeaturesCol("__features")
      .transform(vecCol)
      .select(col("neighbor_id"), col("__cv"), col("cell"))

    // Driver-side centroid table → per-query nprobe nearest cells.
    val centers = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val probeCells = udf { (v: Seq[Float]) =>
      centers.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < math.min(c.length, v.length)) {
          val t = c(j) - v(j); d += t * t; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    }
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .withColumn("cell", explode(probeCells(col("__qv"))))

    val scored = assigned.join(q, "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__cv"), col("__qv")).as("cos"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** All pairs with cosine ≥ threshold, LSH-blocked (for embedding dedup). */
  def cosinePairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 12,
      seed: Long = 42L): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val hp = hyperplanes(dim, planes, seed)
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      bucketKey(col(vecCol), hp).as("bucket"))
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
