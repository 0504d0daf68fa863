package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (SQ8) vector quantization — the third compression point in the
  * vector family next to [[ProductQuantizer]] (PQ/IVF-PQ) and raw floats:
  * one byte per dimension via per-dimension linear buckets. 4× smaller than
  * float32 with near-lossless recall for most embedding distributions, and
  * unlike PQ it needs no codebook training — the "fit" is a min/max sweep.
  *
  * Scale shape: `fit` is ONE narrow pass (per-partition min/max fold via
  * mapPartitions, then a driver-side reduce of dim-sized arrays — no
  * shuffle, no per-element explode); `encode`/`decode` are narrow maps with
  * the dim-sized bounds broadcast. Nothing about the corpus size touches
  * the driver beyond the 2×dim bounds array.
  */
object ScalarQuantizer {

  /** Per-dimension (min, max) bounds. */
  final case class SqBounds(mins: Array[Double], maxs: Array[Double]) {
    def dim: Int = mins.length
  }

  /** One-pass per-dimension min/max. Null vectors are skipped; ragged
    * dimensions fail fast (a truncated fold would silently mis-quantize).
    */
  def fit(corpus: DataFrame, vecCol: String): SqBounds = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val partial = corpus.select(col(vecCol)).where(col(vecCol).isNotNull)
      .as[Seq[Float]]
      .mapPartitions { rows =>
        var mins: Array[Double] = null
        var maxs: Array[Double] = null
        rows.foreach { v =>
          if (mins == null) {
            mins = v.map(_.toDouble).toArray
            maxs = mins.clone()
          } else {
            require(v.length == mins.length,
              s"ragged vector: dim ${v.length} vs ${mins.length}")
            var i = 0
            while (i < mins.length) {
              val x = v(i).toDouble
              if (x < mins(i)) mins(i) = x
              if (x > maxs(i)) maxs(i) = x
              i += 1
            }
          }
        }
        if (mins == null) Iterator.empty
        else Iterator((mins, maxs))
      }
      .collect()
    require(partial.nonEmpty, "fit needs at least one non-null vector")
    // Cross-partition dim check: a ragged vector that opened its partition
    // never hits the in-partition require, and zip would truncate silently.
    val dims = partial.map(_._1.length).distinct
    require(dims.size == 1, s"ragged vectors across partitions: dims $dims")
    val mins = partial.map(_._1).reduce { (a, b) =>
      a.zip(b).map { case (x, y) => math.min(x, y) }
    }
    val maxs = partial.map(_._2).reduce { (a, b) =>
      a.zip(b).map { case (x, y) => math.max(x, y) }
    }
    SqBounds(mins, maxs)
  }

  /** Quantize one value: floor((x − min) / ((max − min) / 255)) clamped to
    * [0, 255]; constant dimensions code to 0. The formula is FIXED — any
    * independent engine evaluating these exact IEEE operations on the same
    * inputs produces the identical code (the cross-engine oracle relies on
    * this, so do not algebraically "simplify" the expression).
    */
  @inline private[ops] def code(x: Double, mn: Double, mx: Double): Int = {
    if (mx == mn) 0
    else {
      val c = math.floor((x - mn) / ((mx - mn) / 255.0))
      if (c < 0) 0 else if (c > 255) 255 else c.toInt
    }
  }

  /** Encode to (id, codes array<int>). Broadcast bounds, narrow map. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      bounds: SqBounds): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bounds)
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .where(col(vecCol).isNotNull)
      .as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val b = bc.value
        require(v.length == b.dim,
          s"vector for id=$id has dim ${v.length}, bounds have dim ${b.dim}")
        val out = new Array[Int](v.length)
        var i = 0
        while (i < v.length) {
          out(i) = code(v(i).toDouble, b.mins(i), b.maxs(i))
          i += 1
        }
        (id, out.toSeq)
      }
      .toDF(idCol, "codes")
  }

  /** Reconstruct approximate vectors: min + (code + 0.5) · scale (bucket
    * midpoint). Output (id, vec array<double>) — feed to any exact
    * operator (brute-force top-k, SemDeDup) for compressed-corpus search.
    */
  def decode(codes: DataFrame, idCol: String, bounds: SqBounds): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bounds)
    codes.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Seq[Int])]
      .map { case (id, cs) =>
        val b = bc.value
        val out = new Array[Double](cs.length)
        var i = 0
        while (i < cs.length) {
          val scale = if (b.maxs(i) == b.mins(i)) 0.0
            else (b.maxs(i) - b.mins(i)) / 255.0
          out(i) = b.mins(i) + (cs(i) + 0.5) * scale
          i += 1
        }
        (id, out.toSeq)
      }
      .toDF(idCol, "vec")
  }
}
