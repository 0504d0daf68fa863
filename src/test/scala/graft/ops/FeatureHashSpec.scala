package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class FeatureHashSpec extends SparkTestBase {
  import spark.implicits._

  // Off-Spark replication of the slot/sign derivation.
  private def slot(tok: String, dim: Int): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val idx = java.lang.Long.parseLong(hex.substring(0, 13), 16) % dim
    val s = if (java.lang.Long.parseLong(hex.substring(13, 14), 16) % 2 == 0) 1L else -1L
    (idx, s)
  }

  test("counts match an independent md5 replication") {
    val docs = Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.featureHashCounts(docs, "doc_id", "text", dim = 16)
      .as[(Long, Long, Long)].collect()
      .map { case (id, idx, c) => (id, idx) -> c }.toMap
    val expect = Seq(
      1L -> Seq("alpha", "beta", "alpha", "gamma"),
      2L -> Seq("beta", "beta"))
      .flatMap { case (id, toks) =>
        toks.map(t => (id, slot(t, 16)))
      }
      .groupBy { case (id, (idx, _)) => (id, idx) }
      .view.mapValues(_.map(_._2._2).sum).toMap
      .filter(_._2 != 0L)
    assert(got === expect)
  }

  test("dense vectors: zero-fill, normalization, empty-doc zero vector") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, ""))
      .toDF("doc_id", "text")
    val m = TextAnalysis.featureHashVectors(docs, "doc_id", "text",
        dim = 8, normalize = true)
      .as[(Long, Seq[Double])].collect().toMap
    assert(m(1L).length === 8)
    assert(m(2L) === Seq.fill(8)(0.0))
    val n1 = math.sqrt(m(1L).map(x => x * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-12)
    // Unnormalized counts are integers.
    val raw = TextAnalysis.featureHashVectors(docs, "doc_id", "text",
        dim = 8, normalize = false)
      .as[(Long, Seq[Double])].collect().toMap
    assert(raw(1L).forall(x => x == math.rint(x)))
    val expect = Array.fill(8)(0.0)
    Seq("alpha", "beta", "gamma").foreach { t =>
      val (i, s) = slot(t, 8); expect(i.toInt) += s
    }
    assert(raw(1L) === expect.toSeq)
  }

  test("vectors feed the ANN family (knnGraph over hashed vectors)") {
    // Exact dup docs must be each other's top neighbor under cosine of
    // their hashed vectors.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark and shuffles"),
      (4L, "another unrelated document mentioning parquet files"))
      .toDF("doc_id", "text")
    val vecs = TextAnalysis.featureHashVectors(docs, "doc_id", "text", dim = 32)
      .select(col("doc_id"), transform(col("vec"), _.cast("float")).as("vec"))
    val g = Similarity.knnGraph(vecs, "doc_id", "vec", k = 1, refineRounds = 1)
      .select("id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(g(1L) === 2L)
    assert(g(2L) === 1L)
  }
}
