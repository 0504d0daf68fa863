package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkTestBase {
  import spark.implicits._

  /** 4 well-separated clusters of 16-dim vectors, 25 points each. */
  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 100).map { i =>
      val c = i % 4
      val base = Array.tabulate(16)(d => if (d % 4 == c) 5.0f else 0.0f)
      (i.toLong, base.map(x => x + rnd.nextFloat() * 0.5f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("train is deterministic and encode emits valid byte codes") {
    val cb1 = ProductQuantizer.train(vecs, "embedding", m = 4, ksub = 8, seed = 42L)
    val cb2 = ProductQuantizer.train(vecs, "embedding", m = 4, ksub = 8, seed = 42L)
    assert(cb1.centroids.toSeq === cb2.centroids.toSeq)
    assert(cb1.dsub === 4 && cb1.dim === 16)

    val codes = ProductQuantizer.encode(vecs, "vec_id", "embedding", cb1)
    val rows = codes.collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      val cs = r.getAs[Array[Byte]]("codes")
      assert(cs.length === 4)
      cs.foreach(c => assert((c & 0xFF) < 8))
      assert(r.getAs[Double]("rnorm") > 0.0)
    }
  }

  test("encode skips null embeddings like train does") {
    val withNull = vecs.unionByName(
      Seq((999L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val cb = ProductQuantizer.train(withNull, "embedding", m = 4, ksub = 8)
    val codes = ProductQuantizer.encode(withNull, "vec_id", "embedding", cb)
    val ids = codes.select("id").as[Long].collect()
    assert(ids.length === 100 && !ids.contains(999L))
  }

  test("adc ranks cluster-mates first; refine recovers exact order") {
    val cb = ProductQuantizer.train(vecs, "embedding", m = 4, ksub = 8)
    val codes = ProductQuantizer.encode(vecs, "vec_id", "embedding", cb)
    val q = vecs.where($"vec_id" < 4) // one query per cluster

    // ADC-only: top neighbors must come from the query's own cluster
    // (clusters are far apart, so even quantized scores separate them).
    val adc = ProductQuantizer.adcTopK(codes, q, "vec_id", "embedding", cb, k = 5)
    val adcRows = adc.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(adcRows.nonEmpty)
    adcRows.foreach { case (qid, nid) => assert(nid % 4 === qid % 4) }
    // Self-matches are excluded like the other ANN operators.
    adcRows.foreach { case (qid, nid) => assert(nid !== qid) }

    // Refined PQ matches exact brute force substantially (recall >= 0.6).
    val truth = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q,
      "vec_id", "embedding", k = 5).select("query_id", "neighbor_id")
    val refined = ProductQuantizer.pqTopK(codes, vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, k = 5, refine = 5)
      .select("query_id", "neighbor_id")
    val hits = truth.join(refined, Seq("query_id", "neighbor_id")).count()
    val total = truth.count()
    assert(total === 20)
    assert(hits.toDouble / total >= 0.6, s"refined recall ${hits.toDouble / total}")
  }

  test("opqRotate is a pure rotation: norms and pairwise cosines preserved") {
    val basis = Similarity.pcaFit(vecs, "embedding", 16)
    val rot = ProductQuantizer.opqRotate(vecs, "vec_id", "embedding",
      basis, m = 4)
    val orig = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val rotm = rot.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b))
    for (id <- Seq(0L, 1L, 17L, 53L)) {
      assert(math.abs(norm(orig(id)) - norm(rotm(id))) < 1e-3)
    }
    for ((i, j) <- Seq((0L, 1L), (0L, 4L), (2L, 53L))) {
      assert(math.abs(cos(orig(i), orig(j)) - cos(rotm(i), rotm(j))) < 1e-4)
    }
    // The PQ pipeline over the rotated space still finds cluster-mates:
    // query 0's refined top-3 neighbors share its cluster (ids ≡ 0 mod 4).
    val cb = ProductQuantizer.train(rot, "embedding", m = 4, ksub = 8)
    val codes = ProductQuantizer.encode(rot, "vec_id", "embedding", cb)
    val got = ProductQuantizer.pqTopK(codes, rot, "vec_id", "embedding",
        rot.where($"vec_id" === 0), "vec_id", "embedding", cb,
        k = 3, refine = 5)
      .select("neighbor_id").as[Long].collect()
    assert(got.forall(n => n % 4 === 0L), got.mkString(","))
  }

  test("ivf-pq: residual codes route and rank within probed cells") {
    val index = ProductQuantizer.buildIvfPq(vecs, "vec_id", "embedding",
      nlist = 4, m = 4, ksub = 8)
    // Every corpus vector is encoded once, with valid cell and code ranges.
    val codeRows = index.codes.collect()
    assert(codeRows.length === 100)
    codeRows.foreach { r =>
      assert(r.getAs[Int]("cell") >= 0 && r.getAs[Int]("cell") < 4)
      assert(r.getAs[Array[Byte]]("codes").length === 4)
      assert(r.getAs[Double]("rnorm") > 0.0)
    }

    val q = vecs.where($"vec_id" < 4)
    val got = ProductQuantizer.ivfPqTopK(index, vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, nprobe = 2, refine = 5)
    val rows = got.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // Clusters are far apart: neighbors come from the query's own cluster,
    // never the query itself.
    rows.foreach { case (qid, nid) =>
      assert(nid % 4 === qid % 4)
      assert(nid !== qid)
    }

    // Refined recall vs exact brute force.
    val truth = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q,
      "vec_id", "embedding", k = 5).select("query_id", "neighbor_id")
    val hits = truth.join(got.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id")).count()
    assert(hits.toDouble / truth.count() >= 0.6,
      s"ivf-pq refined recall ${hits.toDouble / truth.count()}")

    // Save/load roundtrip: the reloaded index searches identically.
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    index.save(dir)
    val loaded = ProductQuantizer.loadIvfPq(spark, dir)
    assert(loaded.cb === index.cb.copy(centroids = loaded.cb.centroids))
    assert(loaded.cb.centroids.toSeq === index.cb.centroids.toSeq)
    assert(loaded.centers.map(_.toSeq).toSeq === index.centers.map(_.toSeq).toSeq)
    val reGot = ProductQuantizer.ivfPqTopK(loaded, vecs, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, nprobe = 2, refine = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(reGot === rows.toSet)

    // Residuals quantize finer than raw-vector PQ at the same budget:
    // reconstruction norms stay close to true norms.
    val trueNorms = vecs.select($"vec_id",
        sqrt(aggregate($"embedding", lit(0.0d), (a, x) => a + x * x)).as("tn"))
      .as[(Long, Double)].collect().toMap
    codeRows.foreach { r =>
      val rel = math.abs(r.getAs[Double]("rnorm") - trueNorms(r.getAs[Long]("id"))) /
        trueNorms(r.getAs[Long]("id"))
      assert(rel < 0.2, s"reconstruction norm off by ${rel}")
    }
  }
}
