package graft.ops

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The restart contract behind every session-cached index in SparkEntry:
  * the expensive artifact (codebook / centroids / rotation / posting
  * lists) is parquet-backed, so a NEW session — here `spark.newSession()`
  * on a corpus re-read from disk, the closest a unit test gets to a
  * kill+restart — must load it and search IDENTICALLY, refitting nothing.
  * One test per index family: PQ, OPQ, IVF, IVF-PQ, trigram.
  */
class IndexPersistenceSpec extends SparkTestBase {
  import spark.implicits._

  // Corpus goes through DISK: both sessions read the same parquet, like a
  // restarted job would.
  private lazy val corpusPath: String = {
    val p = java.nio.file.Files.createTempDirectory("idx-corpus").toString
    (0 until 120).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(16)(d =>
        ((if (d % 4 == c) 3.0 else 0.2) + 0.01 * ((i * 7 + d) % 5)).toFloat))
    }.toDF("vec_id", "embedding").write.mode("overwrite").parquet(p)
    p
  }

  private def searchPq(s: org.apache.spark.sql.SparkSession,
      cb: ProductQuantizer.PqCodebook,
      codes: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val corpus = s.read.parquet(corpusPath)
    val q = corpus.where(col("vec_id") < 4)
    ProductQuantizer.pqTopK(codes, corpus, "vec_id", "embedding", q,
        "vec_id", "embedding", cb, k = 5, refine = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("PQ: a new session loads codebook+codes from disk and searches identically") {
    val corpus = spark.read.parquet(corpusPath)
    val cb = ProductQuantizer.train(corpus, "embedding", m = 4, ksub = 8)
    val codes = ProductQuantizer.encode(corpus, "vec_id", "embedding", cb)
    val dir = java.nio.file.Files.createTempDirectory("pq-idx").toString
    ProductQuantizer.savePq(dir, cb, codes)
    val a = searchPq(spark, cb, codes)

    val sB = spark.newSession()
    val (cbB, codesB) = ProductQuantizer.loadPq(sB, dir)
    assert(cbB.m === cb.m && cbB.ksub === cb.ksub && cbB.dsub === cb.dsub)
    assert(cbB.centroids.toSeq === cb.centroids.toSeq)
    assert(searchPq(sB, cbB, codesB) === a)
    assert(a.nonEmpty)
  }

  test("OPQ: a new session loads codebook+codes+rotation and searches identically") {
    val corpus = spark.read.parquet(corpusPath)
    val basis = Similarity.pcaFit(corpus, "embedding", 16)
    val mat = ProductQuantizer.opqMatrix(basis, m = 4)
    val rot = ProductQuantizer.rotateWith(corpus, "vec_id", "embedding", mat)
    val cb = ProductQuantizer.train(rot, "embedding", m = 4, ksub = 8)
    val codes = ProductQuantizer.encode(rot, "vec_id", "embedding", cb)
    val dir = java.nio.file.Files.createTempDirectory("opq-idx").toString
    ProductQuantizer.saveOpq(dir, cb, codes, mat)
    def search(s: org.apache.spark.sql.SparkSession,
        cbX: ProductQuantizer.PqCodebook,
        codesX: org.apache.spark.sql.DataFrame,
        matX: IndexedSeq[IndexedSeq[Double]]): Set[(Long, Long)] = {
      // Queries and the refine corpus re-rotate with the (loaded) matrix —
      // nothing is refit in session B.
      val rotX = ProductQuantizer.rotateWith(
        s.read.parquet(corpusPath), "vec_id", "embedding", matX)
      val qX = rotX.where(col("vec_id") < 4)
      ProductQuantizer.pqTopK(codesX, rotX, "vec_id", "embedding", qX,
          "vec_id", "embedding", cbX, k = 5, refine = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val a = search(spark, cb, codes, mat)

    val sB = spark.newSession()
    val (cbB, codesB, matB) = ProductQuantizer.loadOpq(sB, dir)
    assert(matB === mat)
    assert(cbB.centroids.toSeq === cb.centroids.toSeq)
    assert(search(sB, cbB, codesB, matB) === a)
    assert(a.nonEmpty)
  }

  test("IVF: a new session loads centroids+assignments and searches identically") {
    val corpus = spark.read.parquet(corpusPath)
    val idx = Similarity.buildIvfIndex(corpus, "vec_id", "embedding", nlist = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    idx.save(dir)
    def search(s: org.apache.spark.sql.SparkSession,
        i: Similarity.IvfIndex): Set[(Long, Long)] = {
      val q = s.read.parquet(corpusPath).where(col("vec_id") < 4)
      Similarity.ivfSearch(i, q, "vec_id", "embedding", k = 5, nprobe = 2)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val a = search(spark, idx)

    val sB = spark.newSession()
    val idxB = Similarity.loadIvfIndex(sB, dir)
    assert(idxB.centers.map(_.toSeq).toSeq === idx.centers.map(_.toSeq).toSeq)
    assert(search(sB, idxB) === a)
    assert(a.nonEmpty)
  }

  test("graph index: a new session loads edges+coarse nodes and searches identically") {
    val corpus = spark.read.parquet(corpusPath)
    val idx = Similarity.buildGraphIndex(corpus, "vec_id", "embedding",
      k = 6, coarseSize = 16)
    val dir = java.nio.file.Files.createTempDirectory("graph-idx").toString
    idx.save(dir)
    def search(s: org.apache.spark.sql.SparkSession,
        i: Similarity.GraphIndex): Set[(Long, Long)] = {
      val c = s.read.parquet(corpusPath)
      val q = c.where(col("vec_id") < 4)
      Similarity.graphSearchLayered(i.graph, i.coarse, c, "vec_id",
          "embedding", q, "vec_id", "embedding", k = 3, beamWidth = 8,
          hops = 2)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val a = search(spark, idx)
    val sB = spark.newSession()
    val idxB = Similarity.loadGraphIndex(sB, dir)
    assert(search(sB, idxB) === a)
    assert(a.nonEmpty)
    // The loaded coarse sample IS the deterministic ⌈√n⌉-rule sample.
    assert(idxB.coarse.select("id").collect().map(_.getLong(0)).toSet ===
      idx.coarse.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("IVF-PQ: a new session loads the full composite index and searches identically") {
    val corpus = spark.read.parquet(corpusPath)
    val idx = ProductQuantizer.buildIvfPq(corpus, "vec_id", "embedding",
      nlist = 4, m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-idx").toString
    idx.save(dir)
    def search(s: org.apache.spark.sql.SparkSession,
        i: ProductQuantizer.IvfPqIndex): Set[(Long, Long)] = {
      val c = s.read.parquet(corpusPath)
      val q = c.where(col("vec_id") < 4)
      ProductQuantizer.ivfPqTopK(i, c, "vec_id", "embedding", q,
          "vec_id", "embedding", k = 5, nprobe = 2, refine = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val a = search(spark, idx)

    val sB = spark.newSession()
    val idxB = ProductQuantizer.loadIvfPq(sB, dir)
    assert(search(sB, idxB) === a)
    assert(a.nonEmpty)
  }

  test("trigram: a new session reads the bucketed posting table and searches identically") {
    val docsPath = java.nio.file.Files.createTempDirectory("idx-docs").toString
    Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "pack my box with five dozen quick jugs"),
      (3L, "brown paper packages"),
      (4L, "entirely unrelated words here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(docsPath)
    val docs = spark.read.parquet(docsPath)
    val idx = TextSearch.buildTrigramIndex(docs, "doc_id", "text")
    // A previous JVM's run leaves the warehouse DIRECTORY behind while the
    // fresh in-memory catalog has no table entry — overwrite then refuses
    // the location. Clear both sides.
    spark.sql("DROP TABLE IF EXISTS idx_persist_trigram")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/idx_persist_trigram")
    warehouse.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(warehouse, true)
    TextSearch.writeTrigramIndex(idx, "idx_persist_trigram", buckets = 8)
    def search(s: org.apache.spark.sql.SparkSession,
        index: org.apache.spark.sql.DataFrame): Set[(Long, Int)] = {
      val d = s.read.parquet(docsPath)
      TextSearch.trigramSearch(index, d, "doc_id", "text", "quick")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    }
    val a = search(spark, idx)

    val sB = spark.newSession()
    val idxB = sB.table("idx_persist_trigram")
    assert(search(sB, idxB) === a)
    assert(a === Set((1L, 1), (2L, 1)))
  }
}
