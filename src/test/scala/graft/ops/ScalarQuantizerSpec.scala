package graft.ops

import graft.SparkTestBase

class ScalarQuantizerSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, Seq(0f, 10f, 5f)),
    (2L, Seq(1f, 20f, 5f)),
    (3L, Seq(0.5f, 15f, 5f)))
    .toDF("vec_id", "embedding")

  test("fit finds per-dimension bounds in one pass") {
    val b = ScalarQuantizer.fit(corpus, "embedding")
    assert(b.mins.toSeq === Seq(0.0, 10.0, 5.0))
    assert(b.maxs.toSeq === Seq(1.0, 20.0, 5.0))
  }

  test("encode: endpoints, midpoints, constant dims") {
    val b = ScalarQuantizer.fit(corpus, "embedding")
    val m = ScalarQuantizer.encode(corpus, "vec_id", "embedding", b)
      .as[(Long, Seq[Int])].collect().toMap
    assert(m(1L) === Seq(0, 0, 0))      // mins → 0; constant dim → 0
    assert(m(2L) === Seq(255, 255, 0))  // maxes → 255
    assert(m(3L)(0) === 127)            // 0.5/1.0 × 255 → floor(127.5)
    assert(m(3L)(1) === 127)
  }

  test("decode reconstructs within half a bucket") {
    val b = ScalarQuantizer.fit(corpus, "embedding")
    val codes = ScalarQuantizer.encode(corpus, "vec_id", "embedding", b)
    val rec = ScalarQuantizer.decode(codes, "vec_id", b)
      .as[(Long, Seq[Double])].collect().toMap
    val orig = corpus.as[(Long, Seq[Float])].collect().toMap
    for ((id, v) <- orig; i <- v.indices) {
      val scale = (b.maxs(i) - b.mins(i)) / 255.0
      assert(math.abs(rec(id)(i) - v(i)) <= scale / 2 + 1e-12,
        s"id=$id dim=$i: ${rec(id)(i)} vs ${v(i)}")
    }
    // Constant dimension reconstructs exactly.
    assert(rec(1L)(2) === 5.0)
  }

  test("property: round-trip error bounded by half a bucket on random vectors") {
    val rng = new scala.util.Random(11)
    val docs = (0L until 300L)
      .map(i => (i, Seq.fill(12)(rng.nextFloat() * 20f - 10f)))
      .toDF("vec_id", "embedding")
    val b = ScalarQuantizer.fit(docs, "embedding")
    val rec = ScalarQuantizer.decode(
        ScalarQuantizer.encode(docs, "vec_id", "embedding", b), "vec_id", b)
      .as[(Long, Seq[Double])].collect().toMap
    val orig = docs.as[(Long, Seq[Float])].collect().toMap
    for ((id, v) <- orig; i <- v.indices) {
      val scale = (b.maxs(i) - b.mins(i)) / 255.0
      assert(math.abs(rec(id)(i) - v(i)) <= scale / 2 + 1e-9,
        s"id=$id dim=$i")
    }
  }

  test("ragged vectors fail fast instead of mis-quantizing") {
    val ragged = corpus.union(Seq((9L, Seq(1f, 2f))).toDF("vec_id", "embedding"))
    val e = intercept[Exception] { ScalarQuantizer.fit(ragged, "embedding") }
    assert(e.getMessage != null)
  }
}
