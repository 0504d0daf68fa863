package graft.ops

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("cmsAuditedTopTokens: exact counts, sketch estimate honors the bound") {
    // 'alpha' ×30, 'beta' ×12, 'gamma' ×5, long tail of singletons.
    val docs = (
      Seq.fill(30)("alpha") ++ Seq.fill(12)("beta") ++ Seq.fill(5)("gamma") ++
        (1 to 40).map(i => s"tail$i")
    ).grouped(9).map(_.mkString(" ")).toSeq.toDF("text")
    val got = Sketches.cmsAuditedTopTokens(docs, "text", k = 3)
      .as[(String, Long, Int)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq(("alpha", 30L), ("beta", 12L), ("gamma", 5L)))
    assert(got.forall(_._3 == 1), got.mkString(", "))
  }

  test("cmsAuditedTopTokens is deterministic across runs (seeded sketch)") {
    val docs = (1 to 50).map(i => s"w${i % 7} w${i % 13} common").toDF("text")
    val a = Sketches.cmsAuditedTopTokens(docs, "text", k = 10)
      .as[(String, Long, Int)].collect().toSeq
    val b = Sketches.cmsAuditedTopTokens(docs, "text", k = 10)
      .as[(String, Long, Int)].collect().toSeq
    assert(a === b)
    assert(a.head._1 === "common" && a.head._2 === 50L)
  }
}
