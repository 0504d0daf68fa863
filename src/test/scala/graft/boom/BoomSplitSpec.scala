package graft.boom

import java.nio.file.Files

import graft.SparkTestBase
import graft.core.LogLine
import graft.engine.Ingest

import org.apache.spark.sql.functions._

/** Sync-boundary file splitting: one large .bm file must fan out across read
  * partitions with no lost or duplicated rows (every Avro block read by
  * exactly one slice).
  */
class BoomSplitSpec extends SparkTestBase {
  import spark.implicits._

  test("large file splits into multiple partitions, exactly-once rows") {
    val dir = Files.createTempDirectory("boom-split").toString
    // ~200k lines across many seconds -> several MB compressed, many sync blocks
    val n = 200000
    val lines = (0 until n).map { i =>
      LogLine(1700000000000L + i * 37L, s"message-$i ${"x" * 80}", 0, 1L, i / 500L, i % 500 + 1L)
    }
    Ingest.reboom(lines.toDF().coalesce(1), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".bm"))
    assert(files.length === 1)
    val fileLen = files.head.length()

    // Force small split targets so the single file must be sliced.
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (fileLen / 7).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = spark.read.format("boom").load(dir)
      val parts = df.rdd.getNumPartitions
      assert(parts > 3, s"expected >3 partitions, got $parts")

      assert(df.count() === n)
      // exactly-once: distinct timestamps == n (timestamps unique by construction)
      assert(df.select(countDistinct($"timestamp")).as[Long].head() === n)
      // content sanity at both ends
      val msgs = df.orderBy("timestamp").select("message")
      assert(msgs.head().getString(0).startsWith("message-0 "))
      // pushdown still correct across slices
      val mid = 1700000000000L + (n / 2) * 37L
      assert(df.where($"timestamp" === mid).count() === 1)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", old)
      spark.conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }
}
