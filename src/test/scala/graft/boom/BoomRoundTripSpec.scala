package graft.boom

import java.nio.file.{Files, Paths}

import scala.io.Source
import scala.util.Using

import graft.SparkTestBase
import graft.engine.{Ingest, LogQuery, MatchAll}

import org.apache.spark.sql.functions._

/** Ingest → Boom write → Boom read round trips, validated against the
  * reference's golden logcat output (the fixture .bm was produced from the
  * same 18-line text file by the reference's own ingest).
  */
class BoomRoundTripSpec extends SparkTestBase {

  private val refBase = "/root/reference/testcases/logsearch"

  test("text → boom → logcat matches the reference logcat golden") {
    val out = Files.createTempDirectory("boom-roundtrip").toString
    Ingest.textToBoom(spark, s"$refBase/logsearch-test-file.txt", out)

    val formatted = LogQuery(paths = Seq(out)).where(MatchAll).formatted(spark).collect().toSeq
    val golden = Using.resource(
      Source.fromFile(s"$refBase/reference-files/logcat-reference.txt")("UTF-8"))(_.getLines().toSeq)
    assert(formatted === golden)
  }

  test("written boom files honor block invariants (one second, ≤1000 lines per block)") {
    import spark.implicits._
    // 2500 lines in the same second + 5 in the next → blocks of 1000/1000/500/5
    val lines = (1 to 2500).map(i => graft.core.LogLine(1000000L, s"m$i", 0, 0L, 0L, 0L)) ++
      (1 to 5).map(i => graft.core.LogLine(1001000L, s"n$i", 0, 0L, 0L, 0L))
    val out = Files.createTempDirectory("boom-inv").toString
    Ingest.write(lines.toDF().coalesce(1), out)

    // Read back raw blocks with the plain Avro reader and check invariants.
    val dir = new java.io.File(out)
    val bmFiles = dir.listFiles().filter(_.getName.endsWith(".bm"))
    assert(bmFiles.nonEmpty)
    val reader = new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]()
    var blocks = 0
    bmFiles.foreach { f =>
      val dfr = new org.apache.avro.file.DataFileReader(f, reader)
      while (dfr.hasNext) {
        val rec = dfr.next()
        val lines = rec.get("logLines").asInstanceOf[java.util.Collection[_]]
        assert(lines.size <= 1000)
        blocks += 1
      }
      dfr.close()
    }
    assert(blocks === 4)

    // And the full table reads back complete.
    val back = spark.read.format("boom").load(out)
    assert(back.count() === 2505)
    assert(back.where($"timestamp" === 1001000L).count() === 5)
  }

  test("reboom preserves block metadata") {
    import spark.implicits._
    val lines = Seq(
      graft.core.LogLine(5000L, "a", 0, 42L, 7L, 1L),
      graft.core.LogLine(5001L, "b", 0, 42L, 7L, 2L),
      graft.core.LogLine(6000L, "c", 3, 43L, 8L, 1L))
    val out = Files.createTempDirectory("boom-reboom").toString
    Ingest.reboom(lines.toDF().coalesce(1), out)
    val back = spark.read.format("boom").load(out)
      .orderBy("timestamp", "lineNumber")
      .as[graft.core.LogLine].collect().toSeq
    assert(back === lines)
  }

  test("pushdown: time range and contains filters prune correctly") {
    import spark.implicits._
    val out = Files.createTempDirectory("boom-push").toString
    val lines = (0 until 100).map { i =>
      graft.core.LogLine(i * 1000L, s"msg $i ${if (i % 10 == 0) "NEEDLE" else "hay"}", 0, 1L, i / 10L, i % 10 + 1L)
    }
    Ingest.reboom(lines.toDF().coalesce(1), out)

    val df = spark.read.format("boom").load(out)
      .where($"timestamp" >= 20000L && $"timestamp" < 70000L)
      .where($"message".contains("NEEDLE"))
    val got = df.select("timestamp").as[Long].collect().sorted
    assert(got === Array(20000L, 30000L, 40000L, 50000L, 60000L))

    // The pushed filters must appear in the physical plan's scan node.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("boom"))
  }

  test("column pruning: reading only timestamps skips message decode") {
    import spark.implicits._
    val out = Files.createTempDirectory("boom-prune").toString
    val lines = (0 until 50).map(i => graft.core.LogLine(i * 100L, s"m$i", 0, 1L, 0L, i + 1L))
    Ingest.reboom(lines.toDF().coalesce(1), out)
    val sum = spark.read.format("boom").load(out).agg(sum_distinct($"timestamp")).as[Long].head()
    assert(sum === (0 until 50).map(_ * 100L).sum)
  }
}
