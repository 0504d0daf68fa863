package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins COVERAGE.md's canonical headline count to the code: the round-12
  * retro found the doc's running totals drifting from the registered query
  * map (237 written vs 239 registered) because queries could land in
  * commits that never touched COVERAGE.md. The oracle-parity spec
  * (PlanInvariantsSpec) makes ORACLE drift impossible; this is its
  * documentation sibling — a new query now fails the build until the
  * headline line is updated in the same change.
  */
class CoverageHeadlineSpec extends AnyFunSuite {

  test("COVERAGE.md headline counts equal the registered query/oracle maps") {
    val text = new String(
      Files.readAllBytes(Paths.get("COVERAGE.md")), UTF_8)
    val re = """Registered queries: (\d+) \(oracled: (\d+)\)""".r
    val m = re.findFirstMatchIn(text).getOrElse(
      fail("COVERAGE.md canonical headline line is missing " +
        "(expected 'Registered queries: N (oracled: M)')"))
    assert(m.group(1).toInt === SparkEntry.queries.size,
      "COVERAGE.md headline query count != SparkEntry.queries.size — " +
        "update the headline in the commit that registers the query")
    assert(m.group(2).toInt === SparkEntry.oracleSql.size,
      "COVERAGE.md headline oracle count != SparkEntry.oracleSql.size")
  }
}
