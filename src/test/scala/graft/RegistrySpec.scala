package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry bookkeeping that must not drift (round-9 verdict: the
  * README's hand-kept query counts had gone stale): the README's
  * advertised counts are asserted against the live
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] maps, and the
  * two maps are asserted consistent with each other. No Spark
  * session needed — this is pure registry arithmetic. */
class RegistrySpec extends AnyFunSuite {

  test("every oracle names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries (no oracle) are the three documented ones") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly ==
      Set("q_dissolve", "q_approx_distinct", "q_approx_quantiles"),
      s"unexpected rows-only set: $rowsOnly — every new query needs an " +
        "oracle (or a hash-verified twin and a line here)")
  }

  test("README's advertised counts match the registry") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val pat = """(\d+) queries, (\d+) oracle-checked""".r
    val m = pat.findFirstMatchIn(readme)
      .getOrElse(fail("README.md no longer states 'N queries, M oracle-checked'"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.group(1)} queries, registry has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.group(2)} oracle-checked, registry has ${SparkEntry.oracleSql.size}")
  }
}
