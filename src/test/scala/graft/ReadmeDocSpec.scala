package graft

import org.scalatest.funsuite.AnyFunSuite

/** README totals sync gate (round-10 verdict task #5): REGISTRY.md is
  * byte-gated by RegistryDocSpec, but README's registry-totals sentence is
  * hand-written prose and drifted for two rounds straight before round 10.
  * This parses the one load-bearing number line ("N queries: M
  * DuckDB-oracle-checked + K rows-only by design") and asserts it against
  * the registry itself, so adding or re-oracling a query without updating
  * README fails CI the same way a stale REGISTRY.md does. */
class ReadmeDocSpec extends AnyFunSuite {

  test("README totals line matches the registry") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")), "UTF-8")
    val re =
      """\*\*(\d+) queries: (\d+) DuckDB-oracle-checked \+ (\d+) rows-only by design\*\*""".r
    val ms = re.findAllMatchIn(readme).toSeq
    assert(ms.size == 1,
      s"README must contain exactly one registry-totals line (found ${ms.size})")
    val m = ms.head
    val total = Registry.all.size
    val withOracle = Registry.all.count(_.oracle.nonEmpty)
    val rowsOnly = Registry.all.count(_.oracle.isEmpty)
    assert(m.group(1).toInt == total,
      s"README claims ${m.group(1)} queries, registry has $total")
    assert(m.group(2).toInt == withOracle,
      s"README claims ${m.group(2)} oracle-checked, registry has $withOracle")
    assert(m.group(3).toInt == rowsOnly,
      s"README claims ${m.group(3)} rows-only, registry has $rowsOnly")
  }
}
