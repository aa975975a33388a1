package graft

/** The driver contract: entry() answers the flagship query with rows, and
  * every registered query has either an oracle or a documented reason not
  * to. */
class EntrySpec extends SparkSuite {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle coverage is near-total") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    // only the sketch-estimate query is allowed to skip the oracle
    assert(noOracle === Seq("q_kpi_order_approx"), noOracle.toString)
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet + "q_kpi_order_approx")
  }
}
