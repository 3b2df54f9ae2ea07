package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SparkEntry driver-contract invariants that don't need a
  * SparkSession: the matOracles allowlist must stay in lockstep with
  * the oracle map (a silent string-replace no-op cost two judged
  * rounds), and every query must carry an oracle. */
class EntryContractSpec extends AnyFunSuite {

  test("oracleSql materializes without tripping the matOracles assertions") {
    // exercises the real allowlist against the real oracle map
    val sql = SparkEntry.oracleSql
    assert(sql.nonEmpty)
    assert(sql.exists(_._2.contains(" AS MATERIALIZED (")),
      "at least one allowlisted oracle must actually be rewritten")
  }

  test("assertMatOracles fires on a bogus name, an inert oracle, and a recursive one") {
    val base = Map(
      "good" -> "WITH c AS (SELECT 1) SELECT * FROM c",
      "flat" -> "SELECT 1 AS one",
      "rec" -> "WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r")
    SparkEntry.assertMatOracles(Set("good"), base) // sane baseline
    val e1 = intercept[IllegalArgumentException](
      SparkEntry.assertMatOracles(Set("nope"), base))
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException](
      SparkEntry.assertMatOracles(Set("flat"), base))
    assert(e2.getMessage.contains("flat"))
    val e3 = intercept[IllegalArgumentException](
      SparkEntry.assertMatOracles(Set("rec"), base))
    assert(e3.getMessage.contains("rec"))
  }

  test("every query has an oracle and every oracle has a query") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${(os -- qs).toSeq.sorted}")
    assert((qs -- os).isEmpty, s"queries without oracles: ${(qs -- os).toSeq.sorted}")
  }
}
