package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke (t1): entry returns rows on sf0.001, and every
  * declared oracle key has a matching query.
  */
class EntrySpec extends AnyFunSuite with SparkFixture {

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; bench subset is a query subset") {
    val qs = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
    val orphanBench = SparkEntry.benchQueries.toSet.diff(qs)
    assert(orphanBench.isEmpty, s"bench names without queries: $orphanBench")
  }
}
