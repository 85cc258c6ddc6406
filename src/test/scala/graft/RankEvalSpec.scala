package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RankEval

class RankEvalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val lg2 = (x: Double) => math.log(x) / math.log(2.0)

  test("metricsAtK: hand-computed binary fixture, incl. a zero-relevant " +
      "query") {
    // q1 returns a,b,c; judged relevant {b, d} — d never retrieved
    // q2 returns a,b; nothing judged relevant
    val ranked = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3),
      (2L, "a", 1), (2L, "b", 2)
    ).toDF("query_id", "doc", "rank")
    val rel = Seq((1L, "b", 1), (1L, "d", 1))
      .toDF("query_id", "doc", "gain")
    val m = RankEval.metricsAtK(ranked, "query_id", "doc", "rank",
        rel, "gain", k = 3)
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val (ndcg, mrr, prec, rec) = m(1L)
    assert(math.abs(ndcg - (1 / lg2(3)) / (1 / lg2(2) + 1 / lg2(3))) < 1e-12)
    assert(mrr === 0.5)
    assert(math.abs(prec - 1.0 / 3) < 1e-12)
    assert(rec === 0.5)
    assert(m(2L) === ((0.0, 0.0, 0.0, 0.0)))
  }

  test("graded gains: ideal ranking orders by gain, not retrieval order") {
    // retrieved low-gain doc first: dcg = 1/log2(2) + 3/log2(3);
    // ideal = 3/log2(2) + 1/log2(3)
    val ranked = Seq((1L, "low", 1), (1L, "high", 2))
      .toDF("query_id", "doc", "rank")
    val rel = Seq((1L, "high", 3), (1L, "low", 1))
      .toDF("query_id", "doc", "gain")
    val r = RankEval.metricsAtK(ranked, "query_id", "doc", "rank",
        rel, "gain", k = 2)
      .as[(Long, Double, Double, Double, Double)].head()
    val expected = (1 / lg2(2) + 3 / lg2(3)) / (3 / lg2(2) + 1 / lg2(3))
    assert(math.abs(r._2 - expected) < 1e-12)
    assert(r._3 === 1.0) // first retrieved doc is (low-)relevant
  }

  test("summaryAtK macro-averages per-query rows") {
    val ranked = Seq((1L, "a", 1), (2L, "a", 1)).toDF("query_id", "doc", "rank")
    val rel = Seq((1L, "a", 1)).toDF("query_id", "doc", "gain")
    val s = RankEval.summaryAtK(ranked, "query_id", "doc", "rank",
        rel, "gain", k = 1)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(s._1 === 2L)
    assert(s._2 === 0.5 && s._3 === 0.5 && s._4 === 0.5 && s._5 === 0.5)
  }
}
