package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // A → B, B → A, B → C; C is DANGLING (no out-edges)
  private def triangle =
    Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")

  test("pageRank: one hand-computed round, dangling mass redistributed, " +
      "ranks sum to 1") {
    // round 1 from uniform 1/3, d = 0.85, dangling mass = rank(C) = 1/3:
    //   base = 0.15/3 + 0.85·(1/9)           (dangling share 1/3 / 3)
    //   A: base + 0.85·(1/3 · 1/2)           (B → A at p = 1/2)
    //   B: base + 0.85·(1/3 · 1)             (A → B at p = 1)
    //   C: base + 0.85·(1/3 · 1/2)           (B → C at p = 1/2)
    val got = Graph.pageRank(triangle, "src", "dst", iterations = 1)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val base = 0.15 / 3 + 0.85 * (1.0 / 3 / 3)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    assert(close(got(0)._2, base + 0.85 * (1.0 / 3 / 2)))
    assert(close(got(1)._2, base + 0.85 * (1.0 / 3)))
    assert(close(got(2)._2, base + 0.85 * (1.0 / 3 / 2)))
    assert(close(got.map(_._2).sum, 1.0))
  }

  test("pageRank: probability mass is conserved across many rounds and " +
      "the hub outranks the spokes") {
    // star with back-edges: 1..4 → 5, 5 → 1 (so 5 is a hub, 2..4 get only
    // the teleport share)
    val star = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val r = Graph.pageRank(star, "src", "dst", iterations = 20)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r(5L) > r(1L) && r(1L) > r(2L))
    assert(math.abs(r(2L) - r(3L)) < 1e-12) // symmetric spokes tie
  }

  test("pageRank: parallel edges coalesce — duplicated edge rows equal an " +
      "explicit weight column") {
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val weighted = Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 1L, 1.0),
      (3L, 1L, 1.0)).toDF("src", "dst", "w")
    val a = Graph.pageRank(dup, "src", "dst", iterations = 7)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(weighted, "src", "dst", Some("w"), iterations = 7)
      .as[(Long, Double)].collect().toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("degrees: distinct-neighbor degrees vs summed multi-edge weights, " +
      "zero-filled for one-sided nodes") {
    val got = Graph.degrees(triangle.union(Seq((1L, 2L)).toDF("src", "dst")),
        "src", "dst")
      .orderBy("id").as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 1L, 2.0, 1.0),   // two 1→2 edges: out_deg 1, out_w 2
      (2L, 2L, 1L, 2.0, 2.0),
      (3L, 0L, 1L, 0.0, 1.0)))  // dangling: zero out side
  }

  test("pageRank: guardrails — empty edges, bad damping") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(triangle, "src", "dst", damping = 1.0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(triangle.where("src < 0"), "src", "dst")
    }
  }
}
