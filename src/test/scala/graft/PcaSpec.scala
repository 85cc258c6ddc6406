package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

class PcaSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("jacobiEigen: hand-solvable symmetric 2x2") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(vecs(0)(0)) - r) < 1e-12)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-12) // (1,1) direction
  }

  // 300 points in d=8 with variance planted on three axes (10, 5, 2) and
  // 0.01-scale noise elsewhere — the low-rank shape PCA must recover
  private def planted = {
    val rnd = new scala.util.Random(11)
    (0 until 300).map { i =>
      val x = Array.fill(8)(rnd.nextGaussian() * 0.01)
      x(1) += rnd.nextGaussian() * 10.0
      x(4) += rnd.nextGaussian() * 5.0
      x(6) += rnd.nextGaussian() * 2.0
      (i.toLong, x)
    }.toDF("id", "vec")
  }

  test("fit recovers planted low-rank structure: top-3 explain >= 99%, " +
      "components orthonormal, eigenvalue order descending") {
    val m = Pca.fit(planted, "vec", k = 3)
    assert(m.explained >= 0.99, s"explained ${m.explained}")
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.eigenvalues(1) > m.eigenvalues(2))
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = m.components(a).zip(m.components(b)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"components ${a}x${b} = $dot")
    }
    // each recovered component concentrates on its planted axis
    assert(m.components(0).zipWithIndex.maxBy(t => math.abs(t._1))._2 === 1)
    assert(m.components(1).zipWithIndex.maxBy(t => math.abs(t._1))._2 === 4)
    assert(m.components(2).zipWithIndex.maxBy(t => math.abs(t._1))._2 === 6)
    // canonical sign: the pivot coordinate is positive
    assert(m.components.forall(c => c(c.indices.maxBy(i =>
      (math.abs(c(i)), -i))) > 0))
  }

  test("project: centered (mean maps to the zero vector); whitening " +
      "scales each component to unit variance") {
    val d = planted
    val m = Pca.fit(d, "vec", k = 3)
    val meanRow = Seq((0L, m.mean)).toDF("id", "vec")
    val z = Pca.project(meanRow, "vec", m, "z").select("z")
      .as[Array[Double]].head()
    assert(z.forall(v => math.abs(v) < 1e-9), z.mkString(","))
    val zs = Pca.project(d, "vec", m, "z", whiten = true).select("z")
      .as[Array[Double]].collect()
    for (j <- 0 until 3) {
      val col = zs.map(_(j))
      val mu = col.sum / col.length
      val v = col.map(x => (x - mu) * (x - mu)).sum / col.length
      assert(math.abs(v - 1.0) < 0.05, s"whitened var($j) = $v")
    }
  }

  // the driver-cost guard: the O(d³) Jacobi budget fails LOUDLY at fit
  // time instead of hanging the driver on an over-wide embedding — and
  // the message routes the user to the reduce-first alternatives
  test("fit refuses vectors wider than maxDim with an actionable error") {
    val wide = Seq((1L, Array.fill(8)(1.0f)), (2L, Array.fill(8)(2.0f)))
      .toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Pca.fit(wide, "vec", k = 2, maxDim = 4)
    }
    assert(e.getMessage.contains("maxDim"))
    // at the budget boundary the fit still runs
    assert(Pca.fit(wide, "vec", k = 2, maxDim = 8).components.length === 2)
  }
}
