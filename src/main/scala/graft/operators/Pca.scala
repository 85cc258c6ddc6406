package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Principal-component analysis over an embedding column — the
  * DATA-DEPENDENT companion to [[Similarity.randomProject]]: where JL
  * spends distortion uniformly (oblivious to the data), PCA puts the
  * kept dimensions where the corpus actually varies — the right trade
  * when similarity lives in the high-variance subspace (typical of real
  * embedding corpora), and measurably the WRONG one when neighbors hide
  * in low-variance directions (`ann_pca_recall`'s fixture is exactly
  * that adversary and prices the oversample cost it induces). With
  * `whiten = true` it also equalizes component scales (the
  * preprocessing step OPQ/IVF-style quantizers assume).
  *
  * Spark shape, the MLlib RowMatrix convention re-derived: the d×d
  * covariance is ONE `treeAggregate` over the vectors — per-partition
  * accumulation of the mean vector and upper-triangular second-moment
  * sums (d·(d+3)/2 doubles of state, d=64 ⇒ ~2 KB), merged
  * tree-fashion; corpus size never touches the driver. The
  * eigendecomposition runs on the driver over that d×d matrix (cyclic
  * Jacobi sweeps — Golub & Van Loan §8.5; d is embedding width, so this
  * is microseconds), exactly like IVF centroids and PQ codebooks: model
  * state is bounded metadata, not data.
  *
  * Projection is pure codegen: component j of the output is
  * `⟨x, w_j⟩ − ⟨μ, w_j⟩`, i.e. one native [[graft.functions.VectorDot]]
  * per kept dimension with the mean folded into a precomputed scalar —
  * no per-row mean subtraction, no interpreted HOF (the JL path's one
  * weakness), so a 100 TB transform pass stays inside whole-stage
  * codegen end to end.
  *
  * Determinism: Jacobi is deterministic given the covariance; the
  * covariance itself is a float sum whose grouping follows the partition
  * tree, so last-ulp wobble across cluster layouts is possible — PCA
  * results are priced by recall/variance twins (the approximate-family
  * convention), never value oracles. Component SIGN is canonicalized
  * (largest-|coordinate| entry made positive) so reruns agree on
  * orientation.
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (k rows of d, orthonormal,
    * eigenvalue-descending), `varianceRatio` (k, each component's share
    * of total variance), `eigenvalues` (k).
    */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                      varianceRatio: Array[Double],
                      eigenvalues: Array[Double]) extends Serializable {
    def explained: Double = varianceRatio.sum
  }

  /** Fit a k-component model on `vecCol` (array<float|double>, fixed
    * width d). One distributed pass; driver work is O(d³) on the d×d
    * covariance.
    *
    * `maxDim` is the guard on that driver cost: the treeAggregate state
    * is d(d+3)/2 doubles (~64 MB at d = 4096) and the Jacobi sweep is
    * O(d³) single-threaded (minutes at d ≈ 4k, hours past 10k) — the
    * bounded-driver-state story holds only while d stays in budget, so
    * exceeding it fails LOUDLY at fit time instead of hanging the driver.
    * For wider embeddings, reduce first: [[Similarity.randomProject]] (JL
    * — already priced by `ann_rp_recall`) or a randomized/sketched PCA
    * (Halko et al. 2011's randomized range finder), which replaces the
    * d×d eigensolve with a d×(k+p) sketch.
    */
  def fit(df: DataFrame, vecCol: String, k: Int,
          maxDim: Int = 4096): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vecs = df.select(Vectors.toDouble(col(vecCol)).as("v"))
      .where(col("v").isNotNull)
      .rdd.map(_.getSeq[Double](0).toArray)
    val first = vecs.take(1)
    require(first.nonEmpty, "fit needs at least one vector")
    val d = first.head.length
    require(k <= d, s"k $k must be <= vector width $d")
    require(d <= maxDim,
      s"vector width $d exceeds the O(d^3) driver eigensolve budget " +
        s"(maxDim $maxDim) — reduce dimensionality first (JL random " +
        "projection / randomized PCA) or raise maxDim knowingly")
    // acc = (count, sum(d), upper-tri second moments (d(d+1)/2))
    val zero = (0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    val (n, s, m2) = vecs.treeAggregate(zero)(
      seqOp = { case ((c, sum, tri), x) =>
        require(x.length == d, s"ragged vector: ${x.length} != $d")
        var i = 0
        var t = 0
        while (i < d) {
          sum(i) += x(i)
          var j = i
          while (j < d) { tri(t) += x(i) * x(j); j += 1; t += 1 }
          i += 1
        }
        (c + 1, sum, tri)
      },
      combOp = { case ((c1, s1, t1), (c2, s2, t2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < t1.length) { t1(i) += t2(i); i += 1 }
        (c1 + c2, s1, t1)
      })
    require(n >= 2, s"fit needs at least 2 vectors, got $n")
    val mean = s.map(_ / n)
    // covariance from the moment sums: cov(i,j) = m2/n − μᵢμⱼ (population
    // normalization — the ratio outputs are normalization-invariant)
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m2(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val trace = eigVals.map(math.max(_, 0.0)).sum
    val comps = eigVecs.take(k).map { v =>
      // canonical sign: the largest-|entry| coordinate is positive
      val pivot = v.indices.maxBy(idx => (math.abs(v(idx)), -idx))
      if (v(pivot) < 0) v.map(-_) else v
    }
    PcaModel(mean, comps,
      eigVals.take(k).map(ev =>
        if (trace == 0.0) 0.0 else math.max(ev, 0.0) / trace),
      eigVals.take(k))
  }

  /** Append `outCol` = the k-dim projection of `vecCol` under `model`
    * (optionally whitened to unit per-component variance). Each output
    * coordinate is one codegen'd dot product against a literal component
    * row minus a folded scalar — a narrow, shuffle-free transform.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
              outCol: String, whiten: Boolean = false): DataFrame = {
    val x = Vectors.toDouble(col(vecCol))
    val coords: Seq[Column] = model.components.toSeq.zipWithIndex.map {
      case (w, j) =>
        val center = w.zip(model.mean).map { case (a, b) => a * b }.sum
        val raw = Vectors.dot(x, typedlit(w)) - lit(center)
        if (whiten) {
          val sd = math.sqrt(math.max(model.eigenvalues(j), 1e-12))
          raw / lit(sd)
        } else raw
    }
    df.withColumn(outCol, array(coords: _*))
  }

  /** Symmetric eigendecomposition by cyclic Jacobi rotations (Golub &
    * Van Loan, "Matrix Computations" §8.5): sweeps of (p,q) rotations
    * until the off-diagonal Frobenius mass is numerically zero. Returns
    * eigenvalues descending with matching eigenvector ROWS. O(d³) per
    * sweep, ~6 sweeps in practice — driver-side on a d×d matrix only.
    */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (offDiag() > 1e-20 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tTan =
              tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(r => v(r)(i)).toArray).toArray)
  }
}
