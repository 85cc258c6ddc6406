package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JobText

/** Property tests (SURVEY.md §5.2.3): salary mean bounded by the range,
  * duration round-trips, title cleaning idempotent. Uses ScalaCheck Gens
  * sampled with a fixed seed (the scalatest-scalacheck bridge artifact is
  * not in the offline cache).
  */
class PropertySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 25): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("salaryAvg(lo..hi) lies within [lo, hi]") {
    val cases = samples(Gen.zip(Gen.choose(1, 80), Gen.choose(1, 40)))
    val df = cases.map { case (lo, span) => (lo, lo + span, s"$lo - ${lo + span} triệu") }
      .toDF("lo", "hi", "s")
    val bad = df.select(col("lo"), col("hi"),
        JobText.salaryAvg(JobText.cleanSalary(col("s"))).as("avg"))
      .filter(col("avg") < col("lo") || col("avg") > col("hi"))
    assert(bad.count() === 0)
  }

  test("relativeSeconds round-trips generated Vietnamese durations") {
    val units = Seq(("giây", 1L), ("phút", 60L), ("giờ", 3600L), ("ngày", 86400L))
    val cases = samples(Gen.zip(Gen.choose(1, 500), Gen.choose(0, 3)), 40)
    val df = cases.map { case (n, u) =>
      (s"Còn $n ${units(u)._1} nữa", n * units(u)._2)
    }.toDF("t", "expect")
    val bad = df.select(JobText.relativeSeconds(col("t")).as("got"), col("expect"))
      .filter(col("got") =!= col("expect"))
    assert(bad.count() === 0)
  }

  test("cleanTitle is idempotent") {
    val titles = Seq(
      "Java Developer - Lương Upto 30Tr", "Nhân Viên IT/ Bảo Trì",
      "🔥 Tester (Fresher)", "Data Engineer - HCM - 25 triệu",
      "  spaced  out  title  ", "...", "a-b-c", "x / y / z")
    val once = titles.toDF("t")
      .select(JobText.cleanTitle(col("t")).as("v")).as[String].collect().toSeq
    val twice = once.toDF("t")
      .select(JobText.cleanTitle(col("t")).as("v")).as[String].collect().toSeq
    assert(twice === once)
  }
}
