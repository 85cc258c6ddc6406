package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JobText

/** Golden-fixture tests for the jobs-domain parsers (FIXTURES.md §B),
  * including every intended-semantics decision from SURVEY.md §2.10.
  */
class JobTextSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def titleOf(raw: String): String =
    Seq(raw).toDF("t").select(JobText.cleanTitle(col("t"))).as[String].head()

  test("E1 clean_title strips ' - ' suffix") {
    assert(titleOf("Java Developer - Lương Upto 30Tr") === "Java Developer")
  }
  test("E1 clean_title keeps Vietnamese word chars (Unicode \\w)") {
    assert(titleOf("Nhân Viên IT Phần Cứng/ Bảo Trì Hệ Thống")
      === "Nhân Viên IT Phần Cứng/ Bảo Trì Hệ Thống")
  }
  test("E1 clean_title strips leading emoji") {
    assert(titleOf("🔥 Tester (Fresher)") === "Tester")
  }
  test("E1 clean_title no-match falls back to trimmed input") {
    assert(titleOf("  ()  ") === "()")
  }

  private def salaryOf(raw: String): (Option[Double], Option[Double], Boolean, Option[Double]) = {
    val r = Seq(raw).toDF("s")
      .select(JobText.cleanSalary(col("s")).as("x"))
      .select($"x.lo", $"x.hi", $"x.negotiable",
        JobText.salaryAvg(col("x")).as("avg"))
      .as[(Option[Double], Option[Double], Boolean, Option[Double])]
      .head()
    r
  }

  test("E2 triệu range (intended B1 fix: hi = second match)") {
    assert(salaryOf("15 - 20 triệu") === ((Some(15.0), Some(20.0), false, Some(17.5))))
  }
  test("E2 triệu single value") {
    assert(salaryOf("25 triệu") === ((Some(25.0), None, false, Some(25.0))))
  }
  test("E2 USD range with commas → millions VND") {
    assert(salaryOf("1,000 - 2,000 USD") === ((Some(23.0), Some(46.0), false, Some(34.5))))
  }
  test("E2 USD single with comma") {
    assert(salaryOf("Tới 1,500 USD") === ((Some(34.5), None, false, Some(34.5))))
  }
  test("E2 dollar sign") {
    assert(salaryOf("Từ $500") === ((Some(11.5), None, false, Some(11.5))))
  }
  test("E2 sentinel Thỏa thuận → negotiable") {
    assert(salaryOf("Thỏa thuận") === ((None, None, true, None)))
  }
  test("E2 digits with unknown currency → nulls, not negotiable (B2)") {
    assert(salaryOf("Lên đến 30 củ") === ((None, None, false, None)))
  }

  private def secsOf(raw: String): Option[Long] =
    Seq(raw).toDF("t").select(JobText.relativeSeconds(col("t")))
      .as[Option[Long]].head()

  test("E4 relative seconds per unit") {
    assert(secsOf("Đăng 3 giờ trước") === Some(3 * 3600L))
    assert(secsOf("Cập nhật 45 phút trước") === Some(45 * 60L))
    assert(secsOf("Còn 24 ngày để ứng tuyển") === Some(24 * 86400L))
    assert(secsOf("Còn 30 giây để ứng tuyển") === Some(30L))
  }
  test("E4 unmatched text → null (B8: reference crashes)") {
    assert(secsOf("Đã hết hạn") === None)
  }
  test("E4 posted/due from injected anchor") {
    val r = Seq(("Đăng 3 giờ trước", "Còn 24 ngày để ứng tuyển")).toDF("u", "d")
      .select(
        JobText.postedDate(lit("2026-08-12 12:00:00").cast("timestamp_ntz"), col("u"))
          .cast("string").as("p"),
        JobText.dueDate(lit("2026-08-12 12:00:00").cast("timestamp_ntz"), col("d"))
          .cast("string").as("q"))
      .as[(String, String)].head()
    assert(r._1 === "2026-08-12 09:00:00")
    assert(r._2 === "2026-09-05 12:00:00")
  }

  private def remOf(secs: Long): String = {
    Seq(secs).toDF("s")
      .select(JobText.remainingTime(
        lit("2026-08-12 12:00:00").cast("timestamp_ntz") +
          make_dt_interval(lit(0), lit(0), lit(0), col("s").cast("double")),
        lit("2026-08-12 12:00:00").cast("timestamp_ntz")).as("r"))
      .as[String].head()
  }

  test("W1 remaining-time buckets (script.sql:13-49 intended semantics)") {
    assert(remOf(40) === "Còn 40 giây để ứng tuyển")
    assert(remOf(25 * 60) === "Còn 25 phút để ứng tuyển")
    assert(remOf(7 * 3600) === "Còn 7 giờ để ứng tuyển")
    assert(remOf(23 * 86400) === "Còn 23 ngày để ứng tuyển")
    assert(remOf(0) === "Đã hết thời gian ứng tuyển")
    assert(remOf(-5) === "Đã hết thời gian ứng tuyển")
  }

  test("E6/E7 sentinel→null then cast+round") {
    val r = Seq("Thỏa thuận", "15.6").toDF("s")
      .select(JobText.castSalary(JobText.sentinelToNull(col("s"))).as("v"))
      .as[Option[Double]].collect().toSeq
    assert(r === Seq(None, Some(16.0)))
  }
}
