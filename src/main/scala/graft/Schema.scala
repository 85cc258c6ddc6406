package graft

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Declared schemas for the jobs domain (S6 — the reference's DDL,
  * `/root/reference/src/create_table.py:50-79`), plus the typed view.
  */
object Schema {

  /** staging_table — raw/bronze, 9 columns
    * (`/root/reference/src/create_table.py:52-62`). */
  val staging: StructType = StructType(Seq(
    StructField("job_name", StringType),
    StructField("job_link", StringType), // de-facto primary key
    StructField("salary", StringType),   // raw text, e.g. "15 - 20 triệu"
    StructField("company_name", StringType),
    StructField("update", StringType),   // raw "Đăng N giờ trước" (staging only)
    StructField("posted_date", TimestampType),
    StructField("job_location", StringType), // VARCHAR(30) in the reference
    StructField("remaining_time", StringType),
    StructField("due_date", TimestampType)))

  /** jobs_table — clean/silver: staging minus `update`, salary numeric after
    * the cast path (`/root/reference/src/create_table.py:65-76`,
    * `script.sql:6-10`). */
  val jobs: StructType = StructType(Seq(
    StructField("job_name", StringType),
    StructField("job_link", StringType),
    StructField("salary", DoubleType),
    StructField("company_name", StringType),
    StructField("posted_date", TimestampType),
    StructField("job_location", StringType),
    StructField("remaining_time", StringType),
    StructField("due_date", TimestampType)))

  /** Typed view of the cleaned table (SURVEY.md §1.5). */
  case class Job(
      job_name: String,
      job_link: String,
      salary: Option[Double],
      company_name: String,
      posted_date: Option[Timestamp],
      job_location: String,
      remaining_time: String,
      due_date: Option[Timestamp])
}
