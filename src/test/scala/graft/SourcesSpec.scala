package graft

import org.scalatest.funsuite.AnyFunSuite

/** Non-parquet source formats: the engine's readers are format-agnostic
  * DataFrameReader plumbing, but the devil is in the escaping — this pins
  * lossless round-trips for JSONL and CSV against the parquet ground truth,
  * including multi-script text (the documents fixture carries CJK and
  * Vietnamese), so a user switching an upstream feed from parquet to
  * JSON/CSV keeps byte-identical documents.
  */
class SourcesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def truth = Tables.load(spark, sf, "documents")
    .select("doc_id", "text", "lang")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, String)].collect().toSet

  test("JSONL round-trips the documents table losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("src_jsonl").toString
    truth.write.mode("overwrite").json(dir)
    val back = spark.read.schema(truth.schema).json(dir)
    assert(asSet(back) === asSet(truth))
  }

  test("CSV round-trips the documents table with explicit quoting options") {
    val dir = java.nio.file.Files.createTempDirectory("src_csv").toString
    // quoteAll + backslash-free escaping ("" doubling) + multiLine on the
    // read side: the combination that survives embedded quotes, commas,
    // and newlines in free text
    truth.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .csv(dir)
    val back = spark.read.schema(truth.schema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(dir)
    assert(asSet(back) === asSet(truth))
  }
}
