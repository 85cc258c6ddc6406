package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Versioning

class VersioningSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def snap(rows: (Long, String)*) =
    Versioning.manifest(rows.toDF("id", "text"), "id", "text")

  test("diff: all four statuses, unchanged rows suppressed") {
    val from = snap((1L, "same"), (2L, "old body"), (3L, "to be removed"))
    val to = snap((1L, "same"), (2L, "new body"), (4L, "brand new"))
    val d = Versioning.diff(from, to, "id")
      .select("id", "status").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(d === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("manifest fingerprints are content-addressed: same text, same " +
      "fingerprint; byte length recorded") {
    val m = snap((1L, "abc"), (2L, "abc"), (3L, "abcd"))
      .select("fingerprint", "n_bytes")
      .as[(String, Long)].collect().toSeq
    assert(m(0) === m(1))
    assert(m(0)._1 !== m(2)._1)
    assert(m(2)._2 === 4L)
  }

  test("diffSummary: counts and byte mass per status, bytes from the " +
      "side that has the doc") {
    val from = snap((1L, "same"), (2L, "old"), (3L, "removed!"))
    val to = snap((1L, "same"), (2L, "newer"), (4L, "add"))
    val s = Versioning.diffSummary(from, to, "id")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(s === Seq(("added", 1L, 3L), ("changed", 1L, 5L),
      ("removed", 1L, 8L)))
  }
}
