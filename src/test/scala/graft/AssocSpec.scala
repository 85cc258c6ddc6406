package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Assoc

class AssocSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("pairAssociations: hand-computed support/lift/PMI, in-basket " +
      "duplicates collapse, minSupport prunes, nulls excluded") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b,d} (+ dup a in basket 1,
    // + a null item) — supports: a=3 b=3 c=2 d=1; pairs with support>=2:
    // (a,b)=2, (a,c)=2; (b,c)=1 and (b,d)=1 pruned; n_baskets=4
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b"), (4L, "d"),
      (4L, null.asInstanceOf[String]))
      .toDF("basket", "item")
    val r = Assoc.pairAssociations(rows, "basket", "item", minSupport = 2)
      .orderBy("item_a", "item_b")
      .collect()
    assert(r.length === 2)
    val ab = r(0)
    assert((ab.getString(0), ab.getString(1)) === (("a", "b")))
    assert(ab.getLong(ab.fieldIndex("support_ab")) === 2L)
    assert(ab.getLong(ab.fieldIndex("support_a")) === 3L)
    assert(ab.getLong(ab.fieldIndex("support_b")) === 3L)
    assert(ab.getLong(ab.fieldIndex("n_baskets")) === 4L)
    // lift = 2*4/(3*3) = 8/9
    assert(math.abs(ab.getDouble(ab.fieldIndex("lift")) - 8.0 / 9.0)
      < 1e-12)
    assert(math.abs(ab.getDouble(ab.fieldIndex("pmi")) -
      math.log(8.0 / 9.0) / math.log(2.0)) < 1e-12)
    val ac = r(1)
    assert((ac.getString(0), ac.getString(1)) === (("a", "c")))
    // lift = 2*4/(3*2) = 4/3 > 1: a and c travel together
    assert(math.abs(ac.getDouble(ac.fieldIndex("lift")) - 4.0 / 3.0)
      < 1e-12)
    // minSupport=1 surfaces the pruned pairs too
    assert(Assoc.pairAssociations(rows, "basket", "item", 1).count() === 4)
  }
}
