package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("auc: hand-computed fixture with ties gets midrank treatment") {
    // scores asc: 1(neg) 2(pos,neg) 3(pos)
    // histogram method: s=2 → pos·(2·cumneg+neg) = 1·(2·1+1) = 3
    //                   s=3 → 1·(2·2+0) = 4 ⇒ auc = 7/(2·2·2) = 0.875
    val d = Seq((1.0, 0), (2.0, 1), (2.0, 0), (3.0, 1)).toDF("s", "y")
    val r = Classifier.auc(d, "s", "y").as[(Long, Long, Double)].head()
    assert(r === ((2L, 2L, 0.875)))
  }

  test("auc: perfect and inverted separation bracket the scale") {
    val perfect = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("s", "y")
    assert(Classifier.auc(perfect, "s", "y").as[(Long, Long, Double)]
      .head()._3 === 1.0)
    val inverted = Seq((1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)).toDF("s", "y")
    assert(Classifier.auc(inverted, "s", "y").as[(Long, Long, Double)]
      .head()._3 === 0.0)
  }

  test("prCurve: thresholds descend, counts cumulative, ratios exact") {
    val d = Seq((3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)).toDF("s", "y")
    val rows = Classifier.prCurve(d, "s", "y")
      .select("threshold", "tp", "fp", "precision", "recall")
      .as[(Double, Long, Long, Double, Double)].collect().toSeq
    assert(rows === Seq(
      (3.0, 1L, 0L, 1.0, 0.5),
      (2.0, 2L, 1L, round6(2.0 / 3.0), 1.0),
      (1.0, 2L, 2L, 0.5, 1.0)))
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  // two near-separable classes sharing a background vocabulary — the
  // planted shape a distilled quality classifier must recover
  private def planted = {
    val bg = Seq("the", "a", "of", "data", "table", "row")
    val pos = Seq("clean", "curated", "quality", "prose")
    val neg = Seq("spam", "junk", "click", "scam")
    (0L until 240L).map { i =>
      val r = new scala.util.Random(i)
      val marked = if (i % 2 == 0) pos else neg
      val words = Seq.fill(6)(bg(r.nextInt(bg.length))) ++
        Seq.fill(4)(marked(r.nextInt(marked.length)))
      (i, r.shuffle(words).mkString(" "), (i % 2 == 0).compare(false))
    }.toDF("id", "text", "y")
  }

  test("trainLogReg separates planted classes; scoring is one broadcast " +
      "join (auc >= 0.99 on train, holdout-style half >= 0.95)") {
    val d = planted
    val train = d.where($"id" % 4 < 2) // deterministic half
    val hold = d.where($"id" % 4 >= 2)
    val w = Classifier.trainLogReg(train, "id", "text", "y",
      buckets = 1024, iterations = 40, lr = 0.5)
    assert(w.count() <= 1024L + 2)
    val scoredTrain = Classifier.scoreLogReg(train, "id", "text", w, 1024)
    val aucTrain = Classifier.auc(scoredTrain, "p", "y")
      .select("auc").as[Double].head()
    assert(aucTrain >= 0.99, s"train auc $aucTrain")
    val scoredHold = Classifier.scoreLogReg(hold, "id", "text", w, 1024)
    val aucHold = Classifier.auc(scoredHold, "p", "y")
      .select("auc").as[Double].head()
    assert(aucHold >= 0.95, s"holdout auc $aucHold")
  }

  test("model sidecar roundtrip: scoreAgainstModel equals scoreLogReg " +
      "with the in-memory weights, hash width from meta") {
    val d = planted
    val w = Classifier.trainLogReg(d, "id", "text", "y",
      buckets = 512, iterations = 10)
    val dir = java.nio.file.Files.createTempDirectory("lr_model").toString
    Classifier.writeLrModel(w, 512, dir)
    val direct = Classifier.scoreLogReg(d, "id", "text", w, 512)
      .select("id", "p").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val frozen = Classifier.scoreAgainstModel(d, "id", "text", dir)
      .select("id", "p").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(frozen === direct)
  }

  test("scoreLogReg: featureless rows survive with the z=0 score; " +
      "guards reject colliding columns") {
    val w = Classifier.trainLogReg(
      Seq((1L, "good good", 1), (2L, "bad bad", 0)).toDF("id", "text", "y"),
      "id", "text", "y", buckets = 64, iterations = 5)
    // empty text still emits bias+length features; a join-miss can only
    // come from an id outside the scored frame — exercise the left-join
    // coalesce by scoring text whose tokens the MODEL never saw
    val s = Classifier.scoreLogReg(
      Seq((9L, "unseen tokens only")).toDF("id", "text"),
      "id", "text", w, 64)
    assert(s.count() === 1)
    intercept[IllegalArgumentException] {
      Classifier.features(Seq((1L, "t", 0.5)).toDF("f", "text", "x"),
        "f", "text", 64)
    }
  }
}
