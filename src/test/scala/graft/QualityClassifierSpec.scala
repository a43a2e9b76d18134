package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.QualityClassifier

/** D25 trained quality filter: learns clean-vs-garbage from labeled
  * examples, scores held-out documents accurately, and the scoring
  * plan stays exchange-free (broadcast-model per-row map).
  */
class QualityClassifierSpec extends SparkSpec {

  private val cleanStems = Seq(
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a committee of researchers published the annual report on climate",
    "she walked through the quiet market looking for fresh vegetables",
    "the library opens early and closes after the evening lectures end",
    "engineers tested the bridge design under heavy simulated traffic")

  /** 1: readable sentences; 0: deterministic token soup (md5 chains). */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    val clean = (0 until n).map { i =>
      (i.toLong, s"${cleanStems(i % cleanStems.length)} item $i", 1)
    }
    val junk = (0 until n).map { i =>
      val soup = (0 until 8)
        .map(j => java.security.MessageDigest.getInstance("MD5")
          .digest(s"junk $i $j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
        .mkString(" ")
      ((n + i).toLong, soup, 0)
    }
    (clean ++ junk).toDF("id", "text", "label")
  }

  test("learns clean-vs-garbage: held-out accuracy and separation") {
    val data = corpus(120)
    val train = data.filter(col("id") % 2 === 0)
    val test = data.filter(col("id") % 2 === 1)
    val model = QualityClassifier.train(train, "text", col("label"),
      QualityClassifier.Config(numFeatures = 1 << 14, maxIter = 30))
    val scored = QualityClassifier.score(test, model)
    val acc = scored
      .select(avg(((col("quality_prob") >= 0.5).cast("int") === col("label"))
        .cast("int")))
      .collect().head.getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // the filter keeps clean rows and drops soup at the 0.5 threshold
    val kept = QualityClassifier.keepQuality(test, model)
      .select("label").collect().map(_.getInt(0))
    assert(kept.nonEmpty && kept.forall(_ == 1))
  }

  test("scoring is a per-row map: no exchange in the plan") {
    val data = corpus(40)
    val model = QualityClassifier.train(data, "text", col("label"),
      QualityClassifier.Config(numFeatures = 1 << 12, maxIter = 10))
    val plan = QualityClassifier.score(data, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("a saved model reloads and scores identically") {
    val data = corpus(40)
    val model = QualityClassifier.train(data, "text", col("label"),
      QualityClassifier.Config(numFeatures = 1 << 12, maxIter = 10))
    val path = java.nio.file.Files
      .createTempDirectory("graft-qc-model").toString + "/m"
    QualityClassifier.save(model, path)
    val reloaded = QualityClassifier.load(spark, path)
    val a = QualityClassifier.score(data, model)
      .select("id", "quality_prob").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = QualityClassifier.score(data, reloaded)
      .select("id", "quality_prob").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("reserved scratch prefix refuses colliding inputs") {
    import spark.implicits._
    val bad = Seq((1L, "x", 1)).toDF("id", "text", "label")
      .withColumn("__qc_toks", lit(1))
    intercept[IllegalArgumentException] {
      QualityClassifier.train(bad, "text", col("label"))
    }
  }
}
