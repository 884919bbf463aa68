package graft

import org.apache.spark.sql.functions._

import graft.ext.QualityProbe

/** The learned quality-filter tier: probe fit, train/score split, and
  * discriminative power against the weak labels.
  */
class QualityProbeSpec extends SparkSpec {

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("probe scores are deterministic and keep a meaningful fraction") {
    val a = QualityProbe.probeScores(docs).collect()
    val b = QualityProbe.probeScores(docs).collect()
    assert(a.toSeq == b.toSeq)
    val kept = a.count(_.getBoolean(2))
    assert(kept > 0 && kept < a.length,
      s"threshold at the base rate must separate: kept $kept of ${a.length}")
  }

  test("the probe ranks held-out positives above negatives (AUC > 0.95)") {
    val s = spark
    val labeled = QualityProbe.features(docs).withColumn("y",
      when(col("x2") >= 0.55, 1.0).otherwise(0.0))
    // held-out half only: odd ids never contributed to the fit
    val scored = QualityProbe.probeScores(docs)
      .join(labeled.select(col("doc_id"), col("y")), "doc_id")
      .filter(col("doc_id") % 2 === 1)
      .select(col("score"), col("y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toDouble * neg.length)
    assert(auc > 0.95, s"held-out AUC $auc")
  }

  test("coefficients come from the even-id train half only") {
    val s = spark
    // perturbing ODD-id rows must not change any even-id score
    val perturbed = docs.withColumn("text",
      when(col("doc_id") % 2 === 1, lit("x x x x")).otherwise(col("text")))
    val base = QualityProbe.probeScores(docs)
      .filter(col("doc_id") % 2 === 0).collect()
    val after = QualityProbe.probeScores(perturbed)
      .filter(col("doc_id") % 2 === 0).collect()
    assert(base.toSeq == after.toSeq)
  }

  test("scoring is map-only against a broadcast coefficient frame") {
    val plan = QualityProbe.probeScores(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(2000))
  }
}
