package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier step of a training-data
  * curation pipeline (the fastText/CCNet "quality model" shape: train a
  * cheap classifier on weak labels, score every document, keep by
  * threshold). Heuristic filters (TextOps.qualityScore) are the rule
  * tier; this is the learned tier that generalizes past the rules.
  *
  * The model is a LINEAR PROBABILITY PROBE fit by exact closed-form
  * least squares over two repetition/length features, for the same
  * reason `ml/PriceModel` uses the normal solver: the fit reduces to
  * POPULATION-COVARIANCE STATISTICS — one map-side-combined aggregation
  * pass, no iterative optimizer — so a DuckDB re-execution of the same
  * algebra reproduces every score bit-for-bit (rounded once at output).
  * An iterative LogisticRegression would drift across engines and
  * partitionings; the pipeline mechanics it would need — featurize →
  * fit on a sample → broadcast coefficients → map-only scoring →
  * threshold — are exactly what this operator exercises, so swapping
  * the probe for a heavier model changes one function, not the shape.
  *
  * Scale (100 TB): training reads only the deterministic half-sample
  * (`doc_id % 2 = 0`; swap in the md5 gate of [[Curation.splits]] for
  * non-sequential ids) and reduces to ONE aggregation row; scoring is
  * a projection against the broadcast one-row coefficient frame — no
  * shuffle, no iteration, no driver loop.
  *
  * Weak labels, deliberately simple and SQL-expressible: a document is
  * "good" when it is lexically diverse (type-token ratio ≥ 0.55 — the
  * classic repetition signal; `q_repetition` uses the windowed
  * variant). The probe learns how the raw features predict that label
  * on the train half (length enters as the correlated second feature —
  * longer synthetic docs repeat vocabulary, so the probe must weigh
  * both) and scores EVERY doc; `keep` thresholds at the trained base
  * rate, the probe's natural operating point for an unbalanced label.
  * Fit quality is spec-asserted as AUC > 0.95 against held-out odd-id
  * docs.
  */
object QualityProbe {

  /** Per-doc features: x1 = word count, x2 = type-token ratio. Single
    * `split` on the space the synthetic corpus is tokenized by; both
    * are exact integers ratioed in double, so the oracle's
    * `string_split`/`list_distinct` reproduces them precisely.
    */
  def features(docs: DataFrame): DataFrame = {
    val words = size(split(col("text"), " "))
    graft.Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"),
      words.cast("double").as("x1"),
      (size(array_distinct(split(col("text"), " "))).cast("double") /
        words).as("x2"))
  }

  /** Fit on the even-id half, score all docs. Output: (doc_id, score
    * 4dp, keep). */
  def probeScores(docs: DataFrame): DataFrame = {
    val labeled = features(docs).withColumn("y",
      when(col("x2") >= 0.55, 1.0).otherwise(0.0))
    val stats = labeled.filter(col("doc_id") % 2 === 0).agg(
      covar_pop(col("x1"), col("y")).as("c1y"),
      covar_pop(col("x2"), col("y")).as("c2y"),
      var_pop(col("x1")).as("v1"),
      var_pop(col("x2")).as("v2"),
      covar_pop(col("x1"), col("x2")).as("c12"),
      avg(col("x1")).as("m1"),
      avg(col("x2")).as("m2"),
      avg(col("y")).as("my"))
    // 2-feature OLS in closed form (Cramer on the 2x2 normal equations)
    val det = col("v1") * col("v2") - col("c12") * col("c12")
    val coef = stats.select(
        ((col("c1y") * col("v2") - col("c2y") * col("c12")) / det).as("b1"),
        ((col("c2y") * col("v1") - col("c1y") * col("c12")) / det).as("b2"),
        col("m1"), col("m2"), col("my"))
      .select(col("b1"), col("b2"), col("my"),
        (col("my") - col("b1") * col("m1") - col("b2") * col("m2")).as("b0"))
    val score = col("b0") + col("b1") * col("x1") + col("b2") * col("x2")
    labeled.crossJoin(broadcast(coef)) // one-row scalar frame: the broadcast-scalar idiom
      .select(col("doc_id"),
        round(score, 4).as("score"),
        (score >= col("my")).as("keep"))
      .orderBy(col("doc_id"))
  }

  val probeOracle: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS x1,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS x2
      |  FROM documents),
      |l AS (
      |  SELECT *, CASE WHEN x2 >= 0.55 THEN 1.0 ELSE 0.0 END AS y
      |  FROM f),
      |fit AS (
      |  SELECT covar_pop(x1, y) AS c1y, covar_pop(x2, y) AS c2y,
      |         var_pop(x1) AS v1, var_pop(x2) AS v2,
      |         covar_pop(x1, x2) AS c12,
      |         avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my
      |  FROM l WHERE doc_id % 2 = 0),
      |coef AS (
      |  SELECT my,
      |    (c1y*v2 - c2y*c12) / (v1*v2 - c12*c12) AS b1,
      |    (c2y*v1 - c1y*c12) / (v1*v2 - c12*c12) AS b2,
      |    my - ((c1y*v2 - c2y*c12) / (v1*v2 - c12*c12)) * m1
      |       - ((c2y*v1 - c1y*c12) / (v1*v2 - c12*c12)) * m2 AS b0
      |  FROM fit)
      |SELECT doc_id,
      |       round(b0 + b1*x1 + b2*x2, 4) AS score,
      |       (b0 + b1*x1 + b2*x2) >= my AS keep
      |FROM l, coef
      |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_probe" -> ((s, d) => probeScores(graft.Tables.documents(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_quality_probe" -> probeOracle
  )
}
