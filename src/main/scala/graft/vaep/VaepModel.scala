package graft.vaep

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1–M4 — the VAEP model pair: two gradient-boosted binary classifiers
  * P(score in next 10) / P(concede in next 10) over the assembled feature
  * vector (reference `socceraction/vaep/base.py:142-216`).
  *
  * Differences from the reference, by design: spark.ml's GBTClassifier has
  * no early stopping, so trees are fixed at `maxIter` with a fixed seed; the
  * reference's own e2e tests don't golden-check learned-model outputs either
  * (`tests/vaep/test_vaep.py` asserts structure + metrics), and neither do
  * ours — the value-exact gates cover features/labels/formula/xT.
  */
object VaepModel {

  final case class Fitted(
      featureCols: Array[String],
      scores: GBTClassificationModel,
      concedes: GBTClassificationModel)

  private def assembler(featureCols: Array[String]) =
    new VectorAssembler().setInputCols(featureCols).setOutputCol("features_vec")

  /** Boolean / numeric feature columns → double (one projection). */
  def numericize(df: DataFrame, featureCols: Seq[String]): DataFrame =
    df.select(df.columns.map { c =>
      if (featureCols.contains(c)) col(c).cast("double").as(c) else col(c)
    }: _*)

  def fit(train: DataFrame, featureCols: Array[String], maxIter: Int = 20,
          maxDepth: Int = 3, seed: Long = 42L): Fitted = {
    // cache ONLY what the two fits read (labels + assembled vector): the
    // upstream frame is wide (the full feature projection plus every carried
    // action column) and caching it whole would both burn memory and make
    // each boosting iteration's dataset->RDD conversion scan dead columns
    val assembled = assembler(featureCols).transform(numericize(train, featureCols))
      .withColumn("label_scores", col("scores").cast("double"))
      .withColumn("label_concedes", col("concedes").cast("double"))
      .select("label_scores", "label_concedes", "features_vec")
      .cache()
    def gbt(labelCol: String) = new GBTClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features_vec")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
    // materialize the cache once before both consumers race for it
    val nRows = assembled.count()
    // boosting runs dozens of small jobs (findSplits + one histogram
    // aggregation per tree level per iteration); with partitions far below
    // ~32k rows each, per-task stats-array allocation and scheduling dwarf
    // the real work. Derive the training parallelism from the data size
    // (scale-adaptive: a 100 TB input keeps the session's parallelism, a
    // small one collapses to few partitions) instead of inheriting the
    // session's shuffle-partition count.
    val train0 = {
      val target = math.max(1L, nRows / 32768L).min(
        assembled.rdd.getNumPartitions.toLong).toInt
      if (target < assembled.rdd.getNumPartitions) assembled.coalesce(target)
      else assembled
    }
    // the scores and concedes fits are INDEPENDENT job sequences over the
    // same cached input; boosting runs many small sequential jobs per model,
    // each leaving most cores idle — submitting the two fits from two
    // threads lets the scheduler back-fill one model's stragglers with the
    // other model's tasks. Each fit's lineage is unchanged, so both models
    // are identical to the sequential run.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val m =
      try {
        val fScores = scala.concurrent.Future(gbt("label_scores").fit(train0))
        val fConcedes = scala.concurrent.Future(gbt("label_concedes").fit(train0))
        Fitted(featureCols,
          scala.concurrent.Await.result(fScores, scala.concurrent.duration.Duration.Inf),
          scala.concurrent.Await.result(fConcedes, scala.concurrent.duration.Duration.Inf))
      } finally pool.shutdown()
    assembled.unpersist()
    m
  }

  /** M1 with the reference's validation split (`vaep/base.py:142-216`
    * holds out 25% for xgboost early stopping): a seeded randomSplit, GBTs
    * trained with `validationIndicatorCol` early stopping, and held-out
    * Brier/AUROC per label returned alongside the model. */
  def fitWithValidation(data: DataFrame, featureCols: Array[String],
                        maxIter: Int = 20, maxDepth: Int = 3, seed: Long = 42L,
                        valFraction: Double = 0.25)
      : (Fitted, Map[String, (Double, Double)]) = {
    val num = numericize(data, featureCols.toSeq)
    val Array(tr, va) = num.randomSplit(Array(1 - valFraction, valFraction), seed)
    val both = tr.withColumn("is_val", lit(false))
      .unionByName(va.withColumn("is_val", lit(true)))
    val assembled = assembler(featureCols).transform(both)
      .withColumn("label_scores", col("scores").cast("double"))
      .withColumn("label_concedes", col("concedes").cast("double"))
      .cache()
    def gbt(labelCol: String) = new GBTClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features_vec")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .setValidationIndicatorCol("is_val")
    val fitted = Fitted(featureCols,
      gbt("label_scores").fit(assembled),
      gbt("label_concedes").fit(assembled))
    val vaProbs = estimateProbabilities(fitted, va)
    val metrics = Map(
      "scores" -> score(vaProbs, "scores", "scores_p"),
      "concedes" -> score(vaProbs, "concedes", "concedes_p"))
    assembled.unpersist()
    (fitted, metrics)
  }

  /** M2 — P̂(positive) per model as columns `scores_p` / `concedes_p`.
    *
    * Scores through the [[FrozenGbt]] literal-tree walker instead of two
    * `GBTClassificationModel.transform` stages: the walker replicates
    * predictRaw's weighted leaf-sum and the log-loss link term for term
    * (FrozenGbtSpec asserts ≤1e-12 parity with the ml transform on every
    * row), but runs as ONE whole-stage-codegen projection — no
    * VectorAssembler materialization and no per-row prediction UDF, the
    * guide-§4 "prefer codegen expressions in the hot path" move. */
  def estimateProbabilities(model: Fitted, df: DataFrame): DataFrame = {
    val num = numericize(df, model.featureCols.toSeq)
    num
      .withColumn("scores_p",
        FrozenGbt.column(FrozenGbt.fromMl(model.scores, model.featureCols)))
      .withColumn("concedes_p",
        FrozenGbt.column(FrozenGbt.fromMl(model.concedes, model.featureCols)))
  }

  /** M3 — rate: probabilities + the VAEP value formula. */
  def rate(model: Fitted, df: DataFrame): DataFrame =
    Formula.value(estimateProbabilities(model, df))

  /** M4 — Brier score + AUROC per label (reference `vaep/base.py:351-382`). */
  def score(df: DataFrame, labelCol: String, probCol: String): (Double, Double) = {
    val withL = df.withColumn("l", col(labelCol).cast("double"))
    val brier = withL
      .agg(avg(pow(col(probCol) - col("l"), 2))).head.getDouble(0)
    val auroc = new BinaryClassificationEvaluator()
      .setLabelCol("l").setRawPredictionCol(probCol)
      .setMetricName("areaUnderROC")
      .evaluate(withL)
    (brier, auroc)
  }
}
