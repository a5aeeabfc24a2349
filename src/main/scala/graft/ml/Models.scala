package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel, RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L3-L8, L10-L11 — the spark.ml estimator surface (SURVEY.md §2.7).
  *
  * Thin, deterministic wrappers: seeds pinned, hyperparameters mirroring
  * the reference (`LogisticRegression(max_iter=1000)` at
  * `process_logs_v9.py:284`, `RandomForestClassifier(n_estimators=100,
  * random_state=42)` at v9:343, `PCA(n_components=2)` at v9:441).
  * Metrics follow v9:292-309 including the single-class AUC guard (L6).
  * Correctness is asserted on metric structure, not bit-equality with
  * sklearn (different RNGs/optimizers — SURVEY.md §7.4 #5).
  */
object Models {

  def assemble(df: DataFrame, featureCols: Seq[String], labelCol: String): DataFrame =
    new VectorAssembler().setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
      .withColumn("label", col(labelCol).cast("double"))

  // ------------------------------------------------------------------ L3
  def fitLogisticRegression(train: DataFrame, maxIter: Int = 1000): LogisticRegressionModel =
    new LogisticRegression().setMaxIter(maxIter)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(train)

  // ------------------------------------------------------------------ L4
  def fitRandomForest(train: DataFrame, numTrees: Int = 100, seed: Long = 42L): RandomForestClassificationModel =
    new RandomForestClassifier().setNumTrees(numTrees).setSeed(seed)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(train)

  // ------------------------------------------------------------- L5 + L6
  /** precision / recall / accuracy via direct confusion-count aggregation
    * (positive class = 1.0), AUC guarded to null when the test labels are
    * single-class (`process_logs_v9.py:296-301`). One job for the counts,
    * one for AUC when defined. */
  def binaryMetrics(predictions: DataFrame): DataFrame = {
    val spark = predictions.sparkSession
    import spark.implicits._
    val counts = predictions.agg(
      sum(when($"label" === 1.0 && $"prediction" === 1.0, 1L).otherwise(0L)).as("tp"),
      sum(when($"label" === 0.0 && $"prediction" === 1.0, 1L).otherwise(0L)).as("fp"),
      sum(when($"label" === 1.0 && $"prediction" === 0.0, 1L).otherwise(0L)).as("fn"),
      count(lit(1)).as("n"),
      sum(when($"label" === $"prediction", 1L).otherwise(0L)).as("correct"),
      countDistinct($"label").as("nLabels")).head()
    val (tp, fp, fn, n, correct, nLabels) =
      (counts.getLong(0), counts.getLong(1), counts.getLong(2),
       counts.getLong(3), counts.getLong(4), counts.getLong(5))
    val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    val accuracy = if (n == 0) 0.0 else correct.toDouble / n
    val auc: Option[Double] =
      if (nLabels > 1)
        Some(new BinaryClassificationEvaluator().setMetricName("areaUnderROC")
          .setRawPredictionCol("rawPrediction").evaluate(predictions))
      else None // single-class guard (L6)
    Seq(("precision", Some(precision)), ("recall", Some(recall)),
        ("accuracy", Some(accuracy)), ("auc", auc))
      .toDF("metric", "value")
  }

  // ------------------------------------------------------------- L7 / L8
  /** |LR coefficient| per feature, descending (W4 composed). */
  def lrImportance(model: LogisticRegressionModel, featureCols: Seq[String]): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    featureCols.zip(model.coefficients.toArray.map(math.abs))
      .toDF("feature", "importance")
      .orderBy(desc("importance"), asc("feature"))
  }

  /** RF Gini importance per feature, descending. */
  def rfImportance(model: RandomForestClassificationModel, featureCols: Seq[String]): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    featureCols.zip(model.featureImportances.toArray)
      .toDF("feature", "importance")
      .orderBy(desc("importance"), asc("feature"))
  }

  // ----------------------------------------------------------------- L10
  /** PCA projection to k components: returns input + `pc` array column. */
  def pcaProject(df: DataFrame, featureCols: Seq[String], k: Int): DataFrame = {
    val assembled = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("__features").transform(df)
    val model = new PCA().setK(k).setInputCol("__features").setOutputCol("__pc")
      .fit(assembled)
    model.transform(assembled)
      .withColumn("pc", vector_to_array(col("__pc")))
      .drop("__features", "__pc")
  }

  /** PCA over an existing Array[Float] embedding column. */
  def pcaProjectArray(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val toVec = udf { (v: Seq[Float]) => Vectors.dense(v.map(_.toDouble).toArray) }
    val assembled = df.withColumn("__features", toVec(col(vecCol)))
    val model = new PCA().setK(k).setInputCol("__features").setOutputCol("__pc")
      .fit(assembled)
    model.transform(assembled)
      .withColumn("pc", vector_to_array(col("__pc")))
      .drop("__features", "__pc")
  }
}
