package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.DataFrame

/** The reference's sentiment model (`/root/reference/README.md:81` —
  * the training notebook itself is lost, SURVEY.md §2.9): RegexTokenizer
  * → StopWordsRemover → TF-IDF (HashingTF+IDF, the stock Spark recipe)
  * → LogisticRegression, composed as a standard `Pipeline`.
  *
  * Input contract: a DataFrame with a `text` column and a double
  * `label` column (0/1). Scoring adds `prediction`/`probability`.
  */
object SentimentPipeline {

  def build(numFeatures: Int = 1 << 16, regParam: Double = 0.01): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens")
      .setPattern("\\W+").setToLowercase(true)
    val remover = new StopWordsRemover()
      .setInputCol("tokens").setOutputCol("filtered")
    val tf = new HashingTF()
      .setInputCol("filtered").setOutputCol("tf")
      .setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setRegParam(regParam).setMaxIter(50)
    new Pipeline().setStages(Array(tokenizer, remover, tf, idf, lr))
  }

  def train(labeled: DataFrame, numFeatures: Int = 1 << 16): PipelineModel =
    build(numFeatures).fit(labeled)

  def score(model: PipelineModel, docs: DataFrame): DataFrame =
    model.transform(docs)

  /** Area under ROC on a labeled holdout. */
  def auc(model: PipelineModel, holdout: DataFrame): Double =
    new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .evaluate(model.transform(holdout))
}
