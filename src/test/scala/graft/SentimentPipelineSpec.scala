package graft

import graft.ml.SentimentPipeline

/** Smoke test for the reconstructed sentiment pipeline (SURVEY.md §2.9):
  * train on a small synthetic polarized corpus, expect separation. */
class SentimentPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val posWords = Seq("great", "love", "excellent", "wonderful", "happy")
  private val negWords = Seq("terrible", "hate", "awful", "horrible", "sad")

  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val pos = rnd.nextBoolean()
      val words = Seq.fill(8)(
        if (pos) posWords(rnd.nextInt(posWords.size))
        else negWords(rnd.nextInt(negWords.size)))
      val filler = Seq.fill(4)("the quick product arrived today")
      (rnd.shuffle(words ++ filler).mkString(" "), if (pos) 1.0 else 0.0)
    }
  }

  test("TF-IDF + LR separates a polarized corpus (AUC > 0.9)") {
    val train = corpus(200, 1).toDF("text", "label")
    val test = corpus(50, 2).toDF("text", "label")
    val model = SentimentPipeline.train(train, numFeatures = 1 << 12)
    val auc = SentimentPipeline.auc(model, test)
    assert(auc > 0.9, s"AUC $auc")
    val scored = SentimentPipeline.score(model, test)
    assert(scored.columns.contains("prediction"))
  }
}
