package graft

import org.apache.spark.sql.functions._
import graft.ops.DocOps

/** Winnowed rolling-hash fingerprints: agreement with a direct Scala
  * reference implementation, the winnowing guarantee (every w-window
  * contributes a selection), and shared-substring overlap behavior. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 5
  private val w = 4

  /** Direct reference implementation of the same scheme. */
  private def reference(text: String): Set[(Long, Long)] = {
    val t = text.toLowerCase.replaceAll("[^a-z0-9 ]", "")
      .replaceAll("\\s+", " ")
    if (t.length < k) return Set.empty
    val M = 2147483647L
    val codes = t.map(_.toLong)
    val hashes = (0 to t.length - k).map { i =>
      (0 until k).map(j =>
        codes(i + j) * DocOps.polyPow(k - 1 - j)).sum % M
    }
    (w - 1 until hashes.length).map { tEnd =>
      // rightmost minimum of the window ending at tEnd
      val window = (tEnd - w + 1 to tEnd)
      val minH = window.map(hashes).min
      val pos = window.filter(i => hashes(i) == minH).max
      (pos.toLong, hashes(pos))
    }.toSet
  }

  private def engine(rows: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] =
    DocOps.winnowedFingerprints(
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text"))), k, w)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("matches the direct reference implementation") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "Spark splits DATA across partitions; windows slide!",
      3L -> "aaaaa aaaaa aaaaa", // degenerate repeats
      4L -> "tiny") // below k after normalization -> no fingerprints
    val got = engine(docs)
    docs.foreach { case (id, text) =>
      val want = reference(text)
      assert(got.getOrElse(id, Set.empty) == want,
        s"doc $id: got ${got.getOrElse(id, Set.empty)} want $want")
    }
  }

  test("fused expression matches the relational formulation on real docs") {
    for ((kk, ww) <- Seq((5, 4), (12, 8))) {
      val docs = Tables.documents(spark, sf0)
      val fused = DocOps.winnowedFingerprints(docs, kk, ww)
      val relational = DocOps.winnowedFingerprintsRelational(docs, kk, ww)
      assert(fused.count() > 0)
      assert(fused.exceptAll(relational).isEmpty &&
        relational.exceptAll(fused).isEmpty, s"k=$kk w=$ww diverged")
    }
  }

  test("fused winnow participates in whole-stage codegen") {
    val q = DocOps.winnowedFingerprints(Tables.documents(spark, sf0))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_winnow"), plan)
    // the expression evaluates inside a codegen'd stage (Generate
    // explode sits above it; no interpreted HOF projection)
    assert(!plan.contains("Window"), s"fused path must not need windows:\n$plan")
  }

  test("documents sharing a long substring share fingerprints") {
    val shared = "winnowing selects the same fingerprints from shared text"
    val got = engine(Seq(
      10L -> s"prefix one $shared suffix alpha",
      11L -> s"completely different opening $shared and another ending"))
    val fps10 = got(10L).map(_._2)
    val fps11 = got(11L).map(_._2)
    assert((fps10 & fps11).size >= 3,
      s"expected shared fingerprints, got ${fps10 & fps11}")
  }

  test("coverage guarantee: selections at most w apart") {
    val got = engine(Seq(20L ->
      "a reasonably long document so that many windows exist in sequence"))
    val positions = got(20L).map(_._1).toSeq.sorted
    positions.sliding(2).foreach {
      case Seq(a, b) => assert(b - a <= w, s"gap $a -> $b exceeds w=$w")
      case _ =>
    }
  }
}
