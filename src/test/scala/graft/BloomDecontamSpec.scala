package graft

import org.apache.spark.sql.functions._
import graft.ops.DocOps

/** Bloom-filter decontamination: no false negatives (the Bloom
  * guarantee), bounded over-drop, and the audit row's invariants —
  * driven on real sf0.001 documents so the split buckets and
  * fingerprints are the production ones. */
class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0/documents.parquet")

  /** Real docs plus planted exact leaks: for every 10th EVAL doc, a
    * train-side copy of its text under a fresh id in a train bucket.
    * Planting must follow the bucket rule, so pick new ids whose
    * knuth bucket lands < 90 (re-id by trial offset, driver-side over
    * the tiny eval sample — test scaffolding only). */
  private lazy val planted: (org.apache.spark.sql.DataFrame, Long) = {
    val splits = DocOps.datasetSplits(docs)
    val evalTexts = docs.join(splits.filter(col("split") =!= "train"), "doc_id")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
    assert(evalTexts.nonEmpty, "no eval docs to plant from")
    def trainId(seed: Long): Long = {
      // same arithmetic as DocOps.knuthHash32
      def bucket(id: Long): Long = {
        val a = ((id % 4294967296L) + 4294967296L) % 4294967296L
        val hi = a / 65536L; val lo = a % 65536L
        ((hi * 2654435761L % 65536L * 65536L + lo * 2654435761L)
          % 4294967296L + 4294967296L) % 4294967296L % 100L
      }
      Iterator.from(0).map(i => 5000000L + seed * 1000L + i)
        .find(id => bucket(id) < 90L).get
    }
    val copies = evalTexts.zipWithIndex.map { case (r, i) =>
      (trainId(i.toLong), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    (docs.unionByName(copies), evalTexts.length.toLong)
  }

  test("no false negatives: every planted train copy of an eval text is dropped") {
    val (withLeaks, nPlanted) = planted
    val kept = DocOps.bloomDecontaminate(withLeaks)
    val keptLeaks = kept.filter(col("doc_id") >= 5000000L).count()
    assert(nPlanted > 0)
    assert(keptLeaks == 0L,
      s"$keptLeaks of $nPlanted planted leaks survived the bloom filter")
  }

  test("over-drop is bounded: survivors are train docs, and the drop " +
      "beyond true leaks stays within the audit's fp bound") {
    val (withLeaks, _) = planted
    val splits = DocOps.datasetSplits(withLeaks)
    val trainIds = splits.filter(col("split") === "train").select("doc_id")
    val kept = DocOps.bloomDecontaminate(withLeaks)
    // survivors ⊆ train
    assert(kept.join(trainIds, Seq("doc_id"), "left_anti").count() == 0L)
    val nTrain = trainIds.count()
    val nKept = kept.count()
    val audit = DocOps.bloomContaminationAudit(withLeaks).collect().head
    val nExact = audit.getAs[Long]("n_exact_leaks")
    val dropped = nTrain - nKept
    assert(dropped >= nExact, "dropped fewer than the true leak count")
    assert(dropped - nExact <= nTrain * 0.01 * 5 + 20,
      s"over-drop ${dropped - nExact} beyond the audit's fp bound")
  }

  test("audit invariants hold with planted leaks present") {
    val (withLeaks, nPlanted) = planted
    val r = DocOps.bloomContaminationAudit(withLeaks).collect().head
    assert(r.getAs[Long]("n_missed") == 0L, r.toString)
    assert(r.getAs[Boolean]("fp_within_bound"), r.toString)
    assert(r.getAs[Long]("n_exact_leaks") >= nPlanted, r.toString)
    assert(r.getAs[Long]("n_train") > 0L && r.getAs[Long]("n_eval") > 0L)
  }

  test("oversized eval split is refused (driver-memory contract)") {
    val e = intercept[IllegalArgumentException] {
      DocOps.bloomDecontaminate(docs, maxBloomItems = 1L)
    }
    assert(e.getMessage.contains("maxBloomItems"))
  }
}
