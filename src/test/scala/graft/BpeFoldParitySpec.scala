package graft

import org.apache.spark.sql.functions._
import graft.ops.DocOps

/** r17: BPE merge application moved from the row-level
  * window/join chain ([[DocOps.bpeApplyMerge]], kept as baseline) to
  * the per-word array fold ([[DocOps.bpeMergeFold]] /
  * [[DocOps.bpeApplyMergesArr]]). This spec pins the two to identical
  * symbol sequences on adversarial self-overlap cases — the
  * greedy-leftmost-non-overlap rule is exactly where a naive rewrite
  * would diverge ("aaa" must merge once, not twice). */
class BpeFoldParitySpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("aaa", "aaaa", "aaaaa", "banana", "abab",
    "aa", "a", "bb", "abcabc", "xaax", "nanana")

  /** The OLD bpeApplyMerges composition: explode to rows, chain the
    * row-level merge, collect back to ordered sequences. */
  private def rowForm(merges: Seq[(String, String)])
      : Map[String, Seq[String]] = {
    var seqs = words.toDF("word").select(col("word"),
        posexplode(split(col("word"), "")).as(Seq("pos", "sym")))
      .withColumn("pos", col("pos").cast("long"))
      .localCheckpoint()
    for ((a, b) <- merges)
      seqs = DocOps.bpeApplyMerge(seqs, a, b).localCheckpoint()
    seqs.orderBy("word", "pos").collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) => w -> rows.map(_.getString(2)).toSeq }
  }

  private def foldForm(merges: Seq[(String, String)])
      : Map[String, Seq[String]] =
    DocOps.bpeApplyMergesArr(words.toDF("word"), merges)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap

  test("self-overlapping merge (a,a): fold == row chain") {
    val m = Seq(("a", "a"))
    assert(foldForm(m) == rowForm(m))
  }

  test("chained merges incl. merged-symbol pairs: fold == row chain") {
    val m = Seq(("a", "a"), ("aa", "a"), ("n", "a"), ("b", "na"))
    assert(foldForm(m) == rowForm(m))
  }

  test("no-op merge leaves words intact") {
    val m = Seq(("q", "q"))
    val f = foldForm(m)
    assert(f("banana") == Seq("b", "a", "n", "a", "n", "a"))
    assert(f("a") == Seq("a"))
  }
}
