package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, DocOps}

/** Two-pass Misra–Gries heavy hitters: the output must be EXACTLY the
  * brute-force `GROUP BY term HAVING cnt >= ceil(minShare * n)` — the
  * sketch may only prune, never change the answer. */
class HeavyHitterSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: org.apache.spark.sql.DataFrame, minShare: Double) = {
    val toks = docs.select(explode(DedupOps.tokens(col("text"))).as("term"))
    val n = toks.count()
    toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(n * minShare).toLong)
      .select(col("term"), col("cnt"),
        round(col("cnt") / lit(n.toDouble), 6).as("share"))
      .as[(String, Long, Double)].collect().toSet
  }

  test("equals brute force on an adversarial stream (vocab >> k)") {
    // k = ceil(1/0.02) = 50 counters; 5000 distinct singleton terms per
    // the whole corpus force constant decrement-all churn, while three
    // planted heavies sit just above / at / below the threshold.
    val n = 5000 + 160 + 120 + 90 // singletons + heavy + edge + light
    val minShare = 0.02 // threshold = ceil(0.02 * 5370) = 108
    val words =
      (0 until 5000).map(i => s"junk$i") ++
        Seq.fill(160)("heavy") ++ Seq.fill(120)("edge") ++
        Seq.fill(90)("light")
    // shuffle deterministically so heavies interleave with junk
    val mixed = new scala.util.Random(7).shuffle(words)
    val docs = mixed.grouped(100).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = DocOps.heavyHitterTerms(docs, minShare)
      .as[(String, Long, Double)].collect().toSet
    val exp = brute(docs, minShare)
    assert(exp.map(_._1) == Set("heavy", "edge"), exp.toString)
    assert(got == exp, s"got=$got exp=$exp")
  }

  test("partition-layout independent (MG merge order cannot leak)") {
    val docs = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) "alpha beta alpha" else s"noise$i x$i"))
      .toSeq.toDF("doc_id", "text")
    val a = DocOps.heavyHitterTerms(docs, 0.05)
      .as[(String, Long, Double)].collect().toSet
    val b = DocOps.heavyHitterTerms(docs.repartition(17), 0.05)
      .as[(String, Long, Double)].collect().toSet
    val c = DocOps.heavyHitterTerms(docs.coalesce(1), 0.05)
      .as[(String, Long, Double)].collect().toSet
    assert(a == b && b == c, s"a=$a b=$b c=$c")
    assert(a == brute(docs, 0.05))
  }

  test("single partition, vocab under k: pure passthrough to exact") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = DocOps.heavyHitterTerms(docs.coalesce(1), 0.5)
      .as[(String, Long, Double)].collect().toSet
    // n=6, threshold = ceil(3.0) = 3 → only "a"
    assert(got == Set(("a", 3L, 0.5)))
  }

  test("cmsUserEstimates: width-1 total collision, wide sketch exact") {
    import java.sql.Timestamp
    var id = 0L
    def ev(u: Long, n: Int) = (1 to n).map { _ =>
      id += 1
      (id, Timestamp.valueOf("2024-03-01 10:00:00"), u, "view", 1.0, "{}")
    }
    // users 1,2,3 with counts 3,2,1 (N = 6)
    val events = (ev(1, 3) ++ ev(2, 2) ++ ev(3, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // width 1: every key collides in every row → est = N for everyone
    // (the sketch never underestimates; the min can't dodge a full
    // collision)
    val tiny = graft.ops.EventOps.cmsUserEstimates(events, width = 1)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("exact"), r.getAs[Long]("cms_est"),
          r.getAs[Long]("overestimate")))).toMap
    assert(tiny == Map(1L -> ((3L, 6L, 3L)), 2L -> ((2L, 6L, 4L)),
      3L -> ((1L, 6L, 5L))), tiny.toString)
    // a 65536-wide sketch over 3 keys: no collisions, estimates exact
    val wide = graft.ops.EventOps.cmsUserEstimates(events, width = 65536)
      .collect().map(r => r.getAs[Long]("overestimate")).toSeq
    assert(wide == Seq(0L, 0L, 0L), wide.toString)
  }
}
