package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ml.SequenceMining

/** PrefixSpan sequence mining: gapped containment on a planted
  * fixture (the capability contiguous path counting cannot express)
  * plus the containment-audit invariants. */
class SequenceMiningSpec extends SparkSpec {
  import spark.implicits._

  private def e(id: Long, u: Long, t: String, typ: String) =
    (id, Timestamp.valueOf(t), u, typ, 1.0, "{}")
  // one calendar week (2024-03-04 is a Monday); two user journeys:
  //   u1: a, x, b   (a>b only as a GAPPED subsequence)
  //   u2: a, b      (contiguous)
  private lazy val events = Seq(
    e(1, 1, "2024-03-04 10:00:00", "a"),
    e(2, 1, "2024-03-04 11:00:00", "x"),
    e(3, 1, "2024-03-04 12:00:00", "b"),
    e(4, 2, "2024-03-05 10:00:00", "a"),
    e(5, 2, "2024-03-05 11:00:00", "b"),
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("frequentEventSequences: gapped a>b found in BOTH journeys " +
      "where contiguous counting sees one") {
    val mined = SequenceMining.frequentEventSequences(events,
      minSupport = 0.9, maxLen = 2).collect()
      .map(r => r.getAs[String]("pattern") -> r.getAs[Long]("n_journeys"))
      .toMap
    // only patterns in >= 90% of the 2 journeys survive: a, b, and
    // the gapped a>b (u1 contains it as a subsequence THROUGH x)
    assert(mined == Map("a" -> 2L, "b" -> 2L, "a>b" -> 2L), mined.toString)
  }

  test("prefixspanContiguousAudit: invariants hold and count the " +
      "frequent contiguous pairs exactly") {
    val row = SequenceMining.prefixspanContiguousAudit(events,
      minSupport = 0.5).collect().head
    // contiguous pairs: a>x (1 journey), x>b (1), a>b (1) — all at or
    // above the 0.5 * 2 = 1 journey threshold
    assert(row.getAs[Long]("n_contig_frequent") == 3L, row.toString)
    assert(row.getAs[Long]("n_missing") == 0L, row.toString)
    assert(row.getAs[Boolean]("freq_bounds_ok"), row.toString)
  }
}
