package graft

import java.sql.Timestamp
import graft.ops.EventOps

/** Sweep-line peak concurrency: hand-checked overlap fixture pinning
  * the half-open tie rule (a session ending exactly when another
  * starts does NOT overlap it) and the cross-midnight carry the
  * two-level open(day)+intra form exists for. */
class PeakConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("peak counts overlapping sessions; end==start does not overlap") {
    // gap 30min. Sessions (start, end_ex = last event + 30min):
    //   A: [10:00, 10:40)  (events 10:00, 10:10)
    //   B: [10:20, 10:50)
    //   D: [10:40, 11:10)  — starts at the INSTANT A closes
    //   E: [23:50, 00:20 next day)
    //   F: [00:05, 00:35) on day 2
    val events = Seq(
      (1L, t("2024-03-01 10:00:00"), "A"),
      (2L, t("2024-03-01 10:10:00"), "A"),
      (3L, t("2024-03-01 10:20:00"), "B"),
      (4L, t("2024-03-01 10:40:00"), "D"),
      (5L, t("2024-03-01 23:50:00"), "E"),
      (6L, t("2024-03-02 00:05:00"), "F")
    ).toDF("event_id", "ts", "user_id")
    val got = EventOps.peakConcurrency(events)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    // day 1: A+B overlap → 2; at 10:40 A's −1 sorts before D's +1, so
    // the A/B/D instant never reaches 3 (half-open semantics)
    assert(got("2024-03-01") == (2L, 4L), got.toString)
    // day 2 opens with E still live (ends 00:20): E+F overlap → 2,
    // but only F STARTED on day 2 — the 2 proves the open-carry
    assert(got("2024-03-02") == (2L, 1L), got.toString)
  }

  test("a session contained in another is counted while open") {
    val events = Seq(
      (1L, t("2024-03-01 08:00:00"), "U"),
      (2L, t("2024-03-01 09:30:00"), "U"), // second U session (gap 90m)
      (3L, t("2024-03-01 09:40:00"), "V"),
      (4L, t("2024-03-01 09:45:00"), "W")
    ).toDF("event_id", "ts", "user_id")
    val got = EventOps.peakConcurrency(events)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    // U2 [09:30,10:00), V [09:40,10:10), W [09:45,10:15): all three
    // open at 09:45; U1 [08:00,08:30) never overlaps anything
    assert(got("2024-03-01") == (3L, 4L), got.toString)
  }
}
