package graft

import java.sql.Timestamp
import graft.ops.EventOps

/** cohortRetention: the (cohort_day, day_offset, n_users) triangle on
  * a planted fixture, plus structural invariants. */
class CohortRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int = 10) =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("counts users per (cohort day, offset); repeats within a day collapse") {
    val events = Seq(
      // user 1: first day 1, returns day 2 and day 4 (twice on day 2)
      (1L, ts(1)), (1L, ts(2)), (1L, ts(2, 15)), (1L, ts(4)),
      // user 2: same cohort (day 1), never returns
      (2L, ts(1)),
      // user 3: cohort day 2, returns day 3
      (3L, ts(2)), (3L, ts(3)),
    ).toDF("user_id", "ts")
    val got = EventOps.cohortRetention(events)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2L, // users 1 and 2 enter
      ("2024-01-01", 1L) -> 1L, // user 1 back on day 2 (once, not twice)
      ("2024-01-01", 3L) -> 1L, // user 1 back on day 4
      ("2024-01-02", 0L) -> 1L, // user 3 enters
      ("2024-01-02", 1L) -> 1L, // user 3 back on day 3
    ), got.toString)
  }

  test("invariants on real data: offset-0 rows partition the user base " +
      "and no offset exceeds its cohort's size") {
    val events = Tables.events(spark, sf0)
    val rows = EventOps.cohortRetention(events).collect()
    val day0 = rows.filter(_.getLong(1) == 0L)
    // every user enters exactly one cohort, on their first day
    val nUsers = events.select("user_id").distinct().count()
    assert(day0.map(_.getLong(2)).sum == nUsers)
    // retention never exceeds the cohort's size
    val size = day0.map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) <= size(r.getDate(0).toString),
        s"offset ${r.getLong(1)} of cohort ${r.getDate(0)} exceeds entry count")
    }
  }
}
