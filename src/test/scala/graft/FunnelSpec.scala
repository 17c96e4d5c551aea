package graft

import java.sql.Timestamp
import graft.ops.EventOps

/** conversionFunnel: strict-after milestone ordering on planted
  * sequences. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("funnel counts only strictly-ordered view -> click -> purchase") {
    val events = Seq(
      // user 1 converts fully in order
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
      // user 2: click BEFORE the first view — not a click conversion
      (2L, "click", ts(0)), (2L, "view", ts(5)),
      // user 3: purchase before the click — purchase must not count
      (3L, "view", ts(0)), (3L, "purchase", ts(2)), (3L, "click", ts(4)),
      // user 4: view only
      (4L, "view", ts(0)),
      // user 5: no view at all — outside the funnel entirely
      (5L, "click", ts(1)), (5L, "purchase", ts(2)),
    ).toDF("user_id", "event_type", "ts")
    val row = EventOps.conversionFunnel(events).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[Long]("n_viewed") == 4L, r.toString)
    assert(r.getAs[Long]("n_clicked") == 2L, r.toString) // users 1 and 3
    assert(r.getAs[Long]("n_purchased") == 1L, r.toString) // user 1 only
  }

  test("same-timestamp milestones do not count (strict ordering)") {
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(0)), (1L, "purchase", ts(0)),
    ).toDF("user_id", "event_type", "ts")
    val r = EventOps.conversionFunnel(events).collect().head
    assert(r.getAs[Long]("n_viewed") == 1L)
    assert(r.getAs[Long]("n_clicked") == 0L)
    assert(r.getAs[Long]("n_purchased") == 0L)
  }
}
