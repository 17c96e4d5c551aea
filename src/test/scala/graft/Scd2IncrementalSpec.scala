package graft

import java.sql.Timestamp
import graft.ops.{EventOps, JoinOps}

/** scd2TypeHistory, incrementalDailyStats, dailyOrdersVsEvents:
  * planted fixtures with hand-checked intervals, plus the merge ≡
  * recompute and full-outer zero-fill invariants on real data. */
class Scd2IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int) =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("scd2TypeHistory collapses runs, reopens types, closes intervals") {
    val events = Seq(
      // user 1: A,A,B,A → three islands; B's interval is closed by the
      // SECOND A island's start; last island stays open (null valid_to)
      (1L, 10L, "A", ts(1, 1)), (1L, 11L, "A", ts(1, 2)),
      (1L, 12L, "B", ts(1, 3)), (1L, 13L, "A", ts(1, 4)),
      // user 2: a single open run
      (2L, 20L, "C", ts(2, 1)), (2L, 21L, "C", ts(2, 2)),
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventOps.scd2TypeHistory(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "A", ts(1, 1), Some(ts(1, 3)), 2L),
      (1L, "B", ts(1, 3), Some(ts(1, 4)), 1L),
      (1L, "A", ts(1, 4), None, 1L),
      (2L, "C", ts(2, 1), None, 2L),
    ), got.mkString("\n"))
  }

  test("scd2TypeHistory breaks timestamp ties on event_id") {
    val events = Seq(
      // same ts: event_id order decides the sequence X(1), Y(2), X(3)
      (1L, 1L, "X", ts(1, 1)), (1L, 2L, "Y", ts(1, 1)),
      (1L, 3L, "X", ts(1, 1)),
    ).toDF("user_id", "event_id", "event_type", "ts")
    assert(EventOps.scd2TypeHistory(events).count() == 3)
  }

  test("scd2 intervals tile each user's timeline on real data") {
    val rows = EventOps.scd2TypeHistory(Tables.events(spark, sf0))
      .collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (user, islands) =>
      // exactly one open interval per user, and each closed interval's
      // valid_to equals the next interval's valid_from (no gaps/overlap)
      assert(islands.count(_.isNullAt(3)) == 1, s"user $user open runs")
      val sorted = islands.sortBy(_.getTimestamp(2).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(3) == b.getTimestamp(2),
            s"user $user interval gap at ${a.getTimestamp(3)}")
        case _ =>
      }
    }
  }

  test("incremental merge equals full recompute at every cutoff position") {
    val events = Tables.events(spark, sf0)
    val full = EventOps.incrementalDailyStats(events, "2024-01-16")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getDouble(2))).toMap
    // cutoff before / inside / after the data: empty-delta and
    // empty-base degenerate cases must merge to the same rollup
    for (cut <- Seq("2020-01-01", "2024-01-10", "2030-01-01")) {
      val got = EventOps.incrementalDailyStats(events, cut)
        .collect().map(r => r.getDate(0).toString ->
          (r.getLong(1), r.getDouble(2))).toMap
      assert(got == full, s"cutoff $cut diverged")
    }
    // and the counts agree with the plain daily rollup
    val daily = EventOps.dailyCounts(events).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(full.view.mapValues(_._1).toMap == daily)
  }

  test("dailyOrdersVsEvents zero-fills one-sided days") {
    val orders = Seq(
      (java.sql.Date.valueOf("2024-01-01"), 1L),
      (java.sql.Date.valueOf("2024-01-01"), 2L),
      (java.sql.Date.valueOf("2024-01-03"), 3L),
    ).toDF("o_orderdate", "o_orderkey")
    val events = Seq((1L, ts(1, 5)), (2L, ts(2, 5)))
      .toDF("user_id", "ts")
    val got = JoinOps.dailyOrdersVsEvents(orders, events).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      "2024-01-01" -> (2L, 1L), // both sides
      "2024-01-02" -> (0L, 1L), // events only → orders zero-filled
      "2024-01-03" -> (1L, 0L), // orders only → events zero-filled
    ), got.toString)
  }

  test("cdcApplyChanges: tombstone precedence on a planted changelog, " +
    "merge ≡ recompute at every cutoff position") {
    // cutoff 2024-01-16: days < 16 are base, ≥ 16 delta.
    val log = Seq(
      // A: base upsert, delta delete → absent
      (1L, ts(10, 1), 100L, "view", 1.0),
      (2L, ts(20, 1), 100L, "error", 2.0),
      // B: base delete, delta upsert → present with delta value
      (3L, ts(10, 2), 200L, "error", 3.0),
      (4L, ts(20, 2), 200L, "click", 4.0),
      // C: base-only upsert → survives the merge untouched
      (5L, ts(10, 3), 300L, "purchase", 5.0),
      // D: base-only delete → absent (tombstone retained in base)
      (6L, ts(10, 4), 400L, "error", 6.0),
      // E: two delta changes — later one wins
      (7L, ts(20, 5), 500L, "view", 7.0),
      (8L, ts(21, 5), 500L, "click", 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.cdcApplyChanges(log)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(200L -> 4.0, 300L -> 5.0, 500L -> 8.0), got)

    // on real data, the merged state equals the full recompute no
    // matter where the base/delta boundary falls (incl. empty sides)
    val events = Tables.events(spark, sf0)
    val full = EventOps.cdcApplyChanges(events, "2020-01-01")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getTimestamp(2))).toSet
    for (cut <- Seq("2024-01-10", "2024-01-16", "2030-01-01")) {
      val merged = EventOps.cdcApplyChanges(events, cut)
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getTimestamp(2))).toSet
      assert(merged == full, s"cutoff $cut diverged")
    }
  }

  test("ivmZsetAgg: retraction resurfaces the runner-up min, zero " +
      "multisets vanish, unmatched retract keeps negative state") {
    def e(id: Long, d: Int, u: Long, typ: String, v: Double) =
      (id, ts(d, 10), u, typ, v, "{}")
    val events = Seq(
      // user 1: +5, +7 before the cutoff; retract 5 after → the min
      // must MOVE to 7 (the multiset remembers the runner-up)
      e(1, 10, 1, "view", 5.0), e(2, 11, 1, "view", 7.0),
      e(3, 20, 1, "error", 5.0),
      // user 2: only an unmatched retract → negative z-set state kept,
      // no live extrema
      e(4, 20, 2, "error", 3.0),
      // user 3: +2, +2, −2 → one survivor
      e(5, 10, 3, "view", 2.0), e(6, 11, 3, "view", 2.0),
      e(7, 20, 3, "error", 2.0),
      // user 4: +4 then −4 → zero entry normalizes away entirely
      e(8, 10, 4, "view", 4.0), e(9, 20, 4, "error", 4.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.ivmZsetAgg(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("net_n"), r.getAs[Double]("net_value"),
          Option(r.getAs[Any]("live_min")), Option(r.getAs[Any]("live_max")))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L), got.toString)
    assert(got(1L) == ((1L, 7.0, Some(7.0), Some(7.0))), got.toString)
    assert(got(2L) == ((-1L, -3.0, None, None)), got.toString)
    assert(got(3L) == ((1L, 2.0, Some(2.0), Some(2.0))), got.toString)
    // the delta rule: any cutoff placement gives the full recompute
    for (cut <- Seq("2024-01-01", "2024-01-15", "2024-12-31")) {
      val g = EventOps.ivmZsetAgg(events, cutoff = cut).collect()
        .map(_.toSeq).toSet
      val f = EventOps.ivmZsetAgg(events, cutoff = "2024-06-01").collect()
        .map(_.toSeq).toSet
      assert(g == f, s"cutoff $cut diverged from full recompute")
    }
  }
}
