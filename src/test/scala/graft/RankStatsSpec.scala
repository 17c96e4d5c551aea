package graft

import graft.ops.{DocOps, EventOps, JoinOps, VectorOps}

/** Round-6 operators: distribution-position windows, robust
  * median/MAD, lexical diversity, length histogram, TPC-H Q13's
  * eager-aggregation rewrite, and embedding norm profiling — planted
  * tiny inputs with hand-computed expectations. (The sf0.01 DuckDB
  * oracle is the volume gate; these pin the SEMANTICS.) */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("dailyTrendByType: exact OLS on planted linear growth") {
    import java.sql.Timestamp
    var id = 0L
    def dayEvents(tpe: String, date: String, count: Int) =
      (1 to count).map { _ =>
        id += 1
        (id, Timestamp.valueOf(s"$date 10:00:00"), 1L, tpe, 1.0, "{}")
      }
    // "grow": counts 2,4,6,8 on consecutive days — slope exactly 2.0;
    // intercept = mean(y) - slope*mean(x); "flat": 5,5 — slope 0;
    // "once": single day — excluded (no trend from one point)
    val events = (
      dayEvents("grow", "2024-01-01", 2) ++ dayEvents("grow", "2024-01-02", 4) ++
      dayEvents("grow", "2024-01-03", 6) ++ dayEvents("grow", "2024-01-04", 8) ++
      dayEvents("flat", "2024-01-01", 5) ++ dayEvents("flat", "2024-01-02", 5) ++
      dayEvents("once", "2024-01-01", 3)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.dailyTrendByType(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("slope_per_day"),
          r.getAs[Double]("intercept")))).toMap
    assert(got.keySet == Set("grow", "flat"), got.toString)
    val (kg, sg, ig) = got("grow")
    assert(kg == 4L && sg == 2.0, got.toString)
    // x for 2024-01-01 is epoch day 19723; mean x = 19724.5, mean y = 5
    assert(math.abs(ig - (5.0 - 2.0 * 19724.5)) < 1e-6, ig.toString)
    assert(got("flat")._2 == 0.0)
  }

  test("dowAnomalies: weekday-seasonal z, zero-variance groups excluded") {
    import java.sql.Timestamp
    var id = 0L
    def dayEvents(date: String, count: Int) = (1 to count).map { _ =>
      id += 1
      (id, Timestamp.valueOf(s"$date 10:00:00"), 1L, "a", 1.0, "{}")
    }
    // five Mondays with counts 10,10,10,10,26: k=5, Σn=66, Σn²=1076,
    // k·Σn²−(Σn)² = 1024 → √=32; z(26) = (5·26−66)/32 = 2.0 exactly
    val mondays = Seq("2024-01-01" -> 10, "2024-01-08" -> 10,
      "2024-01-15" -> 10, "2024-01-22" -> 10, "2024-01-29" -> 26)
    // two Tuesdays with identical counts: zero variance — excluded
    val tuesdays = Seq("2024-01-02" -> 5, "2024-01-09" -> 5)
    val events = (mondays ++ tuesdays).flatMap { case (d, c) => dayEvents(d, c) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.dowAnomalies(events).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("n"), r.getAs[Double]("zscore"),
          r.getAs[Boolean]("is_anomaly")))).toMap
    assert(got.keySet == mondays.map(_._1).toSet,
      s"zero-variance Tuesdays must be excluded: ${got.keySet}")
    assert(got("2024-01-29") == ((26L, 2.0, true)), got.toString)
    assert(got("2024-01-01") == ((10L, -0.5, false)))
    assert(got.values.count(_._3) == 1, "exactly one anomaly planted")
  }

  test("valueEquidepthHistogram: uniform input fills buckets evenly, " +
    "boundary ties go low") {
    val events = (1L to 100L).map(i => (i, 1L, i.toDouble))
      .toDF("event_id", "user_id", "value")
    val got = EventOps.valueEquidepthHistogram(events, buckets = 10)
      .collect().map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("min_value"),
          r.getAs[Double]("max_value")))).toMap
    assert(got.keySet == (0 to 9).toSet, got.toString)
    // 1..100: interior boundaries land between deciles, so each bucket
    // holds ~10 rows and covers a contiguous value run
    assert(got.values.map(_._1).sum == 100L)
    assert(got.values.forall { case (n, _, _) => n >= 9 && n <= 11 }, got.toString)
    assert(got(0)._2 == 1.0 && got(9)._3 == 100.0)
    // contiguity: bucket maxima strictly increase with the bucket id
    val maxes = (0 to 9).map(b => got(b)._3)
    assert(maxes == maxes.sorted, maxes.toString)
    // massive ties: a constant column collapses into bucket 0 only
    // (every comparison against the identical boundary is false)
    val const = (1L to 50L).map(i => (i, 1L, 7.0))
      .toDF("event_id", "user_id", "value")
    val g2 = EventOps.valueEquidepthHistogram(const, buckets = 5)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("n")).toMap
    assert(g2 == Map(0 -> 50L), g2.toString)
  }

  test("valueRankStats: quartiles, percent_rank, cume_dist over a total order") {
    val events = (1L to 8L).map(i => (i, 1L, i.toDouble))
      .toDF("event_id", "user_id", "value")
    val out = EventOps.valueRankStats(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("quartile"), r.getAs[Double]("pct_rank"),
          r.getAs[Double]("cum_dist")))).toMap
    assert(out(1L) == ((1L, 0.0, 0.125)))       // lowest value
    assert(out(8L) == ((4L, 1.0, 1.0)))         // highest value
    assert(out(4L) == ((2L, 0.4286, 0.5)))      // (rank-1)/(n-1) = 3/7, round 4
  }

  test("valueRankStats: ties split deterministically by event_id") {
    val events = Seq((1L, 1L, 5.0), (2L, 1L, 5.0), (3L, 1L, 5.0), (4L, 1L, 5.0))
      .toDF("event_id", "user_id", "value")
    val q = EventOps.valueRankStats(events).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("quartile")).toMap
    assert(q == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("valueMadByType: exact median and MAD") {
    val events = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 100.0),
      (5L, "b", 10.0),
    ).toDF("event_id", "event_type", "value")
    val out = EventOps.valueMadByType(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("med"), r.getAs[Double]("mad"), r.getAs[Long]("n")))).toMap
    // a: median(1,2,3,100) = 2.5; |x-2.5| = 1.5, .5, .5, 97.5 -> median 1.0
    assert(out("a") == ((2.5, 1.0, 4L)))
    assert(out("b") == ((10.0, 0.0, 1L)))
  }

  test("valueMadByTypeApprox: exact columns + sketch agreement flag") {
    // Odd group sizes so the exact (interpolated) median IS an
    // element — percentile_approx returns elements, and the audit
    // contract tolerates 5%, not the half-gap interpolation error a
    // 4-row group would show. a: median(1..9)=5, deviations
    // 4,3,2,1,0,1,2,3,4 -> MAD 2; outlier type b: median of
    // (10,10,1000)=10, deviations 0,0,990 -> MAD 0.
    val events = Seq(
      (1L, "b", 10.0), (2L, "b", 10.0), (3L, "b", 1000.0)) ++
      (1 to 9).map(i => (10L + i, "a", i.toDouble))
    val df = events.toDF("event_id", "event_type", "value")
    val out = EventOps.valueMadByTypeApprox(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Long]("n"), r.getAs[Boolean]("within_tol")))).toMap
    assert(out("a") == ((5.0, 2.0, 9L, true)), out)
    assert(out("b") == ((10.0, 0.0, 3L, true)), out)
  }

  test("valueMadByTypeApprox: rank gate holds on a heavy-tailed group " +
      "where a 5%-value tolerance would flip") {
    // Geometric values: adjacent ranks differ 10× in value, so ANY
    // legal sketch answer fails a relative-VALUE comparison against
    // the interpolated exact median — the ADVICE r12 spurious-red
    // shape. The rank gate must stay true.
    val heavy = (0 to 8).map(i => (i.toLong, "h", math.pow(10.0, i)))
      .toDF("event_id", "event_type", "value")
    val out = EventOps.valueMadByTypeApprox(heavy).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Boolean]("within_tol")).toMap
    assert(out == Map("h" -> true), out)
    // and the gate is not vacuous: a forged "median" at the group max
    // has strictly-below count 8 of 9, over the allowed ceiling
    // floor((0.5 + ε)·9) + 1 = 5 — the audit arithmetic rejects it
    val n = 9.0
    val ltForged = 8.0 // values strictly below 1e8 in the fixture
    assert(ltForged > math.floor((0.5 + 1e-4) * n) + 1.0)
  }

  test("valueMadByTypeApproxOnly: production columns match the audit's sketch") {
    // The production path is the audit's own approx subtree: same
    // estimates, plus n — and on a group smaller than the sketch
    // accuracy the GK answer is exact, so the columns are checkable
    // against hand-traced medians-of-elements.
    val df = ((1 to 9).map(i => (i.toLong, "a", i.toDouble)) ++
      Seq((20L, "b", 10.0), (21L, "b", 10.0), (22L, "b", 1000.0)))
      .toDF("event_id", "event_type", "value")
    val got = EventOps.valueMadByTypeApproxOnly(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("med_a"), r.getAs[Double]("mad_a"),
          r.getAs[Long]("n")))).toMap
    assert(got == Map("a" -> ((5.0, 2.0, 9L)), "b" -> ((10.0, 0.0, 3L))), got)
    assert(EventOps.valueMadByTypeApprox(df).collect()
      .forall(_.getAs[Boolean]("within_tol")))
  }

  test("woeValueBins: hand-traced WOE/IV, one-sided bins excluded") {
    // bin 0 (values < 10): 2 purchases, 2 views; bin 1: 1 purchase,
    // 3 views; bin 2: purchases only → excluded (no finite WOE).
    // totals over EMITTABLE+excluded: pos 4, neg 5.
    val events = Seq(
      (1L, "purchase", 5.0), (2L, "purchase", 6.0),
      (3L, "view", 7.0), (4L, "view", 8.0),
      (5L, "purchase", 15.0), (6L, "view", 15.0),
      (7L, "view", 16.0), (8L, "view", 17.0),
      (9L, "purchase", 25.0),
    ).toDF("event_id", "event_type", "value")
    val got = EventOps.woeValueBins(events).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Double]("woe"), r.getAs[Double]("iv_term")))).toMap
    // bin0: woe = ln((2·5)/(4·2)) = ln(1.25) = 0.223144;
    //       iv = (2/4 − 2/5)·ln(1.25) = 0.1·0.2231436 = 0.022314
    // bin1: woe = ln((1·5)/(4·3)) = ln(5/12) = −0.875469;
    //       iv = (0.25 − 0.6)·(−0.8754687) = 0.306414
    assert(got == Map(
      0L -> ((2L, 2L, 0.223144, 0.022314)),
      1L -> ((1L, 3L, -0.875469, 0.306414))), got.toString)
    assert(!got.contains(2L), got.toString)
  }

  test("valueOutliersRobust: the MAD z flags the spike; zero-MAD types excluded") {
    // type a: 1..9 + a 105 spike → med 5.5, deviations sorted
    // 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,99.5 → MAD 2.5;
    // rz(105) = 99.5/2.5 = 39.8 — the ONLY |rz| > 8.
    // type b: constant 10s + one 50 → MAD 0 → excluded entirely
    // (even the 50: a zero-spread type has no robust scale, documented).
    val events = ((1 to 9).map(i => (i.toLong, "a", i.toDouble)) :+
      ((10L, "a", 105.0))) ++
      Seq((21L, "b", 10.0), (22L, "b", 10.0), (23L, "b", 10.0),
        (24L, "b", 50.0))
    val got = EventOps.valueOutliersRobust(events.toDF(
      "event_id", "event_type", "value")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("robust_z")))
      .toSet
    assert(got == Set((10L, 39.8)), got)
  }

  test("ttrBySource: distinct-over-total token ratio, case-folded") {
    val docs = Seq(
      (1L, "a b a b", "s1"),    // 2 distinct / 4 tokens = 0.5
      (2L, "A a x y", "s1"),    // lowercased: 3 distinct / 4 = 0.75
      (3L, "w w w w", "s2"),    // 1 / 4 = 0.25
    ).toDF("doc_id", "text", "source")
    val out = DocOps.ttrBySource(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("avg_ttr"), r.getAs[Long]("docs")))).toMap
    assert(out("s1") == ((0.625, 2L)))  // avg(0.5, 0.75)
    assert(out("s2") == ((0.25, 1L)))
  }

  test("doclenHistogram: fixed-width buckets with lo edge") {
    val docs = Seq((1L, "s1", 0L), (2L, "s1", 99L), (3L, "s1", 100L),
      (4L, "s2", 250L)).toDF("doc_id", "source", "n_chars")
    val out = DocOps.doclenHistogram(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("lo")))).toMap
    assert(out(("s1", 0L)) == ((2L, 0L)))
    assert(out(("s1", 1L)) == ((1L, 100L)))
    assert(out(("s2", 2L)) == ((1L, 200L)))
  }

  test("tpchQ13: zero-order customers land in the c_count=0 bin") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "5-LOW"), (11L, 1L, "5-LOW"),
      (12L, 2L, "1-URGENT"), // filtered out -> customer 2 has 0 orders
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = JoinOps.tpchQ13(customer, orders).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    assert(out == Map(0L -> 2L, 2L -> 1L))
  }

  test("normStatsByLabel: exact norms on planted vectors") {
    val emb = Seq(
      (1L, Seq(3.0f, 4.0f), 0),   // norm 5
      (2L, Seq(0.0f, 0.0f), 0),   // norm 0 — the degenerate case to surface
      (3L, Seq(6.0f, 8.0f), 1),   // norm 10
    ).toDF("vec_id", "embedding", "label")
    val out = VectorOps.normStatsByLabel(emb).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("avg_norm"),
          r.getAs[Double]("min_norm"), r.getAs[Double]("max_norm")))).toMap
    assert(out(0) == ((2L, 2.5, 0.0, 5.0)))
    assert(out(1) == ((1L, 10.0, 10.0, 10.0)))
  }

  test("userDayStreaks: gaps-and-islands on planted day grids") {
    import java.sql.Timestamp
    def ev(id: Long, user: Long, date: String) =
      (id, Timestamp.valueOf(s"$date 10:00:00"), user, "view", 1.0, "{}")
    // user 1: 1,2,3 then 5,6 → streaks 3+2, longest 3, 5 active days;
    // two same-day events must collapse to ONE active day.
    // user 2: isolated days 1, 3, 7 → three length-1 streaks.
    // user 3: single day → one streak of 1.
    val events = Seq(
      ev(1, 1, "2024-01-01"), ev(2, 1, "2024-01-01"), ev(3, 1, "2024-01-02"),
      ev(4, 1, "2024-01-03"), ev(5, 1, "2024-01-05"), ev(6, 1, "2024-01-06"),
      ev(7, 2, "2024-01-01"), ev(8, 2, "2024-01-03"), ev(9, 2, "2024-01-07"),
      ev(10, 3, "2024-02-01"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.userDayStreaks(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("longest_streak"), r.getAs[Long]("active_days"),
          r.getAs[Long]("n_streaks")))).toMap
    assert(got == Map(1L -> ((3L, 5L, 2L)), 2L -> ((1L, 3L, 3L)),
      3L -> ((1L, 1L, 1L))), got.toString)
  }

  test("kruskalWallisDailyCounts: exact H on a tie-free two-group split") {
    import java.sql.Timestamp
    var id = 0L
    def dayEvents(tpe: String, date: String, count: Int) =
      (1 to count).map { _ =>
        id += 1
        (id, Timestamp.valueOf(s"$date 10:00:00"), 1L, tpe, 1.0, "{}")
      }
    // daily counts a: 1,2,3  b: 4,5,6 — pooled ranks are exactly
    // 1..6 (no ties): R_a = 6, R_b = 15, N = 6, D = 3 →
    // H = 12/(6·7)·(36/3 + 225/3) − 3·7 = 87·2/7 − 21 = 27/7
    val events = (
      dayEvents("a", "2024-01-01", 1) ++ dayEvents("a", "2024-01-02", 2) ++
      dayEvents("a", "2024-01-03", 3) ++
      dayEvents("b", "2024-01-01", 4) ++ dayEvents("b", "2024-01-02", 5) ++
      dayEvents("b", "2024-01-03", 6)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.kruskalWallisDailyCounts(events).collect().head
    assert(r.getAs[Long]("n_types") == 2L && r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("n_total") == 6L && r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("kw_h") == math.rint(27.0 / 7.0 * 1e6) / 1e6, r)
  }

  test("kruskalWallisDailyCounts: all-tied observations yield NULL H") {
    import java.sql.Timestamp
    var id = 0L
    def ev(date: String) = { id += 1
      (id, Timestamp.valueOf(s"$date 10:00:00"), 1L, "a", 1.0, "{}") }
    // one type, one event per day — every pooled observation ties at
    // 1, the correction denominator hits zero, no test statistic
    val events = Seq(ev("2024-01-01"), ev("2024-01-02"), ev("2024-01-03"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.kruskalWallisDailyCounts(events).collect().head
    assert(r.isNullAt(r.fieldIndex("kw_h")), r)
  }

  test("kendallTauTypePairs: perfect inversion, tie-adjusted pair, NULLs") {
    import java.sql.Timestamp
    var id = 0L
    def dayEvents(tpe: String, date: String, count: Int) =
      (1 to count).map { _ =>
        id += 1
        (id, Timestamp.valueOf(s"$date 10:00:00"), 1L, tpe, 1.0, "{}")
      }
    // a: 1,2,3,4  b: 4,3,2,1  c: 1,1,2,2 over the same four days.
    // (a,b): all 6 day pairs discordant → tau = −1.
    // (a,c): cmd = 4, ty = 2 → 4/(√6·√4) = 0.816497; (b,c) mirrors.
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    val counts = Map("a" -> Seq(1, 2, 3, 4), "b" -> Seq(4, 3, 2, 1),
      "c" -> Seq(1, 1, 2, 2))
    val events = counts.toSeq.flatMap { case (t, cs) =>
      days.zip(cs).flatMap { case (d, c) => dayEvents(t, d, c) }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.kendallTauTypePairs(events).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n_day_pairs"), r.getAs[Long]("conc_minus_disc"),
          r.getAs[Double]("tau_b")))).toMap
    assert(got(("a", "b")) == ((6L, -6L, -1.0)), got)
    assert(got(("a", "c")) == ((6L, 4L, 0.816497)), got)
    assert(got(("b", "c")) == ((6L, -4L, -0.816497)), got)
  }

  test("chiSquareTypeDow: exact chi-square and Cramér's V on a 2×2 table") {
    import java.sql.Timestamp
    var id = 0L
    def dayEvents(tpe: String, date: String, count: Int) =
      (1 to count).map { _ =>
        id += 1
        (id, Timestamp.valueOf(s"$date 10:00:00"), 1L, tpe, 1.0, "{}")
      }
    // Mon/Tue × a/b with counts 30/10 and 10/30: all marginals 40,
    // N = 80, Σ o²/(r·c) = 2000/1600 = 1.25 → χ² = 80·0.25 = 20,
    // V = √(0.25/1) = 0.5
    val events = (
      dayEvents("a", "2024-01-01", 30) ++ dayEvents("a", "2024-01-02", 10) ++
      dayEvents("b", "2024-01-01", 10) ++ dayEvents("b", "2024-01-02", 30)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.chiSquareTypeDow(events).collect().head
    assert(r.getAs[Long]("n_types") == 2L && r.getAs[Long]("n_dows") == 2L)
    assert(r.getAs[Long]("n_total") == 80L && r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 20.0, r)
    assert(r.getAs[Double]("cramers_v") == 0.5, r)
  }

  test("chiSquareTypeDow: single-type table has zero chi2 and NULL V") {
    import java.sql.Timestamp
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 10:00:00"), 1L, "a", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.chiSquareTypeDow(events).collect().head
    assert(r.getAs[Double]("chi2") == 0.0, r)
    assert(r.isNullAt(r.fieldIndex("cramers_v")), r)
  }

  test("winsorizedValueStats clamps outliers into the [p05, p95] band") {
    // 21 values 0..20: p05 = 1.0, p95 = 19.0 (quantile_cont on a
    // 0..20 lattice) → 0 clamps up to 1, 20 clamps down to 19; mean
    // of the winsorized set = (1 + 1..19 + 19)/21 = 10.0 exactly
    val events = (0 to 20).map(i => (i.toLong, "a", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val r = EventOps.winsorizedValueStats(events).collect().head
    assert(r.getAs[Long]("n") == 21L)
    assert(r.getAs[Double]("w_mean") == 10.0)
    assert(r.getAs[Long]("n_lo") == 1L && r.getAs[Long]("n_hi") == 1L)
  }
}
