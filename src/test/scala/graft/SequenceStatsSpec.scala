package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{AggOps, DedupOps, DocOps, EventOps}

/** Round-7 corpus/sequence statistics: span-level dedup, Markov
  * transitions, exact integer-space correlation, Zipf slope, unigram
  * KL — all against small planted fixtures with hand-computable
  * answers. */
class SequenceStatsSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("thetaOverlapAudit: exact-mode sketch algebra equals set algebra") {
    // One week, hand-computed audiences: A = {1,2,3}, B = {2,3,4,5};
    // both = {2,3}, only-A = {1}. Below nominal entries the Theta
    // sketch is a lossless sample, so the intersection/difference
    // estimates must be EXACT and every tolerance flag true.
    def ev(id: Long, day: Int, uid: Long, t: String) =
      (id, Timestamp.valueOf(f"2024-03-0$day 10:00:00"), uid, t, 1.0, "{}")
    val events = Seq(
      ev(1, 4, 1, "purchase"), ev(2, 4, 2, "purchase"),
      ev(3, 5, 3, "purchase"), ev(4, 5, 2, "error"),
      ev(5, 6, 3, "error"), ev(6, 6, 4, "error"),
      ev(7, 7, 5, "error"), ev(8, 7, 9, "view"), // view: filtered out
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.thetaOverlapAudit(events).collect()
    assert(rows.length == 1, rows.mkString(","))
    val r = rows.head
    assert(r.getAs[Long]("n_a_exact") == 3L)
    assert(r.getAs[Long]("n_b_exact") == 4L)
    assert(r.getAs[Long]("n_both_exact") == 2L)
    assert(r.getAs[Boolean]("both_within_tol"))
    assert(r.getAs[Boolean]("only_a_within_tol"))
  }

  test("holtWintersDaily: hand-traced recursion on a planted " +
    "trend+weekday series; under 14 days is empty") {
    // y_t = 10 + t + (3 if weekday index t%7 == 0 else 0) over 21
    // days starting Mon 2024-03-04 — linear trend + one spiky dow.
    def ev(i: Int, day: Int) = {
      val d = java.time.LocalDate.of(2024, 3, 4).plusDays(day)
      (i.toLong, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    val rows = (0 until 21).flatMap { t =>
      val y = 10 + t + (if (t % 7 == 0) 3 else 0)
      (0 until y).map(j => ev(t * 1000 + j, t))
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val got = EventOps.holtWintersDaily(events)
      .orderBy("h").as[(Long, Double)].collect()
    assert(got.length == 7 && got.map(_._1).toSeq == (1L to 7L))
    // reference: the same recursion in plain Scala (same fp op order)
    val ys = (0 until 21).map(t => (10 + t + (if (t % 7 == 0) 3 else 0)).toDouble)
    var l = ys.take(7).sum / 7.0
    var b = (ys.slice(7, 14).sum / 7.0 - l) / 7.0
    var s = ys.take(7).map(_ - l).toArray
    for (t <- 7 until 21) {
      val y = ys(t); val sOld = s(0)
      val lNew = 0.3 * (y - sOld) + 0.7 * (l + b)
      val bNew = 0.1 * (lNew - l) + 0.9 * b
      val sNew = 0.2 * (y - lNew) + 0.8 * sOld
      s = s.drop(1) :+ sNew; l = lNew; b = bNew
    }
    val want = (1 to 7).map(h =>
      BigDecimal(l + h * b + s(h - 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    got.zip(want).foreach { case ((h, f), w) =>
      assert(math.abs(f - w) < 1e-9, s"h=$h got $f want $w") }
    // the trend must show: h=7 forecast well above the last level
    assert(got.last._2 > got.head._2)
    // under two weeks -> empty
    val short = rows.filter(_._2.toLocalDateTime.getDayOfMonth < 15)
    assert(EventOps.holtWintersDaily(short.toDF("event_id", "ts",
      "user_id", "event_type", "value", "props")).count() == 0L)
  }

  test("holtWintersBacktest: perfectly periodic series gives NULL " +
    "improvement; trended series has positive improvement over " +
    "seasonal-naive") {
    def mk(ys: Seq[Int]) = ys.zipWithIndex.flatMap { case (y, t) =>
      val d = java.time.LocalDate.of(2024, 3, 4).plusDays(t)
      (0 until y).map(j =>
        (t * 1000L + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view",
          1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // period-7 exact repeat: seasonal-naive error is 0 → NULL improvement
    val periodic = mk((0 until 21).map(t => 10 + (t % 7)))
    val p = EventOps.holtWintersBacktest(periodic).collect().head
    assert(p.getAs[Long]("n_fit") == 14L)
    assert(p.getAs[Double]("mae_seasonal_naive") == 0.0)
    assert(p.isNullAt(p.fieldIndex("improvement")), p.toString)
    // strong linear trend: HW tracks it, seasonal-naive is 7 behind
    val trended = mk((0 until 28).map(t => 10 + 5 * t))
    val r = EventOps.holtWintersBacktest(trended).collect().head
    assert(r.getAs[Long]("n_fit") == 21L)
    assert(r.getAs[Double]("mae_seasonal_naive") == 35.0) // 7 days × slope 5
    assert(r.getAs[Double]("mae_hw") < 35.0 &&
      r.getAs[Double]("improvement") > 0.5, r.toString)
  }

  test("grangerTypePairs: planted lag-1 dependence flags the causal " +
    "direction, not the reverse") {
    // x_t is a varied deterministic series; y_t = x_{t-1} + (t % 2) —
    // so yesterday's x almost perfectly predicts today's y (tiny
    // parity noise keeps RSS_f > 0), while y barely helps predict x.
    val x = (0 to 20).map(t => (t * 7) % 13 + 1)
    val y = (0 to 20).map(t => if (t == 0) 1 else x(t - 1) + (t % 2))
    def mk(t: Int, typ: String, n: Int, base: Int) = {
      val d = java.time.LocalDate.of(2024, 3, 4).plusDays(t)
      (0 until n).map(j => (base + t * 1000L + j,
        Timestamp.valueOf(s"$d 10:00:00"), 1L, typ, 1.0, "{}"))
    }
    val events = ((0 to 20).flatMap(t => mk(t, "x", x(t), 0)) ++
      (0 to 20).flatMap(t => mk(t, "y", y(t), 10_000_000)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.grangerTypePairs(events).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((Option(r.get(r.fieldIndex("f_stat"))).map(_.toString.toDouble),
          r.getAs[Boolean]("causal_at_f417")))).toMap
    val fwd = got(("y", "x")) // x Granger-causes y
    val rev = got(("x", "y"))
    assert(fwd._2 && fwd._1.get > 4.17, s"forward not causal: $got")
    assert(fwd._1.get > rev._1.getOrElse(0.0),
      s"forward F must dominate reverse: $got")
  }

  test("stationaryTypeDistribution: hand-solvable 2-state chain") {
    // One user alternates a,b,a,b,… → P = [[0,1],[1,0]]; uniform
    // start is already stationary: π = (0.5, 0.5) after any number
    // of iterations.
    def ev(i: Int, t: String) =
      (i.toLong, Timestamp.valueOf(f"2024-03-04 10:${i}%02d:00"), 1L,
        t, 1.0, "{}")
    val alt = (0 until 10).map(i => ev(i, if (i % 2 == 0) "a" else "b"))
    val got = EventOps.stationaryTypeDistribution(
      alt.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 0.5, "b" -> 0.5), got.toString)
    // biased chain: from a always to a except once to b; from b
    // always back to a → stationary mass concentrates on a
    val biased = Seq("a", "a", "a", "a", "b", "a", "a", "a", "a")
      .zipWithIndex.map { case (t, i) => ev(i, t) }
    val g2 = EventOps.stationaryTypeDistribution(
      biased.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")).as[(String, Double)].collect().toMap
    assert(g2("a") > 0.7 && math.abs(g2("a") + g2("b") - 1.0) < 1e-4,
      g2.toString)
  }

  test("oovRateBySource: held-out tokens outside the train vocab " +
    "are counted; train docs excluded from the measurement") {
    // knuthHash32 buckets: pick ids so both splits are non-empty,
    // then verify the rate against a direct recomputation.
    val docs = (0L until 200L).map { i =>
      (i, s"common${i % 5} rare$i", "2024-01-01", s"s${i % 2}", 2, "en")
    }.toDF("doc_id", "text", "created_at", "source", "n_chars", "lang")
    val got = DocOps.oovRateBySource(docs)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    // direct recomputation with the same split rule
    val bucket = pmod(DocOps.knuthHash32(col("doc_id")), lit(100))
    val train = docs.filter(bucket < 90)
    val held = docs.filter(bucket >= 90)
    val vocab = train.select(explode(split(lower(trim(col("text"))),
      "\\s+")).as("tok")).distinct().as[String].collect().toSet
    val direct = held.select(col("source"), col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .as[(String, Long, String)].collect()
      .groupBy(_._1).map { case (src, xs) =>
        src -> ((xs.map(_._2).distinct.length.toLong, xs.length.toLong,
          xs.count(x => !vocab.contains(x._3)).toLong))
      }
    direct.foreach { case (src, (nd, nt, noov)) =>
      val g = got(src)
      assert(g._2 == nd && g._3 == nt && g._4 == noov,
        s"$src: got $g want ($nd, $nt, $noov)")
      // every held-out doc's rare<i> token is OOV by construction
      assert(noov >= nd)
    }
  }

  test("spanDedupStats: first occurrence owns the span; short docs drop") {
    // doc 1 (srcA): 40 tokens -> spans [a0..a19], [b0..b19]
    // doc 2 (srcB): 20 tokens, byte-identical to doc 1's FIRST span
    // doc 3 (srcB): 10 tokens -> no complete span, drops out
    val docs = Seq(
      (1L, words("a", 20) + " " + words("b", 20), "srcA"),
      (2L, words("a", 20), "srcB"),
      (3L, words("c", 10), "srcB")
    ).toDF("doc_id", "text", "source")
    val got = DedupOps.spanDedupStats(docs, k = 20)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("srcA") == ((2L, 2L, 0.0)), got.toString) // owns both
    assert(got("srcB") == ((1L, 0L, 1.0)), got.toString) // pure dup mass
    // ownership is (doc_id, idx)-min, not arrival order: layout change
    // must not flip the owner
    val again = DedupOps.spanDedupStats(docs.repartition(7), k = 20)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again == got, "span ownership depends on partitioning")
  }

  test("eventTransitions: lead is (ts, event_id)-deterministic; " +
    "probabilities are exact per-from-type ratios") {
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // user 1: A B B C ; user 2: A B (same ts for the user-2 pair —
    // event_id must break the tie)
    val events = Seq(
      (1L, t(1), 1L, "A"), (2L, t(2), 1L, "B"),
      (3L, t(3), 1L, "B"), (4L, t(4), 1L, "C"),
      (5L, t(10), 2L, "A"), (6L, t(10), 2L, "B")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.eventTransitions(events)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("A", "B")) == ((2L, 1.0)), got.toString)
    assert(got(("B", "B")) == ((1L, 0.5)), got.toString)
    assert(got(("B", "C")) == ((1L, 0.5)), got.toString)
    assert(got.size == 3, got.toString) // no C->null ghost rows
  }

  test("lineitemCorrelations: planted perfect (anti)correlation") {
    // price = 3*qty (corr +1), disc = -0.01*qty + 0.6 (corr -1)
    val li = (1 to 50).map { i =>
      (i.toDouble, 3.0 * i, 0.6 - 0.01 * i)
    }.toDF("l_quantity", "l_extendedprice", "l_discount")
    val r = AggOps.lineitemCorrelations(li)
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 50L)
    assert(r._2 == 1.0, s"corr_qty_price ${r._2}")
    assert(r._3 == -1.0, s"corr_qty_disc ${r._3}")
    assert(r._4 == -1.0, s"corr_price_disc ${r._4}")
  }

  test("zipfSlopeByLang: matches the closed-form moment slope") {
    // counts 8,4,2,1 for terms w0..w3 (one lang) -> slope of
    // ln(cnt) ~ ln(rank) computable directly
    val text = (0 until 8).map(_ => "w0").mkString(" ") + " " +
      (0 until 4).map(_ => "w1").mkString(" ") + " " +
      "w2 w2 w3"
    val docs = Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
    val got = DocOps.zipfSlopeByLang(docs)
      .as[(String, Long, Double)].head()
    val xy = Seq((1, 8), (2, 4), (3, 2), (4, 1))
      .map { case (r, c) => (math.log(r.toDouble), math.log(c.toDouble)) }
    val (n, sx, sy) = (xy.size.toDouble, xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val want = math.rint((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6) / 1e6
    assert(got._1 == "en" && got._2 == 4L)
    assert(math.abs(got._3 - want) < 1e-9, s"${got._3} vs $want")
  }

  test("unigramKlBySource: zero iff the source matches the corpus mix") {
    // srcSame has the corpus distribution (KL 0 against itself only
    // when it IS the whole corpus) — plant two identical sources so
    // each equals the mix exactly; a third skewed source must be > 0
    val docs = Seq(
      (1L, "x x y", "srcA"),
      (2L, "x x y", "srcB")
    ).toDF("doc_id", "text", "source")
    val kl0 = DocOps.unigramKlBySource(docs)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(kl0("srcA") == 0.0 && kl0("srcB") == 0.0, kl0.toString)
    val skewed = DocOps.unigramKlBySource(
      docs.union(Seq((3L, "z z z z", "srcC")).toDF("doc_id", "text", "source")))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(skewed("srcC") > 0.5, skewed.toString) // near-disjoint vocab
    assert(skewed("srcA") > 0.0, skewed.toString) // mix shifted under it
  }

  test("cusumChangepoints: the flag lands on the planted level shift") {
    // Type A runs 6 days at 2/day then 6 days at 8/day: mean 5,
    // cusum walks to its extremum |−18| exactly at the shift boundary
    // (day 6), back to 0 by day 12. Type B is flat — every day ties
    // at |cusum| = 0 and ALL rows flag (degenerate max, documented).
    def day(d: Int, i: Int) = Timestamp.valueOf(f"2024-02-$d%02d 00:00:${i % 60}%02d")
    val rows = (1 to 12).flatMap { d =>
      val n = if (d <= 6) 2 else 8
      (0 until n).map(i => ((d * 100 + i).toLong, day(d, i), 1L, "A", 0.0, ""))
    } ++ (1 to 3).map(d => ((9000 + d).toLong, day(d, 0), 1L, "B", 0.0, ""))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.cusumChangepoints(events)
      .as[(String, java.sql.Date, Long, Double, Boolean)].collect()
    val a = got.filter(_._1 == "A").sortBy(_._2.toString)
    assert(a.map(_._3).toSeq == Seq.fill(6)(2L) ++ Seq.fill(6)(8L))
    // cusum: day k≤6: 2k − 5k = −3k (min −18 at k=6); then climbs by
    // +3/day back to 0.
    assert(a.map(_._4).toSeq ==
      (1 to 6).map(k => -3.0 * k) ++ (1 to 6).map(k => -18.0 + 3 * k))
    assert(a.filter(_._5).map(_._2.toString).toSeq == Seq("2024-02-06"),
      "changepoint must flag exactly the shift boundary")
    assert(got.filter(_._1 == "B").forall(r => r._4 == 0.0 && r._5))
  }

  test("timeDecayEngagement: anchor-relative half-life weights, exact sum") {
    // Anchor = max ts (user 2's event, weight exactly 1.0). User 1's
    // events sit at anchor−7d and anchor−14d → 0.5 + 0.25 under the
    // 7-day half-life.
    val t0 = Timestamp.valueOf("2024-06-29 12:00:00")
    def daysBefore(d: Int) =
      Timestamp.valueOf(f"2024-06-${29 - d}%02d 12:00:00")
    val events = Seq(
      (1L, daysBefore(7), 1L, "view", 0.0, ""),
      (2L, daysBefore(14), 1L, "view", 0.0, ""),
      (3L, t0, 2L, "view", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.timeDecayEngagement(events)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2L) == ((1L, 1.0)), got.toString)
    assert(got(1L)._1 == 2L, got.toString)
    assert(math.abs(got(1L)._2 - 0.75) < 1e-7, got.toString)
  }

  test("typeCountCorrelations: planted co-movement, zero-fill engaged") {
    def day(d: Int, i: Int) = Timestamp.valueOf(f"2024-04-$d%02d 00:00:${i % 60}%02d")
    // A and B move together day-by-day (1,2,3 events) → corr +1.
    // C runs opposite (3,2,1) → corr −1 vs both. D appears ONLY on
    // day 1 — its other days must zero-fill or every correlation
    // against D is computed on a 1-point series and drops out.
    def burst(ty: String, d: Int, n: Int, base: Int) =
      (0 until n).map(i => ((base + d * 100 + i).toLong, day(d, i), 1L, ty))
    val rows =
      (1 to 3).flatMap(d => burst("A", d, d, 10000)) ++
        (1 to 3).flatMap(d => burst("B", d, d, 20000)) ++
        (1 to 3).flatMap(d => burst("C", d, 4 - d, 30000)) ++
        burst("D", 1, 2, 40000)
    val events = rows.map { case (e, ts, u, ty) => (e, ts, u, ty, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.typeCountCorrelations(events)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("A", "B")) == 1.0, got.toString)
    assert(got(("A", "C")) == -1.0 && got(("B", "C")) == -1.0, got.toString)
    // D's zero-filled series (2,0,0) is anti-correlated with A's
    // (1,2,3): corr = −0.866025 by hand — only computable because
    // missing days became zeros.
    assert(math.abs(got(("A", "D")) + 0.866025) < 1e-6, got.toString)
    assert(got.size == 6, got.toString)
  }

  test("activityLorenzDeciles: exact cumulative shares on 10 users") {
    // users 1..10 with 1..10 events: decile i holds user i exactly;
    // cum share after decile k = k(k+1)/2 / 55.
    val rows = for (u <- 1L to 10L; k <- 1L to u) yield
      (u * 100 + k, Timestamp.valueOf("2024-01-01 10:00:00"), u, "view", 0.0, "")
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.activityLorenzDeciles(events)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq.fill(10)(1L), got.mkString(","))
    assert(got.map(_._3).toSeq == (1L to 10L), got.mkString(","))
    val shares = (1 to 10).map(k =>
      math.rint(k * (k + 1) / 2.0 / 55.0 * 1e6) / 1e6)
    assert(got.map(_._4).toSeq == shares, got.mkString(","))
  }

  test("interarrivalStats: metronome CV 0, bursts push CV up") {
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + s / 3600}%02d:" +
      f"${(s / 60) % 60}%02d:${s % 60}%02d")
    // "tick" arrives every 60 s (σ=0 → CV 0); "burst" alternates
    // 1 s / 599 s gaps — high dispersion around its mean.
    val ticks = (0 to 10).map(i => ((100 + i).toLong, t(i * 60), 1L, "tick"))
    val bursts = Seq(0, 1, 600, 601, 1200, 1201)
      .zipWithIndex.map { case (s, i) => ((200 + i).toLong, t(s), 1L, "burst") }
    val events = (ticks ++ bursts)
      .map { case (e, ts, u, ty) => (e, ts, u, ty, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.interarrivalStats(events)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("tick") == ((10L, 60.0, 0.0, 0.0)), got.toString)
    assert(got("burst")._1 == 5L, got.toString)
    assert(got("burst")._4 > 0.9, s"bursty CV should be high: $got")
  }

  test("userActivityGini: uniform 0, total concentration (n-1)/n") {
    def ev(rows: Seq[(Long, Long)]) = rows.zipWithIndex.map { case ((u, k), i) =>
      ((i * 1000 + k).toLong, Timestamp.valueOf("2024-01-01 10:00:00"), u,
        "view", 0.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val uniform = ev(for (u <- 1L to 4L; k <- 1L to 3L) yield (u, k))
    val g0 = EventOps.userActivityGini(uniform)
      .as[(Long, Long, Double)].head()
    assert(g0 == ((4L, 12L, 0.0)), g0.toString)
    // users 1-3 have one event each, user 4 has 97 — near-total
    // concentration; assert the exact closed form on the fixture.
    val skew = ev((1L to 3L).map(u => (u, 1L)) ++ (1L to 97L).map(k => (4L, k)))
    val g1 = EventOps.userActivityGini(skew)
      .as[(Long, Long, Double)].head()
    // ranks: (1,1),(2,1),(3,1),(4,97) → Σi·x = 1+2+3+388 = 394
    val expect = math.rint((2.0 * 394 / (4.0 * 100) - 5.0 / 4.0) * 1e6) / 1e6
    assert(g1 == ((4L, 100L, expect)), g1.toString)
  }

  test("userTypeEntropy: single-track 0 (not −0), uniform mix ln k") {
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:${s % 60}%02d")
    val events = Seq(
      (1L, t(1), 1L, "A"), (2L, t(2), 1L, "A"), // single type → 0.0
      (3L, t(3), 2L, "A"), (4L, t(4), 2L, "B")  // uniform 2 → ln 2
    ).map { case (e, ts, u, ty) => (e, ts, u, ty, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.userTypeEntropy(events)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, 0.0)), got.toString)
    assert(got(1L)._2.compareTo(0.0) == 0 &&
      !got(1L)._2.toString.startsWith("-"), s"−0.0 leaked: $got")
    assert(got(2L) ==
      ((2L, math.rint(math.log(2.0) * 1e6) / 1e6)), got.toString)
  }

  test("rollingDistinctUsers: sliding blob-OR equals per-window distincts") {
    def t(d: Int) = Timestamp.valueOf(f"2024-05-$d%02d 10:00:00")
    // user 1 on days 1 and 9 (outside each other's 7-day window),
    // user 2 on days 1-2, user 3 on day 8 only.
    val events = Seq(
      (1L, t(1), 1L), (2L, t(1), 2L), (3L, t(2), 2L),
      (4L, t(8), 3L), (5L, t(9), 1L)
    ).map { case (e, ts, u) => (e, ts, u, "view", 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.rollingDistinctUsers(events, windowDays = 7, maxId = 64)
      .as[(java.sql.Date, Long)].collect()
      .map(r => r._1.toString -> r._2).toMap
    // day 1: {1,2}; day 2: {1,2}; day 8: window covers day 2 (6 days
    // back) → {2,3}; day 9: window [3,9] → {3,1}
    assert(got == Map("2024-05-01" -> 2L, "2024-05-02" -> 2L,
      "2024-05-08" -> 2L, "2024-05-09" -> 2L), got.toString)
  }

  test("snapshotDiff: added, removed, changed; unchanged suppressed") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "s", "v")
    val neu = Seq((1L, "a", 1.0), (2L, "b", 9.0), (4L, "d", 4.0))
      .toDF("id", "s", "v")
    val got = EventOps.snapshotDiff(old, neu, "id", Seq("s", "v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      got.toString)
  }

  test("snapshotDiff: delimiter + NULL sentinel disambiguate boundaries") {
    // id 1: same concatenation, different column split — an empty
    // separator would hash ('12','3x') and ('123','x') equal and
    // misclass the change as 'unchanged'. id 2: null moves columns —
    // concat_ws's silent null-skip would make ('ab', null) and
    // (null, 'ab') both hash "ab".
    val old = Seq((1L, Some("12"), Some("3x")), (2L, Some("ab"), None))
      .toDF("id", "s", "t")
    val neu = Seq((1L, Some("123"), Some("x")), (2L, None, Some("ab")))
      .toDF("id", "s", "t")
    val got = EventOps.snapshotDiff(old, neu, "id", Seq("s", "t"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"), got.toString)
  }

  test("topEventPaths: gap splits sessions, order pinned by (ts, event_id)") {
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + s / 3600}%02d:" +
      f"${(s / 60) % 60}%02d:${s % 60}%02d")
    val events = Seq(
      // user 1 session 1: A,B (same second — event_id orders them);
      // then a 31-minute gap starts session 2: C
      (1L, t(0), 1L, "A"), (2L, t(0), 1L, "B"), (3L, t(1860), 1L, "C"),
      // user 2: one session A,B
      (4L, t(0), 2L, "A"), (5L, t(10), 2L, "B")
    ).map { case (e, ts, u, ty) => (e, ts, u, ty, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.topEventPaths(events, gapMinutes = 30)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A>B" -> 2L, "C" -> 1L), got.toString)
  }

  test("dauWauStickiness: per-day share of the week's distinct users") {
    // One ISO week (2024-03-04 is a Monday): users {1,2,3} active Mon,
    // {1} Tue → WAU 3, stickiness 1.0 and 1/3.
    def t(d: Int, h: Int) = Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")
    val events = Seq(
      (1L, t(4, 1), 1L), (2L, t(4, 2), 2L), (3L, t(4, 3), 3L),
      (4L, t(4, 4), 1L), // same user twice in a day counts once
      (5L, t(5, 1), 1L)
    ).toDF("event_id", "ts", "user_id")
    val got = EventOps.dauWauStickiness(events)
      .as[(java.sql.Date, Long, Long, Double)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4))).toMap
    assert(got("2024-03-04") == ((3L, 3L, 1.0)), got.toString)
    assert(got("2024-03-05") == ((1L, 3L, 0.333333)), got.toString)
  }

  test("linearAttribution: equal split, window bound, purchases excluded") {
    def t(d: Int, h: Int) = Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")
    val events = Seq(
      // user 1: view+click inside the 7-day window → ½ each; an old
      // view 8 days out is excluded.
      (1L, t(1, 0), 1L, "view", 0.0, ""),
      (2L, t(8, 0), 1L, "view", 0.0, ""),
      (3L, t(8, 1), 1L, "click", 0.0, ""),
      (4L, t(9, 0), 1L, "purchase", 0.0, ""),
      // user 2: a prior purchase is NOT a touch; the lone click gets
      // full credit for the second conversion.
      (5L, t(10, 0), 2L, "purchase", 0.0, ""),
      (6L, t(10, 1), 2L, "click", 0.0, ""),
      (7L, t(10, 2), 2L, "purchase", 0.0, ""),
      // user 3: conversion with no touches → no credit anywhere.
      (8L, t(20, 0), 3L, "purchase", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.linearAttribution(events)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(got("click") == ((2L, 1.5)), got.toString) // ½ + 1
    assert(got("view") == ((1L, 0.5)), got.toString)  // the in-window one
    assert(!got.contains("purchase"), got.toString)
  }

  test("markovRemovalAttribution: hand-solved 2-channel chain gives " +
    "RE 0.75/0.5 and shares 0.6/0.4") {
    def ev(id: Long, uid: Long, mm: Int, t: String) =
      (id, Timestamp.valueOf(f"2024-03-01 10:$mm%02d:00"), uid, t, 1.0, "{}")
    // u1: a -> purchase; u2: a -> b -> purchase; u3: b (unconverted).
    // Chain: a: {conv 1/2, b 1/2}, b: {conv 1/2, null 1/2};
    // START: a 2/3, b 1/3 -> p(a)=3/4, p(b)=1/2, base = 2/3.
    // Remove a: P = 1/6 -> RE 3/4; remove b: P = 1/3 -> RE 1/2;
    // shares 0.6 / 0.4.
    val events = Seq(
      ev(1, 1L, 0, "a"), ev(2, 1L, 1, "purchase"),
      ev(3, 2L, 0, "a"), ev(4, 2L, 1, "b"), ev(5, 2L, 2, "purchase"),
      ev(6, 3L, 0, "b"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.markovRemovalAttribution(events).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Double]("base_conv_p"), r.getAs[Double]("removal_conv_p"),
          r.getAs[Double]("removal_effect"),
          r.getAs[Double]("attribution_share")))).toMap
    assert(got.keySet == Set("a", "b"), got.toString)
    assert(got("a") == ((0.666667, 0.166667, 0.75, 0.6)), got.toString)
    assert(got("b") == ((0.666667, 0.333333, 0.5, 0.4)), got.toString)
  }

  test("entropyRateChain: deterministic alternator rate 0; the biased " +
    "chain matches the same recursion replayed in plain Scala") {
    def ev(id: Long, uid: Long, mm: Int, t: String) =
      (id, Timestamp.valueOf(f"2024-03-01 10:$mm%02d:00"), uid, t, 1.0, "{}")
    // a b a b: both rows deterministic -> every h_state 0, rate 0
    val alt = Seq(ev(1, 1L, 0, "a"), ev(2, 1L, 1, "b"),
      ev(3, 1L, 2, "a"), ev(4, 1L, 3, "b"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ra = EventOps.entropyRateChain(alt).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("h_state_nats"),
          r.getAs[Double]("entropy_rate_nats")))).toMap
    assert(ra("a") == ((0.0, 0.0)) && ra("b") == ((0.0, 0.0)), ra.toString)
    // a a b a: P(a->a)=P(a->b)=1/2, P(b->a)=1 -> h_a = ln 2, h_b = 0;
    // rate = pi_a(20 iters) * h_a — replay the same fold order here
    val biased = Seq(ev(1, 1L, 0, "a"), ev(2, 1L, 1, "a"),
      ev(3, 1L, 2, "b"), ev(4, 1L, 3, "a"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rb = EventOps.entropyRateChain(biased).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("stationary_p"), r.getAs[Double]("h_state_nats"),
          r.getAs[Double]("entropy_rate_nats")))).toMap
    val hA = 0.0 + -(0.5 * math.log(0.5)) + -(0.5 * math.log(0.5))
    val pMat = Array(Array(0.5, 0.5), Array(1.0, 0.0))
    var pi = Array(0.5, 0.5)
    for (_ <- 0 until 20)
      pi = Array.tabulate(2)(j =>
        (0 until 2).foldLeft(0.0)((a, i) => a + pi(i) * pMat(i)(j)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val rate = 0.0 + pi(0) * hA + pi(1) * 0.0
    assert(rb("a") == ((r6(pi(0)), r6(hA), r6(rate))), rb.toString)
    assert(rb("b")._2 == 0.0, rb.toString)
  }

  test("mannKendallDaily: strict rise gives S = C(n,2) and z past the " +
    "cut; a constant series has zero variance and NULL z") {
    def dayEvents(day: Int, n: Int, base: Long) = (0 until n).map { j =>
      val d = java.time.LocalDate.of(2024, 3, 1).plusDays(day)
      (base + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    // counts [1,2,3,4,5]: S = 10, no ties -> var18 = 5·4·15 = 300,
    // z = 9/sqrt(300/18) = 2.204541 -> increasing
    val rise = (0 until 5).flatMap(d => dayEvents(d, d + 1, d * 100L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.mannKendallDaily(rise).collect().head
    assert(r.getAs[Long]("s_stat") == 10L, r)
    assert(r.getAs[Long]("var_s_x18") == 300L, r)
    assert(r.getAs[Double]("z_score") == 2.204541, r)
    assert(r.getAs[String]("trend") == "increasing", r)
    // constant [2,2,2]: the tie correction cancels the variance
    val flat = (0 until 3).flatMap(d => dayEvents(d, 2, d * 100L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rf = EventOps.mannKendallDaily(flat).collect().head
    assert(rf.getAs[Long]("s_stat") == 0L &&
      rf.getAs[Long]("var_s_x18") == 0L, rf)
    assert(rf.isNullAt(rf.fieldIndex("z_score")) &&
      rf.isNullAt(rf.fieldIndex("trend")), rf)
  }

  test("thetaForecastDaily: a perfectly linear series forecasts the " +
    "drift line averaged with the hand-traced SES level") {
    def dayEvents(day: Int, n: Int, base: Long) = (0 until n).map { j =>
      val d = java.time.LocalDate.of(2024, 3, 1).plusDays(day)
      (base + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    // y = 10t (t = 1..4): OLS is exact (a0 = 0, b0 = 10), the theta-2
    // line equals the series, SES(0.5) level = 31.25 ->
    // forecast(h) = 0.5·10·(4+h) + 15.625
    val lin = (0 until 4).flatMap(d => dayEvents(d, (d + 1) * 10, d * 1000L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.thetaForecastDaily(lin)
      .orderBy("h").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == (1L to 7L), got.toString)
    assert(got.map(_._2) == (1 to 7).map(h => 5.0 * (4 + h) + 15.625),
      got.toString)
  }

  test("pacfDailyCounts: matches the Durbin-Levinson recursion " +
    "replayed in plain Scala; lag-1 PACF equals the lag-1 ACF") {
    def dayEvents(day: Int, n: Int, base: Long) = (0 until n).map { j =>
      val d = java.time.LocalDate.of(2024, 3, 1).plusDays(day)
      (base + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    val counts = Seq(1, 2, 1, 3, 1, 2, 1, 4, 1, 2)
    val events = counts.zipWithIndex
      .flatMap { case (c, d) => dayEvents(d, c, d * 100L) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.pacfDailyCounts(events).orderBy("lag")
      .as[(Long, Double, Double)].collect()
    // replay: n-scaled deviations, covariance-form r, DL recursion
    val ys = counts.map(_.toDouble)
    val n = ys.length; val nd = n.toDouble
    val sy = ys.foldLeft(0.0)(_ + _)
    def dev(t: Int) = nd * ys(t - 1) - sy
    val dsum = (1 to n).foldLeft(0.0)((a, t) => a + dev(t) * dev(t))
    val r = (1 to 7).map(k =>
      (1 to n - k).foldLeft(0.0)((a, t) => a + dev(t) * dev(t + k)) / dsum)
    var phis = Vector.empty[Double]; var pacf = Vector.empty[Double]
    for (k <- 1 to 7) {
      val num = r(k - 1) - (if (phis.isEmpty) 0.0
        else (1 to phis.size).foldLeft(0.0)((a, j) =>
          a + phis(j - 1) * r(k - j - 1)))
      val den = 1.0 - (if (phis.isEmpty) 0.0
        else (1 to phis.size).foldLeft(0.0)((a, j) =>
          a + phis(j - 1) * r(j - 1)))
      val pkk = if (den != 0.0) num / den else 0.0
      phis = (1 to phis.size).map(j =>
        phis(j - 1) - pkk * phis(k - j - 1)).toVector :+ pkk
      pacf = pacf :+ pkk
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.map(_._1).toSeq == (1L to 7L), got.mkString(","))
    assert(got.map(_._2).toSeq == r.map(r6), got.mkString(","))
    assert(got.map(_._3).toSeq == pacf.map(r6), got.mkString(","))
    assert(got.head._2 == got.head._3, "lag-1 PACF must equal lag-1 ACF")
  }

  test("conformalDailyIntervals: exact conformal order statistic from " +
    "the seasonal-naive residuals, last week as point forecasts") {
    def dayEvents(day: Int, n: Int, base: Long) = (0 until n).map { j =>
      val d = java.time.LocalDate.of(2024, 3, 4).plusDays(day)
      (base + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    // week 1: 10..16 rising; week 2: the same +{2,0,2,0,2,0,2} ->
    // |residuals| = {0,0,0,2,2,2,2}, n = 7, k = min(ceil(8*.9), 7) = 7
    // -> q_hat = 2; forecasts = week-2 counts, intervals +-2
    val w1 = (0 until 7).map(10 + _)
    val w2 = w1.zipWithIndex.map { case (y, i) => y + (if (i % 2 == 0) 2 else 0) }
    val events = (w1 ++ w2).zipWithIndex
      .flatMap { case (y, d) => dayEvents(d, y, d * 1000L) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.conformalDailyIntervals(events)
      .orderBy("h").collect()
    assert(got.map(_.getAs[Long]("h")).toSeq == (1L to 7L), got.mkString(","))
    assert(got.map(_.getAs[Long]("forecast")).toSeq == w2.map(_.toLong),
      got.mkString(","))
    assert(got.forall(r => r.getAs[Long]("q_hat") == 2L &&
      r.getAs[Long]("n_resid") == 7L), got.mkString(","))
    assert(got.head.getAs[Long]("lo") == w2.head - 2L &&
      got.head.getAs[Long]("hi") == w2.head + 2L, got.head)
  }

  test("hurstExponentDaily: linear-series blocks score the closed-form " +
    "R/S; the slope replays the same ln fold") {
    def dayEvents(day: Int, n: Int, base: Long) = (0 until n).map { j =>
      val d = java.time.LocalDate.of(2024, 3, 1).plusDays(day)
      (base + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    // y = 1..16: every m=8 block has dev_t = 4t^2-32t (range 64,
    // den 336); the m=16 block has dev_t = 8t^2-128t (range 512,
    // den 5440) — both shift-invariant, so the two m=8 blocks agree
    val events = (0 until 16).flatMap(d => dayEvents(d, d + 1, d * 1000L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.hurstExponentDaily(events).orderBy("m").collect()
    assert(got.map(r => (r.getAs[Long]("m"), r.getAs[Long]("n_blocks")))
      .toSeq == Seq((8L, 2L), (16L, 1L)), got.mkString(","))
    val rs8 = math.rint(64.0 / math.sqrt(336.0) * 1e6)
    val rs16 = math.rint(512.0 / math.sqrt(5440.0) * 1e6)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(0).getAs[Double]("mean_rs") == r6(2 * rs8 / (2.0 * 1e6)),
      got(0))
    assert(got(1).getAs[Double]("mean_rs") == r6(rs16 / 1e6), got(1))
    // slope via the operator's own fold order (k = 2 points)
    val xs = Seq(math.log(8.0), math.log(16.0))
    val ys = Seq(math.log(2 * rs8 / (2.0 * 1e6)), math.log(rs16 / 1e6))
    val sx = 0.0 + xs(0) + xs(1); val sy = 0.0 + ys(0) + ys(1)
    val sxy = 0.0 + xs(0) * ys(0) + xs(1) * ys(1)
    val sxx = 0.0 + xs(0) * xs(0) + xs(1) * xs(1)
    val h = (2.0 * sxy - sx * sy) / (2.0 * sxx - sx * sx)
    assert(got(0).getAs[Double]("hurst") == r6(h), got(0))
  }

  test("durbinWatsonDaily: alternating residuals give DW 10/3; a " +
    "perfect trend has zero residuals and a NULL DW") {
    def dayEvents(day: Int, n: Int, base: Long) = (0 until n).map { j =>
      val d = java.time.LocalDate.of(2024, 3, 1).plusDays(day)
      (base + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    // counts [2,0,2,0,2] over 5 days: slope 0, residuals ±(y−1.2) in
    // micro-units -> sd2 = 4·(2e6)² , se2 = 3·(8e5)²+2·(12e5)² ->
    // DW = 16/4.8 = 10/3, > 2.5 -> 'negative' (alternation)
    val alt = (dayEvents(0, 2, 100) ++ dayEvents(2, 2, 200) ++
      dayEvents(4, 2, 300))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.durbinWatsonDaily(alt).collect().head
    assert(r.getAs[Long]("n_days") == 5L, r)
    assert(r.getAs[Double]("slope_per_day") == 0.0, r)
    assert(r.getAs[Double]("dw_stat") == 3.333333, r)
    assert(r.getAs[String]("autocorrelation") == "negative", r)
    // counts [1,2,3,4]: OLS fits exactly, every residual micro-pin is
    // 0 -> se2 = 0 -> DW and the verdict are NULL, slope survives
    val trend = (0 until 4).flatMap(d => dayEvents(d, d + 1, d * 100L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rt = EventOps.durbinWatsonDaily(trend).collect().head
    assert(rt.getAs[Double]("slope_per_day") == 1.0, rt)
    assert(rt.isNullAt(rt.fieldIndex("dw_stat")), rt)
    assert(rt.isNullAt(rt.fieldIndex("autocorrelation")), rt)
  }

  test("runsTestDaily: exact integer median, equal-to-median days " +
    "dropped, runs counted over the survivors") {
    def dayEvents(day: Int, n: Int, base: Long) = (0 until n).map { j =>
      val d = java.time.LocalDate.of(2024, 3, 1).plusDays(day)
      (base + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    // counts [9,9,1,1,9,1]: med2 = y_(3)+y_(4) = 1+9 = 10 (median 5,
    // no day equals it); signs 1,1,0,0,1,0 -> R = 4, n1 = n0 = 3,
    // mu = 4, z = 0
    val mixed = (dayEvents(0, 9, 0) ++ dayEvents(1, 9, 100) ++
      dayEvents(2, 1, 200) ++ dayEvents(3, 1, 300) ++
      dayEvents(4, 9, 400) ++ dayEvents(5, 1, 500))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.runsTestDaily(mixed).collect().head
    assert(r.getAs[Long]("n_days_used") == 6L, r)
    assert((r.getAs[Long]("n_above"), r.getAs[Long]("n_below")) ==
      ((3L, 3L)), r)
    assert(r.getAs[Long]("runs") == 4L, r)
    assert(r.getAs[Double]("z_score") == 0.0, r)
    assert(r.getAs[Boolean]("looks_random"), r)
    // fully clumped [9,9,9,1,1,1]: R = 2, z = -2/sqrt(1.2)
    val clump = (dayEvents(0, 9, 0) ++ dayEvents(1, 9, 100) ++
      dayEvents(2, 9, 200) ++ dayEvents(3, 1, 300) ++
      dayEvents(4, 1, 400) ++ dayEvents(5, 1, 500))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rc = EventOps.runsTestDaily(clump).collect().head
    assert(rc.getAs[Long]("runs") == 2L, rc)
    assert(rc.getAs[Double]("z_score") ==
      math.rint(-2.0 / math.sqrt(1.2) * 1e6) / 1e6, rc)
  }

  test("friedmanDowTest: three identical-ranking weeks hit the exact " +
    "chi2 maximum 6n; a constant week scores 0") {
    def dayEvents(day: Int, n: Int, base: Long) = (0 until n).map { j =>
      // 2024-03-04 is a Monday -> exactly 3 complete Mon..Sun weeks
      val d = java.time.LocalDate.of(2024, 3, 4).plusDays(day)
      (base + j, Timestamp.valueOf(s"$d 10:00:00"), 1L, "view", 1.0, "{}")
    }
    // count 7 - (t mod 7): every week ranks its days identically ->
    // chi2 = 6·n_weeks = 18 > 12.592
    val consistent = (0 until 21)
      .flatMap(t => dayEvents(t, 7 - (t % 7), t * 100L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.friedmanDowTest(consistent).collect().head
    assert(r.getAs[Long]("n_weeks") == 3L, r)
    assert(r.getAs[Double]("chi2") == 18.0, r)
    assert(r.getAs[Boolean]("significant"), r)
    // one constant week: all midranks tie at 4 -> chi2 exactly 0
    val flat = (0 until 7).flatMap(t => dayEvents(t, 2, t * 100L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rf = EventOps.friedmanDowTest(flat).collect().head
    assert(rf.getAs[Long]("n_weeks") == 1L, rf)
    assert(rf.getAs[Double]("chi2") == 0.0, rf)
    assert(!rf.getAs[Boolean]("significant"), rf)
  }
}
