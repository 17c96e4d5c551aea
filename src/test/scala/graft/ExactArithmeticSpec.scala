package graft

import java.sql.Timestamp

import graft.ops.{DocOps, EventOps, MiningOps, ProfileOps, VectorOps}

/** Round-11 batch-8 exact-arithmetic operators: binary-weighted EWMA,
  * type×day-of-week mutual information, Benford first-digit profile,
  * and greedy sequence packing — all against planted fixtures with
  * hand-computable answers. */
class ExactArithmeticSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, day: String, t: String) =
    (id, Timestamp.valueOf(s"$day 10:00:00"), 1L, t, 1.0, "{}")
  private val evCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("ewmaDailyCounts: binary weights halve per day and truncate at 30") {
    // type a: 2 events on 03-01, 1 on 03-02, then 4 on 04-10 (>30 days
    // past both, so the tail has fully truncated away).
    val events = Seq(
      ev(1, "2024-03-01", "a"), ev(2, "2024-03-01", "a"),
      ev(3, "2024-03-02", "a"),
      ev(4, "2024-04-10", "a"), ev(5, "2024-04-10", "a"),
      ev(6, "2024-04-10", "a"), ev(7, "2024-04-10", "a"),
    ).toDF(evCols: _*)
    val got = EventOps.ewmaDailyCounts(events).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Double]("ewma")).toMap
    // day1: 2·2⁻¹ = 1.0; day2: 1·2⁻¹ + 2·2⁻² = 1.0;
    // day40: 4·2⁻¹ = 2.0 (both March days are ≥30 days back)
    assert(got == Map(
      "2024-03-01" -> 1.0, "2024-03-02" -> 1.0, "2024-04-10" -> 2.0), got)
  }

  test("typeDowMutualInfo: ln 2 for perfect dependence, 0 for independence") {
    // 03-04 is a Monday, 03-05 a Tuesday. Dependence: type a only on
    // Mondays, b only on Tuesdays, equal mass -> MI = ln 2.
    val dep = Seq(
      ev(1, "2024-03-04", "a"), ev(2, "2024-03-11", "a"),
      ev(3, "2024-03-05", "b"), ev(4, "2024-03-12", "b"),
    ).toDF(evCols: _*)
    val d = EventOps.typeDowMutualInfo(dep).collect().head
    assert(d.getAs[Long]("n_types") == 2L)
    assert(d.getAs[Long]("n_dows") == 2L)
    assert(d.getAs[Long]("n_cells") == 2L)
    assert(d.getAs[Double]("mi_nats") == 0.693147, d) // round(ln 2, 6)
    // Independence: both types appear on both dows with equal mass.
    val ind = Seq(
      ev(1, "2024-03-04", "a"), ev(2, "2024-03-05", "a"),
      ev(3, "2024-03-04", "b"), ev(4, "2024-03-05", "b"),
    ).toDF(evCols: _*)
    val i = EventOps.typeDowMutualInfo(ind).collect().head
    assert(i.getAs[Long]("n_cells") == 4L)
    assert(i.getAs[Double]("mi_nats") == 0.0, i)
  }

  test("benfordFirstDigit: textual leading digit, sub-1 rows excluded") {
    val orders = Seq(1.5, 19.0, 25.0, 0.5, 900.0).toDF("o_totalprice")
    val got = ProfileOps.benfordFirstDigit(orders, "o_totalprice")
      .collect()
      .map(r => r.getAs[Int]("digit") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("share"),
          r.getAs[Double]("benford_expected")))).toMap
    // 0.5 is excluded; digits: 1 (1.5, 19.0), 2 (25.0), 9 (900.0)
    assert(got.keySet == Set(1, 2, 9), got)
    assert(got(1) == ((2L, 0.5, 0.30103)), got)   // round(log10 2, 6)
    assert(got(2)._1 == 1L && got(2)._2 == 0.25, got)
    assert(got(9)._3 == 0.045757, got)            // round(log10 10/9, 6)
  }

  test("sequencePacking: desc-order prefix sum, straddle flags, empty docs drop") {
    // pure-letter words: the bpeish regex would split "w0" into 2 tokens
    def words(n: Int) = (0 until n).map(i => ('a' + i).toChar.toString).mkString(" ")
    val docs = Seq(
      (1L, words(5), "s"),  // cum 5:  seq 0, runs into seq 1 -> straddles
      (2L, words(3), "s"),  // cum 8:  starts at 5 -> seq 1, ends at 7
      (3L, words(2), "s"),  // cum 10: starts at 8 -> seq 2, ends at 9
      (4L, "", "s"),        // 0 tokens -> excluded
    ).toDF("doc_id", "text", "source")
    val got = DocOps.sequencePacking(docs, seqLen = 4).collect()
      .map(r => r.getAs[Long]("seq") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_started"),
          r.getAs[Long]("n_straddling")))).toMap
    assert(got == Map(
      0L -> ((1L, 5L, 1L)), 1L -> ((1L, 3L, 0L)), 2L -> ((1L, 2L, 0L))), got)
    // partitioned windows: a second source packs independently
    val two = docs.union(Seq((9L, words(4), "t")).toDF("doc_id", "text", "source"))
    val t = DocOps.sequencePacking(two, seqLen = 4)
      .filter($"source" === "t").collect()
    assert(t.length == 1 && t.head.getAs[Long]("n_straddling") == 0L, t.toSeq)
  }

  test("kmeansCodeRounds: integer-sum centroids pull members across rounds") {
    // 2-D fixture, nlist=2 -> init centroids are vec 0 (x-axis) and
    // vec 1 (26.6 deg). Round 1 assigns vec1/p/q and the three y-axis
    // vectors to list 1; the updated SUM vector swings list 1's
    // direction to ~57 deg, so round 2 hands the two low-angle members
    // (vec 1 itself and q at 19 deg) to list 0. Codes (per-vector
    // scale): (1,0)->(127,0), (1,.5)->(127,64), (1,1)->(127,127),
    // (1,.35)->(127,44), (.05,1)->(6,127). Zero vector: excluded.
    val emb = Seq(
      0L -> Array(1f, 0f), 1L -> Array(1f, 0.5f),
      2L -> Array(1f, 1f), 3L -> Array(1f, 0.35f),
      4L -> Array(0.05f, 1f), 5L -> Array(0.05f, 1f),
      6L -> Array(0.05f, 1f), 9L -> Array(0f, 0f),
    ).toDF("vec_id", "embedding")
    val got = VectorOps.kmeansCodeRounds(emb, nlist = 2).collect()
      .map(r => r.getAs[Long]("list_id") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_moved_in"),
          r.getAs[Long]("sum_q0"), r.getAs[Long]("sum_q1")))).toMap
    // list 0 = {0, 1, 3} (1 and 3 moved in), list 1 = {2, 4, 5, 6}
    assert(got == Map(
      0L -> ((3L, 2L, 381L, 108L)),
      1L -> ((4L, 0L, 145L, 508L))), got)
  }

  test("acfDailyCounts: exact moments on the zero-filled calendar") {
    // alternating 2,1,2,1,2 over five consecutive days:
    // acf(1) = -1, acf(2) = +1, acf(3) = -1; lag 4 has one pair
    // (zero variance -> excluded), lags 5..7 have none.
    def day(d: Int, n: Int) = (0 until n).map(i =>
      ev(d * 100L + i, f"2024-03-0$d", "a"))
    val alt = (day(1, 2) ++ day(2, 1) ++ day(3, 2) ++ day(4, 1) ++
      day(5, 2)).toDF(evCols: _*)
    val got = alt.transform(e => EventOps.acfDailyCounts(e)).collect()
      .map(r => r.getAs[Int]("lag") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("acf")))).toMap
    assert(got == Map(
      1 -> ((4L, -1.0)), 2 -> ((3L, 1.0)), 3 -> ((2L, -1.0))), got)
    // the calendar zero-fills gaps: 3,1,_,1,3 over days 1,2,4,5 is the
    // series (3,1,0,1,3) -> lag-1 has FOUR pairs and acf -1/19
    val gap = (day(1, 3) ++ day(2, 1) ++ day(4, 1) ++ day(5, 3))
      .toDF(evCols: _*)
    val g1 = EventOps.acfDailyCounts(gap).collect()
      .find(_.getAs[Int]("lag") == 1).get
    assert(g1.getAs[Long]("n_pairs") == 4L, g1)
    assert(g1.getAs[Double]("acf") == -0.052632, g1) // round(-1/19, 6)
  }

  test("kmSurvivalHorizons: censoring respected, product telescopes by horizon") {
    // max day 03-31. u1 churns at duration 1, u2 at 7; u3 (full
    // window) and u4 (joined late, active at the end) are censored.
    def span(uid: Long, d0: Int, d1: Int) = Seq(
      (uid * 10, Timestamp.valueOf(f"2024-03-$d0%02d 10:00:00"), uid, "a", 1.0, "{}"),
      (uid * 10 + 1, Timestamp.valueOf(f"2024-03-$d1%02d 10:00:00"), uid, "a", 1.0, "{}"))
    val events = (span(1, 1, 1) ++ span(2, 1, 7) ++ span(3, 1, 31) ++
      span(4, 20, 31)).toDF(evCols: _*)
    val got = EventOps.kmSurvivalHorizons(events).collect()
      .map(r => r.getAs[Int]("horizon") ->
        ((r.getAs[Long]("n_churned"), r.getAs[Double]("survival")))).toMap
    // S(1) = 3/4; S(7) = 3/4 * 2/3 = 1/2; nothing churns past 7
    assert(got == Map(
      1 -> ((1L, 0.75)), 7 -> ((2L, 0.5)),
      14 -> ((2L, 0.5)), 30 -> ((2L, 0.5))), got)
    // the hazard curve is the same risk sets surfaced per tenure day:
    // h(1) = 1/4 (4 at risk), h(7) = 1/3 (u1 gone, censored still in)
    val hz = EventOps.hazardByTenure(events).collect()
      .map(r => r.getAs[Long]("tenure_days") ->
        ((r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_churned"),
          r.getAs[Double]("hazard")))).toMap
    assert(hz == Map(1L -> ((4L, 1L, 0.25)), 7L -> ((3L, 1L, 0.333333))), hz)
  }

  test("typeAssocRules: exact support/confidence/lift over distinct baskets") {
    // baskets: u1{a,b} u2{a,b} u3{a} u4{b,c}; duplicates collapse
    val events = Seq(
      ev(1, "2024-03-01", "a").copy(_3 = 1L), ev(2, "2024-03-02", "b").copy(_3 = 1L),
      ev(3, "2024-03-01", "b").copy(_3 = 1L), // dup (u1, b)
      ev(4, "2024-03-01", "a").copy(_3 = 2L), ev(5, "2024-03-01", "b").copy(_3 = 2L),
      ev(6, "2024-03-01", "a").copy(_3 = 3L),
      ev(7, "2024-03-01", "b").copy(_3 = 4L), ev(8, "2024-03-01", "c").copy(_3 = 4L),
    ).toDF(evCols: _*)
    val got = EventOps.typeAssocRules(events).collect()
      .map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) ->
        ((r.getAs[Long]("n_both"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))).toMap
    assert(got.size == 4, got) // (a,b) (b,a) (b,c) (c,b)
    assert(got(("a", "b")) == ((2L, 0.5, 0.666667, 0.888889)), got)
    assert(got(("c", "b")) == ((1L, 0.25, 1.0, 1.333333)), got)
  }

  test("bpeTrainRounds: greedy non-overlap merge, stats vs applied diverge") {
    // vocab: aaa (freq 2), banana (freq 1); 12 initial symbol
    // instances. Hand-traced rounds:
    //  r1: (a,a) stats 4 (overlaps counted) but only ONE merge fits
    //      per "aaa" -> n_merged 2, aaa becomes [aa, a], 12-2=10
    //  r2: tie at 2 between (a,n), (aa,a), (n,a) -> pair-ASC picks
    //      (a,n); banana's two occurrences are non-adjacent, both
    //      merge -> [b, an, an, a], 10-2=8
    //  r3: (aa,a) at 2 wins; aaa collapses to one symbol -> 8-2=6
    val docs = Seq(
      (1L, "aaa aaa", "s"), (2L, "banana", "s"),
    ).toDF("doc_id", "text", "source")
    val got = DocOps.bpeTrainRounds(docs).collect()
      .map(r => r.getAs[Int]("round") ->
        ((r.getAs[String]("sym1"), r.getAs[String]("sym2"),
          r.getAs[Long]("pair_count"), r.getAs[Long]("n_merged"),
          r.getAs[Long]("corpus_symbols_after")))).toMap
    assert(got == Map(
      1 -> (("a", "a", 4L, 2L, 10L)),
      2 -> (("a", "n", 2L, 2L, 8L)),
      3 -> (("aa", "a", 2L, 2L, 6L))), got)
  }

  test("bpeApplyMerges: held-out word gets sub-word tokens, in order") {
    // The merges the fixture corpus above learns, applied to a word
    // the trainer never saw. b-a-n-a-n-a-a-a (8 chars):
    //  (a,a): marks at pos 5,6 — one island, odd rank merges pos 5
    //         -> b a n a n aa a
    //  (a,n): non-adjacent marks at 1,3 — both merge -> b an an aa a
    //  (aa,a): -> b an an aaa
    // 4 sub-word tokens, NOT the 1 token whitespace tokenization
    // yields and not the 8-char split.
    val got = DocOps.bpeApplyMerges(
      Seq("bananaaa").toDF("word"),
      Seq(("a", "a"), ("a", "n"), ("aa", "a")))
      .orderBy("pos").as[(String, Long, String)].collect()
      .map(_._3).toSeq
    assert(got == Seq("b", "an", "an", "aaa"), got)
  }

  test("bpeTokenizeCounts: per-doc counts under the trained merges") {
    // Same corpus as the trainer fixture. End-of-training vocab:
    // aaa -> [aaa] (1 token), banana -> [b, an, an, a] (4 tokens).
    val docs = Seq(
      (1L, "aaa aaa", "s"), (2L, "banana", "s"),
    ).toDF("doc_id", "text", "source")
    val got = DocOps.bpeTokenizeCounts(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens_bpe"),
          r.getAs[Long]("n_tokens_char")))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 6L)),
      2L -> ((1L, 4L, 6L))), got)
  }

  test("growthAccounting: new/retained/resurrected/churned reconcile") {
    // u1: d1,d2,d4 (resurrects on d4); u2: d1 only (churns on d2);
    // u3: d3,d4 (new on d3, retained d4)
    def e(id: Long, d: Int, uid: Long) =
      (id, Timestamp.valueOf(f"2024-03-0$d 10:00:00"), uid, "a", 1.0, "{}")
    val events = Seq(
      e(1, 1, 1), e(2, 2, 1), e(3, 4, 1),
      e(4, 1, 2), e(5, 3, 3), e(6, 4, 3),
    ).toDF(evCols: _*)
    val got = EventOps.growthAccounting(events).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString.takeRight(2) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_churned")))).toMap
    assert(got == Map(
      "01" -> ((2L, 2L, 0L, 0L, 0L)),
      "02" -> ((1L, 0L, 1L, 0L, 1L)),
      "03" -> ((1L, 1L, 0L, 0L, 1L)),
      "04" -> ((2L, 0L, 1L, 1L, 0L))), got)
  }

  test("funnelLatency: interpolated percentiles of exact second gaps") {
    def e(id: Long, hm: String, uid: Long, t: String) =
      (id, Timestamp.valueOf(s"2024-03-01 $hm:00"), uid, t, 1.0, "{}")
    val events = Seq(
      e(1, "10:00", 1, "view"), e(2, "10:30", 1, "click"),
      e(3, "12:30", 1, "purchase"),
      e(4, "10:00", 2, "view"), e(5, "11:00", 2, "click"),
    ).toDF(evCols: _*)
    val got = EventOps.funnelLatency(events).collect()
      .map(r => r.getAs[String]("stage") ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("p50_minutes"),
          r.getAs[Double]("p90_minutes")))).toMap
    // view->click gaps {30, 60} min: p50 = 45, p90 = 57
    assert(got("view_to_click") == ((2L, 45.0, 57.0)), got)
    assert(got("click_to_purchase") == ((1L, 120.0, 120.0)), got)
  }

  test("psiTypeDrift: per-type drift terms; one-half-only types excluded") {
    def e(id: Long, hm: String, t: String) =
      (id, Timestamp.valueOf(s"2024-03-01 $hm:00"), 1L, t, 1.0, "{}")
    // midpoint = 12:00; half1 = {a,a,a,b}, half2 = {a,b,b,b,c,c}
    val events = Seq(
      e(1, "01:00", "a"), e(2, "02:00", "a"), e(3, "03:00", "a"),
      e(4, "04:00", "b"),
      e(5, "20:00", "a"), e(6, "22:00", "b"), e(7, "22:30", "b"),
      e(8, "23:00", "b"), e(9, "21:00", "c"), e(10, "21:30", "c"),
    ).toDF(evCols: _*)
    val got = EventOps.psiTypeDrift(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_first"), r.getAs[Long]("n_second"),
          r.getAs[Double]("psi_term")))).toMap
    // a: (1/6 - 3/4)·ln((1·4)/(3·6)); b: (3/6 - 1/4)·ln((3·4)/(1·6))
    assert(got == Map(
      "a" -> ((3L, 1L, 0.877378)),
      "b" -> ((1L, 3L, 0.173287))), got) // c: second half only -> excluded
  }

  test("ksValueDrift: max ECDF gap with bin attribution") {
    def e(id: Long, hm: String, v: Double) =
      (id, Timestamp.valueOf(s"2024-03-01 $hm:00"), 1L, "a", v, "{}")
    // half1 values {0, 1}, half2 {10, 11}: ECDFs fully separate at
    // bin 1 (gap 1.0, the first bin achieving the max)
    val events = Seq(
      e(1, "01:00", 0.2), e(2, "02:00", 1.7),
      e(3, "22:00", 10.4), e(4, "23:00", 11.9),
    ).toDF(evCols: _*)
    val r = EventOps.ksValueDrift(events).collect().head
    assert(r.getAs[Long]("n_first") == 2L && r.getAs[Long]("n_second") == 2L, r)
    assert(r.getAs[Double]("ks_stat") == 1.0, r)
    assert(r.getAs[Long]("at_bin") == 1L, r)
  }

  test("forecastBacktest: seasonal-naive beats naive on a planted weekly cycle") {
    // counts 5,1,1,1,1,1,1,5,1 over nine consecutive days: the 8th and
    // 9th days are the only scored ones (both lags exist); lag-7
    // predicts both exactly, lag-1 misses both by 4
    def day(d: Int, n: Int) = (0 until n).map(i =>
      ev(d * 100L + i, f"2024-03-0$d", "a"))
    val events = (day(1, 5) ++ (2 to 7).flatMap(day(_, 1)) ++ day(8, 5) ++
      day(9, 1)).toDF(evCols: _*)
    val r = EventOps.forecastBacktest(events).collect()
    assert(r.length == 1, r.toSeq)
    assert(r.head.getAs[Long]("n_days") == 2L, r.head)
    assert(r.head.getAs[Double]("mae_naive") == 4.0, r.head)
    assert(r.head.getAs[Double]("mae_seasonal") == 0.0, r.head)
    assert(r.head.getAs[Long]("seasonal_wins") == 2L, r.head)
  }

  test("constraintSuggestions: rules mined from the observed profile") {
    val df = Seq(
      (1L, Option("x"), 2.5), (2L, None, 2.5), (3L, Option("y"), 2.5),
    ).toDF("id", "name", "score")
    val got = ProfileOps.constraintSuggestions(df).collect()
      .map(r => (r.getAs[String]("col_name"), r.getAs[String]("rule")) ->
        ((Option(r.getAs[String]("lo")), Option(r.getAs[String]("hi")),
          r.getAs[Long]("support_rows")))).toMap
    // id: null-free + all-distinct + numeric; score: null-free +
    // numeric but NOT unique; name has a null -> no rules at all
    assert(got.keySet == Set(
      ("id", "not_null"), ("id", "unique"), ("id", "range"),
      ("score", "not_null"), ("score", "range")), got)
    assert(got(("id", "range")) == ((Some("1"), Some("3"), 3L)), got)
    assert(got(("score", "range")) == ((Some("2.5"), Some("2.5"), 3L)), got)
  }

  test("rfmSegments: aligned quintiles, ties broken by customer key") {
    import graft.ops.AggOps
    // five customers, one order each, recency/frequency/monetary all
    // aligned: quintiles land one customer each; frequency is a full
    // tie, so its 1..5 comes entirely from the custkey tie-break
    val orders = (1 to 5).map { i =>
      (i.toLong, i.toLong, "O", 600.0 - i * 100.0,
        Timestamp.valueOf(f"2024-03-${11 - i}%02d 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val got = AggOps.rfmSegments(orders).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        ((r.getAs[Long]("recency_days"), r.getAs[Double]("monetary"),
          r.getAs[String]("segment")))).toMap
    assert(got == Map(
      1L -> ((0L, 500.0, "111")), 2L -> ((1L, 400.0, "222")),
      3L -> ((2L, 300.0, "333")), 4L -> ((3L, 200.0, "444")),
      5L -> ((4L, 100.0, "555"))), got)
  }

  test("labelPropagationRounds: a barbell stays TWO communities " +
      "(where connected components would fuse it)") {
    import graft.ops.GraphOps
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"),   // left triangle
      ("x", "y"), ("x", "z"), ("y", "z"),   // right triangle
      ("c", "x"),                           // bridge
    ).toDF("src", "dst")
    val got = GraphOps.labelPropagationRounds(edges).collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Long]("n_members"))
      .toMap
    // hand-traced 3 synchronous rounds: {a,b,c} under label "a",
    // {x,y,z} under label "c" (labels are arbitrary ids; the SPLIT is
    // the point — CC would report one 6-node component)
    assert(got == Map("a" -> 3L, "c" -> 3L), got)
  }

  test("spearmanTypePairs: rank correlation is exactly ±1 on monotone " +
      "series where Pearson is not") {
    // daily counts over 3 days: up = 1,2,3; dn = 3,2,1; sq = 1,4,9.
    // Spearman(sq, up) = 1 (monotone, though nonlinear), the others −1.
    val events = (
      (1 to 3).flatMap(d => (1 to d).map(i =>
        ev(100L * d + i, f"2024-03-0$d", "up"))) ++
      (1 to 3).flatMap(d => (1 to (4 - d)).map(i =>
        ev(1000L + 100L * d + i, f"2024-03-0$d", "dn"))) ++
      (1 to 3).flatMap(d => (1 to d * d).map(i =>
        ev(10000L + 100L * d + i, f"2024-03-0$d", "sq")))
    ).toDF(evCols: _*)
    val got = graft.ops.EventOps.spearmanTypePairs(events).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        r.getAs[Double]("spearman_rho")).toMap
    assert(got == Map(
      ("dn", "sq") -> -1.0, ("dn", "up") -> -1.0, ("sq", "up") -> 1.0),
      got.toString)
  }

  test("mannWhitneyTypePairs: hand-traced U and tie-corrected z; " +
      "all-tied pair yields NULL z") {
    def e(id: Long, t: String, v: Double) =
      (id, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // pair (a, b): a = {1, 2}, b = {3, 4} — fully separated.
    // Ranks 1..4, R_a = 3 → U_a = 0; z = (0 − 2)/sqrt(4/12·5)
    // = −2/1.29099 = −1.549193 → −1.5492.
    // pair (c, d): all four values tied at 1 → variance 0 → z NULL,
    // U_a = n1·n2/2 = 2 (u2 = 4): the no-evidence midpoint.
    val events = Seq(
      e(1, "a", 1.0), e(2, "a", 2.0), e(3, "b", 3.0), e(4, "b", 4.0),
      e(5, "c", 1.0), e(6, "c", 1.0), e(7, "d", 1.0), e(8, "d", 1.0),
    ).toDF(evCols: _*)
    val got = EventOps.mannWhitneyTypePairs(events).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("u2_a"),
          Option(r.getAs[java.lang.Double]("z")).map(_.toDouble)))).toMap
    assert(got(("a", "b")) == ((2L, 2L, 0L, Some(-1.5492))), got.toString)
    assert(got(("c", "d")) == ((2L, 2L, 4L, None)), got.toString)
    // cross pairs exist too (a-c etc.) — just check the count
    assert(got.size == 6, got.toString)
  }

  test("theilSenTrendByType: exact slope on linear growth, 29% outlier ignored") {
    // lin: d+1 events on day d → every pairwise slope exactly 1.
    // burst: constant 2/day except one 30-event spike — 15 of 21
    // pairwise slopes are 0, so the median slope is 0 (OLS would bend).
    val events = ((0 to 6).flatMap(d => (0 to d).map(i =>
      ev(100L * d + i, f"2024-03-${d + 1}%02d", "lin"))) ++
      (0 to 6).flatMap { d =>
        val n = if (d == 3) 30 else 2
        (1 to n).map(i => ev(10000L + 100L * d + i,
          f"2024-03-${d + 1}%02d", "burst"))
      }).toDF(evCols: _*)
    val got = graft.ops.EventOps.theilSenTrendByType(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("theil_sen_slope"))))
      .toMap
    assert(got == Map("lin" -> ((21L, 1.0)), "burst" -> ((21L, 0.0))),
      got.toString)
  }

  test("personalizedPageRank: mass concentrates around the seed; " +
      "components not reaching it score zero") {
    import graft.ops.GraphOps
    val edges = Seq(
      ("purchase", "a", 1L), ("a", "purchase", 1L),
      ("b", "purchase", 1L), ("purchase", "b", 1L),
      ("x", "y", 1L), ("y", "x", 1L),    // disconnected from the seed
    ).toDF("src", "dst", "weight")
    val ppr = GraphOps.personalizedPageRank(edges, "purchase")
      .collect().map(r => r.getAs[String]("node") ->
        r.getAs[Double]("ppr")).toMap
    assert(ppr("x") == 0.0 && ppr("y") == 0.0, ppr.toString)
    assert(ppr("purchase") > ppr("a") && ppr("a") > 0.0, ppr.toString)
    assert(ppr("a") == ppr("b"), ppr.toString) // symmetric neighbors
    val e = intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(edges, "nope")
    }
    assert(e.getMessage.contains("seed"), e.getMessage)
  }

  test("kAnonymityProfile: class-size histogram, below_k marks the risky rows") {
    // QI = (event_type, day). Classes: (a, 03-01) size 3, (a, 03-02)
    // size 1, (b, 03-01) size 1 → histogram {3→1 class, 1→2 classes}.
    val events = Seq(
      ev(1, "2024-03-01", "a"), ev(2, "2024-03-01", "a"),
      ev(3, "2024-03-01", "a"),
      ev(4, "2024-03-02", "a"), ev(5, "2024-03-01", "b"),
    ).toDF(evCols: _*)
    val got = EventOps.kAnonymityProfile(events, k = 2).collect()
      .map(r => r.getAs[Long]("class_size") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Boolean]("below_k")))).toMap
    assert(got == Map(
      3L -> ((1L, 3L, false)),
      1L -> ((2L, 2L, true))), got.toString)
  }

  test("targetEncodePriority: rare category shrinks to prior, m=0 is the raw rate") {
    import graft.ops.AggOps
    // A: 3 orders, 1 returned; B: 1 order, 1 returned. prior = 2/4 = 0.5.
    // lineitem re-lists order 1's return twice — the distinct must
    // collapse it to one label, and order 2's 'N' line is not a return.
    val orders = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq((1L, "R"), (1L, "R"), (2L, "N"), (4L, "R"))
      .toDF("l_orderkey", "l_returnflag")
    val smoothed = AggOps.targetEncodePriority(orders, li, m = 20)
      .collect().map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_ret"),
          r.getAs[Double]("prior"), r.getAs[Double]("enc_smoothed")))).toMap
    // enc_A = (1 + 20·0.5)/(3 + 20) = 11/23 → 0.478261 (raw rate 1/3);
    // enc_B = 11/21 → 0.52381: the rare category lands NEAR the prior
    // 0.5 instead of its raw rate 1.0 — the anti-memorization point.
    assert(smoothed == Map(
      "A" -> ((3L, 1L, 0.5, 0.478261)),
      "B" -> ((1L, 1L, 0.5, 0.52381))), smoothed)
    // m = 0 disables shrinkage: the encode is the raw per-category rate
    val raw = AggOps.targetEncodePriority(orders, li, m = 0)
      .collect().map(r => r.getAs[String]("o_orderpriority") ->
        r.getAs[Double]("enc_smoothed")).toMap
    assert(raw == Map("A" -> 0.333333, "B" -> 1.0), raw)
  }

  test("ucbTypePolicy: exact Bernoulli counts, UCB1 index from the closed form") {
    // arm x: 4 plays, 1 high-value; arm y: 4 plays, 3 high-value. N=8.
    val events = (Seq(60.0, 10.0, 10.0, 10.0).map(("x", _)) ++
      Seq(60.0, 70.0, 80.0, 10.0).map(("y", _))).zipWithIndex
      .map { case ((t, v), i) =>
        (i.toLong, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
      }.toDF(evCols: _*)
    val got = EventOps.ucbTypePolicy(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_plays"), r.getAs[Long]("n_success"),
          r.getAs[Double]("mean_reward"), r.getAs[Double]("ucb_score")))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bonus = math.sqrt(2.0 * math.log(8.0) / 4.0)
    assert(got == Map(
      "x" -> ((4L, 1L, 0.25, r6(0.25 + bonus))),
      "y" -> ((4L, 3L, 0.75, r6(0.75 + bonus)))), got)
  }

  test("dowSeasonalityIndex: arithmetic isodow buckets and exact " +
    "ratio-to-overall indices") {
    // Mondays 03-04 (2 events) and 03-11 (4) -> isodow 1: avg 3.0;
    // Tuesday 03-05 (1) -> isodow 2: avg 1.0; overall avg 7/3.
    val events = (Seq.fill(2)("2024-03-04") ++ Seq("2024-03-05") ++
      Seq.fill(4)("2024-03-11")).zipWithIndex
      .map { case (d, i) => ev(i.toLong, d, "a") }.toDF(evCols: _*)
    val got = EventOps.dowSeasonalityIndex(events).collect()
      .map(r => r.getAs[Long]("isodow") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("n_events"),
          r.getAs[Double]("avg_per_day"),
          r.getAs[Double]("seasonality_index")))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      1L -> ((2L, 6L, 3.0, r6(3.0 / (7.0 / 3.0)))),
      2L -> ((1L, 1L, 1.0, r6(1.0 / (7.0 / 3.0))))), got)
  }

  test("cupedAdjustedAb: hand-traced theta shrinks the confounded " +
    "raw diff") {
    // x (pre) cents 1000/2000/3000/4000, y (post) 2000/4000/6200/8000.
    // theta = (4·60.6e6 − 1e4·2.02e4)/(4·3.0e7 − 1e8) = 2.02.
    // arm0 = even users {2,4}: ȳ=60, x̄=30; arm1 = {1,3}: ȳ=41, x̄=20;
    // x̄_all=25 -> adj diff = (60−2.02·5) − (41+2.02·5) = −1.2 where
    // the raw diff read +19: the pre-period imbalance was the signal.
    def cev(i: Long, uid: Long, sec: Int, v: Double) =
      (i, Timestamp.valueOf(f"2024-03-01 10:00:$sec%02d"), uid, "a", v, "{}")
    val events = Seq(
      cev(1, 1L, 0, 10.0), cev(2, 1L, 10, 20.0),
      cev(3, 2L, 0, 20.0), cev(4, 2L, 10, 40.0),
      cev(5, 3L, 0, 30.0), cev(6, 3L, 10, 62.0),
      cev(7, 4L, 0, 40.0), cev(8, 4L, 10, 80.0)).toDF(evCols: _*)
    val r = EventOps.cupedAdjustedAb(events).collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Double]("mean_y_a"), r.getAs[Double]("mean_y_b"),
      r.getAs[Double]("raw_diff"), r.getAs[Double]("theta"),
      r.getAs[Double]("adj_diff")) ==
      ((2L, 2L, 60.0, 41.0, 19.0, 2.02, -1.2)), r)
  }

  test("positionAttribution: 40/20/40 micro-credits by touch position, " +
    "single-touch gets all") {
    def aev(i: Long, uid: Long, time: String, t: String) =
      (i, Timestamp.valueOf(s"2024-03-01 $time"), uid, t, 1.0, "{}")
    val events = Seq(
      // user 1: view (first) -> click (mid) -> error (last) -> purchase
      aev(1, 1L, "09:00:00", "view"), aev(2, 1L, "09:30:00", "click"),
      aev(3, 1L, "09:45:00", "error"), aev(4, 1L, "10:00:00", "purchase"),
      // user 2: one view then purchase -> the view gets 100%
      aev(5, 2L, "09:00:00", "view"), aev(6, 2L, "10:00:00", "purchase"))
      .toDF(evCols: _*)
    val got = EventOps.positionAttribution(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Long]("attributed_micro"),
          r.getAs[Double]("attributed_conversions")))).toMap
    assert(got == Map(
      "view" -> ((2L, 1400000L, 1.4)),
      "click" -> ((1L, 200000L, 0.2)),
      "error" -> ((1L, 400000L, 0.4))), got)
  }

  test("fanoFactorByType: dense-minute variance-to-mean with zeros " +
    "by algebra, burstiness flag at 1.5") {
    def fev(i: Long, time: String, t: String) =
      (i, Timestamp.valueOf(s"2024-03-01 $time"), 1L, t, 1.0, "{}")
    // span 10:00:00-10:02:30 -> m = 3 minutes. Type a: counts
    // [2,0,1] -> Fano (3·5−9)/9 = 2/3; type b: [4,0,0] -> 32/12.
    val events = Seq(
      fev(1, "10:00:00", "a"), fev(2, "10:00:30", "a"),
      fev(3, "10:02:30", "a"),
      fev(4, "10:00:01", "b"), fev(5, "10:00:02", "b"),
      fev(6, "10:00:03", "b"), fev(7, "10:00:04", "b")).toDF(evCols: _*)
    val got = EventOps.fanoFactorByType(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_minutes"),
          r.getAs[Double]("fano"), r.getAs[Boolean]("bursty")))).toMap
    assert(got == Map(
      "a" -> ((3L, 3L, 0.666667, false)),
      "b" -> ((4L, 3L, 2.666667, true))), got)
  }

  test("valuePsiDrift: add-one-smoothed micro-unit terms match the " +
    "hand formula") {
    def dev(i: Long, sec: Int, v: Double) =
      (i, Timestamp.valueOf(f"2024-03-01 10:00:$sec%02d"), 1L, "a", v, "{}")
    // half1 bins {0:2, 1:1}, half2 {0:1, 1:2} -> smoothed shares
    // .6/.4 both directions
    val events = Seq(dev(1, 0, 0.5), dev(2, 1, 0.5), dev(3, 2, 1.5),
      dev(4, 8, 1.5), dev(5, 9, 1.5), dev(6, 10, 0.5)).toDF(evCols: _*)
    val r = EventOps.valuePsiDrift(events).collect().head
    val term = math.rint((3.0 / 5.0 - 2.0 / 5.0) *
      math.log((3.0 / 5.0) / (2.0 / 5.0)) * 1e6)
    val expect = math.rint(2.0 * term / 1e6 * 1e6) / 1e6
    assert((r.getAs[Long]("n_first"), r.getAs[Long]("n_second"),
      r.getAs[Long]("n_bins"), r.getAs[Double]("psi")) ==
      ((3L, 3L, 2L, expect)), r)
  }

  test("quantileTreatmentEffect: per-arm interpolated quantiles and " +
    "cent-exact effects") {
    def qev(i: Long, uid: Long, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), uid, "a", v, "{}")
    // arm0 = {2,4} totals {10,30}; arm1 = {1,3} totals {20,40}
    val events = Seq(qev(1, 2L, 10.0), qev(2, 4L, 30.0),
      qev(3, 1L, 20.0), qev(4, 3L, 40.0)).toDF(evCols: _*)
    val got = EventOps.quantileTreatmentEffect(events, Seq(0.25, 0.5))
      .collect().map(r => r.getAs[Double]("tau") ->
        ((r.getAs[Double]("q_a"), r.getAs[Double]("q_b"),
          r.getAs[Double]("qte")))).toMap
    assert(got == Map(
      0.25 -> ((15.0, 25.0, -10.0)),
      0.5 -> ((20.0, 30.0, -10.0))), got)
  }

  test("betaPosteriorArms: Beta(s+1, n-s+1) closed forms match the " +
    "hand computation") {
    // 4 plays, 1 success -> Beta(2,4): mean 1/3, var 8/(36·7)
    val events = Seq(60.0, 10.0, 10.0, 10.0).zipWithIndex
      .map { case (v, i) =>
        (i.toLong, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, "x", v, "{}")
      }.toDF(evCols: _*)
    val r = EventOps.betaPosteriorArms(events).collect().head
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mean = 2.0 / 6.0
    val sd = math.sqrt(2.0 * 4.0 / (6.0 * 6.0 * 7.0))
    assert((r.getAs[Long]("n_plays"), r.getAs[Long]("n_success"),
      r.getAs[Double]("post_mean"), r.getAs[Double]("post_sd"),
      r.getAs[Double]("ci_low"), r.getAs[Double]("ci_high")) ==
      ((4L, 1L, r6(mean), r6(sd),
        r6(mean - 1.959964 * sd), r6(mean + 1.959964 * sd))), r)
  }

  test("pinballLossByType: milli-unit exact losses, per-type median " +
    "halves the global loss on the planted split") {
    def pv(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // a: {1,3} (median 2), b: {5,7} (median 6); global median 4
    val events = Seq(pv(1, "a", 1.0), pv(2, "a", 3.0),
      pv(3, "b", 5.0), pv(4, "b", 7.0)).toDF(evCols: _*)
    val got = EventOps.pinballLossByType(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("q_type"),
          r.getAs[Double]("loss_global"), r.getAs[Double]("loss_type"),
          r.getAs[Double]("improvement")))).toMap
    assert(got == Map(
      "a" -> ((2L, 2.0, 1.0, 0.5, 0.5)),
      "b" -> ((2L, 6.0, 1.0, 0.5, 0.5))), got)
  }

  test("welchTtestAb: integer closed-form variances, hand-traced t " +
    "and Satterthwaite df") {
    // arm0 totals {10, 20}: var 50, v/n 25; arm1 {10, 30}: var 200,
    // v/n 100 -> t = −5/√125, df = 125²/(625 + 10000)
    def uev(i: Long, uid: Long, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), uid, "a", v, "{}")
    val events = Seq(uev(1, 2L, 10.0), uev(2, 4L, 20.0),
      uev(3, 1L, 10.0), uev(4, 3L, 30.0)).toDF(evCols: _*)
    val r = EventOps.welchTtestAb(events).collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Double]("mean_a"), r.getAs[Double]("mean_b"),
      r.getAs[Double]("t_stat"), r.getAs[Double]("df")) ==
      ((2L, 2L, 15.0, 20.0, -0.447214, 1.470588)), r)
  }

  test("scoreGainsDeciles: pre-period score ranks users, post-period " +
    "capture and lift per decile") {
    def gev(i: Long, uid: Long, sec: Int, t: String, v: Double) =
      (i, Timestamp.valueOf(f"2024-03-01 10:00:$sec%02d"), uid, t, v, "{}")
    // scores 4000/3000/2000/1000 cents; converters u1, u3 (post
    // purchase >= 90); 4 users over ntile(10) -> deciles 1..4
    val events = Seq(
      gev(1, 1L, 0, "view", 40.0), gev(2, 1L, 10, "purchase", 95.0),
      gev(3, 2L, 0, "view", 30.0), gev(4, 2L, 10, "view", 10.0),
      gev(5, 3L, 0, "view", 20.0), gev(6, 3L, 10, "purchase", 95.0),
      gev(7, 4L, 0, "view", 10.0), gev(8, 4L, 10, "purchase", 10.0))
      .toDF(evCols: _*)
    val got = EventOps.scoreGainsDeciles(events).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_conv"),
          r.getAs[Double]("conv_rate"), r.getAs[Long]("cum_conv"),
          r.getAs[Double]("cum_capture"), r.getAs[Double]("lift")))).toMap
    assert(got == Map(
      1L -> ((1L, 1L, 1.0, 1L, 0.5, 2.0)),
      2L -> ((1L, 0L, 0.0, 1L, 0.5, 0.0)),
      3L -> ((1L, 1L, 1.0, 2L, 1.0, 2.0)),
      4L -> ((1L, 0L, 0.0, 2L, 1.0, 0.0))), got)
  }

  test("cohortLtvCurve: per-cohort cumulative cents and LTV at " +
    "observed ages") {
    def lev(i: Long, uid: Long, day: String, v: Double) =
      (i, Timestamp.valueOf(s"$day 10:00:00"), uid, "a", v, "{}")
    // cohort 03-01 = users {1,2}: day0 spend 1.00+3.00, day2 2.00;
    // cohort 03-02 = user 3: day0 spend 5.00
    val events = Seq(lev(1, 1L, "2024-03-01", 1.0),
      lev(2, 2L, "2024-03-01", 3.0), lev(3, 1L, "2024-03-03", 2.0),
      lev(4, 3L, "2024-03-02", 5.0)).toDF(evCols: _*)
    val got = EventOps.cohortLtvCurve(events).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("age")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("cum_cents"),
          r.getAs[Double]("ltv_per_user")))).toMap
    assert(got == Map(
      ("2024-03-01", 0L) -> ((2L, 400L, 2.0)),
      ("2024-03-01", 2L) -> ((2L, 600L, 3.0)),
      ("2024-03-02", 0L) -> ((1L, 500L, 5.0))), got)
  }

  test("partAffinityPairs: basket-bounded pair counts with exact " +
    "support and lift") {
    // orders: o1{1,2,3} o2{1,2} o3{1,2} o4{3} -> only (1,2) reaches
    // minPairs 3; df1=df2=3, n_orders=4 -> lift = 3·4/(3·3)
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 3L), (4L, 3L)) // dup line collapses
      .toDF("l_orderkey", "l_partkey")
    val got = MiningOps.partAffinityPairs(li).collect()
    assert(got.length == 1, got.mkString(", "))
    val r = got.head
    assert((r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
      r.getAs[Long]("n_pair"), r.getAs[Long]("df_a"),
      r.getAs[Long]("df_b"), r.getAs[Double]("support"),
      r.getAs[Double]("lift")) ==
      ((1L, 2L, 3L, 3L, 3L, 0.75, 1.333333)), r)
  }

  test("valueWassersteinDrift: unit-bin earth mover equals the " +
    "hand-integrated |F1-F2|") {
    // half 1 mass at bins {0,1}, half 2 at {2,3} — a shift by exactly
    // 2 bins, so W1 = 2.0. (KS on the same fixture would read 1.0 and
    // say nothing about the shift size.)
    def tev(i: Long, sec: Int, v: Double) =
      (i, Timestamp.valueOf(f"2024-03-01 10:00:$sec%02d"), 1L, "a", v, "{}")
    val events = Seq(tev(1, 0, 0.4), tev(2, 1, 1.2),
      tev(3, 9, 2.5), tev(4, 10, 3.7)).toDF(evCols: _*)
    val r = EventOps.valueWassersteinDrift(events).collect().head
    assert((r.getAs[Long]("n_first"), r.getAs[Long]("n_second"),
      r.getAs[Double]("w1_distance")) == ((2L, 2L, 2.0)), r)
  }

  test("rollingMedianDaily: exact interpolated window medians over " +
    "the zero-filled calendar") {
    // daily counts 03-01..05: [1, 9, 2, 0(zero-filled), 3]
    val events = (Seq.fill(1)("2024-03-01") ++ Seq.fill(9)("2024-03-02") ++
      Seq.fill(2)("2024-03-03") ++ Seq.fill(3)("2024-03-05")).zipWithIndex
      .map { case (d, i) => ev(i.toLong, d, "a") }.toDF(evCols: _*)
    val got = EventOps.rollingMedianDaily(events).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("n"), r.getAs[Long]("w_size"),
          r.getAs[Double]("med_window"),
          Option(r.getAs[java.lang.Double]("ratio")).map(_.toDouble)))).toMap
    assert(got == Map(
      "2024-03-01" -> ((1L, 4L, 1.5, Some(0.666667))), // [0,1,2,9] -> 1.5
      "2024-03-02" -> ((9L, 5L, 2.0, Some(4.5))),
      "2024-03-03" -> ((2L, 5L, 2.0, Some(1.0))),
      "2024-03-04" -> ((0L, 5L, 2.0, Some(0.0))),      // zero-filled day
      "2024-03-05" -> ((3L, 4L, 2.5, Some(1.2)))), got)
  }

  test("valueAucByType: midrank one-vs-rest AUC, ties count half") {
    // a: {1, 2, 3}; b: {2, 4}. Pair score a-vs-b: wins 1 (3>2),
    // ties 1 (2=2) -> U_a = 1.5 of 6 -> AUC_a = 0.25, AUC_b = 0.75.
    val events = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 4.0).map(("b", _))).zipWithIndex
      .map { case ((t, v), i) =>
        (i.toLong, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
      }.toDF(evCols: _*)
    val got = EventOps.valueAucByType(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Double]("auc")))).toMap
    assert(got == Map("a" -> ((3L, 2L, 0.25)), "b" -> ((2L, 3L, 0.75))), got)
  }

  test("scoreCalibrationBins: closed-form mean/Brier equal the " +
    "direct per-row definitions") {
    // min 0, max 100 -> p = value/100. Rows: (0, view) bin 0;
    // (100, purchase) bin 9 (clamped); (50, view) + (55, purchase)
    // both bin 5: mean .525, rate .5, brier (0.5² + 0.45²)/2 = .22625
    val events = Seq((1L, 0.0, "view"), (2L, 100.0, "purchase"),
      (3L, 50.0, "view"), (4L, 55.0, "purchase"))
      .map { case (i, v, t) =>
        (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
      }.toDF(evCols: _*)
    val got = EventOps.scoreCalibrationBins(events).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("mean_score"), r.getAs[Double]("pos_rate"),
          r.getAs[Double]("brier")))).toMap
    assert(got == Map(
      0L -> ((1L, 0L, 0.0, 0.0, 0.0)),
      9L -> ((1L, 1L, 1.0, 1.0, 0.0)),
      5L -> ((2L, 1L, 0.525, 0.5, 0.22625))), got)
  }

  test("abConversionZtest: exact cells, zero-diff z, and the " +
    "zero-variance NULL guard") {
    def pev(i: Long, uid: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), uid, t, v, "{}")
    // arm 0 = even users {2: converted, 4: not}; arm 1 = {1: converted,
    // 3: purchase below threshold}. Rates .5/.5 -> z = 0, not significant.
    val events = Seq(pev(1, 1L, "purchase", 95.0), pev(2, 2L, "purchase", 100.0),
      pev(3, 3L, "purchase", 10.0), pev(4, 4L, "view", 200.0))
      .toDF(evCols: _*)
    val r = EventOps.abConversionZtest(events).collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("conv_b")) == ((2L, 1L, 2L, 1L)), r)
    assert(r.getAs[Double]("z_score") == 0.0 && !r.getAs[Boolean]("significant"))
    // saturated outcome: every user converts -> zero pooled variance
    // -> NULL z, false flag (not a division error under ANSI mode)
    val sat = Seq(pev(1, 1L, "purchase", 95.0), pev(2, 2L, "purchase", 100.0))
      .toDF(evCols: _*)
    val rs = EventOps.abConversionZtest(sat).collect().head
    assert(rs.isNullAt(rs.fieldIndex("z_score")) &&
      !rs.getAs[Boolean]("significant"), rs)
  }

  test("brownForsytheDaily: doubled-median deviations on the dense " +
    "grid give the hand-computed F") {
    // Three dense days. Type a daily counts 1,2,3 (med 2 -> z2 =
    // 2,0,2: s=4, ss=8); type b counts 5,0,1 — day 2 is a ZERO-FILL
    // (med 1 -> z2 = 8,2,0: s=10, ss=68). k=2, D=3:
    //   bNum = 2·(16+100) − 14² = 36   wNum = 3·76 − 116 = 112
    //   F = (4/1)·(36/(2·112)) = 0.642857...
    def de(id: Long, day: String, t: String) = ev(id, day, t)
    val events = (
      Seq(de(1, "2024-03-01", "a")) ++
        (2L to 3L).map(i => de(i, "2024-03-02", "a")) ++
        (4L to 6L).map(i => de(i, "2024-03-03", "a")) ++
        (7L to 11L).map(i => de(i, "2024-03-01", "b")) ++
        Seq(de(12, "2024-03-03", "b"))
      ).toDF(evCols: _*)
    val r = EventOps.brownForsytheDaily(events).collect().head
    assert((r.getAs[Long]("n_types"), r.getAs[Long]("n_days"),
      r.getAs[Long]("n_total"), r.getAs[Long]("df1"),
      r.getAs[Long]("df2")) == ((2L, 3L, 6L, 1L, 4L)), r)
    assert(r.getAs[Double]("bf_f") == 0.642857, r)
    // constant spread in every group (identical counts each day)
    // -> W = 0 -> NULL F, not a division error
    val flat = (1L to 4L).map(i =>
      de(i, s"2024-03-0${(i - 1) % 2 + 1}", if (i <= 2) "a" else "b"))
      .toDF(evCols: _*)
    val rf = EventOps.brownForsytheDaily(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("bf_f")), rf)
  }

  test("anovaValueByType: hand-computed F and eta-squared on a " +
    "two-group split; zero within-variance yields NULL F") {
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // cents a = [1,2,3], b = [5,5]: A = 36/3 + 100/2 = 62, S = 16,
    // N = 5 -> SSB = 62 - 51.2 = 10.8, SSW = 64 - 62 = 2,
    // F = (10.8/1)/(2/3) = 16.2, eta^2 = 10.8/12.8 = 0.84375
    val events = Seq(pev(1, "a", 0.01), pev(2, "a", 0.02),
      pev(3, "a", 0.03), pev(4, "b", 0.05), pev(5, "b", 0.05))
      .toDF(evCols: _*)
    val r = EventOps.anovaValueByType(events).collect().head
    assert((r.getAs[Long]("n_types"), r.getAs[Long]("n_total"),
      r.getAs[Long]("df1"), r.getAs[Long]("df2")) == ((2L, 5L, 1L, 3L)), r)
    assert(r.getAs[Double]("f_stat") == 16.2 &&
      r.getAs[Double]("eta_sq") == 0.84375, r)
    // all values equal WITHIN each group: SSW = 0 -> NULL F, eta = 1
    val flat = Seq(pev(1, "a", 0.02), pev(2, "a", 0.02), pev(3, "b", 0.05))
      .toDF(evCols: _*)
    val rf = EventOps.anovaValueByType(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("f_stat")) &&
      rf.getAs[Double]("eta_sq") == 1.0, rf)
  }

  test("jarqueBeraByType: moments match the pinned closed form " +
    "recomputed in-test; constant values yield NULLs") {
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // cents [1,2,3,6]: mu=3, q2=12.5, q3=63, q4=348.5 ->
    // m2=3.5, m3=4.5, m4=24.5, exk = 24.5/12.25 - 3 = -1
    val events = Seq(pev(1, "a", 0.01), pev(2, "a", 0.02),
      pev(3, "a", 0.03), pev(4, "a", 0.06)).toDF(evCols: _*)
    val r = EventOps.jarqueBeraByType(events).collect().head
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val skew = 4.5 / (3.5 * math.sqrt(3.5))
    val exk = -1.0
    assert(r.getAs[Long]("n") == 4L, r)
    assert(r.getAs[Double]("skewness") == r6(skew), r)
    assert(r.getAs[Double]("ex_kurtosis") == -1.0, r)
    assert(r.getAs[Double]("jb_stat") ==
      r6(4.0 / 6.0 * (skew * skew + exk * exk / 4.0)), r)
    // constant values: m2 = 0 -> every stat NULL, count intact
    val flat = Seq(pev(1, "a", 0.05), pev(2, "a", 0.05)).toDF(evCols: _*)
    val rf = EventOps.jarqueBeraByType(flat).collect().head
    assert(rf.getAs[Long]("n") == 2L &&
      rf.isNullAt(rf.fieldIndex("skewness")) &&
      rf.isNullAt(rf.fieldIndex("jb_stat")), rf)
  }

  test("ljungBoxDaily: Q = 9.0 on the alternating 1,2,1,2 series; " +
    "a constant series yields NULL Q") {
    // daily counts [1,2,1,2]: d = [-2,2,-2,2], den = 16;
    // r1 = -0.75, r2 = 0.5, r3 = -0.25 ->
    // Q = 4*6*(0.5625/3 + 0.25/2 + 0.0625/1) = 24*0.375 = 9.0
    val events = Seq(
      ev(1, "2024-03-01", "a"),
      ev(2, "2024-03-02", "a"), ev(3, "2024-03-02", "a"),
      ev(4, "2024-03-03", "a"),
      ev(5, "2024-03-04", "a"), ev(6, "2024-03-04", "a"),
    ).toDF(evCols: _*)
    val r = EventOps.ljungBoxDaily(events).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("k_lags")) ==
      ((4L, 3L)), r)
    assert(r.getAs[Double]("lb_q") == 9.0, r)
    // constant series: zero denominator -> NULL Q, lags still counted
    val flat = Seq(ev(1, "2024-03-01", "a"), ev(2, "2024-03-02", "a"))
      .toDF(evCols: _*)
    val rf = EventOps.ljungBoxDaily(flat).collect().head
    assert(rf.getAs[Long]("n_days") == 2L &&
      rf.isNullAt(rf.fieldIndex("lb_q")), rf)
  }

  test("theilIndexActivity: micro-pinned entropy terms match an " +
    "in-test replay; perfect equality gives exactly zero") {
    def pev(i: Long, u: Long) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), u, "view", 1.0, "{}")
    // activities x = [1, 1, 2]: n = 3, S = 4, ratios r = [.75, .75, 1.5]
    val events = Seq(pev(1, 1L), pev(2, 2L), pev(3, 3L), pev(4, 3L))
      .toDF(evCols: _*)
    val r = EventOps.theilIndexActivity(events).collect().head
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    def micro(x: Double) = math.round(x * 1e6)
    val ratios = Seq(0.75, 0.75, 1.5)
    val t = ratios.map(x => micro(x * math.log(x))).sum / 1e6 / 3.0
    val l = ratios.map(x => micro(-math.log(x))).sum / 1e6 / 3.0
    assert(r.getAs[Long]("n_users") == 3L, r)
    assert(r.getAs[Double]("mean_activity") == r6(4.0 / 3.0), r)
    assert(r.getAs[Double]("theil_t") == r6(t), r)
    assert(r.getAs[Double]("theil_l") == r6(l), r)
    // equal activity everywhere: every ratio 1 -> both indices 0
    val eq = Seq(pev(1, 1L), pev(2, 2L), pev(3, 3L)).toDF(evCols: _*)
    val re = EventOps.theilIndexActivity(eq).collect().head
    assert(re.getAs[Double]("theil_t") == 0.0 &&
      re.getAs[Double]("theil_l") == 0.0, re)
  }

  test("grubbsDaily: earliest max-deviate day wins the tie and G " +
    "matches the hand chain; constant series yields NULL G") {
    // counts [1,2,1,2]: every |n*y - S| = 2, tie -> earliest day;
    // G = 0.5 / sqrt(1/3) = 0.866025
    val events = Seq(
      ev(1, "2024-03-01", "a"),
      ev(2, "2024-03-02", "a"), ev(3, "2024-03-02", "a"),
      ev(4, "2024-03-03", "a"),
      ev(5, "2024-03-04", "a"), ev(6, "2024-03-04", "a"),
    ).toDF(evCols: _*)
    val r = EventOps.grubbsDaily(events).collect().head
    assert(r.getAs[Long]("n_days") == 4L &&
      r.getAs[java.sql.Date]("suspect_day").toString == "2024-03-01" &&
      r.getAs[Long]("cnt") == 1L, r)
    assert(r.getAs[Double]("g_stat") == 0.866025, r)
    // constant daily counts: zero variance -> NULL G
    val flat = (1L to 3L).map(i => ev(i, s"2024-03-0$i", "a"))
      .toDF(evCols: _*)
    val rf = EventOps.grubbsDaily(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("g_stat")), rf)
  }

  test("pageHinkleyByType: exact micro-unit PH statistics flag the " +
    "up-shift day as peak and mirror on a down-shift") {
    // counts [1,1,4]: m = [0, 0, +2e6 micro] -> ph_inc peaks at day 3
    val up = Seq(
      ev(1, "2024-03-01", "a"),
      ev(2, "2024-03-02", "a"),
      ev(3, "2024-03-03", "a"), ev(4, "2024-03-03", "a"),
      ev(5, "2024-03-03", "a"), ev(6, "2024-03-03", "a"),
    ).toDF(evCols: _*)
    val got = EventOps.pageHinkleyByType(up).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Double]("ph_inc"), r.getAs[Double]("ph_dec"),
          r.getAs[Boolean]("is_peak")))).toMap
    assert(got == Map(
      "2024-03-01" -> ((0.0, 0.0, false)),
      "2024-03-02" -> ((0.0, 0.0, false)),
      "2024-03-03" -> ((2.0, 0.0, true))), got)
    // counts [4,4,1]: m = [0, 0, -2e6] -> ph_dec 2.0 on day 3
    val down = Seq(
      ev(1, "2024-03-01", "a"), ev(2, "2024-03-01", "a"),
      ev(3, "2024-03-01", "a"), ev(4, "2024-03-01", "a"),
      ev(5, "2024-03-02", "a"), ev(6, "2024-03-02", "a"),
      ev(7, "2024-03-02", "a"), ev(8, "2024-03-02", "a"),
      ev(9, "2024-03-03", "a"),
    ).toDF(evCols: _*)
    val d3 = EventOps.pageHinkleyByType(down).collect()
      .find(_.getAs[java.sql.Date]("day").toString == "2024-03-03").get
    assert(d3.getAs[Double]("ph_dec") == 2.0 &&
      d3.getAs[Double]("ph_inc") == 0.0, d3)
  }

  test("kpssDaily: exact integer eta = 1.0 on the alternating series; " +
    "constant series yields NULL") {
    // y = [1,2,1,2]: e' = [-2,2,-2,2], S' = [-2,0,-2,0] -> sum S'^2 = 8
    // gammas: g0=16, g1=-12, g2=8, g3=-4; D = 8*16 + 14*(-12) +
    // 12*8 + 10*(-4) = 16; eta = 8*8/(4*16) = 1.0
    val events = Seq(
      ev(1, "2024-03-01", "a"),
      ev(2, "2024-03-02", "a"), ev(3, "2024-03-02", "a"),
      ev(4, "2024-03-03", "a"),
      ev(5, "2024-03-04", "a"), ev(6, "2024-03-04", "a"),
    ).toDF(evCols: _*)
    val r = EventOps.kpssDaily(events).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("k_lags")) ==
      ((4L, 3L)), r)
    assert(r.getAs[Double]("kpss_eta") == 1.0, r)
    val flat = Seq(ev(1, "2024-03-01", "a"), ev(2, "2024-03-02", "a"))
      .toDF(evCols: _*)
    val rf = EventOps.kpssDaily(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("kpss_eta")), rf)
  }

  test("dfTestDaily: exact moments give the replayed rho and t; a " +
    "perfectly alternating series pins |r| = 1 and NULL t") {
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // y = [1,2,1,3]: pairs x=[1,2,1], dy=[1,-1,2] ->
    // SxxN=2, SxyN=-5, SyyN=14 -> rho=-2.5, r=-5/sqrt(28)
    def mk(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, i) =>
      (1 to c).map(j => ev((i * 10 + j).toLong, f"2024-03-0${i + 1}%01d", "a"))
    }.toDF(evCols: _*)
    val r = EventOps.dfTestDaily(mk(Seq(1, 2, 1, 3))).collect().head
    val rr = -5.0 / math.sqrt(2.0 * 14.0)
    assert(r.getAs[Long]("n_pairs") == 3L, r)
    assert(r.getAs[Double]("rho_hat") == -2.5, r)
    assert(r.getAs[Double]("df_t") ==
      r6(rr * math.sqrt((3.0 - 2.0) / (1.0 - rr * rr))), r)
    // [1,2,1,2]: r = -1 exactly -> t undefined, rho still emitted
    val ra = EventOps.dfTestDaily(mk(Seq(1, 2, 1, 2))).collect().head
    assert(ra.getAs[Double]("rho_hat") == -2.0 &&
      ra.isNullAt(ra.fieldIndex("df_t")), ra)
  }

  test("crostonForecastDaily: two-EWMA fold over demand days matches " +
    "the hand trajectory") {
    // purchase counts by day: [2, 0, 1] -> demand days d=[1,3],
    // sizes [2,1]; z = 0.1*1 + 0.9*2 = 1.9, p = 0.1*2 + 0.9*1 = 1.1
    def pe(id: Long, day: String) =
      (id, Timestamp.valueOf(s"$day 10:00:00"), 1L, "purchase", 1.0, "{}")
    val events = Seq(pe(1, "2024-03-01"), pe(2, "2024-03-01"),
      pe(3, "2024-03-03")).toDF(evCols: _*)
    val r = EventOps.crostonForecastDaily(events).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("n_demand_days")) ==
      ((3L, 2L)), r)
    assert(r.getAs[Double]("smoothed_size") == 1.9 &&
      r.getAs[Double]("smoothed_interval") == 1.1, r)
    assert(r.getAs[Double]("croston_forecast") == 1.727273, r)
    // a single demand day keeps the init state: z = size, p = index
    val one = Seq(pe(1, "2024-03-01"), pe(2, "2024-03-01"))
      .toDF(evCols: _*)
    val ro = EventOps.crostonForecastDaily(one).collect().head
    assert(ro.getAs[Double]("smoothed_size") == 2.0 &&
      ro.getAs[Double]("smoothed_interval") == 1.0 &&
      ro.getAs[Double]("croston_forecast") == 2.0, ro)
  }

  test("kendallsWTypes: W = 1 on perfect agreement, 0 on perfect " +
    "reversal, NULL when one constant rater ties everything") {
    def mk(a: Seq[Int], b: Seq[Int]) = (a.zipWithIndex.flatMap {
      case (c, i) => (1 to c).map(j =>
        ev((100 * i + j).toLong, s"2024-03-0${i + 1}", "a"))
    } ++ b.zipWithIndex.flatMap { case (c, i) =>
      (1 to c).map(j => ev((1000 + 100 * i + j).toLong,
        s"2024-03-0${i + 1}", "b"))
    }).toDF(evCols: _*)
    val agree = EventOps.kendallsWTypes(mk(Seq(1, 2), Seq(3, 4)))
      .collect().head
    assert((agree.getAs[Long]("n_days"), agree.getAs[Long]("n_types")) ==
      ((2L, 2L)), agree)
    assert(agree.getAs[Double]("kendalls_w") == 1.0, agree)
    val rev = EventOps.kendallsWTypes(mk(Seq(1, 2), Seq(4, 3)))
      .collect().head
    assert(rev.getAs[Double]("kendalls_w") == 0.0, rev)
    // one type, both days equal: denominator collapses to zero
    val flat = EventOps.kendallsWTypes(mk(Seq(1, 1), Seq.empty))
      .collect().head
    assert(flat.isNullAt(flat.fieldIndex("kendalls_w")), flat)
  }

  test("dmNaiveVsSeasonal: exact loss differentials give the replayed " +
    "DM; identical differentials pin zero variance and NULL") {
    def mk(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, i) =>
      (1 to c).map(j =>
        ev((100L * i + j).toLong, f"2024-03-${i + 1}%02d", "a"))
    }.toDF(evCols: _*)
    // counts [1,1,1,1,1,1,1,2,1]: d = [0, -1] -> n=2, Σd=-1, Σd²=1
    // devSq = 2(2-1) = 2 -> DM = -2/sqrt(2) = -1.414214
    val r = EventOps.dmNaiveVsSeasonal(
      mk(Seq(1, 1, 1, 1, 1, 1, 1, 2, 1))).collect().head
    assert(r.getAs[Long]("n_days") == 2L &&
      r.getAs[Double]("mean_loss_diff") == -0.5, r)
    assert(r.getAs[Double]("dm_stat") == -1.414214, r)
    // linear ramp [1..9]: both differentials equal 6 -> zero variance
    val rf = EventOps.dmNaiveVsSeasonal(mk(1 to 9)).collect().head
    assert(rf.getAs[Double]("mean_loss_diff") == 6.0 &&
      rf.isNullAt(rf.fieldIndex("dm_stat")), rf)
  }

  test("gumbelValueExtremes: method-of-moments fit replays the pinned " +
    "chain; constant maxima yield NULL fit") {
    def pev(i: Long, day: String, v: Double) =
      (i, Timestamp.valueOf(s"$day 10:00:00"), 1L, "view", v, "{}")
    // daily max cents [1, 3]: mean = 0.02, varU = 2e-4
    val events = Seq(pev(1, "2024-03-01", 0.01),
      pev(2, "2024-03-02", 0.03), pev(3, "2024-03-02", 0.01))
      .toDF(evCols: _*)
    val r = EventOps.gumbelValueExtremes(events).collect().head
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val varU = 4.0 / 10000.0 / 2.0
    val beta = math.sqrt(varU) * math.sqrt(6.0) / math.Pi
    val mu = 0.02 - 0.5772156649015329 * beta
    assert(r.getAs[Long]("n_days") == 2L &&
      r.getAs[Double]("mean_daily_max") == 0.02, r)
    assert(r.getAs[Double]("gumbel_beta") == r6(beta), r)
    assert(r.getAs[Double]("gumbel_mu") == r6(mu), r)
    assert(r.getAs[Double]("return_level_30d") ==
      r6(mu - beta * math.log(-math.log(1.0 - 1.0 / 30.0))), r)
    val flat = Seq(pev(1, "2024-03-01", 0.02), pev(2, "2024-03-02", 0.02))
      .toDF(evCols: _*)
    val rf = EventOps.gumbelValueExtremes(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("gumbel_mu")), rf)
  }

  test("revenueVarCvar: interpolated VaR and exact worst-k tail mean " +
    "on a four-day ladder") {
    def pev(i: Long, day: String, v: Double) =
      (i, Timestamp.valueOf(s"$day 10:00:00"), 1L, "purchase", v, "{}")
    // daily revenue cents [10,20,30,40]: VaR95 = 5th pctile
    // interpolated = 11.5 cents = 0.115; k = ceil(4/20) = 1 ->
    // CVaR = worst day = 0.1
    val events = Seq(pev(1, "2024-03-01", 0.10), pev(2, "2024-03-02", 0.20),
      pev(3, "2024-03-03", 0.30), pev(4, "2024-03-04", 0.40))
      .toDF(evCols: _*)
    val r = EventOps.revenueVarCvar(events).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("k_days")) ==
      ((4L, 1L)), r)
    assert(r.getAs[Double]("var_95") == 0.115 &&
      r.getAs[Double]("cvar_95") == 0.1, r)
  }

  test("cochranQTypes: hand-computed Q on a 3-user block design; a " +
    "saturated matrix yields NULL") {
    def uev(i: Long, u: Long, t: String) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), u, t, 1.0, "{}")
    // engagement: u1{a,b} u2{a} u3{a,b}: R=[2,1,2], C=[3,2] ->
    // Q = 1*(2*13 - 25)/(2*5 - 9) = 1.0
    val events = Seq(uev(1, 1, "a"), uev(2, 1, "b"), uev(3, 2, "a"),
      uev(4, 3, "a"), uev(5, 3, "b"), uev(6, 1, "a") /* dup collapses */)
      .toDF(evCols: _*)
    val r = EventOps.cochranQTypes(events).collect().head
    assert((r.getAs[Long]("n_users"), r.getAs[Long]("n_types"),
      r.getAs[Long]("dof")) == ((3L, 2L, 1L)), r)
    assert(r.getAs[Double]("cochran_q") == 1.0, r)
    // every user touches every type: k·N = ΣR² -> NULL
    val sat = Seq(uev(1, 1, "a"), uev(2, 1, "b"), uev(3, 2, "a"),
      uev(4, 2, "b")).toDF(evCols: _*)
    val rs = EventOps.cochranQTypes(sat).collect().head
    assert(rs.isNullAt(rs.fieldIndex("cochran_q")), rs)
  }

  test("valueKuiperDrift: both directed excursions register where KS " +
    "sees only one; a shift-up drift floors D- at zero") {
    def hev(i: Long, h: Int, v: Double) =
      (i, Timestamp.valueOf(s"2024-03-0$h 10:00:00"), 1L, "view", v, "{}")
    // half1 bins [0,2], half2 bins [1,1]: g = [2, -2, 0] over the
    // cum grid -> D+ = D- = 0.5, V = 1.0 (KS alone would report 0.5)
    val mixed = Seq(hev(1, 1, 0.5), hev(2, 1, 2.5),
      hev(3, 2, 1.5), hev(4, 2, 1.5)).toDF(evCols: _*)
    val r = EventOps.valueKuiperDrift(mixed).collect().head
    assert((r.getAs[Long]("n_first"), r.getAs[Long]("n_second")) ==
      ((2L, 2L)), r)
    assert((r.getAs[Double]("d_plus"), r.getAs[Double]("d_minus"),
      r.getAs[Double]("kuiper_v")) == ((0.5, 0.5, 1.0)), r)
    // one-directional shift up: D- pinned to exactly 0 by the final bin
    val up = Seq(hev(1, 1, 0.5), hev(2, 1, 1.5),
      hev(3, 2, 1.5), hev(4, 2, 2.5)).toDF(evCols: _*)
    val ru = EventOps.valueKuiperDrift(up).collect().head
    assert((ru.getAs[Double]("d_plus"), ru.getAs[Double]("d_minus"),
      ru.getAs[Double]("kuiper_v")) == ((0.5, 0.0, 0.5)), ru)
  }

  test("theilsUTypeDow: U = 1 under perfect dependence, 0 under " +
    "independence; a single type NULLs its own direction") {
    // 03-04 Monday, 03-05 Tuesday; a only Mondays, b only Tuesdays
    val dep = Seq(ev(1, "2024-03-04", "a"), ev(2, "2024-03-05", "b"))
      .toDF(evCols: _*)
    val rd = EventOps.theilsUTypeDow(dep).collect().head
    assert((rd.getAs[Double]("u_type_given_dow"),
      rd.getAs[Double]("u_dow_given_type"),
      rd.getAs[Double]("u_symmetric")) == ((1.0, 1.0, 1.0)), rd)
    // both types on both days with equal mass: MI = 0
    val ind = Seq(ev(1, "2024-03-04", "a"), ev(2, "2024-03-05", "a"),
      ev(3, "2024-03-04", "b"), ev(4, "2024-03-05", "b"))
      .toDF(evCols: _*)
    val ri = EventOps.theilsUTypeDow(ind).collect().head
    assert(ri.getAs[Double]("u_symmetric") == 0.0, ri)
    // one type on one day: H(type) = 0 -> that direction NULL
    val one = Seq(ev(1, "2024-03-04", "a"), ev(2, "2024-03-04", "a"))
      .toDF(evCols: _*)
    val ro = EventOps.theilsUTypeDow(one).collect().head
    assert(ro.isNullAt(ro.fieldIndex("u_type_given_dow")) &&
      ro.getAs[Double]("h_type") == 0.0, ro)
  }

  test("typePairOddsRatio: exact 2x2 cells, OR = 1 with se = 2 on the " +
    "balanced square; an empty cell NULLs the OR but keeps phi") {
    def uev(i: Long, u: Long, t: String) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), u, t, 1.0, "{}")
    // u1{a,b} u2{a} u3{b} u4{c}: pair (a,b): n11=1 n10=1 n01=1 n00=1
    val events = Seq(uev(1, 1, "a"), uev(2, 1, "b"), uev(3, 2, "a"),
      uev(4, 3, "b"), uev(5, 4, "c")).toDF(evCols: _*)
    val rows = EventOps.typePairOddsRatio(events).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r)
      .toMap
    val ab = rows(("a", "b"))
    assert((ab.getAs[Long]("n11"), ab.getAs[Long]("n10"),
      ab.getAs[Long]("n01"), ab.getAs[Long]("n00")) ==
      ((1L, 1L, 1L, 1L)), ab)
    assert((ab.getAs[Double]("odds_ratio"), ab.getAs[Double]("log_or"),
      ab.getAs[Double]("se_log_or"), ab.getAs[Double]("phi")) ==
      ((1.0, 0.0, 2.0, 0.0)), ab)
    // (a, c) never co-engage: n11 = 0 -> NULL OR, phi still defined
    val ac = rows.get(("a", "c"))
    assert(ac.isEmpty || (ac.get.isNullAt(ac.get.fieldIndex("odds_ratio")) &&
      !ac.get.isNullAt(ac.get.fieldIndex("phi"))), ac.toString)
  }

  test("bhFdrTypePairs: step-up adjustment matches an independent " +
    "in-test BH recomputation and keeps p monotone") {
    // Three types with distinct separations: a ≪ b strongly
    // (all-1s vs all-9s), c straddles both -> three pairs with
    // different z magnitudes, exercising rank and the suffix min.
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    val events = ((1L to 6L).map(i => pev(i, "a", 1.0)) ++
      (7L to 12L).map(i => pev(i, "b", 9.0)) ++
      Seq(pev(13, "c", 1.0), pev(14, "c", 5.0), pev(15, "c", 9.0)))
      .toDF(evCols: _*)
    val rows = EventOps.bhFdrTypePairs(events).collect()
    assert(rows.length == 3, rows.mkString(";"))
    val byRank = rows.sortBy(_.getAs[Long]("rk"))
    val m = rows.length
    // independent BH recompute from the emitted raw p's
    val qs = byRank.map(r => math.min(
      r.getAs[Double]("p_raw") * m / r.getAs[Long]("rk"), 1.0))
    val expectBh = qs.indices.map(i =>
      BigDecimal(qs.drop(i).min).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(byRank.map(_.getAs[Double]("p_bh")).toSeq == expectBh,
      byRank.mkString(";"))
    // adjusted never below raw; ranks are the (p, ta, tb) total order
    rows.foreach { r =>
      assert(r.getAs[Double]("p_bh") >= r.getAs[Double]("p_raw") - 1e-9, r)
    }
    assert(byRank.map(_.getAs[Double]("p_raw")).toSeq ==
      byRank.map(_.getAs[Double]("p_raw")).sorted.toSeq)
    // the all-1s-vs-all-9s pair is the strongest separation: rank 1
    val top = byRank.head
    assert(top.getAs[String]("type_a") == "a" &&
      top.getAs[String]("type_b") == "b", top)
  }

  test("mcnemarSwitchers: exact 2x2 cells on the midpoint split and " +
    "the continuity-corrected chi-square") {
    def pev(i: Long, uid: Long, hm: String, t: String) =
      (i, Timestamp.valueOf(s"2024-03-01 $hm:00"), uid, t, 1.0, "{}")
    // span 10:00..20:00 -> midpoint 15:00 (<= goes pre). u1 both,
    // u2/u5 pre-only, u4 neither (and pins lo/hi with views).
    val events = Seq(
      pev(1, 4L, "10:00", "view"), pev(2, 4L, "20:00", "view"),
      pev(3, 1L, "11:00", "purchase"), pev(4, 1L, "16:00", "purchase"),
      pev(5, 2L, "12:00", "purchase"),
      pev(6, 5L, "15:00", "purchase"), // exactly at midpoint -> pre
    ).toDF(evCols: _*)
    val r = EventOps.mcnemarSwitchers(events).collect().head
    assert((r.getAs[Long]("n_users"), r.getAs[Long]("n_both"),
      r.getAs[Long]("n_neither"), r.getAs[Long]("b_pre_only"),
      r.getAs[Long]("c_post_only")) == ((4L, 1L, 1L, 2L, 0L)), r)
    // chi2 = (|2-0|-1)² / 2 = 0.5
    assert(r.getAs[Double]("mcnemar_chi2") == 0.5, r)
    // no switchers at all -> NULL statistic
    val still = Seq(pev(1, 1L, "10:00", "view"), pev(2, 1L, "20:00", "view"))
      .toDF(evCols: _*)
    val rs = EventOps.mcnemarSwitchers(still).collect().head
    assert(rs.isNullAt(rs.fieldIndex("mcnemar_chi2")), rs)
  }

  test("seasonalDecompositionDaily: constant series decomposes to " +
    "flat trend, zero seasonal, zero residual; edges NULL") {
    // 21 days, 3 events each -> interior trend 3.0, every dow mean 0
    val events = (0 until 21).flatMap { d =>
      val day = f"2024-03-${d + 1}%02d"
      (1 to 3).map(j => ev(d * 3L + j, day, "a"))
    }.toDF(evCols: _*)
    val rows = EventOps.seasonalDecompositionDaily(events).collect()
      .sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(rows.length == 21, rows.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n") == 3L, r)
      assert(r.getAs[Double]("seasonal") == 0.0, r)
      if (i < 3 || i >= 18) {
        assert(r.isNullAt(r.fieldIndex("trend")) &&
          r.isNullAt(r.fieldIndex("residual")), r)
      } else {
        assert(r.getAs[Double]("trend") == 3.0 &&
          r.getAs[Double]("residual") == 0.0, r)
      }
    }
    // a single spike: reconstruction identity n ≈ trend+seasonal+
    // residual holds on every interior day, and seasonals re-center
    val spiky = ((0 until 21).flatMap { d =>
      val day = f"2024-03-${d + 1}%02d"
      (1 to (if (d == 10) 8 else 1)).map(j => ev(d * 10L + j, day, "a"))
    }).toDF(evCols: _*)
    val sr = EventOps.seasonalDecompositionDaily(spiky).collect()
      .sortBy(_.getAs[java.sql.Date]("day").toString)
    val interior = sr.filter(r => !r.isNullAt(r.fieldIndex("trend")))
    assert(interior.nonEmpty)
    interior.foreach { r =>
      val rebuilt = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(rebuilt - r.getAs[Long]("n")) < 2e-6, r)
    }
    // one full week (7 consecutive days = each dow once) re-centers
    val weekSum = sr.take(7).map(_.getAs[Double]("seasonal")).sum
    assert(math.abs(weekSum) < 1e-4, sr.take(7).mkString(";"))
  }

  test("isotonicCalibration: PAV minimax pools the violating bins to " +
    "their weighted mean and leaves monotone fits unchanged") {
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // values 0/4.5/9 land in bins 0/5/9; rates (.5, 1, 0) violate
    // monotonicity -> bins 5 and 9 pool with bin 0's tail: all .5
    val events = Seq(
      pev(1, "purchase", 0.0), pev(2, "view", 0.0),
      pev(3, "purchase", 4.5), pev(4, "purchase", 4.5),
      pev(5, "view", 9.0), pev(6, "view", 9.0),
    ).toDF(evCols: _*)
    val got = EventOps.isotonicCalibration(events).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Double]("pos_rate"), r.getAs[Double]("iso_rate")))).toMap
    assert(got == Map(0L -> ((0.5, 0.5)), 5L -> ((1.0, 0.5)),
      9L -> ((0.0, 0.5))), got)
    // an already-monotone profile is a fixed point
    val mono = Seq(
      pev(1, "view", 0.0), pev(2, "view", 0.0),
      pev(3, "purchase", 4.5), pev(4, "view", 4.5),
      pev(5, "purchase", 9.0), pev(6, "purchase", 9.0),
    ).toDF(evCols: _*)
    val gm = EventOps.isotonicCalibration(mono).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Double]("pos_rate"), r.getAs[Double]("iso_rate")))).toMap
    assert(gm == Map(0L -> ((0.0, 0.0)), 5L -> ((0.5, 0.5)),
      9L -> ((1.0, 1.0))), gm)
  }

  test("logrankTestAb: hypergeometric O/E/V over the planted risk " +
    "sets matches the hand computation") {
    def pev(i: Long, uid: Long, day: String) =
      (i, Timestamp.valueOf(s"2024-03-$day 10:00:00"), uid, "view", 1.0, "{}")
    // max day = 10 (u4 censored there). durations: u1 t=1 obs (arm 1),
    // u2 t=1 obs (arm 0), u3 t=2 obs (arm 1), u4 t=10 censored.
    // t=1: d=2 n=4 n1=2 -> E .5·2=1, V 2·.25·(2/3)=1/3
    // t=2: d=1 n=2 n1=1 -> E .5,   V .25
    // O1=2, E1=1.5, V=.583333 (micro-pinned) -> Z = .5/√.583333
    val events = Seq(
      pev(1, 1L, "01"),
      pev(2, 2L, "01"),
      pev(3, 3L, "01"), pev(4, 3L, "02"),
      pev(5, 4L, "01"), pev(6, 4L, "10"),
    ).toDF(evCols: _*)
    val r = EventOps.logrankTestAb(events).collect().head
    assert((r.getAs[Long]("n_users_a"), r.getAs[Long]("n_users_b"),
      r.getAs[Long]("observed_b")) == ((2L, 2L, 2L)), r)
    assert(r.getAs[Double]("expected_b") == 1.5, r)
    val expZ = BigDecimal(0.5 / math.sqrt(583333.0 / 1e6)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("logrank_z") == expZ, r)
    // identical arms (every user censored) -> zero variance -> NULL
    val cen = Seq(pev(1, 1L, "10"), pev(2, 2L, "10")).toDF(evCols: _*)
    val rc = EventOps.logrankTestAb(cen).collect().head
    assert(rc.isNullAt(rc.fieldIndex("logrank_z")), rc)
  }

  test("propensityStratifiedAte: within-stratum effects and the " +
    "size-weighted ATE over planted activity quintiles") {
    def pev(i: Long, uid: Long, hm: String, t: String) =
      (i, Timestamp.valueOf(s"2024-03-01 $hm:00"), uid, t, 1.0, "{}")
    // span 10..20, mid 15. user u has u pre-views (x = u), so the
    // (x, user_id) quintiles are {1,2},{3,4},{5,6},{7,8},{9,10}.
    // Odd users 1,3,5 purchase post-mid -> effects (1,1,1,0,0),
    // ATE = (2+2+2)/10 = 0.6
    var id = 0L
    val rows = (1L to 10L).flatMap { u =>
      (1L to u).map { _ => id += 1; pev(id, u, "11:00", "view") }
    } ++ Seq(1L, 3L, 5L).map { u => id += 1; pev(id, u, "16:00", "purchase") } ++
      Seq({ id += 1; pev(id, 10L, "20:00", "view") },
        { id += 1; pev(id, 2L, "10:00", "view") })
    val got = EventOps.propensityStratifiedAte(rows.toDF(evCols: _*))
      .collect().map(r => r.getAs[Long]("stratum") -> r).toMap
    assert(got.size == 5, got.keys)
    val effects = (1L to 5L).map(s => got(s).getAs[Double]("effect"))
    assert(effects == Seq(1.0, 1.0, 1.0, 0.0, 0.0), effects)
    assert(got(1L).getAs[Double]("ate") == 0.6, got(1L))
    assert((got(1L).getAs[Long]("n_users"), got(1L).getAs[Long]("n_t"),
      got(1L).getAs[Long]("conv_t"), got(1L).getAs[Long]("n_c")) ==
      ((2L, 1L, 1L, 1L)), got(1L))
  }

  test("featureHashBuckets: Rabin-Karp buckets and signed collision-" +
    "cancelling weights match the in-test fold") {
    val docs = Seq((1L, "ab ab cd", "en", "s1", 8L),
      (2L, "ab!", "en", "s1", 3L)) // normalizes to the same 'ab'
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def fold(w: String): Long =
      w.foldLeft(0L)((h, c) => (h * 257L + c.toLong) % 2147483647L)
    def bucket(w: String): Long = fold(w) % 64L
    def sgn(w: String): Long = if ((fold(w) / 64L) % 2L == 0L) 1L else -1L
    val got = DocOps.featureHashBuckets(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("weight")).toMap
    assert(got == Map(
      (1L, bucket("ab")) -> 2L * sgn("ab"),
      (1L, bucket("cd")) -> sgn("cd"),
      (2L, bucket("ab")) -> sgn("ab")), got)
  }

  test("seasonalAnomalies: the planted spike is the only flag; the " +
    "flat series flags nothing (MAD-zero guard)") {
    // 21 days at 1/day except day 11's burst of 8: after trend and
    // dow removal the spike dominates every interior residual
    val spiky = (0 until 21).flatMap { d =>
      val day = f"2024-03-${d + 1}%02d"
      (1 to (if (d == 10) 8 else 1)).map(j => ev(d * 10L + j, day, "a"))
    }.toDF(evCols: _*)
    val flagged = EventOps.seasonalAnomalies(spiky).collect()
      .filter(_.getAs[Boolean]("is_anomaly"))
      .map(_.getAs[java.sql.Date]("day").toString)
    assert(flagged.contains("2024-03-11") , flagged.toSeq)
    // a perfectly constant series: every residual 0, MAD 0 -> NULL z,
    // nothing flagged, no division blow-up
    val flat = (0 until 21).map { d =>
      ev(d.toLong + 1L, f"2024-03-${d + 1}%02d", "a")
    }.toDF(evCols: _*)
    val fr = EventOps.seasonalAnomalies(flat).collect()
    assert(fr.nonEmpty && fr.forall(r =>
      !r.getAs[Boolean]("is_anomaly") &&
        r.isNullAt(r.fieldIndex("robust_z"))), fr.mkString(";"))
  }

  test("abSrmCheck: balanced arms pass, a lopsided assignment trips " +
    "the chi-square gate") {
    def pev(i: Long, uid: Long) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), uid, "view", 1.0, "{}")
    val balanced = (1L to 10L).map(u => pev(u, u)).toDF(evCols: _*)
    val rb = EventOps.abSrmCheck(balanced).collect().head
    assert((rb.getAs[Long]("n_a"), rb.getAs[Long]("n_b")) == ((5L, 5L)), rb)
    assert(rb.getAs[Double]("srm_chi2") == 0.0 &&
      !rb.getAs[Boolean]("srm_mismatch"), rb)
    // 12 even vs 2 odd users: chi2 = 100/14 = 7.14 > 3.84
    val skewed = ((1L to 12L).map(u => pev(u, u * 2L)) ++
      Seq(pev(100L, 1L), pev(101L, 3L))).toDF(evCols: _*)
    val rs = EventOps.abSrmCheck(skewed).collect().head
    assert((rs.getAs[Long]("n_a"), rs.getAs[Long]("n_b")) == ((12L, 2L)), rs)
    assert(rs.getAs[Double]("srm_chi2") == 7.142857 &&
      rs.getAs[Boolean]("srm_mismatch"), rs)
  }

  test("eceScore: size-weighted and max calibration gaps from the " +
    "published bin values") {
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // bin 0 (score 0): rate .5, gap .5; bin 9 (score 1): rate 0, gap 1
    // ECE = (2·.5 + 2·1)/4 = .75, MCE = 1
    val events = Seq(
      pev(1, "purchase", 0.0), pev(2, "view", 0.0),
      pev(3, "view", 9.0), pev(4, "view", 9.0),
    ).toDF(evCols: _*)
    val r = EventOps.eceScore(events).collect().head
    assert((r.getAs[Long]("n_total"), r.getAs[Long]("n_bins")) ==
      ((4L, 2L)), r)
    assert(r.getAs[Double]("ece") == 0.75 && r.getAs[Double]("mce") == 1.0, r)
  }

  test("tokenizerFertility: regex tokens vs whitespace words and " +
    "chars per token") {
    val docs = Seq((1L, "ab cd!", "en", "s1", 6L),
      (2L, "x1y", "fr", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DocOps.tokenizerFertility(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = got("en") // words {ab, cd!}=2; tokens {ab, cd, !}=3
    assert((en.getAs[Long]("words"), en.getAs[Long]("tokens"),
      en.getAs[Double]("fertility"), en.getAs[Double]("chars_per_token")) ==
      ((2L, 3L, 1.5, 2.0)), en)
    val fr = got("fr") // "x1y" -> words 1; tokens {x, 1, y} = 3
    assert((fr.getAs[Long]("words"), fr.getAs[Long]("tokens"),
      fr.getAs[Double]("fertility")) == ((1L, 3L, 3.0)), fr)
  }

  test("quantileNormalizeByType: both types land on the SAME pooled " +
    "distribution; singleton types map to the global median") {
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // global order: 1,2,3,10,20,30 -> positions 1..6; per type (n=3):
    // r=1→j1, r=2→j4, r=3→j6, so both map onto {1, 10, 30}
    val events = Seq(pev(1, "a", 10.0), pev(2, "a", 20.0),
      pev(3, "a", 30.0), pev(4, "b", 1.0), pev(5, "b", 2.0),
      pev(6, "b", 3.0)).toDF(evCols: _*)
    val got = EventOps.quantileNormalizeByType(events).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("norm_value"))
      .toMap
    assert(got == Map(1L -> 1.0, 2L -> 10.0, 3L -> 30.0,
      4L -> 1.0, 5L -> 10.0, 6L -> 30.0), got)
    // a singleton type: its one event takes the pooled median position
    val single = Seq(pev(1, "a", 5.0), pev(2, "a", 6.0),
      pev(3, "c", 999.0)).toDF(evCols: _*)
    val gs = EventOps.quantileNormalizeByType(single).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("norm_value"))
      .toMap
    // N=3 -> (N+1) div 2 = 2 -> global position 2 = 6.0
    assert(gs(3L) == 6.0, gs)
  }

  test("bootstrapCiRevenue: identical user totals collapse every " +
    "replicate to the same mean; the run is hash-deterministic") {
    def pev(i: Long, uid: Long) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), uid, "view", 10.0, "{}")
    // 50 users, one 10.00 event each: any Poisson reweighting of
    // identical values has mean exactly 10 -> degenerate CI
    val events = (1L to 50L).map(u => pev(u, u)).toDF(evCols: _*)
    val r = EventOps.bootstrapCiRevenue(events).collect().head
    assert(r.getAs[Long]("n_users") == 50L &&
      r.getAs[Long]("n_replicates") == 32L, r)
    assert(r.getAs[Double]("mean_obs") == 10.0 &&
      r.getAs[Double]("ci_low") == 10.0 &&
      r.getAs[Double]("ci_high") == 10.0, r)
    // deterministic: a second run is bit-identical (no RNG anywhere)
    val r2 = EventOps.bootstrapCiRevenue(events).collect().head
    assert(r.toSeq == r2.toSeq)
  }

  test("cohensDTypePairs: unit pooled variance gives the raw mean " +
    "gap as d with the conventional magnitude label") {
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // a {1,2,3} vs b {4,5,6}: both sample variances 1 -> pooled sd 1,
    // d = 2 - 5 = -3 -> large
    val events = Seq(pev(1, "a", 1.0), pev(2, "a", 2.0), pev(3, "a", 3.0),
      pev(4, "b", 4.0), pev(5, "b", 5.0), pev(6, "b", 6.0))
      .toDF(evCols: _*)
    val r = EventOps.cohensDTypePairs(events).collect().head
    assert((r.getAs[String]("type_a"), r.getAs[String]("type_b")) ==
      (("a", "b")), r)
    assert(r.getAs[Double]("mean_a") == 2.0 &&
      r.getAs[Double]("mean_b") == 5.0, r)
    assert(r.getAs[Double]("cohens_d") == -3.0 &&
      r.getAs[String]("magnitude") == "large", r)
    // constant values in both groups -> zero pooled variance -> NULL
    val flat = Seq(pev(1, "a", 2.0), pev(2, "a", 2.0),
      pev(3, "b", 5.0), pev(4, "b", 5.0)).toDF(evCols: _*)
    val rf = EventOps.cohensDTypePairs(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("cohens_d")), rf)
  }

  test("cliffsDeltaTypePairs: dominance -1, planted balance 0, ties " +
    "count for neither side") {
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // a {1,2} fully below b {3}: gt 0, lt 2 -> delta -1, large
    val dom = Seq(pev(1, "a", 1.0), pev(2, "a", 2.0), pev(3, "b", 3.0))
      .toDF(evCols: _*)
    val r = EventOps.cliffsDeltaTypePairs(dom).collect().head
    assert((r.getAs[Long]("n1"), r.getAs[Long]("n2")) == ((2L, 1L)), r)
    assert(r.getAs[Double]("cliffs_delta") == -1.0 &&
      r.getAs[String]("magnitude") == "large", r)
    // a {1,2,3,4} vs b {2,3}: 3 wins each way -> delta 0, negligible;
    // the two exact ties (2,2) and (3,3) count for neither side
    val bal = Seq(pev(1, "a", 1.0), pev(2, "a", 2.0), pev(3, "a", 3.0),
      pev(4, "a", 4.0), pev(5, "b", 2.0), pev(6, "b", 3.0))
      .toDF(evCols: _*)
    val rb = EventOps.cliffsDeltaTypePairs(bal).collect().head
    assert(rb.getAs[Double]("cliffs_delta") == 0.0 &&
      rb.getAs[String]("magnitude") == "negligible", rb)
    // a {1,2} vs b {2}: one loss, one tie -> delta -0.5, large (the
    // 0.474 cut decided by integer cross-multiplication)
    val tie = Seq(pev(1, "a", 1.0), pev(2, "a", 2.0), pev(3, "b", 2.0))
      .toDF(evCols: _*)
    val rt = EventOps.cliffsDeltaTypePairs(tie).collect().head
    assert(rt.getAs[Double]("cliffs_delta") == -0.5 &&
      rt.getAs[String]("magnitude") == "large", rt)
  }

  test("cochranArmitageTrend: planted rising conversion across " +
    "quintiles gives the hand-computed z; no converters -> NULL") {
    // users 1..10, user u has u events (u7..u10 swap one view for a
    // purchase so activity x = u is preserved): quintile cells
    // r = (0,0,0,2,2) -> num 60, sv 200, vi 4800, z = 60/sqrt(480)
    val rows = (1L to 10L).flatMap { u =>
      val conv = u >= 7L
      (1L to u).map { i =>
        val t = if (conv && i == 1L) "purchase" else "view"
        (u * 100 + i, Timestamp.valueOf("2024-03-01 10:00:00"), u, t,
          1.0, "{}")
      }
    }
    val events = rows.toDF(evCols: _*)
    val r = EventOps.cochranArmitageTrend(events).collect().head
    assert((r.getAs[Long]("n_users"), r.getAs[Long]("n_conv")) ==
      ((10L, 4L)), r)
    assert(r.getAs[Double]("z_score") ==
      math.rint(60.0 / math.sqrt(480.0) * 1e6) / 1e6, r)
    assert(r.getAs[String]("trend") == "increasing", r)
    val noConv = rows.filter(_._4 == "view").toDF(evCols: _*)
    val rn = EventOps.cochranArmitageTrend(noConv).collect().head
    assert(rn.isNullAt(rn.fieldIndex("z_score")) &&
      rn.isNullAt(rn.fieldIndex("trend")), rn)
  }

  test("valueEnergyDrift: identical halves score 0; disjoint point " +
    "masses one bin apart score exactly 2") {
    def pev(i: Long, hm: String, v: Double) =
      (i, Timestamp.valueOf(s"2024-03-01 $hm:00"), 1L, "view", v, "{}")
    // same {1,2} multiset in both halves (mid 15:05) -> D^2 = 0
    val same = Seq(pev(1, "10:00", 1.0), pev(2, "10:10", 2.0),
      pev(3, "20:00", 1.0), pev(4, "20:10", 2.0)).toDF(evCols: _*)
    val r = EventOps.valueEnergyDrift(same).collect().head
    assert((r.getAs[Long]("n_first"), r.getAs[Long]("n_second")) ==
      ((2L, 2L)), r)
    assert(r.getAs[Double]("energy_dist") == 0.0, r)
    // half1 all at bin 0, half2 all at bin 1: E|XY| = 1, within = 0
    // -> D^2 = 2 exactly
    val shift = Seq(pev(1, "10:00", 0.0), pev(2, "10:10", 0.0),
      pev(3, "20:00", 1.0), pev(4, "20:10", 1.0)).toDF(evCols: _*)
    val rs = EventOps.valueEnergyDrift(shift).collect().head
    assert(rs.getAs[Double]("energy_dist") == 2.0, rs)
  }

  test("wilcoxonSignedRankAb: hand-ranked cent diffs give 2W+ = 17 " +
    "and the tie-corrected z") {
    def pev(i: Long, uid: Long, hm: String, v: Double) =
      (i, Timestamp.valueOf(s"2024-03-01 $hm:00"), uid, "view", v, "{}")
    // diffs (cents): +100, +200, -100, +300 -> |d| midranks 1.5/1.5/3/4,
    // W+ = 8.5 (2W+ = 17), n = 4, 48V = 360 - 6 = 354
    val events = Seq(
      pev(1, 1L, "20:00", 1.0),
      pev(2, 2L, "20:05", 2.0),
      pev(3, 3L, "10:00", 1.0), // pre-half spend -> negative diff
      pev(4, 4L, "20:10", 3.0),
    ).toDF(evCols: _*)
    val r = EventOps.wilcoxonSignedRankAb(events).collect().head
    assert((r.getAs[Long]("n_nonzero"), r.getAs[Long]("w_plus_x2")) ==
      ((4L, 17L)), r)
    val z = (17.0 - 20.0 / 2.0) / math.sqrt(354.0 / 12.0)
    assert(r.getAs[Double]("z_score") == math.rint(z * 1e6) / 1e6, r)
    assert(!r.getAs[Boolean]("significant"), r)
  }

  test("valueCvmDrift: identical halves score 0; disjoint point " +
    "masses score exactly 0.5 and trip the 0.461 criterion") {
    def pev(i: Long, hm: String, v: Double) =
      (i, Timestamp.valueOf(s"2024-03-01 $hm:00"), 1L, "view", v, "{}")
    val same = Seq(pev(1, "10:00", 1.0), pev(2, "10:10", 2.0),
      pev(3, "20:00", 1.0), pev(4, "20:10", 2.0)).toDF(evCols: _*)
    val r = EventOps.valueCvmDrift(same).collect().head
    assert(r.getAs[Double]("cvm_t") == 0.0 &&
      !r.getAs[Boolean]("drifted"), r)
    // half1 at bin 0, half2 at bin 1: the only gap bin has F1-F2 = 1
    // with pooled mass 2 -> T = (4/16)*2 = 0.5 > 0.461
    val shift = Seq(pev(1, "10:00", 0.0), pev(2, "10:10", 0.0),
      pev(3, "20:00", 1.0), pev(4, "20:10", 1.0)).toDF(evCols: _*)
    val rs = EventOps.valueCvmDrift(shift).collect().head
    assert(rs.getAs[Double]("cvm_t") == 0.5 &&
      rs.getAs[Boolean]("drifted"), rs)
  }

  test("decisionStumpValue: the perfect separator wins over an edge " +
    "split; cells, rates and Gini ledger are exact") {
    def pev(i: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, t, v, "{}")
    // v1 view, v2 view, two v3 purchases: split at v<=2 is pure
    // (J = 4) and beats v<=1 (J = 8/3)
    val events = Seq(pev(1, "view", 1.0), pev(2, "view", 2.0),
      pev(3, "purchase", 3.0), pev(4, "purchase", 3.0))
      .toDF(evCols: _*)
    val r = EventOps.decisionStumpValue(events).collect().head
    assert(r.getAs[Double]("split_value") == 2.0, r)
    assert((r.getAs[Long]("n_left"), r.getAs[Long]("pos_left"),
      r.getAs[Long]("n_right"), r.getAs[Long]("pos_right")) ==
      ((2L, 0L, 2L, 2L)), r)
    assert((r.getAs[Double]("rate_left"), r.getAs[Double]("rate_right")) ==
      ((0.0, 1.0)), r)
    assert(r.getAs[Double]("gini_parent") == 0.5, r)
    assert(r.getAs[Double]("gini_children") == 0.0, r)
    assert(r.getAs[Double]("gini_gain") == 0.5, r)
  }

  test("diffInDiff: planted 2x2 panel gives DiD 1.0 and z 2.0") {
    def pev(i: Long, uid: Long, hm: String, t: String) =
      (i, Timestamp.valueOf(s"2024-03-01 $hm:00"), uid, t, 1.0, "{}")
    // span 10..20 -> mid 15. control (even): u2 pre-only purchase,
    // u4 never; treat (odd): u1 both halves, u3 post-only.
    // rates: c (.5, 0), t (.5, 1) -> DiD = (1-.5) - (0-.5) = 1.0
    // SE = sqrt(0 + .125 + 0 + .125) = .5 -> z = 2.0
    val events = Seq(
      pev(1, 4L, "10:00", "view"), pev(2, 4L, "20:00", "view"),
      pev(3, 2L, "11:00", "purchase"),
      pev(4, 1L, "11:00", "purchase"), pev(5, 1L, "16:00", "purchase"),
      pev(6, 3L, "16:00", "purchase"),
    ).toDF(evCols: _*)
    val r = EventOps.diffInDiff(events).collect().head
    assert((r.getAs[Long]("n_c"), r.getAs[Long]("n_t")) == ((2L, 2L)), r)
    assert((r.getAs[Double]("p_c_pre"), r.getAs[Double]("p_c_post"),
      r.getAs[Double]("p_t_pre"), r.getAs[Double]("p_t_post")) ==
      ((0.5, 0.0, 0.5, 1.0)), r)
    assert(r.getAs[Double]("did") == 1.0 && r.getAs[Double]("z") == 2.0, r)
  }

  test("sprtDailyAb: Wald LLR accumulates per first-exposure day and " +
    "crosses the H1 boundary at the computed step") {
    def pev(i: Long, uid: Long, day: String, t: String) =
      (i, Timestamp.valueOf(s"2024-03-$day 10:00:00"), uid, t, 1.0, "{}")
    // five odd users, one per day, every first day converts:
    // llr(k) = k·ln2 (cum_n = cum_x), upper = ln 19 ≈ 2.9444 ->
    // continue through day 4 (2.7726), accept_h1 on day 5 (3.4657)
    val events = (1 to 5).flatMap { d =>
      Seq(pev(d * 2L, d * 2L - 1L, f"$d%02d", "purchase"))
    }.toDF(evCols: _*)
    val rows = EventOps.sprtDailyAb(events).collect()
      .sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(rows.length == 5, rows.mkString(";"))
    val lWin = math.log(0.04 / 0.02)
    rows.zipWithIndex.foreach { case (r, i) =>
      val exp = BigDecimal((i + 1) * lWin).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("llr") == exp, r)
    }
    assert(rows.take(4).forall(_.getAs[String]("decision") == "continue") &&
      rows.last.getAs[String]("decision") == "accept_h1",
      rows.map(_.getAs[String]("decision")).mkString(","))
    // a steep H0 design: two non-converting days cross the lower bound
    // (ln(.1/.5) = −1.609 each; −3.22 ≤ −2.944)
    val quiet = Seq(pev(1, 1L, "01", "view"), pev(2, 3L, "02", "view"))
      .toDF(evCols: _*)
    val q = EventOps.sprtDailyAb(quiet, p0 = 0.5, p1 = 0.9).collect()
      .sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(q.head.getAs[String]("decision") == "continue" &&
      q.last.getAs[String]("decision") == "accept_h0",
      q.map(_.getAs[String]("decision")).mkString(","))
  }

  test("mdePowerAnalysis: user-level conversion segmented by type, " +
    "degenerate rates NULL") {
    def pev(i: Long, uid: Long, t: String, v: Double) =
      (i, Timestamp.valueOf("2024-03-01 10:00:00"), uid, t, v, "{}")
    // u1 converts (purchase 100 ≥ 50), u2 does not. type 'view' has
    // both users (p = .5); type 'purchase' has only u1 (p = 1 -> NULL)
    val events = Seq(pev(1, 1L, "view", 1.0), pev(2, 2L, "view", 1.0),
      pev(3, 1L, "purchase", 100.0)).toDF(evCols: _*)
    val got = EventOps.mdePowerAnalysis(events).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val v = got("view")
    assert((v.getAs[Long]("n_users"), v.getAs[Long]("n_conv"),
      v.getAs[Double]("p_hat")) == ((2L, 1L, 0.5)), v)
    val expMde = BigDecimal(2.801585 * math.sqrt(2.0 * 0.5 * 0.5 / 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(v.getAs[Double]("mde_abs") == expMde, v)
    val p = got("purchase")
    assert(p.getAs[Double]("p_hat") == 1.0 &&
      p.isNullAt(p.fieldIndex("mde_abs")), p)
  }
}
