package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{AggOps, JoinOps, SkewOps}

/** trailingRevenue, fuzzyNamePairs, saltedNationActivity: planted
  * fixtures with hand-checked frames/pairs, plus the salted ≡ plain
  * and RANGE-vs-ROWS invariants on real data. */
class RangeFuzzySaltSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")

  test("trailingRevenue RANGE frame spans days, not rows") {
    val orders = Seq(
      // cust 1: two orders same day (peers — both see both), one 29
      // days later (still in frame), one 31 days later (out of frame)
      (1L, 10L, ts(1), 100.0), (1L, 11L, ts(1), 50.0),
      (1L, 12L, ts(30), 25.0),
      (1L, 13L, Timestamp.valueOf("2024-02-01 12:00:00"), 10.0),
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = AggOps.trailingRevenue(orders).collect()
      .map(r => r.getLong(1) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(got == Map(
      10L -> (150.0, 2L), // same-day peer included despite row order
      11L -> (150.0, 2L),
      12L -> (175.0, 3L), // day 30 still covers day 1 (29 preceding)
      13L -> (35.0, 2L),  // day 32: day-1 orders aged out, day 30 in
    ), got.toString)
  }

  test("trailingRevenue frames never cross customers") {
    val orders = Seq((1L, 1L, ts(1), 100.0), (2L, 2L, ts(1), 7.0))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = AggOps.trailingRevenue(orders).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> 100.0, 2L -> 7.0))
  }

  test("fuzzyNamePairs finds planted near-names and respects the band") {
    val part = Seq(
      (1L, "red widget"), (2L, "red widgets"), // dist 1
      (3L, "red widget"),                      // dup name → n_parts 2
      (4L, "blue bolt"),                       // far from both
    ).toDF("p_partkey", "p_name")
    val got = JoinOps.fuzzyNamePairs(part).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(("red widget", "red widgets", 1, 2L, 1L)),
      got.toString)
  }

  test("fuzzyNamePairs pairs are ordered and within threshold on real data") {
    val rows = JoinOps.fuzzyNamePairs(Tables.part(spark, sf0)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 3)
    }
  }

  test("fuzzyNamePairsBlocked finds >= the band-pruned pairs on a " +
      "planted-transposition fixture") {
    // The transposition sits in a MIDDLE token ("lavender" →
    // "lavedner"), so both end tokens survive the edit — the class of
    // error token blocking is designed to catch. The dup-name and
    // far-name rows from the band-pruned fixture come along too.
    val part = Seq(
      (1L, "golden lavender lace"), (2L, "golden lavedner lace"), // dist 2
      (3L, "golden lavender lace"),            // dup name → n_parts 2
      (4L, "red widget"), (5L, "red widgets"), // dist 1, shares "red"
      (6L, "blue bolt"),                       // far from everything
    ).toDF("p_partkey", "p_name")
    def asSet(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    val banded = asSet(JoinOps.fuzzyNamePairs(part).collect())
    val blocked = asSet(JoinOps.fuzzyNamePairsBlocked(part).collect())
    assert(blocked.contains(
      ("golden lavedner lace", "golden lavender lace", 2, 1L, 2L)),
      blocked.toString)
    // band prune is exhaustive (|len diff| <= d is NECESSARY for
    // dist <= d), so >= here means the blocking lost nothing on the
    // fixture's edit class
    assert(banded.subsetOf(blocked), s"blocked=$blocked banded=$banded")
  }

  test("fuzzyNamePairsBlocked is recall-bounded by the exhaustive form " +
      "on real data") {
    val part = Tables.part(spark, sf0)
    def asSet(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    val banded = asSet(JoinOps.fuzzyNamePairs(part).collect())
    val blocked = asSet(JoinOps.fuzzyNamePairsBlocked(part).collect())
    // blocked can only MISS pairs relative to the exhaustive band
    // prune, never invent them
    assert(blocked.subsetOf(banded), (blocked -- banded).toString)
    blocked.foreach { case (a, b, d, _, _) =>
      assert(a < b && d >= 1 && d <= 3)
    }
  }

  test("asofNextPurchase: strictly-later match, tolerance nulls distant " +
      "purchases, same-ts purchase excluded") {
    def e(id: Long, t: String, typ: String, v: Double) =
      (id, Timestamp.valueOf(t), 1L, typ, v, "{}")
    val events = Seq(
      e(1, "2024-03-01 10:00:00", "view", 0.0),
      // purchase at the SAME ts as event 2 — strictly-later must skip it
      e(2, "2024-03-01 11:00:00", "view", 0.0),
      e(3, "2024-03-01 11:00:00", "purchase", 9.0),
      e(4, "2024-03-02 08:00:00", "purchase", 7.0),
      // view whose next purchase is 10 days out — beyond the 7-day tolerance
      e(5, "2024-03-10 00:00:00", "view", 0.0),
      e(6, "2024-03-20 00:00:00", "purchase", 5.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.asofNextPurchase(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("next_purchase_event")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("usec_to_purchase")).map(_.toLong))))
      .toMap
    // event 1 → purchase 3 (1h later); event 2 → purchase 4 (NOT the
    // same-ts 3); purchase 3 itself → 4; event 5 → null (10 days);
    // purchase 6 → nothing later.
    assert(got(1L) == ((Some(3L), Some(3600000000L))), got.toString)
    assert(got(2L) == ((Some(4L), Some(75600000000L))), got.toString)
    assert(got(3L) == ((Some(4L), Some(75600000000L))), got.toString)
    assert(got(5L) == ((None, None)), got.toString)
    assert(got(6L) == ((None, None)), got.toString)
  }

  test("lDiversityProfile: distinct-sensitive histogram flags low-l classes") {
    def e(id: Long, t: String, u: Long, typ: String) =
      (id, Timestamp.valueOf(s"$t 10:00:00"), u, typ, 1.0, "{}")
    // class (a, 03-01): users {1,2,3} → l=3; (a, 03-02): {1,1} → l=1;
    // (b, 03-01): {1,2} → l=2
    val events = Seq(
      e(1, "2024-03-01", 1, "a"), e(2, "2024-03-01", 2, "a"),
      e(3, "2024-03-01", 3, "a"),
      e(4, "2024-03-02", 1, "a"), e(5, "2024-03-02", 1, "a"),
      e(6, "2024-03-01", 1, "b"), e(7, "2024-03-01", 2, "b"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.lDiversityProfile(events, l = 3).collect()
      .map(r => r.getAs[Long]("l_distinct") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Boolean]("below_l")))).toMap
    assert(got == Map(
      3L -> ((1L, 3L, false)),
      2L -> ((1L, 2L, true)),
      1L -> ((1L, 2L, true))), got.toString)
  }

  test("tClosenessProfile: EMD flags skewed classes, matching class at 0") {
    def e(id: Long, typ: String, v: Double) =
      (id, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, typ, v, "{}")
    // global values {0,0,10,10,0,10}: vmin 0, vmax 10, 2 bins split at
    // 5 → global g = (3, 3), N = 6. Class a sits entirely in bin 0:
    // cum diff |2·6 − 3·2| = 6 → EMD 6/(2·6·1) = 0.5; class b mirrors
    // in bin 1; class c (one value each side) matches the global mix
    // exactly → EMD 0.
    val events = Seq(
      e(1, "a", 0.0), e(2, "a", 0.0),
      e(3, "b", 10.0), e(4, "b", 10.0),
      e(5, "c", 0.0), e(6, "c", 10.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.tClosenessProfile(events, t = 0.2, bins = 2)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("emd"),
          r.getAs[Boolean]("above_t")))).toMap
    assert(got == Map(
      "a" -> ((2L, 0.5, true)),
      "b" -> ((2L, 0.5, true)),
      "c" -> ((2L, 0.0, false))), got.toString)
  }

  test("sessionOverlapPairs: closed-bound overlaps, midnight-spanning " +
      "sessions deduped across day bands, same-user pairs excluded") {
    def e(id: Long, t: String, u: Long) =
      (id, Timestamp.valueOf(t), u, "view", 1.0, "{}")
    val events = Seq(
      // u1 session A [10:00,10:10] + session D [23:55,00:05] (spans midnight)
      e(1, "2024-03-01 10:00:00", 1), e(2, "2024-03-01 10:10:00", 1),
      e(3, "2024-03-01 23:55:00", 1), e(4, "2024-03-02 00:05:00", 1),
      // u2 session B [10:05,10:20] + session C [23:50,00:10] (spans midnight)
      e(5, "2024-03-01 10:05:00", 2), e(6, "2024-03-01 10:20:00", 2),
      e(7, "2024-03-01 23:50:00", 2), e(8, "2024-03-02 00:10:00", 2),
      // u3 session T [10:10,10:15] — TOUCHES A at an instant
      e(9, "2024-03-01 10:10:00", 3), e(10, "2024-03-01 10:15:00", 3),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = JoinOps.sessionOverlapPairs(events).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b")) ->
        ((r.getAs[Long]("n_overlaps"), r.getAs[Long]("overlap_usec"))))
      .toMap
    assert(got == Map(
      // A×B 5 min + D×C 10 min (matched in BOTH day bands, deduped to 1)
      (1L, 2L) -> ((2L, 900000000L)),
      // A×T touch at 10:10 — counts once with zero overlap (closed bounds)
      (1L, 3L) -> ((1L, 0L)),
      // B×T 10:10–10:15
      (2L, 3L) -> ((1L, 300000000L)),
    ), got.toString)
  }

  test("saltedNationActivity equals the plain join + group-by") {
    val events = Tables.events(spark, sf0)
    val customer = Tables.customer(spark, sf0)
    val salted = SkewOps.saltedNationActivity(events, customer)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val plain = events
      .join(customer, col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(12,2)")), 4).cast("double"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }

  test("sortedNeighborhoodPairs: two-level rank ≡ flat row_number, and " +
    "it finds the every-token-mutated pair token blocking cannot") {
    // both tokens of the planted pair mutate (first AND last differ),
    // so neither token-blocking pass can pair them — but their sort
    // positions are adjacent.
    val parts = Seq(
      "almond antique", "almond antiqux", // shared first token only
      "misty rose", "mistz rosx",         // EVERY token mutated
      "aaa zzz", "qqq hhh")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
    val got = JoinOps.sortedNeighborhoodPairs(parts, window = 2,
        minSim = 0.85)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(got.contains(("misty rose", "mistz rosx")), got)
    val blocked = JoinOps.fuzzyNamePairsBlocked(parts, maxDist = 3)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(!blocked.contains(("misty rose", "mistz rosx")),
      "token blocking unexpectedly paired the every-token mutation")

    // the two-level prefix-sum rank must equal a flat global
    // row_number: pair sets agree on real data
    val real = Tables.part(spark, sf0)
    val twoLevel = JoinOps.sortedNeighborhoodPairs(real, window = 5,
        minSim = 0.85)
      .select("name_a", "name_b", "gap").collect().toSet
    import org.apache.spark.sql.expressions.{Window => W}
    val flatRank = real.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("rank", row_number().over(W.orderBy("name")))
    val a = flatRank.select(col("name").as("name_a"),
      col("rank").as("ra"))
    val b = flatRank.select(col("name").as("name_b"),
      col("rank").as("rb"))
    val flat = a.join(b, col("rb") > col("ra") &&
        col("rb") <= col("ra") + 5)
      .withColumn("gap", (col("rb") - col("ra")).cast("int"))
      .withColumn("jw", round(graft.functions.JaroWinkler
        .jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= 0.85)
      .select("name_a", "name_b", "gap").collect().toSet
    assert(twoLevel == flat, "two-level rank diverges from flat window")
  }

  test("entityClusters transitively closes pairwise matches: a chain " +
    "with no direct end-to-end pair is ONE cluster") {
    // chain: (acme corp)~(acme corpx) via first-token block,
    // (acme corpx)~(acmex corpx) via last-token block; the ends share
    // NO block and no direct pair — only the closure links them
    val part = Seq("acme corp", "acme corpx", "acmex corpx",
      "zzz unrelated")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
    val direct = JoinOps.fuzzyNamePairsJw(part, minSim = 0.9)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(direct.contains(("acme corp", "acme corpx")))
    assert(direct.contains(("acme corpx", "acmex corpx")))
    assert(!direct.contains(("acme corp", "acmex corpx")),
      "fixture broken: the chain ends must not pair directly")
    val got = JoinOps.entityClusters(part, minSim = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == Set(
      ("acme corp", "acme corp", 3L),
      ("acme corp", "acme corpx", 3L),
      ("acme corp", "acmex corpx", 3L)), got.mkString(", "))
    // the unmatched singleton carries no resolution info — excluded
    assert(!got.exists(_._2 == "zzz unrelated"))
    // partition of the matched vertex set: each name exactly once
    assert(got.map(_._2).distinct.length == got.length)
  }

  test("goldenRecords: mode survivorship with asc tie-break, " +
    "order-independent numeric rules, one row per cluster") {
    // same transitive chain as above; duplicate-name row 0b makes the
    // brand vote tie 2-2 (B1 wins lexicographically) and the type
    // vote 2-1-1 for T2
    val part = Seq(
      (0L, "acme corp", "B1", "T1", 5, 10.0),
      (1L, "acme corp", "B2", "T9", 1, 12.0),
      (2L, "acme corpx", "B1", "T2", 3, 20.0),
      (3L, "acmex corpx", "B2", "T2", 7, 15.0),
      (4L, "zzz unrelated", "B7", "T7", 9, 99.0),
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice")
    val got = JoinOps.goldenRecords(part, minSim = 0.9).collect()
    assert(got.length == 1, got.mkString(", "))
    val r = got.head
    assert(r.getAs[String]("cluster_rep") == "acme corp")
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[String]("p_brand") == "B1", "tie must break asc")
    assert(r.getAs[String]("p_type") == "T2")
    assert(r.getAs[Double]("max_price") == 20.0)
    assert(r.getAs[Int]("min_size") == 1)
  }

  test("simpsonReversalAudit: per-stratum signs flip against the " +
    "pooled sign on the classic confounded fixture") {
    // Segment A: hi 9/10 (.9) beats lo 80/100 (.8); segment B: hi
    // 30/100 (.3) beats lo 2/10 (.2) — yet pooled hi 39/110 loses to
    // pooled lo 82/110. Reversal must flag in BOTH strata.
    def block(cust: Long, pri: String, filled: Int, total: Int) =
      (0 until total).map(i =>
        (cust, pri, if (i < filled) "F" else "O"))
    val orders = (block(1L, "1-URGENT", 9, 10) ++
      block(1L, "5-LOW", 80, 100) ++
      block(2L, "2-HIGH", 30, 100) ++
      block(2L, "3-MEDIUM", 2, 10))
      .toDF("o_custkey", "o_orderpriority", "o_orderstatus")
    val customer = Seq((1L, "SEG_A"), (2L, "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
    val got = JoinOps.simpsonReversalAudit(orders, customer).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        ((r.getAs[Long]("stratum_sign"), r.getAs[Long]("pooled_sign"),
          r.getAs[Boolean]("reversal"), r.getAs[Double]("rate_hi"),
          r.getAs[Double]("rate_lo")))).toMap
    assert(got == Map(
      "SEG_A" -> ((1L, -1L, true, 0.9, 0.8)),
      "SEG_B" -> ((1L, -1L, true, 0.3, 0.2))), got)
  }

  test("partAbcClasses: cumulative-share cuts land each planted part " +
    "in its class") {
    // revenues 80 / 15 / 5 -> cum shares .80 / .95 / 1.00: the A cut
    // is INCLUSIVE at exactly 80% (integer cross-multiply, no floats)
    val li = Seq((1L, 80.0, 0.0), (2L, 15.0, 0.0), (3L, 5.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val got = JoinOps.partAbcClasses(li).collect()
      .map(r => r.getAs[String]("abc_class") ->
        ((r.getAs[Long]("n_parts"), r.getAs[Double]("revenue"),
          r.getAs[Double]("revenue_share")))).toMap
    assert(got == Map(
      "A" -> ((1L, 80.0, 0.8)),
      "B" -> ((1L, 15.0, 0.15)),
      "C" -> ((1L, 5.0, 0.05))), got)
  }

  test("shippingLatencyByPriority: exact day-diff stats, interpolated " +
    "p90, breach share") {
    import java.sql.Timestamp
    val orders = Seq((1L, "A", Timestamp.valueOf("2024-03-01 00:00:00")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    // latencies 1, 4, 10 days; sla 5 -> one breach
    val li = Seq((1L, "2024-03-02"), (1L, "2024-03-05"), (1L, "2024-03-11"))
      .map { case (k, d) => (k, Timestamp.valueOf(s"$d 00:00:00")) }
      .toDF("l_orderkey", "l_shipdate")
    val r = JoinOps.shippingLatencyByPriority(li, orders, slaDays = 5L)
      .collect().head
    assert((r.getAs[Long]("n_lines"), r.getAs[Long]("min_days"),
      r.getAs[Long]("max_days"), r.getAs[Double]("avg_days"),
      r.getAs[Double]("p50_days"), r.getAs[Double]("p90_days"),
      r.getAs[Double]("breach_rate")) ==
      ((3L, 1L, 10L, 5.0, 4.0, 8.8, 0.333333)), r)
  }

  test("jonckheereLatencyTrend: doubled statistic, tie-corrected " +
    "variance and z match the hand computation; one group yields NULL") {
    import java.sql.Timestamp
    // group 1-U latencies [1,2], group 2-H latencies [2,3]:
    // cross pairs (1,2)< (1,3)< (2,2)= (2,3)< -> 2J = 2*3 + 1 = 7
    // E2 = (16 - 8)/2 = 4; tie moments: value 2 pooled t=2;
    // Var = (4*3*13 - 36 - 18)/72 + 0 + (4*2)/(8*4*3) = 102/72 + 1/12
    //     = 1.5 -> z = (7-4)/(2*sqrt(1.5)) = 1.224745
    val orders = Seq(
      (1L, "1-U", Timestamp.valueOf("2024-03-01 00:00:00")),
      (2L, "2-H", Timestamp.valueOf("2024-03-01 00:00:00")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq((1L, "2024-03-02"), (1L, "2024-03-03"),
      (2L, "2024-03-03"), (2L, "2024-03-04"))
      .map { case (k, d) => (k, Timestamp.valueOf(s"$d 00:00:00")) }
      .toDF("l_orderkey", "l_shipdate")
    val r = JoinOps.jonckheereLatencyTrend(li, orders).collect().head
    assert((r.getAs[Long]("n_total"), r.getAs[Long]("n_groups"),
      r.getAs[Long]("jt_2j"), r.getAs[Double]("jt_mean_2j")) ==
      ((4L, 2L, 7L, 4.0)), r)
    assert(r.getAs[Double]("z_score") == 1.224745, r)
    // a single group has no cross pairs: 2J = 0, NULL z
    val one = JoinOps.jonckheereLatencyTrend(
      li.filter(col("l_orderkey") === 1L),
      orders.filter(col("o_orderkey") === 1L)).collect().head
    assert(one.getAs[Long]("jt_2j") == 0L &&
      one.isNullAt(one.fieldIndex("z_score")), one)
  }

  test("gkGammaPriorityLatency: +1 on a clean ordinal association, " +
    "-1 reversed, ties never counted") {
    import java.sql.Timestamp
    def fixture(d1: Seq[String], d2: Seq[String]) = {
      val orders = Seq(
        (1L, "1-U", Timestamp.valueOf("2024-03-01 00:00:00")),
        (2L, "2-H", Timestamp.valueOf("2024-03-01 00:00:00")))
        .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      val li = (d1.map((1L, _)) ++ d2.map((2L, _)))
        .map { case (k, d) => (k, Timestamp.valueOf(s"$d 00:00:00")) }
        .toDF("l_orderkey", "l_shipdate")
      (li, orders)
    }
    // g1 latencies [1,2], g2 [2,3]: conc 3, disc 0, tie (2,2) skipped
    val (liA, oA) = fixture(Seq("2024-03-02", "2024-03-03"),
      Seq("2024-03-03", "2024-03-04"))
    val a = JoinOps.gkGammaPriorityLatency(liA, oA).collect().head
    assert((a.getAs[Long]("n_total"), a.getAs[Long]("conc"),
      a.getAs[Long]("disc"), a.getAs[Double]("gk_gamma")) ==
      ((4L, 3L, 0L, 1.0)), a)
    // reversed: g1 [2,3], g2 [1,2] -> conc 0, disc 3 -> gamma = -1
    val (liB, oB) = fixture(Seq("2024-03-03", "2024-03-04"),
      Seq("2024-03-02", "2024-03-03"))
    val b = JoinOps.gkGammaPriorityLatency(liB, oB).collect().head
    assert(b.getAs[Double]("gk_gamma") == -1.0, b)
  }

  test("kAnonGeneralizationLadder: min class walks the ladder until " +
    "only the coarsest grain satisfies k") {
    import java.sql.Timestamp
    val customer = Seq((1L, "SEG_A")).toDF("c_custkey", "c_mktsegment")
    val d = Timestamp.valueOf("2024-01-15 00:00:00")
    val orders = (Seq.fill(6)(("1-URGENT", 1L, d)) ++
      Seq(("5-LOW", 1L, d)))
      .toDF("o_orderpriority", "o_custkey", "o_orderdate")
    val got = JoinOps.kAnonGeneralizationLadder(orders, customer).collect()
      .map(r => r.getAs[Long]("level") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("min_class_size"),
          r.getAs[Long]("n_below_k"), r.getAs[Long]("rows_at_risk"),
          r.getAs[Boolean]("k_satisfied")))).toMap
    // levels 0-2 all carry the singleton 5-LOW class; only the
    // year-only grain pools everything to 7 >= k
    assert(got == Map(
      0L -> ((2L, 1L, 1L, 1L, false)),
      1L -> ((2L, 1L, 1L, 1L, false)),
      2L -> ((2L, 1L, 1L, 1L, false)),
      3L -> ((1L, 7L, 0L, 0L, true))), got)
  }

  test("supplierHhiByNation: exact share-squared concentration and " +
    "effective supplier count") {
    val nation = Seq((1, "N1")).toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1), (20L, 1))
      .toDF("s_suppkey", "s_nationkey")
    // revenues 100 and 50 -> shares 2/3, 1/3 -> HHI = 5/9
    val li = Seq((10L, 100.0, 0.0), (20L, 100.0, 0.5))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val r = JoinOps.supplierHhiByNation(li, supplier, nation)
      .collect().head
    assert((r.getAs[String]("n_name"), r.getAs[Long]("n_suppliers"),
      r.getAs[Double]("revenue"), r.getAs[Double]("hhi"),
      r.getAs[Double]("effective_suppliers")) ==
      (("N1", 2L, 150.0, 0.555556, 1.8)), r)
  }

  test("joinSizeProfile: exact F2, join cardinality and skew ratios " +
    "without touching the fact join") {
    // left keys a,a,a,b -> counts {a:3, b:1}; right a,b,b -> {a:1, b:2}
    // F2_left = 10, F2_right = 5, join rows = 3·1 + 1·2 = 5
    val left = Seq("a", "a", "a", "b").toDF("lk")
    val right = Seq("a", "b", "b").toDF("rk")
    val r = SkewOps.joinSizeProfile(left, right, "lk", "rk").collect().head
    assert((r.getAs[Long]("n_left"), r.getAs[Long]("keys_left"),
      r.getAs[Long]("f2_left"), r.getAs[Long]("max_left"),
      r.getAs[Double]("skew_left")) == ((4L, 2L, 10L, 3L, 1.5)), r)
    assert((r.getAs[Long]("n_right"), r.getAs[Long]("keys_right"),
      r.getAs[Long]("f2_right"), r.getAs[Long]("max_right"),
      r.getAs[Double]("skew_right")) == ((3L, 2L, 5L, 2L, 1.333333)), r)
    assert((r.getAs[Long]("keys_matched"), r.getAs[Long]("join_rows"))
      == ((2L, 5L)), r)
  }
}
