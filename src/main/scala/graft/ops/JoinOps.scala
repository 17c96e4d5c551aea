package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Join / set-operation coverage. The reference contains ZERO joins
  * (verified in SURVEY.md §2.3) — all its analytics are single-table
  * group-bys — so this module fills the category with the star-schema
  * joins its data model implies, over the driver TPC-H-ish tables.
  *
  * Scale posture: constant-size dims (region 5, nation 25 rows at any
  * SF) are unconditionally `broadcast()`; SF-proportional dims
  * (customer, supplier, part) go through [[maybeBroadcast]] — hinted
  * only while their stats fit `autoBroadcastJoinThreshold`, falling
  * back to the planner's shuffle join beyond it. Only fact⋈fact
  * (lineitem⋈orders) always shuffles, on the natural key both sides.
  * AQE handles skew.
  */
object JoinOps {

  /** Broadcast `dim` only when its optimizer-estimated size fits the
    * session's `autoBroadcastJoinThreshold`. A bare `broadcast()` hint
    * is unconditional — fine for the constant-size dims (nation 25,
    * region 5 rows at ANY scale factor) but wrong for the dims that
    * GROW with SF (customer, supplier, part): at 100 TB a forced
    * customer broadcast OOMs the driver where the planner would have
    * picked a shuffle join. Parquet relations carry file-size stats, so
    * the guard is a plan-time metadata check, not a scan. */
  def maybeBroadcast(dim: DataFrame): DataFrame = {
    val classicDf = dim.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val threshold = classicDf.sparkSession.sessionState.conf
      .autoBroadcastJoinThreshold
    val size = classicDf.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && size <= threshold) broadcast(dim) else dim
  }

  /** Revenue per market segment: lineitem ⋈ orders ⋈ customer.
    * orders⋈customer is broadcast when customer fits (1.5% of
    * lineitem); lineitem⋈orders shuffles on the order key. */
  def revenueByMktSegment(li: DataFrame, orders: DataFrame,
      customer: DataFrame): DataFrame =
    // Eager aggregation (a rewrite Catalyst does not do itself): sum
    // the per-order revenue BEFORE the fact⋈fact join, so the shuffle
    // carries one narrow row per order instead of every lineitem —
    // exact, because the decimal sums are associative. At 100 TB this
    // is the difference between shuffling the whole lineitem table and
    // shuffling ~a quarter of it at 32 bytes a row.
    li.groupBy(col("l_orderkey"))
      .agg(
        sum(Num.dec2(col("l_extendedprice")) *
          Num.oneMinus(col("l_discount"))).as("rev_order"),
        count(lit(1)).as("n_order_lines"))
      .join(orders, col("l_orderkey") === orders("o_orderkey"))
      .join(maybeBroadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        Num.sumRound(col("rev_order"), 2).as("revenue"),
        sum(col("n_order_lines")).as("n_lines"))

  /** Revenue per nation/region: the full star
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with every dim
    * broadcast. One shuffle total (li⋈orders) + final aggregation. */
  def revenueByNation(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(maybeBroadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Num.sumRound(Num.dec2(col("l_extendedprice")) *
          Num.oneMinus(col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Customers that have at least one order — left-semi (EXISTS). */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** Customers with no orders — left-anti (NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** Order priority × line status counts — an inner join whose payload
    * exercises multi-key aggregation after the shuffle join. */
  def priorityLineStatus(li: DataFrame, orders: DataFrame): DataFrame =
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy("o_orderpriority", "l_linestatus")
      .agg(
        count(lit(1)).as("n_lines"),
        Num.sumRound(Num.dec2(col("l_quantity")), 4).as("sum_qty"))

  /** Union of two event slices, distinct — set-op coverage (the
    * reference's implied streamed-vs-batch comparison, SURVEY.md §2.3). */
  def unionDistinctUsers(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click").select("user_id")
      .union(events.filter(col("event_type") === "view").select("user_id"))
      .distinct()

  /** Supplier revenue by part brand — a second join path through the
    * star (li ⋈ supplier ⋈ part), both dims broadcast. */
  def supplierPartRevenue(li: DataFrame, supplier: DataFrame,
      part: DataFrame): DataFrame =
    li.join(maybeBroadcast(supplier), li("l_suppkey") === supplier("s_suppkey"))
      .join(maybeBroadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy("s_name", "p_brand")
      .agg(Num.sumRound(Num.dec2(col("l_extendedprice")) *
        Num.oneMinus(col("l_discount")), 2).as("revenue"))

  /** TPC-H Q10 (returned-item reporting) adapted to the driver schema:
    * customers ranked by revenue lost to returns in a quarter — the
    * lineitem⋈orders⋈customer⋈nation shape with an ordered limit.
    * The time-sliced orders side is the SMALL side (one quarter), so
    * it goes through the broadcast stats guard and the R-filtered
    * lineitem scan joins it map-side with no fact shuffle at all;
    * nation broadcasts unconditionally (25 rows at any SF), customer
    * through the guard; one aggregation after the joins (exact decimal
    * sums), and the top-k plans TakeOrderedAndProject. Beyond the
    * broadcast threshold the guard falls back to the planner's shuffle
    * join. */
  def tpchQ10(li: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, from: String = "1997-07-01",
      until: String = "1997-10-01", k: Int = 20): DataFrame =
    li.filter(col("l_returnflag") === "R")
      .join(maybeBroadcast(orders.filter(
        col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(maybeBroadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(Num.sumRound(Num.dec2(col("l_extendedprice")) *
        Num.oneMinus(col("l_discount")), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)

  /** TPC-H Q3 (shipping priority) adapted to the driver schema: the
    * composite filter→join→aggregate→ordered-limit shape. Dims
    * broadcast, one fact shuffle, TakeOrderedAndProject top-10. */
  def tpchQ3(li: DataFrame, orders: DataFrame, customer: DataFrame,
      segment: String = "BUILDING", cutoff: String = "1998-01-01"): DataFrame =
    li.filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .join(orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(maybeBroadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(Num.sumRound(Num.dec2(col("l_extendedprice")) *
        Num.oneMinus(col("l_discount")), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** TPC-H Q5 (local supplier volume) adapted: revenue per nation where
    * the supplier and the ordering customer share a nation — the
    * five-way join with a cross-table equality predicate. */
  def tpchQ5(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(maybeBroadcast(c), o("o_custkey") === c("c_custkey"))
      .join(maybeBroadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
        sup("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(Num.sumRound(Num.dec2(col("l_extendedprice")) *
        Num.oneMinus(col("l_discount")), 2).as("revenue"))
  }

  /** TPC-H Q4 adapted (order priority checking): orders with at least
    * one line shipped more than `lateDays` after the order date,
    * counted per priority. The EXISTS subquery is a LEFT SEMI join —
    * equi on the order key with the date comparison as a residual —
    * so lineitem is never materialized per order and each order counts
    * once no matter how many late lines it has. (The reference data
    * carries no commit/receipt dates, so "late" is ship-vs-order
    * lag rather than Q4's commit-vs-receipt.) */
  def slowOrdersByPriority(orders: DataFrame, li: DataFrame,
      lateDays: Int = 90): DataFrame =
    orders
      .join(li.select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))

  /** TPC-H Q14 (promotion effect): conditional aggregation over the
    * lineitem⋈part join in one month. The promo share divides the two
    * EXACT decimal sums (cast to double only at the end), so the
    * percentage is bit-identical in any engine and summation order;
    * `sum(when(...))` skips non-promo rows via SQL null semantics —
    * no second scan. Part is a guarded broadcast. */
  def tpchQ14(li: DataFrame, part: DataFrame,
      monthStart: String = "1996-09-01", monthEnd: String = "1996-10-01")
      : DataFrame = {
    val disc = Num.dec2(col("l_extendedprice")) * Num.oneMinus(col("l_discount"))
    li.filter(col("l_shipdate") >= lit(monthStart).cast("timestamp") &&
        col("l_shipdate") < lit(monthEnd).cast("timestamp"))
      .join(maybeBroadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc)).as("promo_dec"),
        sum(disc).as("total_dec"))
      .select(
        round(col("promo_dec"), 2).cast("double").as("promo_revenue"),
        round(col("total_dec"), 2).cast("double").as("total_revenue"),
        ((col("promo_dec") * lit(100)).cast("double") /
          col("total_dec").cast("double")).as("promo_pct"))
  }

  /** TPC-H Q18 (large-volume customers): the aggregate-then-join
    * shape — per-order quantity sums FIRST (the `IN (GROUP BY …
    * HAVING)` subquery collapses lineitem to one 16-byte row per
    * order before anything joins), then orders and a guarded customer
    * broadcast attach detail, TakeOrderedAndProject keeps the top k.
    * At 100 TB the only wide shuffle is lineitem's orderkey agg —
    * the same exchange any per-order rollup pays. */
  def tpchQ18(li: DataFrame, orders: DataFrame, customer: DataFrame,
      minQty: Double = 150, k: Int = 100): DataFrame =
    li.groupBy("l_orderkey")
      .agg(sum(Num.dec2(col("l_quantity"))).as("qty_dec"))
      .filter(col("qty_dec") > minQty)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(maybeBroadcast(customer.select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        round(col("qty_dec"), 2).cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** TPC-H Q19 (discounted revenue): one disjunction of three
    * brand/size/quantity bands over lineitem⋈part. The OR-of-ANDs
    * can't prune the scan, but the per-branch part predicates reduce
    * the broadcast side and the whole filter is one codegen'd
    * conjunction pass post-join. */
  def tpchQ19(li: DataFrame, part: DataFrame): DataFrame = {
    val bands = Seq(("Brand#12", 1, 5, 1, 11), ("Brand#23", 1, 10, 10, 20),
      ("Brand#3", 1, 15, 20, 30))
    val pred = bands.map { case (brand, s0, s1, q0, q1) =>
      col("p_brand") === brand && col("p_size").between(s0, s1) &&
        col("l_quantity").between(q0, q1)
    }.reduce(_ || _)
    li.join(maybeBroadcast(part.select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(Num.sumRound(Num.dec2(col("l_extendedprice")) *
        Num.oneMinus(col("l_discount")), 2).as("revenue"))
  }

  /** TPC-H Q13 (customer distribution): how many customers placed
    * 0, 1, 2, … orders. Written with the eager-aggregation rewrite the
    * spec's LEFT OUTER JOIN + GROUP BY c_custkey invites: orders
    * collapse to one (o_custkey, cnt) row per customer FIRST, so the
    * outer join carries a pre-aggregated right side instead of every
    * order row — the fact table's only shuffle is its own custkey agg,
    * and `coalesce(cnt, 0)` restores the zero-order customers the spec
    * gets from counting nulls. The second aggregate (distribution over
    * counts) is a few hundred rows. (No o_comment column in the driver
    * schema; the priority filter stands in for Q13's comment
    * NOT LIKE.) */
  def tpchQ13(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    customer.select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** Top-N orders per customer by total price — per-group top-k via
    * row_number (W2 pattern at join scale). Deterministic tie-break on
    * the order key. */
  def topOrdersPerCustomer(orders: DataFrame, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  /** Full-outer daily reconciliation of two independent activity logs
    * (orders vs events): one row per day seen by EITHER side, with
    * zero-filled counts — the audit query that surfaces days where one
    * pipeline recorded activity and the other went dark. Completes the
    * join-type family (inner/left/semi/anti/as-of/range already
    * covered; SURVEY.md §2.3 gap-fill): FULL OUTER is the one shape
    * where neither side may be pruned.
    *
    * Shape at scale: each side pre-aggregates to |days| rows BEFORE
    * the join — the full-outer join itself runs on two date-cardinality
    * frames (a sort-merge over trivially small inputs; broadcast is
    * deliberately NOT hinted because full-outer cannot broadcast
    * either side), so cost is dominated by the two scans, each a
    * map-side partial count. */
  /** Fuzzy entity resolution over the part-name vocabulary: pairs of
    * DISTINCT names within edit distance `maxDist`, each annotated with
    * how many parts carry it — the blocked-similarity-join primitive
    * behind catalog dedup and record linkage.
    *
    * Vocabulary-first is the scale move: the distinct projection
    * collapses the row count to the name vocabulary (2000 parts → 64
    * names at sf0.01; real vocabularies grow sublinearly in rows), so
    * the quadratic pair stage runs on the collapsed frame, pruned by
    * the length band |len(a)-len(b)| ≤ maxDist that edit distance
    * implies. The band prune rides inside the (broadcast) nested-loop
    * join condition; `levenshtein` itself is the codegen'd built-in.
    * For vocabularies too large for O(V²), swap the band prune for
    * multi-pass token blocking (equi-joins on first/last token,
    * unioned) — same frame contract, bounded recall loss. */
  def fuzzyNamePairs(part: DataFrame, maxDist: Int = 3): DataFrame = {
    val names = part.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
    val a = names.select(col("name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val b = names.select(col("name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    a.join(b, col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
  }

  /** Token-blocking form of [[fuzzyNamePairs]] — the large-vocabulary
    * path the band-pruned variant's scaladoc promises. Instead of the
    * O(V²) nested-loop with a length-band prune, candidate pairs are
    * generated by TWO equi-join passes over the vocabulary — names
    * sharing their FIRST whitespace token, and names sharing their
    * LAST — unioned and dedup'd, then scored with the codegen'd
    * `levenshtein` and filtered to `maxDist`.
    *
    * Scale contract: each pass is a plain shuffle-hash/sort-merge
    * equi-join on the token key, so cost is Σ block² per token bucket
    * rather than V² — the standard blocking trade from the record-
    * linkage literature. Recall is bounded, not perfect: a true pair
    * survives iff at least one of its end tokens is untouched by the
    * edit, which holds for the dominant single-token typo/transposition
    * class (FuzzyBlockedSpec pins this with a planted transposition)
    * and fails only when BOTH end tokens mutate. Same output frame as
    * the band-pruned form, so callers can swap on vocabulary size. */
  def fuzzyNamePairsBlocked(part: DataFrame, maxDist: Int = 3): DataFrame =
    blockedNameCandidates(part)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")

  /** [[fuzzyNamePairsBlocked]] scored with the native Jaro–Winkler
    * similarity ([[graft.functions.JaroWinkler]]) instead of raw edit
    * distance — the scorer the record-linkage literature actually
    * recommends for NAMES: already normalized to [0,1] (no
    * length-relative threshold gymnastics), transposed middle
    * characters penalized lightly, divergent prefixes heavily. Same
    * token-blocked candidate generation, so the scale contract is
    * unchanged (Σ block² per token, never V²); the similarity is
    * rounded to 6dp BEFORE the threshold so the boundary decision is
    * bit-identical to the DuckDB oracle's. */
  def fuzzyNamePairsJw(part: DataFrame, minSim: Double = 0.93): DataFrame =
    blockedNameCandidates(part)
      .withColumn("jw", graft.functions.RoundHalfUp.roundFused(
        graft.functions.JaroWinkler
          .jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= minSim)
      .select("name_a", "name_b", "jw", "n_parts_a", "n_parts_b")

  /** Blocking-quality audit for the fuzzy-name family — the two
    * numbers the record-linkage literature (Christen '12) evaluates
    * every blocking scheme on:
    *
    *   - REDUCTION RATIO: 1 − |candidates| / (n·(n−1)/2) — how much
    *     of the quadratic comparison space the blocker skipped;
    *   - PAIRS COMPLETENESS: |blocked true pairs| / |true pairs| —
    *     how much of the truth the skipping lost.
    *
    * The truth standard here is PROVABLY exact, not sampled:
    * Levenshtein ≤ 3 implies a length difference ≤ 3, so
    * [[fuzzyNamePairs]]' length-banded all-pairs scan enumerates the
    * COMPLETE ≤3-edit pair set (the band cannot drop a true pair),
    * and the token-blocked set ([[fuzzyNamePairsBlocked]]) is a
    * subset by construction — completeness is a true fraction, never
    * an estimate. At 100 TB the truth side is the expensive one (the
    * banded scan is O(n²) within length bands); this audit is the
    * periodic CALIBRATION run that justifies shipping the blocked
    * form, exactly how production linkage pipelines validate their
    * blockers on a slice.
    *
    * Determinism: every number is an exact count; the two ratios are
    * single pinned divisions rounded 6dp. */
  def blockingQualityAudit(part: DataFrame, maxDist: Int = 3): DataFrame = {
    val nNames = part.select(col("p_name")).distinct()
      .agg(count(lit(1)).as("n_names"))
    val nCand = blockedNameCandidates(part)
      .agg(count(lit(1)).as("n_candidates"))
    val nTrue = fuzzyNamePairs(part, maxDist)
      .agg(count(lit(1)).as("n_true_pairs"))
    val nBlocked = fuzzyNamePairsBlocked(part, maxDist)
      .agg(count(lit(1)).as("n_blocked_true"))
    nNames.crossJoin(broadcast(nCand))
      .crossJoin(broadcast(nTrue)).crossJoin(broadcast(nBlocked))
      // integer `div` (Spark's `/` on longs promotes to double —
      // exact only below 2^53, and the discipline is exactness by
      // construction, not by range luck)
      .withColumn("n_all_pairs", expr("n_names * (n_names - 1) div 2"))
      .select(col("n_names"), col("n_all_pairs"),
        col("n_candidates"), col("n_true_pairs"), col("n_blocked_true"),
        round(lit(1.0) - col("n_candidates").cast("double") /
          col("n_all_pairs").cast("double"), 6).as("reduction_ratio"),
        when(col("n_true_pairs") > 0L,
          round(col("n_blocked_true").cast("double") /
            col("n_true_pairs").cast("double"), 6))
          .as("pairs_completeness"))
  }

  /** Sorted-neighborhood record linkage (Hernández & Stolfo '95) —
    * the third blocking strategy in the fuzzy family, catching what
    * token blocking structurally cannot: pairs whose EVERY token
    * mutated slightly but whose sort position barely moved. Names are
    * ranked in one global lexicographic order; each name pairs with
    * the `window` names after it; pairs score with the native
    * Jaro–Winkler and keep at `minSim`.
    *
    * Scale shape: the textbook method needs a global sort — a single
    * monolithic `row_number()` window would serialize the corpus
    * through one task. The rank here is a TWO-LEVEL prefix sum (the
    * [[graft.ops.DocOps.shardAssignments]] discipline): intra-rank
    * within first-character buckets (parallel window per bucket), a
    * bucket-count frame of |alphabet| rows windowed on the driver-tiny
    * side and broadcast back. The neighborhood join is then an
    * EQUI-join on rank+i with i exploded 1..window — never a range
    * BNL. Window diameter bounds candidates at n·window. */
  def sortedNeighborhoodPairs(part: DataFrame, window: Int = 10,
      minSim: Double = 0.88): DataFrame = {
    val names = part.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("b", substring(col("name"), 1, 1))
    val wIntra = Window.partitionBy("b").orderBy("name")
    val intra = names.withColumn("rn", row_number().over(wIntra))
    // |alphabet| rows: the only serial window runs over ≤ 256 rows
    val wOff = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = names.groupBy("b").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(wOff), lit(0L)))
      .select("b", "off")
    val ranked = intra.join(broadcast(offsets), "b")
      .select(col("name"), col("n_parts"),
        (col("off") + col("rn")).as("rank"))
    val probes = ranked
      .withColumn("gap", explode(array((1 to window).map(lit): _*)))
      .select(col("name").as("name_a"), col("n_parts").as("n_parts_a"),
        (col("rank") + col("gap")).as("rank_b"), col("gap"))
    probes
      .join(ranked.select(col("name").as("name_b"),
        col("n_parts").as("n_parts_b"), col("rank").as("rank_b")), "rank_b")
      .withColumn("jw", graft.functions.RoundHalfUp.roundFused(
        graft.functions.JaroWinkler
          .jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= minSim)
      .select("name_a", "name_b", "gap", "jw", "n_parts_a", "n_parts_b")
  }

  /** Shared token-blocking pass for the fuzzy name joins: candidate
    * pairs sharing their FIRST or LAST whitespace token, unioned,
    * dedup'd (distinct over the full row dedups pairs blocked by BOTH
    * passes). */
  private[ops] def blockedNameCandidates(part: DataFrame): DataFrame = {
    val names = part.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
    val toks = names
      .withColumn("tok_first", split(col("name"), " ").getItem(0))
      .withColumn("tok_last", element_at(split(col("name"), " "), -1))
    def pass(key: String): DataFrame = {
      val a = toks.select(col(key).as("k"), col("name").as("name_a"),
        col("n_parts").as("n_parts_a"))
      val b = toks.select(col(key).as("k"), col("name").as("name_b"),
        col("n_parts").as("n_parts_b"))
      a.join(b, Seq("k")).filter(col("name_a") < col("name_b")).drop("k")
    }
    pass("tok_first").unionByName(pass("tok_last")).distinct()
  }

  def dailyOrdersVsEvents(orders: DataFrame, events: DataFrame): DataFrame = {
    val o = orders.groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val e = events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Entity-resolution clusters — the step every fuzzy-pair family
    * here feeds but none completed: pairwise matches are only HALF of
    * entity resolution, because match sets are not transitive-closed
    * ("acme corp"~"acme co" and "acme co"~"acme inc" without the
    * direct pair). Takes [[fuzzyNamePairsJw]]'s token-blocked
    * Jaro–Winkler matches as the match graph and runs
    * [[graft.ops.DedupOps.connectedComponentsStar]] (O(log n)
    * large-star/small-star — string vertex ids work unchanged: the
    * label algebra only needs a total order, so the component label IS
    * the lexicographic-min member name). One row per clustered name:
    * (cluster_rep, name, n_members); singleton names with no fuzzy
    * match carry no resolution information and are excluded (pairs
    * define the vertex set).
    *
    * Scale shape: inherits the blocked pair generation (never all
    * pairs) and the star CC's logarithmic round bound; the size join
    * is a groupBy on the label — no new quadratic or serial stage. */
  /** INTERVAL-overlap join — the temporal join family's remaining
    * member beside the as-of join (point→latest-before) and the range
    * join (point→window): interval×interval overlap, here as user
    * co-presence over gap-sessionized activity. Two users' sessions
    * overlap iff `a.start ≤ b.end ∧ b.start ≤ a.end` (closed bounds —
    * sessions touching at an instant count with 0 overlap, stated).
    * Output is the per-user-pair rollup: how many session pairs
    * overlapped and for how long in total (exact BIGINT microseconds)
    * — the device-correlation / fraud co-presence primitive.
    *
    * Spark has no native interval join, so this is the (a)-tier
    * composition: each session explodes to the HOUR bands it spans
    * (sessions are gap-bounded, so typically 1-2 band rows), the
    * self-join keys on the band (co-partitioned equi-join — never a
    * theta-only cartesian), the exact overlap predicate filters
    * within buckets, and the canonical-band equality (overlap-start
    * hour) keeps each pair exactly once with no distinct shuffle.
    * Join cost is Σ (sessions-in-band)² — the co-presence question is
    * itself pairwise within a band, so the bound is the honest cost
    * of the answer; restrict the population upstream (cohort, event
    * filter) when concurrency² is too much, exactly like the minhash
    * bucket caps. */
  def sessionOverlapPairs(events: DataFrame): DataFrame = {
    val sess = graft.ops.EventOps.sessionStats(events)
      .select(col("user_id"), col("session_id"),
        col("session_start").as("s"), col("session_end").as("e"))
    // Band granularity sets the Σ bucket² join cost: it should sit
    // near the typical session DURATION (minutes-hours), not the
    // calendar day — hour bands cut each bucket's population ~24×,
    // i.e. the quadratic term ~500×, while a session still explodes
    // to only duration/1h + 1 band rows.
    val banded = sess.withColumn("hb",
      explode(sequence(date_trunc("hour", col("s")),
        date_trunc("hour", col("e")), expr("INTERVAL 1 HOUR"))))
    val a = banded.select(col("user_id").as("ua"), col("session_id").as("sa"),
      col("s").as("s_a"), col("e").as("e_a"), col("hb"))
    val b = banded.select(col("user_id").as("ub"), col("session_id").as("sb"),
      col("s").as("s_b"), col("e").as("e_b"), col("hb"))
    // A pair spanning k shared bands matches k times — instead of a
    // distinct() over every matched copy, attribute each pair to
    // exactly ONE canonical band: the hour its overlap STARTS in.
    // That hour is inside both sessions (overlap start = the later
    // session start, ≤ both ends when the overlap predicate holds),
    // so both sides carry its band row and no other band passes the
    // equality — the dedup is a codegen'd filter and the rollup
    // aggregates map-side with nothing re-shuffled.
    val pairs = a.join(b, Seq("hb"))
      .filter(col("ua") < col("ub") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
        col("hb") === date_trunc("hour", greatest(col("s_a"), col("s_b"))))
      .select(col("ua"), col("ub"),
        (unix_micros(least(col("e_a"), col("e_b"))) -
          unix_micros(greatest(col("s_a"), col("s_b")))).as("ov"))
    pairs.groupBy(col("ua").as("user_a"), col("ub").as("user_b"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(col("ov")).as("overlap_usec"))
  }

  def entityClusters(part: DataFrame, minSim: Double = 0.93): DataFrame = {
    val pairs = fuzzyNamePairsJw(part, minSim)
      .select(col("name_a").as("a_id"), col("name_b").as("b_id"))
    val labels = DedupOps.connectedComponentsStar(pairs)
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "cluster_id")
      .select(col("cluster_id").as("cluster_rep"),
        col("v_id").as("name"), col("n_members"))
  }

  /** Golden-record survivorship over [[entityClusters]]: one merged
    * row per duplicate-entity cluster, each field resolved by its own
    * survivorship rule — the master-data-management step after entity
    * resolution (categoricals by MODE with a lexicographic tie-break,
    * numerics by max/min). A user of the dedup stack gets back a
    * clean dimension table, not just pair/cluster diagnostics.
    *
    * Determinism: modes tie-break (count desc, value asc) — total
    * order; max(double)/min(int) are order-independent. Shape: the
    * cluster frame is fuzzy-pair-derived (≪ table) and checkpointed
    * once; each mode is a partitioned window over the collapsed
    * (cluster, value) counts — no serial window, no corpus shuffle
    * beyond the one name-keyed join against `part`. */
  def goldenRecords(part: DataFrame, minSim: Double = 0.93): DataFrame = {
    val clusters = entityClusters(part, minSim)
      .select(col("cluster_rep"), col("name"))
      .localCheckpoint()
    val rows = clusters
      .join(part, clusters("name") === part("p_name"))
    def mode(field: String): DataFrame = {
      val cnt = rows.groupBy(col("cluster_rep").as("cr"), col(field).as("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("cr").orderBy(col("c").desc, col("v").asc)
      cnt.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("cr").as("cluster_rep"), col("v").as(field))
    }
    rows.groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_rows"),
        max(col("p_retailprice")).as("max_price"),
        min(col("p_size")).as("min_size"))
      .join(mode("p_brand"), "cluster_rep")
      .join(mode("p_type"), "cluster_rep")
  }

  /** ABC revenue classification of the part catalog: parts sorted by
    * revenue descending, class A = the head whose cumulative share
    * stays ≤ 80%, B to 95%, C the tail — the inventory-management
    * cut that decides which SKUs get tight control. The Pareto
    * analysis as an OPERATOR, not a chart.
    *
    * Scale: the cumulative share comes from
    * [[graft.ops.RankOps.globalRunningSum]]'s two-level prefix — no
    * serial window ever touches the part frame (the catalog is
    * SF-proportional). Class cuts are integer cross-multiplications
    * (cum·100 ≤ 80·total — exact cents, no float shares); display
    * revenue/share are single pinned divisions. */
  def partAbcClasses(lineitem: DataFrame): DataFrame = {
    val rev = lineitem.groupBy(col("l_partkey"))
      .agg((sum(Num.dec2(col("l_extendedprice")) *
        Num.oneMinus(col("l_discount"))) * lit(10000)).cast("bigint")
        .as("rc"))
    val run = RankOps.globalRunningSum(rev, -col("rc"),
      Seq(col("rc").desc, col("l_partkey").asc), col("rc"), "cum_rc")
    val tot = rev.agg(sum("rc").as("t"))
    val cls = when(col("cum_rc") * lit(100L) <= lit(80L) * col("t"), "A")
      .when(col("cum_rc") * lit(100L) <= lit(95L) * col("t"), "B")
      .otherwise("C")
    run.crossJoin(broadcast(tot))
      .groupBy(cls.as("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum("rc").as("class_rc"),
        max("t").as("t"))
      .select(col("abc_class"), col("n_parts"),
        round(col("class_rc").cast("double") / 10000.0, 2).as("revenue"),
        round(col("class_rc").cast("double") / col("t").cast("double"), 6)
          .as("revenue_share"))
  }

  /** Shipping-latency SLA profile per order priority: exact day-diff
    * distribution (min/max/avg/p50/p90) between order and ship dates
    * plus the share of lines past `slaDays` — the operational
    * fulfilment readout the priority column exists to drive.
    *
    * Determinism: latencies are exact integer day diffs; avg and
    * breach rate are pinned divisions; p50/p90 ride the established
    * percentile ≡ quantile_cont interpolation parity. Shape: one
    * fact⋈fact join on the natural key, one grouped collapse onto
    * |priorities| rows. */
  def shippingLatencyByPriority(lineitem: DataFrame, orders: DataFrame,
      slaDays: Long = 90L): DataFrame = {
    val lat = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("lat"))
    lat.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        min("lat").as("min_days"), max("lat").as("max_days"),
        sum("lat").as("sum_days"),
        expr("percentile(lat, 0.5)").as("p50"),
        expr("percentile(lat, 0.9)").as("p90"),
        sum(when(col("lat") > slaDays, 1L).otherwise(0L)).as("n_breach"))
      .select(col("o_orderpriority"), col("n_lines"),
        col("min_days"), col("max_days"),
        round(col("sum_days").cast("double") / col("n_lines").cast("double"),
          6).as("avg_days"),
        round(col("p50"), 6).as("p50_days"),
        round(col("p90"), 6).as("p90_days"),
        round(col("n_breach").cast("double") / col("n_lines").cast("double"),
          6).as("breach_rate"))
  }

  /** Jonckheere–Terpstra ordered-alternatives trend test: does
    * shipping latency INCREASE monotonically down the priority ladder
    * (1-URGENT < 2-HIGH < … < 5-LOW — the natural string order)? The
    * ordered k-sample sharpening of Kruskal–Wallis: J = Σ_{i<j} U_ij
    * pools every cross-priority pair, so a consistent ordering is
    * detected at far smaller shifts than the unordered H. Emits the
    * DOUBLED statistic 2J (ties count once — exact), the doubled null
    * mean (N² − Σnᵢ²)/2, and the z-score under the tie-corrected
    * Hollander–Wolfe variance.
    *
    * Determinism: latencies collapse to the bounded (priority, days)
    * grid; 2J = Σᵥ Σ_{i<j} cⱼ(v)·(2·cumᵢ(v) + cᵢ(v)) with cumᵢ(v)
    * the strictly-below prefix of group i on the POOLED value grid —
    * exact BIGINT throughout, and the pairing is an EQUI-join on the
    * value (never a v<v theta join: the day domain runs to thousands,
    * and grid² pairs through a nested loop cost 14 s at sf0.1 — the
    * prefix form is the [[graft.ops.EventOps.mannWhitneyTypePairs]]
    * rank-sum discipline). Every variance ingredient (Σn(n−1)(2n+5)
    * and the tie moments over pooled value counts) is
    * DECIMAL(38,0)-exact, three pinned divisions summed, z one final
    * chain. Degenerate inputs (< 2 groups or zero variance) → NULL z.
    *
    * Shape: one equi-join + (priority, days) hash agg collapses the
    * fact table; the per-group prefixes ride windows over the dense
    * |priorities| × |days| grid (collapsed child, calendar-bounded
    * partitions) and the pair sum is a value-keyed self-join of that
    * grid. */
  def jonckheereLatencyTrend(lineitem: DataFrame,
      orders: DataFrame): DataFrame = {
    val lat = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .select(col("o_orderpriority").as("g"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("v"))
    // The grid is structural (≤ |priorities| × |days| rows) but feeds
    // THREE consumers — materialize it once so the fact-table join
    // never replays per consumer.
    val cells = lat.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val dense = cells.select("v").distinct()
      .crossJoin(broadcast(cells.select("g").distinct()))
      .join(cells, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val cum = dense.withColumn("cum",
      coalesce(sum(col("c")).over(
        Window.partitionBy("g").orderBy(col("v").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val j2 = cum.as("a")
      .join(cum.as("b"),
        col("a.v") === col("b.v") && col("a.g") < col("b.g"))
      .agg(coalesce(sum(col("b.c") *
        (lit(2L) * col("a.cum") + col("a.c"))), lit(0L)).as("j2"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val byG = cells.groupBy("g").agg(sum("c").as("ni"))
    val gm = byG.agg(count(lit(1)).as("k"), sum("ni").as("n"),
      sum(dec(col("ni")) * col("ni")).as("sn2"),
      sum(dec(col("ni")) * (col("ni") - lit(1L)) *
        (lit(2L) * col("ni") + lit(5L))).as("sn_a"),
      sum(dec(col("ni")) * (col("ni") - lit(1L)) *
        (col("ni") - lit(2L))).as("sn_b"),
      sum(dec(col("ni")) * (col("ni") - lit(1L))).as("sn_c"))
    val byV = cells.groupBy("v").agg(sum("c").as("tv"))
    val tm = byV.agg(
      sum(dec(col("tv")) * (col("tv") - lit(1L)) *
        (lit(2L) * col("tv") + lit(5L))).as("st_a"),
      sum(dec(col("tv")) * (col("tv") - lit(1L)) *
        (col("tv") - lit(2L))).as("st_b"),
      sum(dec(col("tv")) * (col("tv") - lit(1L))).as("st_c"))
    val n = dec(col("n"))
    val mean2 = (n * col("n") - col("sn2")).cast("double") / lit(2.0)
    val v1 = (n * (col("n") - lit(1L)) * (lit(2L) * col("n") + lit(5L)) -
      col("sn_a") - col("st_a")).cast("double") / lit(72.0)
    val v2 = (col("sn_b") * col("st_b")).cast("double") /
      (lit(36.0) * (n * (col("n") - lit(1L)) *
        (col("n") - lit(2L))).cast("double"))
    val v3 = (col("sn_c") * col("st_c")).cast("double") /
      (lit(8.0) * (n * (col("n") - lit(1L))).cast("double"))
    // n < 3 would zero v2/v3's denominators — the lazy branch keeps
    // ANSI mode from evaluating the dead divisions
    val variance = when(col("n") >= 3L, v1 + v2 + v3).otherwise(lit(0.0))
    val ok = col("k") >= 2L && col("n") >= 3L && variance > lit(0.0)
    j2.crossJoin(broadcast(gm)).crossJoin(broadcast(tm))
      .select(col("n").as("n_total"), col("k").as("n_groups"),
        col("j2").as("jt_2j"),
        round(mean2, 1).as("jt_mean_2j"),
        when(ok, round((col("j2").cast("double") - mean2) /
          (lit(2.0) * sqrt(variance)), 6)).as("z_score"))
  }

  /** Goodman–Kruskal gamma between order priority and shipping
    * latency — the ordinal-association companion of
    * [[jonckheereLatencyTrend]] (JT asks "is there a trend and how
    * significant"; γ = (C−D)/(C+D) asks "how STRONG is the ordinal
    * association", ignoring ties — the effect size reviewers want
    * beside the test). Same pooled-grid prefix machinery: for every
    * (group j, value v) cell, the concordant mass is group-below ×
    * value-strictly-below and the discordant mass group-below ×
    * value-strictly-above, both read off per-group prefixes on the
    * dense grid — never a v<v theta join.
    *
    * Determinism: C and D are exact BIGINT sums over the structural
    * grid; γ is ONE pinned division. C + D = 0 (a single priority or
    * a single latency value) → NULL, stated. */
  def gkGammaPriorityLatency(lineitem: DataFrame,
      orders: DataFrame): DataFrame = {
    val lat = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .select(col("o_orderpriority").as("g"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("v"))
    val cells = lat.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val dense = cells.select("v").distinct()
      .crossJoin(broadcast(cells.select("g").distinct()))
      .join(cells, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val wv = Window.partitionBy("g").orderBy(col("v").asc)
    val cum = dense
      .withColumn("below", coalesce(sum(col("c")).over(
        wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy("g")))
      .withColumn("above", col("tot") - col("below") - col("c"))
    val cd = cum.as("a")
      .join(cum.as("b"),
        col("a.v") === col("b.v") && col("a.g") < col("b.g"))
      .agg(coalesce(sum(col("b.c") * col("a.below")), lit(0L)).as("conc"),
        coalesce(sum(col("b.c") * col("a.above")), lit(0L)).as("disc"))
    val n = lat.agg(count(lit(1)).as("n_total"))
    cd.crossJoin(broadcast(n))
      .select(col("n_total"), col("conc"), col("disc"),
        when(col("conc") + col("disc") > lit(0L),
          round((col("conc") - col("disc")).cast("double") /
            (col("conc") + col("disc")).cast("double"), 6)).as("gk_gamma"))
  }

  /** k-anonymity generalization ladder over the order book's
    * quasi-identifiers (priority, segment, order month): at each
    * successive generalization level — full QIs → priority-class +
    * year → class + year → year only — the equivalence-class profile
    * (min class size, classes and rows below k). The readout a
    * privacy officer walks DOWN until k holds: the complement of
    * [[graft.ops.EventOps.kAnonymityProfile]]'s single-grain check.
    *
    * Spark shape: all four levels come out of ONE `groupingSets`
    * pass — one shuffle computes every grain (the CUBE machinery the
    * engine already codegens), then per-level stats collapse the
    * class frame. Counts exact; no floats anywhere. */
  def kAnonGeneralizationLadder(orders: DataFrame, customer: DataFrame,
      k: Long = 5L): DataFrame = {
    val base = orders
      .join(maybeBroadcast(customer),
        orders("o_custkey") === customer("c_custkey"))
      .select(col("o_orderpriority").as("pri"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
          .otherwise("low").as("cls"),
        col("c_mktsegment").as("seg"),
        date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
        year(col("o_orderdate")).cast("long").as("yr"))
    val classes = base.groupingSets(
        Seq(Seq(col("pri"), col("seg"), col("mon")),
          Seq(col("cls"), col("seg"), col("yr")),
          Seq(col("cls"), col("yr")),
          Seq(col("yr"))),
        col("pri"), col("cls"), col("seg"), col("mon"), col("yr"))
      .agg(count(lit(1)).as("class_size"), grouping_id().as("gid"))
    // gid bit per column in declaration order, 1 = aggregated away:
    // {pri,seg,mon}=01001₂=9, {cls,seg,yr}=10010₂=18,
    // {cls,yr}=10110₂=22, {yr}=11110₂=30
    val level = when(col("gid") === 9L, 0L).when(col("gid") === 18L, 1L)
      .when(col("gid") === 22L, 2L).otherwise(3L)
    classes.groupBy(level.as("level"))
      .agg(count(lit(1)).as("n_classes"),
        min("class_size").as("min_class_size"),
        sum(when(col("class_size") < k, 1L).otherwise(0L)).as("n_below_k"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_at_risk"))
      .withColumn("k_satisfied", col("min_class_size") >= k)
  }

  /** Supplier revenue concentration per nation: the Herfindahl–
    * Hirschman index Σ share² and its reciprocal ("effective number
    * of suppliers") — the supply-chain-risk readout over the star
    * schema (HHI → 1 means one supplier owns the nation's revenue;
    * antitrust thresholds quote exactly this number).
    *
    * Exactness: per-supplier revenue is the established DECIMAL
    * discount product, pinned to BIGINT ten-thousandths; then
    * HHI = Σr²/(Σr)² with Σr² in DECIMAL(38,0)/HUGEINT — integer
    * until two final double divisions. Shape: one fact collapse onto
    * (nation, supplier), then |suppliers|-sized frames. */
  def supplierHhiByNation(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    val rev = lineitem
      .join(maybeBroadcast(supplier),
        lineitem("l_suppkey") === supplier("s_suppkey"))
      .join(broadcast(nation),
        supplier("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg((sum(Num.dec2(col("l_extendedprice")) *
        Num.oneMinus(col("l_discount"))) * lit(10000)).cast("bigint")
        .as("r4"))
    rev.groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"), sum("r4").as("t4"),
        sum(col("r4").cast("decimal(38,0)") * col("r4")).as("s2"))
      .select(col("n_name"), col("n_suppliers"),
        round(col("t4").cast("double") / 10000.0, 2).as("revenue"),
        when(col("t4") > 0L, round(col("s2").cast("double") /
          (col("t4").cast("double") * col("t4").cast("double")), 6))
          .as("hhi"),
        when(col("t4") > 0L, round(
          (col("t4").cast("double") * col("t4").cast("double")) /
            col("s2").cast("double"), 6)).as("effective_suppliers"))
  }

  /** Simpson's-paradox audit over the order book: does the
    * high-priority arm's fulfilment rate beat the low-priority arm's
    * POOLED but flip inside every market segment (or vice versa)?
    * The aggregation-bias check an analyst needs before trusting any
    * pooled A-vs-B rate — confounding by stratum is the classic
    * failure of exactly the dashboards this engine feeds.
    *
    * Determinism: every cell is an exact BIGINT; rate-comparison
    * SIGNS use integer cross-multiplication (f_hi·n_lo − f_lo·n_hi),
    * never float subtraction, so the reversal flag is exact; display
    * rates are one 6dp-rounded double division each. Shape: one
    * orders⋈customer join (customer under maybeBroadcast), one
    * segment collapse, pooled cells re-aggregated from the ≤|segments|
    * frame and broadcast back — corpus touched once. */
  def simpsonReversalAudit(orders: DataFrame, customer: DataFrame): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val filled = when(col("o_orderstatus") === "F", 1L).otherwise(0L)
    val cells = orders.join(maybeBroadcast(customer),
        orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("n_hi"),
        sum(when(hi, filled).otherwise(0L)).as("f_hi"),
        sum(when(!hi, 1L).otherwise(0L)).as("n_lo"),
        sum(when(!hi, filled).otherwise(0L)).as("f_lo"))
    val pooled = cells.agg(sum("n_hi").as("pn_hi"), sum("f_hi").as("pf_hi"),
      sum("n_lo").as("pn_lo"), sum("f_lo").as("pf_lo"))
    def sgn(x: org.apache.spark.sql.Column) =
      when(x > 0L, 1L).when(x < 0L, -1L).otherwise(0L)
    val stratumSign = sgn(col("f_hi") * col("n_lo") - col("f_lo") * col("n_hi"))
    val pooledSign = sgn(col("pf_hi") * col("pn_lo") - col("pf_lo") * col("pn_hi"))
    cells.crossJoin(broadcast(pooled))
      .select(col("c_mktsegment"), col("n_hi"), col("f_hi"),
        col("n_lo"), col("f_lo"),
        round(col("f_hi").cast("double") / col("n_hi").cast("double"), 6)
          .as("rate_hi"),
        round(col("f_lo").cast("double") / col("n_lo").cast("double"), 6)
          .as("rate_lo"),
        stratumSign.as("stratum_sign"), pooledSign.as("pooled_sign"),
        (stratumSign =!= 0L && pooledSign =!= 0L &&
          stratumSign =!= pooledSign).as("reversal"))
  }
}
