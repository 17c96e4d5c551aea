package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heavier aggregate shapes over the fact table — the reference's
  * aggregation surface (SURVEY.md §2.4) widened with the built-in
  * categories it never used (distinct, rollup/cube, ordered-limit
  * top-k). All partial+final hash aggregations; the rollup/cube expand
  * before the shuffle so a single exchange serves every grouping set.
  */
object AggOps {

  /** TPC-H Q1-style pricing summary: the canonical wide aggregate.
    * Single scan, 8 aggregates, tiny group cardinality — the map-side
    * partial aggregation collapses ~everything before the shuffle. */
  def pricingSummary(li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Num.sumRound(Num.dec2(col("l_quantity")), 2).as("sum_qty"),
        Num.sumRound(Num.dec2(col("l_extendedprice")), 2).as("sum_base_price"),
        Num.sumRound(Num.dec2(col("l_extendedprice")) *
          Num.oneMinus(col("l_discount")), 2).as("sum_disc_price"),
        Num.sumRound(Num.dec2(col("l_extendedprice")) *
          Num.oneMinus(col("l_discount")) * Num.onePlus(col("l_tax")), 2)
          .as("sum_charge"),
        Num.avgRound(col("l_quantity"), 4).as("avg_qty"),
        Num.avgRound(col("l_extendedprice"), 4).as("avg_price"),
        Num.avgRound(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q6 (forecasting revenue change): highly selective
    * conjunctive filter + one global aggregate — the canonical
    * "pushdown wins" query. Every predicate reaches the parquet scan
    * (shipdate range + discount band + quantity cap are all plain
    * comparisons), so at 100 TB the scan skips row groups on
    * min/max stats and the aggregate sees only the surviving sliver;
    * the exact-decimal product keeps the sum oracle-identical. The
    * date window is shifted to the driver data's 1995-2001 shipdate
    * range (TPC-H's 1994 year would select zero rows). */
  def tpchQ6(li: DataFrame): DataFrame =
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
      .agg(Num.sumRound(
        Num.dec2(col("l_extendedprice")) * Num.rate(col("l_discount")), 2)
        .as("revenue"))

  /** Pre-aggregated base for the grouping-set family below: one plain
    * hash-agg to the (returnflag, linestatus) grain — ~a dozen rows —
    * carrying EXACT partial sums (decimal) and counts. Catalyst plans
    * rollup/cube/grouping-sets as an Expand that multiplies every
    * INPUT row by the number of grouping sets before the partial agg;
    * over raw lineitem that is 3-4× the full table through the
    * aggregation hash map. Sum and count are algebraic, so
    * re-aggregating the exact partials through the Expand is
    * bit-identical (decimal addition is associative; rounding happens
    * once, at the end) while the Expand now multiplies a dozen rows
    * instead of the table. Spark has no such reaggregation rewrite —
    * the split must be declared. */
  private def qtyByFlagStatusPartials(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(Num.dec2(col("l_quantity"))).as("part_qty"),
        count(lit(1)).as("part_n"))

  /** Rollup over (returnflag, linestatus): subtotals + grand total —
    * grouping-set coverage (absent from the reference). Expands the
    * pre-aggregated grain, not the table (see
    * [[qtyByFlagStatusPartials]]). */
  def rollupQtyByFlagStatus(li: DataFrame): DataFrame =
    qtyByFlagStatusPartials(li)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("part_qty")), 2).cast("double").as("sum_qty"),
        sum(col("part_n")).as("n_lines"))

  /** Cube over (returnflag, linestatus), same pre-aggregated shape. */
  def cubeQtyByFlagStatus(li: DataFrame): DataFrame =
    qtyByFlagStatusPartials(li)
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum(col("part_qty")), 2).cast("double").as("sum_qty"))

  /** Global ordered-limit top-k (O3, `Demo.ipynb` cell 1's
    * `ORDER BY … LIMIT`): Catalyst plans TakeOrderedAndProject — each
    * partition keeps only k rows, no full sort. */
  def topOrdersByPrice(orders: DataFrame, k: Int = 10): DataFrame =
    orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(k)

  /** Explicit GROUPING SETS — subtotal rows per flag, per status, and
    * the grand total, via the Spark 4 `Dataset.groupingSets` API (no
    * session-state mutation: the old SQL route needed a temp view).
    * Expands the pre-aggregated grain, not the table. */
  def groupingSetsQty(li: DataFrame): DataFrame =
    qtyByFlagStatusPartials(li)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("part_qty")), 2).cast("double").as("sum_qty"),
        sum(col("part_n")).as("n_lines"))

  /** Pearson correlation + sample stddev per event type, computed from
    * EXACT decimal sums (n, Σx, Σy, Σxy, Σx², Σy²) so both engines do
    * the identical IEEE double arithmetic on identical operands —
    * `corr()`/`stddev()` built-ins are summation-order dependent and
    * won't hash-match an oracle. Same single-pass aggregation shape. */
  def valueCorrStats(events: DataFrame): DataFrame = {
    val x = col("value").cast("decimal(12,2)")
    val y = get_json_object(col("props"), "$.k").cast("long").cast("decimal(12,2)")
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(
        col("event_type"),
        col("n"),
        round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
          4).as("corr_vk"),
        round(sqrt(
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")), 4).as("stddev_v"))
  }

  /** Approximate percentiles (GK sketch) — the 100 TB variant of exact
    * percentile. Flattened to one scalar column per quantile (array
    * output columns crash the driver's pandas row-sort). At accuracy
    * 10000 over the test SFs the sketch is exact, so rank-based
    * `quantile_disc` oracles it; at scale it degrades gracefully to
    * ±1/accuracy rank error with bounded memory. */
  def approxValuePercentiles(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(approx_percentile(col("value"), array(lit(0.5), lit(0.9), lit(0.99)),
        lit(10000)).as("p"))
      .select(col("event_type"),
        col("p").getItem(0).as("approx_p50"),
        col("p").getItem(1).as("approx_p90"),
        col("p").getItem(2).as("approx_p99"))

  /** Scalar string-function battery over customer names — F-category
    * coverage in one oracle-checkable projection. */
  def customerNameFuncs(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      upper(col("c_name")).as("upper_name"),
      substring(col("c_name"), 10, 9).as("digits"),
      lpad(col("c_custkey").cast("string"), 12, "0").as("padded_key"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
      length(col("c_name")).cast("long").as("name_len"),
      regexp_replace(col("c_name"), "0+", "0").as("squeezed"))

  /** Bare global aggregate, no grouping (A6, `Demo.ipynb` cell 1's
    * `agg(max(...))`): one output row; partial aggregation collapses
    * each partition to a single row before the 1-row exchange. */
  def globalOrderStats(orders: DataFrame): DataFrame =
    orders.agg(
      max(col("o_totalprice")).as("max_price"),
      min(col("o_totalprice")).as("min_price"),
      count(lit(1)).as("n_orders"))

  /** Per-month order stats — date_trunc bucketing on the fact table. */
  def monthlyOrderStats(orders: DataFrame): DataFrame =
    orders
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        Num.sumRound(Num.dec2(col("o_totalprice")), 2).as("total_price"),
        Num.avgRound(col("o_totalprice"), 4).as("avg_price"))

  /** Pearson correlations between the fact table's measures, computed
    * EXACTLY in integer space: each ≤2-decimal column is scaled to a
    * BIGINT (×100 through DECIMAL(12,2), the [[Num.dec2]] rule), the
    * five moment sums Σx Σy Σxy Σx² Σy² accumulate as DECIMAL(38,0)
    * (per-row products fit BIGINT; sums do not at scale), and
    * n·Σxy − Σx·Σy forms in DECIMAL(38,0) — every engine computes the
    * IDENTICAL integers, so the single final double division + sqrt
    * is bit-stable where a native streaming `corr` (Welford-style,
    * order-dependent) is not. The scale factors cancel in the ratio,
    * so no descaling is needed.
    *
    * Bounds: DECIMAL(38,0) holds n·Σx² exactly to ~10⁹ rows at these
    * magnitudes; past that swap the built-in `corr` (same one-scan
    * shape, last-ulp nondeterminism accepted). One scan, one
    * partial+final agg, one output row — nothing else moves. */
  def lineitemCorrelations(li: DataFrame): DataFrame = {
    def scaled(c: String) =
      (Num.dec2(col(c)) * lit(100)).cast("long")
    val (q, p, d) = (scaled("l_quantity"), scaled("l_extendedprice"),
      scaled("l_discount"))
    def s(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(28,0)"))
    val agg = li.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      s(q).as("sq"), s(p).as("sp"), s(d).as("sd"),
      s(q * q).as("sqq"), s(p * p).as("spp"), s(d * d).as("sdd"),
      s(q * p).as("sqp"), s(q * d).as("sqd"), s(p * d).as("spd"))
    def corr(sxy: String, sx: String, sy: String, sxx: String,
        syy: String) = {
      val num = (col("n") * col(sxy) - col(sx) * col(sy)).cast("double")
      val dx = (col("n") * col(sxx) - col(sx) * col(sx)).cast("double")
      val dy = (col("n") * col(syy) - col(sy) * col(sy)).cast("double")
      round(num / sqrt(dx * dy), 6)
    }
    agg.select(
      col("n").cast("long").as("n_rows"),
      corr("sqp", "sq", "sp", "sqq", "spp").as("corr_qty_price"),
      corr("sqd", "sq", "sd", "sqq", "sdd").as("corr_qty_disc"),
      corr("spd", "sp", "sd", "spp", "sdd").as("corr_price_disc"))
  }

  /** Trailing `days`-day revenue per customer at each order — the
    * RANGE window frame, the one frame type the engine had not yet
    * exercised. ROWS frames count physical rows; RANGE frames bound by
    * the ORDER-BY VALUE, so same-day orders are always frame peers and
    * calendar gaps shrink the window — `[day-29, day]` exactly, however
    * many orders land in it. Ordering is by epoch-day number so the
    * numeric frame offsets mean days.
    *
    * Determinism: a RANGE frame is a set (all value-peers included
    * regardless of tie order) and the sum runs in DECIMAL, so the
    * result is independent of intra-frame order — safe for the
    * hash-equality oracle gate.
    *
    * Shape at scale: one exchange on o_custkey + one in-partition sort
    * — the standard per-key window cost; frames never cross customers,
    * so 1000 executors each window their own key ranges with no
    * driver coordination. */
  def trailingRevenue(orders: DataFrame, days: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("day_num"))
      .rangeBetween(-(days - 1), 0)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("day"),
        Num.dec2(col("o_totalprice")).as("price"))
      .withColumn("day_num",
        datediff(col("day"), lit("1970-01-01").cast("date")))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        round(sum(col("price")).over(w), 4).cast("double")
          .as("trailing_revenue"),
        count(lit(1)).over(w).as("trailing_orders"))
  }

  /** RFM customer segmentation — the classic CRM scoring: per
    * customer, Recency (days since last order, against the corpus max
    * date), Frequency (order count) and Monetary (exact DECIMAL
    * revenue, the [[Num.dec2]] rule), each cut into quintiles with
    * score 1 = best and a customer-key tie-break, concatenated into
    * the familiar "111".."555" segment label. Every rank-window input
    * is exact (BIGINT days/counts, DECIMAL money), so quintile
    * assignment is engine-identical (shared Postgres ntile remainder
    * semantics — the activityLorenzDeciles precedent).
    *
    * Shape: one customer-collapse aggregation, then three quintile
    * cuts via [[RankOps.globalNtileMulti]]'s two-level prefix-sum rank
    * — the customer frame GROWS with the data, so a flat
    * `Window.orderBy` (one task sorting every customer) is the wrong
    * plan at the 100 TB north star; each score is exact-rank
    * arithmetic over range-bucketed partial sorts instead, and the
    * three cuts share ONE materialization of the collapsed frame and
    * one stats pass. Descending cuts pass the negated key as the bucket
    * key (truncation toward zero preserves the weak monotonicity the
    * bucketing needs; the intra-bucket order uses the full DECIMAL). */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val maxD = orders.agg(to_date(max(col("o_orderdate"))).as("dmax"))
    val per = orders.crossJoin(broadcast(maxD))
      .groupBy(col("o_custkey"))
      .agg(
        min(datediff(col("dmax"), to_date(col("o_orderdate"))))
          .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(Num.dec2(col("o_totalprice"))).as("mon"))
    // One materialization for all three cuts (they rank the SAME
    // collapsed customer frame): the chained-globalNtile form
    // localCheckpointed it three times — the r12 verdict's largest
    // self-inflicted rank regression.
    val m5 = RankOps.globalNtileMulti(per, "o_custkey", Seq(
      RankOps.NtileCut(col("recency_days"),
        Seq(col("recency_days").asc, col("o_custkey").asc), 5, "r_score"),
      RankOps.NtileCut(-col("frequency"),
        Seq(col("frequency").desc, col("o_custkey").asc), 5, "f_score"),
      RankOps.NtileCut(-col("mon"),
        Seq(col("mon").desc, col("o_custkey").asc), 5, "m_score")))
    m5.select(col("o_custkey"), col("recency_days"), col("frequency"),
        round(col("mon"), 2).cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
  }

  /** Smoothed target encoding — the leakage-aware categorical
    * feature every tabular training pipeline ships: per category c
    * with n_c rows and positive count k_c, the encoded value is the
    * empirical-Bayes shrink `(k_c + m·prior) / (n_c + m)` toward the
    * global positive rate, so rare categories collapse to the prior
    * instead of memorizing noise (m = equivalent prior sample size).
    *
    * Driven here over orders: category = o_orderpriority, target =
    * "the order contains a returned lineitem" (l_returnflag 'R') —
    * label derivation is a distinct on the filtered lineitem side,
    * then one orderkey-equi-join; the encode itself aggregates to
    * |categories| rows, with the 1-row global total broadcast back.
    * All ratios are exact-integer counts cast to DOUBLE at fixed
    * points, operand order pinned, one terminal round — the
    * hash-gate convention. */
  def targetEncodePriority(orders: DataFrame, li: DataFrame,
      m: Int = 20): DataFrame = {
    val returned = li.filter(col("l_returnflag") === lit("R"))
      .select(col("l_orderkey").as("o_orderkey")).distinct()
      .withColumn("is_ret", lit(1L))
    val per = orders.join(returned, Seq("o_orderkey"), "left")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("is_ret"), lit(0L))).as("n_ret"))
    val tot = per.agg(sum("n").as("n_tot"), sum("n_ret").as("ret_tot"))
    val prior = col("ret_tot").cast("double") / col("n_tot").cast("double")
    per.crossJoin(broadcast(tot))
      .select(col("o_orderpriority"), col("n"), col("n_ret"),
        round(prior, 6).as("prior"),
        round((col("n_ret").cast("double") + lit(m.toDouble) * prior) /
          (col("n").cast("double") + lit(m.toDouble)), 6)
          .as("enc_smoothed"))
      .orderBy(col("o_orderpriority").asc)
  }
}
