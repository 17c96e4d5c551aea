package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import JoinOps.maybeBroadcast

/** The remaining TPC-H query family, adapted to the driver schema.
  *
  * The reference engine contains zero joins (SURVEY.md §2.3), so —
  * like [[JoinOps]] — this module exists to round out the join/
  * subquery coverage its star schema implies: with these thirteen,
  * every TPC-H query shape (correlated EXISTS / NOT EXISTS, scalar
  * subquery thresholds, correlated aggregates, min-per-group
  * decorrelation, market-share conditional aggregation) has a
  * Spark-first implementation and a DuckDB oracle.
  *
  * Schema adaptations (the driver tables carry no `partsupp`,
  * `l_shipmode`, `l_commitdate`, `l_receiptdate`, `c_phone`,
  * `p_container`, or comment columns):
  *   - supplier↔part offer data (Q2/Q11/Q16/Q20's partsupp) is
  *     reconstructed from lineitem: the distinct (l_partkey,
  *     l_suppkey) pairs, with min(l_extendedprice/l_quantity) as the
  *     per-unit offer cost and shipped quantity as the stock proxy;
  *   - "late" (Q4/Q12/Q21's commit-vs-receipt) is ship-vs-order lag
  *     in days, same as [[JoinOps.slowOrdersByPriority]];
  *   - Q12's ship modes become lag buckets (QUICK/NORMAL/LATE);
  *   - Q22's phone country code becomes `c_custkey % 10`.
  * Each query keeps the original's PLAN SHAPE — that is what the
  * coverage claim is about — with constants chosen to select
  * non-trivial slices of the driver data.
  *
  * Oracle-stability discipline (see [[Num]]): money aggregates sum in
  * exact DECIMAL and round before the final double cast; every scalar
  * threshold (Q11's fraction-of-total, Q17's 0.2·avg, Q20's
  * quarter-of-total, Q22's positive-balance mean) is compared by
  * integer/decimal CROSS-MULTIPLICATION — `5·qty·cnt < Σqty` instead
  * of `qty < 0.2·(Σqty/cnt)` — so no engine ever divides before
  * comparing and the row sets are bit-identical. Raw doubles that are
  * single IEEE ops on identical operands (Q2's unit-cost division)
  * are emitted UNROUNDED: rounding doubles is the one operation Spark
  * and DuckDB disagree on (Num.avgRound's scaladoc), exact values
  * never.
  *
  * Scale posture mirrors JoinOps: constant dims broadcast
  * unconditionally, SF-growing dims through the stats guard, facts
  * shuffle only on their natural keys, aggregation is pushed below
  * joins wherever the query allows (Q15/Q17/Q18-style eager rollups),
  * and scalar thresholds arrive as broadcast 1-row aggregates — never
  * a driver-side collect.
  */
object TpchOps {

  /** Exact per-line revenue: `extendedprice · (1 − discount)`. */
  private def rev: Column =
    Num.dec2(col("l_extendedprice")) * Num.oneMinus(col("l_discount"))

  /** Exact integer hundredths of a ≤2-decimal column (the
    * [[Num.avgRound]] trick, applied per line): sums and products
    * stay in BIGINT, so threshold comparisons that would push DuckDB's
    * DECIMAL(38) precision clamp (fraction-of-total × 1000, 5×avg×n)
    * are plain integer arithmetic in both engines. */
  private def cents(c: Column): Column =
    (Num.dec2(c) * lit(100)).cast("long")

  // ---------------------------------------------------------------- Q2

  /** Q2 (minimum-cost supplier). Offers are reconstructed from
    * lineitem (see class doc), pruned by the part predicate BEFORE
    * the (partkey, suppkey) rollup so the only wide shuffle carries
    * the ~1/18th of lineitem that survives the broadcast part join.
    * The correlated `MIN(ps_supplycost)` subquery decorrelates to an
    * aggregate-then-self-join on partkey — both sides of that join
    * are already partitioned by the rollup's key, so it adds no
    * exchange. Unit cost is one double division, identical in any
    * engine; equality against its per-part min is exact because min
    * returns an element. */
  def tpchQ2(s: SparkSession, d: String, sizeLo: Int = 10, sizeHi: Int = 20,
      ptype: String = "STANDARD", region: String = "EUROPE",
      k: Int = 100): DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_size").between(sizeLo, sizeHi) && col("p_type") === ptype)
      .select("p_partkey", "p_type")
    val sup = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    val euroSup = sup
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg.filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = Tables.lineitem(s, d)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(maybeBroadcast(euroSup), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val mins = offers.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("cost")).as("min_cost"))
    offers
      .join(mins, col("l_partkey") === col("m_partkey") &&
        col("cost") === col("min_cost"))
      .join(maybeBroadcast(euroSup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("min_cost").as("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(k)
  }

  // ---------------------------------------------------------------- Q4

  /** Q4 (order-priority checking): orders from one quarter with at
    * least one late line, counted per priority. EXISTS is the LEFT
    * SEMI join of [[JoinOps.slowOrdersByPriority]] with the quarter
    * window added — the date filter prunes the orders side before the
    * join, so at scale the semi probe is the small side and lineitem
    * never materializes per order. */
  def tpchQ4(orders: DataFrame, li: DataFrame, from: String = "1997-01-01",
      until: String = "1997-04-01", lateDays: Int = 30): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .join(li.select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))

  // ---------------------------------------------------------------- Q7

  /** Q7 (volume shipping): revenue between two nations, both
    * directions, per ship year. The two nation lookups broadcast
    * (25 rows each); their equality filters push into the supplier
    * and customer joins, so only the lineitem⋈orders shuffle
    * survives at scale. Year comes from l_shipdate, grouped with the
    * (supp_nation, cust_nation) direction pair. */
  def tpchQ7(s: SparkSession, d: String, n1: String = "NATION_1",
      n2: String = "NATION_2"): DataFrame = {
    val sn = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(maybeBroadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(maybeBroadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Num.sumRound(rev, 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  // ---------------------------------------------------------------- Q8

  /** Q8 (national market share): of all PROMO-part revenue delivered
    * into one region over two years, the share supplied by one
    * nation, per order year. Both sums stay exact DECIMAL; the share
    * is a single double division of identical operands (the
    * [[JoinOps.tpchQ14]] promo_pct pattern). `coalesce(…, 0)` keeps a
    * no-sales year at share 0 in both engines. */
  def tpchQ8(s: SparkSession, d: String, region: String = "ASIA",
      ptype: String = "PROMO", nat: String = "NATION_2",
      from: String = "1997-01-01", until: String = "1999-01-01"): DataFrame = {
    val parts = Tables.part(s, d).filter(col("p_type") === ptype)
      .select("p_partkey")
    val cn = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val sn = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val zero = lit(0).cast("decimal(12,2)")
    Tables.lineitem(s, d)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
            col("o_orderdate") < lit(until).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(maybeBroadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"), "left_semi")
      .join(maybeBroadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        coalesce(sum(when(col("supp_nation") === nat, rev)), zero)
          .as("nat_dec"),
        sum(rev).as("tot_dec"))
      .select(col("o_year"),
        round(col("nat_dec"), 2).cast("double").as("nation_revenue"),
        round(col("tot_dec"), 2).cast("double").as("total_revenue"),
        (col("nat_dec").cast("double") / col("tot_dec").cast("double"))
          .as("mkt_share"))
  }

  // ---------------------------------------------------------------- Q9

  /** Q9 (product-type profit): per supplier nation and order year,
    * profit on parts whose name contains a token. With no
    * ps_supplycost, cost is proxied as half the part's retail price
    * per unit (class doc); the amount stays exact DECIMAL end to end.
    * The part filter prunes lineitem through a broadcast join BEFORE
    * the orders shuffle — the original's join order, Spark-first. */
  def tpchQ9(s: SparkSession, d: String, nameToken: String = "widget")
      : DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_name").contains(nameToken))
      .select("p_partkey", "p_retailprice")
    val sn = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name"))
    val amount = rev - Num.dec2(col("p_retailprice")) *
      Num.dec2(col("l_quantity")) * lit(0.5).cast("decimal(2,1)")
    Tables.lineitem(s, d)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(maybeBroadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(Num.sumRound(amount, 2).as("sum_profit"))
  }

  // --------------------------------------------------------------- Q11

  /** Q11 (important stock): parts whose lineitem-derived value from
    * one nation's suppliers exceeds a fixed fraction of that nation's
    * total. The `HAVING … > (SELECT sum(…) · f)` scalar subquery
    * becomes a broadcast 1-row aggregate; the comparison
    * cross-multiplies (`value · fracInv > total`) so neither engine
    * divides. One lineitem shuffle (the partkey rollup) — the
    * supplier/nation prune happens in a semi join before it. */
  def tpchQ11(s: SparkSession, d: String, nat: String = "NATION_3",
      fracInv: Long = 1000L): DataFrame = {
    val natSup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === nat)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val vals = Tables.lineitem(s, d)
      .join(maybeBroadcast(natSup), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("val_c"))
    val total = vals.agg(sum(col("val_c")).as("tot_c"))
    vals.crossJoin(broadcast(total))
      .filter(col("val_c") * lit(fracInv) > col("tot_c"))
      .select(col("l_partkey").as("p_partkey"),
        (col("val_c").cast("double") / lit(100.0)).as("part_value"))
  }

  // --------------------------------------------------------------- Q12

  /** Q12 (shipping modes / priority): lines bucketed by ship-vs-order
    * lag (QUICK ≤ quickDays, NORMAL ≤ lateDays, LATE beyond — the
    * schema's stand-in for ship modes), counting high- vs low-
    * priority orders per bucket. One fact⋈fact shuffle; the
    * conditional counts are null-skipping sums in one pass. */
  def tpchQ12(li: DataFrame, orders: DataFrame, quickDays: Int = 30,
      lateDays: Int = 90): DataFrame = {
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    val bucket = when(lag <= quickDays, "QUICK")
      .when(lag <= lateDays, "NORMAL").otherwise("LATE")
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.select("l_orderkey", "l_shipdate")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(bucket.as("ship_bucket"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
  }

  // --------------------------------------------------------------- Q15

  /** Q15 (top supplier): the supplier(s) with max revenue in one
    * quarter. The view's `WHERE total = (SELECT max(total))` scalar
    * subquery becomes a broadcast 1-row max joined back by exact-
    * DECIMAL equality — deterministic because both sides carry the
    * same exact sum. Lineitem's only shuffle is the suppkey rollup of
    * the date-pruned scan. */
  def tpchQ15(li: DataFrame, supplier: DataFrame,
      from: String = "1998-01-01", until: String = "1998-04-01"): DataFrame = {
    val perSupp = li
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("rev_dec"))
    val top = perSupp.agg(max(col("rev_dec")).as("max_dec"))
    perSupp.crossJoin(broadcast(top))
      .filter(col("rev_dec") === col("max_dec"))
      .join(maybeBroadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_dec"), 2).cast("double").as("total_revenue"))
  }

  // --------------------------------------------------------------- Q16

  /** Q16 (part/supplier relationship count): distinct suppliers per
    * (brand, type, size) over the lineitem-derived supplier↔part
    * pairs, excluding one brand and one type. The distinct-pairs
    * rollup is the only wide shuffle; `count(DISTINCT)` collapses to
    * a plain count because the pairs are already distinct — the
    * classic two-level aggregation Catalyst would otherwise expand
    * in-place. */
  def tpchQ16(li: DataFrame, part: DataFrame,
      excludeBrand: String = "Brand#45", excludeType: String = "ECONOMY",
      sizes: Seq[Int] = Seq(1, 5, 10, 15, 20, 25, 30, 35)): DataFrame = {
    val parts = part
      .filter(col("p_brand") =!= excludeBrand &&
        col("p_type") =!= excludeType && col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    li.select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_type", "p_size", "l_suppkey")
      .distinct()
      .groupBy("p_brand", "p_type", "p_size")
      .agg(count(lit(1)).as("supplier_cnt"))
  }

  // --------------------------------------------------------------- Q17

  /** Q17 (small-quantity revenue): revenue that would vanish if
    * orders below 20% of a part's average quantity were dropped. The
    * correlated `0.2·avg(l_quantity)` decorrelates to a per-part
    * (Σqty, n) rollup joined back; the filter cross-multiplies
    * (`5·qty·n < Σqty`) in exact DECIMAL so no engine divides. Both
    * the rollup and the probe are keyed by partkey after the same
    * broadcast part prune — one exchange each, aligned. The final
    * `/7.0` is a single IEEE division of an exact-decimal cast. */
  def tpchQ17(li: DataFrame, part: DataFrame, brand: String = "Brand#23",
      maxSize: Int = 10): DataFrame = {
    val parts = part
      .filter(col("p_brand") === brand && col("p_size") <= maxSize)
      .select("p_partkey")
    val pruned = li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val stats = pruned.groupBy(col("l_partkey").as("st_partkey"))
      .agg(sum(cents(col("l_quantity"))).as("qty_sum_c"),
        count(lit(1)).as("qty_n"))
    pruned
      .join(stats, col("l_partkey") === col("st_partkey"))
      .filter(cents(col("l_quantity")) * lit(5) * col("qty_n") <
        col("qty_sum_c"))
      .agg(sum(cents(col("l_extendedprice"))).as("sum_c"))
      .select((col("sum_c").cast("double") / lit(700.0)).as("avg_yearly"))
  }

  // --------------------------------------------------------------- Q20

  /** Q20 (excess-stock suppliers): suppliers in one region who
    * shipped more of the token-named parts in one year than 1/`frac`
    * of their all-time volume of those parts (the data spans 7 ship
    * years, so 1/8 selects the above-average-concentration tail).
    * The correlated `ps_availqty > 0.5·Σqty` becomes a single
    * conditional rollup per supplier (year slice vs total in ONE
    * pass — no second scan) with a cross-multiplied integer-cents
    * comparison. */
  def tpchQ20(s: SparkSession, d: String, nameToken: String = "red",
      yr: Int = 1999, region: String = "EUROPE", frac: Int = 8): DataFrame = {
    val redParts = Tables.part(s, d)
      .filter(col("p_name").contains(nameToken)).select("p_partkey")
    val regSup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name")
    Tables.lineitem(s, d)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        coalesce(sum(when(year(col("l_shipdate")) === yr,
          cents(col("l_quantity")))), lit(0L)).as("qy_c"),
        sum(cents(col("l_quantity"))).as("qt_c"))
      .filter(col("qy_c") * lit(frac) > col("qt_c"))
      .join(maybeBroadcast(regSup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("qy_c").cast("double") / lit(100.0)).as("qty_in_year"),
        (col("qt_c").cast("double") / lit(100.0)).as("qty_total"))
  }

  // --------------------------------------------------------------- Q21

  /** Q21 (suppliers who kept orders waiting): for finished orders,
    * suppliers with a late line where ANOTHER supplier shared the
    * order (EXISTS → left-semi with a `suppkey ≠` residual) but no
    * OTHER supplier was also late (NOT EXISTS → left-anti, same
    * residual). Both probe sides are the distinct (order, supplier)
    * pairs — 16-byte rows — so the self-joins shuffle keys, not
    * lineitem. Top-k pins ties on s_name. */
  def tpchQ21(s: SparkSession, d: String, lateDays: Int = 60,
      k: Int = 20): DataFrame = {
    val base = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
    val late = base
      .filter(col("l_shipdate") > col("o_orderdate") +
        expr(s"INTERVAL $lateDays DAYS"))
      .select("l_orderkey", "l_suppkey").distinct()
    val sups = base.select(col("l_orderkey").as("ok2"),
      col("l_suppkey").as("sk2")).distinct()
    val lateOther = late.select(col("l_orderkey").as("ok3"),
      col("l_suppkey").as("sk3"))
    late
      .join(sups, col("l_orderkey") === col("ok2") &&
        col("l_suppkey") =!= col("sk2"), "left_semi")
      .join(lateOther, col("l_orderkey") === col("ok3") &&
        col("l_suppkey") =!= col("sk3"), "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(maybeBroadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(k)
  }

  // --------------------------------------------------------------- Q22

  /** Q22 (global sales opportunity): customers in a code set (the
    * schema's `c_custkey % 10` stands in for the phone prefix) with
    * above-average positive balances and no RECENT orders (every
    * driver customer has some order, so the spec's "no orders ever"
    * anti-join would be vacuously empty — the date-sliced variant
    * keeps the NOT EXISTS non-trivial), counted per code. The scalar
    * `avg(c_acctbal) WHERE > 0` subquery is a broadcast 1-row (Σ, n)
    * aggregate compared by cross-multiplication (`bal·n > Σ` — valid
    * for negative balances too, n > 0); NOT EXISTS is the left-anti
    * join on the date-pruned orders. */
  def tpchQ22(customer: DataFrame, orders: DataFrame,
      codes: Seq[Int] = Seq(1, 2, 3, 4, 5),
      recentFrom: String = "1999-01-01"): DataFrame = {
    val coded = customer
      .withColumn("cntrycode", pmod(col("c_custkey"), lit(10)).cast("int"))
      .filter(col("cntrycode").isin(codes: _*))
    val stats = coded.filter(col("c_acctbal") > 0)
      .agg(sum(Num.dec2(col("c_acctbal"))).as("bal_sum"),
        count(lit(1)).as("bal_n"))
    coded.crossJoin(broadcast(stats))
      .filter(Num.dec2(col("c_acctbal")) * col("bal_n") > col("bal_sum"))
      .join(orders
          .filter(col("o_orderdate") >= lit(recentFrom).cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        Num.sumRound(Num.dec2(col("c_acctbal")), 2).as("totacctbal"))
  }
}
