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

  /** Rollup over (returnflag, linestatus): subtotals + grand total in
    * one pass — grouping-set coverage (absent from the reference). */
  def rollupQtyByFlagStatus(li: DataFrame): DataFrame =
    li.rollup("l_returnflag", "l_linestatus")
      .agg(
        Num.sumRound(Num.dec2(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_lines"))

  /** Cube over (returnflag, linestatus). */
  def cubeQtyByFlagStatus(li: DataFrame): DataFrame =
    li.cube("l_returnflag", "l_linestatus")
      .agg(Num.sumRound(Num.dec2(col("l_quantity")), 2).as("sum_qty"))

  /** Global ordered-limit top-k (O3, `Demo.ipynb` cell 1's
    * `ORDER BY … LIMIT`): Catalyst plans TakeOrderedAndProject — each
    * partition keeps only k rows, no full sort. */
  def topOrdersByPrice(orders: DataFrame, k: Int = 10): DataFrame =
    orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(k)

  /** Per-month order stats — date_trunc bucketing on the fact table. */
  def monthlyOrderStats(orders: DataFrame): DataFrame =
    orders
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        Num.sumRound(Num.dec2(col("o_totalprice")), 2).as("total_price"),
        Num.avgRound(col("o_totalprice"), 4).as("avg_price"))
}
