package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops._

/** TpchOps: plan-shape locks for the scale-critical rewrites (the
  * oracle gate already proves values; these prove the 100 TB posture
  * can't silently regress) plus cross-checks of the decorrelated
  * threshold logic against naive recomputations.
  */
class TpchOpsSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: part prune broadcasts below the offers rollup; min join keeps keys") {
    val plan = planOf(TpchOps.tpchQ2(spark, sf0))
    // the (partkey, suppkey) rollup must sit ABOVE a broadcast join
    // with part — i.e. lineitem is pruned before the wide shuffle
    val aggIdx = plan.indexOf("HashAggregate(keys=[l_partkey")
    val bcIdx = plan.indexOf("BroadcastHashJoin [l_partkey")
    assert(aggIdx >= 0 && bcIdx > aggIdx,
      s"offers rollup should consume the broadcast part prune:\n$plan")
    assert(plan.contains("LeftSemi"), s"region prune should be a semi join:\n$plan")
  }

  test("q4: quarter window prunes orders, EXISTS is a semi join") {
    val df = TpchOps.tpchQ4(Tables.orders(spark, sf0), Tables.lineitem(spark, sf0))
    val plan = planOf(df)
    assert(plan.contains("LeftSemi"), plan)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("orders.parquet")).get
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"date window not pushed to the orders scan:\n$scan")
  }

  test("q15: suppkey rollup below the join; shipdate window pushed down") {
    val df = TpchOps.tpchQ15(Tables.lineitem(spark, sf0), Tables.supplier(spark, sf0))
    val plan = planOf(df)
    val aggIdx = plan.indexOf("HashAggregate(keys=[l_suppkey")
    val joinIdx = plan.indexOf("Join")
    assert(aggIdx >= 0, s"missing eager suppkey rollup:\n$plan")
    assert(joinIdx >= 0 && joinIdx < aggIdx,
      s"rollup should be below (after in text) the joins:\n$plan")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("lineitem.parquet")).get
    assert(scan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed:\n$scan")
    // the scalar max arrives broadcast, never via a driver collect
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("q20: one lineitem scan (year slice and total in a single rollup)") {
    val df = TpchOps.tpchQ20(spark, sf0)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).count(_.contains("lineitem.parquet"))
    assert(scans == 1, s"expected a single lineitem scan, got $scans")
  }

  test("q21: EXISTS/NOT EXISTS plan as semi + anti on the pair rollups") {
    val plan = planOf(TpchOps.tpchQ21(spark, sf0))
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q12: bucket counts partition the joined lines exactly") {
    val li = Tables.lineitem(spark, sf0)
    val orders = Tables.orders(spark, sf0)
    val out = TpchOps.tpchQ12(li, orders)
      .agg(sum(col("high_line_count") + col("low_line_count")))
      .head.getLong(0)
    val joined = li.join(orders, col("l_orderkey") === col("o_orderkey")).count()
    assert(out == joined, s"bucketed lines $out != joined lines $joined")
  }

  test("q17: cross-multiplied threshold equals the naive 0.2*avg filter") {
    // naive recomputation with double avg — values here are exact in
    // double (quantities ≤ 2 decimals, tiny groups), so the two forms
    // must agree at sf0.001
    val li = Tables.lineitem(spark, sf0)
    val part = Tables.part(spark, sf0)
    val pruned = li.join(part.filter(col("p_brand") === "Brand#23" &&
        col("p_size") <= 10).select("p_partkey"),
      col("l_partkey") === col("p_partkey"))
    val naive = pruned
      .withColumn("avg_qty", avg(col("l_quantity")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
      .agg(coalesce(sum(col("l_extendedprice")), lit(0.0))).head.getDouble(0)
    // empty filtered set at sf0.001 → NULL sum (both engines agree);
    // the naive side coalesces to 0.0, so map NULL to 0.0 here
    val row = TpchOps.tpchQ17(li, part).head
    val got = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    // got is cents/700 — rescale both sides to cents before comparing
    assert(math.abs(got * 700.0 - naive * 100.0) < 1.0,
      s"q17 cross-multiply mismatch: got=${got * 700.0}c, naive=${naive * 100.0}c")
  }

  test("q22: threshold keeps exactly the above-positive-mean balances") {
    val customer = Tables.customer(spark, sf0)
    val orders = Tables.orders(spark, sf0)
    val out = TpchOps.tpchQ22(customer, orders)
    // every kept customer's balance must exceed the positive mean of
    // its code cohort; verify the aggregate never counts below it
    val coded = customer
      .withColumn("cntrycode", pmod(col("c_custkey"), lit(10)).cast("int"))
      .filter(col("cntrycode").isin(1, 2, 3, 4, 5))
    val mean = coded.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal")).head.getDouble(0)
    val naive = coded
      .filter(col("c_acctbal") > mean)
      .join(orders.filter(col("o_orderdate") >= lit("1999-01-01")
          .cast("timestamp")).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val got = out.agg(coalesce(sum("numcust"), lit(0L))).head.getLong(0)
    assert(got == naive, s"q22 kept $got customers, naive filter keeps $naive")
  }
}
