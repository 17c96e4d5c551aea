package graft

import org.apache.spark.sql.functions._
import graft.plans.TopK

/** The native top-k-per-group operator: equality with the row_number
  * window baseline, plan shape (two-phase, no full sort), and edge
  * cases (ties broken by the explicit key, groups smaller than k). */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables.orders(spark, sf0)

  test("matches the row_number window baseline exactly") {
    val native = TopK.perGroup(orders,
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val baseline = ops.JoinOps.topOrdersPerCustomer(orders, 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(native.count() == baseline.count())
    assert(native.exceptAll(baseline).isEmpty &&
      baseline.exceptAll(native).isEmpty)
  }

  test("plans two phases; only the heap-trimmed side is ever sorted") {
    val df = TopK.perGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    val plan = df.queryExecution.executedPlan.toString
    // exec nodes print without the Exec suffix; partial flag is the
    // trailing boolean — expect one partial (true) + one final (false)
    assert("TopKPerGroup \\[".r.findAllIn(plan).length == 2, plan)
    assert(plan.contains(", 3, true") && plan.contains(", 3, false"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    // exactly ONE sort, and it sits ABOVE the exchange (plan prints
    // top-down): the spillable streaming sort of the ≤ k·groups rows
    // the partial phase kept — the raw input is never sorted.
    assert("Sort \\[".r.findAllIn(plan).length == 1, plan)
    assert(plan.indexOf("Sort [") < plan.indexOf("Exchange hashpartitioning"),
      s"sort must be post-exchange (above it in the printed plan):\n$plan")
  }

  test("partial heap cap: overflow groups pass through, result exact") {
    // Cap the partial phase's heap map at 2 groups per partition — with
    // 50 groups, most rows pass through untrimmed and the sorted final
    // phase must still produce exactly the window-baseline answer.
    spark.conf.set(plans.TopKPerGroupExec.maxGroupsKey, "2")
    try {
      val df = (1 to 50)
        .flatMap(g => (1 to 5).map(i => (g.toLong, (g * 10 + i).toDouble)))
        .toDF("g", "v")
        .repartition(3)
      val got = TopK.perGroup(df, Seq(col("g")), Seq(col("v").asc), 2)
        .as[(Long, Double)].collect().toSet
      val want = (1 to 50)
        .flatMap(g => Seq((g.toLong, (g * 10 + 1).toDouble),
          (g.toLong, (g * 10 + 2).toDouble))).toSet
      assert(got == want)
    } finally spark.conf.unset(plans.TopKPerGroupExec.maxGroupsKey)
  }

  test("groups smaller than k pass through whole") {
    val tiny = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0))
      .toDF("g", "v")
    val got = TopK.perGroup(tiny, Seq(col("g")),
      Seq(col("v").desc), 5)
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 10.0), (1L, 20.0), (2L, 5.0)))
  }

  test("keeps exactly k with deterministic tie-break") {
    val ties = Seq((1L, 100.0, "a"), (1L, 100.0, "b"), (1L, 100.0, "c"),
      (1L, 50.0, "d")).toDF("g", "v", "id")
    val got = TopK.perGroup(ties, Seq(col("g")),
      Seq(col("v").desc, col("id").asc), 2)
      .select("id").as[String].collect().toSet
    assert(got == Set("a", "b"))
  }

  test("rank order is preserved within each group's output") {
    val df = Seq((1L, 3.0), (1L, 1.0), (1L, 2.0)).toDF("g", "v")
    val got = TopK.perGroup(df.coalesce(1), Seq(col("g")),
      Seq(col("v").asc), 3)
      .select("v").as[Double].collect().toSeq
    assert(got == Seq(1.0, 2.0, 3.0))
  }
}
