package graft

import graft.ops.ProfileOps

/** The table profiler: exact vs approx agreement, fixed output schema,
  * and the scale-path plan claim (exact multi-distinct expands the
  * scan; the HLL++ variant must not). */
class ProfileOpsSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf0)

  test("approx profile matches exact within HLL tolerance") {
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("n_nulls"),
          r.getAs[String]("min_value"))).toMap
    val exact = byCol(ProfileOps.profile(events))
    val approx = byCol(ProfileOps.profileApprox(events, rsd = 0.02))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, (nd, nn, mn)) =>
      val (andv, ann, amn) = approx(c)
      assert(ann == nn && amn == mn, s"non-sketch stats must be exact: $c")
      assert(math.abs(andv - nd) <= math.max(2L, (nd * 0.1).toLong),
        s"$c: approx $andv vs exact $nd")
    }
  }

  test("exact profile expands the scan; approx stays single-pass") {
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    assert(plan(ProfileOps.profile(events)).contains("Expand"))
    assert(!plan(ProfileOps.profileApprox(events)).contains("Expand"))
  }
}
