package graft

import graft.ops.ProfileOps

/** The table profiler: exact vs approx agreement, fixed output schema,
  * and the scale-path plan claim (exact multi-distinct expands the
  * scan; the HLL++ variant must not). */
class ProfileOpsSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf0)

  test("constraintAudit: planted violations counted, clean data passes") {
    import spark.implicits._
    import java.sql.Timestamp
    val customer = Seq((1L, "a"), (2L, "b"), (2L, "b2")) // dup key 2
      .toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 99L)) // orphan cust 99
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 5.0), (11L, 51.0), (77L, -1.0)) // orphan + 2 bad qty
      .toDF("l_orderkey", "l_quantity")
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), Some(7L)),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), None)) // null user
      .toDF("event_id", "ts", "user_id")
    val documents = Seq((1L, "x"), (1L, "y"), (2L, "z")) // dup doc_id
      .toDF("doc_id", "text")
    val got = ProfileOps.constraintAudit(orders, customer, lineitem,
        events, documents)
      .collect().map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed")))).toMap
    assert(got("orders.o_custkey -> customer") == ((1L, false)))
    assert(got("lineitem.l_orderkey -> orders") == ((1L, false)))
    assert(got("customer.c_custkey unique") == ((1L, false)))
    assert(got("orders.o_orderkey unique") == ((0L, true)))
    assert(got("documents.doc_id unique") == ((1L, false)))
    assert(got("lineitem.l_quantity in (0, 50]") == ((2L, false)))
    assert(got("events.user_id not null") == ((1L, false)))
    assert(got.size == 7)
  }

  test("inclusionDependencyAudit: containment fraction, direction " +
      "asymmetry, all-NULL child yields NULL containment") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(2L), None)
      .toDF("k") // distinct non-null {1,2,3}
    val parent = Seq(1L, 2L).toDF("p")
    val nullCol = Seq[Option[Long]](None, None).toDF("k")
    val got = ProfileOps.inclusionDependencyAudit(
      Map("c" -> child, "p" -> parent, "z" -> nullCol),
      Seq(("c", "k", "p", "p"), ("p", "p", "c", "k"), ("z", "k", "p", "p")))
      .collect().map(r => r.getAs[String]("child_table") ->
        ((r.getAs[Long]("n_child_distinct"), r.getAs[Long]("n_contained"),
          Option(r.getAs[Any]("containment")),
          r.getAs[Boolean]("is_ind")))).toMap
    assert(got("c") == ((3L, 2L, Some(0.666667), false)), got.toString)
    assert(got("p") == ((2L, 2L, Some(1.0), true)), got.toString)
    assert(got("z") == ((0L, 0L, None, false)), got.toString)
  }

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

  test("fdAudit: g3 repair distance, holding FD flagged clean") {
    import spark.implicits._
    // a→b: group 1 splits {x:2, y:1} → 1 violating group, plurality
    // repair deletes 1 row; groups 2, 3 are clean. b→a holds exactly.
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "z"), (2L, "z"),
      (3L, "w")).toDF("a", "b")
    val got = ProfileOps.fdAudit(df, Seq(("a", "b"), ("b", "a"))).collect()
      .map(r => r.getAs[String]("fd") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("rows_to_fix"), r.getAs[Boolean]("holds")))).toMap
    assert(got == Map(
      "a -> b" -> ((3L, 1L, 1L, false)),
      "b -> a" -> ((4L, 0L, 0L, true))), got.toString)
  }

  test("exact profile expands the scan; approx stays single-pass") {
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    assert(plan(ProfileOps.profile(events)).contains("Expand"))
    assert(!plan(ProfileOps.profileApprox(events)).contains("Expand"))
  }
}
