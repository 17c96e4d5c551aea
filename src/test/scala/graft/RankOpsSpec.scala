package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{AggOps, EventOps, RankOps}

/** [[graft.ops.RankOps]] — the two-level prefix-sum rank must be
  * BIT-IDENTICAL to the flat `Window.orderBy` it replaces, across
  * remainder shapes (n % q ≠ 0), ties broken by a second key,
  * negative keys, descending DECIMAL cuts via negated bucket keys,
  * n < q, and a bucket width that forces many rows per bucket. */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic fixture with duplicate values (tie-break matters),
  // negatives, and a non-uniform distribution: 103 rows so every
  // ntile(5/7/10) hits the remainder path.
  private lazy val fx = (1 to 103).map { i =>
    (i.toLong, ((i * 37) % 19 - 7).toLong, BigDecimal((i * 53) % 41) + BigDecimal("0.25"))
  }.toDF("id", "v", "m")

  test("globalRank matches flat row_number across bucket widths") {
    val flat = fx.withColumn("r",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc))
        .cast("long"))
    for (tb <- Seq(1L, 3L, 4096L)) {
      val two = RankOps.globalRank(fx, col("v"),
        Seq(col("v").asc, col("id").asc), "r", targetBuckets = tb)
      assert(two.select("id", "r").except(flat.select("id", "r")).isEmpty &&
        flat.select("id", "r").except(two.select("id", "r")).isEmpty,
        s"rank mismatch at targetBuckets=$tb")
    }
  }

  test("globalRunningSum matches the flat window running sum across " +
    "bucket widths, negatives included") {
    val flat = fx.withColumn("s",
      sum(col("v")).over(Window.orderBy(col("v").asc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    for (tb <- Seq(1L, 3L, 4096L)) {
      val two = RankOps.globalRunningSum(fx, col("v"),
        Seq(col("v").asc, col("id").asc), col("v"), "s",
        targetBuckets = tb)
      assert(two.select("id", "s").except(flat.select("id", "s")).isEmpty &&
        flat.select("id", "s").except(two.select("id", "s")).isEmpty,
        s"running-sum mismatch at targetBuckets=$tb")
    }
    // NULL bucket key violates the contract loudly, not by truncation
    val withNull = fx.unionByName(
      Seq((999L, null.asInstanceOf[java.lang.Long], BigDecimal("0.25")))
        .toDF("id", "v", "m"))
    intercept[IllegalArgumentException] {
      RankOps.globalRunningSum(withNull, col("v"),
        Seq(col("v").asc, col("id").asc), col("v"), "s").collect()
    }
  }

  test("globalNtile matches flat ntile incl. remainder and n < q") {
    for (q <- Seq(2, 5, 7, 10, 200)) { // 200 > n exercises one-row tiles
      val flat = fx.withColumn("t",
        ntile(q).over(Window.orderBy(col("v").asc, col("id").asc)))
      val two = RankOps.globalNtile(fx, col("v"),
        Seq(col("v").asc, col("id").asc), q, "t", targetBuckets = 7L)
      assert(two.select("id", "t").except(flat.select("id", "t")).isEmpty &&
        flat.select("id", "t").except(two.select("id", "t")).isEmpty,
        s"ntile mismatch at q=$q")
    }
  }

  test("descending DECIMAL cut via negated bucket key matches flat ntile") {
    val flat = fx.withColumn("t",
      ntile(5).over(Window.orderBy(col("m").desc, col("id").asc)))
    val two = RankOps.globalNtile(fx, -col("m"),
      Seq(col("m").desc, col("id").asc), 5, "t", targetBuckets = 6L)
    assert(two.select("id", "t").except(flat.select("id", "t")).isEmpty &&
      flat.select("id", "t").except(two.select("id", "t")).isEmpty)
  }

  test("globalNtileMulti: three cuts over one frame match three flat ntiles") {
    val flat = fx
      .withColumn("a", ntile(5).over(Window.orderBy(col("v").asc, col("id").asc)))
      .withColumn("b", ntile(4).over(Window.orderBy(col("v").desc, col("id").asc)))
      .withColumn("c", ntile(7).over(Window.orderBy(col("m").desc, col("id").asc)))
    val multi = RankOps.globalNtileMulti(fx, "id", Seq(
      RankOps.NtileCut(col("v"), Seq(col("v").asc, col("id").asc), 5, "a"),
      RankOps.NtileCut(-col("v"), Seq(col("v").desc, col("id").asc), 4, "b"),
      RankOps.NtileCut(-col("m"), Seq(col("m").desc, col("id").asc), 7, "c")),
      targetBuckets = 6L)
    val cols = Seq("id", "a", "b", "c").map(col)
    assert(multi.select(cols: _*).except(flat.select(cols: _*)).isEmpty &&
      flat.select(cols: _*).except(multi.select(cols: _*)).isEmpty)
    assert(multi.columns.sorted.toSeq ==
      (fx.columns ++ Seq("a", "b", "c")).sorted.toSeq)
  }

  test("globalNtileMulti: empty input keeps schema, zero rows") {
    val empty = fx.filter(col("id") < 0L)
    val multi = RankOps.globalNtileMulti(empty, "id",
      Seq(RankOps.NtileCut(col("v"), Seq(col("v").asc), 5, "t")))
    assert(multi.columns.contains("t") && multi.count() === 0L)
  }

  test("NULL bucket keys fail loudly instead of silently dropping rows") {
    val withNull = fx.withColumn("v",
      when(col("id") === 7L, lit(null)).otherwise(col("v")))
    val e1 = intercept[IllegalArgumentException] {
      RankOps.globalRank(withNull, col("v"),
        Seq(col("v").asc, col("id").asc), "r").count()
    }
    assert(e1.getMessage.contains("NULL bucket key"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      RankOps.globalNtileMulti(withNull, "id",
        Seq(RankOps.NtileCut(col("v"), Seq(col("v").asc), 5, "t"))).count()
    }
    assert(e2.getMessage.contains("NULL bucket key"), e2.getMessage)
  }

  test("bucket key spanning more than the Long range fails loudly") {
    val wide = Seq((1L, Long.MinValue), (2L, Long.MaxValue - 1L), (3L, 0L))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      RankOps.globalRank(wide, col("v"), Seq(col("v").asc, col("id").asc), "r")
        .count()
    }
    assert(e.getMessage.contains("overflows Long span"), e.getMessage)
    // a span that FITS in Long (even one near Long.MaxValue) still
    // ranks correctly — the guard is exact, not conservative, and the
    // bucket-width ceil-divide must not overflow either
    val ok = Seq((1L, 0L), (2L, Long.MaxValue - 1L), (3L, 5L))
      .toDF("id", "v")
    val r = RankOps.globalRank(ok, col("v"), Seq(col("v").asc, col("id").asc), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 3L -> 2L, 2L -> 3L), r.toString)
  }

  test("globalNtileMulti: one checkpoint for N cuts (the RFM trim)") {
    // The point of the multi API: the collapsed frame is materialized
    // once, not once per cut — assert exactly one localCheckpoint-
    // backed scan (ExistingRDD / checkpointed RDD leaf) per cut plan
    // all referencing the SAME RDD id.
    val multi = RankOps.globalNtileMulti(fx, "id", Seq(
      RankOps.NtileCut(col("v"), Seq(col("v").asc, col("id").asc), 5, "a"),
      RankOps.NtileCut(-col("m"), Seq(col("m").desc, col("id").asc), 5, "b")))
    val leaves = multi.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(leaves.nonEmpty && leaves.distinct.size == 1,
      s"expected one shared checkpoint RDD, got ids $leaves")
  }

  test("empty input yields empty output with the rank column in place") {
    val empty = fx.filter(col("id") < 0L)
    val r = RankOps.globalRank(empty, col("v"), Seq(col("v").asc), "r")
    assert(r.columns.contains("r") && r.count() === 0L)
    val t = RankOps.globalNtile(empty, col("v"), Seq(col("v").asc), 5, "t")
    assert(t.columns.contains("t") && t.count() === 0L)
  }

  test("groupedRank matches the flat partitioned row_number across " +
    "bucket widths, group count included") {
    // groups: v % 3 gives three groups with uneven sizes; ties in m
    // within groups force the tie-break through id.
    val gx = fx.withColumn("grp", (col("v") % 3).cast("string"))
    val flat = gx
      .withColumn("r", row_number().over(
        Window.partitionBy("grp").orderBy(col("m").asc, col("id").asc))
        .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    for (tb <- Seq(1L, 3L, 4096L)) {
      val two = RankOps.groupedRank(gx, Seq("grp"), col("m") * 100,
        Seq(col("m").asc, col("id").asc), "r", countName = "n",
        targetBuckets = tb)
      assert(two.select("id", "r", "n").except(flat.select("id", "r", "n")).isEmpty &&
        flat.select("id", "r", "n").except(two.select("id", "r", "n")).isEmpty,
        s"grouped rank mismatch at targetBuckets=$tb")
    }
  }

  test("groupedRank: empty input keeps schema; NULL bucket key fails loudly") {
    val gx = fx.withColumn("grp", (col("v") % 3).cast("string"))
    val empty = RankOps.groupedRank(gx.filter(col("id") < 0L), Seq("grp"),
      col("m"), Seq(col("m").asc), "r", countName = "n")
    assert(empty.columns.contains("r") && empty.columns.contains("n") &&
      empty.count() === 0L)
    val withNull = gx.withColumn("m",
      when(col("id") === 7L, lit(null)).otherwise(col("m")))
    val e = intercept[IllegalArgumentException] {
      RankOps.groupedRank(withNull, Seq("grp"), col("m"),
        Seq(col("m").asc, col("id").asc), "r").count()
    }
    assert(e.getMessage.contains("NULL bucket key"), e.getMessage)
  }

  test("groupedRunningSum matches the flat partitioned running sum " +
    "across bucket widths, DESC order via negated key") {
    val gx = fx.withColumn("grp", (col("v") % 3).cast("string"))
    val flat = gx.withColumn("s",
      sum(col("v")).over(
        Window.partitionBy("grp").orderBy(col("m").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    for (tb <- Seq(1L, 3L, 4096L)) {
      val two = RankOps.groupedRunningSum(gx, Seq("grp"),
        -col("m") * 100, Seq(col("m").desc, col("id").asc), col("v"),
        "s", targetBuckets = tb)
      assert(two.select("id", "s").except(flat.select("id", "s")).isEmpty &&
        flat.select("id", "s").except(two.select("id", "s")).isEmpty,
        s"grouped running-sum mismatch at targetBuckets=$tb")
    }
    val e = intercept[IllegalArgumentException] {
      RankOps.groupedRunningSum(
        gx.withColumn("m", when(col("id") === 7L, lit(null)).otherwise(col("m"))),
        Seq("grp"), -col("m"), Seq(col("m").desc, col("id").asc),
        col("v"), "s").count()
    }
    assert(e.getMessage.contains("NULL bucket key"), e.getMessage)
  }

  test("groupedGaps matches the flat partitioned lag gap multiset " +
    "across bucket widths, duplicate keys included") {
    // keys deliberately collide within groups (k = (id * 7) % 23) so
    // zero gaps and tie runs cross bucket edges.
    val gx = fx.withColumn("grp", (col("v") % 3).cast("string"))
      .withColumn("k", (col("id") * 7) % 23)
    val flat = gx.select(col("grp"),
        (col("k") - lag(col("k"), 1).over(
          Window.partitionBy("grp").orderBy(col("k").asc, col("id").asc)))
          .as("g"))
      .filter(col("g").isNotNull)
      .groupBy("grp", "g").count()
    for (tb <- Seq(1L, 3L, 5L, 4096L)) {
      val two = RankOps.groupedGaps(gx, Seq("grp"), col("k"), "g",
        targetBuckets = tb)
        .groupBy("grp", "g").count()
      assert(two.except(flat).isEmpty && flat.except(two).isEmpty,
        s"gap multiset mismatch at targetBuckets=$tb")
    }
  }

  test("groupedGaps: empty input yields zero rows; NULL key fails loudly") {
    val gx = fx.withColumn("grp", (col("v") % 3).cast("string"))
    val empty = RankOps.groupedGaps(gx.filter(col("id") < 0L),
      Seq("grp"), col("v"), "g")
    assert(empty.columns.contains("g") && empty.count() === 0L)
    val withNull = gx.withColumn("v",
      when(col("id") === 7L, lit(null)).otherwise(col("v")))
    val e = intercept[IllegalArgumentException] {
      RankOps.groupedGaps(withNull, Seq("grp"), col("v"), "g").count()
    }
    assert(e.getMessage.contains("NULL key"), e.getMessage)
  }

  test("rank cuts plan no unpartitioned window over an entity frame") {
    // The scale posture the rewrite exists for: in rfm/lorenz/gini,
    // every serial (unpartitioned) window must run over a frame
    // already collapsed to a BOUNDED key — the per-bucket totals
    // (≤ targetBuckets rows by construction) or the 10-row decile
    // frame — never over the raw customer/user-cardinality frame.
    val frames = Seq(
      "rfm_segments" -> AggOps.rfmSegments(Tables.orders(spark, sf0)),
      "activity_lorenz_deciles" ->
        EventOps.activityLorenzDeciles(Tables.events(spark, sf0)),
      "user_activity_gini" ->
        EventOps.userActivityGini(Tables.events(spark, sf0)))
    for ((name, df) <- frames) {
      val serial = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      serial.foreach { w =>
        val child = w.child.toString
        assert(child.contains("keys=[__gr_bucket") ||
          child.contains("keys=[decile"),
          s"$name: serial window over a non-collapsed frame:\n$w")
      }
    }
  }
}
