package graft

import org.apache.spark.sql.functions._
import graft.ops.{DocOps, EventOps, GraphOps, VectorOps}

/** Hand-computed fixtures for the round-16 stats/curation batch —
  * each oracle gate proves Spark ≡ DuckDB; these pin the textbook
  * definitions on inputs small enough to derive by hand.
  */
class StatsFixturesR16Spec extends SparkSpec {
  import spark.implicits._

  private def eventsFrom(rows: Seq[(String, Long, String, Double)]) =
    rows.toDF("s", "user_id", "event_type", "value")
      .select(col("s").cast("timestamp").as("ts"), col("user_id"),
        col("event_type"), col("value"))

  test("mood's median: A={1,2,5} B={5,6,7} -> pooled lower median 5, " +
      "above counts (0, 2), chi2 = 36/24 + 36/24 = 3.0") {
    val ev = eventsFrom(Seq(
      ("2024-01-01 00:00:00", 1L, "A", 1.0),
      ("2024-01-01 01:00:00", 1L, "A", 2.0),
      ("2024-01-01 02:00:00", 1L, "A", 5.0),
      ("2024-01-01 03:00:00", 1L, "B", 5.0),
      ("2024-01-01 04:00:00", 1L, "B", 6.0),
      ("2024-01-01 05:00:00", 1L, "B", 7.0)))
    val r = EventOps.moodsMedianByType(ev).collect().head
    assert(r.getAs[Double]("pooled_median") == 5.0)
    assert(r.getAs[Long]("n_above") == 2L)
    assert(r.getAs[Double]("chi2") == 3.0)
  }

  test("hodges-lehmann: halves {1,2} vs {4,7} -> diff multiset " +
      "{2,3,5,6}, weighted lower median 3") {
    val ev = eventsFrom(Seq(
      ("2024-01-01 00:00:00", 1L, "x", 1.0),
      ("2024-01-01 01:00:00", 1L, "x", 2.0),
      ("2024-01-02 22:00:00", 1L, "x", 4.0),
      ("2024-01-02 23:00:00", 1L, "x", 7.0)))
    val r = EventOps.hodgesLehmannShift(ev).collect().head
    assert(r.getAs[Double]("hl_shift") == 3.0)
    assert(r.getAs[Double]("n_pairs") == 4.0)
  }

  test("ansari-bradley: identical arms score exactly at expectation " +
      "(z = 0); the narrower arm scores above it") {
    // arms share the value multiset -> every tied block has c1 = c2,
    // so W = E[W] identically
    val same = eventsFrom(Seq(
      ("2024-01-01 00:00:00", 0L, "x", 1.0),
      ("2024-01-01 01:00:00", 1L, "x", 1.0),
      ("2024-01-01 02:00:00", 2L, "x", 5.0),
      ("2024-01-01 03:00:00", 3L, "x", 5.0)))
    val r0 = EventOps.ansariBradleyAb(same).collect().head
    assert(r0.getAs[Double]("ab_score_a") ==
      r0.getAs[Double]("expected_score_a"))
    // arm0 = {5,5} (middle ranks), arm1 = {1,9} (extremes):
    // pooled [1,5,5,9], scores min(r,5-r) = 1,2,2,1 -> W_A = 4 > E = 3
    val wide = eventsFrom(Seq(
      ("2024-01-01 00:00:00", 1L, "x", 1.0),
      ("2024-01-01 01:00:00", 0L, "x", 5.0),
      ("2024-01-01 02:00:00", 2L, "x", 5.0),
      ("2024-01-01 03:00:00", 3L, "x", 9.0)))
    val r1 = EventOps.ansariBradleyAb(wide).collect().head
    assert(r1.getAs[Double]("ab_score_a") == 4.0)
    assert(r1.getAs[Double]("expected_score_a") == 3.0)
    assert(r1.getAs[Double]("z_score") > 0.0)
  }

  test("anderson-darling: identical halves sit far below the unit H0 " +
      "mean; disjoint halves far above") {
    def halves(first: Seq[Double], second: Seq[Double]) = eventsFrom(
      first.zipWithIndex.map { case (v, i) =>
        (f"2024-01-01 0$i%01d:00:00", 1L, "x", v) } ++
        second.zipWithIndex.map { case (v, i) =>
          (f"2024-01-02 2$i%01d:00:00", 1L, "x", v) })
    val same = EventOps.valueAdDrift(
      halves(Seq(1, 2, 3), Seq(1, 2, 3))).collect().head
    val disj = EventOps.valueAdDrift(
      halves(Seq(1, 1, 1), Seq(9, 9, 9))).collect().head
    assert(same.getAs[Double]("a2_akn") < 0.5, same.toString)
    assert(disj.getAs[Double]("a2_akn") > 2.0, disj.toString)
  }

  test("negative binomial MoM: daily counts [0,2,4] -> mean 2, var 4, " +
      "dispersion 2, r = 2, p = 0.5; constant series -> NULL r") {
    val ev = eventsFrom(
      (1 to 2).map(i => (s"2024-01-02 0$i:00:00", 1L, "N", 1.0)) ++
        (1 to 4).map(i => (s"2024-01-03 0$i:00:00", 1L, "N", 1.0)) ++
        (1 to 2).flatMap(d => (1 to 2).map(i =>
          (s"2024-01-0$d 1$i:00:00", 1L, "P", 1.0))) ++
        (1 to 2).map(i => (s"2024-01-03 1$i:00:00", 1L, "P", 1.0)))
    val rows = EventOps.negbinFitByType(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val n = rows("N")
    assert(n.getAs[Double]("mean_daily") == 2.0)
    assert(n.getAs[Double]("var_daily") == 4.0)
    assert(n.getAs[Double]("dispersion_index") == 2.0)
    assert(n.getAs[Double]("nb_r") == 2.0)
    assert(n.getAs[Double]("nb_p") == 0.5)
    assert(rows("P").isNullAt(rows("P").fieldIndex("nb_r")))
  }

  test("GPD MoM: 1..38 plus tail {100, 200} -> u = 38, excesses " +
      "{62, 162}: shape = (1 - 2.5088)/2, scale = 112*3.5088/2") {
    val ev = eventsFrom(((1 to 38).map(_.toDouble) ++ Seq(100.0, 200.0))
      .zipWithIndex.map { case (v, i) =>
        (f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00", 1L, "x", v) })
    val r = EventOps.gpdPotFit(ev).collect().head
    assert(r.getAs[Double]("threshold") == 38.0)
    assert(r.getAs[Long]("n_exceed") == 2L)
    assert(r.getAs[Double]("mean_excess") == 112.0)
    assert(r.getAs[Double]("gpd_shape") == -0.7544)
    assert(r.getAs[Double]("gpd_scale") == 196.4928)
  }

  test("distance correlation: exactly linear volume/users -> dcor 1") {
    // day i: 2i events from i distinct users -> y = x/2, proportional
    // distance matrices, dcor exactly 1
    val ev = eventsFrom((1 to 3).flatMap { d =>
      (1 to 2 * d).map { j =>
        (s"2024-01-0$d 0${j % 10}:0${j / 10}:00",
          (j % d + 1).toLong, "x", 1.0)
      }
    })
    val r = EventOps.distanceCorrelationDaily(ev).collect().head
    assert(r.getAs[Double]("dcor") == 1.0, r.toString)
  }

  test("k-truss: a 4-clique survives k=4; its pendant bridge and " +
      "triangle tail are peeled") {
    // K4 on {a,b,c,d} (every edge in 2 triangles) + triangle {d,e,f}
    // (support 1 each) + bridge f-g (support 0)
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("d", "e"), ("d", "f"), ("e", "f"), ("f", "g"))
      .toDF("src", "dst")
    val out = GraphOps.kTruss(edges, 4).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst"),
        r.getAs[Long]("support")))
    assert(out.toSet == Set(("a", "b", 2L), ("a", "c", 2L),
      ("a", "d", 2L), ("b", "c", 2L), ("b", "d", 2L), ("c", "d", 2L)),
      out.mkString(", "))
  }

  test("page trend: strictly rising within every complete week gives " +
      "the maximal L and a positive z") {
    // 14 days, counts = day index -> within each ISO week the ranks
    // rise 1..7 monotonically
    val ev = eventsFrom((0 until 14).flatMap { d =>
      (0 to d).map(j =>
        (f"2024-01-${d + 1}%02d ${j / 60}%02d:${j % 60}%02d:00",
          1L, "x", 1.0))
    })
    val r = EventOps.pageTrendDow(ev).collect().head
    // 2024-01-01 is a Monday: complete ISO weeks = 2; max L per week
    // = Σ j·j = 140 -> L = 280
    assert(r.getAs[Long]("n_weeks") == 2L)
    assert(r.getAs[Double]("page_l") == 280.0)
    assert(r.getAs[Double]("z_score") > 2.0)
  }

  test("seasonal mann-kendall: a within-weekday monotone rise is " +
      "all-concordant (S = n_pairs) and reads increasing") {
    val ev = eventsFrom((0 until 21).flatMap { d =>
      (0 to d).map(j =>
        (f"2024-01-${d + 1}%02d ${j / 60}%02d:${j % 60}%02d:00",
          1L, "x", 1.0))
    })
    val r = EventOps.seasonalMannKendall(ev).collect().head
    // 21 days = 3 complete weeks: per dow 3 obs -> 3 pairs, all
    // concordant: S = 7·3 = 21
    assert(r.getAs[Long]("s_stat") == 21L)
    assert(r.getAs[String]("trend") == "increasing")
  }

  test("k-center coreset on a line picks the extremes first") {
    // 1-D embeddings at x = 0, 1, 9, 10; seed = vec_id 0 (x=0):
    // farthest is x=10, then x=9's min-dist(1) < x=1's... compute:
    // after {0,10}: cand 1 -> min(1, 9) = 1; cand 9 -> min(9, 1) = 1;
    // tie at 1.0 -> vec_id ASC picks 1
    val emb = Seq((0L, Seq(0f), "a"), (1L, Seq(1f), "a"),
      (2L, Seq(9f), "a"), (3L, Seq(10f), "a"))
      .toDF("vec_id", "embedding", "label")
    val picks = VectorOps.kCenterCoreset(emb, 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id")))
    assert(picks.toSeq == Seq((1, 0L), (2, 3L), (3, 1L)),
      picks.mkString(", "))
  }

  test("yuen trimmed t: arms {1..5} vs {11..15} -> trimmed means 3/13, " +
      "winsorized d = 2/3 each, t = -10/sqrt(4/3)") {
    val ev = eventsFrom(
      (1 to 5).map(v => (s"2024-01-01 0$v:00:00", 0L, "x", v.toDouble)) ++
        (11 to 15).map(v =>
          (s"2024-01-01 $v:00:00", 1L, "x", v.toDouble)))
    val r = EventOps.yuenTrimmedTtestAb(ev).collect().head
    assert(r.getAs[Double]("trimmed_mean_a") == 3.0)
    assert(r.getAs[Double]("trimmed_mean_b") == 13.0)
    assert(r.getAs[Long]("h_a") == 3L && r.getAs[Long]("h_b") == 3L)
    assert(math.abs(r.getAs[Double]("t_stat") -
      (-10.0 / math.sqrt(4.0 / 3.0))) < 5e-5)
  }

  test("split leakage: every near-dup pair shares a cluster-aware " +
      "split by construction on the real corpus slice") {
    val docs = Tables.documents(spark, sf0)
    val r = DocOps.splitLeakageAudit(docs).collect().head
    assert(r.getAs[Long]("n_cross_cluster") == 0L)
    assert(r.getAs[Long]("n_neardup_pairs") > 0L)
  }
}
