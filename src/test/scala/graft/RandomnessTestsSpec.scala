package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventOps, GraphOps}

/** Hand-computed fixtures for the r16 spectral/randomness battery and
  * the rich-club ladder — the oracle gate proves Spark ≡ DuckDB; these
  * pin that BOTH match the statistics' textbook definitions on inputs
  * small enough to check by hand.
  */
class RandomnessTestsSpec extends SparkSpec {
  import spark.implicits._

  /** events frame with exactly `counts(i)` rows on day 2024-01-(i+1). */
  private def eventsWithDailyCounts(counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(f"2024-01-${i + 1}%02d 12:00:00")
    }.toDF("s").select(col("s").cast("timestamp").as("ts"))

  test("turning points: [1,3,2,4,1] has T=3, E[T]=2, z=(3-2)/sqrt(51/90)") {
    val r = EventOps.turningPointsDaily(eventsWithDailyCounts(
      Seq(1, 3, 2, 4, 1))).collect().head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_turning") == 3L)
    assert(r.getAs[Double]("expected_turning") == 2.0)
    assert(math.abs(r.getAs[Double]("z_score") -
      1.0 / math.sqrt(51.0 / 90.0)) < 5e-5)
  }

  test("bartels RVN: [1,3,2,4] doubled ranks (2,6,4,8), NM=36, D=20, " +
      "RVN=1.8") {
    val r = EventOps.bartelsRankDaily(eventsWithDailyCounts(
      Seq(1, 3, 2, 4))).collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("rvn") == 1.8)
  }

  test("bartels handles ties through average ranks: constant series " +
      "has zero rank variance -> NULL RVN") {
    val r = EventOps.bartelsRankDaily(eventsWithDailyCounts(
      Seq(2, 2, 2, 2))).collect().head
    assert(r.isNullAt(r.fieldIndex("rvn")))
  }

  test("cox-stuart: strictly increasing [1..6] pairs all positive, " +
      "z = 3/sqrt(3)") {
    val r = EventOps.coxStuartDaily(eventsWithDailyCounts(
      Seq(1, 2, 3, 4, 5, 6))).collect().head
    assert(r.getAs[Long]("n_up") == 3L && r.getAs[Long]("n_down") == 0L)
    assert(math.abs(r.getAs[Double]("z_score") - 3.0 / math.sqrt(3.0))
      < 5e-5)
  }

  test("haar energy: [4,2,3,1] level-1 diffs (2,2) energy 8, " +
      "level-2 diff (6-4)=2 energy 4") {
    val rows = EventOps.haarEnergyDaily(eventsWithDailyCounts(
      Seq(4, 2, 3, 1))).collect()
      .map(r => r.getAs[Long]("level") -> r.getAs[Double]("energy")).toMap
    assert(rows == Map(1L -> 8.0, 2L -> 4.0), rows.toString)
  }

  test("periodogram at period = series length sees the full cycle: a " +
      "pure 4-day square wave concentrates power at p=4 vs p=2") {
    // counts 5,1,5,1,5,1,5,1 — period-2 alternation: power at p=2
    // should dominate p=7 (an off-cycle probe)
    val pw = EventOps.periodogramDaily(eventsWithDailyCounts(
        Seq(5, 1, 5, 1, 5, 1, 5, 1)), Seq(2, 7))
      .collect().map(r => r.getAs[Long]("period") ->
        r.getAs[Double]("power")).toMap
    assert(pw(2L) > 10 * pw(7L), pw.toString)
  }

  test("rich club: star a-(b,c,d) plus b-c edge — phi(1)=1.0 over " +
      "{a,b,c}, phi(2) undefined (single node)") {
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"))
      .toDF("src", "dst")
    val rows = GraphOps.richClub(edges, Seq(1, 2)).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_nodes"), Option(r.get(r.fieldIndex("phi"))))))
      .toMap
    assert(rows(1L) == ((3L, Some(1.0))), rows.toString)
    assert(rows(2L)._1 == 1L && rows(2L)._2.isEmpty, rows.toString)
  }

  test("max drawdown: revenue path cumulative [10,15,12,18] -> " +
      "drawdown peaks at 3 on the dip day") {
    val orders = Seq(
      ("1995-01-01", 10.0), ("1995-01-02", 5.0),
      ("1995-01-03", -3.0), ("1995-01-04", 6.0))
      .toDF("d", "o_totalprice")
      .select(col("d").cast("timestamp").as("o_orderdate"),
        col("o_totalprice"))
    val r = EventOps.maxDrawdownDaily(orders).collect().head
    assert(r.getAs[Double]("max_drawdown") == 3.0)
    assert(r.getAs[java.sql.Date]("trough_day").toString == "1995-01-03")
  }

  test("circadian entropy: a user active in one hour scores 0; one " +
      "uniform over two hours scores ln 2") {
    val events = Seq(
      ("2024-01-01 05:00:00", 1L), ("2024-01-01 05:10:00", 1L),
      ("2024-01-01 03:00:00", 2L), ("2024-01-01 09:00:00", 2L))
      .toDF("s", "user_id")
      .select(col("s").cast("timestamp").as("ts"), col("user_id"))
    val r = EventOps.circadianEntropyStats(events).collect().head
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Double]("min_entropy") == 0.0)
    assert(math.abs(r.getAs[Double]("max_entropy") - math.log(2.0)) < 5e-6)
  }
}
