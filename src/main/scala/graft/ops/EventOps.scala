package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics: the reference's batch/streaming aggregates
  * (`/root/reference/src/batch_analytics.py`, `src/spark_stream.py`)
  * re-expressed over the driver `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Mapping (SURVEY.md §7): user_id ≅ username, ts ≅ created_at,
  * event_type ≅ hashtag/topic, value ≅ toot length, props ≅ raw JSON.
  *
  * All functions are pure DataFrame transforms — single groupBy/window
  * shuffles, partial+final hash aggregation via Catalyst; nothing here
  * collects to the driver, so every operator scales horizontally with
  * the number of shuffle partitions.
  */
object EventOps {

  /** Toots-per-user (A1, `/root/reference/src/batch_analytics.py:32`). */
  def userActivity(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(count(lit(1)).as("toot_count"))

  /** Active users above a threshold (P10, `batch_analytics.py:35-36`). */
  def activeUsers(events: DataFrame, minCount: Long = 5): DataFrame =
    userActivity(events).filter(col("toot_count") >= lit(minCount))

  /** Hourly counts (A3, `batch_analytics.py:25-26`). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("toots"))

  /** Daily counts (A3, `batch_analytics.py:28-29`). */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("toots"))

  /** Per-(day, type) counts (A2, `batch_analytics.py:44`). */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Average value per user (A4, `batch_analytics.py:52` — avg toot
    * length per user). Rounded so the DuckDB oracle hash-matches despite
    * float summation-order differences.
    */
  def avgValuePerUser(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(Num.avgRound(col("value"), 4).as("avg_value"))

  /** 1-minute tumbling window counts (A5, `src/spark_stream.py:119-131`).
    * Uses the native `window()` time-bucketing expression; at scale this
    * is a single hash aggregation keyed by (minute bucket) — no sort.
    */
  def minuteWindowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("cnt"))

  /** Keep only the most-recent event per user (W1 dedup,
    * `/root/reference/src/batch_clean_historical.py:34-37`). The
    * reference tie-breaks only on the timestamp; we add `event_id` as a
    * stable secondary key so results are deterministic (SURVEY.md §7
    * risk register). One hash shuffle on the partition key, then a
    * per-partition sort — the canonical scalable dedup shape.
    */
  def latestPerUser(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc_nulls_last, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Top event type per day, ties broken alphabetically (W2,
    * `batch_analytics.py:47-49`). */
  def topTypePerDay(events: DataFrame): DataFrame = {
    val counts = dailyTypeCounts(events)
    val w = Window
      .partitionBy("day")
      .orderBy(col("cnt").desc, col("event_type").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Distinct users per day — fills the reference's empty distinct-agg
    * category (SURVEY.md §2.4). Exact countDistinct: Catalyst expands to
    * a two-phase aggregation; fine at scale because the inner key space
    * is (day × user). */
  def distinctUsersDaily(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("users"))

  /** Approximate distinct users per day (HLL++, rsd=5%) — the 100 TB
    * variant of [[distinctUsersDaily]]: constant-size sketch per group,
    * single aggregation pass, no exact-distinct expansion. Not
    * oracle-comparable (DuckDB uses a different sketch). */
  def approxDistinctUsersDaily(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("approx_users"))

  /** JSON field extraction from the `props` payload (P2/P4/F17,
    * `src/spark_stream.py:76`, `5SPAR.ipynb` cell 20) — schema-less
    * `get_json_object` path, aggregated to keep the result compact. */
  def propsKeyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))

  /** Running per-user cumulative value ordered by time — window-frame
    * coverage (`rowsBetween`) absent from the reference (SURVEY.md §2.5).
    * Deterministic ordering via (ts, event_id). */
  def runningValuePerUser(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col("event_id"),
      col("user_id"),
      col("ts"),
      round(sum(Num.dec2(col("value"))).over(w), 4).cast("double")
        .as("running_value"))
  }

  /** Previous event value per user (lag) — analytic-function coverage. */
  def lagValuePerUser(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    events.select(
      col("event_id"),
      col("user_id"),
      col("ts"),
      lag("value", 1).over(w).as("prev_value"))
  }

  /** Sessionize events per user with a gap timeout: a new session starts
    * when the inter-event gap exceeds `gapMinutes`. Classic cumulative-
    * sum-over-boundary-flags formulation — two window passes over the
    * same (user_id, ts) sort, so Catalyst reuses one shuffle+sort. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > gapSec,
          1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }

  /** Per-user session stats built on [[sessionize]]. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(Num.dec2(col("value"))), 4).cast("double")
          .as("session_value"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
}
