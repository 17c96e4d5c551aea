package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.TootOps

/** The reference's main streaming job re-expressed on Structured
  * Streaming (`/root/reference/src/spark_stream.py` end-to-end):
  * source → parse → normalize → optional filters → `foreachBatch` fan-out
  * to three append sinks, preserving the observable per-batch semantics
  * (SURVEY.md §2.8):
  *
  *  - `mastodon_posts`:  (username, content, ts) projection, appended;
  *  - `streamed_toot_counts`: 1-minute tumbling window counts computed
  *    WITHIN each micro-batch, appended with `batch_id` — the same
  *    event-time window arriving across batches yields multiple partial
  *    rows (the reference's contract; totals are a downstream
  *    SUM GROUP BY);
  *  - `avg_toot_length_by_user`: per-batch per-user average length with
  *    `batch_id`.
  *
  * Sinks are abstracted as a `(table, DataFrame) => Unit` appender so
  * tests drive the job with `MemoryStream` + in-memory sinks and
  * production uses JDBC/parquet appenders — the reference hard-wires
  * JDBC (`spark_stream.py:117,131,144`).
  */
object StreamJob {

  type Appender = (String, DataFrame) => Unit

  /** Kafka source with the reference's options
    * (`src/spark_stream.py:65-72`). */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", "false")
      .load()

  /** Bounded Kafka replay for backfill
    * (`src/batch_load_raw_fix.py:35-43`). */
  def kafkaBatchSource(spark: SparkSession, bootstrap: String,
      topic: String): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()

  /** The transform chain applied to parsed toots before sinking
    * (`spark_stream.py:82-104`). */
  def prepare(parsed: DataFrame, language: Option[String] = None,
      keywords: Seq[String] = Nil): DataFrame =
    TootOps.applyFilters(
      TootOps.normalizeTimestamps(parsed), language, keywords)

  /** The three per-batch outputs (`spark_stream.py:107-144`). Exposed
    * for direct testing. */
  def batchOutputs(df: DataFrame, batchId: Long): Map[String, DataFrame] = {
    val valid = df.filter(col("text").isNotNull && col("username").isNotNull)
    val posts = valid.select(
      col("username"),
      col("text").as("content"),
      col("created_at").as("ts"))
    val windowCounts = valid
      .groupBy(window(col("created_at"), "1 minute").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        lit(batchId).as("batch_id"),
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("cnt"))
    val avgLen = valid
      .withColumn("length", length(col("text")))
      .groupBy("username")
      .agg(avg("length").as("avg_length"))
      .select(lit(batchId).as("batch_id"), col("username"), col("avg_length"))
    Map(
      "mastodon_posts" -> posts,
      "streamed_toot_counts" -> windowCounts,
      "avg_toot_length_by_user" -> avgLen)
  }

  /** Start the streaming query: parsed-toot stream → foreachBatch →
    * three appends. `checkpointDir` gives the reference's at-least-once
    * offset tracking (`spark_stream.py:150`). */
  def start(prepared: DataFrame, appender: Appender,
      checkpointDir: String): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Cache FIRST, then probe: the three outputs each trigger a job
        // over this batch, and persisting before the empty-batch guard
        // (P16, `5SPAR.ipynb` cell 24) means the isEmpty take(1) WARMS
        // the cache instead of paying an extra source scan on every
        // non-empty microbatch.
        batch.persist()
        try {
          if (!batch.isEmpty) {
            batchOutputs(batch, batchId).foreach { case (table, out) =>
              appender(table, out)
            }
          }
        } finally batch.unpersist()
        ()
      }
      .start()

  /** Parquet appender — the durable-store stand-in for the reference's
    * JDBC appends. */
  def parquetAppender(baseDir: String): Appender =
    (table, df) => df.write.mode("append").parquet(s"$baseDir/$table")

  /** Stream-stream inner join with watermarks and a time-range bound —
    * the remaining Structured Streaming category (the reference joins
    * nothing, SURVEY.md §2.3). Both sides carry watermarks so the state
    * store can evict rows once the range condition can no longer match;
    * without the bound the join state would grow forever. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      watermark: String = "10 minutes",
      within: String = "5 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
        l(key) === r(key) &&
          r(rightTs) >= l(leftTs) &&
          r(rightTs) <= l(leftTs) + org.apache.spark.sql.functions
            .expr(s"INTERVAL $within"))
      .drop(r(key)) // keep one unambiguous copy of the join key
  }

  /** The idiomatic Spark-native alternative the reference lacks
    * (SURVEY.md §2.8): true streaming windowed aggregation with a
    * watermark — one row per window in update mode, late data beyond
    * the watermark dropped. */
  def windowedCountsNative(prepared: DataFrame,
      watermark: String = "2 minutes"): DataFrame =
    prepared
      .withWatermark("created_at", watermark)
      .groupBy(window(col("created_at"), "1 minute").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("cnt"))
}
