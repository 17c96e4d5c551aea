package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** The reference's parse → normalize → clean chain as pure transforms:
  * Kafka value bytes → JSON → struct → flat columns
  * (`/root/reference/src/spark_stream.py:74-91`), the multi-format
  * timestamp repair chain, and the validity/trim cleanup
  * (`src/batch_load_raw_fix.py:45-70`,
  * `src/batch_clean_historical.py:17-31`).
  */
object TootOps {

  /** P1+P2+P3: `CAST(value AS STRING)` → `from_json` → flatten.
    * Malformed JSON yields a null struct whose fields are all null —
    * dropped later by [[validToots]] (the `sample.jsonl` corrupt-line
    * behavior, SURVEY.md §5). */
  def parseKafkaValue(raw: DataFrame): DataFrame =
    raw
      .selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), Schemas.tootSchema).as("data"))
      .select(col("data.*"))

  /** Parse a string column of JSON payloads (file/socket replay path). */
  def parseJsonLines(lines: DataFrame, jsonCol: String = "value"): DataFrame =
    lines
      .select(from_json(col(jsonCol), Schemas.tootSchema).as("data"))
      .select(col("data.*"))

  /** F10: the unified multi-format timestamp chain (superset of the four
    * variants in the reference — SURVEY.md §7 "timestamp format chaos"),
    * F4's `Z` → `+00:00` repair first, `current_timestamp()` fallback
    * last (the ingest-time stamping the reference relies on). */
  def parseCreatedAt(c: Column): Column = {
    val fixed = regexp_replace(c, "Z$", "+00:00")
    coalesce(
      try_to_timestamp(fixed),
      try_to_timestamp(fixed, lit("yyyy-MM-dd HH:mm:ss.SSSSSSXXX")),
      try_to_timestamp(fixed, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
      try_to_timestamp(fixed, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(fixed, lit("yyyy-MM-dd HH:mm:ss")),
      current_timestamp())
  }

  /** Replace the string `created_at` with the parsed timestamp and stamp
    * `ingested_at` (the reference's phantom DB-side column, SURVEY.md §1
    * — materialized explicitly here). */
  def normalizeTimestamps(toots: DataFrame): DataFrame =
    toots
      .withColumn("created_at", parseCreatedAt(col("created_at")))
      .withColumn("ingested_at", current_timestamp())

  /** F2 trims + P7/P12 validity (`batch_load_raw_fix.py:45-53`). */
  def cleanToots(toots: DataFrame): DataFrame =
    toots
      .withColumn("text", trim(col("text")))
      .withColumn("username", trim(col("username")))
      .filter(col("text").isNotNull && col("username").isNotNull)
      .filter(col("text") =!= "")

  /** W1: keep the most-recent row per id
    * (`batch_clean_historical.py:34-37`), with an added deterministic
    * tie-break (SURVEY.md §7 risk register). */
  def dedupById(toots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id")
      .orderBy(col("created_at").desc_nulls_last, col("url").desc_nulls_last)
    toots
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** P14/P15: `text`/`content` field fallback (`5SPAR.ipynb` cells
    * 12/34 — console-producer probes carry `content` instead of `text`). */
  def withTextFallback(df: DataFrame, alt: String = "content"): DataFrame =
    if (df.columns.contains(alt))
      df.withColumn("text", coalesce(col("text"), col(alt)))
    else df

  /** P8+P9: the streaming job's optional language + keyword filters
    * (`src/spark_stream.py:94-104`) — keyword matches text OR any
    * hashtag. Uses `exists` over the array (SURVEY.md P9's cleaner
    * form) instead of the reference's stringified-array match. */
  def applyFilters(toots: DataFrame, language: Option[String],
      keywords: Seq[String]): DataFrame = {
    val afterLang = language.fold(toots)(l =>
      toots.filter(col("language") === lit(l.toLowerCase)))
    if (keywords.isEmpty) afterLang
    else {
      val re = DocOps.keywordRegex(keywords)
      afterLang.filter(
        col("text").rlike(re) ||
          exists(col("hashtags"), h => h.rlike(re)))
    }
  }
}
