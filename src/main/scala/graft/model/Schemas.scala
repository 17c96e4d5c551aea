package graft.model

import org.apache.spark.sql.types._

/** Canonical toot event (the reference's single data abstraction,
  * SURVEY.md §1). Types follow the batch schema
  * (`/root/reference/src/batch_load_raw_fix.py:12-24` — Long ids, which
  * match the actual producer payloads in `sample.jsonl`); the streaming
  * job's String-id variant (`/root/reference/src/spark_stream.py:37-50`)
  * is modeled as [[Schemas.tootStreamSchema]] and reconciled by cast.
  */
case class Toot(
    id: Long,
    created_at: String,
    language: String,
    text: String,
    hashtags: Seq[String],
    user_id: Long,
    username: String,
    display_name: String,
    favourites: Long,
    reblogs: Long,
    replies: Long,
    url: String)

object Schemas {

  /** Batch/canonical schema (`batch_load_raw_fix.py:12-24` + the
    * streaming job's display_name). */
  val tootSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("created_at", StringType),
    StructField("language", StringType),
    StructField("text", StringType),
    StructField("hashtags", ArrayType(StringType)),
    StructField("user_id", LongType),
    StructField("username", StringType),
    StructField("display_name", StringType),
    StructField("favourites", LongType),
    StructField("reblogs", LongType),
    StructField("replies", LongType),
    StructField("url", StringType)))

  /** Streaming-job schema variant — String ids
    * (`src/spark_stream.py:37-50`, the schema-drift documented in
    * SURVEY.md §1). */
  val tootStreamSchema: StructType = StructType(tootSchema.fields.map {
    case StructField("id", _, n, m)      => StructField("id", StringType, n, m)
    case StructField("user_id", _, n, m) => StructField("user_id", StringType, n, m)
    case f                               => f
  })
}
