package graft

import org.apache.spark.sql.functions._
import graft.ops.TootOps

/** Parse → normalize → clean → dedup chain over reference-shaped toot
  * JSON (FIXTURES.md §1), including the malformed-line behavior of
  * `sample.jsonl` (3 non-JSON lines among valid toots).
  */
class TootOpsSpec extends SparkSpec {
  import spark.implicits._

  private def toot(id: Long, createdAt: String, text: String = "hello",
      user: String = "leo"): String =
    s"""{"id": $id, "created_at": "$createdAt", "language": "en",
       |"text": "$text", "hashtags": ["tag"], "user_id": 7,
       |"username": "$user", "display_name": "Leo", "favourites": 1,
       |"reblogs": 0, "replies": 2,
       |"url": "https://example.social/@$user/$id"}""".stripMargin
      .replaceAll("\n", " ")

  test("parseJsonLines: valid toots parse, malformed lines become nulls") {
    val lines = Seq(
      toot(1, "2025-10-03 18:14:46.665000+00:00"),
      "msg1", // the sample.jsonl plain-text probe lines
      "msg2",
      toot(2, "2025-10-03T18:15:00.000000+00:00"),
      "Processed a total of 138 messages",
    ).toDF("value")
    val parsed = TootOps.parseJsonLines(lines)
    assert(parsed.count() == 5)
    val valid = TootOps.cleanToots(parsed)
    assert(valid.count() == 2) // malformed → null struct → dropped
    assert(valid.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("golden replay: reference sample.jsonl yields exactly 135 valid toots") {
    // The reference's captured Kafka topic dump (SURVEY.md §5 fixture 3).
    // Its consumer log says "Processed a total of 138 messages", but 3
    // of those are the plain-text probe lines (msg1..msg3) — line-level
    // ground truth is 135 toot JSONs + 6 non-JSON lines (3 probes + 3
    // trailing kafka-console-consumer error lines).
    val path = "/root/reference/sample.jsonl"
    assume(new java.io.File(path).exists())
    val lines = spark.read.text(path).withColumnRenamed("value", "value")
    val parsed = TootOps.parseJsonLines(lines)
    val valid = TootOps.cleanToots(parsed)
    assert(valid.count() == 135)
    assert(parsed.count() === lines.count()) // malformed → null rows, kept
    val normalized = TootOps.normalizeTimestamps(valid)
    assert(normalized.filter(col("created_at").isNull).count() == 0)
    // the dump contains ONE genuinely duplicated id (115311590921522048
    // — the at-least-once redelivery the reference's batch dedup exists
    // for), so W1 collapses 135 → 134 on real data
    assert(TootOps.dedupById(normalized).count() == 134)
  }

  test("timestamp chain parses every observed format (F10)") {
    val cases = Seq(
      "2025-10-03 18:14:46.665000+00:00", // producer format
      "2025-10-03T18:14:46.665000+00:00", // ISO-T µs
      "2025-10-03T18:14:46.665+00:00",    // ISO-T ms
      "2025-10-03 18:14:46",              // bare
      "2025-10-03T18:14:46Z",             // trailing Z (F4 repair)
    ).toDF("created_at")
    val parsed = cases
      .select(TootOps.parseCreatedAt(col("created_at")).as("ts"))
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm").as("s"))
      .as[String].collect()
    assert(parsed.forall(_ == "2025-10-03 18:14"),
      s"got: ${parsed.mkString(", ")}")
  }

  test("unparseable timestamp falls back to current_timestamp, not null") {
    val parsed = Seq("not a date").toDF("created_at")
      .select(TootOps.parseCreatedAt(col("created_at")).as("ts"))
    assert(parsed.filter(col("ts").isNull).count() == 0)
  }

  test("dedupById keeps exactly the latest row per id (W1)") {
    val lines = Seq(
      toot(1, "2025-10-03 10:00:00", text = "old"),
      toot(1, "2025-10-03 12:00:00", text = "new"),
      toot(2, "2025-10-03 11:00:00", text = "only"),
    ).toDF("value")
    val normalized = TootOps.normalizeTimestamps(TootOps.parseJsonLines(lines))
    val deduped = TootOps.dedupById(normalized)
    assert(deduped.count() == 2)
    val kept = deduped.select("id", "text").as[(Long, String)].collect().toMap
    assert(kept == Map(1L -> "new", 2L -> "only"))
  }

  test("language + keyword filters match text OR hashtags (P8/P9)") {
    val lines = Seq(
      toot(1, "2025-10-03 10:00:00", text = "all about spark today"),
      toot(2, "2025-10-03 10:00:00", text = "unrelated"),
      toot(3, "2025-10-03 10:00:00", text = "nothing"), // but hashtags=[tag]
    ).toDF("value")
    val parsed = TootOps.normalizeTimestamps(TootOps.parseJsonLines(lines))
    val bySpark = TootOps.applyFilters(parsed, Some("en"), Seq("Spark"))
    assert(bySpark.select("id").as[Long].collect().toSet == Set(1L))
    val byTag = TootOps.applyFilters(parsed, None, Seq("TAG"))
    assert(byTag.count() == 3) // every row's hashtags array matches
    val wrongLang = TootOps.applyFilters(parsed, Some("fr"), Nil)
    assert(wrongLang.count() == 0)
  }

  test("stream-schema (string ids) variant parses the same payload") {
    val lines = Seq(toot(115311593826275073L,
      "2025-10-03 18:14:46.665000+00:00")).toDF("value")
    val viaStream = lines
      .select(from_json(col("value"), model.Schemas.tootStreamSchema).as("d"))
      .select(col("d.id").cast("long").as("id"), col("d.user_id"))
    assert(viaStream.select("id").as[Long].head() == 115311593826275073L)
  }
}
