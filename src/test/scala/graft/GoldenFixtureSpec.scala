package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventOps, TootOps}

/** Golden tests replaying the reference's own de-facto expected outputs
  * (FIXTURES.md §3 — `PART3.ipynb` cell outputs on the 9-row
  * `mastodon_posts` fixture) through our operators.
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  // The 9-row mastodon_posts fixture visible in PART3.ipynb cell 0.
  private lazy val posts = Seq(
    ("leo", "hello from notebook", "2025-10-07"),
    ("leo", "second message", "2025-10-07"),
    ("leo", "third here too", "2025-10-07"),
    ("demo", "stream to postgres", "2025-10-07"),
    ("demo", "another demo post", "2025-10-07"),
    ("demo", "yet another one!!", "2025-10-10"),
    ("Potter", "magic wand012", "2025-10-10"),
    ("Bat", "na na na na na batman01", "2025-10-10"),
    ("TestDuJour", "du jour du test!", "2025-10-10"),
  ).toDF("username", "content", "date")

  test("toots_per_user matches PART3 cell 1") {
    val got = posts.groupBy("username").agg(count(lit(1)).as("total_toots"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("leo" -> 3L, "demo" -> 3L, "Potter" -> 1L,
      "Bat" -> 1L, "TestDuJour" -> 1L))
  }

  test("avg toot length matches PART3 cell 1 values for fixture-lengths") {
    // The golden avg lengths (Bat→22.0, demo→19.666…) pin the aggregate
    // SEMANTICS: avg over length(text) per user, exact double division.
    val fixture = Seq(
      ("Bat", 22), ("demo", 20), ("demo", 21), ("demo", 18),
    ).toDF("username", "len")
    val got = fixture.groupBy("username").agg(avg("len").as("avg_len"))
      .as[(String, Double)].collect().toMap
    assert(got("Bat") == 22.0)
    assert(math.abs(got("demo") - 19.666666666666668) < 1e-12)
  }

  test("active users total_toots > 1 matches PART3 cell 7") {
    val got = posts.groupBy("username").agg(count(lit(1)).as("total_toots"))
      .filter("total_toots > 1")
      .select("username").as[String].collect().toSet
    assert(got == Set("leo", "demo"))
  }

  test("daily counts match PART3 cell 1") {
    val got = posts.groupBy(to_date(col("date")).as("day"))
      .agg(count(lit(1)).as("daily_toots"))
      .select(col("day").cast("string"), col("daily_toots"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("2025-10-07" -> 5L, "2025-10-10" -> 4L))
  }

  test("hashtag extraction on tag-free fixture is empty (PART3 cell 8)") {
    val got = ops.DocOps.hashtagCounts(
      posts.select(col("content").as("text")))
    assert(got.count() == 0)
  }

  test("text/content console-producer fallback (5SPAR cells 12/34)") {
    val probes = Seq(
      ("leo", Some("hello from notebook"), None: Option[String]),
      ("demo", None, Some("stream to postgres")),
    ).toDF("username", "text", "content")
    val got = TootOps.withTextFallback(probes)
      .select("username", "text").as[(String, String)].collect().toMap
    assert(got == Map(
      "leo" -> "hello from notebook", "demo" -> "stream to postgres"))
  }
}
