package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.batch.BatchJobs.JdbcStore

/** The JDBC table store (the reference's durable layer,
  * `src/batch_analytics.py:26-52`) exercised against embedded Derby —
  * a real JDBC round-trip: append, append-again, overwrite, read-back,
  * and the full 3-stage batch pipeline writing through JDBC. */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val store = {
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    new JdbcStore(spark, "jdbc:derby:memory:graftdb;create=true", props)
  }

  test("append accumulates; overwrite resets; values round-trip") {
    val a = Seq((1L, "alice", 10.5), (2L, "bob", 20.25)).toDF("id", "name", "v")
    store.write("kv_t", a, SaveMode.Append)
    store.write("kv_t", a, SaveMode.Append)
    assert(store.read("kv_t").count() == 4)

    val b = Seq((9L, "carol", 1.0)).toDF("id", "name", "v")
    store.write("kv_t", b, SaveMode.Overwrite)
    val got = store.read("kv_t").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((9L, "carol", 1.0)))
  }

  test("timestamps and nulls survive the JDBC round-trip") {
    val df = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2024-03-01 10:30:00")), Some("x")),
      (2L, None: Option[java.sql.Timestamp], None: Option[String]),
    ).toDF("id", "ts", "s")
    store.write("ts_t", df, SaveMode.Overwrite)
    val back = store.read("ts_t").orderBy("id").collect()
    assert(back(0).getTimestamp(1) ==
      java.sql.Timestamp.valueOf("2024-03-01 10:30:00"))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2))
  }

  test("analytics stage fans out through JDBC like the reference") {
    // minimal toots_clean table in the shape stage 3 expects; the
    // array-typed hashtags column has no JDBC type (Spark refuses it,
    // correctly), so the clean table is served in-memory while all
    // SEVEN scalar-typed aggregate outputs go through real JDBC writes
    // — the reference's Postgres fan-out shape
    val clean = Seq(
      ("u1", "hello world", "2024-03-01 10:00:00", Seq("Tag")),
      ("u1", "more text!!", "2024-03-01 11:00:00", Seq.empty[String]),
      ("u2", "hi", "2024-03-02 09:00:00", Seq("tag", "other")),
    ).toDF("username", "text", "created_at", "hashtags")
      .withColumn("created_at", col("created_at").cast("timestamp"))
      .withColumn("ingested_at", col("created_at"))
    val hybrid = new graft.batch.BatchJobs.TableStore {
      def read(table: String) = clean
      def write(table: String, df: org.apache.spark.sql.DataFrame,
          mode: SaveMode): Unit = store.write(table, df, mode)
    }
    graft.batch.BatchJobs.analytics(hybrid, activeMin = 2)
    assert(store.read("user_activity_counts").count() == 2)
    assert(store.read("active_users_gtX")
      .as[(String, Long)].collect().toMap == Map("u1" -> 2L))
    val topTags = store.read("top_hashtag_per_day").count()
    assert(topTags == 2) // one top tag per day with tags
  }
}
