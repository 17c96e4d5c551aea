package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Lake

/** Interchange formats round-trip through the Lake helpers with values
  * and types intact; the columnar path keeps its pushdown. */
class FormatRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-fmt-$name").toString

  private lazy val orders = Tables.orders(spark, sf0)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.orderBy("o_orderkey").collect().map(_.toString).toSet

  test("Tables memo: repeated loads share one relation; invalidate " +
    "refreshes after a rewrite (r15 catalog-cache semantics)") {
    val dir = tmp("memo")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val first = Tables.table(spark, dir, "t")
    assert(first.count() == 2L)
    // the memo returns the SAME resolved plan object — no re-listing
    assert(Tables.table(spark, dir, "t") eq first)
    // rewrite the path: the memo intentionally serves the cached
    // relation (static-testdata contract) until invalidated
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    Tables.invalidate(Some(spark))
    assert(Tables.table(spark, dir, "t").count() == 3L)
  }

  test("ORC round trip: values, schema, and filter pushdown") {
    val path = tmp("orc")
    Lake.writeAs(orders, path, "orc")
    val back = Lake.readAs(spark, path, "orc")
    assert(back.schema == orders.schema)
    assert(rows(back) == rows(orders))
    // predicates reach the ORC reader, same as the parquet posture
    val scan = back.filter(col("o_totalprice") > 100000.0)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,"), scan)
  }

  test("CSV round trip with explicit schema; empty string survives") {
    val path = tmp("csv")
    val df = orders
      .withColumn("note", when(col("o_orderkey") % 3 === 0, lit(""))
        .when(col("o_orderkey") % 3 === 1, lit(null: String))
        .otherwise(lit("ok")))
    Lake.writeAs(df, path, "csv")
    val back = Lake.readAs(spark, path, "csv", Some(df.schema))
    assert(back.schema == df.schema)
    assert(rows(back) == rows(df))
    // the nullValue pin keeps "" and null distinct — the default CSV
    // options would collapse both to null
    val counts = back.groupBy("note").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts.contains(Some("")) && counts.contains(None), counts)
  }

  test("JSON-lines round trip with explicit schema") {
    val path = tmp("json")
    Lake.writeAs(orders, path, "json")
    val back = Lake.readAs(spark, path, "json", Some(orders.schema))
    assert(back.schema == orders.schema)
    assert(rows(back) == rows(orders))
  }
}
