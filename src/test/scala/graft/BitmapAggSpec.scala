package graft

import org.apache.spark.sql.functions._
import graft.functions.BitmapAgg._
import graft.ops.EventOps

/** The native bitmap aggregate pair (TypedImperativeAggregate):
  * build→blob→OR-merge→cardinality must equal exact count(DISTINCT)
  * at every grain, the id-domain guard must refuse loudly, and the
  * extension wiring must expose both functions to SQL.
  */
class BitmapAggSpec extends SparkSpec {
  import spark.implicits._

  test("day→week bitmap rollup equals count(DISTINCT) on real events") {
    val events = Tables.events(spark, sf0)
    val got = EventOps.bitmapDistinctRollup(events)
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val exp = events
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(got == exp)
  }

  test("blob OR-merge is the set union, not the sum") {
    // Two days sharing users: merged cardinality must be |A ∪ B|,
    // which a sum-of-partials would overcount.
    val df = Seq(("d1", 1L), ("d1", 2L), ("d1", 3L),
        ("d2", 2L), ("d2", 3L), ("d2", 4L))
      .toDF("day", "id")
    val blobs = df.groupBy("day").agg(bitmapBuild(col("id"), 64).as("bm"))
    val n = blobs.agg(bitmapCardinality(col("bm"), 64).as("n"))
      .as[Long].head()
    assert(n == 4L) // {1,2,3,4}, not 3+3
  }

  test("id outside [0, maxId) refuses loudly — the dense premise is void") {
    val df = Seq(1L, 99L).toDF("id")
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(bitmapBuild(col("id"), 64)).collect()
    }
    assert(e.getMessage.contains("out of range") ||
      Option(e.getCause).exists(_.getMessage.contains("out of range")))
  }

  test("mismatched blob widths refuse — different id spaces don't merge") {
    val a = Seq(1L).toDF("id").agg(bitmapBuild(col("id"), 64).as("bm"))
    val b = Seq(1L).toDF("id").agg(bitmapBuild(col("id"), 128).as("bm"))
    val e = intercept[org.apache.spark.SparkException] {
      a.unionAll(b).agg(bitmapCardinality(col("bm"), 64)).collect()
    }
    assert(e.getMessage.contains("not mergeable") ||
      Option(e.getCause).exists(_.getMessage.contains("not mergeable")))
  }

  test("extension wiring exposes both bitmap functions") {
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.graft.ColumnShim
      .registerFunctions(ext, FunctionRegistry.builtin.clone())
    for (name <- Seq("graft_bitmap_build", "graft_bitmap_cardinality"))
      assert(registry.functionExists(FunctionIdentifier(name)), name)
  }
}
