package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the zero-shuffle join path for
  * repeatedly-joined fact tables at scale (X-category extension; the
  * reference only has repartition+cache). Both sides bucketed 8 ways on
  * their join key → SortMergeJoin with NO Exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle") {
    val db = "graft_bucket_test"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    val loc = java.nio.file.Files.createTempDirectory("bucketwh").toString
    spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
    try {
      Tables.orders(spark, sf0).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      Tables.lineitem(spark, sf0).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")

      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = spark.table(s"$db.lineitem_b")
        val o = spark.table(s"$db.orders_b")
        val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        // bucketing makes both sides pre-partitioned: the JOIN needs no
        // exchange; only the final aggregation may shuffle.
        val joinPart = plan.split("SortMergeJoin")(1)
        assert(!joinPart.contains("Exchange hashpartitioning"),
          s"join inputs shuffled despite bucketing:\n$plan")
        // and the result matches the unbucketed join
        val plain = Tables.lineitem(spark, sf0)
          .join(Tables.orders(spark, sf0),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
        assert(joined.collect().toSet == plain.collect().toSet)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
