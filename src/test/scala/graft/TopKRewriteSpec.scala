package graft

import org.apache.spark.sql.functions._
import graft.plans.{TopKRewrite, TopKStrategy}

/** The optimizer rule that turns `Filter(rn <= k, Window(row_number))`
  * into the native TopKPerGroup pre-prune — user code unchanged.
  * Installed here via the public experimental hooks (production wiring
  * is `GraftExtensions.injectOptimizerRule` at session build time).
  */
class TopKRewriteSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    val prevOpt = spark.experimental.extraOptimizations
    val prevStrat = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations = prevOpt :+ TopKRewrite
    if (!prevStrat.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = prevStrat :+ TopKStrategy
    }
    try f
    finally {
      spark.experimental.extraOptimizations = prevOpt
      spark.experimental.extraStrategies = prevStrat
    }
  }

  test("row_number filter pattern is rewritten and stays correct") {
    val orders = Tables.orders(spark, sf0)
    val baseline = ops.JoinOps.topOrdersPerCustomer(orders, 3)
      .collect().map(_.toString).sorted.toSeq
    withRule {
      val viaWindow = ops.JoinOps.topOrdersPerCustomer(orders, 3)
      val optimized = viaWindow.queryExecution.optimizedPlan.toString
      assert(optimized.contains("TopKPerGroup"),
        s"rewrite did not fire:\n$optimized")
      val rewritten = viaWindow.collect().map(_.toString).sorted.toSeq
      assert(rewritten == baseline)
    }
  }

  test("rn = 1 dedup pattern (latestPerUser) is rewritten") {
    withRule {
      val events = Tables.events(spark, sf0)
      val df = ops.EventOps.latestPerUser(events)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("TopKPerGroup"), optimized)
      assert(df.count() == events.select("user_id").distinct().count())
    }
  }

  test("rn > 1 anti-pattern is NOT rewritten") {
    import spark.implicits._
    withRule {
      val df = Seq((1L, 2.0), (1L, 1.0)).toDF("g", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("v"))
      val dupsOnly = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") > 1)
      val optimized = dupsOnly.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("TopKPerGroup"), optimized)
      assert(dupsOnly.count() == 1)
    }
  }

  test("TootOps.dedupById accelerates transparently on toot data") {
    import spark.implicits._
    withRule {
      val lines = Seq(
        """{"id": 1, "created_at": "2025-10-03 10:00:00", "language": "en", "text": "old", "hashtags": [], "user_id": 1, "username": "u", "display_name": null, "favourites": 0, "reblogs": 0, "replies": 0, "url": "a"}""",
        """{"id": 1, "created_at": "2025-10-03 12:00:00", "language": "en", "text": "new", "hashtags": [], "user_id": 1, "username": "u", "display_name": null, "favourites": 0, "reblogs": 0, "replies": 0, "url": "b"}""",
      ).toDF("value")
      val toots = ops.TootOps.normalizeTimestamps(
        ops.TootOps.parseJsonLines(lines))
      val deduped = ops.TootOps.dedupById(toots)
      assert(deduped.queryExecution.optimizedPlan.toString
        .contains("TopKPerGroup"))
      val kept = deduped.select("text").as[String].collect()
      assert(kept.toSeq == Seq("new"))
    }
  }
}
