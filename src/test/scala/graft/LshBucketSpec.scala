package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** The fused native LSH bucket expression: bit-parity with the HOF
  * composition it replaces, null behavior, codegen participation, and
  * SQL registration. */
class LshBucketSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("bit-parity with the HOF baseline across planes and dims") {
    for ((dim, planes) <- Seq((3, 4), (16, 8), (32, 12), (64, 10))) {
      val df = randVecs(50, dim, seed = dim * 1000L + planes)
      val mismatches = df.select(
        VectorOps.lshBucket(col("embedding"), planes).as("fused"),
        VectorOps.lshBucketHof(col("embedding"), planes).as("hof"))
        .filter(col("fused") =!= col("hof"))
        .count()
      assert(mismatches == 0, s"dim=$dim planes=$planes")
    }
  }

  test("null array yields null bucket") {
    val df = Seq((1L, Some(Array(1.0f, 2.0f))), (2L, None))
      .toDF("id", "embedding")
    val out = df.select(col("id"),
      VectorOps.lshBucket(col("embedding"), 8).as("b")).collect()
    assert(!out.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("participates in whole-stage codegen (no interpreted HOFs)") {
    val df = spark.range(8).select(
      array((0 until 16).map(i => (col("id") + i).cast("float")): _*)
        .as("embedding"))
    val q = df.select(VectorOps.lshBucket(col("embedding"), 8).as("b"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project .*graft_lsh_bucket.*"), plan)
    assert(q.count() == 8)
  }

  test("registered SQL function graft_lsh_bucket works") {
    graft.functions.LshBucket.register(spark)
    randVecs(5, 8, seed = 7).createOrReplaceTempView("lsh_vecs")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_lsh_bucket(embedding, 8) AS b FROM lsh_vecs")
      .as[(Long, Long)].collect().toMap
    val viaApi = randVecs(5, 8, seed = 7)
      .select(col("vec_id"), VectorOps.lshBucket(col("embedding"), 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaApi)
  }
}
