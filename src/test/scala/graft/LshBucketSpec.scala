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

  test("degenerate inputs keep HOF parity: empty array and null element -> 0") {
    val df = Seq(
      (1L, Array.empty[java.lang.Float]),
      (2L, Array[java.lang.Float](1.0f, null, 3.0f)),
    ).toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
    val out = df.select(col("id"),
      VectorOps.lshBucket(col("embedding"), 8).as("fused"),
      VectorOps.lshBucketHof(col("embedding"), 8).as("hof"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((0L, 0L)), s"empty-array parity broke: ${out(1L)}")
    assert(out(2L) == ((0L, 0L)), s"null-element parity broke: ${out(2L)}")
  }

  test("SQL builders take foldable integral args and report arity clearly") {
    graft.functions.LshBucket.register(spark)
    randVecs(5, 8, seed = 7).createOrReplaceTempView("lsh_vecs")
    // a long literal (8L) and an arithmetic constant (4 + 4) both fold
    val viaLong = spark.sql(
      "SELECT graft_lsh_bucket(embedding, 8L) AS b FROM lsh_vecs")
      .as[Long].collect().toSeq
    val viaExpr = spark.sql(
      "SELECT graft_lsh_bucket(embedding, 4 + 4) AS b FROM lsh_vecs")
      .as[Long].collect().toSeq
    val viaInt = spark.sql(
      "SELECT graft_lsh_bucket(embedding, 8) AS b FROM lsh_vecs")
      .as[Long].collect().toSeq
    assert(viaLong == viaInt && viaExpr == viaInt)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_lsh_bucket(embedding) FROM lsh_vecs").collect()
    }
    assert(err.getMessage.contains("graft_lsh_bucket(v, planes)"),
      s"arity error not descriptive: ${err.getMessage}")
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
