package graft

import org.apache.spark.sql.functions._
import graft.functions.HammingDist
import graft.ops.VectorOps

/** Native codegen'd Hamming distance: bit-parity with the HOF baseline
  * it replaced in the O(n²) pair loops (r17 optimization — the HOF
  * `aggregate(zip_with(...))` form is CodegenFallback and allocates per
  * pair), plus the null/length edge semantics the HOF defines. */
class HammingDistSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rng = new scala.util.Random(42)
  private lazy val codes = (0 until 500).map { i =>
    (i.toLong, Array(rng.nextLong(), rng.nextLong()),
      Array(rng.nextLong(), rng.nextLong()))
  }.toDF("id", "a", "b")

  test("matches the HOF composition on 500 random code pairs") {
    val both = codes.select(
      HammingDist.hammingFused(col("a"), col("b")).as("fused"),
      VectorOps.hammingDistHof(col("a"), col("b")).as("hof"))
      .collect()
    assert(both.length == 500)
    both.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"fused=${r.getInt(0)} hof=${r.getInt(1)}"))
  }

  test("known distances: identical → 0, complement → 64 per word") {
    val df = Seq(
      (Array(0L, 0L), Array(0L, 0L), 0),
      (Array(-1L, 0L), Array(0L, 0L), 64),
      (Array(-1L, -1L), Array(0L, 0L), 128),
      (Array(5L, 9L), Array(6L, 9L), 2) // 101 vs 110 → 2 bits
    ).toDF("a", "b", "want")
    df.select(HammingDist.hammingFused(col("a"), col("b")).as("got"),
        col("want")).collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("length mismatch → null (zip_with padding semantics)") {
    val df = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
    val out = df.select(
      HammingDist.hammingFused(col("a"), col("b")).as("fused"),
      VectorOps.hammingDistHof(col("a"), col("b")).as("hof")).collect()
    assert(out.head.isNullAt(0) && out.head.isNullAt(1))
  }

  test("null element → null, null array → null") {
    val withNullElem = Seq(
      (Array[java.lang.Long](1L, null), Array[java.lang.Long](1L, 2L)))
      .toDF("a", "b")
    assert(withNullElem.select(
      HammingDist.hammingFused(col("a"), col("b"))).collect().head.isNullAt(0))
    val withNullArr = Seq((Some(Array(1L)), None: Option[Array[Long]]))
      .toDF("a", "b")
    assert(withNullArr.select(
      HammingDist.hammingFused(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("not a CodegenFallback — participates in whole-stage codegen") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen
      .CodegenFallback].isAssignableFrom(classOf[HammingDist]))
  }
}
