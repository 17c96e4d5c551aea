package graft

import graft.functions.NormalTail
import org.apache.spark.sql.functions._

/** The native A&S 26.2.17 upper-tail normal probability: accuracy vs
  * the textbook values, the pinned-chain contract, codegen vs
  * interpreted parity, null propagation, SQL registration. */
class NormalTailSpec extends SparkSpec {
  import spark.implicits._

  // textbook two-sided landmarks: P(Z > x) to the advertised 7.5e-8
  private val landmarks = Seq(
    0.0 -> 0.5,
    1.0 -> 0.15865525393145705,
    1.959964 -> 0.025000002,
    2.575829 -> 0.005000001,
    -1.0 -> (1.0 - 0.15865525393145705))

  test("tail matches the normal upper-tail within the A&S error bound") {
    for ((x, expected) <- landmarks) {
      val got = NormalTail.tail(x)
      assert(math.abs(got - expected) < 7.5e-8, s"tail($x) = $got")
    }
    // symmetry identity is exact by construction
    assert(NormalTail.tail(-1.3) == 1.0 - NormalTail.tail(1.3))
    assert(NormalTail.tail(Double.NaN).isNaN)
  }

  test("the chain is pinned: tail(x) == the inline polynomial spelled " +
    "in the documented order") {
    for (x <- Seq(0.0, 0.17, 1.0, 2.2361, 4.5)) {
      val k = 1.0 / (1.0 + 0.2316419 * x)
      val poly = k * (0.319381530 + k * (-0.356563782 + k * (1.781477937 +
        k * (-1.821255978 + k * 1.330274429))))
      val inline = (math.exp(-(x * x) / 2.0) / 2.5066282746310002) * poly
      assert(NormalTail.tail(x) == inline, s"x=$x")
    }
  }

  test("expression evaluates identically under codegen and interpretation") {
    val xs = Seq(0.0, 0.5, -0.5, 1.96, 3.1, -2.2)
    val df = xs.toDF("x")
    val viaExpr = df.select(NormalTail.normalTail(col("x")).as("t"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaExpr == xs.map(NormalTail.tail), "codegen path diverges")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(NormalTail.normalTail(col("x")).as("t"))
        .collect().map(_.getDouble(0)).toSeq
      assert(interp == viaExpr, "interpreted path diverges from codegen")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null in, null out; SQL registration") {
    val got = Seq(Some(1.0), None).toDF("x")
      .select(NormalTail.normalTail(col("x"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).nonEmpty && got(1).isEmpty, got.toSeq)
    NormalTail.register(spark)
    val r = spark.sql("SELECT graft_normal_tail(CAST(0.0 AS DOUBLE)) AS t")
      .head.getDouble(0)
    assert(r == NormalTail.tail(0.0))
  }
}
