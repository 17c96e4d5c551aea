package graft

import graft.functions.PqBlockL2
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

/** The native PQ block squared-L2: bit-parity with the HOF reference
  * fold (VectorOps.pqBlockDist) across dims/blocks including the
  * remainder block, codegen vs interpreted parity, null propagation,
  * and the out-of-range guard. */
class PqBlockL2Spec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (Array(1f, 2f, 3f, 4f, 5f, 6f), Array(6f, 5f, 4f, 3f, 2f, 1f)),
    (Array(0.5f, -1.5f, 2.25f, 0f, 7f, -3f), Array(0f, 0f, 0f, 0f, 0f, 0f)),
    (Array(1f, 1f, 1f, 1f, 1f, 1f, 1f), Array(2f, 2f, 2f, 2f, 2f, 2f, 2f)))

  test("native block distance is bit-identical to the HOF reference " +
    "fold on every block, remainder included") {
    for (m <- Seq(1, 2, 4); b <- 0 until m) {
      val df = vecs.toDF("e", "c")
      val both = df.select(
        PqBlockL2.pqBlockL2(col("e"), col("c"), lit(b), lit(m)).as("nat"),
        VectorOps.pqBlockDist(col("e"), col("c"), lit(b), m).as("hof"))
        .collect()
      both.foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1), s"m=$m b=$b: $r")
      }
    }
  }

  test("codegen and interpreted paths agree") {
    val df = vecs.toDF("e", "c")
    def run() = df.select(
      PqBlockL2.pqBlockL2(col("e"), col("c"), lit(1), lit(4)))
      .collect().map(_.getDouble(0)).toSeq
    val codegen = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == codegen, "interpreted path diverges")
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null array in, null out; out-of-range block fails loudly") {
    val got = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("e", "c")
      .select(PqBlockL2.pqBlockL2(col("e"), col("c"), lit(0), lit(1)))
      .collect()
    assert(got(0).isNullAt(0), got.toSeq)
    val err = intercept[Exception] {
      Seq((Array(1f, 2f), Array(1f, 2f))).toDF("e", "c")
        .select(PqBlockL2.pqBlockL2(col("e"), col("c"), lit(5), lit(4)))
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("degenerate m > dim: native and HOF both give 0.0 on empty " +
    "blocks, the full distance on the last (ADVICE r14)") {
    val df = Seq((Array(1f, 2f, 3f), Array(3f, 2f, 1f))).toDF("e", "c")
    for (b <- 0 until 5) {
      val r = df.select(
        PqBlockL2.pqBlockL2(col("e"), col("c"), lit(b), lit(5)).as("nat"),
        VectorOps.pqBlockDist(col("e"), col("c"), lit(b), 5).as("hof"))
        .head()
      assert(r.getDouble(0) == r.getDouble(1), s"b=$b: $r")
      if (b < 4) assert(r.getDouble(0) == 0.0, s"b=$b: $r")
      else assert(r.getDouble(0) == 8.0, s"b=$b: $r") // 4 + 0 + 4
    }
  }

  test("length-mismatched arrays: native returns null, never a silent " +
    "truncation; the HOF rail fails loudly (ADVICE r14)") {
    val df = Seq((Array(1f, 2f, 3f, 4f), Array(1f, 2f))).toDF("e", "c")
    val r = df.select(
      PqBlockL2.pqBlockL2(col("e"), col("c"), lit(1), lit(2)).as("nat"))
      .head()
    assert(r.isNullAt(0), s"native truncated instead of null: $r")
    // the pinned HOF derives bounds from the FIRST array alone, so a
    // short second array indexes past its end — a loud ANSI error,
    // not a truncated distance
    val err = intercept[Exception] {
      df.select(VectorOps.pqBlockDist(col("e"), col("c"), lit(1), 2))
        .collect()
    }
    assert(err.getMessage.contains("INVALID_ARRAY_INDEX") ||
      err.getMessage.contains("out of bounds"), err.getMessage)
  }

  test("SQL registration") {
    PqBlockL2.register(spark)
    val r = spark.sql("SELECT graft_pq_block_l2(" +
      "CAST(array(0.0, 3.0) AS ARRAY<FLOAT>), " +
      "CAST(array(0.0, 0.0) AS ARRAY<FLOAT>), 1, 2) AS d")
      .head.getDouble(0)
    assert(r == 9.0, r)
  }
}
