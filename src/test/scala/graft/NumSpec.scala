package graft

import org.apache.spark.sql.functions._
import graft.ops.Num

/** The exact-arithmetic helpers behind every oracle-green average:
  * half-up rounding on positives, a LOUD failure on negative sums
  * (where the integer trick and DuckDB's `//` floor would silently
  * diverge), and scale-parameterized SQL mirrors.
  */
class NumSpec extends SparkSpec {
  import spark.implicits._

  private def allMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("avgRound rounds half-up in integer space on positives") {
    // avg(1.0, 2.05) = 1.525 — a .5 boundary at scale 2
    val df = Seq(("a", 1.0), ("a", 2.05)).toDF("g", "v")
    val got = df.groupBy("g").agg(Num.avgRound(col("v"), 2).as("a"))
      .select("a").as[Double].head()
    assert(got == 1.53, s"got $got")
  }

  test("avgRound fails loudly on a negative sum instead of mis-rounding") {
    val df = Seq(("a", -1.5), ("a", -2.5)).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(Num.avgRound(col("v"), 4).as("a")).collect()
    }
    assert(allMessages(e).contains("nonnegative"), allMessages(e))
  }

  test("avgSql generates its powers from the scale parameter") {
    assert(Num.avgSql("x", "a").contains("/ 10000.0")) // default scale 4
    assert(Num.avgSql("x", "a", 4) == Num.avgSql("x", "a"))
    assert(Num.avgSql("x", "a", 2).contains("/ 100.0"))
    assert(Num.avgSql("x", "a", 6).contains("/ 1000000.0"))
  }
}
