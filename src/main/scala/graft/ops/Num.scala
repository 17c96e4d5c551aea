package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for oracle-comparable aggregates.
  *
  * Float `sum()` is summation-order dependent, so `round(sum(x), 2)`
  * can land on opposite sides of a rounding boundary in Spark vs the
  * DuckDB oracle (observed: 1054181.005 → .01 vs .0). All source
  * money/value columns carry ≤2 decimals, so casting to DECIMAL before
  * aggregation makes every sum EXACT — identical in any summation
  * order and in both engines — while products of (12,2)×(5,2) types
  * stay well inside precision 38 (no scale-capping divergence).
  * Results are cast back to double for a stable output schema.
  */
object Num {
  /** 2-decimal money/value cast — exact for all driver data. */
  def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** Rate-like column (discount, tax) — small, 2 decimals. */
  def rate(c: Column): Column = c.cast("decimal(4,2)")

  /** 1 - rate, staying in decimal. */
  def oneMinus(c: Column): Column = lit(1).cast("decimal(3,2)") - rate(c)

  /** 1 + rate, staying in decimal. */
  def onePlus(c: Column): Column = lit(1).cast("decimal(3,2)") + rate(c)

  /** Exact sum of a decimal expression, rounded, as double. */
  def sumRound(c: Column, scale: Int): Column =
    round(sum(c), scale).cast("double")

  /** Exact-decimal average rounded HALF_UP at `scale`, computed
    * entirely in integer space: the exact decimal sum is scaled to
    * 10^-scale units (a long), and `(2·num + n) div (2·n)` is the
    * half-up-rounded quotient — no floating point until the final
    * exact `long / 10^scale` division, which is a single correctly-
    * rounded IEEE op on identical operands in both engines.
    *
    * Why not `round(sumDouble / n, scale)`? Spark rounds the double
    * quotient half-up over its full binary expansion while DuckDB
    * scales-and-nearbyints — on a .…5-boundary quotient they land on
    * opposite sides (observed on `monthly_order_stats`). Integer
    * arithmetic is identical everywhere. Requires a nonnegative sum
    * (true for every engine money/value column) and `scale >= 2`
    * (inputs carry ≤2 decimals). Mirror with `avgSql` on the oracle
    * side. */
  def avgRound(c: Column, scale: Int = 4): Column = {
    require(scale >= 2, s"avgRound scale must be >= 2, got $scale")
    val pow = math.round(math.pow(10, scale - 2.0))
    val raw = (sum(dec2(c)) * lit(100)).cast("long") * lit(pow)
    // Loud guard: the half-up `(2·num + n) div (2·n)` trick is only
    // correct for nonnegative sums (and the DuckDB mirror's `//` would
    // FLOOR a negative quotient while Spark's div truncates) — fail at
    // runtime instead of silently rounding the wrong way.
    val num = when(raw >= 0, raw).otherwise(raise_error(lit(
      "avgRound requires a nonnegative sum (its half-up integer " +
        "rounding and the DuckDB `//` mirror diverge on negatives)")))
    val n = count(lit(1))
    intDiv(num * lit(2L) + n, n * lit(2L)).cast("double") /
      lit(math.pow(10, scale.toDouble))
  }

  /** The DuckDB mirror of [[avgRound]]: same integer arithmetic,
    * `//` = BIGINT division, powers generated from the SAME scale
    * parameter so the two sides cannot drift. */
  def avgSql(sqlExpr: String, alias: String, scale: Int = 4): String = {
    require(scale >= 2, s"avgSql scale must be >= 2, got $scale")
    val pow = math.round(math.pow(10, scale - 2.0))
    val denom = math.round(math.pow(10, scale.toDouble))
    s"CAST((2 * CAST(sum(CAST($sqlExpr AS DECIMAL(12,2))) * 100 AS BIGINT) * $pow" +
      s" + count(*)) // (2 * count(*)) AS DOUBLE) / $denom.0 AS $alias"
  }

  /** The [[avgRound]] core exposed for POST-aggregation scalars
    * (e.g. a per-group mean off an exact integer-unit sum column):
    * half-up-rounded quotient (2a + b) div (2b) of nonnegative exact
    * integer units — mirror with `(2 * a + b) // (2 * b)` in DuckDB.
    * Same negativity caveat as avgRound. */
  def halfUpRatio(a: Column, b: Column): Column =
    intDiv(a * lit(2L) + b, b * lit(2L))

  /** Exact long division (`a div b`) — Spark's `/` on integral columns
    * promotes to double, which loses exactness past 2^53. */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(new IntegralDivide(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  }
}
