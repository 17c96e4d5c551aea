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

  /** Exact-decimal average: exact sum → double → divide by count →
    * round. The double quotient is a single IEEE op on identical
    * operands in both engines, hence deterministic. */
  def avgRound(c: Column, scale: Int = 4): Column =
    round(sum(dec2(c)).cast("double") / count(lit(1)), scale)
}
