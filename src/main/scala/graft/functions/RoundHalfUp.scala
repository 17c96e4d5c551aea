package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `round(x, scale)` for DOUBLE, bit-identical to Spark's `Round`
  * (HALF_UP on the shortest round-trip decimal representation — what
  * `BigDecimal(Double.toString(x)).setScale(scale, HALF_UP)` computes)
  * but with a primitive fast path.
  *
  * Rationale: Spark's `Round` on DoubleType allocates
  * `Double.toString` + a `BigDecimal` parse + `setScale` + `toDouble`
  * PER VALUE (~hundreds of ns) — invisible in a final projection of an
  * aggregated frame, but the engine's determinism convention pins
  * similarity scores with `round(x, 4)` INSIDE O(n²) pair loops
  * ([[graft.ops.VectorOps.knnAllBrute]] and the whole brute/audit
  * family), where it dominates the per-pair cost next to the fused dot
  * product.
  *
  * Fast path: one multiply by the exact power of ten, `floor`, and a
  * half-comparison — valid because IEEE multiply/divide are correctly
  * rounded and the scaled magnitude stays far from 2⁵³. The half-
  * comparison decides HALF_UP against the EXACT decimal of x only when
  * the scaled fraction is well clear of 0.5; inside a ~1e-14-relative
  * guard band (or above 4e15, or non-finite) it falls back to the
  * exact BigDecimal sequence — literally Spark's own — so the two
  * paths can never disagree. Division `m / 10^scale` with integer m
  * and an exactly-representable power (scale ≤ 15) is correctly
  * rounded, i.e. the same nearest-double `BigDecimal.toDouble`
  * returns. Spec-gated by RoundHalfUpSpec against Spark's `round` on
  * adversarial boundary values.
  *
  * Scale must be a foldable literal in [0, 15] (every caller pins 2-10
  * dp). Non-finite x passes through unchanged, exactly like `Round`.
  */
case class RoundHalfUp(child: Expression, scale: Int)
    extends UnaryExpression {

  require(scale >= 0 && scale <= 15,
    s"graft_round scale must be in [0, 15]: $scale")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_round requires a double column, got $t")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_round"

  override def nullSafeEval(x: Any): Any =
    java.lang.Double.valueOf(
      RoundHalfUp.roundD(x.asInstanceOf[Double], scale))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.RoundHalfUp.roundD($x, $scale)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object RoundHalfUp {

  private val pow10: Array[Double] =
    (0 to 15).map(i => math.pow(10.0, i)).toArray

  /** The static kernel both eval paths call — one body, so interpreted
    * and generated code cannot diverge. */
  def roundD(x: Double, scale: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val s = pow10(scale)
    val t = Math.abs(x) * s
    if (t < 4.0e15) {
      val fl = Math.floor(t)
      val f = t - fl
      // guard band: |t - s·decimal(x)| ≤ t·~2.5e-16 (one correctly-
      // rounded multiply + the shortest-repr gap), so outside a
      // 1e-14-relative margin the half-comparison is provably the same
      // as on the exact decimal; inside it, fall through to BigDecimal
      if (Math.abs(f - 0.5) > t * 1e-14 + 1e-14) {
        val m = if (f > 0.5) fl + 1.0 else fl
        if (m == 0.0) return 0.0 // BigDecimal has no -0
        val r = m / s
        return if (x < 0.0) -r else r
      }
    }
    // exact path — the literal Spark Round sequence for DoubleType
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Column-API entry point. */
  def roundFused(c: Column, scale: Int): Column =
    ColumnShim.column(RoundHalfUp(ColumnShim.expression(c), scale))
}
