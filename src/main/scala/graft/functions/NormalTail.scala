package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Upper-tail standard-normal probability P(Z > x) as a native
  * Catalyst expression — the p-value primitive every z-statistic
  * query here ends on ([[graft.ops.EventOps.bhFdrTypePairs]] is the
  * first caller; the Mann–Whitney / Welch / CUPED / DiD z columns are
  * all one `graft_normal_tail(abs(z)) * 2` away from a p-value).
  * Spark ships no erf/Φ in `sql.functions`, so without this the
  * polynomial had to be spelled inline per query — one definition,
  * codegen'd, beats six hand-copied chains drifting apart.
  *
  * Semantics: Abramowitz–Stegun 26.2.17 (|ε| < 7.5e-8, the standard
  * five-term Hastings polynomial) for x ≥ 0:
  *
  *   P(Z > x) = φ(x)·(b₁k + b₂k² + b₃k³ + b₄k⁴ + b₅k⁵),
  *   k = 1/(1 + 0.2316419·x)
  *
  * with φ(x) = exp(−x²/2)/√(2π) (the √(2π) literal pinned to
  * 2.5066282746310002); x < 0 via symmetry 1 − P(Z > −x). The
  * multiplication ORDER is part of the contract — a DuckDB oracle
  * spelling the identical chain (pdf parenthesized, then ×poly)
  * reproduces it bit-for-bit, which is what lets p-values sit under
  * the strict hash gate. NaN in → NaN out (IEEE propagation).
  *
  * Codegen emits a static call to [[NormalTail.tail]] — stays inside
  * whole-stage codegen like the built-ins, no boxing.
  */
case class NormalTailExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_normal_tail requires double, got $t")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_normal_tail"

  override def nullSafeEval(x: Any): Any =
    java.lang.Double.valueOf(NormalTail.tail(x.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.NormalTail.tail($x)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NormalTail {

  /** Static entry point shared by interpreted eval and generated code.
    * The chain is ((pdf) * (poly)) — pinned, see the class doc. */
  def tail(x: Double): Double = {
    if (java.lang.Double.isNaN(x)) return x
    if (x < 0.0) return 1.0 - tail(-x)
    val k = 1.0 / (1.0 + 0.2316419 * x)
    val poly = k * (0.319381530 + k * (-0.356563782 + k * (1.781477937 +
      k * (-1.821255978 + k * 1.330274429))))
    (math.exp(-(x * x) / 2.0) / 2.5066282746310002) * poly
  }

  /** Column-API entry point. */
  def normalTail(x: Column): Column =
    ColumnShim.column(NormalTailExpr(ColumnShim.expression(x)))

  /** Make `graft_normal_tail(x)` available to SQL in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normal_tail",
      exprs => NormalTailExpr(exprs(0)), "scala_udf")
}
