package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two `array<float>` (or, since r11,
  * `array<double>`) columns as a native Catalyst expression with
  * whole-stage codegen — the double form keeps bit-parity with oracle
  * computations that never leave fp64 (e.g. the TF-IDF dense path).
  *
  * Rationale (SURVEY.md §7 preference order (b)): the built-in
  * composition `aggregate(zip_with(a,b,*),0d,+) / (norms…)` allocates
  * two intermediate arrays per row and evaluates interpreted (
  * higher-order functions don't participate in codegen), and the norm
  * subexpressions are re-evaluated per reference. This expression is a
  * single allocation-free loop, fused into the surrounding generated
  * code — the hot path of brute-force and bucketed ANN scans.
  *
  * Accumulation is sequential in fp64, index order — bit-identical to
  * the left-fold of the HOF form and to the DuckDB oracle's
  * `list_sum(list_transform(...))`.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_cosine requires two arrays of float or two of double, " +
          s"got ($l, $r)")
    }

  /** Element accessor picked at PLAN time, not per row. */
  private def isDoubleInput: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  /** Always nullable: zero-norm inputs yield null even when both
    * children are non-nullable. Without this override the generated
    * code assigns `isNull = true` into a slot codegen may have
    * constant-folded to false — a compile failure that silently falls
    * back to the interpreted path. */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // null element → null result (the HOF composition's behavior);
      // getFloat on a null slot would read garbage
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (isDoubleInput) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (isDoubleInput) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      val hasNull = ctx.freshName("hasNull")
      val get = if (isDoubleInput) "getDouble" else "getFloat"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
         |  double x = (double) $a.$get($i);
         |  double y = (double) $b.$get($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($hasNull || $denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-API entry point. */
  def cosineFused(a: Column, b: Column): Column =
    ColumnShim.column(
      CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Make `graft_cosine(a, b)` available to SQL in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
}
