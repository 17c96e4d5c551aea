package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused fp64 dot product over two `array<float>` columns — the
  * [[CosineSim]] loop without the two norm accumulators.
  *
  * Why it exists: an all-pairs cosine scan ([[graft.ops.VectorOps
  * .knnAllBrute]]) evaluates O(n²) pairs, but each vector's norm is a
  * per-ROW quantity — recomputing both norms inside every pair (what
  * `graft_cosine` does, correctly, for one-shot scoring) spends 3× the
  * flops of the dot alone. Precompute `sqrt(graft_dot(v, v))` once per
  * row, then score pairs as `graft_dot(a, b) / (na * nb)`: the dot and
  * the norms accumulate in the same fp64 index order as the fused
  * cosine, and the final `dot / (sqrt · sqrt)` is the same operation
  * sequence — bit-identical results, one third the pair-loop work.
  *
  * Accumulation is sequential fp64 in index order, matching the HOF
  * left-fold and the DuckDB oracle's `list_sum(list_transform(...))`.
  * Null element → null (the HOF composition's behavior); empty arrays
  * dot to 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  /** Always nullable: a null ELEMENT yields null even when both child
    * columns are non-nullable (same constant-fold trap the CosineSim
    * scaladoc documents). */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if ($hasNull) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point. */
  def dotFused(a: Column, b: Column): Column =
    ColumnShim.column(
      DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** `sqrt(dot(v, v))` — the per-row norm that pairs with [[dotFused]]
    * scoring; accumulates exactly like CosineSim's norm terms. */
  def normFused(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotFused(v, v))
}
