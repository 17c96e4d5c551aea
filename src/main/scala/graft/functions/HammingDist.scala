package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused Hamming distance over two packed-code `array<bigint>` columns
  * — Σ_w bit_count(a_w XOR b_w) as one native codegen'd loop.
  *
  * Rationale (the [[CosineSim]]/[[DotProduct]] precedent): the
  * higher-order composition `aggregate(zip_with(a, b, (x, y) ->
  * bit_count(x ^ y)), 0, (acc, v) -> acc + v)` is a CodegenFallback —
  * every evaluation allocates the zipped intermediate array and walks
  * an interpreted expression tree. That is invisible per row but IS
  * the per-pair hot loop of every brute Hamming scan
  * ([[graft.ops.VectorOps.knnHamming]], the banded-parity audit's
  * all-pairs baseline), where it runs O(n²) times per query.
  *
  * Semantics are bit-identical to the HOF form (spec-gated by
  * HammingDistSpec against [[graft.ops.VectorOps.hammingDistHof]]):
  * length mismatch → null (zip_with pads the shorter side with nulls,
  * and a null term nulls the fold), null element → null, result is the
  * INT sum of per-word popcounts exactly like `bit_count`.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hamming requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  /** Always nullable: a length mismatch or null ELEMENT yields null
    * even when both child columns are non-nullable (the [[DotProduct]]
    * constant-fold trap). */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |int $acc = 0;
         |boolean $bad = $n != $b.numElements();
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  /** Column-API entry point. */
  def hammingFused(a: Column, b: Column): Column =
    ColumnShim.column(
      HammingDist(ColumnShim.expression(a), ColumnShim.expression(b)))
}
