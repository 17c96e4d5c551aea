package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Partial squared-L2 of product-quantization block `b` between two
  * `array<float>` vectors as a native Catalyst expression — the hot
  * loop of PQ encode and ADC table construction
  * ([[graft.ops.VectorOps.pqEncode]]/`knnPqPinned`): encode evaluates
  * it n·|codes|·m times per corpus pass, and the HOF composition
  * (`aggregate(transform(sequence(...)))`) costs ~2 µs/eval in the
  * interpreter against ~60 ns for this fused loop (the measured
  * `graft_cosine` precedent — 9th native expression, same rationale:
  * higher-order functions don't participate in whole-stage codegen
  * and allocate per row).
  *
  * Block semantics are pinned to [[graft.ops.VectorOps.pqBlockDist]]
  * and its DuckDB mirror: blocks are contiguous ranges of ⌊d/m⌋
  * positions, the LAST block absorbing the d mod m remainder; the
  * accumulation is sequential fp64 in index order, so results are
  * bit-identical to both the HOF form and the SQL
  * `list_sum(list_transform(...))`. Null element → null result;
  * block/m are evaluated per row (non-foldable callers allowed) with
  * m ≥ 1 and 0 ≤ b < m required at eval.
  */
case class PqBlockL2(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _),
          IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      // the residual-PQ path: residuals are fp64 arrays (the CosineSim
      // dual-type precedent)
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
          IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "graft_pq_block_l2 requires two arrays of float or two of " +
          s"double plus (int, int), got ($a, $b, $c, $d)")
    }

  /** Element accessor picked at PLAN time, not per row. */
  private def isDoubleInput: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  /** Null elements inside a block yield null even when the children
    * are non-nullable (the graft_cosine lesson — see its comment). */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_block_l2"

  override def nullSafeEval(a: Any, c: Any, bAny: Any, mAny: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val cv = c.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[Int]
    val m = mAny.asInstanceOf[Int]
    if (isDoubleInput) PqBlockL2.evalBlockDouble(e, cv, b, m)
    else PqBlockL2.evalBlock(e, cv, b, m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, c, b, m) => {
      val res = ctx.freshName("res")
      val method = if (isDoubleInput) "evalBlockDouble" else "evalBlock"
      s"""
         |Double $res = graft.functions.PqBlockL2.$method($e, $c, $b, $m);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object PqBlockL2 {

  /** Static entry point shared by interpreted eval and generated code.
    * Returns a boxed Double (null on a null element) so both paths
    * share one loop. */
  def evalBlock(e: ArrayData, c: ArrayData, b: Int,
      m: Int): java.lang.Double = {
    require(m >= 1 && b >= 0 && b < m,
      s"graft_pq_block_l2: block $b out of range for m=$m")
    // block bounds derive from the FIRST array's length ALONE — the
    // pinned HOF reference (pqBlockDist) and the DuckDB mirror both
    // do, and a min() here would silently truncate length-mismatched
    // inputs where those rails yield null (ADVICE r14: bit-parity
    // means agreeing on the degenerate case too) — so mismatches
    // return null, exactly like element_at past the short array
    if (e.numElements() != c.numElements()) return null
    val len = e.numElements()
    val sub = len / m
    val start = b * sub
    val end = if (b == m - 1) len else start + sub
    var acc = 0.0
    var i = start
    while (i < end) {
      if (e.isNullAt(i) || c.isNullAt(i)) return null
      val d = e.getFloat(i).toDouble - c.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** fp64-array twin of [[evalBlock]] — same loop, getDouble. */
  def evalBlockDouble(e: ArrayData, c: ArrayData, b: Int,
      m: Int): java.lang.Double = {
    require(m >= 1 && b >= 0 && b < m,
      s"graft_pq_block_l2: block $b out of range for m=$m")
    // first array's length alone + null on mismatch — see [[evalBlock]]
    if (e.numElements() != c.numElements()) return null
    val len = e.numElements()
    val sub = len / m
    val start = b * sub
    val end = if (b == m - 1) len else start + sub
    var acc = 0.0
    var i = start
    while (i < end) {
      if (e.isNullAt(i) || c.isNullAt(i)) return null
      val d = e.getDouble(i) - c.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-API entry point. */
  def pqBlockL2(e: Column, c: Column, b: Column, m: Column): Column =
    ColumnShim.column(PqBlockL2(ColumnShim.expression(e),
      ColumnShim.expression(c), ColumnShim.expression(b),
      ColumnShim.expression(m)))

  /** Make `graft_pq_block_l2(e, c, b, m)` available to SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_block_l2",
      exprs => PqBlockL2(exprs(0), exprs(1), exprs(2), exprs(3)),
      "scala_udf")
}
