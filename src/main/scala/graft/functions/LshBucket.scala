package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused sign-LSH bucket code over an `array<float>` column as a native
  * expression: `planes` random-hyperplane sign bits packed into a long
  * (Charikar '02), bit-identical to the HOF composition it replaces
  * ([[graft.ops.VectorOps.lshBucketHof]]).
  *
  * Why native (SURVEY.md §7 preference (b)): the HOF form evaluates
  * one interpreted `aggregate(zip_with(...))` fold PER PLANE — p
  * lambda invocations per element per row, plus an xxhash64 per
  * (plane, element) — and higher-order functions knock the whole
  * projection out of whole-stage codegen. This expression is one fused
  * loop per row over a PRECOMPUTED ±1 hyperplane table (the signs
  * depend only on (plane, dimension), so each executor materializes
  * them once per dimensionality, not once per row), and it stays
  * inside the generated stage.
  *
  * Parity contract: sign(p, j) = +1 iff `pmod(xxhash64(p*4099 + j,
  * seed=42), 2) = 0` — exactly the HOF's hyperplane derivation — and
  * each plane's projection accumulates in ascending element order, so
  * the fold is the same IEEE addition sequence.
  */
case class LshBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 62, s"planes must be in [1, 62]: $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket requires array<float>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_lsh_bucket"

  // One immutable (dim, signs) pair per expression instance; the
  // generated code shares the instance across tasks, so the cache is a
  // single volatile reference swapped atomically (a benign write race
  // recomputes the same table).
  @transient @volatile private var cached: (Int, Array[Double]) = null

  private def signsFor(n: Int): Array[Double] = {
    val c = cached
    if (c != null && c._1 == n) c._2
    else {
      val s = LshBucket.buildSigns(planes, n)
      cached = (n, s)
      s
    }
  }

  /** The fused kernel — also the codegen target (called through a
    * reference to this instance, staying inside the generated stage).
    *
    * Degenerate inputs match the HOF exactly, keeping the bit-parity
    * contract unconditional: an empty array folds to bucket 0 (the
    * HOF's null projection falls through `when(...).otherwise(0)` on
    * every plane), and a null element nulls every plane's fold the
    * same way — also bucket 0. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val signs = signsFor(n)
    val proj = new Array[Double](planes)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return 0L
      val x = arr.getFloat(j).toDouble
      val base = j * planes
      var p = 0
      while (p < planes) {
        proj(p) += x * signs(base + p)
        p += 1
      }
      j += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      if (proj(p) >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshBucket", this, classOf[LshBucket].getName)
    defineCodeGen(ctx, ev, a => s"$self.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucket {
  /** ±1 hyperplane table, element-major (`[j][p]` flattened) so the
    * per-element inner loop over planes is a unit-stride scan. Derived
    * from xxhash64(p*4099 + j, seed 42) like the HOF composition —
    * deterministic on every executor with no broadcast of random
    * state. */
  private[functions] def buildSigns(planes: Int, n: Int): Array[Double] = {
    val out = new Array[Double](planes * n)
    var j = 0
    while (j < n) {
      var p = 0
      while (p < planes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(p.toLong * 4099L + j.toLong, 42L)
        out(j * planes + p) = if ((h & 1L) == 0L) 1.0 else -1.0
        p += 1
      }
      j += 1
    }
    out
  }

  /** Column-API entry point. */
  def lshBucketFused(v: Column, planes: Int): Column =
    ColumnShim.column(LshBucket(ColumnShim.expression(v), planes))

  /** Make `graft_lsh_bucket(v, planes)` available to SQL in this
    * session (ad-hoc alternative to `GraftExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_bucket", GraftExtensions.buildLshBucket, "scala_udf")
}
