package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity over two string columns as a native
  * Catalyst expression — the graded companion to the built-in
  * `levenshtein` in the fuzzy entity-resolution family
  * ([[graft.ops.JoinOps.fuzzyNamePairs]]): an edit DISTANCE needs a
  * length-relative threshold to mean anything, while Jaro–Winkler is
  * already a [0,1] similarity with the prefix weighting that name
  * matching wants (transposed middle characters penalized lightly,
  * divergent prefixes heavily).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (probed, not
  * assumed): either side empty → 0 (both-empty included); match window
  * = max(0, ⌊max(len)/2⌋-1); transpositions = half the out-of-order
  * matched positions; Winkler boost `jaro + ℓ·0.1·(1-jaro)` applied
  * only when jaro > 0.7, common prefix ℓ capped at 4. Operates on raw
  * UTF-8 BYTES exactly like DuckDB (byte-equal for ASCII name data;
  * multi-byte code points compare per byte on both engines, so the
  * oracle parity holds there too).
  *
  * Codegen emits a static call to [[JaroWinkler.sim]] — the same shape
  * as Spark's own `levenshtein` (`UTF8String.levenshteinDistance`):
  * the expression stays inside whole-stage codegen, no boxing, no
  * interpreter fallback; the two scratch bitmaps are the per-call cost
  * of the O(n·w) matching loop.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(JaroWinkler.sim(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry point shared by interpreted eval and generated code. */
  def sim(l: UTF8String, r: UTF8String): Double =
    simBytes(l.getBytes, r.getBytes)

  def simBytes(s: Array[Byte], t: Array[Byte]): Double = {
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (java.util.Arrays.equals(s, t)) return 1.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!tMatched(j) && s(i) == t(j)) {
          sMatched(i) = true; tMatched(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars compared in order of appearance
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s(i) != t(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < 4 && prefix < n && prefix < m && s(prefix) == t(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnShim.column(
      JaroWinklerSim(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Make `graft_jaro_winkler(a, b)` available to SQL in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => JaroWinklerSim(exprs(0), exprs(1)), "scala_udf")
}
