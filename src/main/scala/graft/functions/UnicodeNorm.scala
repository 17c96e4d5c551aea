package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression — the canonicalization step a text pipeline runs BEFORE
  * hashing, exact dedup, or tokenization, so that `é` (U+00E9) and
  * `e`+combining-acute (U+0065 U+0301) collapse to one representation.
  * Spark has no built-in for this (SPARK-35126 territory); the usual
  * workaround is a Scala UDF, which breaks whole-stage codegen and
  * adds per-row encoder traffic. This expression stays inside the
  * generated plan: the `form` is validated at build time and inlined
  * into the generated call as a constant.
  *
  * Parity: `java.text.Normalizer` implements the same Unicode
  * normalization algorithm (UAX #15) as DuckDB's `nfc_normalize` —
  * the oracle for the NFC path. The fast path matters: NFC-normalized
  * ASCII is returned as-is by the JDK without allocation, so the
  * common case costs one `isNormalized` scan.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val normalForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize requires a string column, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], normalForm)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val formRef =
      s"java.text.Normalizer.Form.${normalForm.name()}"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalize.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {

  /** Shared by interpreted eval and generated code. The isNormalized
    * pre-check makes already-normal text (all ASCII, most web text)
    * a zero-allocation pass-through. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  private def build(e: Expression, form: String): UnicodeNormalize = {
    require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"graft_normalize: form must be NFC|NFD|NFKC|NFKD, got $form")
    UnicodeNormalize(e, form)
  }

  /** Column API: `UnicodeNorm.nfc(col("text"))` etc. */
  def nfc(c: Column): Column = ColumnShim.column(
    build(ColumnShim.expression(c), "NFC"))
  def form(c: Column, f: String): Column = ColumnShim.column(
    build(ColumnShim.expression(c), f))

  /** Ad-hoc per-session SQL registration (the [[GraftExtensions]]
    * path is the production wiring). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize", buildSql, "scala_udf")

  /** SQL builder for [[GraftExtensions]]: graft_normalize(text[, form])
    * with form a foldable string literal, default NFC. */
  private[functions] def buildSql(exprs: Seq[Expression]): Expression = {
    val usage = "graft_normalize(text[, 'NFC'|'NFD'|'NFKC'|'NFKD'])"
    if (exprs.isEmpty || exprs.length > 2)
      throw new IllegalArgumentException(
        s"graft_normalize expects 1 or 2 arguments but got " +
          s"${exprs.length}; usage: $usage")
    val form = if (exprs.length == 1) "NFC" else {
      val e = exprs(1)
      if (e.dataType != StringType || !e.foldable)
        throw new IllegalArgumentException(
          s"$usage: form must be a constant string, got $e")
      e.eval() match {
        case s: UTF8String => s.toString.toUpperCase
        case bad => throw new IllegalArgumentException(
          s"$usage: form must be a constant string, got $bad")
      }
    }
    build(exprs(0), form)
  }
}
