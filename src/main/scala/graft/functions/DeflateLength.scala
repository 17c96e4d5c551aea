package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string column — the primitive
  * behind the compression-ratio quality signal (RedPajama-v2 family:
  * highly repetitive/templated text compresses far below prose;
  * near-random noise compresses above 1.0 with header overhead).
  *
  * Uses the JVM's zlib (`java.util.zip.Deflater`, fixed level 6,
  * zlib-wrapped) — deterministic for a given input on a given JDK, so
  * per-corpus aggregates are stable run to run. NOT SQL-derivable
  * (DuckDB exposes no deflate), so the per-doc signal is rows-only at
  * the driver and the paired `compression_audit` query gates the
  * SQL-expressible invariants instead.
  *
  * Codegen: a static-method call inside whole-stage codegen (no
  * CodegenFallback); the compressor allocates one scratch buffer per
  * call — fine for a once-per-document signal, and the call sites are
  * quality scans, not per-pair loops.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"graft_deflate_len requires string, got $t")
    }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(s: Any): Any =
    DeflateLength.deflatedLen(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateLength.deflatedLen($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLength {

  /** zlib-wrapped DEFLATE at level 6; returns the compressed length. */
  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column-API entry point. */
  def deflateLen(c: Column): Column =
    ColumnShim.column(DeflateLength(ColumnShim.expression(c)))
}
