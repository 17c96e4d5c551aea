package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing (Schleimer et al. '03) over a normalized text
  * column: mod-reduced Rabin-Karp k-gram hashes + rightmost-minimum
  * selection per w-window, emitted as `array<struct<pos, fp>>` of the
  * document's DISTINCT fingerprints in position order.
  *
  * Bit-identical to the relational formulation
  * ([[graft.ops.DocOps.winnowedFingerprintsRelational]]: posexplode →
  * k lead() terms → min(struct) window) and to the DuckDB oracle — all
  * three compute the same integer residues. The fused form does the
  * whole document in ONE pass inside the scan stage: no char-row
  * explode (k+? rows per char), no doc_id shuffle, no two window
  * sorts. Input contract: the text must already be normalized (the
  * public API normalizes with the shared expression before calling).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"need k >= 2, w >= 1: k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires string, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_winnow"

  private val M = 2147483647L
  private val coeffs: Array[Long] =
    (0 until k).map(j => graft.ops.DocOps.polyPow(k - 1 - j)).toArray

  /** The fused kernel — also the codegen target. O(n): the k-gram
    * hash ROLLS (subtract the outgoing char's `B^(k-1)` term, multiply
    * by B, add the incoming char — all mod M, identical residues to
    * the direct sum), and the rightmost-minimum per w-window comes
    * from a monotonic deque instead of a per-window rescan. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var h = 0L
    var j = 0
    while (j < k) { h += s.charAt(j).toLong * coeffs(j); j += 1 }
    h %= M
    hashes(0) = h
    val topCoeff = coeffs(0) // B^(k-1) mod M
    var i = 1
    while (i < nh) {
      var d = (h - s.charAt(i - 1).toLong * topCoeff % M) % M
      if (d < 0) d += M
      h = (d * 257L + s.charAt(i + k - 1).toLong) % M // d*B+c < 2^40
      hashes(i) = h
      i += 1
    }
    // Monotonic deque of indices with strictly increasing hashes; the
    // `>=` pop keeps the RIGHTMOST of equal minima (the same tie-break
    // as the rescan form), so the front is the window's selection. A
    // pos can only be re-selected by consecutive windows, so dedupe
    // against the last emitted.
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0 // live slice is dq[head until tail]
    var lastPos = -1
    var t = 0
    while (t < nh) {
      while (tail > head && hashes(dq(tail - 1)) >= hashes(t)) tail -= 1
      dq(tail) = t
      tail += 1
      while (dq(head) < t - w + 1) head += 1
      if (t >= w - 1) {
        val best = dq(head)
        if (best != lastPos) {
          out += InternalRow(best.toLong, hashes(best))
          lastPos = best
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    defineCodeGen(ctx, ev, a => s"$self.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Column-API entry point (input must be normalized text). */
  def winnowFused(t: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowFingerprints(ColumnShim.expression(t), k, w))
}
