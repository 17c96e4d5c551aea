package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Exact mergeable distinct-count via dense BITMAPS — the engine's
  * native `TypedImperativeAggregate` pair, the EXACT member of the
  * mergeable-sketch family beside the approximate HLL
  * ([[graft.ops.EventOps.hllUnionRollupAudit]]) and Theta
  * ([[graft.ops.EventOps.thetaOverlapAudit]]) rollups: the
  * `bitmap_union` pattern every OLAP warehouse ships (Doris,
  * ClickHouse `groupBitmap`, Druid) for pre-aggregated exact
  * distincts.
  *
  * Why a custom aggregate and not `count(DISTINCT)`: exact distinct
  * forces an Expand + re-shuffle of every raw row per grouping, and —
  * decisively — its partials are NOT mergeable, so day-grain results
  * can never roll up to weeks without a raw rescan. A bitmap IS the
  * mergeable partial: fine-grain groups aggregate raw ids once into
  * fixed-size blobs, and any coarser rollup (week, month, arbitrary
  * segment union) is a blob-OR — never touching raw data again, the
  * same store-once-merge-forever architecture as the sketch columns
  * but with zero error.
  *
  * Scope contract (asserted, not assumed): ids must be integers in
  * `[0, maxId)` — the dense-bitmap premise, right when the id space is
  * dictionary-encoded or naturally compact (user ids here). An
  * out-of-range id means that premise is FALSE, so update throws with
  * the observed id rather than silently corrupting counts; sparse or
  * unbounded domains belong to the HLL/Theta paths (or a compressed
  * roaring bitmap, the same algebra over run-length blocks). Memory is
  * maxId/8 bytes per group buffer — 2²¹ ids = 256 KiB; Spark plans
  * typed-imperative aggregates through ObjectHashAggregate with a
  * sort-based fallback when group count × buffer exceeds the operator
  * budget, so sizing stays an executor-memory knob, not a correctness
  * risk.
  *
  * [[BitmapBuild]] aggregates raw ids → blob (the stored partial);
  * [[BitmapCardinality]] OR-merges blobs → exact count. Both are
  * order-insensitive and associative (bitwise OR), hence hash-gatable
  * against plain `count(DISTINCT)` — unlike every seed-bound sketch.
  */
abstract class BitmapAggBase extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  def maxId: Int
  protected final def words: Int = (maxId + 63) >>> 6

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b(i) |= o(i); i += 1 }
    b
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length >>> 3)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def nullable: Boolean = false
}

/** Aggregate integral ids into a dense bitmap blob (`binary`). */
case class BitmapBuild(child: Expression, maxId: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends BitmapAggBase {

  require(maxId > 0 && maxId <= (1 << 28),
    s"graft_bitmap_build: maxId must be in (0, 2^28], got $maxId " +
      "(2^28 bits = 32 MiB per group buffer is already past the dense-" +
      "bitmap comfort zone; larger id spaces want roaring or HLL)")

  override def prettyName: String = "graft_bitmap_build"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_bitmap_build requires a BIGINT id, got ${child.dataType} " +
          "(cast explicitly — the id domain contract is the caller's)")

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0 || id >= maxId) throw new IllegalStateException(
        s"graft_bitmap_build(maxId=$maxId): id $id out of range — the " +
          "dense-bitmap premise (compact id domain) is false for this " +
          "column; raise maxId or use the HLL/Theta sketch path")
      b((id >>> 6).toInt) |= 1L << (id & 63)
    }
    b
  }

  override def eval(b: Array[Long]): Any = serialize(b)

  override def withNewMutableAggBufferOffset(o: Int): BitmapBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapBuild =
    copy(child = c)
}

/** OR-merge bitmap blobs, return the exact cardinality (`bigint`). */
case class BitmapCardinality(child: Expression, maxId: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends BitmapAggBase {

  override def prettyName: String = "graft_bitmap_cardinality"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        "graft_bitmap_cardinality requires a BINARY bitmap blob, got " +
          s"${child.dataType}")

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val blob = v.asInstanceOf[Array[Byte]]
      if (blob.length != words * 8) throw new IllegalStateException(
        s"graft_bitmap_cardinality(maxId=$maxId): blob of ${blob.length} " +
          s"bytes, expected ${words * 8} — build and merge must agree on " +
          "maxId (blobs from a different id-space are not mergeable)")
      merge(b, deserialize(blob))
    }
    b
  }

  override def eval(b: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapCardinality =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapCardinality =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapCardinality =
    copy(child = c)
}

object BitmapAgg {
  /** `Column` builders for the DataFrame API. The integral-id cast is
    * applied here (widening only — the range guard lives in update). */
  def bitmapBuild(ids: Column, maxId: Int): Column =
    ColumnShim.column(
      BitmapBuild(Cast(ColumnShim.expression(ids), LongType), maxId)
        .toAggregateExpression())

  def bitmapCardinality(blobs: Column, maxId: Int): Column =
    ColumnShim.column(
      BitmapCardinality(ColumnShim.expression(blobs), maxId)
        .toAggregateExpression())
}
