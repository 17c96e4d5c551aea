package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Mergeable QUANTILE sketch — the one sketch family the blob-store
  * suite (HLL distincts, Theta algebra, exact bitmaps, Misra–Gries
  * heavy hitters, integer-bin histograms) was still missing: a
  * KLL/MRL-style compactor sketch (Karnin–Lang–Liberty FOCS '16;
  * Manku–Rajagopalan–Lindsay SIGMOD '98) over DOUBLE values, for the
  * unbounded/continuous domains the exact integer-bin histogram blobs
  * ([[graft.streaming.StreamJob.histogramDelta]]) cannot carry.
  *
  * Structure: geometric levels of at most `k` values each; level `l`
  * items carry weight 2^l. Inserts land in level 0; a full level
  * SORTS, keeps every other item at doubled weight (alternating
  * offset — DETERMINISTIC, not the KLL coin flip: reproducibility for
  * a fixed merge order is worth more here than the √-cancellation of
  * random parity), and promotes the survivors one level up. Merging
  * concatenates level-wise then re-compacts — associative in
  * distribution, which is exactly what lets per-batch blobs answer
  * any-grain quantiles forever without a raw rescan.
  *
  * ERROR CONTRACT (the part the audit gates): compacting 2s items of
  * weight w displaces the estimated rank of ANY query value by at
  * most w, so the sketch carries `errBound` = Σ 2^level over every
  * compaction it (or anything merged into it) ever performed — a
  * WORST-CASE bound valid for every insertion/merge order, not a
  * probabilistic one. `kll_rank_bound_audit` replays the guarantee
  * against exact ranks: for each probe quantile the estimate's true
  * rank interval must meet [⌈qn⌉ − errBound − 1, ⌈qn⌉ + errBound + 1]
  * (the ±1 absorbs the ⌈⌉/tie conventions) — 0 violations is a
  * THEOREM, so the audit row is constant across partition layouts
  * even though the estimates themselves are merge-order-bound (the
  * reason the value-emitting query is rows-gated, the MG/SimHash
  * precedent).
  *
  * Determinism note: like every compactor sketch, the OUTPUT values
  * depend on merge order (Spark partition layout); unlike the
  * seed-bound sketches nothing here uses RNG — same order, same
  * sketch, bit for bit. NaN inputs are skipped like NULLs (a NaN
  * poisons rank order; stated, the SQL-aggregate convention).
  *
  * Memory: k doubles per level, ~log2(n/k) levels — k=200 at n=10⁹ is
  * ~23 levels ≈ 37 KiB per group buffer, the ObjectHashAggregate
  * budget class the bitmap aggregate already documents.
  */
object KllSketch {

  /** Mutable sketch state (the aggregation buffer). */
  final class State(val k: Int) {
    require(k >= 8, s"graft_kll: k must be >= 8, got $k")
    var n: Long = 0L
    var errBound: Long = 0L
    var parity: Int = 0
    val levels = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Double])

    def update(x: Double): Unit = if (!x.isNaN) {
      levels(0) += x
      n += 1L
      compactFrom(0)
    }

    def merge(o: State): Unit = {
      require(o.k == k,
        s"graft_kll: merging sketches of different k ($k vs ${o.k}) — " +
          "blobs from a different accuracy class are not mergeable")
      while (levels.length < o.levels.length)
        levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      var l = 0
      while (l < o.levels.length) {
        levels(l) ++= o.levels(l)
        l += 1
      }
      n += o.n
      errBound += o.errBound
      compactFrom(0)
    }

    /** Compact every over-full level bottom-up. A compaction keeps
      * alternate items of the sorted low 2s prefix at doubled weight
      * (odd remainder stays), adds 2^l to the worst-case rank bound,
      * and flips the offset parity. */
    private def compactFrom(start: Int): Unit = {
      var l = start
      while (l < levels.length) {
        if (levels(l).length >= k) {
          val buf = levels(l).toArray
          java.util.Arrays.sort(buf)
          val s = buf.length / 2
          if (levels.length == l + 1)
            levels += scala.collection.mutable.ArrayBuffer.empty[Double]
          val up = levels(l + 1)
          var i = parity
          while (i < 2 * s) {
            up += buf(i)
            i += 2
          }
          val rem = scala.collection.mutable.ArrayBuffer.empty[Double]
          var j = 2 * s
          while (j < buf.length) {
            rem += buf(j)
            j += 1
          }
          levels(l) = rem
          errBound += 1L << l
          parity ^= 1
        }
        l += 1
      }
    }

    /** All (value, weight) pairs, value-sorted — the estimation view. */
    def weighted(): Array[(Double, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var l = 0
      while (l < levels.length) {
        val w = 1L << l
        levels(l).foreach(v => out += ((v, w)))
        l += 1
      }
      out.sortBy(_._1).toArray
    }

    /** Smallest sketch value whose cumulative weight reaches ⌈q·n⌉
      * (clamped to [1, n]); null contract handled by callers (n=0). */
    def quantile(q: Double): Double = {
      val items = weighted()
      val target = math.min(n, math.max(1L, math.ceil(q * n).toLong))
      var cum = 0L
      var i = 0
      while (i < items.length) {
        cum += items(i)._2
        if (cum >= target) return items(i)._1
        i += 1
      }
      items.last._1
    }

    def serialize(): Array[Byte] = {
      val size = 4 + 8 + 8 + 4 + 4 + levels.map(4 + 8 * _.length).sum
      val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(k).putLong(n).putLong(errBound).putInt(parity)
        .putInt(levels.length)
      levels.foreach { lv =>
        bb.putInt(lv.length)
        lv.foreach(bb.putDouble)
      }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val st = new State(bb.getInt)
    st.n = bb.getLong
    st.errBound = bb.getLong
    st.parity = bb.getInt
    val nl = bb.getInt
    st.levels.clear()
    var l = 0
    while (l < nl) {
      val len = bb.getInt
      val lv = new scala.collection.mutable.ArrayBuffer[Double](len)
      var i = 0
      while (i < len) {
        lv += bb.getDouble
        i += 1
      }
      st.levels += lv
      l += 1
    }
    st
  }

  // static entry points for codegen'd scalar accessors
  def quantileFromBlob(bytes: Array[Byte], q: Double): java.lang.Double = {
    val st = deserialize(bytes)
    if (st.n == 0L) null else java.lang.Double.valueOf(st.quantile(q))
  }
  def nFromBlob(bytes: Array[Byte]): Long = deserialize(bytes).n
  def errBoundFromBlob(bytes: Array[Byte]): Long =
    deserialize(bytes).errBound

  /** Column builders (the BitmapAgg convention: widening cast here,
    * contracts enforced in update). */
  def kllBuild(values: Column, k: Int): Column =
    ColumnShim.column(
      KllBuild(Cast(ColumnShim.expression(values), DoubleType), k)
        .toAggregateExpression())
  def kllMerge(blobs: Column, k: Int): Column =
    ColumnShim.column(
      KllMerge(ColumnShim.expression(blobs), k).toAggregateExpression())
  def kllQuantile(blob: Column, q: Column): Column =
    ColumnShim.column(KllQuantile(ColumnShim.expression(blob),
      ColumnShim.expression(q)))
  def kllN(blob: Column): Column =
    ColumnShim.column(KllN(ColumnShim.expression(blob)))
  def kllErrBound(blob: Column): Column =
    ColumnShim.column(KllErrBound(ColumnShim.expression(blob)))
}

abstract class KllAggBase extends TypedImperativeAggregate[KllSketch.State]
    with UnaryLike[Expression] {
  def k: Int
  override def createAggregationBuffer(): KllSketch.State =
    new KllSketch.State(k)
  override def merge(b: KllSketch.State,
      o: KllSketch.State): KllSketch.State = { b.merge(o); b }
  override def serialize(b: KllSketch.State): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch.State =
    KllSketch.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def eval(b: KllSketch.State): Any = b.serialize()
}

/** Aggregate raw DOUBLE values into a KLL sketch blob (`binary`). */
case class KllBuild(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase {
  override def prettyName: String = "graft_kll_build"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_build requires DOUBLE, got ${child.dataType} " +
        "(cast explicitly)")
  override def update(b: KllSketch.State,
      input: InternalRow): KllSketch.State = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): KllBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllBuild =
    copy(child = c)
}

/** Merge stored KLL blobs into one blob — the rollup face: any
  * regrouping of per-batch/per-day blobs re-merges losslessly w.r.t.
  * the error contract (bounds ADD, they are not recomputed). */
case class KllMerge(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase {
  override def prettyName: String = "graft_kll_merge"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge requires a BINARY kll blob, got ${child.dataType}")
  override def update(b: KllSketch.State,
      input: InternalRow): KllSketch.State = {
    val v = child.eval(input)
    if (v != null) b.merge(KllSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): KllMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMerge =
    copy(child = c)
}

/** Scalar: quantile estimate from a KLL blob (NULL on an empty
  * sketch). Once-per-group on merged blobs — not a hot loop; codegen
  * is a static call (the DeflateLength convention). */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_kll_quantile requires (BINARY blob, DOUBLE q), got " +
        s"(${left.dataType}, ${right.dataType})")
  override def nullSafeEval(blob: Any, q: Any): Any =
    KllSketch.quantileFromBlob(blob.asInstanceOf[Array[Byte]],
      q.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, q) => {
      // freshName: a fixed local name collides when the expression
      // appears more than once in one codegen function (p50/p90/p99
      // off the same blob) — janino "Redefinition of local variable"
      // failed the WHOLE stage into interpreted mode
      val r = ctx.freshName("kllq")
      s"""java.lang.Double $r = graft.functions.KllSketch.quantileFromBlob($b, $q);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Scalar: item count carried by a KLL blob (compaction preserves
  * total weight, so this is the exact inserted-row count). */
case class KllN(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_kll_n"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_n requires a BINARY kll blob, got ${child.dataType}")
  override def nullSafeEval(blob: Any): Any =
    KllSketch.nFromBlob(blob.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.KllSketch.nFromBlob($b)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Scalar: the blob's accumulated worst-case rank-error bound (see
  * the object doc's error contract — valid for every merge order). */
case class KllErrBound(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_kll_err_bound"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_err_bound requires a BINARY kll blob, got ${child.dataType}")
  override def nullSafeEval(blob: Any): Any =
    KllSketch.errBoundFromBlob(blob.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.KllSketch.errBoundFromBlob($b)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
