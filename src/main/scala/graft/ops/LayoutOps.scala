package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * At 100 TB the cheapest scan is the one that never happens: parquet
  * min/max footer stats prune files, but a layout sorted on ONE column
  * only prunes filters on that column — every other dimension's
  * per-file range stays ~the global range. Interleaving the bits of
  * several columns' bucket numbers (the Morton curve) makes each
  * z-contiguous file cover a tight hyper-rectangle, so filters on ANY
  * of the interleaved dimensions prune (the same trick behind
  * Delta/Iceberg Z-ORDER compaction).
  *
  * Everything here is a plain `Column` expression — bucket scaling,
  * bit extraction, interleave — so the z-value computation runs inside
  * whole-stage codegen; the only driver-side step is collecting each
  * dimension's 2-value [min, max] domain.
  */
object LayoutOps {

  /** Equi-width bucket of `c` into [0, 2^bits) over the domain
    * [lo, hi] (clamped, so out-of-domain values land in the edge
    * buckets rather than corrupting the interleave). */
  def bucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = (1L << bits).toDouble
    val span = if (hi > lo) hi - lo else 1.0
    least(
      greatest(floor((c.cast("double") - lit(lo)) / lit(span) * lit(n)),
        lit(0L)),
      lit((1L << bits) - 1L)).cast("long")
  }

  /** Morton interleave of pre-bucketed long columns (each in
    * [0, 2^bits)): bit i of column j lands at output position
    * i * k + j. Expands to bits×k shift/mask terms OR-folded together
    * — a pure codegen'd expression tree, no UDF. */
  def zvalue(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Per-dimension [min, max] domain — the one driver-side collect
    * (2 doubles), same contract as the IVF centroid cache. */
  def domain(df: DataFrame, c: String): (Double, Double) = {
    val r = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** Z-ordered layout: range-partition by the z-value, sort within
    * partitions, keep `__z` out of the caller's way. Writing the
    * result yields `numFiles` files whose footer stats are tight in
    * EVERY interleaved dimension. Range partitioning samples the
    * z distribution, so skewed data still yields balanced files. */
  def zorderLayout(df: DataFrame, dims: Seq[(String, Double, Double)],
      bits: Int = 8, numFiles: Int = 16): DataFrame = {
    val z = zvalue(
      dims.map { case (c, lo, hi) => bucket(col(c), lo, hi, bits) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Hilbert index of pre-bucketed (x, y), each in [0, 2^bits) — the
    * LOCALITY-OPTIMAL space-filling curve beside [[zvalue]]'s Morton
    * interleave: consecutive Hilbert cells are always
    * Manhattan-adjacent (the curve never "jumps" the way Z does at
    * quadrant seams), so range-partitioned files cover even tighter
    * hyper-rectangles — the reason Iceberg/DB2 offer HILBERT beside
    * ZORDER for multi-dim clustering.
    *
    * The classic xy2d walk (one reflect/transpose rotation per bit
    * plane, high to low) UNROLLED into a pure Column expression tree
    * — integer compares, bit tests and ±/× only, so the whole index
    * stays inside whole-stage codegen like [[zvalue]]; no UDF. The
    * unroll multiplies expression size ~3× per plane, so keep `bits`
    * small (≤ 6; the audit grain is 4 → a ~100-node tree). */
  def hilbertIndex(x0: Column, y0: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 6, s"hilbertIndex bits in [1,6]: $bits")
    val n = 1L << bits
    var x = x0
    var y = y0
    var d: Column = lit(0L)
    var s = n >> 1
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > lit(0L), lit(1L))
        .otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > lit(0L), lit(1L))
        .otherwise(lit(0L))
      d = d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      // rot: reflect within the full grid when rx=1, then transpose
      val nx = when(ry === lit(0L),
        when(rx === lit(1L), lit(n - 1L) - y).otherwise(y)).otherwise(x)
      val ny = when(ry === lit(0L),
        when(rx === lit(1L), lit(n - 1L) - x).otherwise(x)).otherwise(y)
      x = nx
      y = ny
      s >>= 1
    }
    d
  }

  /** Hilbert-cell audit over the event log — [[zorderLayoutAudit]]'s
    * envelope check on the Hilbert curve at 4-bit grain (16×16 = 256
    * cells, the same cell budget the Z audit keeps after its top-4-bit
    * truncation): each cell's population and per-dimension [min, max]
    * envelope, the pruning claim made checkable. The DuckDB oracle
    * replays the unrolled xy2d walk layer by layer, bit-for-bit. */
  def hilbertLayoutAudit(events: DataFrame, bits: Int = 4): DataFrame = {
    val e = events.select(col("value"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("double").as("dayn"))
    val (vlo, vhi) = domain(e, "value")
    val (dlo, dhi) = domain(e, "dayn")
    val h = hilbertIndex(
      bucket(col("value"), vlo, vhi, bits),
      bucket(col("dayn"), dlo, dhi, bits), bits)
    e.withColumn("hcell", h)
      .groupBy("hcell")
      .agg(count(lit(1)).as("n"),
        min(Num.dec2(col("value"))).cast("double").as("v_min"),
        max(Num.dec2(col("value"))).cast("double").as("v_max"),
        min(col("dayn")).cast("long").as("d_min"),
        max(col("dayn")).cast("long").as("d_max"))
  }

  /** Z-cell audit over the event log: bucket (value, day) into 8-bit
    * Morton cells, keep the top 4 bits per dimension (≤256 cells), and
    * report each cell's population and per-dimension envelope. The
    * envelope IS the pruning claim made checkable: a filter on either
    * dimension overlaps only the cells whose [min, max] admit it, and
    * the DuckDB oracle recomputes the same cells bit-for-bit (exact
    * DECIMAL envelopes; the bucket arithmetic is identical IEEE-754 in
    * both engines given the same collected domain). */
  def zorderLayoutAudit(events: DataFrame, bits: Int = 8): DataFrame = {
    val e = events.select(col("value"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("double").as("dayn"))
    val (vlo, vhi) = domain(e, "value")
    val (dlo, dhi) = domain(e, "dayn")
    val z = zvalue(Seq(
      bucket(col("value"), vlo, vhi, bits),
      bucket(col("dayn"), dlo, dhi, bits)), bits)
    e.withColumn("zcell", shiftright(z, (bits - 4) * 2))
      .groupBy("zcell")
      .agg(count(lit(1)).as("n"),
        min(Num.dec2(col("value"))).cast("double").as("v_min"),
        max(Num.dec2(col("value"))).cast("double").as("v_max"),
        min(col("dayn")).cast("long").as("d_min"),
        max(col("dayn")).cast("long").as("d_max"))
  }
}
