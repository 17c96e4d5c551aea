package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank / ntile — the TWO-LEVEL prefix-sum rank as
  * a reusable API, so percentile/quintile operators can't reach for a
  * flat `Window.orderBy(...)` (a single-task global sort: at cluster
  * scale, one executor sorts the whole frame while the rest idle).
  *
  * This is the same decomposition [[DocOps.selectUnderBudget]] and
  * [[DocOps.shardAssignments]] use for offset binning and
  * [[JoinOps.sortedNeighborhoodPairs]] uses for neighborhood joins,
  * promoted to the rank itself:
  *
  *   1. range-bucket rows by a LONG key that is monotone
  *      NON-DECREASING in the target sort order (`(key − min) div
  *      width`, width derived so the bucket count is capped);
  *   2. `row_number` WITHIN each bucket — parallelism = #buckets;
  *   3. exclusive prefix-sum of the per-bucket row counts — a frame
  *      with ONE ROW PER BUCKET (≤ targetBuckets + 1 by construction,
  *      so its flat window is the bounded-serial case that argument is
  *      actually sound for, and its join back is a guaranteed-small
  *      broadcast);
  *   4. global rank = bucket offset + intra-bucket rank. Bit-identical
  *      to the flat window because (bucket, intra-order) IS the total
  *      order whenever the bucket key is monotone in it.
  *
  * ntile(q) is then pure arithmetic on the exact rank under the shared
  * Spark/Postgres/DuckDB remainder semantics (first `n mod q` tiles
  * take `n div q + 1` rows, the rest `n div q`) — no second window.
  *
  * Input contract: the frame is an ENTITY-cardinality aggregate
  * (per-customer, per-user, …) with a NON-NULL bucket key, and `order`
  * is a total order (tie-break included). The helper reads its input
  * three times (key stats, intra ranks, bucket totals), so it
  * materializes it once via `localCheckpoint` on executor storage
  * rather than replaying the upstream aggregation per read — the
  * [[DocOps.bpeTrainRounds]] lineage lesson; chained calls (RFM's
  * three scores) therefore replay linearly, not geometrically.
  *
  * Reference precedent: the reference's global-sort family
  * (`/root/reference/src/batch_analytics.py:47-49`) is exactly the
  * shape SURVEY §7 said must never serialize at scale.
  */
object RankOps {

  /** Exact `row_number() OVER (ORDER BY order…)` as `rankName`
    * (LONG, 1-based), computed with the two-level prefix sum.
    *
    * @param bucketKey any numeric column monotone non-decreasing in
    *        `order` (cast to LONG internally — floor/trunc both
    *        preserve weak monotonicity, and intra-bucket ordering by
    *        the full keys restores exactness); must be non-null.
    * @param order the total order (include a tie-break key).
    */
  def globalRank(df: DataFrame, bucketKey: Column, order: Seq[Column],
      rankName: String, targetBuckets: Long = 4096L): DataFrame =
    withRank(df, bucketKey, order, rankName, targetBuckets)
      .drop(NKey)

  /** [[globalRank]] + ntile in one pass: adds `tileName` (INT, exactly
    * Spark's/Postgres' `ntile(q) OVER (ORDER BY order…)`) and
    * `rankName` if non-empty (dropped otherwise). */
  def globalNtile(df: DataFrame, bucketKey: Column, order: Seq[Column],
      q: Int, tileName: String, rankName: String = "",
      targetBuckets: Long = 4096L): DataFrame = {
    require(q > 0, s"ntile bucket count must be positive, got $q")
    val r = if (rankName.isEmpty) "__gn_rank" else rankName
    val ranked = withRank(df, bucketKey, order, r, targetBuckets)
    val out = ranked.withColumn(tileName, ntileFromRank(r, NKey, q))
      .drop(NKey)
    if (rankName.isEmpty) out.drop(r) else out
  }

  /** Postgres/Spark ntile from an exact 1-based rank and row count:
    * the first `n mod q` tiles hold `n div q + 1` rows. Exact BIGINT
    * arithmetic throughout (`div`); when `n < q` the big-tile branch
    * covers every row with tile = rank, matching ntile's
    * one-row-per-tile degenerate case. */
  private def ntileFromRank(rank: String, n: String, q: Int): Column =
    expr(
      s"""CAST(CASE
         |  WHEN $rank <= ($n % $q) * (($n div $q) + 1)
         |  THEN ($rank - 1) div (($n div $q) + 1)
         |  ELSE ($n % $q) +
         |       ($rank - 1 - ($n % $q) * (($n div $q) + 1)) div ($n div $q)
         |END + 1 AS INT)""".stripMargin)

  /** One quintile/decile cut for [[globalNtileMulti]]: the bucket key
    * (monotone non-decreasing in `order`, non-null), the total order,
    * the tile count and the output column name. */
  final case class NtileCut(bucketKey: Column, order: Seq[Column],
      q: Int, tileName: String)

  /** Several ntile cuts over the SAME entity frame with ONE
    * materialization — the RFM shape: three chained [[globalNtile]]
    * calls each localCheckpoint their input, but all three rank the
    * same collapsed customer frame. Here the frame is checkpointed
    * once, one stats job covers every cut's key (min/max/null-count),
    * and each cut is an independent bucket-window + broadcast-offset
    * pass whose (key, tile) result joins back on `keyName`.
    *
    * Contract: `keyName` is unique per row (it is the entity the
    * frame was collapsed to), so the join-back is 1:1. */
  def globalNtileMulti(df: DataFrame, keyName: String,
      cuts: Seq[NtileCut], targetBuckets: Long = 4096L): DataFrame = {
    require(cuts.nonEmpty, "globalNtileMulti needs at least one cut")
    cuts.foreach(c => require(c.q > 0,
      s"ntile bucket count must be positive, got ${c.q} for ${c.tileName}"))
    val bk = cuts.indices.map(i => s"__gr_key_$i")
    val keyed = cuts.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(bk(i), c.bucketKey.cast("long"))
    }
    val base = keyed.localCheckpoint()
    val aggs = count(lit(1)).as("__gr_n") +: cuts.indices.flatMap(i => Seq(
      min(col(bk(i))).as(s"__gr_lo_$i"), max(col(bk(i))).as(s"__gr_hi_$i"),
      count(when(col(bk(i)).isNull, lit(1))).as(s"__gr_nulls_$i")))
    val st = base.agg(aggs.head, aggs.tail: _*).head()
    val nTotal = st.getLong(0)
    if (nTotal == 0L) {
      return cuts.foldLeft(base.drop(bk: _*)) { (d, c) =>
        d.withColumn(c.tileName, lit(1).cast("int"))
      }
    }
    val out = cuts.zipWithIndex.foldLeft(base) { case (acc, (c, i)) =>
      val nulls = st.getLong(3 + 3 * i)
      require(nulls == 0L, s"globalNtileMulti(${c.tileName}): $nulls rows " +
        "have a NULL bucket key — the non-null contract would silently " +
        "drop them from the rank")
      val (lo, width) =
        loAndWidth(st.getLong(1 + 3 * i), st.getLong(2 + 3 * i), targetBuckets)
      val r = s"__gn_rank_$i"
      val tiles = rankOnMaterialized(base, bk(i), lo, width, c.order, r)
        .withColumn(c.tileName, ntileFromRank(r, nTotal.toString, c.q))
        .select(col(keyName), col(c.tileName))
      acc.join(tiles, Seq(keyName))
    }
    out.drop(bk: _*)
  }

  /** Exact running SUM of `valueCol` over the global total order —
    * the VALUE counterpart of [[globalRank]]'s row prefix, same
    * two-level shape: range-bucket on `bucketKey`, intra-bucket
    * running sums under a partitioned window, per-bucket TOTALS
    * prefix-summed on the ≤ targetBuckets+1-row frame and broadcast
    * back. Powers Pareto/ABC-style "cumulative share in rank order"
    * analytics without ever sorting the entity frame in one task.
    *
    * Contract (same as [[globalRank]]): `bucketKey` monotone
    * non-decreasing in `order` and non-null; `order` a TOTAL order
    * (ties under a running sum are non-deterministic); `valueCol`
    * must cast losslessly to LONG (use integer cents/micro-units). */
  def globalRunningSum(df: DataFrame, bucketKey: Column,
      order: Seq[Column], valueCol: Column, sumName: String,
      targetBuckets: Long = 4096L): DataFrame = {
    val base = df.withColumn("__gs_key", bucketKey.cast("long"))
      .withColumn("__gs_v", valueCol.cast("long"))
      .localCheckpoint()
    val st = base.agg(min(col("__gs_key")), max(col("__gs_key")),
      count(lit(1)), count(when(col("__gs_key").isNull, lit(1)))).head()
    if (st.getLong(2) == 0L) {
      return base.withColumn(sumName, lit(0L)).drop("__gs_key", "__gs_v")
    }
    require(st.getLong(3) == 0L, s"globalRunningSum($sumName): " +
      s"${st.getLong(3)} rows have a NULL bucket key — the non-null " +
      "contract would silently drop them from the prefix")
    val (lo, width) = loAndWidth(st.getLong(0), st.getLong(1), targetBuckets)
    val bucketed = base
      .withColumn(BKey, expr(s"(__gs_key - ${lo}L) div ${width}L"))
    val intra = bucketed.withColumn("__gs_run",
      sum(col("__gs_v")).over(
        Window.partitionBy(BKey).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = bucketed
      .groupBy(BKey).agg(sum(col("__gs_v")).as("__gs_cnt"))
      .withColumn("__gs_offset",
        coalesce(sum(col("__gs_cnt")).over(
          Window.orderBy(col(BKey).asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(BKey), col("__gs_offset"))
    intra.join(broadcast(offsets), Seq(BKey))
      .withColumn(sumName, col("__gs_offset") + col("__gs_run"))
      .drop(BKey, "__gs_run", "__gs_offset", "__gs_key", "__gs_v")
  }

  /** Exact `row_number() OVER (PARTITION BY groupCols ORDER BY order…)`
    * as `rankName` (LONG, 1-based), plus the per-group row count as
    * `countName` when non-empty — the COMPOSITE-KEY form of
    * [[globalRank]] for LOW-CARDINALITY group domains.
    *
    * Why this exists: `Window.partitionBy(tinyDomainCol)` over a raw
    * fact frame is the global-sort trap in disguise — with ~5 distinct
    * `event_type`s, each type's ENTIRE history sorts in ONE task at
    * cluster scale while the rest idle. The fix is the same two-level
    * prefix sum as [[globalRank]], keyed by (group, bucket) instead of
    * bucket alone:
    *
    *   1. range-bucket rows on `bucketKey` (global geometry — per-group
    *      buckets are just sparse);
    *   2. `row_number` within each (group, bucket) — parallelism =
    *      #groups × #buckets;
    *   3. per-(group, bucket) counts, exclusive prefix-summed WITHIN
    *      each group over the bucket ordinal — each group's offset
    *      partition holds ≤ targetBuckets + 1 rows by construction, so
    *      that window is the bounded-serial case, run in parallel
    *      across groups;
    *   4. group rank = per-(group, bucket) offset + intra rank.
    *
    * Contract: `bucketKey` is non-null and monotone non-decreasing in
    * `order` WITHIN every group; `order` is a total order per group;
    * the group domain is small enough that |groups| × (targetBuckets
    * + 1) offset rows broadcast (the low-cardinality case is exactly
    * when the flat window is dangerous — a high-cardinality partition
    * key is already parallel and needs no decomposition). */
  def groupedRank(df: DataFrame, groupCols: Seq[String],
      bucketKey: Column, order: Seq[Column], rankName: String,
      countName: String = "", targetBuckets: Long = 4096L): DataFrame = {
    require(groupCols.nonEmpty, "groupedRank needs at least one group " +
      "column — use globalRank for the ungrouped form")
    val kIn = "__gg_key"
    val base = df.withColumn(kIn, bucketKey.cast("long")).localCheckpoint()
    val st = base.agg(min(col(kIn)), max(col(kIn)), count(lit(1)),
      count(when(col(kIn).isNull, lit(1)))).head()
    if (st.getLong(2) == 0L) {
      val out = base.withColumn(rankName, lit(1L)).drop(kIn)
      return if (countName.isEmpty) out
        else out.withColumn(countName, lit(0L))
    }
    require(st.getLong(3) == 0L, s"groupedRank($rankName): " +
      s"${st.getLong(3)} rows have a NULL bucket key — the non-null " +
      "contract would silently drop them from the rank")
    val (lo, width) = loAndWidth(st.getLong(0), st.getLong(1), targetBuckets)
    val bucketed = base
      .withColumn(BKey, expr(s"($kIn - ${lo}L) div ${width}L"))
    val gCols = groupCols.map(col)
    val intra = bucketed.withColumn("__gg_intra",
      row_number().over(
        Window.partitionBy(gCols :+ col(BKey): _*)
          .orderBy(order: _*)).cast("long"))
    // One row per (group, bucket); the prefix window partitions by the
    // GROUP and orders by the bucket ordinal, so each partition is
    // ≤ targetBuckets + 1 rows — bounded by construction, parallel
    // across groups.
    val perGroup = Window.partitionBy(gCols: _*)
    val offsets = bucketed
      .groupBy(gCols :+ col(BKey): _*).agg(count(lit(1)).as("__gg_cnt"))
      .withColumn("__gg_offset",
        sum(col("__gg_cnt")).over(perGroup.orderBy(col(BKey).asc)) -
          col("__gg_cnt"))
      .withColumn("__gg_n", sum(col("__gg_cnt")).over(perGroup))
      .select(gCols ++ Seq(col(BKey), col("__gg_offset"), col("__gg_n")): _*)
    val joined = intra.join(broadcast(offsets), groupCols :+ BKey)
      .withColumn(rankName, col("__gg_offset") + col("__gg_intra"))
    val out = joined
      .drop(BKey, "__gg_intra", "__gg_offset", kIn)
    if (countName.isEmpty) out.drop("__gg_n")
    else out.withColumnRenamed("__gg_n", countName)
  }

  /** Exact running SUM of `valueCol` over the per-group total order —
    * the COMPOSITE-KEY form of [[globalRunningSum]], for the same
    * low-cardinality group domains [[groupedRank]] exists for: a
    * running sum `OVER (PARTITION BY source ORDER BY …)` with ~4
    * sources puts each source's whole frame through one task. Same
    * two-level shape keyed by (group, bucket): intra-bucket running
    * sums under the composite window, per-(group, bucket) value totals
    * exclusive-prefix-summed WITHIN each group (≤ targetBuckets + 1
    * rows per group partition), broadcast back.
    *
    * Contract (same as [[groupedRank]] + [[globalRunningSum]]):
    * `bucketKey` non-null and monotone non-decreasing in `order`
    * within every group; `order` a TOTAL order per group; `valueCol`
    * casts losslessly to LONG; |groups| × (targetBuckets + 1) offset
    * rows broadcast. */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String],
      bucketKey: Column, order: Seq[Column], valueCol: Column,
      sumName: String, targetBuckets: Long = 4096L): DataFrame = {
    require(groupCols.nonEmpty, "groupedRunningSum needs at least one " +
      "group column — use globalRunningSum for the ungrouped form")
    val base = df.withColumn("__gs_key", bucketKey.cast("long"))
      .withColumn("__gs_v", valueCol.cast("long"))
      .localCheckpoint()
    val st = base.agg(min(col("__gs_key")), max(col("__gs_key")),
      count(lit(1)), count(when(col("__gs_key").isNull, lit(1)))).head()
    if (st.getLong(2) == 0L) {
      return base.withColumn(sumName, lit(0L)).drop("__gs_key", "__gs_v")
    }
    require(st.getLong(3) == 0L, s"groupedRunningSum($sumName): " +
      s"${st.getLong(3)} rows have a NULL bucket key — the non-null " +
      "contract would silently drop them from the prefix")
    val (lo, width) = loAndWidth(st.getLong(0), st.getLong(1), targetBuckets)
    val gCols = groupCols.map(col)
    val bucketed = base
      .withColumn(BKey, expr(s"(__gs_key - ${lo}L) div ${width}L"))
    val intra = bucketed.withColumn("__gs_run",
      sum(col("__gs_v")).over(
        Window.partitionBy(gCols :+ col(BKey): _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // One row per (group, bucket); each group's prefix partition holds
    // ≤ targetBuckets + 1 rows — bounded, parallel across groups.
    val offsets = bucketed
      .groupBy(gCols :+ col(BKey): _*).agg(sum(col("__gs_v")).as("__gs_cnt"))
      .withColumn("__gs_offset",
        coalesce(sum(col("__gs_cnt")).over(
          Window.partitionBy(gCols: _*).orderBy(col(BKey).asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(gCols ++ Seq(col(BKey), col("__gs_offset")): _*)
    intra.join(broadcast(offsets), groupCols :+ BKey)
      .withColumn(sumName, col("__gs_offset") + col("__gs_run"))
      .drop(BKey, "__gs_run", "__gs_offset", "__gs_key", "__gs_v")
  }

  /** The multiset of CONSECUTIVE GAPS of `key` in per-group sorted
    * order — exactly the non-null values of `key − lag(key) OVER
    * (PARTITION BY groupCols ORDER BY key…)`, without the flat
    * per-group window that serializes each group's whole history in
    * one task when the group domain is tiny (~5 event types).
    *
    * Two-level shape with BOUNDARY STITCHING: range-bucket on `key`
    * (monotone, so each (group, bucket) holds a contiguous run of the
    * group's sorted sequence), lag WITHIN (group, bucket) for the
    * intra-run gaps, then one stitch row per non-empty bucket edge —
    * `min(key)` of a bucket minus `max(key)` of the group's previous
    * non-empty bucket, via a lag over the per-(group, bucket) bounds
    * frame (≤ targetBuckets + 1 rows per group's partition). Gap
    * VALUES depend only on the sorted key multiset (ties gap to 0
    * under any tie order), so no tie-break column is needed and the
    * result is deterministic.
    *
    * Returns one row per consecutive pair: `groupCols…, gapName`
    * (LONG). Contract: `key` casts losslessly to LONG and is non-null.
    */
  def groupedGaps(df: DataFrame, groupCols: Seq[String], key: Column,
      gapName: String, targetBuckets: Long = 4096L): DataFrame = {
    require(groupCols.nonEmpty, "groupedGaps needs at least one group column")
    val gCols = groupCols.map(col)
    val base = df.select(gCols :+ key.cast("long").as("__gg_k"): _*)
      .localCheckpoint()
    val st = base.agg(min(col("__gg_k")), max(col("__gg_k")),
      count(lit(1)), count(when(col("__gg_k").isNull, lit(1)))).head()
    if (st.getLong(2) == 0L) {
      return base.select(gCols :+ lit(0L).as(gapName): _*)
    }
    require(st.getLong(3) == 0L, s"groupedGaps($gapName): " +
      s"${st.getLong(3)} rows have a NULL key — the non-null contract " +
      "would silently drop their gaps")
    val (lo, width) = loAndWidth(st.getLong(0), st.getLong(1), targetBuckets)
    val bucketed = base
      .withColumn(BKey, expr(s"(__gg_k - ${lo}L) div ${width}L"))
    val intra = bucketed
      .withColumn(gapName, col("__gg_k") -
        lag(col("__gg_k"), 1).over(
          Window.partitionBy(gCols :+ col(BKey): _*)
            .orderBy(col("__gg_k").asc)))
      .filter(col(gapName).isNotNull)
      .select(gCols :+ col(gapName): _*)
    // One row per non-empty (group, bucket); the stitch lag partitions
    // by the group over ≤ targetBuckets + 1 bucket rows — bounded.
    val bounds = bucketed
      .groupBy(gCols :+ col(BKey): _*)
      .agg(min(col("__gg_k")).as("__gg_lo"), max(col("__gg_k")).as("__gg_hi"))
    val stitched = bounds
      .withColumn(gapName, col("__gg_lo") -
        lag(col("__gg_hi"), 1).over(
          Window.partitionBy(gCols: _*).orderBy(col(BKey).asc)))
      .filter(col(gapName).isNotNull)
      .select(gCols :+ col(gapName): _*)
    intra.unionByName(stitched)
  }

  private val BKey = "__gr_bucket"
  private val NKey = "__gr_n_total"

  /** Overflow-checked bucket geometry: a key range wider than half the
    * Long domain (hash- or epoch-micro-derived keys) would wrap the
    * span subtraction and silently break bucket monotonicity — fail
    * loudly instead (ADVICE r12). */
  private def loAndWidth(lo: Long, hi: Long,
      targetBuckets: Long): (Long, Long) = {
    val span =
      try Math.addExact(Math.subtractExact(hi, lo), 1L)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"globalRank bucket key range [$lo, $hi] overflows Long span " +
            "arithmetic — narrow the key (hash/epoch-micro keys must be " +
            "bucketed into a bounded domain first)")
      }
    // ceil-divide without the (span + targetBuckets − 1) overflow a
    // near-Long.MaxValue span would hit
    val width = span / targetBuckets + (if (span % targetBuckets == 0L) 0L else 1L)
    (lo, math.max(1L, width))
  }

  /** The per-cut core over an already-materialized frame: range-bucket
    * by `(bkeyCol − lo) div width`, intra-bucket row_number, exclusive
    * prefix-sum of per-bucket counts (≤ targetBuckets + 1 rows — the
    * one bounded serial window), broadcast the offsets back. */
  private def rankOnMaterialized(base: DataFrame, bkeyCol: String,
      lo: Long, width: Long, order: Seq[Column],
      rankName: String): DataFrame = {
    val bucketed = base
      .withColumn(BKey, expr(s"($bkeyCol - ${lo}L) div ${width}L"))
    val intra = bucketed.withColumn("__gr_intra",
      row_number().over(
        Window.partitionBy(BKey).orderBy(order: _*)).cast("long"))
    // One row per bucket, ≤ targetBuckets + 1 by construction — the
    // flat window and the broadcast are both bounded by design, not
    // by a stats estimate.
    val offsets = bucketed
      .groupBy(BKey).agg(count(lit(1)).as("__gr_cnt"))
      .withColumn("__gr_offset",
        sum(col("__gr_cnt")).over(Window.orderBy(col(BKey).asc)) -
          col("__gr_cnt"))
      .select(col(BKey), col("__gr_offset"))
    intra.join(broadcast(offsets), Seq(BKey))
      .withColumn(rankName, col("__gr_offset") + col("__gr_intra"))
      .drop(BKey, "__gr_intra", "__gr_offset")
  }

  /** The shared core: returns the input with `rankName` (exact global
    * rank, LONG) and [[NKey]] (total row count, LONG) appended. */
  private def withRank(df: DataFrame, bucketKey: Column,
      order: Seq[Column], rankName: String,
      targetBuckets: Long): DataFrame = {
    // Materialize the collapsed frame once: stats, intra ranks and
    // bucket totals each read it, and chained calls would otherwise
    // replay the whole upstream lineage geometrically.
    val base = df.withColumn(BKey + "_in", bucketKey.cast("long"))
      .localCheckpoint()
    val st = base.agg(min(col(BKey + "_in")), max(col(BKey + "_in")),
      count(lit(1)),
      count(when(col(BKey + "_in").isNull, lit(1)))).head()
    val nTotal = st.getLong(2)
    if (nTotal == 0L) {
      // Genuinely empty input: emit the empty frame with the rank
      // column in place.
      return base.withColumn(rankName, lit(1L))
        .withColumn(NKey, lit(0L)).drop(BKey + "_in")
    }
    val nulls = st.getLong(3)
    require(nulls == 0L, s"globalRank($rankName): $nulls rows have a " +
      "NULL bucket key — the non-null contract would silently drop " +
      "them from the rank")
    val (lo, width) = loAndWidth(st.getLong(0), st.getLong(1), targetBuckets)
    rankOnMaterialized(base, BKey + "_in", lo, width, order, rankName)
      .withColumn(NKey, lit(nTotal))
      .drop(BKey + "_in")
  }
}
