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

  private val BKey = "__gr_bucket"
  private val NKey = "__gr_n_total"

  /** The shared core: returns the input with `rankName` (exact global
    * rank, LONG) and [[NKey]] (total row count, LONG) appended. */
  private def withRank(df: DataFrame, bucketKey: Column,
      order: Seq[Column], rankName: String,
      targetBuckets: Long): DataFrame = {
    // Materialize the collapsed frame once: stats, intra ranks and
    // bucket totals each read it, and chained calls would otherwise
    // replay the whole upstream lineage geometrically.
    val base = df.withColumn(BKey, bucketKey.cast("long"))
      .localCheckpoint()
    val st = base.agg(min(col(BKey)), max(col(BKey)),
      count(lit(1))).head()
    if (st.isNullAt(0)) {
      // Empty input (the non-null key contract rules out all-null):
      // emit the empty frame with the rank column in place.
      return base.withColumn(rankName, lit(1L))
        .withColumn(NKey, lit(0L)).drop(BKey)
    }
    val lo = st.getLong(0)
    val span = st.getLong(1) - lo + 1L
    val width = math.max(1L, (span + targetBuckets - 1L) / targetBuckets)
    val nTotal = st.getLong(2)
    val bucketed = base
      .withColumn(BKey, expr(s"($BKey - ${lo}L) div ${width}L"))
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
      .withColumn(NKey, lit(nTotal))
      .drop(BKey, "__gr_intra", "__gr_offset")
  }
}
