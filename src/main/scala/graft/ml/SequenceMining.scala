package graft.ml

import org.apache.spark.ml.fpm.PrefixSpan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent sequential-pattern mining over user journeys — PrefixSpan
  * (Pei et al. '01) through `spark.ml.fpm`, the second MLlib surface
  * beside the sentiment pipeline (SURVEY §2.9 names MLlib a first-class
  * capability; the reference never mines sequences at all).
  *
  * [[graft.ops.EventOps.topEventPaths]] counts EXACT contiguous session
  * paths; PrefixSpan generalizes to subsequences WITH GAPS — "view …
  * eventually purchase" matches `view > click > purchase` too, the
  * funnel-discovery view contiguous counting structurally misses. The
  * sequence unit is the (user, calendar week) journey: long enough on
  * this log to carry real order (gap sessions here average ~1 event),
  * and the grain week-over-week journey analyses use anyway. The
  * algorithm is exact (no sampling/seeds): output = every pattern
  * contained in ≥ minSupport·|journeys| sequences with exact
  * containment counts. The pattern ROW SET is engine-specific to
  * enumerate in SQL (gapped containment), so the driver gate is the
  * paired containment audit: every frequent CONTIGUOUS 2-step path
  * (exactly SQL-derivable) must appear with freq ≥ its contiguous
  * count — subsequence containment ⊇ adjacent containment.
  *
  * Scale: PrefixSpan's prefix-growth recursion runs distributed in
  * MLlib over partitioned projected databases; the journey collapse in
  * front of it is one (user, week) shuffle.
  */
object SequenceMining {

  /** Per-(user, week) single-item event sequences, `sequence`
    * formatted for `PrefixSpan.findFrequentSequentialPatterns`; order
    * within a journey is the (ts, event_id) total order. */
  private[graft] def weekSequences(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .agg(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type").as("et")))),
        x => array(x.getField("et"))).as("sequence"))

  /** Frequent event-type subsequences: one row per pattern
    * (`a>b>c` rendering, gaps allowed) with its exact containment
    * count. */
  def frequentEventSequences(events: DataFrame,
      minSupport: Double = 0.05, maxLen: Int = 3): DataFrame =
    new PrefixSpan()
      .setMinSupport(minSupport)
      .setMaxPatternLength(maxLen)
      .setSequenceCol("sequence")
      // prefix-growth re-reads the journey frame every recursion
      // round — materialize it once (the audit at [[prefixspanContiguousAudit]]
      // already does; without this MLlib warns "Input data is not cached"
      // and replays the (user, week) collapse per round)
      .findFrequentSequentialPatterns(weekSequences(events).localCheckpoint())
      .select(concat_ws(">", flatten(col("sequence"))).as("pattern"),
        col("freq").as("n_journeys"))

  /** Hash-gated containment audit for [[frequentEventSequences]]: the
    * frequent CONTIGUOUS 2-step paths are exactly SQL-derivable, and
    * gapped-subsequence containment ⊇ adjacent containment, so every
    * one must appear among the mined patterns with freq ≥ its
    * contiguous journey count — `n_missing` is structurally 0 and
    * `freq_bounds_ok` structurally true, while `n_contig_frequent` is
    * an exact count the oracle recomputes. */
  def prefixspanContiguousAudit(events: DataFrame,
      minSupport: Double = 0.05): DataFrame = {
    val seqs = weekSequences(events).localCheckpoint()
    val nSeq = seqs.agg(count(lit(1)).as("n_journeys"))
    // distinct journeys CONTAINING each adjacent pair
    val contig = seqs
      .select(col("user_id"), col("week"),
        flatten(col("sequence")).as("path"))
      .select(col("user_id"), col("week"),
        explode(expr(
          "transform(slice(path, 1, size(path) - 1), " +
            "(x, i) -> concat(x, '>', path[i + 1]))")).as("pair"))
      .distinct()
      .groupBy("pair").agg(count(lit(1)).as("n_contig"))
    val frequent = contig.crossJoin(broadcast(nSeq))
      .filter(col("n_contig").cast("double") >=
        lit(minSupport) * col("n_journeys").cast("double"))
    val mined = new PrefixSpan()
      .setMinSupport(minSupport)
      .setMaxPatternLength(2)
      .setSequenceCol("sequence")
      .findFrequentSequentialPatterns(seqs)
      .select(concat_ws(">", flatten(col("sequence"))).as("pair"),
        col("freq"))
    val joined = frequent.join(mined, Seq("pair"), "left")
    joined.agg(
      count(lit(1)).as("n_contig_frequent"),
      coalesce(sum(when(col("freq").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_missing"),
      coalesce(min(col("freq") >= col("n_contig")), lit(true))
        .as("freq_bounds_ok"))
  }
}
