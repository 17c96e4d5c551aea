package graft.ml

import org.apache.spark.mllib.fpm.PrefixSpan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Frequent sequential-pattern mining over user journeys — PrefixSpan
  * (Pei et al. '01) through `mllib.fpm`, the second MLlib surface
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

  /** The mining core, through `mllib.fpm.PrefixSpan` DIRECTLY rather
    * than the `ml.fpm` wrapper: the wrapper hands mllib a freshly
    * derived (hence never-cached) RDD, so prefix-growth replays the
    * journey collapse every recursion round and warns "Input data is
    * not cached" no matter what the caller materialized. Here the
    * sequence RDD is persisted for the run's whole recursion, and the
    * frequent-pattern set — support-thresholded, so a bounded result
    * artifact like the BPE merge list, NOT a data collect — is pinned
    * to the driver before the explicit unpersist, keeping the
    * persist/unpersist window deterministic. Same algorithm, same
    * exact counts (the ml wrapper delegates to this class). */
  private def minePatterns(seqs: DataFrame, minSupport: Double,
      maxLen: Int): DataFrame = {
    val spark = seqs.sparkSession
    val rdd = seqs.select(col("sequence"))
      .filter(col("sequence").isNotNull).rdd
      .map(_.getSeq[scala.collection.Seq[String]](0)
        .map(_.toArray).toArray)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val model = new PrefixSpan()
        .setMinSupport(minSupport)
        .setMaxPatternLength(maxLen)
        .run(rdd)
      val rows = model.freqSequences
        .map { fs =>
          // every caller feeds singleton itemsets, so patterns come
          // back singleton too; a multi-item itemset would render
          // ambiguously under bare concatenation ({a,b} vs item "ab"),
          // so fail loudly rather than silently collide
          val items = fs.sequence.map { itemset =>
            require(itemset.length == 1,
              s"non-singleton itemset in PrefixSpan output: " +
                itemset.mkString("{", ",", "}"))
            itemset.head
          }
          (items.mkString(">"), fs.freq)
        }
        .collect().toSeq
      import spark.implicits._
      rows.toDF("pattern", "n_journeys")
    } finally rdd.unpersist(blocking = false)
  }

  /** Frequent event-type subsequences: one row per pattern
    * (`a>b>c` rendering, gaps allowed) with its exact containment
    * count. */
  def frequentEventSequences(events: DataFrame,
      minSupport: Double = 0.05, maxLen: Int = 3): DataFrame =
    // prefix-growth re-reads the journey frame every recursion
    // round — materialize the collapse once before handing it over
    minePatterns(weekSequences(events).localCheckpoint(),
      minSupport, maxLen)

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
    val mined = minePatterns(seqs, minSupport, maxLen = 2)
      .select(col("pattern").as("pair"), col("n_journeys").as("freq"))
    val joined = frequent.join(mined, Seq("pair"), "left")
    joined.agg(
      count(lit(1)).as("n_contig_frequent"),
      coalesce(sum(when(col("freq").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_missing"),
      coalesce(min(col("freq") >= col("n_contig")), lit(true))
        .as("freq_bounds_ok"))
  }
}
