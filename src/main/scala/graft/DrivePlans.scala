package graft

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: `spark.explain("formatted")` captures of the
  * headline queries at sf0.001 with `GraftExtensions` active.
  *
  *   sbt "runMain graft.DrivePlans /root/testdata/sf0.001 PLANS.md"
  */
object DrivePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sections = Seq(
      ("pricing_summary (TPC-H Q1 shape)",
        "Filter pushed to the scan, 8 aggregates partial+final, one exchange."),
      ("revenue_by_nation (broadcast star join)",
        "Every dim broadcast (size-guarded for customer), one fact shuffle."),
      ("latest_per_user (row_number dedup, auto-rewritten to TopKPerGroup)",
        "TopKRewrite turns the rn=1 filter into the native operator: " +
          "capped partial heaps before the exchange, spillable sort + " +
          "streaming final after it — the full-table window sort is gone."),
      ("range_join_pairs (time-bucketed self-join)",
        "Equi-join on (user_id, bucket) with a 2-probe explode — a hash " +
          "join whose per-key fan-out is bounded by two windowSec buckets; " +
          "the range predicate is a post-join filter, never a cartesian."),
      ("minhash_near_dups (explode + hash-agg signatures + LSH banding)",
        "Shingles explode once; 32 min-hashes fold in one codegen'd " +
          "aggregate; banding buckets join Σ bucket². The verify-side " +
          "shingle sets are candidate-bounded: a LeftSemi join against " +
          "the band-derived candidate ids prunes the collect_set build " +
          "to O(candidates), and AQE reuses the shared band exchange " +
          "at runtime (asserted in DedupOpsSpec)."),
      ("knn_brute (fused codegen cosine + TakeOrderedAndProject)",
        "1-row broadcast query vector; graft_cosine inside the generated " +
          "stage; per-partition top-k merge, no global sort."),
      ("knn_all_lsh (fused graft_lsh_bucket + exploded multi-probe equi-join)",
        "Buckets computed by the native expression in one codegen'd pass; " +
          "probes exploded so candidates form a bucket equi-join; native " +
          "top-k bounds each vector's candidates."),
      ("winnowed_fingerprints (fused graft_winnow in the scan stage)",
        "The whole rolling-hash + winnow selection happens inside one " +
          "generated stage per document — no char explode, no doc_id " +
          "shuffle, no window sorts; Generate just unnests the result."),
      ("tpch_q18 (aggregate-then-join)",
        "Lineitem collapses to one narrow row per order (partial+final " +
          "agg on l_orderkey) BEFORE the orders join; customer is a " +
          "guarded broadcast; the top-100 is TakeOrderedAndProject. The " +
          "only wide shuffle is the per-order rollup itself."),
      ("tfidf_top_terms (two-level term stats + native top-k)",
        "tf is a (doc_id, term) hash agg with map-side partials; df " +
          "reuses tf's exchange; the tf-df join shuffles on term; the " +
          "per-doc top-k goes through TopKRewrite's capped heaps — no " +
          "full sort anywhere."),
      ("shard_assignments (two-level distributed prefix sum)",
        "The intra window hash-partitions by (source, b) — parallelism " +
          "scales with id-range buckets, not the source count, so one " +
          "giant source is never one sorting task; the per-bucket " +
          "offsets frame (~rows/idBucket) comes back as a broadcast " +
          "join, and the manifest agg collapses the result."),
      ("knn_all_brute (norm-precomputed all-pairs, codegen trap documented)",
        "Each side's norm is computed ONCE per row (graft_dot + sqrt) " +
          "and carried through the join; the stream side needs the tiny " +
          "repartition barrier or whole-stage codegen re-evaluates the " +
          "projected norm inside the per-PAIR loop (measured 20% slower " +
          "than fused cosine without it, 18% faster with it). The pair " +
          "loop itself is the fused dot only."),
      ("scd2_type_history (gaps-and-islands on one exchange)",
        "Both event-level windows (lag change flag, running-sum island " +
          "number) and the island aggregation share ONE user_id " +
          "exchange and sort; the lead() that closes each interval " +
          "windows the collapsed islands frame — orders of magnitude " +
          "smaller than the log — so the second sort is cheap by " +
          "construction."),
      ("trailing_revenue_30d (time-valued RANGE frame)",
        "A RangeFrame over epoch-day numbers: [day-29, day] regardless " +
          "of how many orders land in it, same-day orders always frame " +
          "peers. One customer exchange + one sort; the DECIMAL sum " +
          "keeps the frame total exact so intra-frame order cannot " +
          "change the result."),
      ("heavy_hitter_terms (Misra–Gries sketch-then-confirm)",
        "Pass 1 is a bounded-memory mapPartitions (k counters per " +
          "partition, vocabulary never shuffled); the ≤ parts·k " +
          "candidate union is the ONLY exchange of term identities. " +
          "Pass 2 broadcast-semi-joins the candidates into the token " +
          "scan and hash-aggregates exact counts — the output equals " +
          "brute-force GROUP BY ... HAVING but the wide vocab shuffle " +
          "is gone (billions of distinct tokens at 100 TB)."),
      ("fuzzy_contamination (cross-split near-dup decontamination)",
        "The banded-candidate + exact-verify minhash pipeline, with the " +
          "dataset-split labels joined onto the VERIFIED pair list only " +
          "— the split join touches a few dozen rows, so fuzzy " +
          "decontamination is free when near-dup dedup already runs."),
      ("incremental_near_dups (shard-vs-index banded join)",
        "Continual-ingestion dedup: the new shard's band rows " +
          "LeftSemi-select out of the full banded index, then equi-join " +
          "back against it on (band_id, bucket) — pair cost tracks the " +
          "shard, old-vs-old pairs are structurally absent, and the " +
          "shared band subtree materializes once via exchange reuse."),
      ("event_pagerank (iterative rank joins behind a truncated lineage)",
        "The final round's plan reads the previous round from an " +
          "ExistingRDD (per-round lazy localCheckpoint — the SAME " +
          "lineage-truncation discipline as the CC loops), so round k " +
          "never replays rounds 1..k-1: what remains is exactly one " +
          "probs⋈rank hash join, one dst-keyed partial+final agg, and " +
          "the teleport projection. Edge probabilities were computed " +
          "once up front and checkpointed — iterations never re-derive " +
          "them."),
      ("term_cooccurrence (df-pruned pair self-join, shared subtree)",
        "Both sides of the pair join are the SAME pruned doc-term " +
          "frame, so its exchange plans once and is reused; the join " +
          "keys on doc_id (pairs expand co-located inside each doc's " +
          "partition), the vocabulary df bounds are applied BEFORE the " +
          "join, and minPair filters inside the pair aggregation — the " +
          "two quadratic levers the scaladoc names, visible in the " +
          "plan as pre-join Filters and a post-agg HAVING."),
      ("sorted_neighborhood_pairs (two-level rank, no monolithic window)",
        "The textbook method's global sort appears here as per-bucket " +
          "parallel row_number windows plus ONE window over the " +
          "|alphabet|-row bucket-count frame (broadcast back) — the " +
          "only serial sort in the plan runs over ≤ 256 rows. The " +
          "neighborhood itself is an exploded EQUI-join on rank+i; " +
          "the native graft_jaro_winkler scores inside the generated " +
          "stage after the join."),
      ("doc_chunks (RAG chunking, zero exchanges)",
        "The whole overlap grid — sequence of starts, posexplode, " +
          "substr + md5 — runs inside one narrow codegen'd segment: " +
          "no Exchange node exists in the plan, so the chunk " +
          "multiplier rides the scan's parallelism untouched " +
          "(PlanAuditSpec pins this)."),
      ("cooccurrence_triangles (degree-oriented wedge closure)",
        "Every join is an equi-join: the wedge join keys on the shared " +
          "low vertex, the closure keys on (b, c) because the closing " +
          "edge is oriented by the SAME (degree, id) total order the " +
          "wedge carries as a struct comparison — the OR-condition " +
          "nested loop the naive formulation plans is structurally " +
          "absent, and the celebrity-node d² wedge pile-up cannot " +
          "form (out-degree is O(√m) after orientation)."),
      ("pareto_frontier (collapsed-frame skyline)",
        "The corpus aggregates to one row per distinct 4dp alpha " +
          "BEFORE the only Window in the plan — the window's child is " +
          "the HashAggregate, so the strict-better running max sorts " +
          "≤ 10⁴ rows, never documents; membership is one join back. " +
          "No dominance self-join, no corpus-wide sort."),
      ("jaccard_prefix_pairs (lossless prefix-filtered similarity join)",
        "The candidate join's both sides are the PREFIX index — the " +
          "rank window keeps only each doc's first n−⌈t·n⌉+1 shingles " +
          "in the global (df ASC, h ASC) order, so posting lists skew " +
          "toward RARE shingles and the df² blow-up of hot shingles is " +
          "structurally confined to suffixes. The checkpointed posting " +
          "frame feeds the df agg, the rank window, and both verify " +
          "joins from one materialization; verification is two " +
          "doc_id-keyed hash joins over the candidate list only — " +
          "exact output with NO df cap and no soundness precondition."),
      ("cusum_changepoints (closed-form windows, one exchange)",
        "All four windowed quantities (running sum, row_number, " +
          "per-type total and day count) and the final max-|cusum| " +
          "flag share ONE hashpartitioning(event_type) exchange over " +
          "the DAY-grain frame — the log collapses to (type, day) " +
          "counts first, so every sort ranks calendar days, never " +
          "events. No double is ever summed: cusum_k = S_k − k·mean " +
          "on exact integers keeps the gate float-drift-free."),
      ("bitmap_distinct_rollup (mergeable exact distincts, no Expand)",
        "Both grains are ObjectHashAggregate over the native bitmap " +
          "aggregate: day groups fold raw ids into fixed-size blobs " +
          "(partial+final), and the week rollup ORs those blobs — " +
          "count(DISTINCT)'s Expand + re-shuffle of raw rows is " +
          "absent, and the week stage's input is calendar-sized. At " +
          "100 TB the day blobs persist once and every coarser " +
          "distinct is sketch-free blob algebra with ZERO error."),
      ("linear_attribution (per-user band join, credit in integers)",
        "The touch⋈conversion join hashes on user_id with the 7-day " +
          "band as a residual predicate — never a cartesian; the " +
          "per-conversion fan-out is bounded by per-user activity. " +
          "Credit is 1000000 div n in BIGINT all the way to the final " +
          "projection, so the only double op in the plan is the last " +
          "display division."),
      ("rolling_distinct_users (bitmap blobs under a RANGE window)",
        "The native TypedImperativeAggregate runs twice: as the " +
          "grouped day-bitmap build (ObjectHashAggregate, partial+" +
          "final — the distributed pass over raw events), then as a " +
          "WINDOW aggregate sliding a 7-day RANGE frame over the " +
          "calendar-cardinality day frame. Each output day ORs ≤7 " +
          "fixed-size blobs; no Expand, no re-scan per window offset " +
          "— the exact sliding DISTINCT neither count partials nor " +
          "count(DISTINCT) partials can express."),
      ("user_day_streaks (gaps-and-islands on the distinct day grid)",
        "The DISTINCT (user, day) pre-collapse is the plan's load-" +
          "bearing move: the Window's child is the distinct " +
          "HashAggregate, so the per-user sort ranks calendar days " +
          "(≤365/user/yr), never raw events. Both the distinct and " +
          "the window hash-partition on user-led keys; the two " +
          "stacked groupBys after it are partial+final aggregates."),
      ("sequence_packing (composite two-level prefix sum, r15 rewrite)",
        "The token count is a codegen'd regexp expression inside the " +
          "scan projection. The per-source running offset no longer " +
          "rides a flat source-partitioned window (a ~4-value domain " +
          "puts each source's WHOLE corpus through one task at scale): " +
          "RankOps.groupedRunningSum buckets on −n_tokens, runs the " +
          "prefix inside (source, bucket) windows, prefix-sums the " +
          "per-(source, bucket) totals on a bounded frame, and " +
          "broadcasts the offsets back. Sequence index and straddle " +
          "flag stay integer `div` arithmetic; the (source, seq) " +
          "rollup is a partial+final hash aggregate."),
      ("ewma_daily_counts (banded self-join on the collapsed frame)",
        "Both join inputs are the SAME (type, day) hash aggregate — " +
          "the raw log collapses to calendar cardinality before any " +
          "pair work, and the 30-day band rides the event_type " +
          "equi-key as a residual range predicate (a hash join, " +
          "never a nested loop). The 2^(29-lag) weight is exact " +
          "integer arithmetic in the post-join aggregate; the only " +
          "double op in the plan is the final display division by " +
          "2^30."),
      ("session_overlap_pairs (hour-banded interval join, canonical-band dedup)",
        "Interval×interval overlap as a co-partitioned EQUI-join on " +
          "the hour band each session explodes to — band granularity " +
          "tracks session duration, so the Σ bucket² term stays " +
          "population-of-an-hour sized, and the overlap-start-band " +
          "equality keeps each pair exactly once with no distinct " +
          "shuffle (the multi-band copies die in a codegen'd filter). " +
          "The rollup aggregates map-side; nothing is re-shuffled " +
          "after the join."),
      ("incremental_near_dups_indexed (stored-index pairing, text via semi-join)",
        "The continual-ingestion contract with the banded signature " +
          "index as the STORED artifact: the old corpus enters as " +
          "narrow band rows (never re-banded), bucket caps apply over " +
          "the unioned index at pairing time, and old TEXT is read " +
          "only through the candidate-id semi-join of the verify pass " +
          "— shingling is candidate-bounded on both sides."),
      ("unimax_allocation (exact BIGINT waterfill on the collapsed frame)",
        "The corpus collapses to one row per source before any " +
          "window; the ascending prefix sums, the crossover argmin and " +
          "the uniform split are all exact integer arithmetic over the " +
          "|sources|-row frame, with two 1-row broadcasts carrying the " +
          "crossover constants back — the serial windows in this plan " +
          "rank sources, never data."),
      ("theil_sen_trend (calendar²-bounded pairwise-slope join)",
        "The log collapses to the dense (type, day) grid first; the " +
          "slope self-join keys on event_type with x<y as a residual, " +
          "so its cost is |days|² per type — a constant of the " +
          "observation window — and every slope is one exact-integer " +
          "division. The median runs per type over those bounded " +
          "slope sets."),
      ("silhouette_by_label (broadcast centroids, index-order distance folds)",
        "The |labels|-row centroid frame broadcasts once; each vector " +
          "scores against all centroids in a single projected " +
          "zip_with/aggregate fold (no shuffle per label), and the a/b " +
          "extraction plus the DECIMAL-exact label means are two " +
          "narrow hash aggregations — O(n·labels·dim) with one " +
          "broadcast and two exchanges in the whole plan."),
      ("growth_accounting (one lag window, day-shifted equi-join)",
        "The DISTINCT (user, day) collapse bounds the lag Window to " +
          "active-day cardinality; the churn term joins the daily " +
          "frame to itself on the MATERIALIZED date_add(day, 1) key — " +
          "an equi-join on tiny frames, so the reconciliation " +
          "identity churned(d) = active(d-1) - retained(d) costs one " +
          "calendar-sized hash join, not a second scan."),
      ("knn_pq_rerank (codes-only ADC shortlist + exact re-rank)",
        "The encode scan evaluates the native graft_pq_block_l2 inside " +
          "codegen against the 64-row broadcast codebook (the HOF " +
          "fold's interpreted ~2µs/eval was the first cut's 16s); the " +
          "ADC stage joins the m-codes table to an m·|codes| lookup " +
          "frame and collapses per vector — no raw floats anywhere " +
          "until the exact re-rank touches exactly the shortlist-sized " +
          "LeftSemi candidate set."),
      ("knn_ivf_pq_residual (classic residual IVF-PQ, per-list ADC tables)",
        "Coarse assignment and residuals are localCheckpointed index " +
          "artifacts (built once, lineage truncated); residual codes " +
          "join their list's OWN query-residual table on (list_id, " +
          "block, code) — unprobed lists die in the inner join, and " +
          "the table frame is nprobe·|codes|·m cells broadcast. The " +
          "fp64 residual path rides the same native expression."),
      ("embedding_isotropy (the all-pairs mean with no pair join)",
        "The plan contains NO join over vectors: one posexplode + one " +
          "(label, dim) hash agg collapse the corpus, the ALL row " +
          "derives from the per-label sums frame, and the mean " +
          "pairwise cosine falls out of the sum-vector identity " +
          "‖Σv̂‖² − n. O(n·d) for an O(n²) question."),
      ("isotonic_calibration (PAV via the minimax triple join)",
        "The corpus appears once — the bin collapse; everything after " +
          "runs on the ≤10-row checkpointed bin frame: exact prefix " +
          "sums, the (i,j,k) broadcast triple join, two tiny " +
          "aggregations. The sequential pool-adjacent-violators loop " +
          "is structurally absent."),
      ("propensity_stratified_ate (globalNtile strata, no serial user sort)",
        "The user collapse feeds the two-level distributed ntile: " +
          "per-bucket parallel windows plus one window over the " +
          "bounded bucket-count frame — no unpartitioned sort touches " +
          "the user frame (the serial-window sweep pins this); the " +
          "stratum cells and the micro-unit ATE are two tiny " +
          "aggregations with a broadcast join back."),
      ("quantile_normalize_by_type (both ranks two-level, r15 rewrite)",
        "The within-type rank now runs through RankOps.groupedRank — " +
          "(event_type, cents-bucket) windows plus a per-type bounded " +
          "offset prefix, broadcast back — beside globalRank's global " +
          "side, so NO window anywhere partitions a data-proportional " +
          "frame by the ~5-value type domain. The position map is one " +
          "equi-join on j; the r15 tiny-domain sweep gates this shape " +
          "across all registered queries."),
      ("packed_shards (shard-grain packing, windows char-bounded)",
        "shardAssignments' doc-grain char prefix (groupedRunningSum) " +
          "assigns shard_id, then the packing window partitions by " +
          "(source, shard_id) — every partition holds ≤ shardChars of " +
          "docs BY CONSTRUCTION, the form a data loader can pack " +
          "independently; PlanAuditSpec asserts no window exceeds " +
          "shard grain."),
      ("knn_hamming (sign codes: XOR+popcount scan, native top-k)",
        "Sign bits pack into 32-bit words inside the scan projection " +
          "(32× smaller than the float corpus); the all-pairs scan is " +
          "a broadcast of the 8-byte code table with bit_count(xor) " +
          "in codegen — zero float math — and the per-query top-k is " +
          "the TopKPerGroup capped-heap operator, not a window sort."),
      ("knn_hamming_rerank (codes-only shortlist + exact re-rank)",
        "Stage 1 touches ONLY codes (the 1/32-width scan); stage 2 " +
          "joins floats back for n·shortlist pairs on vec_id equi-keys " +
          "and keeps the cosine top-k in the native heap operator — " +
          "recall@5 0.31 → 0.60 on this corpus for 1/32 of the scan " +
          "bytes plus a constant-size re-rank."),
      ("holt_winters_daily (calendar-grid HOF recursion)",
        "One (day) hash aggregate is the only corpus-sized work; the " +
          "zero-filled calendar grid collapses to a single array row " +
          "and the entire Holt-Winters recursion runs as one aggregate " +
          "HOF over it — no iterative joins, no serial window, " +
          "bit-identical to the oracle's recursive CTE."),
      ("stationary_type_distribution (power iteration on one row)",
        "After the (from, to) count collapse the transition matrix " +
          "lives in a single |types|²-cell row; 20 power iterations " +
          "are nested HOF folds over that row — data-size-independent " +
          "arithmetic, no driver collect, no per-iteration join."),
      ("markov_removal_attribution (k+1 absorption chains, one row)",
        "The journey collapse leaves one packed channel-matrix row; " +
          "the base chain and every per-channel removal chain run as " +
          "30-step HOF folds over it through ONE code path (removal " +
          "index 0 = the never-matching base sentinel) — (k+1)·30·k² " +
          "arithmetic that never touches the corpus again."),
      ("mmr_diverse_topk (sequential greedy, bounded driver traffic)",
        "The relevance frame checkpoints once; each of the k greedy " +
          "steps is one distributed scan against the ≤k-row broadcast " +
          "selected set with a 1-row top-1 collect — k rows total " +
          "cross the driver, and the inherently-sequential part is " +
          "the step ORDER, not the scan."),
      ("conformal_daily_intervals (BIGINT end to end)",
        "Residuals are day+7 equi-join count differences on the " +
          "zero-filled calendar; the conformal quantile is an exact " +
          "integer order statistic off the collapsed |e| grid; the " +
          "plan contains no double arithmetic at all."),
      ("source_ngram_novelty (token-pinning barrier, one gram exchange)",
        "Tokens pin behind a doc-grain repartition (the shingleRows " +
          "lesson: letting CollapseProject inline split() into every " +
          "per-shingle element_at measured ~9 s of re-tokenization at " +
          "sf0.1 — fixed to 0.7 s); collect_set de-dups map-side so " +
          "the ONE wide exchange carries each gram once, and the " +
          "join-back over gram strings is replaced by an explode of " +
          "the ≤|sources|-element sets."),
      ("neardup_threshold_sweep (one pair materialization, 7 rungs)",
        "The 0.3-rung candidate chain materializes once; the ladder " +
          "is an explode + integer ten-thousandth compares over that " +
          "frame — re-running the pair join per threshold is " +
          "structurally absent."),
      ("hilbert_layout_audit (unrolled xy2d walk inside codegen)",
        "The 4-plane Hilbert rotation is a pure Column expression tree " +
          "in the scan stage — bit tests, compares and ±/× only, no " +
          "UDF; one hash agg over 256 structural cells."),
      ("jonckheere_latency_trend (pooled-grid prefix pair counting)",
        "The v<v theta join is structurally absent: per-group " +
          "strictly-below prefixes over the dense (priority, days) " +
          "grid pair through a value EQUI-join — the grid-squared " +
          "nested loop this replaced cost 14 s at sf0.1."),
      ("rocchio_prf_docs (two micro-pinned BM25 passes + term mining)",
        "Corpus explode feeds all three passes; feedback docs and " +
          "expansion terms are ≤ fbDocs/fbTerms-row broadcasts; every " +
          "cut orders micro-pinned exact integers so no boundary ulp " +
          "can flip the feedback set."),
      ("page_hinkley_by_type (micro-pinned drift over the daily grid)",
        "One (type, day) hash agg; the per-type windows order " +
          "calendar-length partitions of the collapsed frame — exact " +
          "integer PH statistics end to end."),
      ("revenue_var_cvar (interpolated VaR + exact worst-k tail)",
        "Daily collapse localCheckpoints once; the worst-k selection " +
          "counts strictly-below keys over the calendar-bounded frame " +
          "instead of sorting it — no data-proportional single-task " +
          "sort anywhere."),
    )
    val dfs = Map(
      "pricing_summary" -> SparkEntry.queries("pricing_summary"),
      "revenue_by_nation" -> SparkEntry.queries("revenue_by_nation"),
      "latest_per_user" -> SparkEntry.queries("latest_per_user"),
      "range_join_pairs" -> SparkEntry.queries("range_join_pairs"),
      "minhash_near_dups" -> SparkEntry.queries("minhash_near_dups"),
      "knn_brute" -> SparkEntry.queries("knn_brute"),
      "knn_all_lsh" -> SparkEntry.queries("knn_all_lsh"),
      "winnowed_fingerprints" -> SparkEntry.queries("winnowed_fingerprints"),
      "tpch_q18" -> SparkEntry.queries("tpch_q18"),
      "tfidf_top_terms" -> SparkEntry.queries("tfidf_top_terms"),
      "shard_assignments" -> SparkEntry.queries("shard_assignments"),
      "knn_all_brute" -> SparkEntry.queries("knn_all_brute"),
      "scd2_type_history" -> SparkEntry.queries("scd2_type_history"),
      "trailing_revenue_30d" -> SparkEntry.queries("trailing_revenue_30d"),
      "heavy_hitter_terms" -> SparkEntry.queries("heavy_hitter_terms"),
      "fuzzy_contamination" -> SparkEntry.queries("fuzzy_contamination"),
      "incremental_near_dups" -> SparkEntry.queries("incremental_near_dups"),
      "event_pagerank" -> SparkEntry.queries("event_pagerank"),
      "term_cooccurrence" -> SparkEntry.queries("term_cooccurrence"),
      "sorted_neighborhood_pairs" ->
        SparkEntry.queries("sorted_neighborhood_pairs"),
      "doc_chunks" -> SparkEntry.queries("doc_chunks"),
      "cooccurrence_triangles" -> SparkEntry.queries("cooccurrence_triangles"),
      "pareto_frontier" -> SparkEntry.queries("pareto_frontier"),
      "user_day_streaks" -> SparkEntry.queries("user_day_streaks"),
      "jaccard_prefix_pairs" -> SparkEntry.queries("jaccard_prefix_pairs"),
      "cusum_changepoints" -> SparkEntry.queries("cusum_changepoints"),
      "bitmap_distinct_rollup" -> SparkEntry.queries("bitmap_distinct_rollup"),
      "linear_attribution" -> SparkEntry.queries("linear_attribution"),
      "rolling_distinct_users" -> SparkEntry.queries("rolling_distinct_users"),
      "sequence_packing" -> SparkEntry.queries("sequence_packing"),
      "ewma_daily_counts" -> SparkEntry.queries("ewma_daily_counts"),
      "growth_accounting" -> SparkEntry.queries("growth_accounting"),
      "session_overlap_pairs" -> SparkEntry.queries("session_overlap_pairs"),
      "incremental_near_dups_indexed" ->
        SparkEntry.queries("incremental_near_dups_indexed"),
      "unimax_allocation" -> SparkEntry.queries("unimax_allocation"),
      "theil_sen_trend" -> SparkEntry.queries("theil_sen_trend"),
      "silhouette_by_label" -> SparkEntry.queries("silhouette_by_label"),
      "knn_pq_rerank" -> SparkEntry.queries("knn_pq_rerank"),
      "knn_ivf_pq_residual" -> SparkEntry.queries("knn_ivf_pq_residual"),
      "embedding_isotropy" -> SparkEntry.queries("embedding_isotropy"),
      "isotonic_calibration" -> SparkEntry.queries("isotonic_calibration"),
      "propensity_stratified_ate" ->
        SparkEntry.queries("propensity_stratified_ate"),
      "quantile_normalize_by_type" ->
        SparkEntry.queries("quantile_normalize_by_type"),
      "packed_shards" -> SparkEntry.queries("packed_shards"),
      "knn_hamming" -> SparkEntry.queries("knn_hamming"),
      "knn_hamming_rerank" -> SparkEntry.queries("knn_hamming_rerank"),
      "holt_winters_daily" -> SparkEntry.queries("holt_winters_daily"),
      "stationary_type_distribution" ->
        SparkEntry.queries("stationary_type_distribution"),
      "markov_removal_attribution" ->
        SparkEntry.queries("markov_removal_attribution"),
      "mmr_diverse_topk" -> SparkEntry.queries("mmr_diverse_topk"),
      "conformal_daily_intervals" ->
        SparkEntry.queries("conformal_daily_intervals"),
      "source_ngram_novelty" -> SparkEntry.queries("source_ngram_novelty"),
      "neardup_threshold_sweep" ->
        SparkEntry.queries("neardup_threshold_sweep"),
      "hilbert_layout_audit" -> SparkEntry.queries("hilbert_layout_audit"),
      "jonckheere_latency_trend" ->
        SparkEntry.queries("jonckheere_latency_trend"),
      "rocchio_prf_docs" -> SparkEntry.queries("rocchio_prf_docs"),
      "page_hinkley_by_type" -> SparkEntry.queries("page_hinkley_by_type"),
      "revenue_var_cvar" -> SparkEntry.queries("revenue_var_cvar"),
    )

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append("Captured from `spark.explain(\"formatted\")` at sf0.001 with\n")
    sb.append("`GraftExtensions` active. Regenerate with `sbt \"runMain " +
      "graft.DrivePlans\"`.\n\n")
    sb.append(
      "Bench noise (r3 and r4 both published load-contaminated " +
        "artifacts): trust `BENCH_FLOOR.md` — quiet-box per-query " +
        "medians recorded round 5 — over any single `BENCH_rN.json`, " +
        "and check that artifact's own `\"sentinel\"`/`\"contaminated\"` " +
        "fields (Bench stamps runs whose load sentinel swings >30%). " +
        "`SPARK_GRAFT_ONLY=<q1,q2>` slices the bench for isolated " +
        "diagnosis runs.\n")
    sections.foreach { case (title, note) =>
      val name = title.split(" ").head
      val df = dfs(name)(spark, sfDir)
      val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      sb.append(s"\n## $title\n\n$note\n\n```\n$plan```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
