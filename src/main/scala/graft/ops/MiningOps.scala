package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over the document corpus — association
  * rules (support / confidence / lift) between co-occurring terms, the
  * market-basket shape with documents as baskets and vocabulary terms
  * as items. The reference has no mining operators; this is the
  * corpus-diagnostics companion to the tf-idf / distinctive-terms
  * family in [[DocOps]]: which term PAIRS travel together far more
  * often than their marginals predict.
  *
  * Scale shape (100 TB posture): the naive all-pairs-per-document
  * expansion is O(len²) and dies on stopwords. Both quadratic levers
  * are bounded BEFORE the self-join:
  *
  *  - document-frequency pruning: terms outside [minDf, maxDfShare·N]
  *    never enter the pair join — the upper bound removes the
  *    ubiquitous terms that dominate the quadratic cost (a term in
  *    half the corpus would alone generate ~N²/8 pairs);
  *  - `minPair` support filtering happens INSIDE the pair aggregation
  *    (HAVING on the grouped count), so the rare-pair long tail never
  *    materializes downstream.
  *
  * The pair join itself keys on `doc_id` — both sides are the SAME
  * pruned doc-term frame, so the exchange is planned once and reused
  * (shared-subtree self-join, as in [[VectorOps.semDedupPairs]]), and
  * pair expansion happens co-located within each doc's partition.
  */
object MiningOps {

  /** Association rules between distinct-term pairs. Output per pair
    * (term_a < term_b, binary string order on both engines):
    * `n_pair` co-occurrence count, `support` = n_pair/N,
    * `conf_a_b` = P(b|a), `conf_b_a` = P(a|b), and
    * `lift` = P(a,b)/(P(a)·P(b)) — all divisions in DOUBLE with the
    * operand order pinned to match the DuckDB oracle, rounded 6dp. */
  def termCooccurrence(docs: DataFrame, minDf: Long = 20,
      maxDfShare: Double = 0.9, minPair: Long = 10): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val dt = docs
      .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("term"))
      .distinct()
    val df = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val vocab = df.crossJoin(broadcast(nDocs))
      .filter(col("df") >= minDf &&
        col("df").cast("double") <= lit(maxDfShare) * col("n").cast("double"))
      .select("term", "df")
    val dtv = dt.join(vocab.select("term"), "term")
      .select("doc_id", "term")
    val pairs = dtv.as("a")
      .join(dtv.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
    pairs
      .join(vocab.select(col("term").as("term_a"), col("df").as("df_a")), "term_a")
      .join(vocab.select(col("term").as("term_b"), col("df").as("df_b")), "term_b")
      .crossJoin(broadcast(nDocs))
      .select(col("term_a"), col("term_b"), col("n_pair"),
        round(col("n_pair").cast("double") / col("n").cast("double"), 6)
          .as("support"),
        round(col("n_pair").cast("double") / col("df_a").cast("double"), 6)
          .as("conf_a_b"),
        round(col("n_pair").cast("double") / col("df_b").cast("double"), 6)
          .as("conf_b_a"),
        // df_a·df_b in DOUBLE — two BIGINT dfs can overflow Long at
        // corpus scale (df ≤ N/2 squared exceeds 2^63 past N≈6e9).
        round(col("n_pair").cast("double") * col("n").cast("double") /
          (col("df_a").cast("double") * col("df_b").cast("double")), 6)
          .as("lift"))
  }

  /** Sparse TF-IDF cosine similarity join — the lexical-weighted
    * near-duplicate detector between the set-based n-gram Jaccard and
    * the dense embedding cosine: documents as sparse term vectors
    * w(d,t) = tf·N/df (the same linear idf as
    * [[DocOps.tfidfTopTerms]], rational so both engines compute the
    * identical double), paired through a PER-TERM inverted-index join
    * — dot products accumulate only over shared terms, never via a
    * doc×doc matrix.
    *
    * Scale shape: pair-generation cost is Σ_t df(t)² — the
    * `maxDfShare` cut removes the ubiquitous terms that dominate that
    * sum (and contribute near-zero idf weight anyway); the weight
    * frame is a shared subtree reused by the norms and both join
    * sides, so its exchange plans once. At crawl scale the df cap is
    * the knob; below it this is exact — no banding recall loss.
    * Cosines round to 6dp before the threshold (fp-error ~1e-12 on
    * these magnitudes, six orders under the rounding step). */
  def tfidfCosinePairs(docs: DataFrame, minSim: Double = 0.9,
      maxDfShare: Double = 0.9): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val tf = docs
      .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .filter(col("df").cast("double") <=
        lit(maxDfShare) * col("n").cast("double"))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * col("n").cast("double") /
          col("df").cast("double")).as("w"))
    val norms = w.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = w.as("a")
      .join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"),
        count(lit(1)).as("shared_terms"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")),
        "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared_terms"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= minSim)
  }
}
