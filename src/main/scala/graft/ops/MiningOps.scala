package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** File-local shadow of `functions.round` — every round here pins a
    * DOUBLE (scores, pinned divisions), several inside per-candidate
    * pair loops (the tf-idf cosine paths). Bit-identical fast round;
    * loud type failure on any non-double input. See the
    * [[VectorOps]] shadow for the full rationale (r17, guide §4). */
  private def round(c: Column, scale: Int): Column =
    graft.functions.RoundHalfUp.roundFused(c, scale)

  /** Association rules between distinct-term pairs. Output per pair
    * (term_a < term_b, binary string order on both engines):
    * `n_pair` co-occurrence count, `support` = n_pair/N,
    * `conf_a_b` = P(b|a), `conf_b_a` = P(a|b), and
    * `lift` = P(a,b)/(P(a)·P(b)) — all divisions in DOUBLE with the
    * operand order pinned to match the DuckDB oracle, rounded 6dp. */
  def termCooccurrence(docs: DataFrame, minDf: Long = 20,
      maxDfShare: Double = 0.9, minPair: Long = 10): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n"))
    // per-doc dedup IN-ROW (array_distinct) instead of a corpus-wide
    // `.distinct()`: the distinct key was (doc_id, term) and doc_id
    // differs across rows, so deduping inside each token array emits
    // exactly the same row set — minus one full shuffle of the
    // exploded token frame, in EVERY cooccurrence_* query that builds
    // this graph (r17, guide §2.4)
    val dt = docs
      .select(col("doc_id"),
        explode(array_distinct(DedupOps.tokens(col("text")))).as("term"))
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

  /** Okapi BM25 ranked retrieval — the classic lexical scoring
    * function behind full-text search (Robertson & Zaragoza '09), here
    * as a batch top-k over the corpus for a fixed term query: the
    * retrieval primitive an LLM data pipeline uses to pull candidate
    * context documents before embedding re-rank. Uses the Lucene
    * BM25 idf variant `ln((N - df + 0.5)/(df + 0.5) + 1)` (always
    * positive, so a ubiquitous term damps rather than flips a score).
    *
    * Scale shape: the query term set is a tiny literal `isin` filter
    * pushed into the one token explode — per-doc work is O(matched
    * terms), never O(vocabulary); df and corpus stats (N, avgdl) are
    * single-row / |Q|-row aggregates broadcast back; the final top-k
    * is ORDER BY + LIMIT, which Spark plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort). No self-joins anywhere —
    * this stays linear in corpus size at any SF.
    *
    * Determinism contract with the oracle: every ratio is computed in
    * DOUBLE with pinned operand order, the score rounds to 6dp BEFORE
    * ordering, and ties break on doc_id — so the k-th boundary is
    * stable across engines. */
  /** Market-basket affinity over the order book: which part pairs
    * co-occur in the same order more often than their popularity
    * predicts (lift > 1)? The star-schema counterpart of
    * [[termCooccurrence]] — the same support/confidence/lift
    * semantics, but the basket is `l_orderkey` and the item is
    * `l_partkey`, i.e. the recommendation-seed query a retailer runs
    * on exactly this schema.
    *
    * Scale: the pair join is per-ORDER — Σ (parts-per-order choose 2),
    * linear in orders because basket width is a domain constant
    * (TPC-H ~7 lines) — never all-pairs over the catalog. Counts and
    * df's are exact BIGINTs; support/lift are pinned double ratios,
    * 6dp. `minPairs` prunes the long random tail BEFORE the stat
    * joins. */
  def partAffinityPairs(lineitem: DataFrame, minPairs: Long = 3): DataFrame = {
    val dp = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = dp.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val df = dp.groupBy(col("l_partkey")).agg(count(lit(1)).as("df"))
    val pairs = dp.as("a").join(dp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"),
        col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairs)
    pairs
      .join(df.select(col("l_partkey").as("part_a"), col("df").as("df_a")),
        "part_a")
      .join(df.select(col("l_partkey").as("part_b"), col("df").as("df_b")),
        "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_pair"),
        col("df_a"), col("df_b"),
        round(col("n_pair").cast("double") /
          col("n_orders").cast("double"), 6).as("support"),
        round(col("n_pair").cast("double") * col("n_orders").cast("double") /
          (col("df_a").cast("double") * col("df_b").cast("double")), 6)
          .as("lift"))
  }

  def bm25TopDocs(docs: DataFrame,
      queryTerms: Seq[String] = Seq("join", "filter", "scan"),
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    val toks = docs.select(col("doc_id"),
      DedupOps.tokens(col("text")).as("toks"))
    // one row: N and avgdl (total token count / N, both exact BIGINTs
    // until the single division)
    val stats = toks.agg(
      count(lit(1)).as("n"),
      sum(size(col("toks")).cast("long")).as("total_len"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("total_len").cast("double") / col("n").cast("double")
    val idf = log(
      (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val termScore = idf *
      (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    tf.join(df, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id", "dl")
      .agg(round(sum(termScore), 6).as("bm25"),
        count(lit(1)).as("n_matched"))
      .select("doc_id", "bm25", "n_matched", "dl")
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty '01) — the language-modeling scorer beside
    * [[bm25TopDocs]] (the two classic lexical rankers disagree
    * exactly where smoothing matters, which is why eval suites run
    * both):
    *
    *   score(q, d) = Σ_{w∈q} ln( (tf_{w,d} + μ·P(w|C)) / (dl_d + μ) ),
    *
    * μ = 2000 (the standard default, stated), P(w|C) the corpus
    * unigram. Unlike BM25 every query term scores every document
    * (absent terms pay the smoothed penalty), so the scoring frame is
    * |docs| × |q| by construction; query terms absent from the corpus
    * entirely are skipped (stated — their likelihood is undefined).
    *
    * Determinism: each term score is one pinned ln chain of exact
    * integers re-pinned to BIGINT micro-units BEFORE the per-doc sum
    * (the pinballLoss discipline — the sum is exact whatever the
    * aggregation order), one 6dp round at the end; ties pin doc_id.
    * Shape: one corpus-sized tokenize/explode for tf + dl; everything
    * after is |docs| × |q| with broadcast term stats and a
    * TakeOrderedAndProject top-k. */
  def qlmTopDocs(docs: DataFrame,
      queryTerms: Seq[String] = Seq("join", "filter", "scan"),
      mu: Double = 2000.0, topK: Int = 20): DataFrame = {
    val toks = docs.select(col("doc_id"),
      DedupOps.tokens(col("text")).as("toks"))
    val stats = toks.agg(sum(size(col("toks")).cast("long")).as("c_total"))
    val dl = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"))
    val hits = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tfq = hits.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val ctf = hits.groupBy("term").agg(count(lit(1)).as("ctf"))
    val qt = stats.select(
      explode(array(queryTerms.map(lit(_)): _*)).as("term"), col("c_total"))
    val scoring = dl.crossJoin(broadcast(
        qt.join(ctf, Seq("term")))) // inner join skips corpus-absent terms
      .join(tfq, Seq("doc_id", "term"), "left")
    val pw = col("ctf").cast("double") / col("c_total").cast("double")
    val s = log((coalesce(col("tf"), lit(0L)).cast("double") +
      lit(mu) * pw) / (col("dl").cast("double") + lit(mu)))
    scoring
      .select(col("doc_id"), col("dl"),
        round(s * lit(1000000.0), 0).cast("long").as("sm"),
        when(col("tf").isNotNull, 1L).otherwise(0L).as("m"))
      .groupBy("doc_id", "dl")
      .agg(sum(col("sm")).as("ssm"), sum(col("m")).as("n_matched"))
      .select(col("doc_id"), col("dl"), col("n_matched"),
        round(col("ssm").cast("double") / lit(1000000.0), 6)
          .as("qlm_score"))
      .orderBy(col("qlm_score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Jelinek–Mercer smoothed query likelihood — the fixed-λ linear
    * interpolation twin of [[qlmTopDocs]]' Dirichlet prior (Zhai &
    * Lafferty '01): score(d) = Σ_q ln((1−λ)·tf/dl + λ·ctf/C). JM
    * smooths every document by the same amount where Dirichlet adapts
    * to length — on verbose queries JM is the published stronger
    * baseline, so a retrieval stack wants both knobs.
    *
    * Determinism (the qlmTopDocs discipline verbatim): corpus-absent
    * query terms drop via the inner ctf join (their contribution is a
    * rank-irrelevant constant), per-term ln's micro-pin to BIGINT
    * BEFORE the per-doc sum, one unpin, (score DESC, doc_id) top-k.
    * λ·ctf/C > 0 for every surviving term, so the ln argument is
    * never 0 even at tf = 0. */
  def jmQlmTopDocs(docs: DataFrame,
      queryTerms: Seq[String] = Seq("join", "filter", "scan"),
      lambda: Double = 0.5, topK: Int = 20): DataFrame = {
    val toks = docs.select(col("doc_id"),
      DedupOps.tokens(col("text")).as("toks"))
    val stats = toks.agg(sum(size(col("toks")).cast("long")).as("c_total"))
    val dl = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"))
    val hits = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tfq = hits.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val ctf = hits.groupBy("term").agg(count(lit(1)).as("ctf"))
    val qt = stats.select(
      explode(array(queryTerms.map(lit(_)): _*)).as("term"), col("c_total"))
    val scoring = dl.crossJoin(broadcast(
        qt.join(ctf, Seq("term")))) // inner join skips corpus-absent terms
      .join(tfq, Seq("doc_id", "term"), "left")
    val s = log(
      lit(1.0 - lambda) * coalesce(col("tf"), lit(0L)).cast("double") /
        col("dl").cast("double") +
        lit(lambda) * (col("ctf").cast("double") /
          col("c_total").cast("double")))
    scoring
      .select(col("doc_id"), col("dl"),
        round(s * lit(1000000.0), 0).cast("long").as("sm"),
        when(col("tf").isNotNull, 1L).otherwise(0L).as("m"))
      .groupBy("doc_id", "dl")
      .agg(sum(col("sm")).as("ssm"), sum(col("m")).as("n_matched"))
      .select(col("doc_id"), col("dl"), col("n_matched"),
        round(col("ssm").cast("double") / lit(1000000.0), 6)
          .as("jm_score"))
      .orderBy(col("jm_score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Rank-biased overlap between the BM25 and Dirichlet-QLM top-k
    * ranklists (Webber, Moffat & Zobel '10): the standard similarity
    * for INDEFINITE rankings — top-weighted (persistence p = 0.9
    * ⇒ ~90% of the weight in the first ~10 ranks), defined when the
    * lists disagree on membership, which Kendall/Spearman are not.
    * The retrieval-stack regression gate: a scorer tweak that leaves
    * RBO ≈ 1 changed nothing a user sees.
    *
    * RBO_ext = (X_k/k)·p^k + ((1−p)/p)·Σ_{d≤k} (X_d/d)·p^d with X_d
    * the overlap of the two depth-d prefixes. Determinism: ranks are
    * the two queries' pinned (score DESC, doc_id) orders; X_d are
    * exact counts; every p^d weight is ONE Scala-computed double
    * injected verbatim into both rails, and each term micro-pins to
    * nano units BEFORE the depth sum. Shape: both ranklists are
    * TakeOrdered top-k frames; everything after is k-bounded. */
  def retrievalRboBm25Qlm(docs: DataFrame,
      queryTerms: Seq[String] = Seq("join", "filter", "scan"),
      k: Int = 20, p: Double = 0.9): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    // ranks by COUNTING strictly-better (score, id) keys over the
    // ≤k-row frame (the rrfFusedDocs discipline) — no serial window,
    // identical to row_number under the total order
    def rankByCount(df: DataFrame, score: String,
        out: String): DataFrame =
      df.as("x").join(broadcast(df.as("y")),
          col(s"y.$score") > col(s"x.$score") ||
            (col(s"y.$score") === col(s"x.$score") &&
              col("y.doc_id") < col("x.doc_id")), "left")
        .groupBy(col("x.doc_id").as("doc_id"))
        .agg((count(col("y.doc_id")) + lit(1L)).as(out))
    val a = rankByCount(
      bm25TopDocs(docs, queryTerms, topK = k)
        .select(col("doc_id"), col("bm25")), "bm25", "ra")
    val b = rankByCount(
      qlmTopDocs(docs, queryTerms, topK = k)
        .select(col("doc_id"), col("qlm_score")), "qlm_score", "rb")
    val shared = a.join(b, "doc_id")
      .select(greatest(col("ra"), col("rb")).as("rmax"))
    val depths = (1 to k).map(d => (d.toLong, math.pow(p, d)))
      .toDF("d", "pd")
    val xc = broadcast(depths).crossJoin(shared)
      .groupBy("d", "pd")
      .agg(sum(when(col("rmax") <= col("d"), 1L).otherwise(0L)).as("x0"))
    val xd = depths.join(xc.select(col("d"), col("x0")), Seq("d"), "left")
      .select(col("d"), col("pd"), coalesce(col("x0"), lit(0L)).as("x"))
    val tm = round(col("x").cast("double") / col("d").cast("double") *
      col("pd") * lit(1.0e9), 0).cast("long")
    val s = xd.select(col("d"), col("x"), tm.as("tm"))
      .agg(sum("tm").as("stm"),
        max(when(col("d") === k.toLong, col("x"))).as("xk"))
    s.select(lit(k.toLong).as("k"), col("xk").as("overlap_at_k"),
      round(col("xk").cast("double") / lit(k.toDouble) *
        lit(math.pow(p, k)) +
        lit((1.0 - p) / p) *
          (col("stm").cast("double") / lit(1.0e9)), 6).as("rbo_ext"))
  }

  /** Reciprocal-rank fusion of the lexical BM25 ranklist with the
    * dense embedding-cosine ranklist — the standard hybrid-retrieval
    * combiner (Cormack et al. '09): score(d) = Σ_lists 1/(k + rank_d),
    * rank-based so the two lists' incommensurable score scales never
    * need calibration, and a document missing from one list simply
    * gets no contribution from it (embeddings cover a prefix of the
    * doc-id space at larger SFs — stated, handled by the full-outer
    * join). Determinism: each list's rank is computed by COUNTING
    * strictly-better (rounded-score, id) keys over the ≤ perList-row
    * frame — a bounded broadcast nested-loop, never a serial window —
    * and the fused score is ONE two-term IEEE sum (commutative, so
    * order-free) of exact reciprocals, rounded 9dp.
    *
    * Shape: both ranklists are TakeOrdered top-perList frames; the
    * rank join and fusion run on ≤ 2·perList rows. The corpus-sized
    * work is BM25's inverted index and the one broadcast cosine pass
    * — both linear. */
  def rrfFusedDocs(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String] = Seq("join", "filter", "scan"),
      queryVecId: Long = 0L, rrfK: Int = 60, perList: Int = 20,
      topN: Int = 20): DataFrame = {
    def rankByCount(df: DataFrame, score: String): DataFrame =
      df.as("x").join(broadcast(df.as("y")),
          col(s"y.$score") > col(s"x.$score") ||
            (col(s"y.$score") === col(s"x.$score") &&
              col("y.rrf_id") < col("x.rrf_id")), "left")
        .groupBy(col("x.rrf_id").as("rrf_id"))
        .agg((count(col("y.rrf_id")) + lit(1L)).as("rnk"))
    val lex = rankByCount(
      bm25TopDocs(docs, queryTerms, topK = perList)
        .select(col("doc_id").as("rrf_id"), col("bm25")), "bm25")
      .withColumnRenamed("rnk", "lex_rank")
    val dense = rankByCount(
      VectorOps.knnBrute(embeddings, queryVecId, perList)
        .select(col("vec_id").as("rrf_id"), col("cos_sim")), "cos_sim")
      .withColumnRenamed("rnk", "dense_rank")
    lex.join(dense, Seq("rrf_id"), "full_outer")
      .select(col("rrf_id").as("doc_id"), col("lex_rank"), col("dense_rank"),
        round(
          coalesce(lit(1.0) / (lit(rrfK.toLong) + col("lex_rank")).cast("double"),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toLong) + col("dense_rank")).cast("double"),
            lit(0.0)), 9).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(topN)
  }

  /** TF-IDF cosine similarity join — the lexical-weighted
    * near-duplicate detector between the set-based n-gram Jaccard and
    * the dense embedding cosine: documents as term vectors with
    * w(d,t) = tf·N/df (the same linear idf as
    * [[DocOps.tfidfTopTerms]], rational so both engines compute the
    * identical double). Both physical strategies are EXACT and emit
    * the same frame, so one oracle gates whichever the chooser picks:
    *
    *  - SPARSE regime (big vocabulary, low df): per-term
    *    inverted-index join — cost Σ_t df(t)², dominated by the
    *    ubiquitous terms the `maxDfShare` cut removes.
    *  - DENSE regime (small vocabulary, high df — this testdata's
    *    corpus: ~31 terms each in ~80% of docs): Σ df² degenerates to
    *    ~V·N² intermediate JOIN ROWS (measured 149 s at sf0.1), while
    *    the same arithmetic as N²/2 fused-loop cosines over V-wide
    *    vectors is a few seconds — so below `maxDenseVocab` the
    *    operator pivots to per-doc dense vectors and a broadcast
    *    nested-loop all-pairs with the codegen'd `graft_cosine`
    *    (array<double> form — fp64 end-to-end, oracle bit-parity).
    *
    * The strategy choice is one tiny count over the pruned df frame —
    * the same plan-time-scalar discipline as
    * [[JoinOps.maybeBroadcast]]. Cosines round to 6dp before the
    * threshold on both paths (fp error ~1e-12 on these magnitudes). */
  def tfidfCosinePairs(docs: DataFrame, minSim: Double = 0.9,
      maxDfShare: Double = 0.9, maxDenseVocab: Int = 256): DataFrame = {
    val w = weights(docs, maxDfShare)
    val vocab = w.select("term").distinct().orderBy("term")
      .limit(maxDenseVocab + 1)
      .collect().map(_.getString(0)).toSeq
    if (vocab.size <= maxDenseVocab) tfidfCosinePairsDense(w, vocab, minSim)
    else tfidfCosinePairsSparse(w, minSim)
  }

  /** Adjacent-bigram occurrence rows (doc_id, w1, w2) — NON-distinct,
    * positional (unlike [[DedupOps.shingleRows]]'s per-doc-distinct
    * sets): the LM view of the corpus, where a bigram repeated in one
    * document counts each occurrence. Built with pure array ops
    * (`zip_with` over two slices of the token array) so no window
    * shuffle-and-sort is ever planned — the explode is the only cost,
    * exactly like the unigram token explode it sits beside. */
  private def bigramRows(docs: DataFrame): DataFrame = {
    val t = DedupOps.tokens(col("text"))
    docs.select(col("doc_id"),
        explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Pointwise mutual information over ADJACENT word pairs — the
    * collocation detector (Church & Hanks '90): word pairs that occur
    * side by side far more often than their unigram frequencies
    * predict ("new york", not "of the"). The doc-level
    * [[termCooccurrence]] asks "travel in the same document"; this
    * asks "form a phrase".
    *
    *   pmi(x,y) = ln( p(xy) / (p(x)·p(y)) )
    *            = ln( (c(xy)·Nt·Nt) / (Nb·c(x)·c(y)) )
    *
    * with c over occurrence counts, Nt total tokens, Nb total
    * bigrams. Each factor is cast to DOUBLE before multiplying
    * (exact casts — counts ≪ 2⁵³; products stay finite since each
    * factor < 2⁶³ ≪ DOUBLE max) with the operand order pinned to the
    * oracle; `ln` on the identical double is identical in both
    * engines (the contract [[graft.ops.DocOps.unigramKlBySource]]
    * established). `minCount` prunes the long tail INSIDE the bigram
    * aggregation, so rare pairs never reach the joins.
    *
    * Scale shape: two hash aggregations (bigram, unigram) over one
    * scan each, two broadcast-size scalar frames, and one join of the
    * thresholded bigram frame against the unigram counts — linear in
    * corpus size, no self-joins, map-side partials absorbing the
    * Zipf-skewed hot pairs. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 10): DataFrame = {
    val uni = docs.select(explode(DedupOps.tokens(col("text"))).as("term"))
    val cu = uni.groupBy("term").agg(count(lit(1)).as("cnt"))
    val nTok = cu.agg(sum(col("cnt")).as("n_tok"))
    val bg = bigramRows(docs)
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val nBig = bg.agg(count(lit(1)).as("n_big"))
    cb.join(cu.select(col("term").as("w1"), col("cnt").as("c1")), "w1")
      .join(cu.select(col("term").as("w2"), col("cnt").as("c2")), "w2")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBig))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log(
          col("n_pair").cast("double") * col("n_tok").cast("double") *
            col("n_tok").cast("double") /
            (col("n_big").cast("double") * col("c1").cast("double") *
              col("c2").cast("double"))), 6).as("pmi"))
  }

  /** Per-document cross-entropy under the corpus's own add-one-
    * smoothed bigram language model — the classic LM-quality filter
    * (CCNet / Wenzek et al. '20 score documents with exactly this
    * shape, there under an external KenLM): documents whose word
    * transitions are improbable under the corpus's aggregate
    * statistics (boilerplate, gibberish, wrong-language fragments)
    * surface with high entropy.
    *
    *   H(d) = −(1/m) Σ_{(w1,w2)∈d} ln( (c(w1 w2)+1) / (c(w1)+V) )
    *
    * with m the document's bigram count, c the corpus occurrence
    * counts, V the vocabulary size (Laplace smoothing — every corpus
    * bigram has c ≥ 1, so the log is always finite even without it,
    * but the smoothed form is the one that generalizes to scoring
    * held-out text). Single-doc documents (< 2 tokens) have no
    * bigrams and are excluded, mirroring the oracle.
    *
    * Scale shape: the corpus model is ONE bigram hash agg + ONE
    * unigram hash agg; scoring joins each document's bigram
    * occurrences against those counts (both joins keyed on the
    * Zipf-hot bigram/unigram — map-side partials on the per-doc
    * aggregation absorb the skew) and collapses to one row per doc.
    * The per-doc Σ of ln terms is summed in one aggregation and
    * rounded 6dp — the same summation-order-absorbing convention as
    * [[graft.ops.DocOps.unigramKlBySource]]. */
  def bigramPerplexity(docs: DataFrame): DataFrame = {
    val cu = docs.select(explode(DedupOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c1"))
    val vocab = cu.agg(count(lit(1)).as("v"))
    val bg = bigramRows(docs).localCheckpoint() // model agg + scoring scan
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    bg.join(cb, Seq("w1", "w2"))
      .join(cu.select(col("term").as("w1"), col("c1")), "w1")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(log((col("cb").cast("double") + lit(1.0)) /
          (col("c1").cast("double") + col("v").cast("double")))) /
          count(lit(1)).cast("double"), 6).as("cross_entropy"))
  }

  /** Per-document perplexity under the corpus's interpolated
    * Kneser–Ney bigram model (Kneser & Ney '95; the Chen & Goodman
    * '98 benchmark winner), absolute discount D = 0.75:
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁•)
    *            + (D·N₁₊(w₁•)/c(w₁•)) · N₁₊(•w₂)/N₁₊(••)
    *
    * — the continuation-probability backoff that fixes add-one's
    * pathology ([[bigramPerplexity]] scores "san francisco"-style
    * collocation tails as probable ANYWHERE; KN asks how many
    * distinct contexts a word completes). PP(d) = exp((1/m)Σ −ln P).
    * Every scored bigram occurs in the training corpus (same text),
    * so c ≥ 1 and the continuation term keeps P > 0; docs with < 2
    * tokens have no bigrams and are excluded, mirroring the oracle.
    *
    * Determinism: all five count families are exact BIGINTs; each
    * −ln P rounds 10dp into DECIMAL(38,10) before the per-doc sum —
    * ORDER-EXACT, tightening [[bigramPerplexity]]'s
    * summation-order-absorbing convention — then one exp, 6dp.
    *
    * Scale shape: one bigram hash agg builds the model; the
    * context/continuation/total families are three aggs on that
    * COLLAPSED frame (bigram-type-sized, not token-sized); scoring
    * joins key on the Zipf-hot w₁/w₂ with map-side partials on the
    * per-doc collapse absorbing the skew. */
  def knBigramPerplexity(docs: DataFrame,
      discount: Double = 0.75): DataFrame = {
    val bg = bigramRows(docs).localCheckpoint() // model agg + scoring
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint() // context + continuation + total read it
    val ctx = cb.groupBy("w1")
      .agg(sum(col("cb")).as("c1"), count(lit(1)).as("n1fwd"))
    val cont = cb.groupBy("w2").agg(count(lit(1)).as("n1bwd"))
    val nbig = cb.agg(count(lit(1)).as("nb"))
    val d = lit(discount)
    val p = greatest(col("cb").cast("double") - d, lit(0.0)) /
      col("c1").cast("double") +
      d * col("n1fwd").cast("double") / col("c1").cast("double") *
        (col("n1bwd").cast("double") / col("nb").cast("double"))
    val term = round(-log(p), 10).cast("decimal(38,10)")
    bg.join(cb, Seq("w1", "w2"))
      .join(ctx, "w1").join(cont, "w2")
      .crossJoin(broadcast(nbig))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(term).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(exp(col("s").cast("double") /
          col("n_bigrams").cast("double")), 6).as("kn_perplexity"))
  }

  /** Shared df-pruned weight frame (doc_id, term, w). */
  private def weights(docs: DataFrame, maxDfShare: Double): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val tf = docs
      .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term").crossJoin(broadcast(nDocs))
      .filter(col("df").cast("double") <=
        lit(maxDfShare) * col("n").cast("double"))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * col("n").cast("double") /
          col("df").cast("double")).as("w"))
  }

  /** Sparse-regime path: inverted-index dot accumulation. */
  private[graft] def tfidfCosinePairsSparse(w: DataFrame,
      minSim: Double): DataFrame = {
    val norms = w.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = w.as("a")
      .join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")),
        "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= minSim)
  }

  /** Dense-regime path: per-doc V-wide fp64 vectors (map lookup per
    * vocab term — runs once per DOC, not per pair), then an all-pairs
    * broadcast nested-loop with the fused `graft_cosine`. Docs with no
    * in-vocabulary terms have no vector and so no pairs — identical to
    * the sparse path's no-shared-term behavior. */
  private[graft] def tfidfCosinePairsDense(w: DataFrame,
      vocab: Seq[String], minSim: Double): DataFrame = {
    val docVecs = w.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("term"), col("w"))))
        .as("m"))
      .select(col("doc_id"),
        array(vocab.map(t =>
          coalesce(element_at(col("m"), lit(t)), lit(0.0))): _*).as("v"))
    docVecs.as("a").crossJoin(broadcast(docVecs.as("b")))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(graft.functions.CosineSim
          .cosineFused(col("a.v"), col("b.v")), 6).as("cosine"))
      // `> 0` keeps the strategy contract identical to the sparse
      // path, which structurally cannot emit a no-shared-term pair
      // (weights are strictly positive, so shared ⟺ cosine > 0)
      .filter(col("cosine") >= minSim && col("cosine") > 0.0)
  }

  /** Rocchio pseudo-relevance feedback (Rocchio '71, the SMART
    * system's query-expansion loop) over the BM25 ranker — the third
    * classic retrieval stage beside [[bm25TopDocs]]/[[qlmTopDocs]]
    * and [[rrfFusedDocs]]: retrieve once, mine the top `fbDocs`
    * documents for their most discriminative terms, re-score with the
    * expanded query q′ = q₀ (weight 1) ∪ top-`fbTerms` expansion
    * terms (weight β). Recovers documents that say "merge" when the
    * query said "join" — vocabulary-mismatch recall the raw ranker
    * structurally misses.
    *
    * Determinism: every per-(doc, term) BM25 contribution AND every
    * expansion-term weight (tf_fb·ln(N/df)) is re-pinned to BIGINT
    * micro-units BEFORE its sum (the [[qlmTopDocs]] discipline —
    * stricter than bm25TopDocs' raw float sum, because the fbDocs and
    * fbTerms CUTS feed downstream stages and must not flip on a
    * boundary ulp); all cuts order (score desc, id asc). Shape: the
    * corpus tokenize/explode is the dominant cost and is reused by
    * all three passes (round-1 tf, term mining, round-2 tf); the
    * feedback-doc and expansion-term frames are ≤ fbDocs/fbTerms-row
    * broadcasts; both scoring joins are term-keyed over the exploded
    * frame. */
  def rocchioPrfDocs(docs: DataFrame,
      queryTerms: Seq[String] = Seq("join", "filter", "scan"),
      k1: Double = 1.2, b: Double = 0.75, beta: Double = 0.5,
      fbDocs: Int = 10, fbTerms: Int = 5, topK: Int = 20): DataFrame = {
    val toks = docs.select(col("doc_id"),
      DedupOps.tokens(col("text")).as("toks"))
    val stats = toks.agg(count(lit(1)).as("n"),
      sum(size(col("toks")).cast("long")).as("total_len"))
    val dl = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"))
    val all = toks.select(col("doc_id"), explode(col("toks")).as("term"))
    val nD = col("n").cast("double")
    val avgdl = col("total_len").cast("double") / nD
    val idf = log(
      (nD - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    def microScore(w: Column): Column =
      round((w * ((idf * (col("tf").cast("double") * lit(k1 + 1.0))) /
        (col("tf").cast("double") + lit(k1) *
          (lit(1.0 - b) + lit(b) *
            (col("dl").cast("double") / avgdl))))) * lit(1000000.0), 0)
        .cast("long")
    def scorePass(qterms: DataFrame): DataFrame = {
      val tf = all.join(broadcast(qterms), Seq("term"))
        .groupBy("doc_id", "term", "w").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(sum(microScore(col("w"))).as("sm"),
          count(lit(1)).as("n_matched"))
    }
    val q0 = docs.sparkSession.createDataFrame(
      queryTerms.map(Tuple1(_))).toDF("term")
      .select(col("term"), lit(1.0).as("w"))
    val s1 = scorePass(q0)
    val fb = s1.orderBy(col("sm").desc, col("doc_id").asc).limit(fbDocs)
      .select(col("doc_id"))
    // expansion candidates: every term of the feedback docs except the
    // original query's, weighted tf_fb·ln(N/df) and micro-pinned; the
    // df probe joins the exploded frame against the ≤ |fb-vocab|
    // candidate broadcast
    val tfFb = all.join(broadcast(fb), Seq("doc_id"))
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("tf_fb"))
    val dfC = all.join(broadcast(tfFb.select("term")), Seq("term"))
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val expTerms = tfFb.join(dfC, Seq("term"))
      .crossJoin(broadcast(stats.select("n")))
      .select(col("term"),
        round((col("tf_fb").cast("double") *
          log(nD / col("df").cast("double"))) * lit(1000000.0), 0)
          .cast("long").as("wm"))
      .orderBy(col("wm").desc, col("term").asc).limit(fbTerms)
      .select(col("term"), lit(beta).as("w"))
    val s2 = scorePass(q0.unionByName(expTerms))
    s2.join(s1.select(col("doc_id"), col("sm").as("s1m")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("s1m"), lit(0L)).cast("double") /
          lit(1000000.0), 6).as("bm25_q0"),
        round(col("sm").cast("double") / lit(1000000.0), 6)
          .as("bm25_expanded"),
        col("n_matched"))
      .orderBy(col("bm25_expanded").desc, col("doc_id").asc)
      .limit(topK)
  }
}
