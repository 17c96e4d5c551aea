package graft

import graft.ops.MiningOps

/** Association-rule contract on a planted fixture: exact
  * support/confidence/lift values, both df pruning bounds, and the
  * within-doc distinctness of the basket (duplicate tokens count
  * once). */
class MiningOpsSpec extends SparkSpec {
  import spark.implicits._

  // 10 docs. "alpha beta" co-occur in 4; "alpha gamma" in 2;
  // "rare" appears once (below minDf=2); "stop" is in 9 of 10 docs
  // (above maxDfShare=0.8 → pruned).
  private val docs = Seq(
    (1L, "alpha beta stop"), (2L, "alpha beta stop"),
    (3L, "alpha beta stop"), (4L, "alpha beta alpha stop"),
    (5L, "alpha gamma stop"), (6L, "alpha gamma stop"),
    (7L, "beta stop"), (8L, "gamma stop rare"),
    (9L, "stop delta delta"), (10L, "delta beta")
  ).toDF("doc_id", "text")

  private def rules = MiningOps
    .termCooccurrence(docs, minDf = 2, maxDfShare = 0.8, minPair = 2)
    .collect()
    .map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))
    .toMap

  test("support, confidence and lift are exact on the fixture") {
    val r = rules
    // alpha df=6, beta df=6, gamma df=3, delta df=2, N=10.
    val (np, sup, cab, cba, lift) = r(("alpha", "beta"))
    assert(np == 4L)
    assert(sup == 0.4)
    assert(cab == math.rint(4.0 / 6.0 * 1e6) / 1e6)
    assert(cba == math.rint(4.0 / 6.0 * 1e6) / 1e6)
    assert(lift == math.rint(4.0 * 10.0 / 36.0 * 1e6) / 1e6)
    val (np2, _, _, _, lift2) = r(("alpha", "gamma"))
    assert(np2 == 2L)
    assert(lift2 == math.rint(2.0 * 10.0 / 18.0 * 1e6) / 1e6)
  }

  test("df bounds prune rare terms and stopwords before the pair join") {
    val terms = rules.keySet.flatMap(p => Set(p._1, p._2))
    assert(!terms.contains("rare"), "df=1 term must fall below minDf")
    assert(!terms.contains("stop"), "df=9/10 term must exceed maxDfShare")
  }

  test("duplicate tokens inside one doc count once (doc 4 has alpha twice)") {
    assert(rules(("alpha", "beta"))._1 == 4L)
  }

  test("minPair filters inside the aggregation") {
    // beta+delta co-occur once (doc 10) — under minPair=2.
    assert(!rules.contains(("beta", "delta")))
    assert(!rules.contains(("delta", "beta")))
  }

  test("tfidfCosinePairs: exact copies score 1, disjoint docs are absent, " +
    "the df cap drops ubiquitous terms from scoring") {
    val fixture = Seq(
      (1L, "red fish blue fish"), (2L, "red fish blue fish"), // exact copy
      (3L, "red fish green"),
      (4L, "totally different words here"),
      // "common" sits in every doc below → df share 1.0 > 0.9 cap
      (5L, "common alpha"), (6L, "common beta"))
      .toDF("doc_id", "text")
    val pairs = MiningOps.tfidfCosinePairs(fixture, minSim = 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0, pairs.toString)
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((3L, 4L)),
      "no shared scorable terms may never pair")
    // docs 5 and 6 share ONLY a term that exceeds the df cap in the
    // fixture where it is ubiquitous — with a corpus-wide term planted
    // in all 6 docs they must not pair through it
    val allCommon = Seq(
      (1L, "x red fish"), (2L, "x red fish"), (3L, "x green"),
      (4L, "x different"), (5L, "x only"), (6L, "x solo"))
      .toDF("doc_id", "text")
    val viaCommon = MiningOps.tfidfCosinePairs(allCommon, minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!viaCommon.contains((5L, 6L)),
      "df-capped term must not generate pairs")
    assert(viaCommon.contains((1L, 2L)))
  }

  test("tfidfCosinePairs: dense and sparse strategies agree pair-for-pair " +
    "on real data, and the chooser picks dense under the vocab cap") {
    val docs = Tables.documents(spark, sf0)
    val chosen = MiningOps.tfidfCosinePairs(docs, minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(chosen.nonEmpty)
    // reconstruct both strategies explicitly over the same weights
    import org.apache.spark.sql.functions._
    val n = docs.count().toDouble
    val tf = docs.select(col("doc_id"),
        explode(graft.ops.DedupOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = tf.join(df, "term")
      .filter(col("df").cast("double") <= lit(0.9) * lit(n))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * lit(n) / col("df").cast("double"))
          .as("w"))
    val vocab = w.select("term").distinct().orderBy("term")
      .as[String].collect().toSeq
    assert(vocab.size <= 256, "fixture corpus should be dense-regime")
    val dense = MiningOps.tfidfCosinePairsDense(w, vocab, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val sparse = MiningOps.tfidfCosinePairsSparse(w, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(dense == sparse, "physical strategies diverge")
    assert(chosen == dense, "chooser result differs from dense path")
  }

  test("qlmTopDocs: Dirichlet scores match the replayed micro-pinned " +
    "chain; every doc scores every present term") {
    // C = 8 tokens; ctf: join 2, filter 1, scan 1; equal lengths so
    // the ranking difference is pure hit structure
    val corpus = Seq(
      (1L, "join join filter x"),
      (2L, "scan y z w"),
    ).toDF("doc_id", "text")
    val got = graft.ops.MiningOps.qlmTopDocs(corpus)
      .orderBy("doc_id").collect()
    def t(tf: Long, ctf: Long, dl: Long) =
      math.rint(math.log((tf + 2000.0 * (ctf.toDouble / 8.0)) /
        (dl + 2000.0)) * 1e6)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val s1 = r6((t(2, 2, 4) + t(1, 1, 4) + t(0, 1, 4)) / 1e6)
    val s2 = r6((t(0, 2, 4) + t(0, 1, 4) + t(1, 1, 4)) / 1e6)
    val m = got.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_matched"), r.getAs[Double]("qlm_score")))).toMap
    assert(m(1L) == ((2L, s1)), m.toString)
    assert(m(2L) == ((1L, s2)), m.toString)
    assert(s1 > s2, s"hit-heavy doc should outrank: $s1 vs $s2")
  }

  test("rocchioPrfDocs: expansion recovers the vocabulary-mismatch " +
    "doc and the scores replay the micro-pinned chain") {
    // d1 matches q0 and carries "merge"; d2 says ONLY "merge" (zero
    // round-1 score); d3 is noise. With fbDocs=1, fbTerms=1 the
    // feedback doc is d1, the expansion term is "merge" (w=0.5), and
    // d2 enters the expanded ranking.
    val corpus = Seq(
      (1L, "join filter scan merge"),
      (2L, "merge merge merge"),
      (3L, "alpha beta"),
    ).toDF("doc_id", "text")
    val got = graft.ops.MiningOps.rocchioPrfDocs(corpus,
      fbDocs = 1, fbTerms = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("bm25_q0"), r.getAs[Double]("bm25_expanded"))))
      .toMap
    // replay: n=3, total_len=9, avgdl=3
    def micro(w: Double, tf: Long, df: Long, dl: Long) =
      math.rint(w * ((math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0) *
        (tf * 2.2)) / (tf + 1.2 * (0.25 + 0.75 * (dl / 3.0)))) * 1e6)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // d2 round 2: only "merge" (tf=3, df=2, dl=3) at beta=0.5
    assert(got(2L) == ((0.0, r6(micro(0.5, 3, 2, 3) / 1e6))), got.toString)
    assert(got(2L)._2 > 0.0)
    // d1 keeps its q0 score and gains the merge term
    val d1q0 = r6((micro(1.0, 1, 1, 4) * 3) / 1e6)
    val d1x = r6((micro(1.0, 1, 1, 4) * 3 + micro(0.5, 1, 2, 4)) / 1e6)
    assert(got(1L) == ((d1q0, d1x)), got.toString)
    // the noise doc matches nothing even expanded
    assert(!got.contains(3L), got.toString)
  }

  test("bm25TopDocs: scores match a plain-Scala Okapi reference and " +
    "unmatched docs never appear") {
    val corpus = Seq(
      (1L, "join filter join"),
      (2L, "join scan"),
      (3L, "other words here entirely"),
      (4L, "filter"),
      (5L, "join join join join filter scan")
    ).toDF("doc_id", "text")
    val q = Seq("join", "filter", "scan")
    val got = MiningOps.bm25TopDocs(corpus, q, topK = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap
    // plain-Scala reference with the same formula
    val toks = Map(1L -> Seq("join", "filter", "join"),
      2L -> Seq("join", "scan"),
      3L -> Seq("other", "words", "here", "entirely"),
      4L -> Seq("filter"),
      5L -> Seq("join", "join", "join", "join", "filter", "scan"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfm = q.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    def score(id: Long): Double = {
      val dl = toks(id).size.toDouble
      val s = q.flatMap { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0) None
        else Some(math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
          (tf * (1.2 + 1.0)) /
          (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))
      }.sum
      math.rint(s * 1e6) / 1e6
    }
    assert(!got.contains(3L), "doc with no query term must not appear")
    for (id <- Seq(1L, 2L, 4L, 5L)) {
      val (bm25, nm, dl) = got(id)
      assert(bm25 == score(id), s"doc $id: $bm25 vs ${score(id)}")
      assert(nm == q.count(toks(id).contains).toLong)
      assert(dl == toks(id).size.toLong)
    }
    // more matched distinct terms and higher tf must not rank below an
    // otherwise-identical shorter match: doc5 hits all three terms
    assert(got(5L)._1 > got(2L)._1)
  }

  test("pmiCollocations: hand-computed PMI, occurrence (not doc) counts") {
    // Corpus: "a b a b" ×2 docs + "c d" ×1. Tokens: a×4, b×4, c, d
    // (N=10). Bigrams: (a,b)×4, (b,a)×2, (c,d)×1 (Nb=7).
    // pmi(a,b) = ln(4·10·10 / (7·4·4)) = ln(400/112).
    val corpus = Seq((1L, "a b a b"), (2L, "a b a b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val got = MiningOps.pmiCollocations(corpus, minCount = 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("a", "b"))._1 == 4L) // occurrences, not the 2 docs
    assert(math.abs(got(("a", "b"))._2 -
      math.rint(math.log(400.0 / 112.0) * 1e6) / 1e6) < 1e-9)
    assert(got(("b", "a"))._1 == 2L)
    assert(got(("c", "d"))._1 == 1L)
  }

  test("bigramPerplexity: repeated-corpus bigrams score low, rare high; " +
      "sub-2-token docs absent") {
    // Doc 3's lone bigram (c,d) is corpus-rare; docs 1-2 reuse (a,b).
    // Add-one smoothing keeps everything finite; doc 4 has no bigrams.
    val corpus = Seq((1L, "a b a b"), (2L, "a b a b"), (3L, "c d"),
      (4L, "solo")).toDF("doc_id", "text")
    val got = MiningOps.bigramPerplexity(corpus)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(!got.contains(4L), "bigram-free doc must be absent")
    assert(got(1L)._1 == 3L && got(3L)._1 == 1L)
    assert(got(1L)._2 < got(3L)._2,
      s"repeated bigrams must score lower entropy: $got")
    // Exact value for doc 3: V=5 distinct terms (a,b,c,d,solo);
    // -ln((1+1)/(1+5)) = ln(3).
    assert(math.abs(got(3L)._2 - math.rint(math.log(3.0) * 1e6) / 1e6) < 1e-9)
  }

  test("knBigramPerplexity: hand-traced KN interpolation on corpus " +
      "{a b, a b, a c} — continuation mass splits the discount") {
    // cb: (a,b)=2, (a,c)=1; c(a.)=3, N1+(a.)=2; N1+(.b)=N1+(.c)=1;
    // N1+(..)=2. P(b|a) = 1.25/3 + (0.75*2/3)*(1/2); P(c|a) =
    // 0.25/3 + same backoff. One-bigram docs -> PP = exp(-ln P
    // pinned 10dp) = ~1/P.
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = MiningOps.knBigramPerplexity(corpus)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def pp(p: Double): Double = {
      val t = math.rint(-math.log(p) * 1e10) / 1e10
      math.rint(math.exp(t) * 1e6) / 1e6
    }
    val backoff = 0.75 * 2.0 / 3.0 * (1.0 / 2.0)
    val pB = math.max(2.0 - 0.75, 0.0) / 3.0 + backoff
    val pC = math.max(1.0 - 0.75, 0.0) / 3.0 + backoff
    assert(!got.contains(4L), "bigram-free doc must be absent")
    assert(got(1L) == ((1L, pp(pB))), got.toString)
    assert(got(2L) == ((1L, pp(pB))), got.toString)
    assert(got(3L) == ((1L, pp(pC))), got.toString)
    assert(got(3L)._2 > got(1L)._2,
      "the rare continuation must be more perplexing")
  }

  test("bm25TopDocs: topK truncates with the rounded-score/doc_id order") {
    val corpus = (1L to 30L).map(i => (i, "join x" + i)).toDF("doc_id", "text")
    val got = MiningOps.bm25TopDocs(corpus, Seq("join"), topK = 7)
      .select("doc_id").as[Long].collect().toSeq
    // all docs tie on (tf=1, dl=2) — the boundary must cut by doc_id
    assert(got == (1L to 7L))
  }

  test("rrfFusedDocs: list-overlap doc wins, single-list docs keep " +
      "their reciprocal, absent ranks stay NULL") {
    // lexical ranking: doc 1 (tf=3) > doc 2 (tf=1); doc 3 matches no
    // query term. dense ranking at perList=2: doc 2 (cos .995) >
    // doc 3 (cos .7071); doc 1 (orthogonal) is cut. So doc 2 is the
    // only both-lists doc: 1/61 + 1/62 beats doc 1's 1/61 beats
    // doc 3's 1/62.
    val docs = Seq((1L, "join join join filter"), (2L, "join filter"),
      (3L, "xyz xyz")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),   // the pinned query vector
      (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(10.0f, 1.0f), 0),
      (3L, Array(1.0f, 1.0f), 0),
    ).toDF("vec_id", "embedding", "label")
    val got = MiningOps.rrfFusedDocs(docs, emb, perList = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        Option(r.getAs[Any]("lex_rank")), Option(r.getAs[Any]("dense_rank")),
        r.getAs[Double]("rrf_score")))
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 3L), got.mkString(","))
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(2L)._2 == Some(2L) && byId(2L)._3 == Some(1L))
    assert(byId(1L)._2 == Some(1L) && byId(1L)._3.isEmpty)
    assert(byId(3L)._2.isEmpty && byId(3L)._3 == Some(2L))
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    assert(byId(2L)._4 == r9(1.0 / 62 + 1.0 / 61), byId(2L).toString)
    assert(byId(1L)._4 == r9(1.0 / 61) && byId(3L)._4 == r9(1.0 / 62))
  }
}
