package graft

import org.apache.spark.sql.functions._
import graft.ops.DocOps

/** Dataset-assembly primitives: deterministic stratified sampling and
  * per-document salient-term extraction. */
class DocPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("dsirLogWeights: target-like docs outscore off-target docs; " +
    "weight matches the hand-computed Laplace log-ratio") {
    // target domain = lang 'en' says only "alpha"; the raw corpus
    // adds "beta"-speaking docs. A non-en doc written in alpha must
    // outscore one written in beta.
    val docs = Seq(
      (1L, "alpha alpha", "2024-01-01", "s0", 11, "en"),
      (2L, "alpha alpha", "2024-01-01", "s0", 11, "en"),
      (3L, "alpha alpha", "2024-01-01", "s0", 11, "xx"), // target-like
      (4L, "beta beta", "2024-01-01", "s0", 9, "xx"),    // off-target
    ).toDF("doc_id", "text", "created_at", "source", "n_chars", "lang")
    val got = graft.ops.DocOps.dsirLogWeights(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // counts: raw alpha=6, beta=2, N=8, V=2; target: alpha=4, Ntk=4.
    // per-alpha term: ln(5/6) − ln(7/10); per-beta: ln(1/6) − ln(3/10)
    val a = 2 * (math.log(5.0 / 6.0) - math.log(7.0 / 10.0))
    val b = 2 * (math.log(1.0 / 6.0) - math.log(3.0 / 10.0))
    assert(math.abs(got(3L) - BigDecimal(a).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, got.toString)
    assert(math.abs(got(4L) - BigDecimal(b).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, got.toString)
    assert(got(3L) > got(4L) && got(1L) == got(3L),
      s"target-like must outscore off-target: $got")
  }

  test("chunkDocuments: full coverage, exact overlap, no vacuous tail") {
    import java.security.MessageDigest
    def hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val text = ("abcdefghij" * 47).take(463) // n=463: 4 starts at step 150? 0,150,300 then 450>463-51
    val docs = Seq(
      (1L, text, "s1"),
      (2L, "short", "s1"),        // n < size -> exactly one chunk
      (3L, "", "s1"),             // empty -> zero chunks
      (4L, "x" * 250, "s2"))      // start 150 has 100-char tail, 50 novel
      .toDF("doc_id", "text", "source")
    val rows = DocOps.chunkDocuments(docs, size = 200, overlap = 50)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"),
        r.getAs[Long]("char_start"), r.getAs[Long]("chunk_len"),
        r.getAs[String]("chunk_hash")))
    val byDoc = rows.groupBy(_._1)
    assert(!byDoc.contains(3L), "empty doc must yield zero chunks")
    assert(byDoc(2L).toSeq == Seq((2L, 0, 0L, 5L, hex("short"))))
    // doc 1: starts 0/150/300 (412 > 463-51 stops the 4th); chunks
    // cover every char and each consecutive pair overlaps exactly 50
    val c1 = byDoc(1L).sortBy(_._2)
    assert(c1.map(_._3).toSeq == Seq(0L, 150L, 300L), c1.mkString(","))
    assert(c1.map(_._4).toSeq == Seq(200L, 200L, 163L))
    assert(c1.last._3 + c1.last._4 == 463L, "tail must reach end of text")
    assert(c1.map(r => hex(text.substring(r._3.toInt,
      (r._3 + r._4).toInt))).sameElements(c1.map(_._5)), "hash mismatch")
    // doc 4 (n=250): second chunk [150,250) contributes 50 novel chars
    assert(byDoc(4L).sortBy(_._2).map(r => (r._3, r._4)).toSeq ==
      Seq((0L, 200L), (150L, 100L)))
    // a start inside the previous chunk's overlap span never fires:
    // n=240 < 200+50 would make chunk [150,240) ⊂ [0,200)∪overlap span
    val tight = Seq((9L, "y" * 240, "s"))
      .toDF("doc_id", "text", "source")
    assert(DocOps.chunkDocuments(tight, 200, 50).count() == 2,
      "240 > 200 still needs a second chunk for chars [200,240)")
    val covered = Seq((8L, "z" * 249, "s")).toDF("doc_id", "text", "source")
    // n=249: start 150 has tail [150,249) with novel chars [200,249) — emitted;
    // but n=200 exactly -> single chunk
    assert(DocOps.chunkDocuments(
      Seq((7L, "w" * 200, "s")).toDF("doc_id", "text", "source"),
      200, 50).count() == 1)
    assert(DocOps.chunkDocuments(covered, 200, 50).count() == 2)
  }

  test("paretoFrontier: equals the naive weak-domination skyline") {
    // alpha_ratio = alpha chars / length; lengths and ratios chosen to
    // exercise: clean-and-long (frontier), clean-but-short (dominated),
    // dirty-but-longest (frontier), exact ties on both axes (both kept)
    def doc(id: Long, alpha: Int, digits: Int) =
      (id, "a" * alpha + "1" * digits)
    val docs = Seq(
      doc(1, 10, 0),   // (1.0, 10) — frontier (cleanest, longest at 1.0)
      doc(2, 4, 0),    // (1.0, 4)  — dominated by 1
      doc(3, 18, 2),   // (0.9, 20) — frontier
      doc(4, 9, 1),    // (0.9, 10) — dominated by 1 and 3
      doc(5, 10, 10),  // (0.5, 20) — dominated by 3 (equal n, lower alpha)
      doc(6, 10, 30),  // (0.25, 40) — frontier (longest overall)
      doc(7, 18, 2),   // (0.9, 20) — exact tie with 3: BOTH on frontier
    ).toDF("doc_id", "text")
    val got = DocOps.paretoFrontier(docs).select("doc_id").as[Long]
      .collect().toSet
    // naive O(n²) weak-domination skyline over the same rounded pairs
    val pts = Seq(1L -> (1.0, 10L), 2L -> (1.0, 4L), 3L -> (0.9, 20L),
      4L -> (0.9, 10L), 5L -> (0.5, 20L), 6L -> (0.25, 40L), 7L -> (0.9, 20L))
    val naive = pts.filter { case (id, (a, n)) =>
      !pts.exists { case (id2, (a2, n2)) =>
        id2 != id && a2 >= a && n2 >= n && (a2 > a || n2 > n) }
    }.map(_._1).toSet
    assert(naive == Set(1L, 3L, 6L, 7L), s"fixture arithmetic: $naive")
    assert(got == naive, s"got $got, naive $naive")
  }

  test("bpeMergeCandidates: pair multiplicity weighted by word count") {
    val docs = Seq(
      (1L, "aaa bb x"),     // "x" (len 1) contributes nothing
      (2L, "aaa"),
      (3L, "abab"))
      .toDF("doc_id", "text")
    val got = DocOps.bpeMergeCandidates(docs, k = 10)
      .as[(String, Long)].collect().toMap
    // "aaa" appears twice, each with pairs aa,aa -> 4; "abab" has
    // ab,ba,ab -> ab:2, ba:1; "bb" -> 1
    assert(got == Map("aa" -> 4L, "ab" -> 2L, "bb" -> 1L, "ba" -> 1L), got.toString)
    // top-1 is the max pair; tie-break on pair string
    val top = DocOps.bpeMergeCandidates(docs, k = 1).as[(String, Long)].collect()
    assert(top.toSeq == Seq("aa" -> 4L))
  }

  test("stratifiedSample: per-stratum cap, partition-layout independent") {
    val langs = Seq("en", "fr", "de")
    val docs = (0L until 900L).map(i => (i, langs((i % 3).toInt), s"doc $i"))
      .toDF("doc_id", "lang", "text")
    val a = DocOps.stratifiedSample(docs, perLang = 50)
    val perLang = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ == 50L), perLang.toString)
    // identical selection (ids AND ranks) after a different layout
    val got = a.as[(Long, String, Long)].collect().toSet
    val again = DocOps.stratifiedSample(docs.repartition(13), perLang = 50)
      .as[(Long, String, Long)].collect().toSet
    assert(got == again, "sample depends on partitioning")
    // ranks follow the Knuth-hash total order within each stratum
    val enRanked = a.filter(col("lang") === "en")
      .select(col("doc_id"), col("rn")).as[(Long, Long)].collect()
      .sortBy(_._2)
    val hashes = docs.filter(col("lang") === "en")
      .select(col("doc_id"), DocOps.knuthHash32(col("doc_id")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(enRanked.map(r => hashes(r._1)).sameElements(
      enRanked.map(r => hashes(r._1)).sorted), "ranks not in hash order")
  }

  test("splitContamination: planted train-test leak is measured exactly") {
    // find ids landing in train (<90) and test (>=95) buckets
    def bucket(id: Long): Long =
      (BigInt(id) * BigInt(2654435761L)).mod(BigInt(4294967296L))
        .mod(BigInt(100)).toLong
    val trainId = (0L until 1000L).find(bucket(_) < 90).get
    val testId = (0L until 1000L).find(bucket(_) >= 95).get
    val leaked = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 words
    val clean = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (trainId, s"$leaked filler words beyond the leak zone here"),
      (testId, s"$leaked $clean"),
    ).toDF("doc_id", "text")
    val out = DocOps.splitContamination(docs, k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(testId), out.toString)
    // test doc has 11 distinct 8-grams (18 tokens); only the exact
    // leaked 8-gram also occurs in the train doc
    val (n, c, frac) = out(testId)
    assert(n == 11L && c == 1L, out.toString)
    assert(frac == 1.0 / 11.0)
  }

  test("tfidfTopTerms: rare terms outrank common ones, ties pin on term") {
    val docs = Seq(
      (1L, "shared shared zebra"),
      (2L, "shared shared quark"),
      (3L, "shared alpha beta"),
    ).toDF("doc_id", "text")
    val top = DocOps.tfidfTopTerms(docs, k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df")))
      .toMap
    // "shared" appears in all 3 docs (df=3); each doc's unique term
    // (df=1) scores tf*3/1 >= 3 vs shared's tf*3/3 = tf — unique wins
    // whenever its 3*tf beats shared's tf
    assert(top(1L)._1 == "zebra", top.toString)
    assert(top(2L)._1 == "quark", top.toString)
    // doc 3: alpha and beta tie exactly (tf=1, df=1) — term ASC pins
    assert(top(3L)._1 == "alpha", top.toString)
    // k respected and score is the documented rational
    val k2 = DocOps.tfidfTopTerms(docs, k = 2)
    assert(k2.groupBy("doc_id").count().as[(Long, Long)]
      .collect().forall(_._2 == 2L))
    val z = k2.filter(col("doc_id") === 1L && col("term") === "zebra")
      .select("score").as[Double].collect().head
    assert(z == 1.0 * 3 / 1, s"score formula drifted: $z")
  }

  test("unigramFreqScore: exact integer-ratio frequency and rare-token math") {
    // corpus: a=3, b=1, c=1, N=5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = DocOps.unigramFreqScore(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 1: mass = 3+3+1 = 7 over 3 tokens → 7/15; rare (cnt<=2): b → 1/3
    assert(out(1L) == ((3L, 7.0 / 15.0, 1.0 / 3.0)), out.toString)
    // doc 2: mass = 3+1 = 4 over 2 tokens → 4/10; rare: c → 1/2
    assert(out(2L) == ((2L, 4.0 / 10.0, 1.0 / 2.0)), out.toString)
  }

  test("distinctiveTermsBySource: lift ranks each source's signature term") {
    // per source: signature term x/y (cnt 6), shared "common" (cnt 2 —
    // under minCount, filtered)
    val docs = Seq(
      (1L, "A", "x x x x x x common common"),
      (2L, "B", "y y y y y y common common")).toDF("doc_id", "source", "text")
    val out = DocOps.distinctiveTermsBySource(docs)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    // lift(x|A) = (6·16)/(8·6) = 2.0 — exactly, by integer products
    assert(out("A") == (("x", 6L, 2.0)), out.toString)
    assert(out("B") == (("y", 6L, 2.0)), out.toString)
  }

  test("importanceSample: long docs always kept; selection is " +
    "deterministic and layout-independent") {
    val docs = (0L until 500L)
      .map(i => (i, "s", if (i < 100) 5000L else 100L))
      .toDF("doc_id", "source", "n_chars")
    val kept = DocOps.importanceSample(docs, scaleChars = 1000)
      .select("doc_id").as[Long].collect().toSet
    // every >=scaleChars doc survives
    assert((0L until 100L).forall(kept.contains), "long doc dropped")
    // short docs thinned to roughly n_chars/scale = 10% (400 * 0.1)
    val short = kept.count(_ >= 100L)
    assert(short > 10 && short < 90, s"short keep count $short")
    val again = DocOps.importanceSample(docs.repartition(13), 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept, "sample depends on partitioning")
  }

  test("shardAssignments: offset binning keeps every shard near target") {
    // 10 docs of 3000 chars; start offsets 0,3000,...,27000 bin by
    // 10000 into shards of 4 (starts < 10000), 3, 3 docs
    val docs = (1L to 10L).map(i => (i, "s", 3000L))
      .toDF("doc_id", "source", "n_chars")
    val got = DocOps.shardAssignments(docs, shardChars = 10000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(got == Map(0L -> ((4L, 12000L)), 1L -> ((3L, 9000L)),
      2L -> ((3L, 9000L))), got.toString)
    // layout independence: the manifest is a pure function of the data
    val again = DocOps.shardAssignments(docs.repartition(7), 10000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(again == got, "manifest depends on partitioning")
  }

  test("ngramNovelty: unique docs score 1, copies 0, partial overlap between") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, a), (1L, a), // exact copies: every shingle has df 2 → novelty 0
      (2L, "one two three four five six seven"), // all-unique → 1.0
      (3L, "one two three completely different ending here"), // shares prefix
    ).toDF("doc_id", "text")
    val got = DocOps.ngramNovelty(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Double]("novelty"))))
      .toMap
    assert(got(0L)._2 == 0.0 && got(1L)._2 == 0.0, got.toString)
    // doc 2 shares exactly one 3-gram ("one two three") with doc 3
    assert(got(2L) == ((5L, 0.8)), got.toString)
    assert(got(3L) == ((5L, 0.8)), got.toString)
  }

  test("mixtureSample: per-source rates honored, deterministic, 0 drops, 1M keeps") {
    val docs = (0L until 900L).map(i => (i, s"s${i % 3}", 10L))
      .toDF("doc_id", "source", "n_chars")
    val rates = Seq("s0" -> 0L, "s1" -> 1000000L, "s2" -> 500000L)
    val kept = DocOps.mixtureSample(docs, rates)
      .collect().map(r => r.getAs[String]("source"))
    val bySrc = kept.groupBy(identity).view.mapValues(_.size).toMap
    assert(!bySrc.contains("s0"), s"rate-0 source leaked: $bySrc")
    assert(bySrc("s1") == 300, s"rate-1.0 source not fully kept: $bySrc")
    // rate 0.5 over 300 docs: hash-uniform, allow a wide band
    assert(bySrc("s2") > 100 && bySrc("s2") < 200, bySrc.toString)
    // unmapped sources are dropped (explicit mix is the contract)
    val unmapped = DocOps.mixtureSample(
      docs.withColumn("source", lit("sX")), rates).count()
    assert(unmapped == 0L)
    // layout independence
    val again = DocOps.mixtureSample(docs.repartition(11), rates)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == DocOps.mixtureSample(docs, rates)
      .collect().map(_.getAs[Long]("doc_id")).toSet)
  }

  test("shardAssignments: two-level prefix sum == flat, parallel by bucket") {
    // interleaved sources with ids crossing bucket boundaries at every
    // idBucket tried; per-doc masses vary so any mis-ordered or
    // mis-offset prefix sum shifts a shard boundary
    val docs = (0L until 200L).map(i =>
      (i, s"s${i % 3}", 100L + (i % 7) * 300L))
      .toDF("doc_id", "source", "n_chars")
    def manifest(bucket: Long) =
      DocOps.shardAssignments(docs, shardChars = 5000L, idBucket = bucket)
        .as[(String, Long, Long, Long)].collect().toSet
    val flat = manifest(1L << 40) // one bucket == the flat window
    assert(manifest(4L) == flat, "idBucket=4 diverges from flat window")
    assert(manifest(32L) == flat, "idBucket=32 diverges from flat window")
    // the intra-bucket window stage partitions by (source, bucket) —
    // parallelism scales with buckets, not the source count
    val plan = DocOps.shardAssignments(docs, 5000L, 32L)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*hashpartitioning\\(source#\\d+, b#\\d+.*"),
      plan.take(2000))
  }

  test("compressionSignals: repetitive text compresses below diverse text") {
    val repetitive = ("spam ham " * 200).trim
    val rnd = new scala.util.Random(9)
    val diverse = Seq.fill(400)(rnd.alphanumeric.take(8).mkString).mkString(" ")
    val docs = Seq((0L, "s", repetitive), (1L, "s", diverse), (2L, "s", ""))
      .toDF("doc_id", "source", "text")
    val got = DocOps.compressionSignals(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_deflate"),
          if (r.isNullAt(r.fieldIndex("ratio"))) None
          else Some(r.getAs[Double]("ratio")))))
      .toMap
    assert(got(0L)._2.get < 0.05, s"repetitive should crush: ${got(0L)}")
    assert(got(1L)._2.get > 0.5, s"diverse should resist: ${got(1L)}")
    assert(got(2L)._2.isEmpty, "empty text must yield null ratio, not /0")
    // determinism across evaluations (fixed level, fixed JVM zlib)
    val again = DocOps.compressionSignals(docs.repartition(5))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_deflate"))
      .toMap
    assert(again == got.map { case (k, v) => k -> v._1 })
  }

  test("shardFillStats: packing stats match the manifest") {
    val docs = (1L to 10L).map(i => (i, "s", 3000L))
      .toDF("doc_id", "source", "n_chars")
    // manifest is shards of 4/3/3 docs = 12000/9000/9000 chars
    val got = DocOps.shardFillStats(docs, shardChars = 10000L).collect().head
    assert(got.getAs[Long]("n_shards") == 3L, got.toString)
    assert(got.getAs[Long]("n_chars_total") == 30000L, got.toString)
    assert(got.getAs[Long]("min_shard_chars") == 9000L, got.toString)
    assert(got.getAs[Long]("max_shard_chars") == 12000L, got.toString)
    assert(got.getAs[Double]("avg_fill") == 1.0, got.toString)
  }

  test("selectUnderBudget: longest-first greedy prefix, two-level ≡ flat") {
    // lengths 100..1000 step 100; longest-first cumulative: 1000, 1900,
    // 2700, 3400, 4000, ... — budget 3500 keeps starts 0/1000/1900/2700
    // (the 700-length doc STARTS at 3400 < 3500 and may overshoot;
    // offset binning semantics, same as the shard manifest)
    val docs = (1L to 10L).map(i => (i, "s", i * 100L))
      .toDF("doc_id", "source", "n_chars")
    val got = DocOps.selectUnderBudget(docs, budgetChars = 3500L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_excl"))
      .toMap
    assert(got == Map(10L -> 0L, 9L -> 1000L, 8L -> 1900L, 7L -> 2700L,
      6L -> 3400L), got.toString)
    // two-level decomposition is bit-identical to one flat window for
    // random data, any bucket width, and ties broken by doc_id
    val rnd = new scala.util.Random(31)
    val noisy = (0L until 300L).map(i => (i, s"s${i % 3}",
      (rnd.nextInt(20) + 1) * 10L)) // heavy ties
      .toDF("doc_id", "source", "n_chars")
    def sel(b: Long) = DocOps.selectUnderBudget(noisy, 9000L, b)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_excl")))
      .toSet
    val flat = sel(1L << 40)
    assert(sel(64L) == flat && sel(7L) == flat, "bucketed diverged from flat")
  }

  test("langConfusion: planted mislabels land off-diagonal") {
    val en = "the of and to in is was for on with"
    val fr = "le la les des une est dans pour sur avec"
    val docs = Seq(
      (1L, en, "en"), (2L, en, "en"),
      (3L, fr, "fr"),
      (4L, en, "fr"),        // mislabeled: detector should say en
      (5L, "zz qq xx", "en") // no stopword evidence -> und
    ).toDF("doc_id", "text", "lang")
    val got = DocOps.langConfusion(docs)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("en", "en")) == 2L, got.toString)
    assert(got(("fr", "fr")) == 1L, got.toString)
    assert(got(("fr", "en")) == 1L, got.toString)
    assert(got(("en", "und")) == 1L, got.toString)
  }

  test("weightedSample: exact k, layout-independent, matches the E-S " +
    "keys computed in plain Scala") {
    val docs = (1L to 200L)
      .map(i => (i, s"src${i % 3}", (i % 7 + 1) * 100))
      .toDF("doc_id", "source", "n_chars")
    val got = DocOps.weightedSample(docs, k = 20)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got.size == 20)
    // reference: same Knuth hash + u^(1/w) in plain Scala
    def knuth(id: Long): Long = {
      val a = ((id % 4294967296L) + 4294967296L) % 4294967296L
      ((a / 65536L * 2654435761L) % 65536L * 65536L +
        a % 65536L * 2654435761L) % 4294967296L
    }
    val want = (1L to 200L).map { i =>
      val w = (i % 7 + 1) * 100
      val u = (knuth(i) + 0.5) / 4294967296.0
      (i, math.rint(math.pow(u, 1.0 / w) * 1e9) / 1e9)
    }.sortBy { case (id, key) => (-key, id) }.take(20)
    assert(got.map(r => (r._1, r._4)) == want, "selection diverges")
    // layout independence: repartitioned input → identical sample
    val again = DocOps.weightedSample(docs.repartition(17), k = 20)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("evalOverlapScores: planted contamination quantified per eval doc") {
    // Recreate the split hash to PLANT docs: find ids landing in
    // train (bucket < 90) and test (bucket >= 95).
    def knuth(id: Long): Long = {
      val a = ((id % 4294967296L) + 4294967296L) % 4294967296L
      ((a / 65536L * 2654435761L) % 65536L * 65536L +
        a % 65536L * 2654435761L) % 4294967296L
    }
    def bucket(id: Long) = knuth(id) % 100
    val trainId = (1L to 200L).find(bucket(_) < 90).get
    val testIds = (1L to 200L).filter(bucket(_) >= 95).take(2)
    val (contaminated, clean) = (testIds(0), testIds(1))
    // Contaminated eval doc shares its first 4 tokens (2 of 4
    // shingles) with the train doc; the clean one shares nothing.
    val docs = Seq(
      (trainId, "alpha beta gamma delta epsilon zeta"),
      (contaminated, "alpha beta gamma delta unrelated suffix"),
      (clean, "totally different words appear here now")
    ).toDF("doc_id", "text")
    val got = DocOps.evalOverlapScores(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 4 shingles each; "alpha beta gamma" + "beta gamma delta" hit
    assert(got(contaminated) == ((4L, 2L, 0.5)), got.toString)
    assert(got(clean) == ((4L, 0L, 0.0)), got.toString)
    assert(!got.contains(trainId), "train docs must not be scored")
  }

  test("neymanAllocation: budget skews to the high-variance stratum") {
    // srcA: lengths {100, 300} (σ ≈ 141.42); srcB: {200, 200} (σ 0);
    // srcC: single doc — excluded. All of the budget goes to A.
    val docs = Seq(
      (1L, "a", "srcA", 100L), (2L, "a", "srcA", 300L),
      (3L, "a", "srcB", 200L), (4L, "a", "srcB", 200L),
      (5L, "a", "srcC", 999L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val got = DocOps.neymanAllocation(docs, budget = 100)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(!got.contains("srcC"), got.toString)
    val sigmaA = math.rint(math.sqrt(
      (100.0 * 100 + 300.0 * 300 - 400.0 * 400 / 2) / 1.0) * 1e6) / 1e6
    assert(got("srcA") == ((2L, sigmaA, 1.0, 100L)), got.toString)
    assert(got("srcB") == ((2L, 0.0, 0.0, 0L)), got.toString)
  }

  test("langAgreementKappa: hand-traced κ over a planted confusion matrix") {
    // cells: (en,en)=2 agree, (fr,en)=1 disagree, (fr,fr)=1 agree.
    // p_o = 3/4; marginals rows en=2 fr=2, cols en=3 fr=1 →
    // p_e = (2·3 + 2·1)/16 = 0.5 → κ = (0.75 − 0.5)/(0.5) = 0.5.
    val docs = Seq(
      (1L, "the cat and the dog is here", "en"),
      (2L, "the dog and the cat is there", "en"),
      (3L, "the map for you", "fr"),          // detector says en
      (4L, "le chat et la mer", "fr"),
    ).toDF("doc_id", "text", "lang")
    val got = DocOps.langAgreementKappa(docs).collect().head
    assert((got.getAs[Long]("n_total"), got.getAs[Long]("n_agree"),
      got.getAs[Double]("p_observed"), got.getAs[Double]("p_expected"),
      got.getAs[Double]("kappa")) == ((4L, 3L, 0.75, 0.5, 0.5)), got.toString)
  }

  test("dupRateByBatch: within- and cross-batch dups counted against " +
      "the first-arrival keeper") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "unique one"),
      (3L, "  ALPHA   beta "),            // within-batch dup of 1 (normalized)
      (51L, "alpha beta"),                // cross-batch dup of 1
      (52L, "another unique")             // fresh in batch 1
    ).toDF("doc_id", "text")
    val got = DocOps.dupRateByBatch(docs, batchSize = 50L).collect()
      .map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dups"),
          r.getAs[Double]("dup_rate")))).toMap
    assert(got == Map(
      0L -> ((3L, 1L, 0.333333)),
      1L -> ((2L, 1L, 0.5))), got.toString)
  }

  test("mgSummary: ≤ k rows, lower bounds, true heavy hitters survive " +
      "any partitioning") {
    val words = Seq.fill(60)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 30).map(i => s"cold$i")   // N = 110; N/k at k=4 = 27.5
    for (parts <- Seq(1, 4)) {
      val toks = words.toDF("term").repartition(parts)
      val got = DocOps.mgSummary(toks, 4).collect()
        .map(r => r.getAs[String]("term") -> r.getAs[Long]("c_lb")).toMap
      assert(got.size <= 4, got.toString)
      // containment: hot (60 > 27.5) must survive; bounds: c_lb never
      // exceeds the true count, and undercounts by at most N/(k+1)
      assert(got.contains("hot"), s"parts=$parts: $got")
      assert(got("hot") <= 60L && 60L - got("hot") <= 110L / 5L,
        s"parts=$parts: $got")
      got.get("warm").foreach(c => assert(c <= 20L, got.toString))
    }
  }

  test("mixtureSampleAudit: counts reconcile with the sampler, zero-variance " +
      "rates get NULL z, z sign follows the deviation") {
    val docs = (1L to 400L).map(i =>
      (i, "t", s"src${i % 4}", 10L)).toDF("doc_id", "text", "source", "n_chars")
    val rates = Seq("src0" -> 0L, "src1" -> 1000000L, "src2" -> 500000L)
    // src3 absent from the mix → rate 0 by contract
    val audit = DocOps.mixtureSampleAudit(docs, rates).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"),
          r.getAs[Double]("expected"),
          Option(r.getAs[java.lang.Double]("binom_z"))))).toMap
    // rate 0 and rate 1e6: exact counts, no variance, NULL z
    assert(audit("src0") == ((100L, 0L, 0.0, None)), audit.toString)
    assert(audit("src1") == ((100L, 100L, 100.0, None)), audit.toString)
    assert(audit("src3") == ((100L, 0L, 0.0, None)), audit.toString)
    // rate 0.5: n_sampled reconciles with the sampler itself, and the
    // z carries the deviation's sign against expected = 50
    val (n2, s2, e2, z2) = audit("src2")
    val sampled = DocOps.mixtureSample(docs, rates)
      .filter(col("source") === "src2").count()
    assert(n2 == 100L && e2 == 50.0 && s2 == sampled, audit.toString)
    assert(z2.isDefined && (math.signum(z2.get) ==
      math.signum(s2.toDouble - 50.0) || z2.get == 0.0), audit.toString)
  }

  test("unimaxAllocation: caps below the crossover, uniform split after, " +
      "budget exactly exhausted") {
    // token counts A=100, B=1000, C=10000; budget 3000, cap 4 epochs.
    // Ascending waterfill: A caps at 400 (u₁ = 1000); at B the cap
    // 4000 > u₂ = (3000−400)/2 = 1300 → crossover k=2, B and C each
    // take 1300. 400 + 1300 + 1300 = 3000 — nothing stranded.
    def doc(id: Long, src: String, words: Int) =
      (id, Seq.fill(words)("w").mkString(" "), src)
    val docs = (Seq(doc(1, "A", 100)) ++
      (1 to 10).map(i => doc(10 + i, "B", 100)) ++
      (1 to 100).map(i => doc(100 + i, "C", 100)))
      .toDF("doc_id", "text", "source")
    val got = DocOps.unimaxAllocation(docs, budgetTokens = 3000L,
      maxEpochs = 4).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("alloc_tokens"),
          r.getAs[Double]("epochs")))).toMap
    assert(got == Map(
      "A" -> ((100L, 400L, 4.0)),
      "B" -> ((1000L, 1300L, 1.3)),
      "C" -> ((10000L, 1300L, 0.13))), got.toString)
    // a budget above every cap leaves all sources capped (k undefined)
    val rich = DocOps.unimaxAllocation(docs, budgetTokens = 1000000L,
      maxEpochs = 4).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc_tokens"))
      .toMap
    assert(rich == Map("A" -> 400L, "B" -> 4000L, "C" -> 40000L),
      rich.toString)
  }

  test("temperatureAllocation: sqrt flattens the head, shares sum to 1") {
    def doc(id: Long, src: String, words: Int) =
      (id, Seq.fill(words)("w").mkString(" "), src)
    val docs = (Seq(doc(1, "A", 100)) ++
      (1 to 4).map(i => doc(10 + i, "B", 100)))
      .toDF("doc_id", "text", "source")
    // sizes 100, 400 → weights 10, 20 → p = 1/3, 2/3 (vs raw 0.2/0.8:
    // the tail source gains share, the head loses — the point of α<1)
    val got = DocOps.temperatureAllocation(docs, budgetTokens = 3000L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("raw_share"), r.getAs[Double]("p_temp"),
          r.getAs[Double]("expected_tokens")))).toMap
    assert(got == Map(
      "A" -> ((0.2, 0.333333, 1000.0)),
      "B" -> ((0.8, 0.666667, 2000.0))), got.toString)
  }

  test("readabilityScores: hand-computed Flesch, syllable floor, " +
      "polysyllabic text scores lower") {
    val docs = Seq(
      (1L, "the cat sat."),            // 3 words, 1 sentence, 3 syllables
      (2L, "onomatopoeia everywhere"), // 2 words, 10 vowel-run syllables
      (3L, "hmm pfft")                 // vowel-free tokens floor at 1 each
    ).toDF("doc_id", "text")
    val got = DocOps.readabilityScores(docs)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // 206.835 − 1.015·(3/1) − 84.6·(3/3) = 119.19
    assert(got(1L) == ((3L, 1L, 3L, 119.19)), got.toString)
    // onomatopoeia → o|o|a|o|oeia = 5 runs; everywhere → e|e|y|e|e = 5
    assert(got(2L) == ((2L, 1L, 10L,
      math.rint((206.835 - 1.015 * 2.0 - 84.6 * 5.0) * 1e4) / 1e4)),
      got.toString)
    // polysyllabic text reads strictly harder
    assert(got(2L)._4 < got(1L)._4, got.toString)
    // vowel-free words: 1 syllable each by the floor
    assert(got(3L) == ((2L, 1L, 2L,
      math.rint((206.835 - 1.015 * 2.0 - 84.6 * 1.0) * 1e4) / 1e4)),
      got.toString)
  }

  test("rakeKeyphrases: degree/freq scoring, maxLen cap drops prose runs") {
    // doc 1 segments on "the" into "deep learning" (len 2) and
    // "deep learning model" (len 3): deg(deep) = deg(learning) =
    // 2 + 3 = 5 over freq 2 → 2.5; deg(model) = 3/1 = 3 →
    // phrase scores 5.0 and 8.0. doc 2 is one 6-word stopword-free
    // run — over maxLen 4, contributes NO candidates (and its words
    // stay out of the stats).
    val docs = Seq(
      (1L, "deep learning the deep learning model"),
      (2L, "p q r s t u"),
    ).toDF("doc_id", "text")
    val got = DocOps.rakeKeyphrases(docs).collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("n_occurrences"),
        r.getAs[Double]("rake_score"))).toSeq
    assert(got == Seq(
      ("deep learning model", 1L, 8.0),
      ("deep learning", 1L, 5.0)), got.toString)
  }

  test("sourceVocabOverlap: exact set sizes and Jaccard; disjoint " +
    "pairs are absent, not zero rows") {
    val docs = Seq((1L, "a b c", "s1"), (2L, "b c d", "s2"),
      (3L, "x", "s3")).toDF("doc_id", "text", "source")
    val got = graft.ops.DocOps.sourceVocabOverlap(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("v_a"), r.getAs[Long]("v_b"),
          r.getAs[Long]("n_common"), r.getAs[Double]("jaccard")))).toMap
    assert(got == Map(("s1", "s2") -> ((3L, 3L, 2L, 0.5))), got)
  }

  test("filterAttritionWaterfall: each stage drops exactly its " +
    "planted victim, prefix-AND counts") {
    val docs = Seq(
      (1L, "", "en", 0L),                                // stage 1
      (2L, "the cat and dog", "en", 50L),                // stage 2
      (3L, "the cat and the dog", "en", 600L),           // stage 3
      (4L, "word word word word word word word word word the",
        "en", 200L),                                     // stage 4 (TTR .2)
      (5L, "le chat et la maison", "en", 200L),          // stage 5 (pred fr)
      (6L, "the cat and the dog runs", "en", 200L))      // survives
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = graft.ops.DocOps.filterAttritionWaterfall(docs).collect()
      .map(r => r.getAs[Long]("stage") ->
        ((r.getAs[String]("rule"), r.getAs[Long]("n_pass"),
          r.getAs[Long]("n_dropped"), r.getAs[Double]("retention")))).toMap
    assert(got == Map(
      0L -> (("total", 6L, 0L, 1.0)),
      1L -> (("nonempty", 5L, 1L, 0.833333)),
      2L -> (("min_length", 4L, 1L, 0.8)),
      3L -> (("max_length", 3L, 1L, 0.75)),
      4L -> (("lexical_diversity", 2L, 1L, 0.666667)),
      5L -> (("langid_agrees", 1L, 1L, 0.5))), got)
  }

  test("langIdPrf1: per-class tp/marginals with NULL-denominator " +
    "guards and the tp=0 f1 pin") {
    val docs = Seq(
      (1L, "the cat and the dog", "en"),        // pred en  -> en tp
      (2L, "xyzzy qwert", "en"),                // pred und -> en fn
      (3L, "le chat et la maison de paris", "fr"), // pred fr -> fr tp
      (4L, "the train of the station", "de"))   // pred en  -> en fp, de fn
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.DocOps.langIdPrf1(docs).collect()
      .map(r => r.getAs[String]("language") ->
        ((r.getAs[Long]("n_true"), r.getAs[Long]("n_pred"),
          r.getAs[Long]("tp"),
          Option(r.getAs[java.lang.Double]("precision")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("recall")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("f1")).map(_.toDouble)))).toMap
    assert(got == Map(
      "en" -> ((2L, 2L, 1L, Some(0.5), Some(0.5), Some(0.5))),
      "fr" -> ((1L, 1L, 1L, Some(1.0), Some(1.0), Some(1.0))),
      "de" -> ((1L, 0L, 0L, None, Some(0.0), None)),
      "und" -> ((0L, 1L, 0L, Some(0.0), None, None))), got)
  }

  test("datasetManifest: sorted-digest fold is content-addressed and " +
    "arrival-order independent") {
    import java.security.MessageDigest
    def hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // ids 0 and 8 land in the same shard (mod 8); id 1 in another
    val docs = Seq((0L, "alpha", "s1", 5L), (8L, "beta", "s1", 4L),
      (1L, "gamma", "s1", 5L))
      .toDF("doc_id", "text", "source", "n_chars")
    val got = DocOps.datasetManifest(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
          r.getAs[String]("manifest_md5")))).toMap
    val shard0 = hex(Seq(hex("alpha"), hex("beta")).sorted.mkString)
    assert(got == Map(
      ("s1", 0L) -> ((2L, 9L, shard0)),
      ("s1", 1L) -> ((1L, 5L, hex(hex("gamma"))))), got)
    // permuting arrival order leaves every digest unchanged
    val perm = DocOps.datasetManifest(
        docs.orderBy(col("text").desc)).collect()
      .map(r => r.getAs[String]("manifest_md5")).sorted
    assert(perm.toSeq == got.values.map(_._3).toSeq.sorted)
  }

  test("jensenShannonBySource: identical sources diverge zero; a " +
    "disjoint-vocabulary source matches the closed form") {
    // both sources have the same distribution -> P = C -> JS = 0
    val same = Seq((1L, "a b", "en", "s1", 3L), (2L, "a b", "en", "s2", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val g0 = DocOps.jensenShannonBySource(same).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("js_vs_corpus"))
      .toMap
    assert(g0 == Map("s1" -> 0.0, "s2" -> 0.0), g0)
    // s1 = {a}, s2 = {b}: corpus {a:.5, b:.5}. For s1: present term a
    // (p=1, c=.5, m=.75) plus the absent-mass ln2 correction for b
    val disj = Seq((1L, "a", "en", "s1", 1L), (2L, "b", "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val exp = BigDecimal((1.0 * math.log(1.0 / 0.75) +
      0.5 * math.log(0.5 / 0.75) +
      0.6931471805599453 * 0.5) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val g1 = DocOps.jensenShannonBySource(disj).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("js_vs_corpus"))
      .toMap
    assert(g1 == Map("s1" -> exp, "s2" -> exp), s"$g1 vs $exp")
    // bounded by ln 2
    assert(exp <= 0.693148, exp)
  }

  test("simpsonDiversityBySource: exact collision probability, " +
    "Gini-Simpson and effective vocab; singleton source yields NULLs") {
    // s1: "a a b" -> counts a:2 b:1, coll = 2, N = 3:
    //   lambda = 2/6 = 0.333333, gini = 0.666667, eff = 3.0
    // s2: one token -> N(N-1) = 0 -> NULL stats, counts intact
    val docs = Seq((1L, "a a b", "en", "s1", 5L),
      (2L, "x", "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DocOps.simpsonDiversityBySource(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val r1 = got("s1")
    assert((r1.getAs[Long]("vocab"), r1.getAs[Long]("n_tokens")) ==
      ((2L, 3L)), r1)
    assert((r1.getAs[Double]("simpson_lambda"),
      r1.getAs[Double]("gini_simpson"),
      r1.getAs[Double]("effective_vocab")) ==
      ((0.333333, 0.666667, 3.0)), r1)
    val r2 = got("s2")
    assert(r2.getAs[Long]("n_tokens") == 1L &&
      r2.isNullAt(r2.fieldIndex("simpson_lambda")), r2)
  }

  test("termBurstiness: VMR separates the bursty term from the spread " +
    "one and orders the cut deterministically") {
    // n=3 docs. x: df=1 tf=3 q=9 -> (27-9)/9 = 2.0 (bursty);
    // z: df=1 tf=1 -> (3-1)/3 = 0.666667; y: df=2 tf=2 q=2 ->
    // (6-4)/6 = 0.333333 (spread)
    val docs = Seq((1L, "x x x", "en", "s1", 5L),
      (2L, "y", "en", "s1", 1L), (3L, "y z", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DocOps.termBurstiness(docs, minDf = 1, topK = 10).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Double]("vmr")))
    assert(got.toSeq == Seq(("x", 2.0), ("z", 0.666667),
      ("y", 0.333333)), got.toSeq)
  }

  test("chao1VocabRichness: hand-computed Chao1-bC and Good-Turing " +
    "coverage from planted hapax/dis counts") {
    // s1: "a a b c" -> V=3, N=4, f1=2 (b,c), f2=1 (a)
    //   chao1 = 3 + 2·1/(2·2) = 3.5   coverage = 1 − 2/4 = 0.5
    // s2: every word twice -> f1=0: chao1 = V exactly, coverage 1
    val docs = Seq((1L, "a a b c", "en", "s1", 7L),
      (2L, "x y x y", "en", "s2", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DocOps.chao1VocabRichness(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("vocab"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("f1"), r.getAs[Long]("f2"),
          r.getAs[Double]("chao1"), r.getAs[Double]("gt_coverage"))))
      .toMap
    assert(got == Map(
      "s1" -> ((3L, 4L, 2L, 1L, 3.5, 0.5)),
      "s2" -> ((2L, 4L, 0L, 2L, 2.0, 1.0))), got)
  }

  test("heapsLawFit: log-log OLS on the cumulative growth curve " +
    "matches the micro-unit closed form; single-doc source is NULL") {
    // s1 doc order: "a b" then "a c" -> points (N,V) = (2,2), (4,3)
    val docs = Seq((1L, "a b", "en", "s1", 3L),
      (2L, "a c", "en", "s1", 3L),
      (9L, "solo words here", "en", "s2", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DocOps.heapsLawFit(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // same integer pipeline recomputed independently
    def mu(x: Double) = BigDecimal(math.log(x) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val (x1, y1, x2, y2) = (mu(2), mu(2), mu(4), mu(3))
    val (k, sx, sy) = (2L, x1 + x2, y1 + y2)
    val sxy = BigInt(x1) * y1 + BigInt(x2) * y2
    val sxx = BigInt(x1) * x1 + BigInt(x2) * x2
    val beta = (BigInt(k) * sxy - BigInt(sx) * sy).toDouble /
      (BigInt(k) * sxx - BigInt(sx) * sx).toDouble
    val expBeta = BigDecimal(beta).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val r1 = got("s1")
    assert(r1.getAs[Long]("n_docs") == 2L &&
      r1.getAs[Double]("heaps_beta") == expBeta, r1)
    // β ≈ log2(1.5) = 0.585: each doubling of tokens pays ~1.5× vocab
    assert(math.abs(r1.getAs[Double]("heaps_beta") - 0.584963) < 1e-3, r1)
    // one doc -> one point -> zero OLS denominator -> NULL fit
    val r2 = got("s2")
    assert(r2.isNullAt(r2.fieldIndex("heaps_beta")) &&
      r2.isNullAt(r2.fieldIndex("heaps_k")), r2)
  }

  test("pmiWindowCollocations: alternating bigram wins with the exact " +
    "single-N PMI; self-pairs are excluded") {
    // "x y x y ..." (10 tokens): (x,y) co-occurs 9 times in the +-2
    // window; the off-2 pairs are all self-pairs and drop out.
    val docs = Seq((1L, ("x y " * 5).trim, "s"))
      .toDF("doc_id", "text", "source")
    val got = graft.ops.DocOps.pmiWindowCollocations(docs).collect()
    assert(got.length == 1, got.mkString(","))
    val r = got.head
    assert((r.getAs[String]("wa"), r.getAs[String]("wb"),
      r.getAs[Long]("n_pair"), r.getAs[Long]("na"),
      r.getAs[Long]("nb")) == (("x", "y", 9L, 5L, 5L)), r)
    assert(r.getAs[Double]("pmi") ==
      math.rint(math.log(90.0 / 25.0) * 1e6) / 1e6, r)
  }

  test("sourceNgramNovelty: shared 3-gram counted for neither source; " +
    "a disjoint source scores 1.0") {
    val docs = Seq(
      (1L, "a b c d", "s1"),
      (2L, "a b c x", "s2"),
      (3L, "q r s t u", "s3"),
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.DocOps.sourceNgramNovelty(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_unique"),
          r.getAs[Double]("novelty_share")))).toMap
    assert(got("s1") == ((2L, 1L, 0.5)), got.toString)
    assert(got("s2") == ((2L, 1L, 0.5)), got.toString)
    assert(got("s3") == ((3L, 3L, 1.0)), got.toString)
  }

  test("codeLikeShare: the stated line heuristics split code from " +
    "prose; per-doc micro-pins make the source mean exact") {
    val docs = Seq(
      (1L, "x = 1;\nplain prose", "s1"),   // 1/2 lines code-ish
      (2L, "hello\nworld", "s1"),           // 0/2
      (3L, "def f():\n    return 2", "s2"), // 2/2 (keyword + indent)
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.DocOps.codeLikeShare(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("avg_code_share"),
          r.getAs[Long]("n_code_docs"),
          r.getAs[Double]("code_doc_share")))).toMap
    assert(got("s1") == ((2L, 0.25, 1L, 0.5)), got.toString)
    assert(got("s2") == ((1L, 1.0, 1L, 1.0)), got.toString)
  }

  test("neardupThresholdSweep: all seven rungs visible, counts " +
    "monotone non-increasing, planted twins survive to 0.9") {
    // two identical 12-token docs (jaccard 1.0) + one sharing a
    // 5-token prefix with them (partial overlap) + one disjoint
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu"
    val docs = Seq(
      (1L, base, "s"), (2L, base, "s"),
      (3L, "alpha beta gamma delta epsilon nu xi omicron pi rho", "s"),
      (4L, "one two three four five six seven eight nine ten", "s"),
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.DedupOps.neardupThresholdSweep(docs)
      .orderBy("tau_x10000").collect()
    assert(got.map(_.getAs[Long]("tau_x10000")).toSeq ==
      (3 to 9).map(_ * 1000L), got.mkString(","))
    val counts = got.map(_.getAs[Long]("n_pairs")).toSeq
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      counts.toString)
    // the exact-twin pair survives every rung
    assert(counts.last >= 1L, counts.toString)
  }

  test("doclenHillTail: k = ceil(n/10) top lengths against the exact " +
    "order-statistic threshold; ties at the threshold contribute 0") {
    // 10 docs: one of 100 chars over nine of 50 -> k = 1, threshold =
    // 2nd largest = 50, S = round(ln 2 * 1e6) = 693147 micro-units ->
    // alpha = 1e6/693147 = 1.4427
    val docs = ((1L to 9L).map(i => (i, "t", "s", 50L)) :+
      (10L, "t", "s", 100L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = graft.ops.DocOps.doclenHillTail(docs).collect().head
    assert((r.getAs[Long]("n_docs"), r.getAs[Long]("k"),
      r.getAs[Long]("tail_threshold")) == ((10L, 1L, 50L)), r)
    assert(r.getAs[Double]("hill_alpha") ==
      math.rint(1e6 / 693147.0 * 1e6) / 1e6, r)
    // all lengths equal: the strict-greater set is empty -> NULL alpha
    val flat = (1L to 10L).map(i => (i, "t", "s", 50L))
      .toDF("doc_id", "text", "source", "n_chars")
    val rf = graft.ops.DocOps.doclenHillTail(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("hill_alpha")), rf)
  }
}
