package graft

import graft.ops.DocOps

/** Gopher-rule quality flags over planted documents: each heuristic
  * must fire on its planted violation and pass on the good document.
  */
class GopherQualitySpec extends SparkSpec {
  import spark.implicits._

  // 60 words, stopwords present, clean prose — passes every rule
  private val good = (("the quick brown fox jumps over and over the lazy dog " +
    "with great enthusiasm for every morning run that anyone have seen ") * 3).trim
  // 10 words — fails the min-word bound
  private val short_ = "the cat and the dog have fun with that ball"
  // hashtag spam — fails the hash ratio
  private val hashy = ("the post with many tags have that reach for all " +
    "viewers and more words to pass the other rules here now okay " +
    "#a #b #c #d #e #f #g #h #i #j #k #l #m #n #o #p #q #r " +
    "#s #t #u #v #w #x #y #z #aa #bb #cc #dd #ee #ff #gg #hh").trim
  // numeric noise — fails the alphabetic-word ratio
  private val nums = ("the data and the value of that run with 1 2 3 4 5 6 7 " +
    "8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24 25 26 27 28 29 30 31 " +
    "32 33 34 35 36 37 38 39 40 41 42 43 44").trim
  // one line duplicated many times — fails the duplicate-line fraction
  private val dupLines = Iterator.fill(10)(
    "the same line repeats here with that and have for all of the time")
    .mkString("\n")

  private lazy val flags = DocOps.gopherQualityFlags(
    Seq((0L, good), (1L, short_), (2L, hashy), (3L, nums), (4L, dupLines))
      .toDF("doc_id", "text"))
    .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("clean prose passes every rule") {
    assert(flags(0L).getAs[Long]("keep") == 1L,
      s"good doc rejected: ${flags(0L)}")
  }

  test("short document fails the word-count bound") {
    assert(flags(1L).getAs[Long]("n_words") == 10L)
    assert(flags(1L).getAs[Long]("keep") == 0L)
  }

  test("hashtag spam fails the hash ratio") {
    assert(flags(2L).getAs[Double]("hash_ratio") > 0.1, flags(2L).toString)
    assert(flags(2L).getAs[Long]("keep") == 0L)
  }

  test("numeric noise fails the alphabetic-word ratio") {
    assert(flags(3L).getAs[Double]("alpha_word_ratio") < 0.8, flags(3L).toString)
    assert(flags(3L).getAs[Long]("keep") == 0L)
  }

  test("duplicated lines fail the dup-line fraction") {
    assert(flags(4L).getAs[Double]("dup_line_frac") > 0.3, flags(4L).toString)
    assert(flags(4L).getAs[Long]("keep") == 0L)
  }

  test("repetitionSignals: dup words and a dominant bigram are measured") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // all distinct
      (1L, "spam spam spam spam spam spam"),       // one word repeated
      (2L, "one two one two one two one two"),     // dominant bigram
    ).toDF("doc_id", "text")
    val got = DocOps.repetitionSignals(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Double]("dup_word_frac") == 0.0)
    assert(got(0L).getAs[Double]("top_bigram_frac") == 0.2) // 1 of 5
    assert(got(1L).getAs[Double]("dup_word_frac") == 1.0 - 1.0 / 6.0)
    assert(got(1L).getAs[Double]("top_bigram_frac") == 1.0) // "spam spam" x5
    // "one two" appears 4 times of 7 bigrams
    assert(got(2L).getAs[Double]("top_bigram_frac") == 4.0 / 7.0)
  }

  test("scrubPii redacts URLs, emails, and phones progressively") {
    val docs = Seq(
      (0L, "mail john.doe+x@example.com or visit https://ex.com/a?b=c#d now"),
      (1L, "call 415-555-1234 or 4155551234 today"),
      (2L, "https://user:pw@host.com/path is one URL, not an email"),
      (3L, "nothing sensitive here at all"),
    ).toDF("doc_id", "text")
    val got = DocOps.scrubPii(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Long]("n_urls") == 1L)
    assert(got(0L).getAs[Long]("n_emails") == 1L)
    val s0 = got(0L).getAs[String]("scrubbed")
    assert(s0.contains("<EMAIL>") && s0.contains("<URL>"), s0)
    assert(!s0.contains("example.com") && !s0.contains("ex.com"), s0)
    assert(got(1L).getAs[Long]("n_phones") == 2L)
    assert(got(1L).getAs[String]("scrubbed")
      == "call <PHONE> or <PHONE> today")
    // the URL scrub runs first, so its userinfo is not counted as email
    assert(got(2L).getAs[Long]("n_urls") == 1L)
    assert(got(2L).getAs[Long]("n_emails") == 0L)
    assert(got(3L).getAs[String]("scrubbed") == "nothing sensitive here at all")
  }

  test("datasetSplits is deterministic, order-independent, roughly 90/5/5") {
    val docs = (0L until 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = DocOps.datasetSplits(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // identical assignment after a different partition layout
    val b = DocOps.datasetSplits(docs.repartition(17))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b, "split assignment depends on partitioning")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.03, frac.toString)
    assert(math.abs(frac("val") - 0.05) < 0.02, frac.toString)
    assert(math.abs(frac("test") - 0.05) < 0.02, frac.toString)
  }

  test("datasetSplits matches the exact Knuth hash on overflow-range ids") {
    // ids ≳ 3.47e9 overflow a naive doc_id * 2654435761 in signed
    // 64-bit; the split-multiply must still equal the mathematical
    // (id * C) mod 2^32 mod 100 computed in unbounded integers.
    val ids = Seq(0L, 1L, 3470000000L, 4294967295L, 4294967296L,
      1234567890123L, Long.MaxValue)
    val got = DocOps.datasetSplits(ids.map(i => (i, "x")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val want = ((BigInt(id) * BigInt(2654435761L))
        .mod(BigInt(4294967296L)).mod(BigInt(100))).toLong
      assert(got(id) == want, s"doc_id=$id: got ${got(id)}, want $want")
    }
  }

  test("stopword counting sees word boundaries, not substrings") {
    val one = DocOps.gopherQualityFlags(
      Seq((9L, "theme android tomato often without shave forward " +
        "bathe brandy")).toDF("doc_id", "text"))
      .collect().head
    assert(one.getAs[Long]("n_stopwords") == 0L, one.toString)
  }
}
