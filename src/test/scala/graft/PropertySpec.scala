package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.ops.{DedupOps, EventOps, JoinOps, TootOps}

/** Property-based coverage (ScalaCheck generators + single-pass Spark
  * assertions — one job over a generated batch, not one job per case).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("timestamp chain: every supported rendering parses to the instant") {
    val genEpoch = Gen.choose(1500000000L, 1900000000L) // 2017..2030
    val fmts = Seq[java.time.format.DateTimeFormatter](
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS'+00:00'"),
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'+00:00'"),
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'"))
    val cases = Gen.listOfN(200, for {
      epoch <- genEpoch
      fi <- Gen.choose(0, fmts.size - 1)
    } yield (epoch, fi)).sample.get
    val rendered = cases.map { case (epoch, fi) =>
      val inst = java.time.LocalDateTime.ofEpochSecond(epoch, 0,
        java.time.ZoneOffset.UTC)
      (epoch, fmts(fi).format(inst))
    }
    val got = rendered.toDF("epoch", "created_at")
      .select(col("epoch"),
        TootOps.parseCreatedAt(col("created_at")).cast("long").as("parsed"))
      .filter(col("epoch") =!= col("parsed"))
    assert(got.count() == 0, got.limit(5).collect().mkString(", "))
  }

  test("mixtureSample: keeps are monotone in the rate and exact at 0/1M") {
    import graft.ops.DocOps
    val docs = (0L until 600L).map(i => (i, "s", 1L))
      .toDF("doc_id", "source", "n_chars")
    val genRates = Gen.listOfN(6, Gen.choose(0L, 1000000L)).sample.get.sorted
    // raising a source's rate can only ADD documents (the keep
    // predicate is hash < rate — a threshold on a fixed per-doc hash)
    val keptSets = genRates.map(r =>
      DocOps.mixtureSample(docs, Seq("s" -> r))
        .collect().map(_.getAs[Long]("doc_id")).toSet)
    keptSets.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo.subsetOf(hi),
        s"monotonicity broken: ${lo.size} !⊆ ${hi.size}")
      case _ =>
    }
    assert(DocOps.mixtureSample(docs, Seq("s" -> 0L)).count() == 0L)
    assert(DocOps.mixtureSample(docs, Seq("s" -> 1000000L)).count() == 600L)
  }

  test("ngramNovelty: bounded in [0,1], counts consistent") {
    import graft.ops.DocOps
    val words = Gen.listOfN(400, for {
      n <- Gen.choose(3, 12)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    } yield ws.mkString(" ")).sample.get
    val docs = words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val bad = DocOps.ngramNovelty(docs)
      .filter(col("novelty") < 0.0 || col("novelty") > 1.0 ||
        col("n_novel") > col("n_shingles") || col("n_shingles") <= 0)
    assert(bad.count() == 0, bad.limit(5).collect().mkString(", "))
  }

  test("fuzzyNamePairsBlocked finds every random single middle-token edit") {
    // The recall contract token blocking is allowed to promise: an
    // edit confined to a MIDDLE token leaves both end tokens intact,
    // so at least one blocking pass pairs the names and the
    // levenshtein gate (dist 1-2 ≤ 3) keeps them. 120 random cases —
    // substitution, deletion, insertion, adjacent transposition —
    // checked against ONE Spark evaluation of the operator.
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    val cases = (0 until 120).flatMap { _ =>
      val toks = Vector.fill(3 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
      val mi = 1 + rnd.nextInt(toks.length - 2)
      val t = toks(mi)
      val op = rnd.nextInt(4)
      val edited =
        if (op == 0) { // substitution, guaranteed to change the char
          val p = rnd.nextInt(t.length)
          t.updated(p, if (t(p) == 'z') 'y' else 'z')
        } else if (op == 1 && t.length > 1) { // deletion
          val p = rnd.nextInt(t.length)
          t.take(p) + t.drop(p + 1)
        } else if (op == 2) { // insertion (always changes length)
          val p = rnd.nextInt(t.length + 1)
          t.take(p) + "q" + t.drop(p)
        } else if (t.length > 1) { // adjacent transposition
          val p = rnd.nextInt(t.length - 1)
          if (t(p) == t(p + 1)) t.updated(p, 'z')
          else t.take(p) + t(p + 1) + t(p) + t.drop(p + 2)
        } else t + "q"
      val a = toks.mkString(" ")
      val b = (toks.take(mi) :+ edited).++(toks.drop(mi + 1)).mkString(" ")
      if (a == b) Nil else Seq((a, b))
    }
    val part = cases.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2L, a), (i * 2L + 1L, b)) }.toDF("p_partkey", "p_name")
    val found = JoinOps.fuzzyNamePairsBlocked(part, maxDist = 3)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    val missing = cases.filterNot { case (a, b) =>
      found.contains(if (a < b) (a, b) else (b, a)) }
    assert(missing.isEmpty, s"missed ${missing.take(5)}")
  }

  test("connectedComponentsStar ≡ min-label propagation on random graphs") {
    // both algorithms must produce identical (vertex → component-min)
    // labels on arbitrary edge sets: chains, blobs, self-loops,
    // duplicate and reversed edges all mixed
    val rnd = new scala.util.Random(17)
    val edges = (Seq.tabulate(40)(i => (i.toLong, i + 1L)) ++ // one long chain
      Seq.fill(60)((rnd.nextInt(30) + 100L, rnd.nextInt(30) + 100L)) ++
      Seq.fill(20)((rnd.nextInt(10) + 200L, rnd.nextInt(10) + 200L)))
      .map { case (a, b) => if (rnd.nextBoolean()) (a, b) else (b, a) }
    val pairs = edges.toDF("a_id", "b_id")
    val star = DedupOps.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = DedupOps.connectedComponents(pairs, maxRounds = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop,
      s"disagreement: ${(star.toSet diff prop.toSet).take(5)} / ${
        (prop.toSet diff star.toSet).take(5)}")
  }

  test("shardAssignments: two-level ≡ flat window on random sparse ids") {
    import graft.ops.DocOps
    val rnd = new scala.util.Random(23)
    // sparse, shuffled, non-contiguous ids across skewed sources
    val docs = Seq.fill(300)((
        rnd.nextLong(1L << 40).abs,
        s"s${rnd.nextInt(4)}",
        (rnd.nextInt(5000) + 1).toLong))
      .distinctBy(_._1)
      .toDF("doc_id", "source", "n_chars")
    def m(bucket: Long) = DocOps.shardAssignments(docs, 7000L, bucket)
      .as[(String, Long, Long, Long)].collect().toSet
    val flat = m(1L << 50)
    assert(m(1L << 30) == flat, "sparse-id bucketing diverged from flat")
    assert(m(977L) == flat, "odd bucket width diverged from flat")
  }

  test("latestPerUser keeps exactly the (ts, event_id)-max row per user") {
    val gen = Gen.listOfN(300, for {
      user <- Gen.choose(0L, 20L)
      tsSec <- Gen.choose(0L, 50L) // force ts collisions
      id <- Gen.choose(0L, 100000L)
      v <- Gen.choose(0.0, 100.0)
    } yield (id, tsSec, user, v)).sample.get.distinctBy(_._1)
    val df = gen.toDF("event_id", "sec", "user_id", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("event_id", "ts", "user_id", "value")
    val kept = EventOps.latestPerUser(df)
      .select(col("user_id"), col("ts").cast("long").as("sec"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val expected = gen.groupBy(_._3).view.mapValues(rows =>
      rows.maxBy(r => (r._2, r._1))).toMap
    assert(kept.length == expected.size)
    kept.foreach { case (user, sec, id) =>
      val e = expected(user)
      assert((e._2, e._1) == (sec, id), s"user $user: got ($sec,$id) exp $e")
    }
  }

  test("minhash signature agreement estimates jaccard (±0.25 @ 32 hashes)") {
    val vocab = ('a' to 'z').map(_.toString)
    val genDoc = Gen.listOfN(40, Gen.oneOf(vocab)).map(_.mkString(" "))
    val pairs = Gen.listOfN(30, Gen.zip(genDoc, genDoc)).sample.get
    val docs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2L, a), (i * 2L + 1, b))
    }.toDF("doc_id", "text")
    val sigs = DedupOps.minhashSignatures(docs, numHashes = 32)
      .collect().map(r => r.getLong(0) ->
        (1 to 32).map(i => r.getLong(i)).toVector).toMap
    val sets = DedupOps.shingleRows(docs).groupBy("doc_id")
      .agg(collect_set(col("sh")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    pairs.indices.foreach { i =>
      val (a, b) = (i * 2L, i * 2L + 1)
      val jac = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      val est = sigs(a).zip(sigs(b)).count(p => p._1 == p._2) / 32.0
      assert(math.abs(jac - est) <= 0.25,
        f"pair $i: jaccard=$jac%.3f minhash-est=$est%.3f")
    }
  }

  test("bucketed rangeJoinPairs equals the naive O(n²) definition") {
    // random sub-second timestamps clustered near bucket boundaries —
    // the 2-probe bucket pruning must lose no pair and invent none
    val windowSec = 60
    val rows = Gen.listOfN(300, for {
      user <- Gen.choose(1L, 5L)
      // cluster around multiples of windowSec, with millis
      base <- Gen.choose(1709280000L, 1709280000L + 600L)
      ms <- Gen.choose(0, 999)
    } yield (user, base * 1000L + ms)).sample.get
      .zipWithIndex.map { case ((u, tsMs), i) => (i.toLong, u, tsMs) }
    val df = rows.toDF("event_id", "user_id", "ts_ms")
      .select(col("event_id"), col("user_id"),
        timestamp_millis(col("ts_ms")).as("ts"))
    val got = EventOps.rangeJoinPairs(df, windowSec)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (aId, aU, aTs) <- rows
      (bId, bU, bTs) <- rows
      if aU == bU && aId < bId &&
        bTs >= aTs && bTs <= aTs + windowSec * 1000L
    } yield (aId, bId)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("scalacheck: keywordRegex matches iff some keyword is a substring") {
    val word = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
    val prop = Prop.forAll(Gen.listOfN(3, word), word) { (kws, text) =>
      kws.nonEmpty ==> {
        val re = ops.DocOps.keywordRegex(kws)
        val expected = kws.exists(k => text.contains(k))
        text.matches(s".*$re.*") == expected
      }
    }
    check(prop)
  }

  test("sequencePacking and bpeTrainRounds are partitioning-invariant") {
    // both operators rest on total orders (window sort keys, argmax
    // tie-breaks, islands), so a physical re-layout of the input must
    // not move a single output value — the determinism their oracle
    // gates assume
    val rnd = new scala.util.Random(7)
    val docs = (1L to 120L).map { i =>
      val words = (0 until rnd.nextInt(30)).map(_ =>
        ('a' + rnd.nextInt(4)).toChar.toString * (1 + rnd.nextInt(3)))
      (i, words.mkString(" "), s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    def packed(df: org.apache.spark.sql.DataFrame) =
      ops.DocOps.sequencePacking(df, seqLen = 16).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(packed(docs.repartition(13)) == packed(docs.coalesce(1)),
      "sequencePacking moved under re-layout")
    def trained(df: org.apache.spark.sql.DataFrame) =
      ops.DocOps.bpeTrainRounds(df).collect()
        .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(trained(docs.repartition(13)) == trained(docs.coalesce(1)),
      "bpeTrainRounds moved under re-layout")
  }
}
