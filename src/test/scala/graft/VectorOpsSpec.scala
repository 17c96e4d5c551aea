package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),  // near query
    (2L, Array(0.0f, 1.0f, 0.0f), 1),  // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f), 1), // opposite
    (4L, Array(0.8f, 0.2f, 0.1f), 0),  // near-ish
  ).toDF("vec_id", "embedding", "label")

  test("knnBrute ranks by cosine with deterministic tie-break") {
    val got = VectorOps.knnBrute(vecs, queryVecId = 0, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 4L, 2L), s"got $got")
  }

  test("mmrDiverseTopK: the diversity penalty promotes the orthogonal " +
    "pick over the near-duplicate of the first selection") {
    // q = (1,0). vec1 (0.8,0.6): rel .8 wins step 1. vec2 (0.79,0.6):
    // rel .7964 but cos(2,1) rounds to 1.0 -> score -.1018; vec3
    // (1,-1): rel .7071, cos(3,1) = .1414 -> score .2829 wins step 2
    // despite lower relevance. vec2 last, carrying max_sim 1.0.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.8f, 0.6f), 0),
      (2L, Array(0.79f, 0.6f), 0),
      (3L, Array(1.0f, -1.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.mmrDiverseTopK(emb, 0L, 3, 0.5)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 2L),
      got.mkString(","))
    assert(got(0).getAs[Double]("mmr_score") == 0.4, got(0))
    assert(got(1).getAs[Double]("max_sim_selected") == 0.1414, got(1))
    assert(got(2).getAs[Double]("max_sim_selected") == 1.0, got(2))
  }

  test("signCodes pack sign bits into 32-bit words; hammingDist is " +
    "XOR+popcount; knnHamming matches a flat top-k") {
    // dim 34 exercises the partial second word + the out-of-range
    // guard (bits 34..63 of word 1 must stay 0)
    val d34 = Seq(
      (0L, (0 until 34).map(i => if (i % 2 == 0) 1.0f else -1.0f).toArray),
      (1L, (0 until 34).map(i => if (i % 2 == 0) 1.0f else -1.0f).toArray),
      (2L, (0 until 34).map(i => if (i < 32) -1.0f else 1.0f).toArray),
      (3L, Array.fill(34)(0.0f)), // sign of 0 → bit 0
    ).toDF("vec_id", "embedding")
    val codes = d34.select(col("vec_id"),
      VectorOps.signCodes(col("embedding"), 34).as("code"))
      .as[(Long, Seq[Long])].collect().toMap
    // even positions 0,2,…,32 set: word0 = 0x55555555, word1 = bit 0+...
    assert(codes(0L) == Seq(0x55555555L, 1L), codes(0L).toString)
    assert(codes(1L) == codes(0L))
    assert(codes(2L) == Seq(0L, 3L), codes(2L).toString) // bits 32, 33
    assert(codes(3L) == Seq(0L, 0L))
    val h = d34.as("a").crossJoin(d34.as("b"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        VectorOps.hammingDist(
          VectorOps.signCodes(col("a.embedding"), 34),
          VectorOps.signCodes(col("b.embedding"), 34)).as("h"))
      .as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // (0,2): word0 XOR = bits {0,2,…,30} (16 bits; bit 32 cancels —
    // both codes set it), word1 XOR = bit 33 → 17 total
    assert(h((0L, 1L)) == 0 && h((0L, 3L)) == 17 && // 17 set bits
      h((2L, 3L)) == 2 && h((0L, 2L)) == 17, h.toString)

    // knnHamming ≡ flat window top-k on the same distances
    val flat = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        VectorOps.hammingDist(
          VectorOps.signCodes(col("a.embedding"), 3),
          VectorOps.signCodes(col("b.embedding"), 3)).cast("long")
          .as("hamming"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("a_id")
          .orderBy(col("hamming").asc, col("b_id").asc)))
      .filter(col("rn") <= 2).drop("rn")
    val two = VectorOps.knnHamming(vecs, k = 2, dim = 3)
    assert(two.except(flat).isEmpty && flat.except(two).isEmpty)
  }

  test("hammingBandedPairs: pigeonhole-complete below the band count, " +
    "verified subset above it") {
    import scala.util.Random
    val rnd = new Random(7)
    val emb = (0L until 40L).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() - 0.5f))
    } :+ ((100L, Array.fill(64)(0.25f))) :+ ((101L, {
      val a = Array.fill(64)(0.25f); a(5) = -0.25f; a(40) = -0.25f; a
    })) // distance 2 pair — must ALWAYS be found
    val df = emb.toDF("vec_id", "embedding")
    val got = VectorOps.hammingBandedPairs(df, maxHamming = 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((100L, 101L, 2L)), got.toString)
    // every banded pair verifies: hamming <= 20, a < b, and matches
    // the brute distance
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        VectorOps.hammingDist(
          VectorOps.signCodes(col("a.embedding"), 64),
          VectorOps.signCodes(col("b.embedding"), 64)).cast("long"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.forall { case (a, b, h) => h <= 20L && brute((a, b)) == h })
    // pigeonhole: every brute pair under 8 bits is present
    val close = brute.filter(_._2 < 8L).keySet
    assert(close.forall(p => got.exists(g => (g._1, g._2) == p)),
      s"missed pigeonhole-guaranteed pairs: $close vs $got")
  }

  test("ndcgAtK: hand-traced DCG/IDCG, zero-relevant query yields NULL") {
    // query 0 (label 1, axis x): ranking is 1 (cos 1, rel),
    // 2 (cos .7071, irrel), 3 (cos 0, rel) → DCG = 1 + 0 + 1/log2(4)
    // = 1.5; n_relevant = 2 → IDCG = 1 + 1/log2(3); query 4 (label 9)
    // has no same-label neighbor → NULL ndcg.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(1.0f, 0.0f), 1),
      (2L, Array(1.0f, 1.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(-1.0f, 0.0f), 9),
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.ndcgAtK(emb, queryIds = Seq(0L, 4L)).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_relevant"), r.getAs[Long]("hits_at_k"),
          Option(r.getAs[Any]("ndcg"))))).toMap
    val idcg = 1.0 + math.rint(1.0 / (math.log(3.0) / math.log(2.0)) * 1e10) / 1e10
    val expect = math.rint(1.5 / idcg * 1e6) / 1e6
    assert(got(0L) == ((2L, 2L, Some(expect))), got.toString)
    assert(got(4L) == ((0L, 0L, None)), got.toString)
  }

  test("mapAtK: hand-traced average precision, zero-relevant query " +
      "yields NULL") {
    // query 0 (label 1): ranking 1 (cos 1, hit, P@1 = 1), 2 (cos
    // .7071, miss), 3 (cos 0, hit, P@3 = 2/3), 4 (cos -1, miss) →
    // AP = (1 + 2/3) / min(2, 10); query 4 (label 9): no relevant →
    // NULL ap.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(1.0f, 0.0f), 1),
      (2L, Array(1.0f, 1.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(-1.0f, 0.0f), 9),
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.mapAtK(emb, queryIds = Seq(0L, 4L)).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_relevant"), r.getAs[Long]("hits_at_k"),
          Option(r.getAs[Any]("ap_at_k"))))).toMap
    val apsum = 1.0 + math.rint(2.0 / 3.0 * 1e10) / 1e10
    val expect = math.rint(apsum / 2.0 * 1e6) / 1e6
    assert(got(0L) == ((2L, 2L, Some(expect))), got.toString)
    assert(got(4L) == ((0L, 0L, None)), got.toString)
  }

  test("labelSeparationMatrix: orthogonal and collinear centroid " +
    "pairs score exactly") {
    // label 0 centroid (1,0) (two members), label 1 (0,1), label 2
    // (2,0): cos(0,1)=0, l2=√2; cos(0,2)=1, l2=1; cos(1,2)=0, l2=√5
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(2.0f, 0.0f), 2),
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.labelSeparationMatrix(emb).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
        ((r.getAs[Double]("centroid_cosine"),
          r.getAs[Double]("centroid_l2")))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      (0, 1) -> ((0.0, r6(math.sqrt(2.0)))),
      (0, 2) -> ((1.0, 1.0)),
      (1, 2) -> ((0.0, r6(math.sqrt(5.0))))), got)
  }

  test("mrrRetrieval: first relevant rank on the same total order, " +
    "NULL for zero-relevant queries") {
    // same fixture as the ndcg test: query 0's rank-1 result (vec 1,
    // cos 1.0) shares its label -> rr = 1.0; query 4's label 9 has no
    // other member -> NULL rank and rr, the row still present.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(1.0f, 0.0f), 1),
      (2L, Array(1.0f, 1.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(-1.0f, 0.0f), 9),
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.mrrRetrieval(emb, queryIds = Seq(0L, 4L)).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_relevant"),
          Option(r.getAs[java.lang.Long]("first_rel_rank")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("reciprocal_rank"))
            .map(_.toDouble)))).toMap
    // query 0: vec 1 at cos 1.0 is rank 1 and relevant -> rr = 1.0
    assert(got(0L) == ((2L, Some(1L), Some(1.0))), got.toString)
    // query 4 (label 9): no same-label vector anywhere -> NULLs
    assert(got(4L) == ((0L, None, None)), got.toString)
  }

  test("tripletMining: semi-hard picked below pos_cos, hard fallback " +
      "flagged when nothing is semi-hard") {
    // anchors 0/1 (label 0, twins at cos 1): semi-hard = v2 at 0.8;
    // anchor 2 (label 1): pos v3 at 0.6, both negatives at 0.8 >= 0.6
    // -> hard fallback v0, semi_hard false, negative margin;
    // anchor 3: pos v2 at 0.6, negatives at 0.0 -> semi-hard v0.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.8f, 0.6f), 1),
      (3L, Array(0.0f, 1.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.tripletMining(emb).collect()
      .map(r => r.getAs[Long]("anchor_id") ->
        ((r.getAs[Long]("pos_id"), r.getAs[Double]("pos_cos"),
          r.getAs[Long]("neg_id"), r.getAs[Double]("neg_cos"),
          r.getAs[Double]("margin"), r.getAs[Boolean]("semi_hard"))))
      .toMap
    assert(got(0L) == ((1L, 1.0, 2L, 0.8, 0.2, true)), got.toString)
    assert(got(1L) == ((0L, 1.0, 2L, 0.8, 0.2, true)), got.toString)
    assert(got(2L) == ((3L, 0.6, 0L, 0.8, -0.2, false)), got.toString)
    assert(got(3L) == ((2L, 0.6, 0L, 0.0, 0.6, true)), got.toString)
  }

  test("hardNegatives: nearest cross-label only, same-label twin excluded") {
    // doc 10's IDENTICAL twin (cos 1.0) shares its label — it must be
    // invisible; the hard negative is the almost-identical vector with
    // the other label, which random negative sampling would rarely draw.
    val df = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f), 0),
      (11L, Array(1.0f, 0.0f, 0.0f), 0),   // same-label twin: excluded
      (12L, Array(0.99f, 0.1f, 0.0f), 1),  // THE hard negative for 10/11
      (13L, Array(0.0f, 1.0f, 0.0f), 1),
      (14L, Array(0.0f, 0.9f, 0.2f), 0),
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.hardNegatives(df, k = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2).toSeq }
    assert(got(10L).head == 12L, s"hard negative for 10: ${got(10L)}")
    assert(!got(10L).contains(11L) && !got(10L).contains(14L),
      s"same-label ids leaked into 10's negatives: ${got(10L)}")
    // every result row crosses the label boundary
    val labels = df.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val crossed = VectorOps.hardNegatives(df, k = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .forall { case (a, b) => labels(a) != labels(b) }
    assert(crossed, "same-label pair in output")
    // k bounds each group
    assert(got.values.forall(_.size <= 2), got.toString)
  }

  test("pcaTopComponent: recovers the dominant axis, unit norm, " +
    "plain-Scala power-iteration agreement") {
    // variance concentrated on axis 0 (spread ±4), tiny noise on 1/2:
    // the top PC must align with e0, positive sign (all-positive start)
    val rows = (0 until 24).map { i =>
      val main = (i % 9 - 4).toFloat
      (i.toLong, Array(main, 0.1f * (i % 3 - 1), 0.05f * (i % 2)), 0)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = VectorOps.pcaTopComponent(df, iters = 5).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Double]("loading"), r.getAs[Double]("eigenvalue")))).toMap
    assert(out.keySet == Set(1, 2, 3), out.toString)
    val l = (1 to 3).map(d => out(d)._1)
    assert(math.abs(l.map(x => x * x).sum - 1.0) < 1e-4,
      s"loadings not unit-norm: $l")
    assert(l.head > 0.99, s"dominant axis not recovered: $l")
    // plain-Scala replay: same covariance, same 5 rounds
    val n = rows.size.toDouble
    val xs = rows.map(_._2.map(_.toDouble))
    val mean = (0 until 3).map(j => xs.map(_(j)).sum / n)
    val cov = Array.tabulate(3, 3) { (i, j) =>
      BigDecimal(xs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var v = Array.fill(3)(1.0 / math.sqrt(3.0))
    for (_ <- 1 to 5) {
      val w = Array.tabulate(3)(i => (0 until 3).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    (1 to 3).foreach { d =>
      assert(math.abs(out(d)._1 - v(d - 1)) < 1e-4,
        s"dim $d: ${out(d)._1} vs scala ${v(d - 1)}")
    }
    // all rows share one eigenvalue, and it is the Rayleigh quotient
    assert(out.values.map(_._2).toSet.size == 1)
    val wf = Array.tabulate(3)(i => (0 until 3).map(j => cov(i)(j) * v(j)).sum)
    val lam = (0 until 3).map(i => v(i) * wf(i)).sum
    assert(math.abs(out(1)._2 - lam) < 1e-4, s"${out(1)._2} vs $lam")
  }

  test("hardNegativesIvf: pairs ⊆ brute at equal scores, cross-label only") {
    // clustered fixture: two tight direction groups, labels crossing
    // the cluster boundary so in-list cross-label pairs exist
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.05f * (i % 5), 0.0f)
      else Array(0.0f, 0.05f * (i % 5), 1.0f)
      (i.toLong, base, i % 3)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val cents = VectorOps.sampleCentroids(df, 4)
    val ivf = VectorOps.hardNegativesIvf(df, cents, k = 2)
      .select("a_id", "b_id", "cos_sim").as[(Long, Long, Double)]
      .collect().toSet
    assert(ivf.nonEmpty, "IVF mining found nothing on the clustered fixture")
    // every IVF pair is a genuine cross-label pair scored identically
    // by the exhaustive form (IVF trades recall, never correctness)
    val brute = VectorOps.hardNegatives(df, k = 40)
      .select("a_id", "b_id", "cos_sim").as[(Long, Long, Double)]
      .collect().toSet
    val missing = ivf -- brute
    assert(missing.isEmpty, s"IVF pairs not in brute set: $missing")
    val labels = rows.map(r => r._1 -> r._3).toMap
    assert(ivf.forall { case (a, b, _) => labels(a) != labels(b) })
  }

  test("knnQuantized: integer codes, scale cancellation, brute agreement") {
    // codes are integers in [-127, 127]; max-magnitude element -> ±127
    val codes = vecs.select(col("vec_id"),
      VectorOps.quantizeCodes(col("embedding")).as("qc"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(codes.values.flatten.forall(c => c == c.floor && math.abs(c) <= 127))
    assert(codes(0L) == Seq(127f, 0f, 0f))
    assert(codes(3L) == Seq(-127f, 0f, 0f))
    // quantized ranking agrees with brute on well-separated vectors
    val got = VectorOps.knnQuantized(vecs, queryVecId = 0, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 4L, 2L), s"got $got")
    // zero vector quantizes to all-zero codes, no crash
    val z = Seq((9L, Array(0.0f, 0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    assert(z.select(VectorOps.quantizeCodes(col("embedding")).as("qc"))
      .as[Seq[Float]].collect().head == Seq(0f, 0f, 0f))
  }

  test("cosine of identical vector is 1, opposite is -1") {
    val c = vecs.filter(col("vec_id") === 0)
      .select(VectorOps.cosine(
        VectorOps.asDouble(col("embedding")),
        VectorOps.asDouble(col("embedding"))).as("c"))
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("knnLsh finds a planted high-cosine neighbor") {
    // Sign-LSH only has collision probability (1 - θ/π)^planes — high
    // for genuinely-similar vectors, tiny for uniform-random ones. So
    // the recall contract is over a PLANTED near neighbor (cos ≈ 0.999),
    // not over uniform noise where ANN recall is inherently ~0.
    val rnd = new scala.util.Random(7)
    def randVec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val q = randVec()
    val near = q.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val rows = (0L, q, 0) +: (1L, near, 0) +:
      (2L to 100L).map(i => (i, randVec(), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val approx = VectorOps.knnLsh(df, queryVecId = 0, k = 5, planes = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(approx.headOption.contains(1L),
      s"planted neighbor not ranked first: $approx")
  }

  test("cosineNearDups finds planted high-cosine pair") {
    val pairs = VectorOps.cosineNearDups(vecs, threshold = 0.95, planes = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"got $pairs")
    assert(!pairs.contains((0L, 3L)))
  }

  test("withPlantedDups: every planted pair found at cos exactly 1.0") {
    // a positive scalar multiple keeps the same sign on every
    // hyperplane, so each planted copy shares its original's LSH
    // bucket with probability 1: recall of planted pairs must be
    // EXACTLY 1 at any plane count — the property that makes the
    // all-pairs SQL oracle sound for the bucketed operator.
    val rnd = new scala.util.Random(3)
    val df = (0L until 50L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val pairs = VectorOps.cosineNearDups(
        VectorOps.withPlantedDups(df, idOffset = 1000L), 0.9, planes = 12)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cos_sim")))
    val planted = pairs.filter(p => p._2 == p._1 + 1000L)
    assert(planted.length == 50, s"recall not 1: ${planted.length}/50")
    assert(planted.forall(_._3 == 1.0), "scaled-copy cosine not exactly 1.0")
  }

  test("labelCentroids computes per-dimension means in long form") {
    val cents = VectorOps.labelCentroids(vecs)
      .collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim")) ->
        r.getAs[Double]("mean_x"))
      .toMap
    assert(cents((0, 0)) == 0.9) // (1.0 + 0.9 + 0.8) / 3
    assert(Seq(0, 1, 2).map(d => cents((1, d))) == Seq(-0.5, 0.5, 0.0))
    assert(cents.size == 6) // 2 labels x 3 dims
  }

  test("knnIvf finds a planted neighbor through probed lists only") {
    val rnd = new scala.util.Random(11)
    def randVec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val q = randVec()
    val near = q.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val rows = (0L, q, 0) +: (1L, near, 0) +:
      (2L to 200L).map(i => (i, randVec(), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = VectorOps.knnIvf(df, queryVecId = 0, k = 5,
      nlist = 8, nprobe = 3)
      .select("vec_id").as[Long].collect().toSeq
    // query and its near-twin share the nearest centroid, so the
    // planted neighbor must survive the nprobe list filter and rank 1st
    assert(got.headOption.contains(1L), s"got $got")
  }

  test("knnAllBrute returns each vector's true top-k") {
    val got = VectorOps.knnAllBrute(vecs, k = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // vec 0 = (1,0,0): nearest are 1 (0.995) and 4 (0.96)
    assert(got(0L) == Set(1L, 4L), s"got ${got(0L)}")
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(got.values.forall(_.size == 2))
  }

  test("knnAllLsh finds planted neighbors for every query point") {
    val rnd = new scala.util.Random(23)
    def randVec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val rows = (0L until 20L).flatMap { i =>
      val v = randVec()
      val twin = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      Seq((i * 2, v, 0), (i * 2 + 1, twin, 0))
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = VectorOps.knnAllLsh(df, k = 1, planes = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toMap
    val found = (0L until 20L).count { i =>
      got.get(i * 2).contains(i * 2 + 1) && got.get(i * 2 + 1).contains(i * 2)
    }
    assert(found >= 18, s"only $found/20 twins found: $got")
  }

  test("knnAllIvf finds planted twins through probed lists, no dup pairs") {
    val rnd = new scala.util.Random(31)
    def randVec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val rows = (0L until 20L).flatMap { i =>
      val v = randVec()
      val twin = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      Seq((i * 2, v, 0), (i * 2 + 1, twin, 0))
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val cents = VectorOps.learnedCentroids(df, nlist = 8, sampleMod = 1)
    val out = VectorOps.knnAllIvf(df, cents, k = 1, nprobe = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(out.length == out.map(_._1).distinct.length,
      "duplicate a_id rows — pair formed more than once")
    val got = out.toMap
    val found = (0L until 20L).count { i =>
      got.get(i * 2).contains(i * 2 + 1) && got.get(i * 2 + 1).contains(i * 2)
    }
    // twins are near-identical, so they share a nearest centroid and
    // must survive the list filter
    assert(found >= 18, s"only $found/20 twins found: ${got.toSeq.sorted}")
  }

  test("learned IVF centroids beat the sample init on planted clusters") {
    // 8 clusters on orthogonal prototype blocks, laid out in id-blocks
    // of 50 so the pmod sample init is DEGENERATE: all 16 init
    // centroids fall in cluster 0 — the clustered-real-data failure
    // mode of sample centroids. Lloyd's must recover list balance.
    val rnd = new scala.util.Random(42)
    val rows = (0L until 400L).map { i =>
      val c = (i / 50).toInt
      val v = Array.tabulate(32) { d =>
        val proto = if (d / 4 == c) 1.0f else 0.0f
        proto + 0.05f * rnd.nextGaussian().toFloat
      }
      (i, v, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val queryId = 201L // cluster 4
    val truth = VectorOps.knnBrute(df, queryId, k = 10)
      .select("vec_id").as[Long].collect().toSet
    def recallOf(learn: Boolean): Double = {
      val got = VectorOps.knnIvf(df, queryId, k = 10,
        nlist = 16, nprobe = 2, learn = learn)
        .select("vec_id").as[Long].collect().toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val learned = recallOf(learn = true)
    val sampled = recallOf(learn = false)
    assert(learned >= sampled,
      s"learned recall $learned < sample-centroid recall $sampled")
    assert(learned >= 0.6, s"learned recall too low: $learned")
  }

  test("quantizeEmbeddings: scale fits max|x|, negatives round half-up, zero vec safe") {
    val df = Seq(
      (0L, Array(1.27f, -1.27f, 0.635f, 0.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f), 0), // zero vector -> scale 0
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.quantizeEmbeddings(df, slots = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    val r0 = got(0L)
    assert(math.abs(r0.getAs[Double]("scale") - 0.01) < 1e-9)
    assert(r0.getAs[Long]("q0") == 127L)
    assert(r0.getAs[Long]("q1") == -127L)
    // 0.635/0.01 = 63.5 -> floor(64.0) = 64 (half-up, both engines)
    assert(r0.getAs[Long]("q2") == 64L)
    assert(r0.getAs[Long]("q3") == 0L)
    val r1 = got(1L)
    assert(r1.getAs[Double]("scale") == 0.0 && r1.getAs[Long]("q0") == 0L)
    assert(r1.getAs[Double]("l2_norm") == 0.0)
  }

  test("ivfAssign gives every vector exactly one list") {
    val emb = Tables.embeddings(spark, sf0)
    val assigned = VectorOps.ivfAssign(emb, nlist = 8)
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
  }

  test("semDedupPairs: candidates are cluster-scoped and every planted " +
      "twin is found at cos 1.0") {
    val emb = Tables.embeddings(spark, sf0)
    val planted = VectorOps.withPlantedDups(emb)
    val cents = VectorOps.learnedCentroids(emb, nlist = 8)
    // at threshold 0 the output is ALL within-cluster pairs: each must
    // agree with the independent assignment on both endpoints
    val assign = VectorOps.ivfAssignTo(planted, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = VectorOps.semDedupPairs(planted, cents, threshold = -1.0)
      .collect()
    assert(all.nonEmpty)
    all.foreach { r =>
      val (a, b, l) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(assign(a) == l && assign(b) == l,
        s"pair ($a,$b) reported in list $l but assigned ${assign(a)}/${assign(b)}")
      assert(a < b, "pair ordering broken")
    }
    // at 0.95 every (original, scaled-twin) pair appears at exactly 1.0
    val twins = VectorOps.semDedupPairs(planted, cents, threshold = 0.95)
      .filter(col("b_id") - col("a_id") === 1000000L)
    assert(twins.count() == emb.count())
    assert(twins.filter(col("cos_sim") =!= 1.0).count() == 0L)
  }

  test("semDedupKeep drops exactly the higher id of each twin pair") {
    val emb = Tables.embeddings(spark, sf0)
    val planted = VectorOps.withPlantedDups(emb)
    val cents = VectorOps.learnedCentroids(emb, nlist = 8)
    val kept = VectorOps.semDedupKeep(planted, cents, threshold = 0.95)
    // natural pairs never reach 0.95 on this corpus, so the dropped
    // set is exactly the scaled copies
    assert(kept.count() == emb.count())
    assert(kept.filter(col("vec_id") >= 1000000L).count() == 0L)
  }

  test("silhouetteByLabel: hand-traced centroid silhouette") {
    // label 0: (0,0), (2,0) → centroid (1,0); label 1: (10,0) alone.
    // s(0,0) = (10−1)/10 = 0.9; s(2,0) = (8−1)/8 = 0.875;
    // s(10,0) = (9−0)/9 = 1. Means: 0.8875 and 1.0.
    val emb = Seq(
      (1L, Seq(0f, 0f), 0), (2L, Seq(2f, 0f), 0),
      (3L, Seq(10f, 0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.silhouetteByLabel(emb).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vectors"), r.getAs[Double]("mean_silhouette"))))
      .toMap
    assert(got == Map(0 -> ((2L, 0.8875)), 1 -> ((1L, 1.0))), got.toString)
  }

  test("truncateDims keeps the prefix; scaled twins stay top-1 at " +
      "every kept-dims level") {
    val v = Seq((1L, Seq(1f, 2f, 3f, 4f), 0)).toDF("vec_id", "embedding", "label")
    val t = VectorOps.truncateDims(v, 2).collect().head
      .getAs[scala.collection.Seq[Float]]("embedding")
    assert(t.toSeq == Seq(1f, 2f), t.toString)
    // the matryoshka audit property on real data, one level deep:
    // truncation preserves the twin's direction, so knnAllLsh still
    // ranks every twin top-1 at half dims
    val planted = VectorOps.withPlantedDups(Tables.embeddings(spark, sf0))
    val top1 = VectorOps.knnAllLsh(VectorOps.truncateDims(planted, 32), 1)
    assert(top1.filter(abs(col("b_id") - col("a_id")) =!= 1000000L)
      .count() == 0L)
  }

  test("embeddingCovariance: exact values on a hand-computed fixture") {
    // x = (1,3,5), y = (2,6,4): cov11 = 35/3 − 9 = 8/3,
    // cov12 = 40/3 − 12 = 4/3, cov22 = 56/3 − 16 = 8/3
    val tiny = Seq((0L, Array(1.0f, 2.0f), 0), (1L, Array(3.0f, 6.0f), 0),
      (2L, Array(5.0f, 4.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = VectorOps.embeddingCovariance(tiny)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == 3)
    assert(got((1, 1)) == math.rint(8.0 / 3.0 * 1e6) / 1e6)
    assert(got((1, 2)) == math.rint(4.0 / 3.0 * 1e6) / 1e6)
    assert(got((2, 2)) == math.rint(8.0 / 3.0 * 1e6) / 1e6)
  }

  test("embeddingCovariance: mapPartitions Gram equals the relational " +
    "form and is partition-layout invariant") {
    val emb = Tables.embeddings(spark, sf0)
    val got = VectorOps.embeddingCovariance(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // relational reference: explode to (vec_id, i, x), self-join on
    // vec_id, group by (i, j) — the plan the operator exists to avoid
    val e = emb.select(col("vec_id"),
      posexplode(VectorOps.asDouble(col("embedding"))).as(Seq("i", "x")))
    val n = emb.count().toDouble
    val m = e.groupBy("i").agg(sum("x").as("s"))
    val ref = e.as("a").join(e.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.x") * col("b.x")).as("pr"))
      .join(m.select(col("i"), col("s").as("s_i")), "i")
      .join(m.select(col("i").as("j"), col("s").as("s_j")), "j")
      .select((col("i") + 1).as("i"), (col("j") + 1).as("j"),
        (col("pr") / n - (col("s_i") / n) * (col("s_j") / n)).as("cov"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == ref.keySet)
    // fp sums associate differently across the two plans — compare to
    // the shared 6dp publication grain with a 1-ulp-of-round slack
    for ((k, v) <- got)
      assert(math.abs(v - math.rint(ref(k) * 1e6) / 1e6) <= 1e-6,
        s"cell $k: $v vs ${ref(k)}")
    // layout invariance: the partial merge is associative+commutative,
    // so a different partitioning must publish the same 6dp frame
    val reparted = VectorOps.embeddingCovariance(emb.repartition(7))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for ((k, v) <- got)
      assert(math.abs(v - reparted(k)) <= 1e-6, s"layout-sensitive cell $k")
  }

  test("embeddingCovariance refuses ragged embedding dimensions") {
    val ragged = Seq((0L, Array(1.0f, 2.0f), 0), (1L, Array(3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      VectorOps.embeddingCovariance(ragged)
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("lofScores: symmetric ring is all exactly 1.0; a planted " +
    "off-manifold point and its contaminated neighborhood score highest") {
    // 8 unit vectors evenly spaced on the circle, k=2: every point's
    // neighborhood is congruent, so lrd is the same integer for all
    // and LOF = Σlrd/(n·lrd) = 1.0 EXACTLY.
    val ring = (0 until 8).map { i =>
      val a = 2.0 * math.Pi * i / 8
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat), 0)
    }
    val ringLof = VectorOps.embeddingLofOutliers(ring.toDF(
      "vec_id", "embedding", "label"), k = 2).collect()
    assert(ringLof.length == 8)
    assert(ringLof.forall(_.getAs[Double]("lof_score") == 1.0),
      ringLof.mkString(", "))
    // dense cluster + one far point: the outlier's lof must exceed
    // every in-cluster point whose neighborhood it does not poison
    val a = 0.03
    val pts = Seq(0.0, a, 2 * a, 3 * a, 4 * a).zipWithIndex.map {
      case (t, i) => (i.toLong,
        Array(math.cos(t).toFloat, math.sin(t).toFloat), 0)
    } :+ ((9L, Array(0.0f, 1.0f), 0))
    val lof = VectorOps.embeddingLofOutliers(
      pts.toDF("vec_id", "embedding", "label"), k = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Double]("lof_score")).toMap
    val cluster = lof.filterKeys(_ != 9L).values
    // strict max, and by an order of magnitude: the arc points sit at
    // quantized spacings (4dp cosine) that keep their density ratios
    // within small constants, while the far point's reach distances
    // are ~1000× its neighbors' k-distances
    assert(cluster.forall(lof(9L) > 10 * _),
      s"outlier ${lof(9L)} not dominant: $lof")
  }

  test("pqEncode: per-block argmin with code-ASC ties and the " +
    "remainder-absorbing last block; ADC exact when vectors ARE codes") {
    // dim 6, m = 4 -> sub = 1: blocks 0,1,2 are single dims, block 3
    // spans dims 4-6. v2 shares v1's first three dims exactly -> ties
    // resolve to code 1 there; its tail differs -> code 2 on block 3.
    val emb = Seq(
      (0L, Array(0f, 0f, 0f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 1f, 1f, 2f, 2f, 2f), 0),
      (2L, Array(1f, 1f, 1f, 9f, 9f, 9f), 0),
    ).toDF("vec_id", "embedding", "label")
    val codebook = VectorOps.pqPinnedCodebook(emb) // all ids < 64
    val codes = VectorOps.pqEncode(emb, codebook, m = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("block")) ->
        r.getAs[Long]("code")).toMap
    assert(codes.size == 12, codes)
    // every vector is its own code on every block, except v2's shared
    // prefix blocks which tie down to code 1
    for (b <- 0L to 3L) {
      assert(codes((0L, b)) == 0L, s"v0 b$b: ${codes((0L, b))}")
      assert(codes((1L, b)) == 1L, s"v1 b$b: ${codes((1L, b))}")
    }
    assert(codes((2L, 0L)) == 1L && codes((2L, 1L)) == 1L &&
      codes((2L, 2L)) == 1L && codes((2L, 3L)) == 2L, codes)
    // with every vector a code, ADC reproduces the exact distances of
    // the assigned codes: v1's ADC to q=v0 is ||v1||² exactly
    val knn = VectorOps.knnPqPinned(emb, queryVecId = 0L, k = 2, m = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Double]("adc_l2sq")).toMap
    assert(knn(1L) == 15.0, knn) // 3·1 + 3·4
    // v2's blocks 0-2 point at code 1 (same values), block 3 at itself
    assert(knn(2L) == 3.0 + 3 * 81.0, knn)
    // the two-stage search with shortlist ≥ n is the exact top-k
    val rr = VectorOps.knnPqRerank(emb, queryVecId = 0L, k = 2,
      shortlist = 10, m = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("l2sq")))
    assert(rr.toSeq == Seq((1L, 15.0), (2L, 246.0)), rr.toSeq)
    val audit = VectorOps.pqRerankRecallAudit(emb, queryVecId = 0L,
      k = 2, shortlist = 10, m = 4).collect().head
    assert(audit.getAs[Long]("n_hits") == 2L &&
      audit.getAs[Double]("recall") == 1.0, audit)
  }

  test("knnIvfPqPinned: probing every list reduces to the pure PQ " +
    "search; probing fewer lists returns a subset of its candidates") {
    // 12 deterministic vectors (no RNG): values from index arithmetic
    val emb = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j => (((i * 37 + j * 11) % 17) - 8).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val full = VectorOps.knnIvfPqPinned(emb, queryVecId = 0L, k = 5,
      nlist = 16, nprobe = 16, m = 4, ksub = 16).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc_l2sq")))
    val pure = VectorOps.knnPqPinned(emb, queryVecId = 0L, k = 5,
      m = 4, ksub = 16).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc_l2sq")))
    assert(full.toSeq == pure.toSeq, s"full=$full pure=$pure")
    // narrow probe: every returned id must still come from the pure
    // ADC ranking's candidate pool with an ADC value it agrees on
    val narrow = VectorOps.knnIvfPqPinned(emb, queryVecId = 0L, k = 5,
      nlist = 16, nprobe = 1, m = 4, ksub = 16).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc_l2sq")))
    val pureAll = VectorOps.knnPqPinned(emb, queryVecId = 0L, k = 11,
      m = 4, ksub = 16).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc_l2sq")))
      .toMap
    narrow.foreach { case (id, adc) =>
      assert(pureAll.get(id).contains(adc), s"$id/$adc not in $pureAll")
    }
  }

  test("knnIvfPqResidualPinned: one list + every vector a code makes " +
    "residual ADC EXACT squared-L2 (the Jegou identity)") {
    // nlist=1 -> all residuals share one centroid; ksub covers every
    // vector -> each encodes as its own residual, so
    // ADC = ||(q−c) − (v−c)||² = ||q − v||² exactly: recall 1.0
    val emb = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j => (((i * 37 + j * 11) % 17) - 8).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val got = VectorOps.knnIvfPqResidualPinned(emb, queryVecId = 0L,
      k = 11, nlist = 1, nprobe = 1, m = 4, ksub = 16).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc_l2sq")))
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val vecs = (0L until 12L).map { i =>
      i -> Array.tabulate(8)(j => (((i * 37 + j * 11) % 17) - 8).toFloat)
    }.toMap
    val exact = (1L until 12L)
      .map(i => (i, BigDecimal(l2(vecs(0L), vecs(i))).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(p => (p._2, p._1))
    assert(got.toSeq == exact, s"got=${got.toSeq}\nexp=$exact")
    val audit = VectorOps.ivfPqResidualRecallAudit(emb, queryVecId = 0L,
      k = 5, nlist = 1, nprobe = 1, m = 4, ksub = 16).collect().head
    assert(audit.getAs[Double]("recall") == 1.0, audit)
  }

  test("pqLearnedCodebook: Lloyd's rounds never increase the " +
    "quantization MSE; encode consumes the learned book unchanged") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => (((i * 37 + j * 11) % 17) - 8).toFloat), 0)
    }.toDF("vec_id", "embedding", "label").cache()
    val pinned = VectorOps.pqPinnedCodebook(emb, ksub = 8)
    val mse0 = VectorOps.pqQuantizationMse(emb, pinned, m = 2)
    val learned1 = VectorOps.pqLearnedCodebook(emb, m = 2, ksub = 8,
      iters = 1)
    val mse1 = VectorOps.pqQuantizationMse(emb, learned1, m = 2)
    val learned2 = VectorOps.pqLearnedCodebook(emb, m = 2, ksub = 8,
      iters = 2)
    val mse2 = VectorOps.pqQuantizationMse(emb, learned2, m = 2)
    assert(mse1 <= mse0 + 1e-9, s"iter1 $mse1 > pinned $mse0")
    assert(mse2 <= mse1 + 1e-9, s"iter2 $mse2 > iter1 $mse1")
    // the learned book must actually have moved (data isn't already
    // perfectly quantized by the raw sample)
    assert(mse1 < mse0, s"Lloyd round changed nothing: $mse0 -> $mse1")
    // shape contract: same codes, full-dim centroids
    val rows = learned2.collect()
    assert(rows.length == 8 && rows.forall(
      _.getAs[Seq[Float]]("cv").length == 8), rows.mkString(";"))
  }

  test("embeddingIsotropy: sum-vector identity equals the hand-" +
    "computed all-pairs mean; singleton NULL; zero vectors excluded") {
    // label 0: orthogonal pair -> mean cos 0; label 1: identical pair
    // -> mean cos 1; label 2: singleton -> no pairs, NULL; the zero
    // vector is excluded everywhere (no direction to normalize).
    // ALL over the 5 nonzero vecs: Σv̂ = (3,1,1); mean =
    // (11 − 5)/(5·4) = 0.3
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f), 1), (3L, Array(2.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.0f, 1.0f), 2),
      (5L, Array(0.0f, 0.0f, 0.0f), 3),
    ).toDF("vec_id", "embedding", "label")
    val rows = VectorOps.embeddingIsotropy(emb).collect()
    val got = rows
      .map(r => (r.getAs[String]("label"), r.getAs[Boolean]("is_overall")) ->
        ((r.getAs[Long]("n_vecs"), Option(r.get(
          r.fieldIndex("mean_pairwise_cosine"))).map(_.toString.toDouble))))
      .toMap
    assert(got == Map(
      ("0", false) -> ((2L, Some(0.0))), ("1", false) -> ((2L, Some(1.0))),
      ("2", false) -> ((1L, None)), ("ALL", true) -> ((5L, Some(0.3)))), got)
    assert(!got.keySet.map(_._1).contains("3"), got) // the all-zero vector's label
    // the corpus row is identified by is_overall, not the label
    // string — exactly one such row even if a label stringifies to
    // "ALL" (ADVICE r14)
    assert(rows.count(_.getAs[Boolean]("is_overall")) == 1)
  }
}
