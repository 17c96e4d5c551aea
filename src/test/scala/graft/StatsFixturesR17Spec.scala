package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Hand-computed / structural fixtures for the round-17 additions,
  * beside their oracle gates (the StatsFixturesR16Spec discipline).
  *
  * The ANN-diagnostic parity tests pin the one identity the IVF
  * shortlist forms must satisfy exactly: with nprobe = nlist every
  * vector probes every list, the candidate set degenerates to all
  * pairs, and the ANN estimator is bit-identical to the exact one —
  * so any divergence at smaller nprobe is ATTRIBUTABLE to shortlist
  * truncation alone, never to a scoring or pipeline drift. */
class StatsFixturesR17Spec extends SparkSpec {
  import spark.implicits._

  /** 24 deterministic 4-dim vectors, no duplicates (component period
    * lcm(11,13,17,7) ≫ 24): ids 0..15 are the pinned sample
    * centroids (vec_id % 997 < 16), 16..23 plain members. */
  private lazy val emb24 = (0L until 24L).map { i =>
    (i, Array(
      (i * 37 % 11).toFloat - 5f,
      (i * 53 % 13).toFloat - 6f,
      (i * 71 % 17).toFloat - 8f,
      (i * 29 % 7).toFloat - 3f), (i % 3).toString)
  }.toDF("vec_id", "embedding", "label")

  test("twonn ANN with nprobe = nlist probes every list -> identical " +
      "to the exact form (candidate set = all pairs)") {
    val exact = VectorOps.twoNnIntrinsicDim(emb24).collect().head
    val ann = VectorOps.twoNnIntrinsicDimAnn(emb24, 16, 16).collect().head
    assert(ann.getAs[Long]("n_shortfall") == 0L, ann.toString)
    assert(ann.getAs[Long]("n_degenerate") ==
      exact.getAs[Long]("n_degenerate"))
    assert(ann.getAs[Double]("sum_log_ratio") ==
      exact.getAs[Double]("sum_log_ratio"))
    assert(ann.getAs[Double]("intrinsic_dim") ==
      exact.getAs[Double]("intrinsic_dim"))
  }

  test("hubness ANN with nprobe = nlist is bit-identical to the " +
      "exact-graph hubness") {
    val exact = VectorOps.knnHubness(emb24, 5).collect().head
    val ann = VectorOps.knnHubnessAnn(emb24, 5, 16, 16).collect().head
    assert(ann.getAs[Long]("n_vectors") == exact.getAs[Long]("n_vectors"))
    assert(ann.getAs[Long]("max_occurrence") ==
      exact.getAs[Long]("max_occurrence"))
    assert(ann.getAs[Long]("n_antihubs") ==
      exact.getAs[Long]("n_antihubs"))
    assert(ann.getAs[Double]("hubness_skew") ==
      exact.getAs[Double]("hubness_skew"))
  }

  test("twonn ANN shortfall accounting: 3 own-list vectors at " +
      "nprobe 2 see one candidate each -> all shortfall, NULL dim") {
    // ids 0..2 are all centroids; each probes its own list + one
    // other, whose single member is the only candidate (cnt = 1 < 2)
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f), "a"),
      (1L, Array(0.0f, 1.0f), "a"),
      (2L, Array(1.0f, 1.0f), "a")).toDF("vec_id", "embedding", "label")
    val r = VectorOps.twoNnIntrinsicDimAnn(tiny, 16, 2).collect().head
    assert(r.getAs[Long]("n_total") == 3L, r.toString)
    assert(r.getAs[Long]("n_shortfall") == 3L, r.toString)
    assert(r.isNullAt(r.fieldIndex("intrinsic_dim")), r.toString)
  }

  test("pooled k-center: picks drawn from the Knuth pool, seeded at " +
      "the pool min id, with non-increasing farthest distances (the " +
      "Gonzalez invariant)") {
    val emb = Tables.embeddings(spark, sf0)
    val poolIds = emb.filter(
      pmod(graft.ops.DocOps.knuthHash32(col("vec_id")), lit(8)) === 0)
      .select("vec_id").as[Long].collect().toSet
    val picks = VectorOps.kCenterCoresetPooled(emb, 8).orderBy("rank")
      .collect()
    assert(picks.length == math.min(8, poolIds.size))
    assert(picks.map(_.getAs[Long]("vec_id")).forall(poolIds.contains))
    assert(picks.head.getAs[Long]("vec_id") == poolIds.min)
    val dists = picks.tail.map(_.getAs[Double]("min_dist_at_pick"))
    assert(dists.zip(dists.tail).forall { case (a, b) => b <= a },
      dists.mkString(", "))
    assert(picks.map(_.getAs[Long]("vec_id")).distinct.length ==
      picks.length)
  }

  test("kCenterCoreset seeds at min(vec_id) when id 0 is absent " +
      "(no phantom pick), and an empty corpus yields an empty frame") {
    // 1-D line at x = 0,1,9,10 under ids 5..8: seed = id 5 (x=0),
    // farthest = id 8 (x=10), then min-dist tie 1.0 -> id ASC = 6
    val emb = Seq((5L, Seq(0f), "a"), (6L, Seq(1f), "a"),
      (7L, Seq(9f), "a"), (8L, Seq(10f), "a"))
      .toDF("vec_id", "embedding", "label")
    val picks = VectorOps.kCenterCoreset(emb, 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id")))
    assert(picks.toSeq == Seq((1, 5L), (2, 8L), (3, 6L)),
      picks.mkString(", "))
    assert(VectorOps.kCenterCoreset(emb.limit(0), 3).count() == 0L)
  }
}
