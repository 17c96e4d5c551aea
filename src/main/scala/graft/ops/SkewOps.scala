package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the manual salting pattern for the
  * hot-key case AQE's skew-join split can't fix (e.g. a broadcast-too-
  * big dimension with a handful of pathological keys).
  *
  * `saltedJoin(fact, dim, key, n)`: the fact side gets a deterministic
  * pseudo-random salt in [0, n) per row; the dim side is exploded n× so
  * every (key, salt) pair exists. The join key becomes (key, salt) —
  * one hot key's rows now spread over n reducers instead of one. Row
  * multiplication happens only on the (small) dim side; results are
  * identical to the unsalted join.
  */
object SkewOps {

  /** Inner equi-join on `key`, salted `n` ways. `saltSource` must be a
    * fact-side column with high cardinality (e.g. the fact's unique id)
    * — the salt is derived from its hash, so runs are reproducible. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: String, n: Int = 8): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(n)).cast("int"))
    val exploded = dim.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i)): _*)))
    salted
      .join(exploded, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Salted join driven end-to-end: enrich the event log with the
    * customer dim through `saltedJoin`, then aggregate per nation. The
    * oracle recomputes the same result as a PLAIN join + group-by, so
    * the hash gate IS the identity proof salted ≡ unsalted — the
    * correctness contract the salting pattern rests on, asserted on
    * real data rather than in a scaladoc.
    *
    * The dim explodes n× before the join (the deliberate cost of
    * spreading one hot key over n reducers); the aggregate after it is
    * an ordinary partial+final hash agg on a 25-row group space. */
  def saltedNationActivity(events: DataFrame, customer: DataFrame,
      n: Int = 8): DataFrame = {
    val dim = customer.select(col("c_custkey").as("user_id"),
      col("c_nationkey"))
    saltedJoin(events, dim, "user_id", "event_id", n)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"),
        Num.sumRound(Num.dec2(col("value")), 4).as("value_sum"))
  }

  /** Top-k keys by frequency — the diagnostic used to decide whether a
    * join needs salting (run on a sample at scale). */
  /** Join-size / skew pre-flight profile: BEFORE running a fact⋈fact
    * join, the exact output cardinality Σ c_l(k)·c_r(k), each side's
    * second frequency moment F₂ = Σc² (the self-join size — the
    * quantity AMS sketches estimate), max key multiplicity and the
    * skew ratio max·keys/rows that decides whether to salt. This is
    * the planner's-eye view exposed as a query: an AQE-style skew
    * decision made from exact statistics instead of sampled ones.
    *
    * Determinism: every figure is an exact BIGINT from per-key count
    * collapses; the two skew ratios are one pinned double division
    * each. Shape: one groupBy per side (map-combined), a key-keyed
    * join of the two COUNT frames (≪ fact size), three 1-row frames
    * broadcast together — the facts are never joined. */
  def joinSizeProfile(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val cl = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val cr = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    val ls = cl.agg(sum("cl").as("n_left"), count(lit(1)).as("keys_left"),
      sum(col("cl") * col("cl")).as("f2_left"), max("cl").as("max_left"))
    val rs = cr.agg(sum("cr").as("n_right"), count(lit(1)).as("keys_right"),
      sum(col("cr") * col("cr")).as("f2_right"), max("cr").as("max_right"))
    val js = cl.join(cr, "k")
      .agg(count(lit(1)).as("keys_matched"),
        sum(col("cl") * col("cr")).as("join_rows"))
    ls.crossJoin(broadcast(rs)).crossJoin(broadcast(js))
      .select(col("n_left"), col("keys_left"), col("f2_left"),
        col("max_left"),
        round(col("max_left").cast("double") *
          col("keys_left").cast("double") / col("n_left").cast("double"), 6)
          .as("skew_left"),
        col("n_right"), col("keys_right"), col("f2_right"),
        col("max_right"),
        round(col("max_right").cast("double") *
          col("keys_right").cast("double") / col("n_right").cast("double"), 6)
          .as("skew_right"),
        col("keys_matched"), col("join_rows"))
  }

  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(k)
}
