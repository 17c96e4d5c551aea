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
  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(k)
}
