package graft

import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler
import graft.ops.JoinOps

/** Pins the native Jaro–Winkler expression to the DuckDB semantics the
  * oracle compares against. The constants below were PROBED from
  * DuckDB's jaro_winkler_similarity (not taken from a paper): they
  * encode its empty-string, window, transposition, boost-threshold and
  * prefix-cap behavior.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, expected) — expected values from DuckDB probes.
  private val probes = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("abc", "abc", 1.0),
    ("", "", 0.0),                      // DuckDB: both-empty → 0
    ("a", "", 0.0),
    ("ab", "ba", 0.0),                  // window 0 → no matches
    ("CRATE", "TRACE", 0.7333333333333334),
    ("abcdefgh", "abcdefghijkl", 0.9333333333333333), // prefix cap 4
    ("aaapple", "apple", 0.9142857142857143),
    ("abqqqqqq", "abzzzzzz", 0.5),      // jaro ≤ 0.7 → NO boost
    ("prefixaaaa", "prefixzzzz", 0.8400000000000001)) // jaro > 0.7 → boost

  test("static helper matches every DuckDB probe exactly") {
    for ((a, b, want) <- probes) {
      val got = JaroWinkler.simBytes(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      assert(got == want, s"sim($a, $b) = $got, want $want")
    }
  }

  test("expression evaluates identically under codegen and interpretation") {
    val df = probes.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val viaExpr = df
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaExpr == probes.map(_._3), "codegen path diverges")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df
        .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
        .collect().map(_.getDouble(0)).toSeq
      assert(interp == viaExpr, "interpreted path diverges from codegen")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null inputs are null-intolerant (null in → null out)") {
    val df = Seq((Some("abc"), None: Option[String]),
      (None: Option[String], Some("abc")),
      (Some("abc"), Some("abd"))).toDF("a", "b")
    val got = df.select(JaroWinkler.jaroWinkler(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isEmpty && got(1).isEmpty && got(2).nonEmpty)
  }

  test("SQL registration via extensions") {
    JaroWinkler.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw")
      .head.getDouble(0)
    assert(r == 0.9611111111111111)
  }

  test("fuzzyNamePairsJw finds the planted transposition above threshold") {
    val parts = Seq(
      "almond antique blue royal", "almond antiuqe blue royal", // transposed
      "misty rose salmon", "salmon misty rose")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
    val got = JoinOps.fuzzyNamePairsJw(parts, minSim = 0.9)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(got.contains(
      ("almond antique blue royal", "almond antiuqe blue royal")), got)
  }
}
