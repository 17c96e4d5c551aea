package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSim
import graft.ops.VectorOps

/** Native codegen'd cosine expression: equivalence with the HOF
  * baseline, SQL registration, null/edge behavior, and that codegen is
  * actually exercised (the expression is not CodegenFallback). */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.5f, -2.5f, 0.5f), Array(-0.5f, 1.0f, 4.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)), // zero norm
  ).toDF("id", "a", "b")

  test("matches the HOF composition bit-for-bit") {
    // ANSI mode (Spark 4 default) makes the HOF division THROW on the
    // zero-norm row; the fused expression returns null instead — so the
    // HOF baseline is only evaluated on non-degenerate rows.
    val both = vecs.filter(col("id") =!= 3L).select(
      col("id"),
      CosineSim.cosineFused(col("a"), col("b")).as("fused"),
      VectorOps.cosine(
        VectorOps.asDouble(col("a")), VectorOps.asDouble(col("b"))).as("hof"))
      .collect()
    assert(both.length == 3)
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"id=${r.getLong(0)} fused=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
    val zeroNorm = vecs.filter(col("id") === 3L)
      .select(CosineSim.cosineFused(col("a"), col("b"))).collect()
    assert(zeroNorm.head.isNullAt(0), "zero-norm must be null, not an error")
  }

  test("identical vectors → 1.0; orthogonal → 0.0") {
    val m = vecs.select(col("id"),
      CosineSim.cosineFused(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(m(0L).get - 1.0) < 1e-15)
    assert(m(1L).get == 0.0)
    assert(m(3L).isEmpty)
  }

  test("null inputs propagate null (nullIntolerant)") {
    val withNull = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val out = withNull.select(CosineSim.cosineFused(col("a"), col("b")))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("null ELEMENTS propagate null in both eval paths (HOF behavior)") {
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, null, 3.0f),
        Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (2L, Array[java.lang.Float](1.0f, 2.0f, 3.0f),
        Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
    ).toDF("id", "a", "b")
      .select(col("id"),
        col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
    val out = df.select(col("id"),
      CosineSim.cosineFused(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L), "null element must yield null, not garbage-0 arithmetic")
    assert(!out(2L))
  }

  test("graft_dot: norm-precomputed scoring is bit-identical to the fused cosine") {
    import graft.functions.DotProduct.{dotFused, normFused}
    // the exact decomposition knnAllBrute relies on: dot / (na * nb)
    // must equal the single-loop fused cosine bit for bit, since the
    // accumulation order and the final operation sequence are the same
    val rnd = new scala.util.Random(5)
    val pairs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
    val diff = pairs.select(
        CosineSim.cosineFused(col("a"), col("b")).as("fused"),
        (dotFused(col("a"), col("b")) /
          (normFused(col("a")) * normFused(col("b")))).as("decomposed"))
      .filter(col("fused") =!= col("decomposed"))
    assert(diff.count() == 0, diff.limit(3).collect().mkString(", "))
    // null element and empty-array behavior
    val edge = Seq(
      (1L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)),
      (2L, Array.empty[java.lang.Float], Array.empty[java.lang.Float]),
    ).toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
      .select(col("id"), dotFused(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(edge(1L).isEmpty, "null element must yield null")
    assert(edge(2L).contains(0.0), "empty arrays dot to 0.0")
  }

  test("registered SQL function graft_cosine works") {
    CosineSim.register(spark)
    vecs.createOrReplaceTempView("cs_vecs")
    val r = spark.sql(
      "SELECT id, round(graft_cosine(a, b), 4) AS c FROM cs_vecs WHERE id = 0")
      .as[(Long, Double)].head()
    assert(r == (0L, 1.0))
  }

  test("session extensions register every native function (no session)") {
    // Unit-tests the wiring itself, order-independently: a builder
    // cannot inject extensions into the already-created shared test
    // session, so apply GraftExtensions to a fresh registry and build
    // each injected function directly. (End-to-end, the extensions are
    // exercised by every Verify/Bench session.)
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.graft.ColumnShim
      .registerFunctions(ext, FunctionRegistry.builtin.clone())
    for (name <- Seq("graft_cosine", "graft_dot", "graft_lsh_bucket",
        "graft_winnow"))
      assert(registry.functionExists(FunctionIdentifier(name)), name)
    val cos = registry.lookupFunctionBuilder(FunctionIdentifier("graft_cosine"))
      .get(Seq(Literal.create(Array(1.0f, 0.0f)), Literal.create(Array(1.0f, 0.0f))))
    assert(cos.eval(null) == 1.0)
    val winnow = registry
      .lookupFunctionBuilder(FunctionIdentifier("graft_winnow"))
      .get(Seq(Literal.create("abcdef"), Literal(5), Literal(4)))
    assert(winnow.eval(null) != null)
  }

  test("zero-norm null survives NON-nullable children under codegen") {
    // array(lit…) children are non-nullable; without the nullable=true
    // override the expression declared itself non-nullable while the
    // generated code assigns isNull = true on the zero-norm path — a
    // codegen compile failure that silently falls back to interpreted.
    val df = spark.range(2).select(
      array(lit(0f), lit(0f)).as("a"),
      array((col("id") + 1).cast("float"), lit(2f)).as("b"))
    assert(!df.schema("a").nullable && !df.schema("b").nullable)
    val out = df.select(CosineSim.cosineFused(col("a"), col("b")).as("c"))
    assert(out.schema("c").nullable, "graft_cosine must declare nullable")
    assert(out.collect().forall(_.isNullAt(0)))
  }

  test("participates in whole-stage codegen (no fallback)") {
    // A LocalTableScan is evaluated eagerly without codegen; use a
    // range-backed plan so a real Project stage is generated.
    // build arrays with codegen-supported array() — transform() lambdas
    // would knock the whole Project out of WSCG regardless of our expr
    val df = spark.range(4).select(
      array((0 until 8).map(i => (col("id") + i).cast("float")): _*).as("a"),
      array((0 until 8).map(i => lit(i * 2 + 1).cast("float")): _*).as("b"))
    val q = df.select(CosineSim.cosineFused(col("a"), col("b")).as("c"))
    val plan = q.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project .*graft_cosine.*"), plan)
    assert(q.filter(col("c").isNull).count() == 0)
  }
}
