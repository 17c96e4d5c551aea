package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering the engine's native functions, e.g.
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * making `graft_cosine(a, b)` available to SQL and `expr()` in every
  * session — the proper production wiring; `CosineSim.register` is the
  * ad-hoc per-session alternative.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "graft_lsh_bucket"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(p: Int,
            org.apache.spark.sql.types.IntegerType) => LshBucket(exprs(0), p)
        case other => throw new IllegalArgumentException(
          s"graft_lsh_bucket(v, planes): planes must be an int literal, got $other")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (exprs: Seq[Expression]) => (exprs(1), exprs(2)) match {
        case (org.apache.spark.sql.catalyst.expressions.Literal(k: Int,
            org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.catalyst.expressions.Literal(w: Int,
            org.apache.spark.sql.types.IntegerType)) =>
          WinnowFingerprints(exprs(0), k, w)
        case other => throw new IllegalArgumentException(
          s"graft_winnow(text, k, w): k and w must be int literals, got $other")
      }))
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
