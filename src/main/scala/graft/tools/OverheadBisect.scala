package graft.tools

import org.apache.spark.sql.SparkSession

/** r15 bisect tool for the BENCH_FLOOR r14 fixed-overhead drift:
  * `mixture_sample` (floor 0.076 → 0.257) and `minute_window_counts`
  * (0.158 → 0.453) are trivial plans whose medians rose with no code
  * change to the queries themselves. Suspects (VERDICT r14 task #3):
  * the 10 injected native functions, the TopKStrategy planner
  * strategy, the TopKRewrite optimizer rule, or something else
  * entirely. This main times the two queries under each extension
  * configuration on the SAME sf dir with the SAME rep protocol, and
  * splits PLANNING (analyze+optimize+plan) from EXECUTION so the drift
  * localizes. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.OverheadBisect"
  */
object OverheadBisect {
  private val variants: Seq[(String, org.apache.spark.sql.SparkSessionExtensions => Unit)] = Seq(
    // "full" runs FIRST and LAST: the JVM warms monotonically across
    // variants (shared code cache), so only the full-vs-full2 delta
    // separates JIT drift from extension cost.
    "full" -> (ext => (new graft.functions.GraftExtensions) (ext)),
    "none" -> (_ => ()),
    "functions_only" -> { ext =>
      (new graft.functions.GraftExtensions).applyFunctionsOnly(ext)
    },
    "functions_plus_strategy" -> { ext =>
      (new graft.functions.GraftExtensions).applyFunctionsOnly(ext)
      ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    },
    "full2" -> (ext => (new graft.functions.GraftExtensions) (ext))
  )

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    for ((name, ext) <- variants) {
      val spark = SparkSession.builder()
        .withExtensions(ext)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName(s"bisect-$name")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        for (q <- Seq("mixture_sample", "minute_window_counts")) {
          val fn = graft.SparkEntry.queries(q)
          // warm-up
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val cons = Array.fill(reps)(0.0)
          val plans = Array.fill(reps)(0.0)
          val execs = Array.fill(reps)(0.0)
          val phases = scala.collection.mutable.Map[String, Double]()
            .withDefaultValue(0.0)
          for (i <- 0 until reps) {
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir) // incl. spark.read file listing
            val t1 = System.nanoTime()
            df.queryExecution.executedPlan // force analyze+optimize+plan
            val t2 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            val t3 = System.nanoTime()
            cons(i) = (t1 - t0) / 1e9
            plans(i) = (t2 - t1) / 1e9
            execs(i) = (t3 - t2) / 1e9
            for ((ph, s) <- df.queryExecution.tracker.phases)
              phases(ph) += (s.endTimeMs - s.startTimeMs) / 1e3 / reps
          }
          def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
          val phaseStr = phases.toSeq.sortBy(_._1)
            .map { case (k, v) => f"$k=$v%.4f" }.mkString(" ")
          println(f"[bisect] variant=$name%-24s q=$q%-22s " +
            f"construct_med=${med(cons)}%.4f plan_med=${med(plans)}%.4f " +
            f"exec_med=${med(execs)}%.4f " +
            f"total_med=${med(Array.tabulate(reps)(i => cons(i) + plans(i) + execs(i)))}%.4f " +
            s"| $phaseStr")
        }
      } finally spark.stop()
      // fully tear down so the next variant gets a fresh session wiring
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
